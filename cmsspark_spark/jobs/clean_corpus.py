"""Clean-corpus job: the full training-data pipeline as ONE runnable
CLI — quality gate → exact dedup (ids-only election) → optional
ExactSubstr-style span removal (--span-window) → optional near-dup
clustering with a survivor policy (--near-dup-policy min_id|longest) →
benchmark decontamination → deterministic mixture resampling →
training-shard write + manifest + HTML/SVG report.

This is the operational form of the `training_pipeline_e2e` /
`clean_corpus_survivors` registry queries (queries.py): same operators,
wired as a job a data engineer runs per corpus snapshot.

Run:
    python -m cmsspark_spark.jobs.clean_corpus \\
        --sf-dir /root/testdata/sf0.001 --out /tmp/clean \\
        --min-tokens 5 --budget 0.8 --shards 8
"""

from __future__ import annotations

import argparse

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cmsspark_spark import sinks
from cmsspark_spark.functions.text import fingerprint, token_count
from cmsspark_spark.operators.pipeline import mixture_resample, ngram_overlap
from cmsspark_spark.operators.memo import pin_frame
from cmsspark_spark.session import get_spark
from cmsspark_spark.sinks import report
from cmsspark_spark.sinks.plots import bar_svg


def run(
    spark: SparkSession,
    sf_dir: str,
    out: str,
    min_tokens: int = 5,
    max_contamination: float = 0.5,
    budget: float = 0.8,
    alpha: float = 0.7,
    shards: int = 8,
    span_window: int = 0,
    near_dup_policy: str = "off",
    snapshot: bool = False,
) -> DataFrame:
    # Widened catalog scan: every phase before the first shuffle is
    # map-heavy (token gate, fingerprints, span hashing, gram explode)
    # — a raw single-file read runs all of it on ONE core (measured:
    # gate 5.2 s / span-strip 4.8 s / decontam 4.3 s single-task at
    # sf0.1; the widen spreads them across the cluster).
    from cmsspark_spark import catalog

    docs = catalog.load_table(spark, sf_dir, "documents")

    # 1. structural quality gate (narrow filter, no shuffle). The gated
    #    frame feeds four consumers (fingerprints, dedup re-attach,
    #    bench split, final stats) — persist it so the corpus is read
    #    once, not once per consumer (on a cluster swap for checkpoint
    #    to a staging table, the convention the registry queries state).
    gated = docs.filter(token_count("text") >= min_tokens).persist()

    # 2. exact dedup: min-id survivor per fingerprint — the election
    #    shuffles (fingerprint, id) only; text re-attaches by semi-join
    fps = gated.select("doc_id", fingerprint("text").alias("_fp"))
    # tiny ids-only lists: an eager checkpoint (pin_frame) truncates their
    # lineage so downstream joins don't re-run the election
    survivors = (
        fps.groupBy("_fp").agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .transform(pin_frame)
    )
    deduped = gated.join(survivors, on="doc_id", how="left_semi")

    # 2b. optional ExactSubstr-style span removal: duplicated runs keep
    #     one global copy, every other occurrence is stripped in place
    #     (--span-window 0 disables; 12 is the usual ExactSubstr-scale
    #     window at word grain). Exact dedup above already removed
    #     whole-doc copies, so this catches partial stitching only.
    #     Untouched docs keep their text byte-exact; docs that lost a
    #     span are rebuilt from original-case tokens with single-space
    #     joins (matching is case-insensitive, text is never folded).
    if span_window:
        from cmsspark_spark.operators.dedup import strip_repeated_spans

        stripped = strip_repeated_spans(
            deduped, window=span_window
        ).select("doc_id", "text")
        deduped = (
            deduped.drop("text")
            .join(stripped, on="doc_id")
            .filter(F.length(F.trim(F.col("text"))) > 0)
        ).persist()
        # the stripped corpus feeds 3+ consumers (bench split,
        # candidate grams, final join-backs): without pinning it the
        # whole span-hash census recomputes per consumer (measured
        # ~1.6x on the job wall at sf0.1; on a cluster swap for a
        # checkpoint to a staging table, like the gate above)
        _pinned_strip = deduped

    # 2c. optional NEAR-dup clustering (--near-dup-policy min_id |
    #     longest): MinHash-LSH → verified Jaccard → connected
    #     components → one survivor per cluster. 'longest' keeps the
    #     most-token member (the dedup_quality_survivors policy);
    #     'min_id' keeps the component label. Losers leave by ids-only
    #     anti-join — text never enters the clustering shuffles.
    if near_dup_policy != "off":
        from cmsspark_spark.operators.dedup import near_dup_losers

        # star-capped candidates (r10): template clusters emit O(m)
        # edges, components (and so survivors/losers) are unchanged
        losers = near_dup_losers(
            deduped, policy=near_dup_policy, hot_bucket_cap=1024
        ).transform(pin_frame)
        deduped = deduped.join(losers, on="doc_id", how="left_anti")

    # 3. benchmark decontamination: every-20th doc stands in for the
    #    protected eval set (the registry queries' convention)
    bench = deduped.filter(F.col("doc_id") % 20 == 0)
    candidates = deduped.filter(F.col("doc_id") % 20 != 0)
    overlap = ngram_overlap(candidates, bench, n=3)
    clean_ids = overlap.filter(
        F.col("hit_ratio") <= max_contamination
    ).select("doc_id").transform(pin_frame)
    clean = candidates.join(clean_ids, on="doc_id", how="left_semi")

    # 4. mixture realization: temperature-weighted deterministic
    #    Bernoulli thinning to the token budget
    kept = (
        mixture_resample(
            clean, "source", alpha=alpha, budget_frac=budget
        )
        .filter("_keep")
        .drop("_rate", "_keep")
    )

    # 5. shard write (content-derived membership + manifest) + report.
    #    `kept` feeds two terminal consumers (the shard write and the
    #    summary aggregation) — persist it so the pipeline tail runs
    #    once, and run the two consumers CONCURRENTLY (guide §2.6:
    #    independent driver jobs back-fill each other's stragglers).
    kept = kept.persist()

    from concurrent.futures import ThreadPoolExecutor

    def _shards():
        return sinks.write_training_shards(
            kept, f"{out}/shards", key_col="doc_id", num_shards=shards
        )

    def _summary() -> DataFrame:
        return (
            kept.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(token_count("text")).cast("long").alias("n_tokens"),
            )
            .orderBy("source")
            .transform(pin_frame)
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_manifest = pool.submit(_shards)
        f_summary = pool.submit(_summary)
        manifest = f_manifest.result()
        summary = f_summary.result()

    # one driver collect feeds both the plot and the HTML/CSV pages
    # (the checkpointed summary makes write_report's own collect a
    # replay, not a recompute)
    report.write_report(
        summary,
        f"{out}/report",
        name="clean_corpus",
        title="Clean corpus summary",
        subtitle=f"min_tokens={min_tokens} budget={budget} α={alpha}",
        plots=[
            bar_svg(
                summary.toPandas(), "source", ["n_tokens"],
                title="Kept tokens by source", ylabel="tokens",
            )
        ],
    )
    sinks.write_csv(manifest, f"{out}/manifest")
    if snapshot:
        # versioned curated corpus: each run commits one snapshot
        # (overwrite semantics — this run's survivors ARE the corpus),
        # prior versions stay readable for time travel / diff-reads
        # until expire_snapshots retires them
        from cmsspark_spark.operators.snapshots import snapshot_write

        snapshot_write(kept, f"{out}/corpus", mode="overwrite")
    kept.unpersist()
    gated.unpersist()
    if span_window:
        _pinned_strip.unpersist()
    return summary


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--max-contamination", type=float, default=0.5)
    ap.add_argument("--budget", type=float, default=0.8)
    ap.add_argument("--alpha", type=float, default=0.7)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--span-window", type=int, default=0,
                    help="ExactSubstr-style span removal window "
                         "(0 disables)")
    ap.add_argument("--near-dup-policy", default="off",
                    choices=["off", "min_id", "longest"],
                    help="near-dup cluster survivor policy (off "
                         "disables clustering; longest keeps the "
                         "most-token member per cluster)")
    ap.add_argument("--snapshot", action="store_true",
                    help="also commit the survivors as a snapshot "
                         "version of <out>/corpus (time travel + "
                         "cross-run diff reads)")
    args = ap.parse_args()
    spark = get_spark("clean-corpus")
    run(
        spark, args.sf_dir, args.out,
        min_tokens=args.min_tokens,
        max_contamination=args.max_contamination,
        budget=args.budget, alpha=args.alpha, shards=args.shards,
        span_window=args.span_window,
        near_dup_policy=args.near_dup_policy,
        snapshot=args.snapshot,
    )
    spark.stop()


if __name__ == "__main__":
    main()
