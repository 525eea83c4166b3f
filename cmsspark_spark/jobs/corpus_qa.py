"""Corpus-QA job: the READ-ONLY audit a data engineer runs on a corpus
snapshot before (or instead of) cleaning it — one CLI, four report
pages + a combined summary:

1. quality profile per source (tokens, length, stopword ratio);
2. distribution drift — PSI of per-source token lengths against a
   prior snapshot (``--ref-dir``), or the even/odd doc-id split of
   this snapshot when no reference is given;
3. domain boilerplate fraction (template paragraphs recurring across
   documents of one source);
4. novelty profile — per-source share of first-seen trigrams in
   ingest order (low novelty = stitched from seen fragments);
5. optional (``--near-dup``) LSH near-duplicate rate.

The operational form of the snapshot_drift_psi /
domain_boilerplate_report / doc_novelty_scores / text_quality_by_source
registry queries: same operators, wired as one runnable audit whose
artifacts are the sinks/report HTML+CSV pages.

Run:
    python -m cmsspark_spark.jobs.corpus_qa \\
        --sf-dir /root/testdata/sf0.001 --out /tmp/qa
"""

from __future__ import annotations

import argparse

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from cmsspark_spark.functions.text import (
    int_base_hash,
    shingles,
    stopword_ratio,
    token_count,
)
from cmsspark_spark.operators.memo import pin_frame
from cmsspark_spark.session import get_spark
from cmsspark_spark.sinks import report
from cmsspark_spark.sinks.plots import bar_svg


def run(
    spark: SparkSession,
    sf_dir: str,
    out: str,
    ref_dir: str | None = None,
    near_dup: bool = False,
    psi_threshold: float = 0.25,
    boiler_min_docs: int = 3,
) -> DataFrame:
    from cmsspark_spark import catalog
    from cmsspark_spark.operators.dedup import domain_boilerplate_report
    from cmsspark_spark.operators.pipeline import (
        psi_against_reference,
        psi_reference,
    )

    docs = catalog.load_table(spark, sf_dir, "documents")
    # Scored once, consumed by quality + drift: persist WITHOUT the
    # text payload (novelty/boilerplate re-scan the parquet text — a
    # column-pruned scan is cheaper than caching corpus text), and
    # materialize before the concurrent page fan-out below so the two
    # scored consumers don't race the cache fill.
    scored = docs.select(
        "doc_id",
        "source",
        token_count("text").cast("long").alias("n_tokens"),
        stopword_ratio("text").alias("stop_ratio"),
    ).persist()
    scored.count()

    # The four report pages are independent read-only audits over the
    # same inputs: each page's frame is per-source-row sized, so each
    # builder ends in an eager checkpoint (pin_frame: local by default,
    # reliable opt-in — see operators/memo) and the four builders
    # run CONCURRENTLY (guide §2.6 — independent driver jobs back-fill
    # each other's stragglers). The summary then joins the
    # materialized checkpoints instead of re-executing every page's
    # lineage, and the report writes replay them for free.
    def _quality() -> DataFrame:
        return (
            scored.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens"),
                F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
                F.round(F.avg("stop_ratio"), 4).alias("avg_stop_ratio"),
            )
            .orderBy("source")
            .transform(pin_frame)
        )

    # 2. drift: against --ref-dir when given, else even/odd split
    if ref_dir:
        subtitle = f"reference: {ref_dir}"
    else:
        subtitle = "reference: doc_id-hash half of this snapshot"

    def _drift() -> DataFrame:
        if ref_dir:
            ref_docs = catalog.load_table(spark, ref_dir, "documents")
            ref_scored = ref_docs.select(
                "source", token_count("text").cast("long").alias("n_tokens")
            )
            cur_scored = scored.select("source", "n_tokens")
        else:
            # hash split, NOT doc_id parity: sequential ids often encode
            # the source (round-robin assignment), so a parity split would
            # put whole sources on one side and score them as brand-new.
            half = int_base_hash(F.col("doc_id").cast("string")) % 2
            ref_scored = scored.filter(half == 0).select(
                "source", "n_tokens"
            )
            cur_scored = scored.filter(half == 1).select(
                "source", "n_tokens"
            )
        # the scorer references the reference table three times
        # (nbins, bounds broadcast, cell join) — checkpoint it so the
        # exact-percentile aggregation runs once, not per reference
        ref_tbl = psi_reference(
            ref_scored, "source", "n_tokens"
        ).transform(pin_frame)
        return (
            psi_against_reference(cur_scored, ref_tbl, "source", "n_tokens")
            .withColumn(
                # a source the reference never saw is the strongest drift
                # signal there is — flag it rather than dropping the row
                "drifted",
                F.when(F.col("new_group"), F.lit(True)).otherwise(
                    F.col("psi") > psi_threshold
                ),
            )
            .orderBy("source")
            .transform(pin_frame)
        )

    # 3. boilerplate (blank-line paragraphs — the web-corpus convention;
    # corpora without paragraph breaks collapse to one paragraph/doc
    # and legitimately report ~0 boilerplate)
    from cmsspark_spark.operators.dedup import explode_paragraphs

    def _boiler() -> DataFrame:
        paras = explode_paragraphs(docs, "source", "doc_id", "text")
        return (
            domain_boilerplate_report(paras, min_docs=boiler_min_docs)
            .withColumnRenamed("domain", "source")
            .orderBy("source")
            .transform(pin_frame)
        )

    # 4. novelty profile: first-seen trigram share per source
    def _novelty() -> DataFrame:
        gh = docs.select(
            "doc_id", "source", F.explode(shingles("text", 3)).alias("_g")
        ).select("doc_id", "source", int_base_hash(F.col("_g")).alias("_h"))
        w = Window.partitionBy("_h")
        firsts = gh.select(
            "doc_id", "source", F.min("doc_id").over(w).alias("_fd")
        )
        return (
            firsts.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_grams"),
                F.sum(
                    (F.col("_fd") == F.col("doc_id")).cast("long")
                ).alias("n_novel"),
                F.round(
                    F.sum((F.col("_fd") == F.col("doc_id")).cast("long"))
                    / F.count(F.lit(1)),
                    4,
                ).alias("novelty_frac"),
            )
            .orderBy("source")
            .transform(pin_frame)
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        f_quality = pool.submit(_quality)
        f_drift = pool.submit(_drift)
        f_boiler = pool.submit(_boiler)
        f_novelty = pool.submit(_novelty)
        quality = f_quality.result()
        drift = f_drift.result()
        boiler = f_boiler.result()
        novelty = f_novelty.result()

    report.write_report(
        quality, f"{out}/report", name="qa_quality",
        title="Per-source quality profile", subtitle=sf_dir,
    )
    report.write_report(
        drift, f"{out}/report", name="qa_drift",
        title="Token-length drift (PSI)", subtitle=subtitle,
    )
    report.write_report(
        boiler, f"{out}/report", name="qa_boilerplate",
        title="Domain boilerplate fraction",
        subtitle=f"paragraph recurring in >= {boiler_min_docs} docs",
    )
    report.write_report(
        novelty, f"{out}/report", name="qa_novelty",
        title="First-seen trigram novelty by source", subtitle=sf_dir,
    )

    # 5. optional near-dup rate (LSH + verified Jaccard)
    dup_cols = []
    if near_dup:
        from cmsspark_spark.operators.dedup import (
            jaccard_pairs,
            minhash_lsh_pairs,
        )

        # star-capped (r10): bounded candidate output on template
        # clusters, components-identical — see dedup.minhash_lsh_pairs
        cand = minhash_lsh_pairs(
            docs, "doc_id", "text", hot_bucket_cap=1024
        )
        pairs = jaccard_pairs(
            docs, "doc_id", "text", threshold=0.5, candidates=cand
        )
        dup_ids = (
            pairs.select(F.col("id_a").alias("doc_id"))
            .union(pairs.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        dup_by_src = (
            scored.join(dup_ids, "doc_id", "left_semi")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_near_dup_docs"))
        )
        dup_cols = [dup_by_src]

    # combined summary page
    # left-join the drift/novelty facets. Brand-new sources (current
    # half only) are already IN the drift frame with new_group=true —
    # the PSI gate materializes batch-only groups. A source missing
    # from the drift frame is therefore the opposite case: present
    # only in the REFERENCE half (it vanished from current) — that is
    # drift (drifted=true) but NOT 'brand-new'; coalescing new_group
    # to true here inverted the column's meaning for report readers
    # (r8 advice).
    summary = (
        quality.join(
            drift.select("source", "psi", "drifted", "new_group"),
            "source",
            "left",
        )
        .withColumn(
            "drifted",
            F.coalesce(F.col("drifted"), F.lit(True)),
        )
        .withColumn(
            "new_group", F.coalesce(F.col("new_group"), F.lit(False))
        )
        .join(
            boiler.select("source", "boilerplate_frac", "n_docs_affected"),
            "source",
            "left",
        )
        .join(novelty.select("source", "novelty_frac"), "source", "left")
    )
    for extra in dup_cols:
        summary = summary.join(extra, "source", "left").withColumn(
            "n_near_dup_docs", F.coalesce("n_near_dup_docs", F.lit(0))
        )
    summary = summary.orderBy("source")
    pdf = summary.toPandas()
    report.write_report(
        summary, f"{out}/report", name="qa_summary",
        title="Corpus QA summary", subtitle=sf_dir,
        plots=[
            bar_svg(
                pdf, "source", ["novelty_frac"],
                title="Novelty by source", ylabel="first-seen share",
            )
        ],
    )
    scored.unpersist()
    return summary


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--ref-dir", default=None,
                    help="prior snapshot dir for the drift section "
                         "(default: even/odd split of --sf-dir)")
    ap.add_argument("--near-dup", action="store_true",
                    help="also compute the LSH near-duplicate rate")
    ap.add_argument("--psi-threshold", type=float, default=0.25)
    ap.add_argument("--boiler-min-docs", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark("corpus-qa")
    run(
        spark, args.sf_dir, args.out,
        ref_dir=args.ref_dir, near_dup=args.near_dup,
        psi_threshold=args.psi_threshold,
        boiler_min_docs=args.boiler_min_docs,
    )
    spark.stop()


if __name__ == "__main__":
    main()
