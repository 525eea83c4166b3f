#!/usr/bin/env python
"""Optimizer-rule plan audit: sweep every registry query's OPTIMIZED
plan for the duplicate-expensive-expression signature that has now
bitten this engine three times (r4 span census, r6 paragraph dedup,
r10 LSH verify — all via InferFiltersFromGenerate synthesizing
``size(<expensive array expr>) > 0`` filters and pushing the whole
expression below a join as a corpus-scan filter; the rule class also
includes InferFiltersFromConstraints).

For each query the audit builds the DataFrame (plan only — nothing
executes), renders the optimized plan, and flags any Filter node that
embeds an expression from the EXPENSIVE list (higher-order array
builders, regex machinery, shingle/tokenize chains). A flagged filter
is not automatically a bug — a user-written ``length(text) > k`` gate
is supposed to be there — so the report separates:

- ``size_filters``: ``size(...) > 0``-shaped predicates over a listed
  expensive builder — the exact inferred-filter signature, almost
  always optimizer-synthesized (the fix that keeps them out,
  ``spark.sql.optimizer.excludedRules=...InferFiltersFromGenerate``,
  is asserted present);
- ``expensive_filters``: any other Filter embedding a listed builder —
  reviewed by hand, recorded so a future rule regression diffs
  against a known-good baseline.

Writes PLAN_AUDIT_r{N}.json at the repo root; exits nonzero if any
``size_filters`` appear (the excluded rule regressed) so the audit
can gate a round.

Run: python tools/plan_audit.py [query names...]
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cmsspark_spark.queries import QUERIES  # noqa: E402
from cmsspark_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

#: Expression builders whose duplication into a data filter turns a
#: pruned pass into a full corpus scan. Lowercase substrings matched
#: against each Filter node's condition text.
EXPENSIVE = (
    "transform(",       # higher-order array build
    "aggregate(",       # higher-order fold
    "filter(split(",    # tokenize chain
    "array_distinct(",  # shingle/dedup chains
    "sequence(",        # range explode builders
    "regexp_extract_all(",
    "zip_with(",
)

#: The inferred-filter shape: size(<expensive>) > 0 (or # >= 1).
_SIZE_RE = re.compile(r"size\((?P<body>.+?)\)\s*(?:>\s*0|>=\s*1)", re.I)

#: Queries whose size()-filter is USER-WRITTEN (a zero-token gate the
#: author put there, pushed through the projection by ordinary filter
#: pushdown — reviewed r11, one extra narrow tokenize per row, priced
#: in the packing family's sweep ratios). The audit gates on
#: DEVIATIONS from this record: a size-filter in any other query, or
#: more than the recorded count here, means an inference rule
#: regressed (or a new user gate needs reviewing and recording).
EXPECTED_USER_GATES = {
    "pack_concat_chunks": 1,
    "pack_concat_eos_chunks": 1,
    "pack_concat_chunks_sharded": 1,
    "chunk_overlap_windows": 1,
    "pack_boundary_masks": 1,
    "weighted_sample_docs": 1,
    "chunk_dedup_rate": 1,
    "packing_efficiency_report": 1,
    # r14: the phrase-match predicate size(array_intersect fold) > 0
    # (operators/retrieval.py:1297) became audit-VISIBLE when the
    # persisted-index serve queries stopped returning memoized
    # checkpointed outputs (f26ec14) and started building their real
    # serve plan per call; the gate is hand-written and runs on the
    # grouped (qid, doc) candidate frame (bounded by the broadcast
    # top-N hits join), never on a corpus scan.
    "bm25_phrase_serve": 1,
}

# Standing adjudications for the recurring expensive-filter flags
# (stable across rounds 11-12): each entry says WHY the flagged filter
# is acceptable, so the report can split `new_flags` (demanding
# attention) from `known_adjudicated` (reviewed). A query whose flag
# disappears simply stops matching; a NEW query or a new condition
# shape lands in new_flags.
KNOWN_ADJUDICATED = {
    "ann_ivf_kmeans_topk": "inferred isnotnull over the probe distance "
        "expression; runs on the k-row centroid-joined frame",
    "ann_ivf_static_topk": "same shape: distance isnotnull on the "
        "bucket-pruned probe frame",
    "ann_ivfpq_static_topk": "same shape over the PQ-decoded distance",
    "bigram_logprob_quality": "isnotnull over the logprob aggregate — "
        "the corpus pass IS the scoring, nothing extra scans",
    "chunk_dedup_rate": "user-written size() gate over the chunk "
        "builder (recorded in EXPECTED_USER_GATES)",
    "chunk_overlap_windows": "user-written size() gate (recorded)",
    "embed_lsh_quality_report": "isnotnull(sqrt(aggregate)) on the "
        "sampled verifier frame; the corpus path is the LSH variant",
    "embed_near_dup_pairs": "isnotnull(sqrt(aggregate)) on the "
        "deliberately quarter-sampled brute verifier (queries.py:1502)",
    "kmeans_cluster_quality": "assignment-distance isnotnull on the "
        "k-row centroid join",
    "kmeans_embedding_clusters": "same shape (k-row centroid join)",
    "pack_boundary_masks": "user-written size() gate (recorded)",
    "pack_concat_chunks": "user-written size() gate (recorded)",
    "pack_concat_chunks_sharded": "user-written size() gate (recorded)",
    "pack_concat_eos_chunks": "user-written size() gate (recorded)",
    "packing_efficiency_report": "user-written size() gate (recorded)",
    "semantic_dedup_kmeans": "cosine-distance isnotnull inside the "
        "cluster-bucketed verify (never all-pairs)",
    "semantic_dedup_static": "same shape, static centroids",
    "split_assign_increment": "gate over the bounded census frame",
    "bm25_phrase_serve": "user-written phrase gate (size of the\n        positional array_intersect fold) on the grouped candidate\n        frame — audit-visible since f26ec14 un-memoized the serve plans (recorded in EXPECTED_USER_GATES)",
    "weighted_sample_docs": "user-written size() gate (recorded)",
}


def _filter_conditions(plan: str) -> list:
    """Condition text of every Filter node in a rendered plan."""
    out = []
    for line in plan.splitlines():
        s = line.strip().lstrip("+-:* ")
        if s.startswith("Filter "):
            out.append(s[len("Filter "):])
    return out


def audit_query(df) -> dict:
    plan = (
        df._jdf.queryExecution().optimizedPlan().toString()
    )
    size_hits, exp_hits = [], []
    for cond in _filter_conditions(plan):
        low = cond.lower()
        this_size = [
            cond[:400]
            for m in _SIZE_RE.finditer(low)
            if any(e in m.group("body") for e in EXPENSIVE)
        ]
        size_hits.extend(this_size)
        # per-CONDITION classification: an earlier condition's size
        # hit must not suppress recording a later expensive filter
        if not this_size and any(e in low for e in EXPENSIVE):
            exp_hits.append(cond[:400])
    return {"size_filters": size_hits, "expensive_filters": exp_hits}


def main() -> None:
    round_no = os.environ.get("SPARK_GRAFT_ROUND", "11")
    spark = get_spark("cmsspark-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    excluded = spark.conf.get("spark.sql.optimizer.excludedRules", "")
    if "InferFiltersFromGenerate" not in excluded:
        raise SystemExit(
            "session conf lost the InferFiltersFromGenerate exclusion "
            f"(excludedRules={excluded!r}) — the audited plans would "
            "not reflect the shipped configuration"
        )
    names = sys.argv[1:] or list(QUERIES)
    report: dict = {}
    errors: dict = {}
    for name in names:
        try:
            res = audit_query(QUERIES[name](spark, SF))
        except Exception as exc:  # noqa: BLE001 — audit, not gate
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            continue
        if res["size_filters"] or res["expensive_filters"]:
            report[name] = res
    n_size = sum(len(v["size_filters"]) for v in report.values())
    unexpected = {
        name: len(v["size_filters"])
        for name, v in report.items()
        if len(v["size_filters"]) > EXPECTED_USER_GATES.get(name, 0)
    }
    known = {
        name: KNOWN_ADJUDICATED[name]
        for name in report
        if name in KNOWN_ADJUDICATED
    }
    new_flags = {
        name: v for name, v in report.items()
        if name not in KNOWN_ADJUDICATED
    }
    payload = {
        "metric": "plan_audit_expensive_filters",
        "excluded_rules": excluded,
        "n_queries_audited": len(names) - len(errors),
        "n_flagged": len(report),
        "n_size_filter_hits": n_size,
        "unexpected_size_filters": unexpected,
        "new_flags": new_flags,
        "known_adjudicated": known,
        "flagged": report,
        "errors": errors,
    }
    path = os.path.join(REPO, f"PLAN_AUDIT_r{round_no}.json")
    k = 2
    while os.path.exists(path):
        path = os.path.join(REPO, f"PLAN_AUDIT_r{round_no}-{k}.json")
        k += 1
    with open(path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({
        "wrote": path,
        "n_flagged": len(report),
        "n_known_adjudicated": len(known),
        "new_flags": sorted(new_flags),
        "n_size_filter_hits": n_size,
        "unexpected_size_filters": unexpected,
        "n_errors": len(errors),
    }))
    spark.stop()
    if unexpected:
        raise SystemExit(
            f"size()-filters over expensive builders beyond the "
            f"recorded user gates: {unexpected} — an inference rule "
            "regressed, or a new user gate needs review + recording"
        )


if __name__ == "__main__":
    main()
