"""Aggregation repertoire (SURVEY §2.5, §2.6).

All aggregations are Catalyst hash aggregations with map-side partials —
never driver-side loops. Scale notes:

- Conditional counts (A3) use ``sum(when(...))`` exactly like the
  reference (rucio_datasets_stats.py:317-319).
- ``approx_count_distinct`` is exposed alongside exact ``countDistinct``
  (A4): at 100 TB the HLL sketch avoids the full distinct shuffle.
- Two-level re-aggregation (A7; rucio_ds_summary.py:292-334) keeps the
  first grouping's partitioning so level 2 often avoids a second full
  shuffle (Catalyst reuses the hash partitioning when keys are a prefix).
- Time-bucket aggregation (A8/W2) uses ``F.window`` tumbling windows
  instead of the reference's epoch-mod arithmetic
  (hpc_running_cores_and_corehr.py:206-208) — same semantics, native
  expression.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def conditional_count(cond: Column) -> Column:
    """count-if as sum(when(cond,1).otherwise(0)) — A3 semantics
    (null-safe: a null condition counts as 0, matching the reference's
    ``when(isNull,0).otherwise(1)`` pattern)."""
    return F.sum(F.when(cond, 1).otherwise(0))


def ratio_of_sums(num: Column, den: Column, scale: float = 100.0) -> Column:
    """Derived metric like CPU efficiency = 100*sum(cpu)/sum(core)
    (A5; degraded/condor_cpu_efficiency.py:393-420)."""
    return F.lit(scale) * F.sum(num) / F.sum(den)


def two_level_agg(
    df: DataFrame,
    level1_keys: Sequence[str],
    level1_aggs: Sequence[Column],
    level2_keys: Sequence[str],
    level2_aggs: Sequence[Column],
    single_shuffle: bool = True,
) -> DataFrame:
    """Aggregate per (k1,k2) then re-aggregate per k2-subset
    (A7; rucio_ds_summary.py:292-334: per-(RSE,dataset) sums, then
    per-dataset max/min/avg of those sums).

    ``single_shuffle=True`` repartitions by the level-2 keys first:
    hash distribution on k2 satisfies the clustering requirement of
    BOTH aggregations (same-key rows co-located), so neither groupBy
    shuffles again — one exchange of raw rows instead of two of
    partially-aggregated rows. Wins when level-1 groups are small
    (little map-side combine benefit); set False when level-1 collapses
    many rows per group, or when k2 is skewed (k2-only partitioning
    concentrates hot keys).
    """
    if single_shuffle:
        df = df.repartition(*[F.col(k) for k in level2_keys])
    lvl1 = df.groupBy(*level1_keys).agg(*level1_aggs)
    return lvl1.groupBy(*level2_keys).agg(*level2_aggs)


def pivot_agg(
    df: DataFrame,
    group_key: str | Sequence[str],
    pivot_col: str,
    value: Column,
    pivot_values: Sequence[str] | None = None,
    fill: float = 0,
) -> DataFrame:
    """rows→columns pivot (A9; reports/aggregate_campaigns.py:181-184).

    Pass ``pivot_values`` whenever known: it removes the extra
    distinct-values job Spark otherwise runs before planning the pivot.
    """
    keys = [group_key] if isinstance(group_key, str) else list(group_key)
    g = df.groupBy(*keys)
    p = g.pivot(pivot_col, list(pivot_values)) if pivot_values else g.pivot(pivot_col)
    out = p.agg(value)
    # fill ONLY the pivoted value columns: a blanket fillna would also
    # rewrite null group keys (a null-keyed group would silently merge
    # into the fill-valued key).
    return out.na.fill(fill, subset=[c for c in out.columns if c not in keys])


def top_k(
    df: DataFrame, order_by: Sequence[Column], k: int
) -> DataFrame:
    """Global top-k via orderBy().limit(k) (W4;
    reports/aggregate_campaigns.py:203-205). Spark plans this as
    TakeOrderedAndProject — a per-partition heap + single reduce, no
    global sort, so it scales to any input size."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Per-group top-k via row_number window (W1 — absent in the
    reference, which emulated it with re-aggregation; SURVEY §2.6).
    Deterministic iff ``order_by`` is a total order within groups."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def time_bucket_agg(
    df: DataFrame,
    ts_col: str,
    bucket: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Tumbling-window aggregation (A8/W2/T5).

    The reference truncates epochs manually (``ts - ts % 720``,
    hpc_running_cores_and_corehr.py:206-208); ``F.window`` expresses the
    same tumbling bucket natively and carries over to Structured
    Streaming unchanged.
    """
    win = F.window(F.col(ts_col), bucket)
    return (
        df.groupBy(win.alias("w"), *keys)
        .agg(*aggs)
        .withColumn(bucket_col, F.col("w.start"))
        .drop("w")
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Gap-based session aggregation via native ``F.session_window``
    (Spark 3.2+): rows within ``gap`` of each other merge into one
    session per key. The idiomatic form of the lag-window
    sessionization (queries.sessionize_users) and of the stateful
    streaming operator (streaming.sessionize_stateful) — identical
    session boundaries, and usable in Structured Streaming unchanged.
    Output carries session_start/session_end."""
    win = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(win.alias("w"), *keys)
        .agg(*aggs)
        .withColumn("session_start", F.col("w.start"))
        .withColumn("session_end", F.col("w.end"))
        .drop("w")
    )


def dedup_then_bin_agg(
    df: DataFrame,
    ts_col: str,
    bucket: str,
    unit_keys: Sequence[str],
    unit_value: Column,
    day_aggs: Sequence[Column],
    day_col: str = "day",
) -> DataFrame:
    """The HPC core-hours pattern (A8): max per (unit, 12-min window),
    then per-day aggregation of the window values
    (hpc_running_cores_and_corehr.py:198-227)."""
    win = F.window(F.col(ts_col), bucket)
    per_window = df.groupBy(win.alias("w"), *unit_keys).agg(unit_value.alias("_wv"))
    return (
        per_window.withColumn(day_col, F.to_date("w.start"))
        .groupBy(day_col)
        .agg(*day_aggs)
    )


def time_rollup(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    value_col: str,
    resolutions: Sequence[str] = ("hour", "day", "month"),
) -> DataFrame:
    """Hypertable-style continuous aggregate: one fact scan, a
    hierarchy of time resolutions.

    The fact is aggregated ONCE at the finest resolution; every
    coarser level re-aggregates the level below it (sums of sums,
    min of mins, ...), never the fact. The levels are unioned by
    name with a ``resolution`` tag — the layout a TimescaleDB-style
    hypertable rollup materializes, here as one declarative plan.

    Scale: at 100 TB the fact scan + finest agg dominates; each
    coarser level re-shuffles only |finest buckets| rows (orders of
    magnitude smaller). In the physical plan the finest-level
    aggregate subtree is shared by every union branch and Spark's
    ReuseExchange executes it once (plan-asserted in
    tests/test_plans.py). Sums are carried as exact micro-unit
    BIGINTs so re-aggregation order can't drift FP results between
    levels; one division per output row converts back.

    Beyond-reference: the reference recomputes each period from raw
    daily snapshots every time (e.g. the weekly/monthly splits in
    condor_crab_unique_users.py:68-95).
    """
    base_bucket = F.date_trunc(resolutions[0], F.col(ts_col))
    micro = (
        F.round(F.round(F.sum(value_col), 6) * 1000000, 0)
        .cast("bigint")
        .alias("_tu")
    )
    cur = df.groupBy(*keys, base_bucket.alias("bucket")).agg(
        micro,
        F.count(F.lit(1)).alias("n"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
    )
    def present(level: DataFrame, res: str) -> DataFrame:
        return level.select(
            *keys,
            F.col("bucket"),
            F.lit(res).alias("resolution"),
            F.round(F.col("_tu") / 1e6, 6).alias("total"),
            "n",
            "vmin",
            "vmax",
        )
    out = present(cur, resolutions[0])
    for res in resolutions[1:]:
        cur = cur.groupBy(
            *keys, F.date_trunc(res, F.col("bucket")).alias("bucket")
        ).agg(
            F.sum("_tu").alias("_tu"),
            F.sum("n").alias("n"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
        out = out.unionByName(present(cur, res))
    return out
