"""Join repertoire (SURVEY §2.4).

The reference's joins are all equi-joins expressed either as SQL strings
(data_collection.py:162-164) or DataFrame ``.join`` chains
(rucio_datasets_stats.py:198-614). Scale notes per operator:

- Small dimensions are *broadcast* (J7; rucio_datasets_monitoring.py:191)
  — at 100 TB the fact side never shuffles for dim enrichment.
- Anti-joins use ``left_anti`` instead of the reference's
  ``subtract``+re-join (J8; reports/aggregate_leftovers.py:127-140),
  saving one shuffle and one join.
- Day-template zero-fill (J10; hpc_running_cores_and_corehr.py:155-185)
  builds the template with ``sequence``+``explode`` *on the cluster* —
  no driver-side row materialization.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


#: Default broadcast-hint ceiling — Spark's autoBroadcastJoinThreshold
#: default. Dims estimated above this get NO hint; AQE decides at
#: runtime from actual shuffle statistics.
BROADCAST_THRESHOLD_BYTES = 10 << 20


def broadcast_if_small(
    df: DataFrame, threshold_bytes: int = BROADCAST_THRESHOLD_BYTES
) -> DataFrame:
    """Size-aware broadcast hint (round-1 verdict, scale hazard #1).

    An unconditional ``F.broadcast`` overrides AQE's size check and
    OOMs the driver/executors when the "small" side grows with the
    data (part/supplier-class dims at 100× SF). Hint only when
    Catalyst's optimized-plan size estimate is under the threshold;
    above it, return the frame un-hinted so AQE can still pick a
    broadcast join at runtime if the ACTUAL post-filter size allows.

    The estimate comes from the optimized logical plan's statistics
    (file sizes × compression factor, scaled by column pruning), so a
    projected dim is judged by what the join would actually ship.
    """
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        size = int(stats.sizeInBytes())  # py4j converts scala BigInt → int
    except Exception:  # no estimate (e.g. streaming source) → no hint
        return df
    return F.broadcast(df) if size <= threshold_bytes else df


def enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | Column,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Fact⋈dim enrichment join; size-aware broadcast of the dimension
    by default.

    Reference pattern J3/J7: left-outer enrichment keeping all fact rows
    (rucio_ds_summary.py:142-246) with an explicit broadcast for small
    dims (rucio_datasets_monitoring.py:191) — made size-aware here so a
    dim that grows past the threshold falls through to AQE instead of
    forcing an OOM-prone broadcast.
    """
    d = broadcast_if_small(dim) if broadcast_dim else dim
    return fact.join(d, on=on, how=how)


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """Rows of ``left`` with no key match in ``right`` (leftovers).

    Replaces the reference's ``subtract`` + re-join two-pass
    (reports/aggregate_leftovers.py:127-140) with one ``left_anti`` —
    a single shuffle (or none, if ``right`` is broadcastable).
    """
    return left.join(right, on=list(on), how="left_anti")


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    return left.join(right, on=list(on), how="left_semi")


def two_hop(
    edge1: DataFrame, edge2: DataFrame, hop_key: Sequence[str], final: DataFrame | None = None,
    final_key: Sequence[str] | None = None,
) -> DataFrame:
    """Chained map joins (file→block→dataset shape, J9;
    rucio_datasets_stats.py:196-204)."""
    out = edge1.join(edge2, on=list(hop_key))
    if final is not None:
        out = out.join(final, on=list(final_key or hop_key))
    return out


def day_template_fill(
    df: DataFrame,
    date_col: str,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
    start: str | None = None,
    end: str | None = None,
    fill: float = 0,
) -> DataFrame:
    """Fill the full (day × keys) grid so missing days appear as zeros
    (J10/F11). ``df`` must already be aggregated to (date_col,
    *key_cols) grain.

    The reference builds the template rows in the driver
    (hpc_running_cores_and_corehr.py:155-167); here ``sequence()`` +
    ``explode()`` generates it cluster-side.

    For ``fill == 0`` (the reference's case) there is NO join at all:
    zero-valued template rows are unioned in and the grid re-aggregated
    with sum — one shuffle of (aggregated data + tiny template). A
    broadcast left-outer join can't do better: Spark cannot broadcast
    the join's preserved side (LeftOuter requires BuildRight), so the
    join form always shuffles both sides. For other fill values the
    join form is used, hint-free.
    """
    if start is not None and end is not None:
        bounds = df.sparkSession.range(1).select(
            F.lit(start).cast("date").alias("min_d"), F.lit(end).cast("date").alias("max_d")
        )
    else:
        bounds = df.select(
            F.min(F.col(date_col)).cast("date").alias("min_d"),
            F.max(F.col(date_col)).cast("date").alias("max_d"),
        )
    days = bounds.select(
        F.explode(F.sequence("min_d", "max_d", F.expr("interval 1 day"))).alias(date_col)
    )
    keys = df.select(*key_cols).distinct()
    template = days.crossJoin(keys)
    if fill == 0:
        zeros = template.select(
            date_col,
            *key_cols,
            *[F.lit(0).cast(dict(df.dtypes)[v]).alias(v) for v in value_cols],
        )
        if start is not None and end is not None:
            # template semantics: only days inside the grid appear (the
            # join form dropped out-of-range data implicitly)
            df = df.filter(F.col(date_col).cast("date").between(start, end))
        unioned = df.select(date_col, *key_cols, *value_cols).unionByName(zeros)
        return unioned.groupBy(date_col, *key_cols).agg(
            *[F.sum(v).alias(v) for v in value_cols]
        )
    out = template.join(df, on=[date_col, *key_cols], how="left")
    return out.fillna(fill, subset=list(value_cols))


def full_outer_coverage(
    left: DataFrame, right: DataFrame, on: Sequence[str], indicator: str = "presence"
) -> DataFrame:
    """Full-outer join of two key spaces with a both/left_only/right_only
    indicator (J4 shape; rucio_datasets_stats.py:408-427 classifies file
    coverage between Rucio and DBS this way)."""
    lk = left.select(*on).distinct().withColumn("_l", F.lit(1))
    rk = right.select(*on).distinct().withColumn("_r", F.lit(1))
    joined = lk.join(rk, on=list(on), how="full")
    return joined.select(
        *on,
        F.when(F.col("_l").isNotNull() & F.col("_r").isNotNull(), "both")
        .when(F.col("_l").isNotNull(), "left_only")
        .otherwise("right_only")
        .alias(indicator),
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
) -> DataFrame:
    """Non-equi range join — point ∈ [start, end) — via bin bucketing.

    Beyond-reference custom operator: Spark's optimizer turns a bare
    range predicate into BroadcastNestedLoopJoin (all-pairs work per
    partition) — fine for tiny interval sets, catastrophic at scale.
    Bucketing restores an EQUI-join: each point lands in bin
    ``floor(p / w)``; each interval replicates to every bin its span
    overlaps (``span/w + 1`` rows, an explode of a bounded sequence);
    the join keys on bin and the exact range predicate filters
    residually. Shuffle is hash-partitioned on bin — work is
    O(|points| + Σ spans/w) with per-bin locality, never all-pairs;
    hot bins split by AQE skew handling.

    ``bin_width`` tunes replication vs bucket size: ≈ the typical
    interval span is a good default (≤2 bins per interval).

    Inputs are numeric (caller maps timestamps with e.g.
    ``F.unix_date``/``F.unix_timestamp``). Output: every (interval ×
    matching point) row pair's columns.
    """
    p_bin = F.floor(F.col(point_col) / bin_width).cast("long")
    binned_points = points.withColumn("_bin", p_bin)
    iv_bins = F.sequence(
        F.floor(F.col(start_col) / bin_width).cast("long"),
        # end is EXCLUSIVE: a span ending exactly on a bin edge must
        # not replicate into the next bin
        F.floor((F.col(end_col) - 1) / bin_width).cast("long"),
    )
    binned_iv = intervals.withColumn("_bin", F.explode(iv_bins))
    out = binned_points.join(binned_iv, on="_bin").filter(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col))
    )
    return out.drop("_bin")
