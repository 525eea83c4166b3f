"""Data-layout operators: z-order clustering keys, per-file statistics
manifests, and a skipping-quality report.

At 100 TB the scan IS the query: what the engine reads is governed by
file-level min/max statistics (parquet footers, lakehouse manifests)
and therefore by the layout rows were written in. A table sorted on
one key skips perfectly on that key and not at all on any other; a
Morton (z-order) interleave of two keys bounds BOTH dimensions' span
per file, so range predicates on either column prune files. These
operators make that trade measurable and writable:

- :func:`interleave_expr` — engine-portable SQL for the Morton key
  (the same string parses in Spark SQL and DuckDB);
- :func:`zorder_write` — the write path: bucket, interleave,
  ``repartitionByRange`` on the z-key, sort within partitions, write
  parquet (one global min/max agg — metadata-cheap from footers at
  scale — then a narrow map; the only shuffle is the range exchange
  the clustered write requires);
- :func:`file_stats_manifest` — per-file min/max/rowcount stats over
  an existing layout via ``input_file_name()``, the manifest a
  stats-based planner consults before listing splits.

Beyond-reference capability (the reference pipelines rewrite parquet
snapshots daily but never cluster them); design follows the public
Delta Lake ``OPTIMIZE ZORDER BY`` / Hudi space-filling-curve layout
write, re-expressed as native Catalyst column expressions.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: bits per dimension in the z-order key (two dims -> 2*BITS-bit key)
ZORDER_BITS = 8


def bucket_expr(
    col: str, cmin: str, cmax: str, n: int, engine: str = "spark"
) -> str:
    """SQL for an equi-width integer bucket of ``col`` into ``[0, n)``
    given its global min/max: ``((col - min) * n) intdiv (span + 1)``.

    Pure integer arithmetic — no float division whose rounding could
    diverge between engines — and strictly below ``n`` because
    ``(d * n) intdiv (d + 1) <= n - 1`` for every span ``d >= 0``.
    ``engine`` picks the integer-division spelling (Spark ``div``,
    DuckDB ``//``); everything else is shared syntax.
    """
    intdiv = "div" if engine == "spark" else "//"
    return f"((({col} - {cmin}) * {n}) {intdiv} ({cmax} - {cmin} + 1))"


def interleave_expr(*cols: str, bits: int = ZORDER_BITS) -> str:
    """SQL for the Morton interleave of N ``bits``-bit non-negative
    ints: bit ``i`` of column ``j`` lands at position ``i*N + j`` —
    for two columns the classic z-order (x→2i, y→2i+1). Built from
    ``>>``, ``&``, ``*`` and ``+`` only — the identical string parses
    in Spark SQL and DuckDB, so the oracle can never drift from the
    engine on the key itself. Key width is ``bits*N`` bits; the
    assert keeps it inside a signed 64-bit integer in both engines."""
    n = len(cols)
    assert n >= 1 and bits * n <= 62, "z-key must fit a signed BIGINT"
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            terms.append(f"((({c} >> {i}) & 1) * {1 << (i * n + j)})")
    return "(" + " + ".join(terms) + ")"


def zorder_key(
    df: DataFrame, *cols: str, bits: int = ZORDER_BITS
) -> DataFrame:
    """Attach ``_zkey``: the z-order key of N integer columns, each
    equi-width-bucketed to ``bits`` bits from its global min/max. The
    min/max pass is one scalar aggregate (at scale the reader answers
    it from parquet footers without touching row groups); the key
    itself is a narrow, codegen'd map — no window, no rank, no extra
    shuffle."""
    aggs = []
    for j, c in enumerate(cols):
        aggs.append(F.min(c).alias(f"_min{j}"))
        aggs.append(F.max(c).alias(f"_max{j}"))
    mm = df.agg(*aggs)
    buckets = [
        bucket_expr(c, f"_min{j}", f"_max{j}", 1 << bits)
        for j, c in enumerate(cols)
    ]
    drop = [f"_min{j}" for j in range(len(cols))] + [
        f"_max{j}" for j in range(len(cols))
    ]
    return (
        df.crossJoin(F.broadcast(mm))
        .withColumn("_zkey", F.expr(interleave_expr(*buckets, bits=bits)))
        .drop(*drop)
    )


def zorder_write(
    df: DataFrame,
    path: str,
    *cols: str,
    n_files: int,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    z-order of ``cols``: ``repartitionByRange`` over the z-key (the
    one shuffle any clustered write needs) + ``sortWithinPartitions``
    so row groups inside each file are also z-contiguous, then drop
    the key — layout is physical, not schema."""
    keyed = zorder_key(df, *cols, bits=bits)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats_manifest(
    df: DataFrame, dims: Sequence[str]
) -> DataFrame:
    """Per-file min/max/rowcount manifest over an already-written
    layout: the table a stats-based planner consults to prune splits
    before listing them. One shuffle on (file) cells — the map side
    partial-aggregates each file's stats down to a single row, so the
    exchange carries O(n_files) rows regardless of table size."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for d in dims:
        aggs.append(F.min(d).alias(f"min_{d}"))
        aggs.append(F.max(d).alias(f"max_{d}"))
    return (
        df.withColumn(
            "file", F.substring_index(F.input_file_name(), "/", -1)
        )
        .groupBy("file")
        .agg(*aggs)
    )


def pruned_files(
    manifest: DataFrame, dim: str, lo, hi
) -> DataFrame:
    """Split-pruning decision over a stats manifest: keep only files
    whose ``[min_dim, max_dim]`` range intersects ``[lo, hi]`` — the
    complement is skipped without opening a footer. Driver-sized
    input (one row per file), pure filter."""
    return manifest.filter(
        (F.col(f"max_{dim}") >= F.lit(lo))
        & (F.col(f"min_{dim}") <= F.lit(hi))
    )
