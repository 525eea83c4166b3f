"""Data-layout operators: Morton (z-order) and Hilbert clustering
keys, clustered parquet writes, file- and row-group-grain statistics
manifests, split pruning, and a skipping-quality report.

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


#: Hilbert grid side for the 2-D index (8 bits/dim, like ZORDER_BITS)
HILBERT_N = 1 << ZORDER_BITS


def hilbert_level_exprs(
    s: int,
    n: int = HILBERT_N,
    x: str = "_hx",
    y: str = "_hy",
    d: str = "_hd",
) -> dict[str, str]:
    """One level of the iterative Hilbert xy→d transform (the
    Wikipedia n-rotation variant, chosen because every intermediate
    stays in ``[0, n)`` — no negative values, so the SQL needs no
    signed-bit care) as THREE portable SQL expressions over the
    previous level's (x, y, d) columns. XOR-free: with rx ∈ {0,1},
    ``(3*rx) ^ ry`` is ``3-ry`` when rx=1 else ``ry`` (DuckDB's ``^``
    is exponentiation — never use it in shared SQL). The expressions
    reference their inputs more than once, so each level MUST be
    materialized as its own projection (withColumns / CTE), never
    substituted into the next level's string — nesting grows the
    expression tree exponentially."""
    rx = f"(CASE WHEN ({x} & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN ({y} & {s}) > 0 THEN 1 ELSE 0 END)"
    return {
        d: f"({d} + {s * s} * (CASE WHEN {rx} = 1"
           f" THEN 3 - {ry} ELSE {ry} END))",
        x: f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
           f" THEN {n - 1} - {y} ELSE {y} END) ELSE {x} END)",
        y: f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
           f" THEN {n - 1} - {x} ELSE {x} END) ELSE {y} END)",
    }


def hilbert_index(
    df: DataFrame, x: str, y: str, bits: int = ZORDER_BITS
) -> DataFrame:
    """Attach ``_hd``: the Hilbert-curve distance of bucketed integer
    columns ``x``, ``y`` (each already in ``[0, 2^bits)``). Hilbert
    beats Morton for range locality — consecutive index values are
    always grid NEIGHBORS (no Morton 'seam jumps'), so equal index
    ranges cover more compact rectangles and clustered files skip
    better on conjunctive range predicates. One projection per bit
    level (levels must materialize — see hilbert_level_exprs), all
    narrow and codegen'd; no shuffle, no UDF."""
    n = 1 << bits
    out = df.withColumns(
        {
            "_hx": F.col(x).cast("long"),
            "_hy": F.col(y).cast("long"),
            "_hd": F.lit(0).cast("long"),
        }
    )
    s = n // 2
    while s > 0:
        exprs = hilbert_level_exprs(s, n=n)
        out = out.withColumns({c: F.expr(e) for c, e in exprs.items()})
        s //= 2
    return out.drop("_hx", "_hy")


def hilbert_cte_chain(
    base: str,
    carry: Sequence[str],
    x: str,
    y: str,
    bits: int = ZORDER_BITS,
) -> tuple[str, str]:
    """DuckDB oracle twin of :func:`hilbert_index`: a chain of CTEs
    (one per bit level, materializing each projection — same
    anti-blowup rule) transforming (``x``, ``y``) from CTE ``base``
    into the Hilbert distance. Returns (cte_fragment, final_cte_name);
    the fragment starts with a comma, ready to splice after an
    existing WITH list. ``carry`` columns pass through untouched."""
    n = 1 << bits
    cols = ", ".join(carry)
    parts = [
        f"h0 AS (SELECT {cols}, CAST({x} AS BIGINT) AS _hx,"
        f" CAST({y} AS BIGINT) AS _hy, CAST(0 AS BIGINT) AS _hd"
        f" FROM {base})"
    ]
    k = 0
    s = n // 2
    while s > 0:
        e = hilbert_level_exprs(s, n=n)
        parts.append(
            f"h{k + 1} AS (SELECT {cols}, {e['_hx']} AS _hx,"
            f" {e['_hy']} AS _hy, {e['_hd']} AS _hd FROM h{k})"
        )
        k += 1
        s //= 2
    return ",\n    " + ",\n    ".join(parts), f"h{k}"


def hilbert_write(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    n_files: int,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Hilbert distance of ``(x, y)`` — same shape as :func:`zorder_write`
    (one min/max scalar agg, narrow key map, one range exchange) with
    the better-locality curve: Hilbert file footprints are compact
    rectangles with no Morton seam jumps, so conjunctive range
    predicates prune more files at equal file counts."""
    keyed, key = curve_key(df, x, y, curve="hilbert", bits=bits)
    (
        keyed.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .drop(key)
        .write.mode("overwrite")
        .parquet(path)
    )


def curve_key(
    df: DataFrame,
    x: str,
    y: str,
    curve: str = "hilbert",
    bits: int = ZORDER_BITS,
) -> tuple[DataFrame, str]:
    """Attach a space-filling-curve key over ``(x, y)`` — ``"zorder"``
    (Morton) or ``"hilbert"`` — bucketing each column to ``bits`` bits
    from its global min/max first. Returns ``(df_with_key, key_col)``
    with every intermediate column dropped, so callers can feed the
    result straight into ``repartitionByRange(key)`` (clustered
    writes, compaction). Same cost shape as :func:`zorder_key`: one
    scalar min/max agg broadcast + a narrow key map."""
    if curve == "zorder":
        return zorder_key(df, x, y, bits=bits), "_zkey"
    if curve != "hilbert":
        raise ValueError(f"unknown curve {curve!r}")
    mm = df.agg(
        F.min(x).alias("_min0"),
        F.max(x).alias("_max0"),
        F.min(y).alias("_min1"),
        F.max(y).alias("_max1"),
    )
    bx = bucket_expr(x, "_min0", "_max0", 1 << bits)
    by = bucket_expr(y, "_min1", "_max1", 1 << bits)
    keyed = hilbert_index(
        df.crossJoin(F.broadcast(mm))
        .withColumn("_bx", F.expr(bx))
        .withColumn("_by", F.expr(by)),
        "_bx",
        "_by",
        bits=bits,
    )
    return (
        keyed.drop("_bx", "_by", "_min0", "_max0", "_min1", "_max1"),
        "_hd",
    )


def rowgroup_stats_manifest(
    spark, path: str, dims: Sequence[str]
) -> DataFrame:
    """Row-group-grain min/max/rowcount manifest — one level below
    :func:`file_stats_manifest`, matching what parquet readers
    actually prune with (a file whose span looks useless can still
    skip most of its ROW GROUPS when rows are sorted/clustered within
    it — exactly what ``sortWithinPartitions`` in the clustered write
    paths buys). ``binaryFile`` does the distributed listing; each
    task parses its files' parquet FOOTERS with pyarrow — metadata
    only, no row group is ever decompressed. ``dims`` must be integer
    columns (the manifest schema types them long). At 100 TB you'd
    maintain this table at write time or use ranged footer reads
    instead of whole-file ``binaryFile`` content; this operator is
    the audit/backfill path."""
    dims = tuple(dims)
    schema = (
        "file string, row_group int, n_rows long, "
        + ", ".join(f"min_{d} long, max_{d} long" for d in dims)
    )
    cols = ["file", "row_group", "n_rows"] + [
        f"{m}_{d}" for d in dims for m in ("min", "max")
    ]

    def parse(batches):
        import os

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for pth, content in zip(pdf["path"], pdf["content"]):
                md = pq.ParquetFile(pa.BufferReader(content)).metadata
                names = {
                    md.schema.column(j).name: j
                    for j in range(md.num_columns)
                }
                for i in range(md.num_row_groups):
                    rg = md.row_group(i)
                    rec = {
                        "file": os.path.basename(pth),
                        "row_group": i,
                        "n_rows": rg.num_rows,
                    }
                    for d in dims:
                        st = rg.column(names[d]).statistics
                        rec[f"min_{d}"] = st.min
                        rec[f"max_{d}"] = st.max
                    rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    files = (
        spark.read.format("binaryFile")
        .load(f"{path}/*.parquet")
        .select("path", "content")
    )
    return files.mapInPandas(parse, schema=schema)
