"""Mergeable frequency sketches (beyond-reference, brief §M8 "novel
sketch").

Count-Min sketch, Spark-first: the build is ONE narrow map (each row
derives its ``depth`` (row, bucket) coordinates as a row-local array)
plus ONE groupBy whose map-side partial aggregation caps the shuffle
at depth × width rows PER PARTITION — at 100 TB the shuffle carries
sketch cells, never input rows. The finished sketch is depth × width
counters: mergeable across days/streams by summing cell-wise (the
same property HLL gives approx_count_distinct), so daily sketches
roll up to monthly ones without touching the raw data.

Bucket hashing reuses the md5-derived integer base (functions/text.
int_base_hash) salted per sketch row, so the build is deterministic
and oracle-testable in pure DuckDB SQL — swap for ``F.xxhash64`` at
production scale (structure unchanged, oracle parity lost).

Estimate guarantee (Cormode & Muthukrishnan 2005): est(x) ≥ true(x)
always; est(x) ≤ true(x) + εN with probability 1-δ for width = ⌈e/ε⌉,
depth = ⌈ln 1/δ⌉ — property-tested in tests/test_properties.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from cmsspark_spark.functions.text import int_base_hash


def _bucket(key: Column, d: int, width: int) -> Column:
    """Row-d bucket of a key: md5-int of the salted key, mod width."""
    return int_base_hash(F.concat(F.lit(f"cm{d}|"), key)) % width


def count_min_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build a Count-Min sketch over ``key_col``.

    Returns (d, bucket, cnt): the non-zero cells of the depth × width
    counter matrix. Merge sketches by unioning and summing cnt per
    (d, bucket)."""
    key = F.col(key_col).cast("string")
    coords = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"), _bucket(key, d, width).alias("bucket")
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(coords).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates for ``probes[key_col]`` from a built
    sketch: min over the key's depth cells (missing cell → 0). The
    sketch side is a size-aware broadcast candidate (≤ depth × width
    rows by construction) — Catalyst/AQE will broadcast it, so probing
    never shuffles the probe stream."""
    key = F.col(key_col).cast("string")
    coords = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"), _bucket(key, d, width).alias("bucket")
            )
            for d in range(depth)
        ]
    )
    exploded = probes.select(
        F.col(key_col).alias("key"), F.explode(coords).alias("c")
    ).select("key", "c.d", "c.bucket")
    joined = exploded.join(sketch, on=["d", "bucket"], how="left")
    return joined.groupBy("key").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )


def _bloom_pos(key: Column, i: int, m_bits: int) -> Column:
    """Hash-i bit position of a key: md5-int of the salted key, mod m."""
    return int_base_hash(F.concat(F.lit(f"bf{i}|"), key)) % m_bits


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 4096, k_hashes: int = 4
) -> DataFrame:
    """Build a Bloom filter over ``key_col`` as mergeable word cells.

    Returns (word_idx, bits): the non-zero words of the m-bit array —
    32-bit words carried in 64-bit lanes (DuckDB BIGINT shifts are
    overflow-checked and error at bit 63, so capping lanes at 32 bits
    keeps the build bit-identical in both engines for the oracle). Same shuffle discipline as Count-Min: one narrow map derives
    each row's k bit coordinates, one groupBy with map-side partial
    ``bit_or`` caps the shuffle at ⌈m/64⌉ rows per partition — at
    100 TB the shuffle carries filter words, never input rows. Merge
    filters (daily → monthly, shard → global) by unioning cells and
    ``bit_or`` per word_idx; OR is idempotent so re-merges are safe.

    The membership probe this feeds is the scale path for benchmark
    decontamination (operators/pipeline.ngram_overlap broadcasts raw
    gram strings; a Bloom of the benchmark is ~bits/gram instead of the
    strings themselves). md5-derived positions keep the build
    deterministic and DuckDB-oracle-testable; swap int_base_hash for
    xxhash64 at production scale (structure unchanged, parity lost).

    False-positive rate ≈ (1 - e^(-k·n/m))^k; no false negatives —
    property-tested in tests/test_sketches.py.
    """
    key = F.col(key_col).cast("string")
    positions = F.array(*[_bloom_pos(key, i, m_bits) for i in range(k_hashes)])
    return (
        df.select(F.explode(positions).alias("pos"))
        .groupBy((F.col("pos") / 32).cast("long").alias("word_idx"))
        .agg(
            F.expr("bit_or(shiftleft(1L, CAST(pos % 32 AS INT)))").alias("bits")
        )
    )


def bloom_might_contain(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k_hashes: int = 4,
) -> DataFrame:
    """Membership probe: for each probe key, true iff ALL k of its bits
    are set (possible false positives, never false negatives). The
    filter side is ≤ ⌈m/64⌉ rows by construction — Catalyst/AQE
    broadcasts it, so probing never shuffles the probe stream beyond
    the per-key re-aggregation."""
    key = F.col(key_col).cast("string")
    positions = F.array(*[_bloom_pos(key, i, m_bits) for i in range(k_hashes)])
    exploded = probes.select(
        F.col(key_col).alias("key"), F.explode(positions).alias("pos")
    ).select(
        "key",
        (F.col("pos") / 32).cast("long").alias("word_idx"),
        (F.col("pos") % 32).cast("int").alias("bit"),
    )
    joined = exploded.join(F.broadcast(bloom), on="word_idx", how="left")
    hit = F.coalesce(
        F.expr("(bits & shiftleft(1L, bit)) != 0L"), F.lit(False)
    )
    return joined.groupBy("key").agg(
        F.min(hit.cast("int")).cast("boolean").alias("might_contain")
    )


# ---------------------------------------------------------------------------
# HyperLogLog (mergeable distinct sketch, oracle-exact)
# ---------------------------------------------------------------------------

_HLL_M = 64          # registers (b = 6 bits)
_HLL_ALPHA = 0.709   # Flajolet et al. 2007's α for m = 64
_HLL_VBITS = 46      # 52-bit md5 value minus 6 bucket bits


def _hll_v(key: Column) -> Column:
    """52-bit md5-derived value — same cross-engine-exact integer coin
    as mixture_resample (('0x'||substr(md5,1,13))::BIGINT in DuckDB)."""
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, 13), 16, 10
    ).cast("long")


def hll_build(df: DataFrame, key_col: str, group_cols: list) -> DataFrame:
    """Per-group HLL registers (Flajolet, Fusy, Gandouet, Meunier 2007):
    bucket = low 6 hash bits, register = max leading-zero rank of the
    remaining 46 bits. One narrow map + one groupBy whose map-side max
    caps the shuffle at ≤64 rows per group per partition — like the
    Count-Min build, the shuffle carries sketch cells, never rows.

    The rank uses ``length(bin(w))`` (bit length) instead of float
    log2, so registers are integer-exact and identical in DuckDB —
    this HLL's ESTIMATES are bit-reproducible cross-engine, unlike
    ``approx_count_distinct`` whose sketch internals are engine-
    private. Returns (group_cols..., bucket, register); merge sketches
    of disjoint runs by taking the per-bucket max."""
    v = _hll_v(F.col(key_col))
    w = (v / _HLL_M).cast("long")
    rank = F.when(w == 0, F.lit(_HLL_VBITS + 1)).otherwise(
        _HLL_VBITS + 1 - F.length(F.bin(w))
    )
    return (
        df.select(*group_cols, (v % _HLL_M).alias("bucket"), rank.alias("r"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("r").alias("register"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union sketches of disjoint data slices: per-bucket max — the
    property that lets daily distinct sketches roll up to monthly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("register",)]
    return out.groupBy(*keys).agg(F.max("register").alias("register"))


def hll_estimate(registers: DataFrame, group_cols: list) -> DataFrame:
    """Estimate from registers: E = α·m²/Σ2^(−M_j) with the standard
    small-range linear-counting correction (E ≤ 2.5m and empty
    buckets → m·ln(m/zeros)). Empty buckets contribute 2⁰; the sum
    folds in bucket order (array_sort → aggregate), mirroring the
    twin's ``list_reduce(list(… ORDER BY bucket))`` so the float
    estimate is cross-engine identical. 2^(−M) for integer M is a
    power of two — exactly representable."""
    m = _HLL_M
    packed = registers.groupBy(*group_cols).agg(
        F.array_sort(
            F.collect_list(F.struct("bucket", "register"))
        ).alias("_regs")
    )
    # full 64-bucket template: missing buckets read register 0
    reg_map = F.map_from_entries(
        F.transform("_regs", lambda e: F.struct(e["bucket"], e["register"]))
    )
    full = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda b: F.coalesce(F.element_at(reg_map, b), F.lit(0)),
    )
    s = F.aggregate(
        F.transform(full, lambda r: F.pow(F.lit(2.0), -r.cast("double"))),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    zeros = F.size(F.filter(full, lambda r: r == 0))
    raw = F.lit(_HLL_ALPHA) * m * m / s
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        m * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return packed.select(*group_cols, F.round(est, 2).alias("hll_estimate"))
