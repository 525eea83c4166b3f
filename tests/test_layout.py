"""Data-layout operators (operators/layout.py): z-order keys, real
clustered parquet writes, footer-stats manifests, split pruning."""

from __future__ import annotations

import random

import duckdb
import pyspark.sql.functions as F
import pytest

from cmsspark_spark import plans
from cmsspark_spark.operators import layout as L


def _morton_py(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_expr_matches_python_reference(spark):
    """The generated SQL Morton key equals a bit-twiddling Python
    reference for random pairs, in BOTH engines (the same string is
    embedded in the Spark query and the DuckDB oracle)."""
    rng = random.Random(7)
    pairs = [(rng.randrange(256), rng.randrange(256)) for _ in range(64)]
    pairs += [(0, 0), (255, 255), (255, 0), (0, 255), (1, 2)]
    expr = L.interleave_expr("x", "y")
    con = duckdb.connect()
    for x, y in pairs:
        got = con.execute(
            f"SELECT {expr} FROM (SELECT {x} AS x, {y} AS y)"
        ).fetchone()[0]
        assert got == _morton_py(x, y), (x, y)
    con.close()
    sdf = spark.createDataFrame(pairs, "x: long, y: long").select(
        "x", "y", F.expr(expr).alias("z")
    )
    for r in sdf.collect():
        assert r.z == _morton_py(r.x, r.y), (r.x, r.y)


def test_bucket_expr_never_reaches_n(spark):
    """Equi-width integer buckets stay in [0, n) for every value in
    [min, max] — including max itself (the (d*n) div (d+1) bound)."""
    con = duckdb.connect()
    for cmin, cmax in [(0, 0), (0, 1), (3, 17), (0, 255), (100, 1000)]:
        lo, hi = con.execute(
            f"SELECT min(b), max(b) FROM (SELECT "
            f"{L.bucket_expr('v', str(cmin), str(cmax), 16, 'duck')} AS b "
            f"FROM (SELECT unnest(generate_series({cmin}, {cmax})) AS v))"
        ).fetchone()
        assert lo == 0 and hi <= 15, (cmin, cmax, lo, hi)
    con.close()


def test_bucket_expr_survives_nanosecond_epoch_spans(spark):
    """r8 (ADVICE): spans past 2^62/n used to overflow the
    multiply-first int64 form, silently corrupting buckets (Spark
    wraps). The SQL CASE guard switches to divide-first: buckets stay
    in [0, n), are monotone in the value, and Spark and DuckDB agree
    on every one."""
    # nanosecond-epoch-like bigints: span ~1.7e18 >> 2^62/16
    vals = [
        0, 1, 10**9, 1_700_000_000_000_000_000,
        1_700_000_000_000_000_001, 2**63 - 2, 2**63 - 1,
    ]
    cmin, cmax = str(min(vals)), str(2**63 - 1)
    sexpr = L.bucket_expr("v", cmin, cmax, 16, "spark")
    sdf = spark.createDataFrame(
        [(v,) for v in vals], "v long"
    ).selectExpr("v", f"{sexpr} AS b").orderBy("v")
    srows = [(r.v, r.b) for r in sdf.collect()]
    con = duckdb.connect()
    dexpr = L.bucket_expr("v", cmin, cmax, 16, "duck")
    drows = con.execute(
        f"SELECT v, {dexpr} AS b FROM (SELECT unnest(?::BIGINT[]) AS v) "
        f"ORDER BY v", [vals]
    ).fetchall()
    con.close()
    assert srows == [(v, b) for v, b in drows]
    buckets = [b for _, b in srows]
    assert all(0 <= b < 16 for b in buckets), buckets
    assert buckets == sorted(buckets)  # monotone
    assert buckets[0] == 0 and buckets[-1] == 15  # spans the range


def test_zorder_write_real_file_pruning(spark, tmp_path):
    """The write path against REAL parquet: z-order a 64x64 key grid
    into 16 files, rebuild the footer-stats manifest from
    input_file_name, and show (a) every file bounds BOTH dimensions
    (vs a linear sort whose second dim spans everything), (b) a range
    predicate on either dimension prunes most files via stats alone,
    (c) the pruned read returns exactly the right rows."""
    rows = [(x, y, x * 64 + y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "a: long, b: long, payload: long")

    zpath = str(tmp_path / "zorder")
    L.zorder_write(df, zpath, "a", "b", n_files=16)
    spath = str(tmp_path / "sorted")
    (
        df.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.parquet(spath)
    )

    zman = L.file_stats_manifest(spark.read.parquet(zpath), ["a", "b"])
    sman = L.file_stats_manifest(spark.read.parquet(spath), ["a", "b"])
    z = zman.collect()
    s = sman.collect()
    assert len(z) == 16 and sum(r.n_rows for r in z) == 64 * 64

    def avg_span(rows, d):
        return sum(
            (r[f"max_{d}"] - r[f"min_{d}"] + 1) / 64.0 for r in rows
        ) / len(rows)

    # z-order bounds both dims (ideal tile = 0.25; range-partition
    # sampling wobble can merge neighbouring tiles, hence the slack);
    # the linear sort is tight on `a` but spans ~all of `b`.
    assert avg_span(z, "a") <= 0.45 and avg_span(z, "b") <= 0.45
    assert avg_span(s, "a") <= 0.2
    assert avg_span(s, "b") >= 0.9

    # stats-only split pruning on the NON-sort dim: z-order keeps a
    # minority of files; the sorted layout cannot skip any.
    zkeep = L.pruned_files(zman, "b", 0, 15).count()
    skeep = L.pruned_files(sman, "b", 0, 15).count()
    assert zkeep <= 8 < skeep == 16

    # and the pruned set is CORRECT: reading only surviving files
    # yields exactly the predicate's rows.
    keep_files = [r.file for r in L.pruned_files(zman, "b", 0, 15).collect()]
    got = (
        spark.read.parquet(zpath)
        .withColumn("f", F.substring_index(F.input_file_name(), "/", -1))
        .filter(F.col("f").isin(keep_files))
        .filter(F.col("b") <= 15)
        .count()
    )
    assert got == 64 * 16


def test_layout_report_plan_is_narrow(spark):
    """The skipping report is zero-window: file ids are value-range
    arithmetic (narrow map over the scan), the min/max frame enters
    via a 1-row broadcast, and the only exchanges carry (layout,
    file_id) stat cells. The scan reads just the 4 key columns."""
    from cmsspark_spark.queries import QUERIES

    df = QUERIES["layout_skipping_report"](spark, "/root/testdata/sf0.001")
    plan = plans.formatted_plan(df)
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row min/max frame
    for col in ("l_comment", "l_extendedprice", "l_shipdate"):
        assert col not in plan


def test_interleave_expr_n_dims():
    """The N-dim generalization round-robins bit i of column j to
    position i*N + j — checked against a Python reference for 3
    dims, plus the BIGINT-width guard."""
    def morton3(x, y, z, bits=8):
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (3 * i)
            out |= ((y >> i) & 1) << (3 * i + 1)
            out |= ((z >> i) & 1) << (3 * i + 2)
        return out

    expr = L.interleave_expr("x", "y", "z")
    con = duckdb.connect()
    rng = random.Random(3)
    for _ in range(32):
        x, y, z = (rng.randrange(256) for _ in range(3))
        got = con.execute(
            f"SELECT {expr} FROM (SELECT {x} AS x, {y} AS y, {z} AS z)"
        ).fetchone()[0]
        assert got == morton3(x, y, z)
    con.close()
    with pytest.raises(AssertionError):
        L.interleave_expr(*"abcdefgh", bits=8)  # 64 bits > signed 62


def _hilbert_py(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_clustered_writes_maintain_manifest_sidecar(spark, tmp_path):
    """r8 (verdict #3): zorder_write/hilbert_write emit the file-grain
    stats manifest at write time (footer reads of just-written files,
    no table scan). The sidecar must agree exactly with a scan-derived
    file_stats_manifest, and pruned_files over the sidecar must make
    the same keep/skip decisions."""
    rows = [(x, y, x * 64 + y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "a: long, b: long, payload: long")
    for writer, args in (
        (L.zorder_write, ("a", "b")),
        (L.hilbert_write, ("a", "b")),
    ):
        path = str(tmp_path / writer.__name__)
        if writer is L.zorder_write:
            writer(df, path, *args, n_files=16)
        else:
            writer(df, path, args[0], args[1], n_files=16)
        side = spark.read.parquet(L.manifest_location(path))
        scan = L.file_stats_manifest(spark.read.parquet(path), ["a", "b"])
        cols = ["file", "n_rows", "min_a", "max_a", "min_b", "max_b"]
        assert sorted(map(tuple, side.select(cols).collect())) == sorted(
            map(tuple, scan.select(cols).collect())
        )
        assert L.pruned_files(side, "b", 0, 15).count() == L.pruned_files(
            scan, "b", 0, 15
        ).count()


def test_append_with_manifest_extends_sidecar_incrementally(spark, tmp_path):
    """r8: appending an increment extends the manifest by parsing ONLY
    the new files' footers — prior rows survive byte-identically, the
    union always lists exactly the live files, and the de-clustered
    appended files show their (wide) true spans so pruned_files stays
    correct."""
    rows = [(x, y, x * 64 + y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "a: long, b: long, payload: long")
    path = str(tmp_path / "t")
    L.zorder_write(df, path, "a", "b", n_files=8)
    man1 = {
        r.file: tuple(r)
        for r in spark.read.parquet(L.manifest_location(path)).collect()
    }

    inc = spark.createDataFrame(
        [(x, y, -1) for x in range(64) for y in range(64) if (x + y) % 31 == 0],
        "a: long, b: long, payload: long",
    ).coalesce(1)
    new_files = L.append_with_manifest(inc, path, ["a", "b"])
    assert len(new_files) == 1

    man2 = {
        r.file: tuple(r)
        for r in spark.read.parquet(L.manifest_location(path)).collect()
    }
    for f, row in man1.items():  # old rows untouched
        assert man2[f] == row
    on_disk = {p.rsplit("/", 1)[-1] for p in L._list_parquet_files(spark, path)}
    assert set(man2) == on_disk
    # the appended file is de-clustered: spans ~the whole key space
    new_name = new_files[0].rsplit("/", 1)[-1]
    nf = [r for r in spark.read.parquet(L.manifest_location(path)).collect()
          if r.file == new_name][0]
    assert nf.max_a - nf.min_a > 32 and nf.max_b - nf.min_b > 32
    # pruning over the updated manifest matches a scan-derived one
    scan = L.file_stats_manifest(spark.read.parquet(path), ["a", "b"])
    side = spark.read.parquet(L.manifest_location(path))
    assert L.pruned_files(side, "b", 0, 7).count() == L.pruned_files(
        scan, "b", 0, 7
    ).count()


def test_compaction_candidates_flag_declustered_appends(spark, tmp_path):
    """r8: the manifest-only OPTIMIZE trigger — a freshly clustered
    table is healthy (not flagged); after an append the manifest
    shows the new file's wide span and the table becomes a compaction
    candidate, decided without reading any data."""
    rows = [(x, y, x * 64 + y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "a: long, b: long, payload: long")
    path = str(tmp_path / "t")
    L.hilbert_write(df, path, "a", "b", n_files=16)
    man = spark.read.parquet(L.manifest_location(path))
    health = L.clustering_health(man, ["a", "b"]).collect()[0]
    assert health.n_files == 16 and health.n_rows == 64 * 64
    assert health.span_frac_a <= 0.5 and health.span_frac_b <= 0.5
    assert L.compaction_candidates(man, ["a", "b"], max_files=20).count() == 0

    # de-clustering append: wide-span files land, manifest extends
    inc = spark.createDataFrame(
        [(x, y, -1) for x in range(64) for y in range(64)
         if (x * 64 + y) % 7 == 0],
        "a: long, b: long, payload: long",
    ).repartition(6)
    L.append_with_manifest(inc, path, ["a", "b"])
    man2 = spark.read.parquet(L.manifest_location(path))
    # mean span fraction rises from the ~0.3 clustered level toward
    # 1.0 as wide appended files dilute the tiles; a 0.4 gate catches
    # it while the pre-append layout stayed comfortably below
    pre = L.compaction_candidates(
        man, ["a", "b"], max_files=50, max_span_frac=0.4
    )
    assert pre.count() == 0
    flagged = L.compaction_candidates(
        man2, ["a", "b"], max_files=50, max_span_frac=0.4
    )
    assert flagged.count() == 1  # span degradation alone trips it


def test_write_file_manifest_rowgroup_sidecar(spark, tmp_path):
    """rowgroups=True writes the row-group-grain table beside the
    file-grain one from a single footer parse; its per-file rollup
    must equal the file-grain rows exactly."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(x, x * 2) for x in range(4096)], "a: long, b: long"
    )
    (
        df.repartitionByRange(4, "a")
        .sortWithinPartitions("a")
        .write.option("parquet.block.size", 32 * 1024)
        .parquet(path)
    )
    dest = L.write_file_manifest(spark, path, ["a", "b"], rowgroups=True)
    fileg = spark.read.parquet(dest)
    rg = spark.read.parquet(dest + "_rowgroups")
    assert rg.count() >= fileg.count()
    roll = rg.groupBy("file").agg(
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.min("min_a").alias("min_a"),
        F.max("max_a").alias("max_a"),
        F.min("min_b").alias("min_b"),
        F.max("max_b").alias("max_b"),
    )
    cols = ["file", "n_rows", "min_a", "max_a", "min_b", "max_b"]
    assert sorted(map(tuple, roll.select(cols).collect())) == sorted(
        map(tuple, fileg.select(cols).collect())
    )
    assert sum(r.n_rows for r in fileg.collect()) == 4096


def test_hilbert_index_matches_python_reference(spark):
    """Spark hilbert_index equals the bit-level Python reference (the
    same xy2d loop the SQL levels are generated from) on random and
    corner points; the DuckDB chain is exercised by the registered
    oracle, so both engines pin to the same curve."""
    rng = random.Random(13)
    pts = [(rng.randrange(256), rng.randrange(256)) for _ in range(64)]
    pts += [(0, 0), (255, 255), (0, 255), (255, 0)]
    df = spark.createDataFrame(pts, "x: long, y: long")
    out = L.hilbert_index(df, "x", "y").collect()
    for r in out:
        assert r._hd == _hilbert_py(256, r.x, r.y), (r.x, r.y)


def test_hilbert_adjacency_locality(spark):
    """The definitive Hilbert property on a full 32x32 grid: the index
    is a bijection onto [0, 1024) and CONSECUTIVE index values are
    always grid neighbors (Manhattan distance exactly 1) — the
    locality guarantee Morton does not have (z-order has seam jumps)."""
    pts = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, "x: long, y: long")
    rows = L.hilbert_index(df, "x", "y", bits=5).collect()
    pos = {r._hd: (r.x, r.y) for r in rows}
    assert len(pos) == 1024 and set(pos) == set(range(1024))
    assert all(
        abs(pos[d][0] - pos[d + 1][0]) + abs(pos[d][1] - pos[d + 1][1]) == 1
        for d in range(1023)
    )


def test_hilbert_write_real_file_pruning(spark, tmp_path):
    """hilbert_write against real parquet: both dims bounded per file
    (like z-order) and stats-only pruning keeps a minority of files on
    the non-sort dim."""
    rows = [(x, y, x * 64 + y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "a: long, b: long, payload: long")
    hpath = str(tmp_path / "hilbert")
    L.hilbert_write(df, hpath, "a", "b", n_files=16)
    man = L.file_stats_manifest(spark.read.parquet(hpath), ["a", "b"])
    rows = man.collect()
    assert len(rows) == 16 and sum(r.n_rows for r in rows) == 64 * 64

    def avg_span(rs, dcol):
        return sum(
            (r[f"max_{dcol}"] - r[f"min_{dcol}"] + 1) / 64.0 for r in rs
        ) / len(rs)

    assert avg_span(rows, "a") <= 0.45 and avg_span(rows, "b") <= 0.45
    assert L.pruned_files(man, "b", 0, 15).count() <= 8


def test_rowgroup_stats_manifest_sub_file_pruning(spark, tmp_path):
    """Row-group grain beats file grain when rows are sorted WITHIN
    the file: one pyarrow-written file with 4 row groups sorted on
    `a` has file-level span 1.0 but tight per-row-group spans — the
    pruning sortWithinPartitions buys inside each clustered file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = sorted(
        ((x, y) for x in range(64) for y in range(64)),
        key=lambda t: (t[0], t[1]),
    )
    tbl = pa.table(
        {
            "a": pa.array([r[0] for r in rows], pa.int64()),
            "b": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    path = str(tmp_path / "t")
    import os

    os.makedirs(path)
    pq.write_table(tbl, f"{path}/part-0.parquet", row_group_size=1024)

    man = L.rowgroup_stats_manifest(spark, path, ["a", "b"]).collect()
    assert len(man) == 4 and sum(r.n_rows for r in man) == 4096
    # file grain: spans everything on `a`
    fstats = L.file_stats_manifest(
        spark.read.parquet(path), ["a", "b"]
    ).collect()
    assert (fstats[0].max_a - fstats[0].min_a + 1) == 64
    # row-group grain: each covers exactly a quarter of `a`
    for r in sorted(man, key=lambda r: r.row_group):
        assert r.max_a - r.min_a + 1 == 16, r
    # predicate a in [0, 15] -> exactly ONE of four row groups survives
    keep = [r for r in man if r.max_a >= 0 and r.min_a <= 15]
    assert len(keep) == 1 and keep[0].row_group == 0


def test_footer_reader_scheme_map(spark, tmp_path):
    """r9: remote-scheme handling is explicit — local file:/ URIs and
    bare paths read footers; an unmapped scheme (abfs) raises a clear
    ValueError naming the scheme instead of a pyarrow traceback."""
    import pytest as _pytest

    from cmsspark_spark.operators.layout import _make_footer_reader

    reader = _make_footer_reader()
    p = str(tmp_path / "t")
    spark.createDataFrame([(1,), (2,)], "x long").coalesce(1).write.parquet(p)
    import glob

    f = glob.glob(f"{p}/*.parquet")[0]
    assert reader(f).num_rows == 2           # bare OS path
    assert reader("file://" + f).num_rows == 2   # file:// URI
    assert reader("file:" + f).num_rows == 2     # Hadoop file:/ form
    with _pytest.raises(ValueError, match="abfs"):
        reader("abfs://container@acct.dfs.core.windows.net/x.parquet")


def test_hadoop_footer_fallback_reads_only_tail(spark, tmp_path):
    """r10 (VERDICT item 5): schemes pyarrow lacks go through the
    driver-side Hadoop ranged read — two positioned readFully calls
    fetch ONLY the 8-byte trailer + thrift footer, and the metadata
    parsed from that tail equals pyarrow's direct parse. The
    _TailOnlyFile view errors on any read outside the fetched range,
    so a regression toward whole-file reads fails loudly."""
    import glob
    import os

    import pyarrow.parquet as pq
    import pytest as _pytest

    from cmsspark_spark.operators.layout import (
        _TailOnlyFile,
        _hadoop_footer_tail,
        hadoop_footer_metadata,
    )

    import hashlib

    p = str(tmp_path / "t")
    pad = [hashlib.md5(str(i).encode()).hexdigest() * 4 for i in range(20000)]
    spark.createDataFrame(
        [(i, pad[i]) for i in range(20000)], "x long, pad string"
    ).coalesce(1).write.parquet(p)
    f = glob.glob(f"{p}/*.parquet")[0]
    fsize = os.path.getsize(f)
    assert fsize > 4 * 65536  # big enough that the 64 KiB tail is a tail

    size, start, tail = _hadoop_footer_tail(spark, "file:" + f)
    assert size == fsize
    assert len(tail) == size - start
    assert len(tail) < fsize / 4, "tail read is not footer-sized"

    md = hadoop_footer_metadata(spark, "file:" + f)
    direct = pq.ParquetFile(f).metadata
    assert md.num_rows == direct.num_rows == 20000
    assert md.num_row_groups == direct.num_row_groups
    st = md.row_group(0).column(0).statistics
    dt = direct.row_group(0).column(0).statistics
    assert (st.min, st.max) == (dt.min, dt.max)

    # the tail view refuses reads outside the fetched range
    view = _TailOnlyFile(size, start, tail)
    view.seek(0)
    with _pytest.raises(IOError, match="outside fetched footer tail"):
        view.read(8)


def test_rowgroup_manifest_routes_unmapped_scheme_via_driver(
    spark, tmp_path, monkeypatch
):
    """r10: rowgroup_stats_manifest splits its file list by scheme —
    pyarrow-mapped schemes go to executors, anything else (abfs here)
    to the driver-side Hadoop fallback — and the two branches union
    into one manifest frame."""
    import glob

    import pyarrow.parquet as pq

    from cmsspark_spark.operators import layout as L

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(i,) for i in range(100)], "x long"
    ).coalesce(1).write.parquet(p)
    f = glob.glob(f"{p}/*.parquet")[0]

    seen = []

    def fake_hadoop_md(_spark, pth):
        seen.append(pth)
        return pq.ParquetFile(f).metadata

    monkeypatch.setattr(L, "hadoop_footer_metadata", fake_hadoop_md)
    man = L.rowgroup_stats_manifest(
        spark,
        p,
        ["x"],
        files=[f, "abfs://c@a.dfs.core.windows.net/remote.parquet"],
    ).collect()
    assert seen == ["abfs://c@a.dfs.core.windows.net/remote.parquet"]
    by_file = {r.file: r for r in man}
    assert set(by_file) == {f.rsplit("/", 1)[-1], "remote.parquet"}
    assert by_file["remote.parquet"].min_x == 0
    assert by_file["remote.parquet"].max_x == 99


def test_bloom_sidecar_prunes_point_lookups_and_extends(spark, tmp_path):
    """r10 (VERDICT item 7): on a hash-scattered (unsorted) layout a
    high-cardinality point lookup prunes NOTHING by min/max — every
    file's range covers the key — while the Bloom sidecar keeps only
    the true file (plus rare false positives) and prunes everything
    for an absent key. Appends extend the sidecar with exactly the
    new files' rows (cost ∝ increment)."""
    import pyspark.sql.functions as F  # noqa: F811

    from cmsspark_spark.operators import layout as L

    p = str(tmp_path / "t")
    # ingest-ordered (hash-scattered) writes: ids interleave across
    # files, so per-file [min,max] spans ~the whole domain
    spark.createDataFrame(
        [(i,) for i in range(2000)], "doc_id long"
    ).repartition(8, F.col("doc_id") % 8).write.parquet(p)

    df = spark.read.parquet(p)
    stats = L.file_stats_manifest(df, ["doc_id"])
    bloom = L.file_bloom_manifest(df, "doc_id")
    man = stats.join(bloom, "file").localCheckpoint(eager=True)
    n_files = man.count()
    assert n_files >= 4  # hash of (doc_id % 8) may merge partitions

    present, absent = 1234, 10_000_001
    by_minmax = L.pruned_files(man, "doc_id", present, present).count()
    assert by_minmax == n_files, "unsorted layout: min/max prunes nothing"
    kept = L.pruned_files_bloom(man, "doc_id", present).collect()
    assert 1 <= len(kept) <= 2, f"bloom should keep ~1 file, got {len(kept)}"
    true_file = (
        df.filter(F.col("doc_id") == present)
        .select(F.substring_index(F.input_file_name(), "/", -1).alias("f"))
        .first()
        .f
    )
    assert true_file in {r.file for r in kept}  # never a false negative
    assert L.pruned_files_bloom(man, "doc_id", absent).count() <= 1

    # files WITHOUT a bloom row are conservatively kept
    nak = man.withColumn(
        "bloom_doc_id", F.lit(None).cast("array<bigint>")
    )
    assert L.pruned_files_bloom(nak, "doc_id", present).count() == n_files

    # write-time maintenance: the append extends the sidecar by the
    # new files only
    L.write_bloom_manifest(spark, p, "doc_id")  # baseline sidecar
    side0 = spark.read.parquet(L.manifest_location(p) + "_bloom")
    rows0 = side0.count()
    inc = spark.createDataFrame([(50_000 + i,) for i in range(10)],
                                "doc_id long").coalesce(1)
    new_files = L.append_with_manifest(inc, p, ["doc_id"],
                                       bloom_dim="doc_id")
    side1 = spark.read.parquet(L.manifest_location(p) + "_bloom")
    assert side1.count() == rows0 + len(new_files)
    names = {f.rsplit("/", 1)[-1] for f in new_files}
    assert {
        r.file for r in side1.collect()
    } - {r.file for r in side0.collect()} == names


def test_vacuum_removes_only_aged_manifest_orphans(spark, tmp_path):
    """r10: VACUUM deletes exactly the parquet files the manifest does
    not list AND that are older than the age guard — a fresh orphan
    (concurrent writer's not-yet-manifested file) survives, manifested
    data survives, and the table still reads identically."""
    import shutil

    from cmsspark_spark.operators import layout as L

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(i,) for i in range(100)], "x long"
    ).coalesce(2).write.parquet(p)
    L.write_file_manifest(spark, p, ["x"])
    n0 = spark.read.parquet(p).count()

    # plant an orphan: a parquet file the manifest knows nothing about
    import glob
    import os

    donor = glob.glob(f"{p}/*.parquet")[0]
    orphan = f"{p}/part-orphan-stale.snappy.parquet"
    shutil.copy(donor, orphan)
    os.utime(orphan, (1, 1))  # ancient mtime → past any age guard
    fresh = f"{p}/part-orphan-fresh.snappy.parquet"
    shutil.copy(donor, fresh)  # mtime now → protected by the guard

    rep = L.vacuum_table(spark, p, min_age_s=3600, dry_run=True)
    assert [o[0].rsplit("/", 1)[-1] for o in rep["orphans"]] == [
        "part-orphan-stale.snappy.parquet"
    ]
    assert rep["deleted"] == [] and os.path.exists(orphan)  # dry run

    rep = L.vacuum_table(spark, p, min_age_s=3600, dry_run=False)
    assert len(rep["deleted"]) == 1
    assert not os.path.exists(orphan)
    assert os.path.exists(fresh)  # age-guarded
    assert rep["bytes_reclaimed"] > 0
    # manifested data intact; the fresh orphan duplicates one file's
    # rows until a later (aged) vacuum pass or a manifest refresh
    donor_rows = spark.read.parquet(donor).count()
    assert spark.read.parquet(p).count() == n0 + donor_rows
    os.remove(fresh)
    assert spark.read.parquet(p).count() == n0


def test_retention_keeps_newest_day_partitions(spark, tmp_path):
    """r10: day-partition retention drops the oldest day= dirs (pure
    metadata deletes), keeps the newest N, and rebuilds the stats
    manifest over the survivors when asked."""
    import os

    from cmsspark_spark.operators import layout as L

    p = str(tmp_path / "t")
    rows = [
        (d, i, f"2024-01-0{d}") for d in (1, 2, 3) for i in range(10)
    ]
    spark.createDataFrame(rows, "k long, x long, day string").write \
        .partitionBy("day").parquet(p)
    L.write_file_manifest(spark, p, ["x"])

    rep = L.retain_day_partitions(spark, p, keep_days=2, dry_run=True)
    assert rep["expired"] == ["day=2024-01-01"]
    assert rep["kept"] == ["day=2024-01-02", "day=2024-01-03"]
    assert os.path.exists(f"{p}/day=2024-01-01")  # dry run

    rep = L.retain_day_partitions(
        spark, p, keep_days=2, dry_run=False, refresh_manifest_dims=["x"]
    )
    assert rep["deleted"]
    assert not os.path.exists(f"{p}/day=2024-01-01")
    left = spark.read.parquet(p)
    assert left.select("day").distinct().count() == 2
    # manifest rebuilt over survivors only
    man = spark.read.parquet(L.manifest_location(p))
    assert man.agg({"n_rows": "sum"}).first()[0] == 20


def test_rowgroup_bloom_manifest_prunes_to_true_rowgroup(spark, tmp_path):
    """r10 grain symmetry: a point lookup the FILE Bloom admits still
    reads the whole file; the ROW-GROUP Bloom narrows to the row
    group(s) that might hold the key. Built on _metadata.row_index +
    footer offsets — assert (a) every row group has a sidecar row, (b)
    no false negative for any present key, (c) on this fixed dataset
    the row-group Bloom keeps strictly fewer row groups than row-group
    min/max for a mid-domain key, (d) per-file union of row-group
    blooms equals the file bloom."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    # keys are md5-ish hex strings (uniform in the key domain) while
    # the table is WRITTEN in doc-id order — min/max on key is useless
    import hashlib

    n = 2048
    keys = [hashlib.md5(str(i).encode()).hexdigest() for i in range(n)]
    path = str(tmp_path / "t")
    os.makedirs(path)
    for f in range(2):
        sl = keys[f * 1024 : (f + 1) * 1024]
        tbl = pa.table({"key": pa.array(sl, pa.string())})
        pq.write_table(
            tbl, f"{path}/part-{f}.parquet", row_group_size=256
        )

    stats_raw = L.rowgroup_stats_manifest(spark, path, dims=())
    # string dim: min/max computed data-side for the prune frame
    src = spark.read.parquet(path)
    offs = L.rowgroup_offsets(stats_raw)
    import pyspark.sql.functions as F

    data = src.select(
        F.substring_index(F.col("_metadata.file_path"), "/", -1).alias(
            "file"
        ),
        F.col("_metadata.row_index").alias("_ri"),
        "key",
    )
    rg_stats = (
        data.join(F.broadcast(offs), "file")
        .filter(
            (F.col("_ri") >= F.col("start"))
            & (F.col("_ri") < F.col("start") + F.col("n_rows"))
        )
        .groupBy("file", "row_group")
        .agg(F.min("key").alias("min_key"), F.max("key").alias("max_key"))
    )
    blooms = L.rowgroup_bloom_manifest(spark, path, "key")
    assert blooms.count() == 8  # 2 files x 4 row groups

    # (d) union of rg blooms == file bloom, per file
    file_bloom = {
        r.file: set(r.bloom_key)
        for r in L.file_bloom_manifest(src, "key").collect()
    }
    rg_union: dict = {}
    for r in blooms.collect():
        rg_union.setdefault(r.file, set()).update(r.bloom_key)
    assert rg_union == file_bloom

    # (b) no false negative: present keys from known positions
    for i in (0, 700, 1500, 2047):
        kept = L.pruned_rowgroups_bloom(
            rg_stats, blooms, "key", keys[i]
        ).collect()
        true_file = f"part-{i // 1024}.parquet"
        true_rg = (i % 1024) // 256
        assert any(
            r.file == true_file and r.row_group == true_rg for r in kept
        ), (i, kept)

    # (c) bloom beats min/max on this data for a mid-domain key
    v = keys[700]
    mm_kept = rg_stats.filter(
        (F.col("max_key") >= v) & (F.col("min_key") <= v)
    ).count()
    bl_kept = L.pruned_rowgroups_bloom(rg_stats, blooms, "key", v).count()
    assert bl_kept < mm_kept, (bl_kept, mm_kept)
    assert bl_kept >= 1


def test_append_extends_rowgroup_bloom_sidecar(spark, tmp_path):
    """bloom_rowgroups=True maintains the row-group Bloom sidecar at
    append time by scanning ONLY the appended files — pre-existing
    sidecar rows are byte-identical after the append."""
    path = str(tmp_path / "t")
    df1 = spark.range(0, 500).selectExpr(
        "id", "md5(CAST(id AS STRING)) AS key"
    )
    df1.write.parquet(path)
    L.write_rowgroup_bloom_manifest(spark, path, "key")
    dest = L.manifest_location(path) + "_rowgroups_bloom"
    before = {
        (r.file, r.row_group): tuple(r.bloom_key)
        for r in spark.read.parquet(dest).collect()
    }

    df2 = spark.range(500, 900).selectExpr(
        "id", "md5(CAST(id AS STRING)) AS key"
    )
    new_files = L.append_with_manifest(
        df2, path, ["id"], bloom_dim="key", bloom_rowgroups=True
    )
    assert new_files
    after = {
        (r.file, r.row_group): tuple(r.bloom_key)
        for r in spark.read.parquet(dest).collect()
    }
    new_names = {f.rsplit("/", 1)[-1] for f in new_files}
    for k, v in before.items():
        assert after[k] == v  # untouched rows identical
    added = set(after) - set(before)
    assert added and all(f in new_names for f, _ in added)


def test_read_rowgroups_opens_exactly_the_planned_slices(spark, tmp_path):
    """r10: the explicit (file, row_group) read path — planned row
    groups come back as exactly their row slices with column pruning;
    an empty plan yields an empty frame with the table schema."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "t")
    os.makedirs(path)
    for f in range(2):
        base = f * 1000
        tbl = pa.table(
            {
                "id": pa.array(range(base, base + 1000), pa.int64()),
                "v": pa.array([f"x{i}" for i in range(base, base + 1000)]),
            }
        )
        pq.write_table(tbl, f"{path}/part-{f}.parquet", row_group_size=250)

    one = L.read_rowgroups(
        spark, path, [("part-1.parquet", 2)], columns=["id"]
    )
    got = sorted(r.id for r in one.collect())
    assert got == list(range(1500, 1750))   # third row group of file 1
    assert one.columns == ["id"]            # column-pruned

    multi = L.read_rowgroups(
        spark, path, [("part-0.parquet", 0), ("part-1.parquet", 3)]
    )
    ids = sorted(r.id for r in multi.collect())
    assert ids == list(range(0, 250)) + list(range(1750, 2000))
    assert set(multi.columns) == {"id", "v"}

    empty = L.read_rowgroups(spark, path, [])
    assert empty.count() == 0
    assert set(empty.columns) == {"id", "v"}


def test_append_preserves_custom_bloom_parameters(spark, tmp_path):
    """append_with_manifest must extend a custom-(m, k) Bloom sidecar
    WITH the recorded parameters, not the module defaults — a mixed
    sidecar probes to false negatives and point_lookup rejects it."""
    path = str(tmp_path / "t")
    df = spark.range(0, 300).selectExpr(
        "id", "md5(CAST(id AS STRING)) AS key"
    )
    df.write.parquet(path)
    L.write_file_manifest(spark, path, ["id"])
    L.write_bloom_manifest(spark, path, "key", m=65536, k=3)

    df2 = spark.range(300, 500).selectExpr(
        "id", "md5(CAST(id AS STRING)) AS key"
    )
    L.append_with_manifest(df2, path, ["id"], bloom_dim="key")

    side = spark.read.parquet(L.manifest_location(path) + "_bloom")
    combos = {
        (r.bloom_m, r.bloom_k)
        for r in side.select("bloom_m", "bloom_k").distinct().collect()
    }
    assert combos == {(65536, 3)}


def test_append_refuses_legacy_sidecar_without_recorded_mk(spark, tmp_path):
    """ADVICE r10: a legacy Bloom sidecar with rows but NO recorded
    (m, k) columns cannot be safely extended — the legacy rows carry
    no parameters, so a parameter mix would be undetectable at probe
    time (silent false negatives). append_with_manifest must refuse
    and demand a rebuild."""
    import pytest

    path = str(tmp_path / "t")
    df = spark.range(0, 300).selectExpr(
        "id", "md5(CAST(id AS STRING)) AS key"
    )
    df.write.parquet(path)
    L.write_file_manifest(spark, path, ["id"])
    # fabricate a legacy sidecar: bloom rows WITHOUT bloom_m/bloom_k
    legacy = L.file_bloom_manifest(df, "key")
    legacy.write.parquet(L.manifest_location(path) + "_bloom")

    df2 = spark.range(300, 500).selectExpr(
        "id", "md5(CAST(id AS STRING)) AS key"
    )
    with pytest.raises(ValueError, match="no recorded bloom"):
        L.append_with_manifest(df2, path, ["id"], bloom_dim="key")

    # the remedy: rebuild (records parameters), then append extends
    L.write_bloom_manifest(spark, path, "key", mode="overwrite")
    L.append_with_manifest(df2, path, ["id"], bloom_dim="key")
    side = spark.read.parquet(L.manifest_location(path) + "_bloom")
    combos = {
        (r.bloom_m, r.bloom_k)
        for r in side.select("bloom_m", "bloom_k").distinct().collect()
    }
    assert len(combos) == 1 and None not in next(iter(combos))


def test_sidecar_mk_mixed_null_rows_raise_valueerror(spark, tmp_path):
    """ADVICE r10: a merged-schema sidecar whose legacy rows carry
    null bloom_m must fail as the intended ValueError (corrupt index,
    rebuild), not a TypeError from sorting None against int."""
    import pytest

    from cmsspark_spark.jobs.point_lookup import _sidecar_mk

    df = spark.range(0, 50).selectExpr(
        "id", "md5(CAST(id AS STRING)) AS key"
    )
    legacy = L.file_bloom_manifest(df, "key")  # no (m, k) columns
    modern = L.file_bloom_manifest(df, "key").withColumn(
        "bloom_m", F.lit(65536)
    ).withColumn("bloom_k", F.lit(3))
    mixed = legacy.unionByName(modern, allowMissingColumns=True)
    with pytest.raises(ValueError, match="mixes parameters"):
        _sidecar_mk(mixed)
