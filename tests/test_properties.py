"""Hypothesis property tests on the tricky semantics (SURVEY §5 level 3):
null handling in conditional counts, full-outer coverage, dedup
idempotence, union column alignment, day-template completeness,
minhash containment."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cmsspark_spark.operators import dedup as D
from cmsspark_spark.operators import joins as J
from cmsspark_spark.operators.aggregations import conditional_count

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.lists(st.integers(0, 5), min_size=0, max_size=20)


@given(vals=st.lists(st.one_of(st.none(), st.integers(-5, 5)), max_size=25))
@settings(**SETTINGS)
def test_conditional_count_null_is_zero(spark, vals):
    """A null condition contributes 0 — the reference's
    when(isNull,0).otherwise(1) semantics (A3)."""
    df = spark.createDataFrame([(v,) for v in vals], "v: int")
    got = df.agg(conditional_count(F.col("v") > 0).alias("n")).collect()[0].n
    expect = sum(1 for v in vals if v is not None and v > 0)
    assert (got or 0) == expect


@given(left=keys, right=keys)
@settings(**SETTINGS)
def test_full_outer_coverage_partitions_key_space(spark, left, right):
    """J4: both/left_only/right_only partition the key union exactly."""
    ldf = spark.createDataFrame([(k,) for k in left], "k: int")
    rdf = spark.createDataFrame([(k,) for k in right], "k: int")
    cov = {r.k: r.presence for r in J.full_outer_coverage(ldf, rdf, ["k"]).collect()}
    ls, rs = set(left), set(right)
    assert set(cov) == ls | rs
    for k, p in cov.items():
        expect = "both" if k in ls and k in rs else ("left_only" if k in ls else "right_only")
        assert p == expect


@given(rows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=30))
@settings(**SETTINGS)
def test_exact_dedup_deterministic_and_idempotent(spark, rows):
    """P9+A1: dedup keeps exactly min(tie_breaker) per key; applying it
    twice changes nothing."""
    df = spark.createDataFrame(rows, ["k", "tb"])
    once = D.exact_dedup(df, ["k"], "tb")
    got = {(r.k, r.tb) for r in once.collect()}
    expect = {(k, min(tb for kk, tb in rows if kk == k)) for k, _ in rows}
    assert got == expect
    twice = D.exact_dedup(once, ["k"], "tb")
    assert {(r.k, r.tb) for r in twice.collect()} == expect


@given(n_days=st.integers(1, 10), present=st.lists(st.integers(0, 9), max_size=5))
@settings(**SETTINGS)
def test_day_template_fill_completeness(spark, n_days, present):
    """J10: output has one row per (day × key); absent days read 0."""
    present = [p for p in present if p < n_days]
    rows = [(f"2024-03-{p + 1:02d}", "k1", 5) for p in sorted(set(present))]
    df = spark.createDataFrame(rows or [("2024-03-01", "k1", 0)], ["day", "key", "n"])
    df = df.withColumn("day", F.col("day").cast("date"))
    if not rows:
        df = df.filter(F.lit(False))
    filled = J.day_template_fill(
        df, "day", ["key"], ["n"], start="2024-03-01", end=f"2024-03-{n_days:02d}"
    )
    got = {str(r.day): r.n for r in filled.collect()}
    if not rows:
        # no keys observed → template has no key rows at all
        assert got == {}
        return
    assert len(got) == n_days
    for d, n in got.items():
        day_idx = int(d.split("-")[2]) - 1
        assert n == (5 if day_idx in set(present) else 0)


@given(
    texts=st.lists(
        st.text(alphabet="ab cd", min_size=0, max_size=30), min_size=1, max_size=8
    )
)
@settings(**SETTINGS)
def test_identical_texts_always_minhash_candidates(spark, texts):
    """Identical documents have identical signatures → every identical
    pair is an LSH candidate (no false negatives at similarity 1)."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(df, "doc_id", "text").collect()
    }
    norm = [" ".join(t.split()) for t in texts]
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if norm[i] == norm[j] and norm[i] != "":
                assert (i, j) in pairs, f"identical pair ({i},{j}) missed"


@given(
    lefts=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)), max_size=12),
    rights=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 9)),
        max_size=12,
    ),
)
@settings(**SETTINGS)
def test_as_of_join_matches_naive_semantics(spark, lefts, rights):
    """as_of_join == 'latest right with ts <= left ts per key' (computed
    naively in Python), left-outer, inclusive ties."""
    from cmsspark_spark.operators.asof import as_of_join

    # dedup right (k, ts) so 'the' latest right row is well-defined
    seen = {}
    for k, ts, v in rights:
        seen[(k, ts)] = v
    rights = [(k, ts, v) for (k, ts), v in seen.items()]
    ldf = spark.createDataFrame(lefts or [(0, 0)], ["k", "lts"])
    if not lefts:
        ldf = ldf.filter(F.lit(False))
    rdf = spark.createDataFrame(rights or [(0, 0, 0)], ["k", "rts", "v"])
    if not rights:
        rdf = rdf.filter(F.lit(False))
    got = {
        (r.k, r.lts): r.v
        for r in as_of_join(ldf, rdf, ["k"], "lts", "rts").collect()
    }
    assert len(got) <= len(lefts)  # one output row per distinct left row
    for k, lts in set(lefts):
        prior = [(ts, v) for kk, ts, v in rights if kk == k and ts <= lts]
        expect = max(prior)[1] if prior else None
        assert got[(k, lts)] == expect, (k, lts)


@given(rows=st.lists(st.tuples(st.integers(0, 3), st.floats(0, 100)), max_size=20))
@settings(**SETTINGS)
def test_union_by_name_aligns_columns(spark, rows):
    """U1/SURVEY §7.4: positional union is the reference's bug class;
    unionByName must align by NAME regardless of projection order."""
    df = spark.createDataFrame(rows or [(0, 0.0)], ["k", "v"])
    if not rows:
        df = df.filter(F.lit(False))
    a = df.select("k", "v")
    b = df.select("v", "k")  # swapped order
    u = a.unionByName(b)
    n_k = u.agg(F.sum("k")).collect()[0][0] or 0
    expect = 2 * sum(k for k, _ in rows)
    assert n_k == expect


@given(
    points=st.lists(st.integers(-50, 50), max_size=15),
    intervals=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(0, 30)), max_size=8
    ),
    bin_width=st.integers(1, 12),
)
@settings(**SETTINGS)
def test_range_join_binned_matches_naive(spark, points, intervals, bin_width):
    """The bin-bucketed range join must return exactly the pairs the
    naive predicate join returns, for any bin width — including
    negative domains, empty spans, and spans straddling many bins."""
    from cmsspark_spark.operators.joins import range_join_binned

    pdf = spark.createDataFrame(
        [(i, p) for i, p in enumerate(points)] or [(0, 0)], ["pid", "p"]
    )
    if not points:
        pdf = pdf.filter(F.lit(False))
    ivs = [(i, s, s + w) for i, (s, w) in enumerate(intervals)]
    idf = spark.createDataFrame(ivs or [(0, 0, 0)], ["iid", "s", "e"])
    if not intervals:
        idf = idf.filter(F.lit(False))
    got = {
        (r.pid, r.iid)
        for r in range_join_binned(pdf, idf, "p", "s", "e", bin_width).collect()
    }
    want = {
        (pid, iid)
        for pid, p in enumerate(points)
        for iid, s, e in ivs
        if s <= p < e
    }
    assert got == want


@given(
    keys=st.lists(st.integers(0, 40), min_size=1, max_size=120),
)
@settings(**SETTINGS)
def test_count_min_overcounts_never_undercounts(spark, keys):
    """Cormode-Muthukrishnan guarantee: for every key, est ≥ true
    count, and est ≤ true + N (trivial bound; the εN bound is
    probabilistic). With width ≫ distinct keys, estimates should be
    exact for most keys."""
    from collections import Counter

    from cmsspark_spark.operators import sketches as K

    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    sk = K.count_min_build(df, "k", depth=4, width=64)
    probes = df.distinct()
    est = {
        r.key: r.est
        for r in K.count_min_estimate(sk, probes, "k", depth=4, width=64).collect()
    }
    true = Counter(keys)
    n = len(keys)
    for k, t in true.items():
        assert est[k] >= t, f"undercount for {k}: {est[k]} < {t}"
        assert est[k] <= n
    # width 64 vs ≤41 distinct keys: at least half the keys exact
    exact = sum(1 for k, t in true.items() if est[k] == t)
    assert exact * 2 >= len(true)


def test_count_min_sketches_merge_cellwise(spark):
    """Mergeability: sketch(A ∪ B) == cellwise-sum(sketch(A), sketch(B))
    — the property that lets daily sketches roll up to monthly without
    re-reading the raw stream."""
    from cmsspark_spark.operators import sketches as K

    a = spark.createDataFrame([(i % 7,) for i in range(50)], ["k"])
    b = spark.createDataFrame([(i % 11,) for i in range(80)], ["k"])
    sk_union = K.count_min_build(a.unionAll(b), "k", depth=4, width=32)
    merged = (
        K.count_min_build(a, "k", depth=4, width=32)
        .unionByName(K.count_min_build(b, "k", depth=4, width=32))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    got = {(r.d, r.bucket): r.cnt for r in sk_union.collect()}
    want = {(r.d, r.bucket): r.cnt for r in merged.collect()}
    assert got == want


def test_bloom_no_false_negatives_and_fp_bounded(spark):
    from cmsspark_spark.operators import sketches as K

    members = spark.range(0, 300).select(
        F.concat(F.lit("m"), F.col("id")).alias("k")
    )
    others = spark.range(0, 1000).select(
        F.concat(F.lit("x"), F.col("id")).alias("k")
    )
    bloom = K.bloom_build(members, "k", m_bits=4096, k_hashes=4)
    # every member must probe true — Bloom's hard guarantee
    got = {
        r["key"]: r["might_contain"]
        for r in K.bloom_might_contain(
            bloom, members, "k", m_bits=4096, k_hashes=4
        ).collect()
    }
    assert all(got.values()) and len(got) == 300
    # non-members: fp rate ≈ (1-e^(-kn/m))^k ≈ 4.7% here; allow slack
    fps = sum(
        1
        for r in K.bloom_might_contain(
            bloom, others, "k", m_bits=4096, k_hashes=4
        ).collect()
        if r["might_contain"]
    )
    assert fps / 1000 < 0.15


def test_bloom_filters_merge_wordwise(spark):
    from cmsspark_spark.operators import sketches as K

    a = spark.range(0, 100).select(F.concat(F.lit("a"), F.col("id")).alias("k"))
    b = spark.range(0, 100).select(F.concat(F.lit("b"), F.col("id")).alias("k"))
    merged = (
        K.bloom_build(a, "k", m_bits=1024, k_hashes=3)
        .unionByName(K.bloom_build(b, "k", m_bits=1024, k_hashes=3))
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    full = K.bloom_build(a.unionAll(b), "k", m_bits=1024, k_hashes=3)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_approx_percentile_tracks_exact(spark):
    """The documented 100 TB swap (exact percentile → approx_percentile
    sketch) must stay within tight relative error on real gap data."""
    from cmsspark_spark import catalog
    from pyspark.sql import Window

    ev = catalog.load_table(spark, "/root/testdata/sf0.01", "events", widen=False)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        (F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)).alias("g")
    ).filter(F.col("g").isNotNull())
    row = gaps.agg(
        F.expr("percentile(g, array(0.5D, 0.9D, 0.99D))").alias("exact"),
        F.expr("approx_percentile(g, array(0.5D, 0.9D, 0.99D), 1000)").alias("approx"),
    ).collect()[0]
    for e, a in zip(row["exact"], row["approx"]):
        assert abs(a - e) / max(e, 1.0) < 0.02


# ---------------------------------------------------------------------------
# STOMP frame codec
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_hdr_key = st.text(
    alphabet=st.characters(blacklist_characters="\x00", codec="utf-8"),
    min_size=1, max_size=20,
)
_hdr_val = st.text(
    alphabet=st.characters(blacklist_characters="\x00", codec="utf-8"),
    max_size=40,
)


@given(
    headers=st.dictionaries(_hdr_key, _hdr_val, max_size=6),
    body=st.binary(max_size=200).filter(lambda b: b"\x00" not in b),
)
@settings(max_examples=200, deadline=None)
def test_stomp_frame_roundtrip(headers, body):
    """build→parse is the identity for any NUL-free headers/body: the
    1.2 escaping must protect \\n, \\r, ':' and '\\' in BOTH keys and
    values (spec §'Value Encoding')."""
    from cmsspark_spark.sinks.stomp import build_frame, parse_frame

    frame = build_frame("SEND", headers, body)
    assert frame.endswith(b"\x00")
    cmd, hdrs, got_body = parse_frame(frame[:-1])
    assert cmd == "SEND"
    assert got_body == body
    for k, v in headers.items():
        assert hdrs[k] == v


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def test_hll_error_bound_and_merge(spark):
    """m=64 HLL: relative error within ~3·(1.04/√64)≈39% on real
    cardinalities (typical ~13%), and the merge of two disjoint
    slices' sketches equals the sketch of the union — the mergeability
    that makes daily→monthly rollups free."""
    import pyspark.sql.functions as F
    from cmsspark_spark.operators.sketches import (
        hll_build,
        hll_estimate,
        hll_merge,
    )

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    regs = hll_build(ev, "user_id", ["event_type"])
    est = hll_estimate(regs, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n")
    )
    for r in est.join(exact, on="event_type").collect():
        rel = abs(r["hll_estimate"] - r["n"]) / r["n"]
        assert rel < 0.39, (r["event_type"], rel)
    # mergeability: sketch(A) ⊔ sketch(B) == sketch(A ∪ B), register-exact
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = hll_merge(
        hll_build(a, "user_id", ["event_type"]),
        hll_build(b, "user_id", ["event_type"]),
    )
    whole = hll_build(ev, "user_id", ["event_type"])
    key = lambda df: {
        (r["event_type"], r["bucket"]): r["register"] for r in df.collect()
    }
    assert key(merged) == key(whole)


def _py_span_stats(docs, w):
    """Pure-Python reference for repeated_span_stats: windows of w
    tokens; a span duplicated iff it occurs in >= 2 distinct docs."""
    from collections import defaultdict

    wins = {}
    owners = defaultdict(set)
    for did, text in docs:
        tk = [t for t in text.lower().split() if t]
        spans = [tuple(tk[i:i + w]) for i in range(max(len(tk) - w + 1, 0))]
        wins[did] = spans
        for s in spans:
            owners[s].add(did)
    out = {}
    for did, spans in wins.items():
        dup = sum(1 for s in spans if len(owners[s]) >= 2)
        out[did] = (len(spans), dup)
    return out


@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 6),
            st.lists(st.sampled_from("a b c d".split()), max_size=8).map(" ".join),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    w=st.integers(2, 4),
)
@settings(**SETTINGS)
def test_repeated_span_stats_matches_python_reference(spark, docs, w):
    """Window census vs a brute-force Python twin on tiny vocab text —
    the 4-letter vocabulary makes cross-doc window collisions common,
    exercising owner-counting, sub-window docs, and within-doc-only
    repeats."""
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
        for r in D.repeated_span_stats(df, window=w).collect()
    }
    assert got == _py_span_stats(docs, w)


@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 5),
            st.lists(st.sampled_from("a b c".split()), max_size=10).map(" ".join),
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
    w=st.integers(2, 3),
)
@settings(**SETTINGS)
def test_strip_repeated_spans_conservation(spark, docs, w):
    """Strip invariants vs the census: kept + removed == doc tokens;
    the global survivor occurrence per duplicated span is never
    stripped (total removals < total duplicated occurrences whenever
    any span is duplicated)."""
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in D.strip_repeated_spans(df, window=w).collect()}
    for did, text in docs:
        tk = [t for t in text.lower().split() if t]
        r = rows[did]
        assert r["n_tokens_kept"] + r["n_tokens_removed"] == len(tk)
        if r["n_tokens_removed"] == 0:
            assert r["text"] == text  # byte-exact passthrough
        else:
            assert r["text"] == " ".join(
                t for t in r["text"].split() if t
            )  # clean reassembly
    # survivor conservation: if anything was duplicated, at least one
    # occurrence (the elected one) survived somewhere
    stats = _py_span_stats(docs, w)
    any_dup = any(d for _, d in stats.values())
    if any_dup:
        total_removed = sum(r["n_tokens_removed"] for r in rows.values())
        total_tokens = sum(
            len([t for t in text.lower().split() if t]) for _, text in docs
        )
        assert 0 < total_removed < total_tokens


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
            min_size=0, max_size=8,
        ).map(" ".join),
        min_size=1, max_size=12,
    ),
    cap=st.integers(1, 4),
)
@settings(**SETTINGS)
def test_inverted_index_matches_brute_force(spark, texts, cap):
    """r6 property: for arbitrary corpora and caps, df equals the
    brute-force document frequency and postings is exactly the sorted
    id-prefix of the containing set; docs with no tokens index
    nothing."""
    from cmsspark_spark.operators.pipeline import inverted_index_postings

    docs = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    got = {
        r["token"]: (r["df"], r["postings"])
        for r in inverted_index_postings(docs, max_postings=cap).collect()
    }
    containing: dict = {}
    for i, t in enumerate(texts):
        for tok in set(t.split()):
            containing.setdefault(tok, []).append(i)
    expect = {
        tok: (
            len(ids),
            ",".join(str(i) for i in sorted(ids)[:cap]),
        )
        for tok, ids in containing.items()
    }
    assert got == expect


@given(
    ref=st.lists(st.integers(1, 50), min_size=4, max_size=25),
    cur=st.lists(st.integers(1, 50), min_size=0, max_size=25),
)
@settings(**SETTINGS)
def test_snapshot_psi_nonnegative_and_zero_iff_identical(spark, ref, cur):
    """r7 property: every PSI term (p_cur - p_ref)·ln(p_cur/p_ref) is
    ≥ 0, so the per-group PSI is ≥ 0 for arbitrary snapshots; feeding
    the reference half as its own current snapshot gives exactly 0."""
    from cmsspark_spark.operators.pipeline import snapshot_psi

    rows = [("g", v, True) for v in ref] + [("g", v, False) for v in cur]
    df = spark.createDataFrame(rows, "source string, n long, is_ref boolean")
    out = snapshot_psi(df, "source", "n", "is_ref").collect()
    assert out
    for r in out:
        assert r.psi_term >= 0.0 and r.psi >= 0.0
    mirror = [("g", v, f) for v in ref for f in (True, False)]
    dfm = spark.createDataFrame(
        mirror, "source string, n long, is_ref boolean"
    )
    for r in snapshot_psi(dfm, "source", "n", "is_ref").collect():
        assert r.psi == 0.0


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=6, max_size=20),
        min_size=2,
        max_size=6,
    )
)
@settings(**SETTINGS)
def test_containment_bounds_and_exact_counts(spark, texts):
    """r7 property: for arbitrary corpora, every emitted containment
    pair matches brute-force shingle-set algebra — n_common =
    |A∩B|, containment_a = |A∩B|/|A| ≤ 1 — and is only emitted when
    the pair shares a shingle with df in [min_df, max_df]."""
    docs = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    got = {
        (r.id_a, r.id_b): r
        for r in D.containment_pairs(
            docs, "doc_id", "text", n=2, threshold=0.0,
            min_df=2, max_df=3,
        ).collect()
    }

    def sh(t):
        toks = [x for x in t.split() if x]
        if len(toks) < 2:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)}

    sets = {i: sh(t) for i, t in enumerate(texts)}
    dfreq: dict = {}
    for s in sets.values():
        for g in s:
            dfreq[g] = dfreq.get(g, 0) + 1
    for (a, b), r in got.items():
        inter = sets[a] & sets[b]
        assert r.n_common == len(inter)
        assert r.n_a == len(sets[a]) and r.n_b == len(sets[b])
        assert r.containment_a <= 1.0 and r.containment_b <= 1.0
        assert any(2 <= dfreq[g] <= 3 for g in inter)
    # completeness: every blocked-in overlapping pair is present
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                inter = sets[a] & sets[b]
                if any(2 <= dfreq[g] <= 3 for g in inter):
                    assert (a, b) in got


@settings(deadline=None, max_examples=60)
@given(
    cmin=st.integers(-(2**62), 2**62),
    span=st.integers(0, 2**63 - 1),
    n=st.sampled_from([2, 16, 256]),
    picks=st.lists(st.floats(0.0, 1.0), min_size=1, max_size=8),
)
def test_bucket_expr_range_and_monotonicity_any_span(cmin, span, n, picks):
    """r8 property: for ANY [cmin, cmax] (including nanosecond-epoch
    spans past the old multiply-first int64 overflow), sampled values
    bucket into [0, n), monotone in the value, min->0 and max->n-1 is
    not required (divide-first branch may leave the top bucket short)
    but min maps to 0. DuckDB evaluates the generated SQL directly."""
    import duckdb

    from cmsspark_spark.operators import layout as L

    cmax = cmin + span
    if cmax > 2**63 - 1:
        cmax = 2**63 - 1
        span = cmax - cmin
    # float scaling can overshoot cmax (1.0*span rounds up past int64)
    vals = sorted(
        {min(cmax, max(cmin, cmin + int(p * span))) for p in picks}
        | {cmin, cmax}
    )
    con = duckdb.connect()
    expr = L.bucket_expr("v", str(cmin), str(cmax), n, "duck")
    got = con.execute(
        f"SELECT v, {expr} AS b FROM (SELECT unnest(?::BIGINT[]) AS v) "
        f"ORDER BY v",
        [vals],
    ).fetchall()
    con.close()
    buckets = [b for _, b in got]
    assert all(0 <= b < n for b in buckets), (cmin, span, n, buckets)
    assert buckets == sorted(buckets)
    assert buckets[0] == 0


@given(
    hashes=st.lists(
        st.integers(-(2**63), 2**63 - 1), min_size=2, max_size=16,
        unique=True,
    ),
    max_hamming=st.integers(0, 6),
)
@settings(**SETTINGS)
def test_hamming_near_pairs_equals_brute_force(spark, hashes, max_hamming):
    """r8 property: the pigeonhole block join returns EXACTLY the
    Hamming-bounded pair relation a brute-force scan computes — the
    correctness argument the multimodal near-dup oracles rest on
    (their all-pairs SQL is only a valid oracle because blocking is
    lossless for distance <= d). Signed 64-bit fingerprints included."""
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hashes)], "id long, h long"
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in D.hamming_near_pairs(
            df, "id", "h", bits=64, max_hamming=max_hamming
        ).collect()
    }
    want = set()
    for i, a in enumerate(hashes):
        for j in range(i + 1, len(hashes)):
            d = bin((a ^ hashes[j]) & ((1 << 64) - 1)).count("1")
            if d <= max_hamming:
                want.add((i, j, d))
    assert got == want


# vocab skewed common-vs-rare so max-score actually prunes terms
_ms_word = st.sampled_from(
    ["the", "the", "of", "data", "spark", "query", "rare1", "rare2",
     "zx9", "qq7"]
)
_ms_doc = st.lists(_ms_word, min_size=1, max_size=12).map(" ".join)


@given(texts=st.lists(_ms_doc, min_size=6, max_size=20))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bm25_maxscore_equals_exact_topk(spark, texts):
    """r9: max-score pruning is EXACT — for any corpus, the pruned
    rung's (query, doc, rank, score) set equals unpruned BM25's,
    id tie-breaks included (champion lists only promise recall;
    this rung promises identity)."""
    from cmsspark_spark.operators import pipeline as PL

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    exact = {
        (r.query_id, r.doc_id, r.rank, r.bm25)
        for r in PL.bm25_more_like_this(df, query_max_id=3, k=4).collect()
    }
    ranked, report = PL.bm25_maxscore_parts(df, query_max_id=3, k=4)
    got = {
        (r.query_id, r.doc_id, r.rank, r.bm25) for r in ranked.collect()
    }
    assert got == exact
    for r in report.collect():  # the audit is internally consistent
        assert 0 < r.n_essential <= r.n_terms
        assert 0 < r.postings_scanned <= r.postings_total
        assert 0.0 <= r.pruned_frac <= 1.0


@given(texts=st.lists(_ms_doc, min_size=6, max_size=20))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bm25_blockmax_equals_exact_topk(spark, texts):
    """r9: block-max pruning is EXACT too — per-block local bounds
    skip posting blocks, never answers; the report's block-grain
    scanned mass is ≤ total posting mass."""
    from cmsspark_spark.operators import pipeline as PL

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    exact = {
        (r.query_id, r.doc_id, r.rank, r.bm25)
        for r in PL.bm25_more_like_this(df, query_max_id=3, k=4).collect()
    }
    ranked, report = PL.bm25_blockmax_parts(
        df, query_max_id=3, k=4, block_size=4
    )
    got = {
        (r.query_id, r.doc_id, r.rank, r.bm25) for r in ranked.collect()
    }
    assert got == exact
    for r in report.collect():
        assert 0 <= r.blocks_pruned <= r.blocks_total
        assert 0 <= r.postings_scanned <= r.postings_total


def test_lsh_hot_bucket_star_reduction_preserves_components(spark):
    """r10 (VERDICT item 1): a 1k-member hot bucket (template cluster
    of identical texts) emits O(m) star edges under hot_bucket_cap
    instead of C(m,2)≈500k dense pairs, and the candidate graph's
    connected components are IDENTICAL to the uncapped join's."""
    from cmsspark_spark.operators import dedup as D

    template = " ".join(f"tok{i}" for i in range(25))
    other = " ".join(f"zzz{i}" for i in range(25))
    rows = [(i, template) for i in range(1000)] + [
        (2000, other), (2001, other)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = D.minhash_lsh_pairs(
        df, "doc_id", "text", hot_bucket_cap=16
    ).cache()
    n_capped = capped.count()
    # 1000-member cluster → 999 star edges per its hot buckets (dedup
    # across the 4 bands collapses them), plus the small pair
    assert n_capped <= 1100, f"capped output not O(m): {n_capped}"

    full = D.minhash_lsh_pairs(df, "doc_id", "text")
    comp_full = {
        (r.node, r.component)
        for r in D.connected_components(full, "id_a", "id_b").collect()
    }
    comp_capped = {
        (r.node, r.component)
        for r in D.connected_components(capped, "id_a", "id_b").collect()
    }
    assert comp_capped == comp_full
    # the report names the hot buckets — nothing silently truncated
    rep = D.minhash_lsh_bucket_report(
        df, "doc_id", "text", hot_bucket_cap=16
    ).collect()
    assert sum(r.n_hot_buckets for r in rep) >= 1
    assert max(r.max_bucket_size for r in rep) == 1000
    # and without a cap the report just profiles (no hot flags)
    rep0 = D.minhash_lsh_bucket_report(df, "doc_id", "text").collect()
    assert all(r.n_hot_buckets == 0 for r in rep0)
    capped.unpersist()


def test_hamming_star_cap_preserves_components_and_bounds_pairs(spark):
    """r10 (VERDICT item 1): identical-fingerprint groups beyond
    star_cap emit member→min star edges (hamming 0) and only the
    representative enters the pigeonhole block join — pair count
    collapses from O(m²) to O(m) while cross-group near-pairs and the
    connected components stay exactly as in the full join."""
    from cmsspark_spark.operators import dedup as D

    # group A: 500 items sharing fingerprint 0b1010_1010_1010_1010;
    # x: one item at hamming 1 from A; far: an unrelated pair
    fa = 0xAAAA
    rows = (
        [(i, fa) for i in range(500)]
        + [(900, fa ^ 1)]
        + [(950, 0x0F0F), (951, 0x0F0F)]
    )
    df = spark.createDataFrame(rows, "_id long, simhash long")

    full = D.hamming_near_pairs(df, bits=16, max_hamming=2)
    capped = D.hamming_near_pairs(
        df, bits=16, max_hamming=2, star_cap=16
    ).cache()
    n_capped = capped.count()
    assert n_capped <= 600, f"capped output not O(m): {n_capped}"
    # star edges carry hamming 0; the rep still pairs with 900 at d=1
    got = {(r.id_a, r.id_b): r.hamming for r in capped.collect()}
    assert got[(0, 900)] == 1
    assert got[(950, 951)] == 0
    assert all(h == 0 for (a, b), h in got.items() if b < 900)
    comp_full = {
        (r.node, r.component)
        for r in D.connected_components(full, "id_a", "id_b").collect()
    }
    comp_capped = {
        (r.node, r.component)
        for r in D.connected_components(capped, "id_a", "id_b").collect()
    }
    assert comp_capped == comp_full
    capped.unpersist()


def test_screened_verify_subsets_exact_and_floor_zero_is_identity(spark):
    """r10 screened verify: with min_agree=0 the screened rung returns
    exactly jaccard_pairs' output on the same candidates (the screen
    is a no-op); with a positive floor it returns a SUBSET whose
    jaccard values are identical pair-for-pair, every kept pair
    satisfies the floor, and n_agree matches a direct signature
    comparison."""
    from cmsspark_spark.operators import dedup as D

    base = " ".join(f"tok{i}" for i in range(40))
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("tok3", "x3").replace("tok7", "x7")),  # near
        (3, " ".join(f"tok{i}" for i in range(20))),  # half overlap
        (4, " ".join(f"yyy{i}" for i in range(40))),  # unrelated
        (5, " ".join(f"yyy{i}" for i in range(40))),  # dup of 4
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cand = D.minhash_lsh_pairs(df, "doc_id", "text")

    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.jaccard_pairs(
            df, "doc_id", "text", threshold=0.3, candidates=cand
        ).collect()
    }
    floor0 = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.jaccard_pairs_screened(
            df, "doc_id", "text", candidates=cand,
            threshold=0.3, min_agree=0,
        ).collect()
    }
    assert floor0 == exact  # identity at floor 0

    screened = D.jaccard_pairs_screened(
        df, "doc_id", "text", candidates=cand, threshold=0.3, min_agree=6
    ).collect()
    wide = {
        r._id: [r[f"h{i}"] for i in range(8)]
        for r in D.minhash_signatures_wide(
            df, "doc_id", "text"
        ).collect()
    }
    for r in screened:
        assert (r.id_a, r.id_b) in exact
        assert r.jaccard == exact[(r.id_a, r.id_b)]
        assert r.n_agree >= 6
        direct = sum(
            a == b for a, b in zip(wide[r.id_a], wide[r.id_b])
        )
        assert r.n_agree == direct
    # the exact dups survive any floor (identical signatures agree 8/8)
    kept = {(r.id_a, r.id_b) for r in screened}
    assert (0, 1) in kept and (4, 5) in kept


def test_doc_term_postings_equals_grouped_form(spark):
    """The row-local run-length postings kernel must reproduce the
    explode-then-groupBy(doc, term) counts EXACTLY — same (doc, term,
    dl, tf) multiset — including empty docs (no row), repeated tokens,
    and single-token docs."""
    import pyspark.sql.functions as F

    from cmsspark_spark.functions.text import doc_term_postings, tokens

    df = spark.createDataFrame(
        [
            (1, "b a b c a b"),
            (2, ""),
            (3, "   "),
            (4, "z"),
            (5, "x x x X x"),
            (6, "q w e r t y q q w"),
        ],
        ["doc_id", "text"],
    )
    base = df.select(
        F.col("doc_id").alias("_doc"), tokens("text").alias("_tk")
    )
    grouped = (
        base.select(
            "_doc", F.size("_tk").alias("_dl"), F.explode("_tk").alias("_t")
        )
        .groupBy("_doc", "_t")
        .agg(F.first("_dl").alias("_dl"), F.count(F.lit(1)).alias("_tf"))
    )
    rle = doc_term_postings(df, "doc_id", "text")
    got = {
        (r._doc, r._t): (r._dl, r._tf) for r in rle.collect()
    }
    want = {
        (r._doc, r._t): (r._dl, r._tf) for r in grouped.collect()
    }
    assert got == want
    # doc 5 lowercases: 5 tokens of "x"
    assert got[(5, "x")] == (5, 5)
    assert (2, "") not in got and all(d != 2 and d != 3 for d, _ in got)
