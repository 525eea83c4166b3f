#!/usr/bin/env python
"""Generate a 10x (sf1-equivalent) documents + embeddings dataset for
the scaling bench (tools/bench_scale.py).

/root/testdata is read-only and the driver only ships sf0.001/0.01/0.1,
so the 10x tables are derived here and written under .scale/sf1 (git-
ignored). The generator mirrors the sf0.1 statistical shape rather than
copying rows: vocabulary, token-count distribution, source/lang mix and
the planted exact/near-dup rates are measured from the real sf0.1
parquet, then 10x rows are drawn with a fixed seed — so per-query work
should scale ~linearly and the sf1/sf0.1 wall-clock ratio is a fair
scaling signal.

Only the tables the scale headliners read are generated (documents,
embeddings); the relational TPC-H tables stay at driver scale.
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1")
N_DOCS = 50_000
N_VECS = 20_000
SEED = 1234


def gen_documents() -> None:
    t = pq.read_table(f"{SRC}/documents.parquet")
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    vocab = sorted({w for s in texts[:2000] for w in s.split()})
    lens = [len(s.split()) for s in texts]
    lang_pool = sorted(set(langs))
    lang_weights = [langs.count(la) for la in lang_pool]
    src_pool = sorted(set(sources))

    rnd = random.Random(SEED)
    rows_text: list[str] = []
    out_lang: list[str] = []
    out_src: list[str] = []
    for i in range(N_DOCS):
        n = rnd.choice(lens)
        rows_text.append(" ".join(rnd.choice(vocab) for _ in range(n)))
        out_lang.append(rnd.choices(lang_pool, weights=lang_weights)[0])
        out_src.append(rnd.choice(src_pool))

    # Planted duplicates at the sf0.1 rate scaled 10x: sf0.1 has 8
    # exact-dup rows in 5000 (~0.16%); LSH-verified near-dup pairs are
    # of the same order. Plant ~80 exact copies and ~80 near copies
    # (one token appended -> Jaccard >> 0.5) at deterministic offsets.
    for k in range(80):
        src_i = (k * 587) % (N_DOCS // 2)
        dst_i = N_DOCS // 2 + (k * 853) % (N_DOCS // 2)
        rows_text[dst_i] = rows_text[src_i]
    for k in range(80):
        src_i = (k * 769 + 13) % (N_DOCS // 2)
        dst_i = N_DOCS // 2 + (k * 991 + 7) % (N_DOCS // 2)
        if rows_text[dst_i] == rows_text[src_i]:
            continue
        rows_text[dst_i] = rows_text[src_i] + " " + rnd.choice(vocab)

    table = pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), type=pa.int64()),
            "text": pa.array(rows_text, type=pa.string()),
            "lang": pa.array(out_lang, type=pa.string()),
            "source": pa.array(out_src, type=pa.string()),
            "n_chars": pa.array([len(s) for s in rows_text], type=pa.int64()),
        }
    )
    pq.write_table(table, f"{OUT}/documents.parquet")


def gen_embeddings() -> None:
    rng = np.random.default_rng(SEED)
    # Match the sf0.1 distribution: 64-dim floats ~ U(-0.3, 0.3)-ish,
    # 10 labels. Exact distribution shape doesn't matter for scaling —
    # only that buckets stay balanced like the original.
    vecs = rng.uniform(-0.3, 0.3, size=(N_VECS, 64)).astype(np.float32)
    table = pa.table(
        {
            "vec_id": pa.array(range(N_VECS), type=pa.int64()),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(
                (np.arange(N_VECS) % 10).astype(np.int32), type=pa.int32()
            ),
        }
    )
    pq.write_table(table, f"{OUT}/embeddings.parquet")


def _empirical(col, table):
    """(values, weights) of a string column's empirical distribution."""
    import collections

    c = collections.Counter(pq.read_table(f"{SRC}/{table}.parquet").column(col).to_pylist())
    vals = sorted(c)
    return vals, np.array([c[v] for v in vals], dtype="float64") / sum(c.values())


def gen_relational() -> None:
    """10x relational FACTS (events, part, orders, lineitem) mirroring
    the sf0.1 statistical shape — key ranges, category mixes and value
    distributions are measured from the real parquet; fact keys scale
    10x while the dim tables (nation/customer/supplier) stay at driver
    scale, exactly as dims grow slower than facts at 100 TB. Feeds the
    round-5 scale headliners (funnel, ER, basket lift, graph queries)."""
    rng = np.random.default_rng(SEED + 1)

    # events: 1M rows, 10x the user pool, same 30-day span / type mix
    n_ev = 1_000_000
    types, tw = _empirical("event_type", "events")
    day0 = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    ts = day0 + rng.integers(0, 30 * 86400 * 1_000_000, n_ev)
    ev = pa.table(
        {
            "event_id": pa.array(np.arange(n_ev), pa.int64()),
            "ts": pa.array(np.sort(ts), pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, 15_000, n_ev), pa.int64()),
            "event_type": pa.array(rng.choice(types, n_ev, p=tw)),
            "value": pa.array(np.round(rng.uniform(0, 150, n_ev), 2)),
            "props": pa.array(
                ['{"k": %d}' % k for k in rng.integers(0, 100, n_ev)]
            ),
        }
    )
    pq.write_table(ev, os.path.join(OUT, "events.parquet"))

    # part: 200k rows, SAME 64-name vocabulary (the ER blocking
    # structure is preserved; block sizes scale 10x)
    n_p = 200_000
    names, nw = _empirical("p_name", "part")
    ptypes, pw = _empirical("p_type", "part")
    brands, bw = _empirical("p_brand", "part")
    part = pa.table(
        {
            "p_partkey": pa.array(np.arange(n_p), pa.int64()),
            "p_name": pa.array(rng.choice(names, n_p, p=nw)),
            "p_brand": pa.array(rng.choice(brands, n_p, p=bw)),
            "p_type": pa.array(rng.choice(ptypes, n_p, p=pw)),
            "p_size": pa.array(rng.integers(1, 51, n_p), pa.int32()),
            "p_retailprice": pa.array(np.round(900.0 + np.arange(n_p) * 0.1 % 1000, 2)),
        }
    )
    pq.write_table(part, os.path.join(OUT, "part.parquet"))

    # orders: 1.5M rows; custkeys stay in the driver-scale dim range
    n_o = 1_500_000
    statuses, sw = _empirical("o_orderstatus", "orders")
    prios, prw = _empirical("o_orderpriority", "orders")
    d0 = np.datetime64("1995-01-01T00:00:00", "us").astype("int64")
    span_days = 2400
    odate = d0 + rng.integers(0, span_days, n_o) * 86400 * 1_000_000
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n_o), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, 15_000, n_o), pa.int64()),
            "o_orderstatus": pa.array(rng.choice(statuses, n_o, p=sw)),
            "o_totalprice": pa.array(np.round(rng.uniform(900, 350_000, n_o), 2)),
            "o_orderdate": pa.array(odate, pa.timestamp("us")),
            "o_orderpriority": pa.array(rng.choice(prios, n_o, p=prw)),
        }
    )
    pq.write_table(orders, os.path.join(OUT, "orders.parquet"))

    # lineitem: 6M rows, ~4 lines/order over the 1.5M orders, partkeys
    # over the 10x part table, suppkeys over the driver-scale dim
    n_l = 6_000_000
    rflags, rfw = _empirical("l_returnflag", "lineitem")
    lstat, lsw = _empirical("l_linestatus", "lineitem")
    sdate = d0 + rng.integers(1, span_days + 95, n_l) * 86400 * 1_000_000
    li = pa.table(
        {
            "l_orderkey": pa.array(rng.integers(0, n_o, n_l), pa.int64()),
            "l_partkey": pa.array(rng.integers(0, n_p, n_l), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, 1000, n_l), pa.int64()),
            "l_linenumber": pa.array(rng.integers(1, 8, n_l), pa.int32()),
            "l_quantity": pa.array(rng.integers(1, 51, n_l).astype("float64")),
            "l_extendedprice": pa.array(np.round(rng.uniform(900, 105_000, n_l), 2)),
            "l_discount": pa.array(np.round(rng.integers(0, 11, n_l) * 0.01, 2)),
            "l_tax": pa.array(np.round(rng.integers(0, 9, n_l) * 0.01, 2)),
            "l_returnflag": pa.array(rng.choice(rflags, n_l, p=rfw)),
            "l_linestatus": pa.array(rng.choice(lstat, n_l, p=lsw)),
            "l_shipdate": pa.array(sdate, pa.timestamp("us")),
        }
    )
    pq.write_table(li, os.path.join(OUT, "lineitem.parquet"))

    # dims pass through at driver scale (broadcast side everywhere)
    for dim in ("nation", "region", "customer", "supplier"):
        pq.write_table(
            pq.read_table(f"{SRC}/{dim}.parquet"),
            os.path.join(OUT, f"{dim}.parquet"),
        )


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    gen_documents()
    gen_embeddings()
    gen_relational()
    print(
        f"wrote {OUT}: documents ({N_DOCS}), embeddings ({N_VECS}), "
        "events (1M), part (200k), orders (1.5M), lineitem (6M) + dims"
    )
    sys.exit(0)
