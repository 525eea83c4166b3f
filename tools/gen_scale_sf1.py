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


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    gen_documents()
    gen_embeddings()
    print(f"wrote {OUT}/documents.parquet ({N_DOCS}) and embeddings.parquet ({N_VECS})")
    sys.exit(0)
