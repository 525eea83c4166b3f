"""Parity gate for the Arrow text kernels (round 14, VERDICT item 3).

The ``mapInArrow`` fast paths in ``functions/arrow_text.py`` replace
interpreted Catalyst HOF chains in two oracle-checked paths (the
postings build behind every BM25 query, the featurize stage behind the
logreg quality family). They are only admissible because their output
is BIT-IDENTICAL to the Catalyst forms — these tests pin that contract
on an adversarial corpus (unicode case-mapping cliffs, exotic
whitespace, null/empty/degenerate docs) plus the real test corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cmsspark_spark.functions.text import doc_term_postings, tokens
from cmsspark_spark.operators.pipeline import logreg_hashed_features

from tests.conftest import SF_SMOKE

# The cliffs that break naive reimplementations:
# - Java/Catalyst \s is ASCII-only: NBSP (\xa0), U+2028, U+3000 must
#   NOT split; \x0b (vertical tab) MUST.
# - Full Unicode case mapping: İ -> i + combining dot (TWO codepoints),
#   ẞ -> ß, ǅ -> ǆ (titlecase digraph), Σ final-sigma context.
# - Degenerate docs: null, empty, whitespace-only, single token.
ADVERSARIAL = [
    (1, None),
    (2, ""),
    (3, "   "),
    (4, " \t\n\x0b\f\r "),
    (5, "Hello WORLD hello HELLO world"),
    (6, "a\xa0b c d e　f"),          # exotic WS: no split
    (7, "a\x0bb c\td e\rf g\nh"),             # ASCII WS: splits
    (8, "İstanbul STRASSE ẞ ǅungla ǄUNGLA"),  # full case mapping
    (9, "ΣΊΣΥΦΟΣ ΟΔΥΣΣΕΥΣ"),                  # final sigma
    (10, "singleton"),
    (11, "!!! ... ??? ,,,"),
    (12, "x " * 300 + "y z y z x"),
    (13, "naïve NAÏVE café CAFÉ ß ẞ"),
    (14, "数据 处理 数据 管道"),
    (15, "🎉 emoji 🎉 EMOJI tokens 🎉"),
    (16, "MixedCASE mixedcase MIXEDCASE"),
]


@pytest.fixture(scope="module")
def adversarial_df(spark):
    return spark.createDataFrame(ADVERSARIAL, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_kernel_tokens_match_catalyst(spark, adversarial_df):
    """Python re-split + str.lower() == Catalyst split(lower, \\s+)
    token-for-token on every adversarial doc (the pinned JVM
    semantics the kernels' docstrings promise)."""
    import re

    split = re.compile("[ \t\n\x0b\f\r]+")
    got = {
        r["doc_id"]: r["toks"]
        for r in adversarial_df.select(
            "doc_id", tokens("text").alias("toks")
        ).collect()
    }
    for doc_id, tx in ADVERSARIAL:
        expected = (
            None
            if tx is None
            else [w for w in split.split(tx.lower()) if w]
        )
        assert got[doc_id] == expected, (doc_id, tx)


def test_kernel_bucket_hash_matches_int_base_hash(spark, adversarial_df):
    """The kernel's md5-prefix fold == Catalyst int_base_hash
    digit-for-digit on every adversarial token and gram."""
    from hashlib import md5

    from cmsspark_spark.functions.text import int_base_hash

    toks = adversarial_df.select(
        F.explode(tokens("text")).alias("g")
    ).union(
        adversarial_df.select(F.lit("").alias("g"))
    ).union(
        adversarial_df.select(
            F.concat_ws(" ", F.slice(tokens("text"), 1, 2)).alias("g")
        ).where(F.col("g").isNotNull())
    )
    rows = toks.select("g", int_base_hash(F.col("g")).alias("h")).collect()
    assert rows
    for r in rows:
        py = int(md5(r["g"].encode("utf-8")).hexdigest()[:15], 16) % 2147483648
        assert py == r["h"], r["g"]


@pytest.mark.parametrize("source", ["adversarial", "corpus"])
def test_doc_term_postings_arrow_matches_sql(
    spark, adversarial_df, corpus_df, source
):
    df = adversarial_df if source == "adversarial" else corpus_df
    sql = doc_term_postings(df, "doc_id", "text", impl="sql")
    arrow = doc_term_postings(df, "doc_id", "text", impl="arrow")
    # the fast path actually engaged (and the fallback actually not)
    assert "MapInArrow" in arrow._jdf.queryExecution().toString()
    assert "MapInArrow" not in sql._jdf.queryExecution().toString()
    assert [
        (f.name, f.dataType.simpleString()) for f in arrow.schema.fields
    ] == [(f.name, f.dataType.simpleString()) for f in sql.schema.fields]
    assert _rows(arrow) == _rows(sql)


def test_doc_term_postings_non_bigint_id_falls_back(spark, adversarial_df):
    """A non-bigint id column must route to the Catalyst twin (the
    Arrow kernel's output schema is pinned to int64 ids)."""
    df = adversarial_df.select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    out = doc_term_postings(df, "doc_id", "text")
    assert "MapInArrow" not in out._jdf.queryExecution().toString()
    assert out.schema["_doc"].dataType.simpleString() == "string"
    assert _rows(out) == _rows(doc_term_postings(df, "doc_id", "text", impl="sql"))


@pytest.mark.parametrize("source", ["adversarial", "corpus"])
def test_logreg_features_arrow_matches_sql(
    spark, adversarial_df, corpus_df, source
):
    df = adversarial_df if source == "adversarial" else corpus_df
    label = (F.coalesce(F.length("text"), F.lit(0)) % 2 == 0).cast("int")
    sql = logreg_hashed_features(
        df, label, text_col="text", id_col="doc_id", impl="sql"
    )
    arrow = logreg_hashed_features(
        df, label, text_col="text", id_col="doc_id", impl="arrow"
    )
    try:
        assert "MapInArrow" in arrow._jdf.queryExecution().toString()
        assert [
            (f.name, f.dataType.simpleString()) for f in arrow.schema.fields
        ] == [(f.name, f.dataType.simpleString()) for f in sql.schema.fields]
        assert _rows(arrow) == _rows(sql)
    finally:
        sql.unpersist()
        arrow.unpersist()


def test_env_override_forces_sql(spark, adversarial_df, monkeypatch):
    monkeypatch.setenv("CMSSPARK_TEXT_IMPL", "sql")
    out = doc_term_postings(adversarial_df, "doc_id", "text")
    assert "MapInArrow" not in out._jdf.queryExecution().toString()


@pytest.mark.parametrize("n", [2, 3, 5])
@pytest.mark.parametrize("source", ["adversarial", "corpus"])
def test_shingle_frame_arrow_matches_sql(
    spark, adversarial_df, corpus_df, source, n
):
    """distinct_shingles_arrow == select(id, shingles(text, n))
    value-for-value INCLUDING array element order (array_distinct's
    first-occurrence order) and the degenerate short-doc / empty-doc
    collapse rules."""
    from cmsspark_spark.functions.text import shingle_frame

    df = adversarial_df if source == "adversarial" else corpus_df
    sql = shingle_frame(df, "doc_id", "text", n, impl="sql")
    arrow = shingle_frame(df, "doc_id", "text", n, impl="arrow")
    assert "MapInArrow" in arrow._jdf.queryExecution().toString()
    assert "MapInArrow" not in sql._jdf.queryExecution().toString()
    assert [
        (f.name, f.dataType.simpleString()) for f in arrow.schema.fields
    ] == [(f.name, f.dataType.simpleString()) for f in sql.schema.fields]
    got = {r["_id"]: r["_arr"] for r in arrow.collect()}
    exp = {r["_id"]: r["_arr"] for r in sql.collect()}
    assert got == exp


def test_shingle_frame_non_bigint_falls_back(spark, adversarial_df):
    from cmsspark_spark.functions.text import shingle_frame

    df = adversarial_df.select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    out = shingle_frame(df, "doc_id", "text", 3)
    assert "MapInArrow" not in out._jdf.queryExecution().toString()
    assert out.schema["_id"].dataType.simpleString() == "string"
