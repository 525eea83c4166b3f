"""Golden-query tests: every registered query vs its DuckDB oracle.

This replicates the driver's CORRECTNESS gate locally (SURVEY §5 test
pyramid, level 1) at sf0.001 for speed; run with
SPARK_GRAFT_PARITY_DIR=/root/testdata/sf0.01 for the full gate.
"""

from __future__ import annotations

import os

import pytest

from cmsspark_spark.queries import ORACLES, QUERIES
from tests.conftest import compare_query

PARITY_DIR = os.environ.get("SPARK_GRAFT_PARITY_DIR", "/root/testdata/sf0.001")

SQL_BACKED = sorted(ORACLES)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", SQL_BACKED)
def test_oracle_parity(spark, duck, name):
    ok, detail = compare_query(
        spark, duck, name, QUERIES[name], ORACLES[name], PARITY_DIR
    )
    assert ok, f"{name}: {detail}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, PARITY_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"site", "tier", "n_accesses", "n_datasets", "bytes_read"}


def test_contract_shapes():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert q and set(o) <= set(q)


def test_approx_distinct_users_error_gate(spark):
    """r10 shape: the query is now its own audit — per event_type it
    emits the exact countDistinct plus ``approx_ok`` (|approx−exact| ≤
    5% — 5σ on the configured 1% rsd). This test independently
    recomputes the exact side and asserts every verdict is true, so a
    broken sketch fails HERE and in the oracle row alike."""
    from pyspark.sql import functions as F

    from cmsspark_spark.queries import QUERIES, _t
    from tests.conftest import SF_ORACLE

    got = {
        r["event_type"]: r
        for r in QUERIES["approx_distinct_users"](spark, SF_ORACLE).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in _t(spark, SF_ORACLE, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact) and exact
    for k, e in exact.items():
        assert got[k].n_exact == e
        assert got[k].approx_ok, (k, e)
