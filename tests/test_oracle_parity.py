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
