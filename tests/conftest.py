"""Shared fixtures: one local SparkSession + a DuckDB oracle connection.

The oracle-compare helper replicates the driver's check: run the Spark
query and the DuckDB SQL on the same parquet, sort columns by name,
sort rows, compare values exactly (both sides pre-round doubles).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from cmsspark_spark.session import get_spark

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    s = get_spark(
        "cmsspark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for sf_dir in {SF_SMOKE, SF_ORACLE}:
        schema = "sf" + sf_dir.rstrip("/").split("sf")[-1].replace(".", "_")
        con.execute(f"CREATE SCHEMA IF NOT EXISTS {schema}")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {schema}.{t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
    yield con
    con.close()


def duck_schema_for(sf_dir: str) -> str:
    return "sf" + sf_dir.rstrip("/").split("sf")[-1].replace(".", "_")


def _canon_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # both sides round explicitly in the queries; format defensively
        return f"{v:.9g}"
    return str(v)


def canonical_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def compare_query(spark, duck, name, fn, sql, sf_dir):
    """Run Spark fn and DuckDB sql; return (ok, detail)."""
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    schema = duck_schema_for(sf_dir)
    duck.execute(f"SET schema = '{schema}'")
    res = duck.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    sc, sr = canonical_rows(s_cols, s_rows)
    dc, dr = canonical_rows(d_cols, d_rows)
    if sc != dc:
        return False, f"column mismatch: spark={sc} duck={dc}"
    if len(sr) != len(dr):
        return False, f"row count mismatch: spark={len(sr)} duck={len(dr)}"
    if sr != dr:
        diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"{len(sr)} rows"
