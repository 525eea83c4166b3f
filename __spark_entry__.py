"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are backed by the engine's query
registry (cmsspark_spark/queries.py): each entry exercises one or more
operators from SURVEY.md §2 plus the beyond-reference training-data
operators, with a DuckDB-oracle SQL twin wherever the semantics are
ANSI-SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cmsspark_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the dataset-popularity
    spine (SURVEY §7.1) — access stream ⋈ broadcast catalog dims,
    per-(site, tier) accesses / distinct datasets / bytes."""
    from cmsspark_spark.queries import cms_popularity_spine

    return cms_popularity_spine(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family (SURVEY.md §2)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return dict(ORACLES)
