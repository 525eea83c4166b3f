"""Incremental recompute driver (SURVEY §2.9 T2/T3, §7.2 M7).

The reference's iterative mode recomputes the last ~2 months, drops
those months from a pickled pandas history and concatenates
(hpc_running_cores_and_corehr.py:8-13, 572-590, 637-667). Here the
curated table IS the history: a day-partitioned parquet table where
each run recomputes only recent partitions and dynamic-overwrite
replaces exactly those partitions, leaving the rest untouched —
no driver-side state, safe to re-run, scales to any history length.
"""

from __future__ import annotations

from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cmsspark_spark.sinks import write_partitioned_parquet


def recompute_recent_partitions(
    spark: SparkSession,
    compute: Callable[[SparkSession, str, str], DataFrame],
    table_path: str,
    start_day: str,
    end_day: str,
    day_col: str = "day",
) -> DataFrame:
    """Recompute ``[start_day, end_day]`` and overwrite ONLY those
    partitions of the curated table.

    ``compute(spark, start_day, end_day)`` returns the recomputed slice
    (must contain ``day_col``). History outside the window is never
    read or written — the incremental contract (T2). Returns the slice.
    """
    fresh = compute(spark, start_day, end_day).filter(
        F.col(day_col).between(start_day, end_day)
    )
    write_partitioned_parquet(
        fresh, table_path, partition_by=(day_col,), mode="overwrite", dynamic=True
    )
    return fresh


def read_curated(spark: SparkSession, table_path: str) -> DataFrame:
    """Read the full curated history (partition-pruned on filters)."""
    return spark.read.option("basePath", table_path).parquet(table_path)
