"""Plan inspection helpers: assert the physical plan is the one we want.

The 100 TB goal is plan quality, not just correct rows: filters pushed
to the scan, schemas pruned, small dims broadcast, no stray shuffles.
These helpers turn those properties into testable assertions
(used by tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def plan_has(df: DataFrame, *needles: str) -> bool:
    plan = formatted_plan(df)
    return all(n in plan for n in needles)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle boundaries in the physical plan."""
    return formatted_plan(df).count("Exchange")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def scan_read_schema(df: DataFrame) -> list[str]:
    """The ReadSchema lines of all file scans (column-pruning check)."""
    return [
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "ReadSchema" in line
    ]
