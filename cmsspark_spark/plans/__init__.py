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
    """Number of shuffle boundaries in the physical plan. Counts node
    detail headers ('(n) Exchange') so tree+detail duplication in the
    formatted output doesn't double-count."""
    import re

    return len(re.findall(r"^\(\d+\) Exchange", formatted_plan(df), re.M))


def count_nodes(df: DataFrame, node: str) -> int:
    """Count physical operators by node name via detail headers."""
    import re

    return len(re.findall(rf"^\(\d+\) {node}", formatted_plan(df), re.M))


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees (0 = codegen fully broken)."""
    import re

    text = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return int(m.group(1)) if m else 0


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def scan_read_schema(df: DataFrame) -> list[str]:
    """The ReadSchema lines of all file scans (column-pruning check)."""
    return [
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "ReadSchema" in line
    ]


def executed_plan_node_count(df: DataFrame, node: str) -> int:
    """Count nodes in the POST-EXECUTION physical plan. AQE finalizes
    exchange reuse at runtime, so reuse assertions must run the query
    first and then read the adaptive plan (the static plan shows the
    pre-reuse shape)."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString().count(node)
