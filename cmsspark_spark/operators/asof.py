"""As-of join: each left row paired with the most recent right row at
or before its timestamp, per key.

Spark has no native as-of join (SURVEY §2.4 notes the reference has
none either; pandas/DuckDB do). The naive formulation — range join +
argmax — explodes into a cross product per key. This implementation is
the scalable union form:

1. tag both inputs and union them (right rows carry the payload),
2. one window sorted by (ts, side) per key: ``last(payload,
   ignorenulls=True)`` carries the latest right payload forward,
3. keep left rows.

Cost: ONE shuffle on the key + a sort within partitions — linear, no
per-key blowup, skew handled by AQE like any other keyed shuffle. Tie
semantics: a right row at exactly the left timestamp matches
(``right_ts <= left_ts``), like DuckDB/pandas ``ASOF JOIN``.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str] | None = None,
) -> DataFrame:
    """Backward as-of join (latest right ≤ left ts, per ``on`` key).

    ``payload``: right columns to attach (default: all non-key,
    non-timestamp columns). Left rows with no prior right row keep
    null payloads (left-outer semantics).
    """
    on = list(on)
    payload = list(
        payload
        if payload is not None
        else [c for c in right.columns if c not in on and c != right_ts]
    )
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(
            f"as_of_join: right payload columns {sorted(clash)} collide with "
            "left columns — alias them on the right side first (the union "
            "form would silently overwrite the left values)"
        )
    l2 = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    for c in payload:
        l2 = l2.withColumn(c, F.lit(None))
    r2 = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in payload],
    )
    unioned = l2.unionByName(r2, allowMissingColumns=True)
    # right rows (side 0) sort before left rows at equal ts → inclusive
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned
    for c in payload:
        carried = carried.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return carried.filter(F.col("_side") == 1).drop("_ts", "_side")
