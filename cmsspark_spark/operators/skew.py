"""Skew mitigation (beyond reference; SURVEY §4 O8 notes the reference
split one job by ExitCode to dodge a hot key).

AQE's skew-join handles most cases at runtime; these helpers cover the
two it can't:

- ``salted_agg``: a groupBy whose hot keys overwhelm single reducers —
  two-phase aggregation over a salted key. Works for any algebraic
  aggregate expressed as (partial, merge) pairs.
- ``salted_broadcast_left``: replicate-and-salt for a join where the
  LEFT side has hot keys and the right side is small enough to
  replicate ``salt`` times (the classic skew-join fallback when the
  right side is too big for plain broadcast but its hot-key slice
  isn't).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a salted key.

    Phase 1 groups by (keys, random salt in [0, salt)) — hot keys fan
    out over ``salt`` reducers; phase 2 merges the partials per key.
    ``partial_aggs`` aggregate raw rows; ``final_aggs`` merge the
    partial columns (e.g. partial ``sum(x) as s`` → final ``sum(s)``).

    Example: mean per key without a hot reducer:
        partial: [sum("v").alias("s"), count(lit(1)).alias("c")]
        final:   [(sum("s") / sum("c")).alias("mean")]
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    phase1 = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return phase1.groupBy(*keys).agg(*final_aggs)


def salted_broadcast_left(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-join: salt the hot LEFT side, replicate the right side
    ``salt`` times so every salted key still finds its match.

    Left grows a random salt column; right is exploded across all salt
    values. The join key becomes (on..., _salt) — a hot left key now
    spreads over ``salt`` reducers. Right-side duplication costs
    |right| × salt rows: use when right is small-ish but above the
    broadcast threshold.

    Supported ``how``: inner / left / left_semi / left_anti — shapes
    where only the (salted, row-preserved) left side survives
    unmatched. right/full outer are REJECTED: the replicated right
    side would emit each unmatched right row once per salt value — a
    silent ``salt``× duplication, not a join.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_broadcast_left supports inner/left/left_semi/"
            f"left_anti, got {how!r} (the replicated right side would "
            "emit unmatched right rows once per salt)"
        )
    salted_left = left.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    replicated_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_left.join(replicated_right, on=[*on, "_salt"], how=how)
    return out.drop("_salt")
