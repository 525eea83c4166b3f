"""Nested-data operators: arrays of structs → rows (SURVEY §2.10 D3).

The reference explodes WMArchive ``steps[]`` and condor
``DESIRED_Sites[]`` with RDD flatMap lambdas (wmarchive.py:108-144,
degraded/stepchain_cpu_eff.py:66-107, spark_utils.py:681) — every
record crosses the JVM↔Python boundary. Here the same semantics are
``F.explode`` + column expressions: whole pipeline stays in
Catalyst/Tungsten (SURVEY §3.3 "rebuild rule: C collapses into A").
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def explode_steps(
    df: DataFrame,
    steps_col: str = "steps",
    keep: Sequence[str] = (),
    step_alias: str = "step",
    outer: bool = False,
) -> DataFrame:
    """One row per element of an array-of-structs column, struct fields
    flattened. ``keep`` lists parent columns to carry along; ``outer``
    keeps parents whose array is empty/null (explode_outer).

    Replaces wmarchive.py:108-144's per-record Python ``getdata`` loop.
    """
    ex = F.explode_outer(steps_col) if outer else F.explode(steps_col)
    exploded = df.select(*keep, ex.alias(step_alias))
    return exploded.select(*keep, f"{step_alias}.*")


def filter_steps_by_name(
    df: DataFrame, name_col: str = "name", prefix: str = "cmsrun"
) -> DataFrame:
    """The reference's 'first cmsRun step' / 'cmsRun steps only' filter
    (wmarchive.py:120: ``step['name'].lower().startswith('cmsrun')``)
    as a Catalyst predicate."""
    return df.filter(F.lower(F.col(name_col)).startswith(prefix))


def pack_steps(
    df: DataFrame,
    group_keys: Sequence[str],
    step_cols: Sequence[str | Column],
    steps_col: str = "steps",
) -> DataFrame:
    """Inverse of explode: collect per-key step structs into an array
    column (builds WMArchive-shaped nested records from flat facts)."""
    return df.groupBy(*group_keys).agg(
        F.collect_list(F.struct(*step_cols)).alias(steps_col)
    )
