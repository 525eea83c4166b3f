"""Structured Streaming upgrades of the reference's batch micro-architecture.

The reference has no streaming runtime (SURVEY §2.9): late data is
handled by re-scanning ``date ± day_delta`` (spark_utils.py:768-788),
exactly-once-ish by key dedup after multi-day scans, and tumbling
windows by epoch-mod arithmetic. These helpers express the same
semantics as Structured Streaming operators so a stream-fed deployment
needs no operator rewrites:

- ``with_late_data_watermark``  — T1 → ``withWatermark``
- ``streaming_dedup``           — T4 → ``dropDuplicates`` within watermark
- ``tumbling_window_agg``       — T5 → ``F.window`` groupBy (identical
  expression to ``operators.aggregations.time_bucket_agg``, which is the
  batch twin — same plan shape batch or stream).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def with_late_data_watermark(df: DataFrame, ts_col: str, delay: str = "1 day") -> DataFrame:
    """Event-time watermark bounding state for late data (T1: the
    streaming equivalent of the reference's ±day_delta re-scan)."""
    return df.withWatermark(ts_col, delay)


def streaming_dedup(
    df: DataFrame, keys: Sequence[str], ts_col: str | None = None, delay: str = "1 day"
) -> DataFrame:
    """Exactly-once-ish key dedup (T4). With a watermark the state store
    evicts old keys; batch DataFrames pass through to plain
    dropDuplicates."""
    if ts_col is not None and df.isStreaming:
        df = df.withWatermark(ts_col, delay)
    return df.dropDuplicates(list(keys))


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    bucket: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    delay: str = "1 day",
) -> DataFrame:
    """Tumbling-window aggregation usable batch or streaming (T5)."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, delay)
    win = F.window(F.col(ts_col), bucket)
    return (
        df.groupBy(win.alias("w"), *keys)
        .agg(*aggs)
        .withColumn("bucket_start", F.col("w.start"))
        .drop("w")
    )
