"""Streaming-events job: the operational entry point for the streaming
surface — tail a directory of JSON event files and maintain one of the
stateful operators continuously, landing each micro-batch's updates in
an append-only parquet area (and optionally through an injected
document transport, the same seam ``rucio_summary`` uses for
OpenSearch/AMQ).

The batch jobs (`rucio_summary`, `clean_corpus`) are the reference's
cron shape; this is the always-on twin: checkpointed state, watermarked
event time, exactly-once-ish delivery via foreachBatch + batch-id
directories. Run it with ``--trigger available-now`` from cron to drain
whatever arrived since the last run (state persists in the checkpoint
across invocations), or with ``--trigger continuous`` to stay up.

Run:
    python -m cmsspark_spark.jobs.stream_events \\
        --source-dir /data/events --out /tmp/stream_out \\
        --checkpoint /tmp/stream_ckpt --op sessionize

Ops: ``sessionize`` (per-user session counts, gap-based),
``funnel`` (per-user view→click→purchase stage walk),
``tumbling`` (per-type windowed value sums).
"""

from __future__ import annotations

import argparse
import sys
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cmsspark_spark import streaming as ST
from cmsspark_spark.session import get_spark

EVENT_SCHEMA = StructType(
    [
        StructField("ts", StringType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

OPS = ("sessionize", "funnel", "tumbling")


def build_stream(
    spark: SparkSession,
    source_dir: str,
    op: str,
    watermark: str = "1 hour",
    gap_seconds: int = 1800,
    horizon_seconds: int = 3600,
    window: str = "12 minutes",
) -> DataFrame:
    """File-source stream → the chosen stateful operator's update
    stream. JSON with the fixed event schema (S5 discipline: declared
    schema, no inference on a stream)."""
    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(source_dir)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    if op == "sessionize":
        return ST.sessionize_stateful(
            src, gap_seconds=gap_seconds, watermark=watermark
        )
    if op == "funnel":
        return ST.funnel_stateful(
            src, watermark=watermark, horizon_seconds=horizon_seconds
        )
    if op == "tumbling":
        return ST.tumbling_window_agg(
            src,
            "ts",
            window,
            ["event_type"],
            [
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("value_sum"),
            ],
            delay=watermark,
        )
    raise ValueError(f"op must be one of {OPS}, got {op!r}")


#: Driver-side cap on rows handed to the optional transport per
#: micro-batch — the update stream carries STATE KEYS (users, sites),
#: so real batches are far below this; a payload-grain stream wired in
#: by mistake fails loudly instead of OOMing the driver.
_TRANSPORT_MAX_ROWS = 100_000


def run(
    spark: SparkSession,
    stream: DataFrame,
    out: str,
    checkpoint: str,
    transport: Callable[[list[dict]], None] | None = None,
    available_now: bool = True,
    timeout_s: int = 300,
):
    """Start (and for available-now triggers, drain) the query.

    foreachBatch lands each micro-batch under ``{out}/batch_id=N`` —
    an idempotent target per batch id, so a replayed batch after a
    crash overwrites its own directory instead of duplicating rows
    (the parquet-side analog of the content-keyed index upserts the
    OpenSearch e2e test pins). The optional ``transport`` receives
    the same rows as JSON-able dicts (driver-side, bounded by the
    update-stream's size — state keys, not raw events), guarded by a
    hard ``_TRANSPORT_MAX_ROWS`` cap: the parquet landing always
    happens executor-side first, then a ``limit(cap+1)`` collect —
    if the update stream ever carries more than the cap (someone
    wires a payload-grain stream into this job), the transport leg
    raises instead of silently materializing an unbounded batch on
    the driver (r9 hygiene note).
    """

    def push(bdf, bid):
        bdf.write.mode("overwrite").parquet(f"{out}/batch_id={bid}")
        if transport is not None:
            rows = [
                r.asDict(recursive=True)
                for r in bdf.limit(_TRANSPORT_MAX_ROWS + 1).collect()
            ]
            if len(rows) > _TRANSPORT_MAX_ROWS:
                raise RuntimeError(
                    f"stream_events transport batch exceeds "
                    f"{_TRANSPORT_MAX_ROWS} rows — the update stream is "
                    "supposed to carry state keys, not raw events; the "
                    "parquet landing is complete, so re-run with a "
                    "key-grain stream or raise _TRANSPORT_MAX_ROWS "
                    "deliberately"
                )
            if rows:
                transport(rows)

    writer = (
        stream.writeStream.foreachBatch(push)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        # awaitTermination(timeout) returns False when the timeout
        # elapsed with the drain still running: stop the query and say
        # so loudly, rather than letting the cron process exit as if
        # the drain completed (safe either way — the checkpoint
        # replays the rest next run — but silently-partial is a lie;
        # ADVICE r6).
        if not q.awaitTermination(timeout_s):
            q.stop()
            print(
                f"warn: available-now drain exceeded {timeout_s}s and was "
                "stopped; checkpoint will resume the remainder next run",
                file=sys.stderr,
            )
        return q
    return writer.start()


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--op", default="sessionize", choices=OPS)
    ap.add_argument("--watermark", default="1 hour")
    ap.add_argument("--gap-seconds", type=int, default=1800)
    ap.add_argument("--horizon-seconds", type=int, default=3600)
    ap.add_argument("--window", default="12 minutes")
    ap.add_argument(
        "--trigger", default="available-now",
        choices=("available-now", "continuous"),
    )
    args = ap.parse_args()
    spark = get_spark("stream-events-job")
    stream = build_stream(
        spark, args.source_dir, args.op,
        watermark=args.watermark, gap_seconds=args.gap_seconds,
        horizon_seconds=args.horizon_seconds, window=args.window,
    )
    q = run(
        spark, stream, args.out, args.checkpoint,
        available_now=(args.trigger == "available-now"),
    )
    if args.trigger == "continuous":
        q.awaitTermination()


if __name__ == "__main__":
    main()
