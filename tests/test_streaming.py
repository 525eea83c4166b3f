"""Structured Streaming twins of the batch operators (SURVEY §2.9):
file-source stream → watermark → tumbling window / dedup → memory sink.
Asserts streaming results equal the batch twin on the same data."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from cmsspark_spark import streaming as ST
from cmsspark_spark.operators.aggregations import time_bucket_agg

SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("k", StringType()),
        StructField("v", DoubleType()),
    ]
)

ROWS = [
    ("2024-01-01 00:01:00", "a", 1.0),
    ("2024-01-01 00:05:00", "a", 2.0),
    ("2024-01-01 00:14:00", "b", 3.0),
    ("2024-01-01 00:16:00", "a", 4.0),
    ("2024-01-01 00:31:00", "b", 5.0),
]


def _write_stream_input(tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    recs = [{"ts": ts, "k": k, "v": v} for ts, k, v in ROWS]
    (src / "batch0.json").write_text("\n".join(json.dumps(r) for r in recs))
    return str(src)


def _run_to_completion(sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_tumbling_window_matches_batch(spark, tmp_path):
    src = _write_stream_input(tmp_path)
    stream = (
        spark.readStream.schema(SCHEMA)
        .json(src)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    agg = ST.tumbling_window_agg(
        stream, "ts", "15 minutes", ["k"], [F.sum("v").alias("sv")]
    )
    _run_to_completion(agg.select("bucket_start", "k", "sv"), "t_win")
    got = {
        (str(r.bucket_start), r.k, r.sv)
        for r in spark.sql("SELECT * FROM t_win").collect()
    }

    batch = spark.createDataFrame(ROWS, ["ts", "k", "v"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    expect = {
        (str(r.bucket_start), r.k, r.sv)
        for r in time_bucket_agg(
            batch, "ts", "15 minutes", ["k"], [F.sum("v").alias("sv")]
        ).collect()
    }
    assert got == expect and len(got) > 0


def test_streaming_dedup_drops_repeats(spark, tmp_path):
    src = tmp_path / "in2"
    src.mkdir()
    recs = [
        {"ts": "2024-01-01 00:01:00", "k": "x", "v": 1.0},
        {"ts": "2024-01-01 00:02:00", "k": "x", "v": 2.0},  # dup key
        {"ts": "2024-01-01 00:03:00", "k": "y", "v": 3.0},
    ]
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in recs))
    stream = (
        spark.readStream.schema(SCHEMA)
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    deduped = ST.streaming_dedup(stream, ["k"], ts_col="ts")
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ks = sorted(r.k for r in spark.sql("SELECT k FROM t_dedup").collect())
    assert ks == ["x", "y"]


def test_streaming_dedup_batch_passthrough(spark):
    df = spark.createDataFrame([("x", 1), ("x", 2), ("y", 3)], ["k", "v"])
    out = ST.streaming_dedup(df, ["k"])
    assert out.count() == 2


def test_streaming_count_min_matches_batch(spark, tmp_path):
    """Two micro-batches of keys merged through the streaming sketch
    must equal the batch sketch over all rows — the cellwise-merge
    property driving the bounded foreachBatch store."""
    from cmsspark_spark.operators.sketches import count_min_build

    src = tmp_path / "cm_in"
    src.mkdir()
    rows_a = [{"k": i % 7} for i in range(60)]
    rows_b = [{"k": i % 13} for i in range(90)]
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows_a))
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in rows_b))

    stream = (
        spark.readStream.schema("k long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    store = str(tmp_path / "cm_store")
    q = (
        ST.streaming_count_min(
            stream, "k", store, depth=4, width=32,
            checkpoint=str(tmp_path / "cm_ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = spark.createDataFrame(
        [(r["k"],) for r in rows_a + rows_b], "k long"
    )
    want = {
        (r.d, r.bucket): r.cnt
        for r in count_min_build(batch, "k", depth=4, width=32).collect()
    }
    got = {
        (r.d, r.bucket): r.cnt for r in spark.read.parquet(store).collect()
    }
    assert got == want and len(got) > 0
