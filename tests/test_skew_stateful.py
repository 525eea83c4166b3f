"""Skew-salting equivalence tests + stateful streaming sessionization."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from cmsspark_spark import streaming as ST
from cmsspark_spark.operators import skew


def test_salted_agg_equals_plain_agg(spark):
    # one hot key (90% of rows) + long tail
    rows = [("hot", float(i)) for i in range(900)] + [
        (f"k{i % 7}", float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    plain = {
        (r.k): (r.s, r.c)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    salted = {
        (r.k): (r.s, r.c)
        for r in skew.salted_agg(
            df,
            ["k"],
            partial_aggs=[F.sum("v").alias("_s"), F.count(F.lit(1)).alias("_c")],
            final_aggs=[F.sum("_s").alias("s"), F.sum("_c").alias("c")],
        ).collect()
    }
    assert salted == plain


def test_salted_broadcast_left_equals_plain_join(spark):
    left = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", 1), ("miss", 2)], ["k", "v"]
    )
    right = spark.createDataFrame([("hot", "H"), ("cold", "C")], ["k", "tag"])
    plain = sorted(
        (r.k, r.v, r.tag) for r in left.join(right, on=["k"]).collect()
    )
    salted = sorted(
        (r.k, r.v, r.tag)
        for r in skew.salted_broadcast_left(left, right, on=["k"]).collect()
    )
    assert salted == plain


def test_stateful_sessionization_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-user state across micro-batches:
    two input files arriving as separate batches must produce the same
    session counts as the batch lag-window computation."""
    src = tmp_path / "in"
    src.mkdir()
    schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
        ]
    )
    # user 1: events 10min apart (1 session) then a 2h gap (2nd session)
    # user 2: single event
    batch1 = [
        {"ts": "2024-01-01 10:00:00", "user_id": 1},
        {"ts": "2024-01-01 10:10:00", "user_id": 1},
        {"ts": "2024-01-01 09:00:00", "user_id": 2},
    ]
    batch2 = [
        {"ts": "2024-01-01 12:30:00", "user_id": 1},
        {"ts": "2024-01-01 12:40:00", "user_id": 1},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in batch1))

    stream = (
        spark.readStream.schema(
            StructType(
                [
                    StructField("ts", StringType()),
                    StructField("user_id", LongType()),
                ]
            )
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    out = ST.sessionize_stateful(stream, gap_seconds=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # second batch arrives; run another availableNow pass on same checkpoint?
    # memory sink + availableNow restarts state unless checkpointed: use
    # a checkpoint dir and a second start.
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in batch2))
    q2 = (
        out.writeStream.format("memory")
        .queryName("t_sessions2")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    got = {
        r.user_id: r.n_sessions
        for r in spark.sql(
            "SELECT user_id, max(n_sessions) n_sessions FROM t_sessions2 GROUP BY user_id"
        ).collect()
    }
    assert got[1] == 2  # 10:00-10:10 session + 12:30-12:40 session
    assert got[2] == 1
