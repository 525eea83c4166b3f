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


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    clicks = [
        ("2024-01-01 00:00:30", "u1", 1.0),
        ("2024-01-01 00:04:00", "u2", 2.0),
        ("2024-01-01 00:20:00", "u1", 3.0),
    ]
    buys = [
        ("2024-01-01 00:05:00", "u1", 10.0),   # 270s after u1 click → in window
        ("2024-01-01 00:05:30", "u2", 20.0),   # 90s after u2 click → in window
        ("2024-01-01 00:40:00", "u1", 30.0),   # 1200s after u1@20:00 → out (>600)
    ]
    cdir, bdir = tmp_path / "clicks", tmp_path / "buys"
    cdir.mkdir(), bdir.mkdir()
    (cdir / "b0.json").write_text(
        "\n".join(json.dumps({"ts": t, "k": k, "v": v}) for t, k, v in clicks)
    )
    (bdir / "b0.json").write_text(
        "\n".join(json.dumps({"ts": t, "k": k, "v": v}) for t, k, v in buys)
    )

    def join(l, r):
        return ST.stream_interval_join(
            l, r, key="k", left_ts="ts", right_ts="ts",
            lower_seconds=0, upper_seconds=600,
        )

    lb = spark.read.schema(SCHEMA).json(str(cdir))
    rb = spark.read.schema(SCHEMA).json(str(bdir))
    batch = {(r["k"], r["l_v"], r["r_v"]) for r in join(lb, rb).collect()}
    assert batch == {("u1", 1.0, 10.0), ("u2", 2.0, 20.0)}

    ls = spark.readStream.schema(SCHEMA).json(str(cdir))
    rs = spark.readStream.schema(SCHEMA).json(str(bdir))
    q = (
        join(ls, rs)
        .writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["k"], r["l_v"], r["r_v"])
        for r in spark.sql("SELECT * FROM ssj").collect()
    }
    assert got == batch


def test_streaming_dedup_within_watermark_bounds_state(spark, tmp_path):
    rows = [
        ("2024-01-01 00:01:00", "a", 1.0),
        ("2024-01-01 00:01:00", "a", 1.0),   # exact dup → dropped
        ("2024-01-01 00:03:00", "a", 9.0),   # same key within delay → dropped
        ("2024-01-01 00:02:00", "b", 2.0),
    ]
    src = tmp_path / "dd"
    src.mkdir()
    (src / "b0.json").write_text(
        "\n".join(json.dumps({"ts": t, "k": k, "v": v}) for t, k, v in rows)
    )
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    deduped = ST.streaming_dedup_within_watermark(
        stream, keys=["k"], ts_col="ts", delay="10 minutes"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("ddww")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["k"], r["v"]) for r in spark.sql("SELECT k, v FROM ddww").collect()
    )
    assert [k for k, _ in got] == ["a", "b"]
    # batch passthrough dedups on the key too
    b = ST.streaming_dedup_within_watermark(
        spark.read.schema(SCHEMA).json(str(src)), keys=["k"], ts_col="ts"
    )
    assert b.count() == 2



def test_stream_static_broadcast_enrich(spark, tmp_path):
    """Stream-static join: a file-source stream enriched against a
    static dim — the dim re-resolves per micro-batch and broadcasts
    (no state store; the streaming analogue of J3/J7)."""
    import json as _json

    dim = spark.createDataFrame(
        [("a", "site_A"), ("b", "site_B")], "k: string, site: string"
    )
    src = tmp_path / "in"
    src.mkdir()
    (src / "x.json").write_text(
        "\n".join(
            _json.dumps({"k": k, "v": i})
            for i, k in enumerate(["a", "b", "a", "z"])
        )
    )
    stream = spark.readStream.schema("k string, v long").json(str(src))
    joined = stream.join(F.broadcast(dim), on="k", how="left")
    q = (
        joined.writeStream.format("memory")
        .queryName("stream_static_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {
        (r["k"], r["v"], r["site"])
        for r in spark.sql("SELECT * FROM stream_static_t").collect()
    }
    assert rows == {
        ("a", 0, "site_A"), ("b", 1, "site_B"),
        ("a", 2, "site_A"), ("z", 3, None),
    }


def test_session_window_batch_stream_twin(spark, tmp_path):
    """Native session_window: the streaming form (watermark + state
    cleanup) must produce the batch form's sessions on the same data."""
    import json as _json

    rows = [
        ("2024-01-01 00:01:00", "u1", 1.0),
        ("2024-01-01 00:10:00", "u1", 2.0),   # same session (gap < 30m)
        ("2024-01-01 01:10:00", "u1", 4.0),   # new session
        ("2024-01-01 00:05:00", "u2", 8.0),
    ]
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(_json.dumps({"ts": t, "u": u, "v": v}) for t, u, v in rows)
    )
    schema = "ts timestamp, u string, v double"

    def sessions(df):
        return (
            df.groupBy(F.session_window("ts", "30 minutes"), "u")
            .agg(F.sum("v").alias("sv"), F.count("*").alias("n"))
            .select(
                "u",
                F.date_format("session_window.start", "HH:mm").alias("s"),
                "sv", "n",
            )
        )

    batch = {tuple(r) for r in sessions(spark.read.schema(schema).json(str(src))).collect()}
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        sessions(stream.withWatermark("ts", "1 hour"))
        .writeStream.format("memory")
        .queryName("sess_twin_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    streamed = {
        tuple(r) for r in spark.sql("SELECT * FROM sess_twin_t").collect()
    }
    assert batch == streamed
    assert ("u1", "00:01", 3.0, 2) in batch


def test_funnel_stream_to_osearch_sink_exactly_once(spark, tmp_path):
    """Streaming surface meets the sink adapters (r5 verdict #8):
    funnel_stateful → foreachBatch → OpenSearchSink through the
    recording transport, with an INDUCED crash after the sink push but
    before the batch commits. foreachBatch is at-least-once: the
    restarted query replays the batch (observable as duplicate bulk
    posts), and content-keyed upserts at the index — the deterministic
    doc-id idiom real OpenSearch loads use — make the composition
    effectively exactly-once. A fresh writeStream object on the same
    checkpoint is the restart; state (u1's stage walk) survives it."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from cmsspark_spark.sinks.osearch import OpenSearchSink, index_schema_body

    src = tmp_path / "in"
    src.mkdir()
    stream = (
        spark.readStream.schema(
            StructType(
                [
                    StructField("ts", StringType()),
                    StructField("user_id", LongType()),
                    StructField("event_type", StringType()),
                ]
            )
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    out = ST.funnel_stateful(stream, watermark="1 hour", horizon_seconds=7200)
    ckpt = str(tmp_path / "ckpt")

    created: list[str] = []
    bulk_calls: list[str] = []
    # the "index": content-keyed docs — replays upsert, not duplicate
    server: dict[tuple, dict] = {}

    def bulk_post(name, ndjson):
        bulk_calls.append(name)
        lines = [ln for ln in ndjson.split("\n") if ln]
        for doc_line in lines[1::2]:
            doc = json.loads(doc_line)
            server[(name, doc["user_id"], doc["stage"])] = doc
        return 0

    sink = OpenSearchSink(
        index_template="cms-funnel",
        schema_body=index_schema_body({"stage": {"type": "integer"}}),
        create_index=lambda n, b: created.append(n),
        bulk_post=bulk_post,
        index_mod="D",
        batch_size=1,  # force chunking: >1 bulk post per micro-batch
    )
    crash = {"armed": False}

    def push(bdf, bid):
        rows = (
            bdf.withColumn(
                "timestamp", F.unix_timestamp("stage_ts").cast("double")
            )
            .filter(F.col("stage") > 0)
            .select("user_id", "stage", "timestamp")
        )
        docs = [r.asDict() for r in rows.collect()]
        if docs:
            assert sink.send(docs) == 0
        if crash["armed"]:
            crash["armed"] = False
            raise RuntimeError("induced crash after push, before commit")

    def run(expect_error=False):
        q = (
            out.writeStream.foreachBatch(push)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(180)
        except Exception:
            assert expect_error, "unexpected streaming failure"
            return
        assert not expect_error, "induced crash did not surface"

    (src / "b1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"ts": "2024-01-01 10:00:00", "user_id": 1,
                 "event_type": "view"},
                {"ts": "2024-01-01 10:00:00", "user_id": 2,
                 "event_type": "view"},
            ]
        )
    )
    crash["armed"] = True
    run(expect_error=True)  # sink got the docs, batch never committed
    n_calls_after_crash = len(bulk_calls)
    assert n_calls_after_crash >= 2  # batch_size=1 → one post per doc

    run()  # restart on the same checkpoint: the batch REPLAYS
    assert len(bulk_calls) > n_calls_after_crash  # at-least-once visible
    idx = "cms-funnel-2024-01-01"
    assert created and set(created) == {idx}
    assert set(server) == {(idx, 1, 1), (idx, 2, 1)}  # exactly-once content

    # state survived the crash/restart cycle: u1 advances, not restarts
    (src / "b2.json").write_text(
        json.dumps(
            {"ts": "2024-01-01 10:30:00", "user_id": 1,
             "event_type": "click"}
        )
    )
    run()
    assert set(server) == {(idx, 1, 1), (idx, 2, 1), (idx, 1, 2)}


def test_stream_events_job_cron_drain_and_state_carryover(spark, tmp_path):
    """r6: the stream_events CLI job in its cron shape — each
    available-now run drains new files, state carries across runs via
    the checkpoint, every micro-batch lands in an idempotent
    batch_id=N parquet dir, and the injected transport sees the same
    updates."""
    from cmsspark_spark.jobs import stream_events as SE

    src = tmp_path / "in"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pushed: list[dict] = []

    def drain():
        stream = SE.build_stream(
            spark, str(src), "sessionize", gap_seconds=1800
        )
        SE.run(spark, stream, out, ckpt, transport=pushed.extend)

    (src / "b1.json").write_text(
        json.dumps({"ts": "2024-01-01 10:00:00", "user_id": 1,
                    "event_type": "view", "value": 1.0})
    )
    drain()
    assert [(d["user_id"], d["n_sessions"]) for d in pushed] == [(1, 1)]

    # second cron invocation: NEW query object, same checkpoint — the
    # 2h gap means a SECOND session only if state survived the restart
    (src / "b2.json").write_text(
        json.dumps({"ts": "2024-01-01 12:30:00", "user_id": 1,
                    "event_type": "view", "value": 1.0})
    )
    pushed.clear()
    drain()
    assert [(d["user_id"], d["n_sessions"]) for d in pushed] == [(1, 2)]

    # parquet landing area: batch-id dirs, rows match the pushes
    import glob as _glob

    dirs = sorted(_glob.glob(f"{out}/batch_id=*"))
    assert len(dirs) >= 2
    back = spark.read.option("basePath", out).parquet(*dirs)
    per_batch = {
        (r.user_id, r.n_sessions) for r in back.collect()
    }
    assert (1, 1) in per_batch and (1, 2) in per_batch

    # tumbling dispatch drains through the same runner
    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    SE.run(
        spark,
        SE.build_stream(spark, str(src), "tumbling", window="15 minutes"),
        out2,
        ckpt2,
    )
    import glob as _glob2

    tdirs = _glob2.glob(f"{out2}/batch_id=*")
    assert tdirs
    trows = spark.read.option("basePath", out2).parquet(*tdirs).collect()
    assert any(r.event_type == "view" and r.n_events >= 1 for r in trows)

    # funnel dispatch: the view events walk users to stage 1
    out3, ckpt3 = str(tmp_path / "out3"), str(tmp_path / "ckpt3")
    SE.run(
        spark,
        SE.build_stream(spark, str(src), "funnel", horizon_seconds=86400),
        out3,
        ckpt3,
    )
    fdirs = _glob2.glob(f"{out3}/batch_id=*")
    assert fdirs
    frows = spark.read.option("basePath", out3).parquet(*fdirs).collect()
    assert any(r.user_id == 1 and r.stage == 1 for r in frows)

    # op dispatch: unknown op fails loudly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        SE.build_stream(spark, str(src), "bogus")


def test_minhash_gate_stream_exactly_once_output(spark, tmp_path):
    """r7: the streaming MinHash ingest gate — file-source stream
    through foreachBatch(minhash_gate_batch_fn) with batch-partitioned
    dynamic-overwrite output. Crash matrix: (a) crash after the output
    write but before the census commit replays to the IDENTICAL
    admitted set (same partition overwritten, no dups, no loss);
    (b) replay of a fully committed batch is a no-op (the census
    partition marker closes the self-refusal data-loss window);
    (c) across batches the census blocks near-dups of admitted docs."""
    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" for i in range(39)) + " tokX"
    far = " ".join(f"zzz{i}" for i in range(40))

    census = str(tmp_path / "census")
    out = str(tmp_path / "admitted")
    fn = ST.minhash_gate_batch_fn(census, out)

    b0 = spark.createDataFrame([(1, base), (2, far)], ["doc_id", "text"])
    fn(b0, 0)
    got0 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got0 == {1, 2}

    # (b) replay of the committed batch 0: no-op, output unchanged
    fn(b0, 0)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 2}

    # (c) batch 1 carries a near-dup of doc 1 and a fresh doc
    fresh = " ".join(f"new{i}" for i in range(40))
    b1 = spark.createDataFrame([(3, near), (4, fresh)], ["doc_id", "text"])

    # (a) induced crash AFTER output write, BEFORE census commit: a
    # clone of the adapter's body that dies before writing the census
    def crashing_batch(bdf, bid):
        from cmsspark_spark.operators.incremental import (
            score_increment_minhash_dedup,
        )
        from cmsspark_spark.sinks import write_partitioned_parquet
        import pyspark.sql.functions as F

        admitted = score_increment_minhash_dedup(spark, bdf, census)
        write_partitioned_parquet(
            admitted.withColumn("ingest_batch", F.lit(bid)),
            out,
            partition_by=("ingest_batch",),
        )
        raise RuntimeError("induced crash before census commit")

    try:
        crashing_batch(b1, 1)
    except RuntimeError:
        pass
    # replay through the real fn: census has no batch-1 partition, so
    # it re-scores (identical verdict) and overwrites the partition
    fn(b1, 1)
    rows = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {1, 2, 4}          # near-dup 3 refused, no dups
    assert rows[4].ingest_batch == 1
    # census now blocks a batch-2 near-dup of batch-1's doc 4
    b2 = spark.createDataFrame([(5, fresh)], ["doc_id", "text"])
    fn(b2, 2)
    assert 5 not in {r.doc_id for r in spark.read.parquet(out).collect()}


def test_minhash_gate_stream_via_writestream(spark, tmp_path):
    """The adapter on a real file-source availableNow stream: two doc
    files drain as micro-batches; the second file's near-dup of the
    first is refused by the census committed between batches."""
    import json as _json

    src = tmp_path / "in"
    src.mkdir()
    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" for i in range(39)) + " tokX"
    (src / "a.json").write_text(
        _json.dumps({"doc_id": 1, "text": base}) + "\n"
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    census = str(tmp_path / "census")
    out = str(tmp_path / "admitted")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = (
            stream.writeStream.foreachBatch(
                ST.minhash_gate_batch_fn(census, out)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1}
    (src / "b.json").write_text(
        _json.dumps({"doc_id": 2, "text": near}) + "\n"
    )
    run()
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1}


def test_psi_drift_monitor_flags_shifted_batch(spark, tmp_path):
    """r7: the streaming drift monitor — a reference histogram is
    persisted once; a same-distribution micro-batch scores tiny PSI,
    a shifted batch (all mass above the reference quantiles) clears
    the 0.25 threshold and is flagged; a bin the batch never hits
    still contributes (absence is drift)."""
    from cmsspark_spark.operators.pipeline import psi_reference

    ref_rows = [("s", v, ) for v in range(1, 41)]
    ref = spark.createDataFrame(ref_rows, "source string, n long")
    ref_path = str(tmp_path / "psi_ref")
    psi_reference(ref, "source", "n").write.parquet(ref_path)

    out = str(tmp_path / "drift")
    fn = ST.psi_drift_batch_fn(ref_path, out, "source", "n")

    same = spark.createDataFrame(
        [("s", v) for v in range(1, 41)], "source string, n long"
    )
    fn(same, 0)
    shifted = spark.createDataFrame(
        [("s", v) for v in range(100, 140)], "source string, n long"
    )
    fn(shifted, 1)

    rows = {r.batch_id: r for r in spark.read.parquet(out).collect()}
    assert rows[0].psi < 0.05 and not rows[0].drifted
    assert rows[1].psi > 0.25 and rows[1].drifted
    assert rows[1].n_cur == 40


def test_kmeans_serve_assigns_and_gates_retrain(spark, tmp_path):
    """r8: incremental k-means serving — a stored model assigns
    micro-batches without retraining; a same-distribution batch scores
    tiny cluster-share PSI (retrain=false), a shifted batch piles into
    one cluster and trips the retrain gate. Assignments must be
    byte-identical to the batch operator's."""
    import numpy as np

    from cmsspark_spark.operators import similarity as S

    rng = np.random.default_rng(7)
    # two tight planted clusters around +/- 1
    vecs = [
        (i, (rng.normal(1.0 if i % 2 else -1.0, 0.05, 4)).tolist())
        for i in range(40)
    ]
    corpus = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    )
    model = str(tmp_path / "model")
    S.save_kmeans_model(corpus, model, k=2, iters=2, scale=1000)
    stored = spark.read.parquet(model).collect()
    assert len(stored) == 2
    assert abs(sum(r.train_share for r in stored) - 1.0) < 1e-9

    out, drift = str(tmp_path / "assign"), str(tmp_path / "drift")
    fn = ST.kmeans_serve_batch_fn(model, out, drift, psi_threshold=0.25)
    fn(corpus, 0)  # same distribution
    shifted = spark.createDataFrame(
        [(100 + i, (rng.normal(1.0, 0.05, 4)).tolist()) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    fn(shifted, 1)  # all mass in one cluster

    ledger = {r.batch_id: r for r in spark.read.parquet(drift).collect()}
    assert ledger[0].n_vecs == 40 and not ledger[0].retrain
    assert ledger[1].n_vecs == 20 and ledger[1].retrain
    assert ledger[1].psi > 0.25 >= ledger[0].psi

    # serving assignments == batch operator assignments (no flap)
    cents, scale, _ = S.load_kmeans_model(spark, model)
    want = {
        (r.vec_id, r.cluster, r.d2)
        for r in S.kmeans_assign(corpus, cents, scale=scale).collect()
    }
    got = {
        (r.vec_id, r.cluster, r.d2)
        for r in spark.read.parquet(out).filter(
            F.col("batch_id") == 0
        ).collect()
    }
    assert got == want


def test_kmeans_retrain_if_drifted_closes_the_loop(spark, tmp_path):
    """r8: the full train-once / serve / drift-gate / retrain cycle —
    a shifted batch trips the gate; kmeans_retrain_if_drifted re-fits
    on the accumulated corpus and overwrites the model; serving the
    SAME shifted distribution against the new model scores quiet. A
    quiet ledger must NOT retrain."""
    import numpy as np

    from cmsspark_spark.operators import similarity as S

    rng = np.random.default_rng(11)
    base = spark.createDataFrame(
        [(i, rng.normal(-1.0, 0.05, 4).tolist()) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    model = str(tmp_path / "model")
    S.save_kmeans_model(base, model, k=2, iters=2, scale=1000)

    out, drift = str(tmp_path / "assign"), str(tmp_path / "drift")
    fn = ST.kmeans_serve_batch_fn(model, out, drift, psi_threshold=0.25)
    shifted_rows = [
        (100 + i, rng.normal(3.0, 0.05, 4).tolist()) for i in range(40)
    ]
    shifted = spark.createDataFrame(
        shifted_rows, "vec_id long, embedding array<double>"
    )
    fn(shifted, 0)
    assert spark.read.parquet(drift).collect()[0].retrain

    # retrain over base + admitted increment; model swaps in place
    retrained = ST.kmeans_retrain_if_drifted(
        spark, model, drift, base.unionByName(shifted), k=2, iters=2
    )
    assert retrained
    tr = {r.cluster: r.train_share
          for r in spark.read.parquet(model).collect()}
    assert sorted(tr.values()) == [0.5, 0.5]  # new 50/50 mixture stored

    # a batch matching the RETRAINED mixture scores quiet (the gate
    # compares batch cluster shares to the trained mixture — a
    # homogeneous batch is still drift, by design)
    mixed = spark.createDataFrame(
        [(200 + i, rng.normal(-1.0, 0.05, 4).tolist()) for i in range(20)]
        + [(300 + i, rng.normal(3.0, 0.05, 4).tolist()) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    fn(mixed, 1)
    rows = {r.batch_id: r for r in spark.read.parquet(drift).collect()}
    assert rows[1].psi < 0.05 and not rows[1].retrain

    # quiet ledger -> no retrain (and the model file is untouched)
    import os

    mtimes = sorted(
        os.path.getmtime(os.path.join(model, f))
        for f in os.listdir(model)
    )
    assert not ST.kmeans_retrain_if_drifted(
        spark, model, drift, base, k=2, iters=2
    )
    assert mtimes == sorted(
        os.path.getmtime(os.path.join(model, f))
        for f in os.listdir(model)
    )


def test_kmeans_serve_on_availablenow_stream(spark, tmp_path):
    """The serve adapter on a real file-source stream: assignments and
    one drift ledger row per micro-batch."""
    import json as _json

    from cmsspark_spark.operators import similarity as S

    corpus = spark.createDataFrame(
        [(i, [float(i % 2), 1.0 - (i % 2)]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    model = str(tmp_path / "model")
    S.save_kmeans_model(corpus, model, k=2, iters=1, scale=10)

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(
            _json.dumps({"vec_id": 100 + i, "embedding": [1.0, 0.0]})
            for i in range(5)
        )
    )
    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).json(str(src))
    out, drift = str(tmp_path / "assign"), str(tmp_path / "drift")
    q = (
        stream.writeStream.foreachBatch(
            ST.kmeans_serve_batch_fn(model, out, drift)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 5
    assert len({r.cluster for r in rows}) == 1  # identical vecs agree
    assert spark.read.parquet(drift).count() == 1


def test_psi_drift_monitor_on_availablenow_stream(spark, tmp_path):
    """The adapter on a real file-source stream: one drift row per
    micro-batch lands in the ledger."""
    import json as _json

    from cmsspark_spark.operators.pipeline import psi_reference

    ref = spark.createDataFrame(
        [("s", v) for v in range(1, 21)], "source string, n long"
    )
    ref_path = str(tmp_path / "ref")
    psi_reference(ref, "source", "n").write.parquet(ref_path)

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(_json.dumps({"source": "s", "n": v}) for v in range(1, 21))
    )
    stream = spark.readStream.schema("source string, n long").option(
        "maxFilesPerTrigger", 1
    ).json(str(src))
    out = str(tmp_path / "ledger")
    q = (
        stream.writeStream.foreachBatch(
            ST.psi_drift_batch_fn(ref_path, out, "source", "n")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0].source == "s" and not rows[0].drifted

def test_quality_score_stream_serves_trained_weights(spark, tmp_path):
    """Train-once/serve-streaming for the quality classifier: weights
    fitted on planted separable vocab are persisted; an availableNow
    stream of new docs is scored per micro-batch and the keep flags
    reproduce the offline decision boundary."""
    import json as _json

    from cmsspark_spark.operators.pipeline import (
        logreg_hashed_features,
        logreg_hashed_train,
    )
    import pyspark.sql.functions as F

    pos = ["good clean prose here", "clean good text prose", "prose good here"]
    neg = ["junk spam noise garble", "garble spam junk", "noise junk spam"]
    train = spark.createDataFrame(
        [(i, t, True) for i, t in enumerate(pos)]
        + [(10 + i, t, False) for i, t in enumerate(neg)],
        "doc_id long, text string, is_q boolean",
    )
    feat = logreg_hashed_features(train, F.col("is_q"), n_buckets=64)
    w = logreg_hashed_train(feat, n_buckets=64, iters=8, lr=1.0)
    feat.unpersist()
    wpath = str(tmp_path / "weights")
    spark.createDataFrame(
        [(b, float(v)) for b, v in enumerate(w)], "b long, weight double"
    ).write.parquet(wpath)

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text(
        _json.dumps({"doc_id": 100, "text": "good clean prose"}) + "\n"
        + _json.dumps({"doc_id": 101, "text": "junk spam garble"}) + "\n"
    )
    out = str(tmp_path / "scored")
    q = (
        spark.readStream.schema("doc_id long, text string")
        .json(str(src))
        .writeStream.foreachBatch(
            ST.quality_score_batch_fn(wpath, out, n_buckets=64)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert rows[100].keep and not rows[101].keep
    assert rows[100].p_quality > 0.5 > rows[101].p_quality
