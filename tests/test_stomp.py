"""AMQ push mile against a REAL (in-process, localhost-only) STOMP
broker: the 1.2 handshake, SEND frames, header escaping, receipts and
the MONIT notification envelope (cern_monit.py:37-63) driven
end-to-end, with the broker recording every frame. No network beyond
127.0.0.1; the broker lives for one test."""

from __future__ import annotations

import json
import socket
import socketserver
import threading

import pytest
import pyspark.sql.functions as F

from cmsspark_spark.sinks import push_documents
from cmsspark_spark.sinks.stomp import (
    StompTransport,
    amq_transport,
    build_frame,
    make_notification,
    parse_frame,
    read_frame,
)


@pytest.fixture()
def broker():
    """Minimal STOMP 1.2 broker: answers CONNECT with CONNECTED,
    records SENDs, honors receipt headers, acks DISCONNECT."""
    state = {"connects": [], "sends": [], "disconnects": 0}

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            buf = bytearray()
            while True:
                try:
                    cmd, hdrs, body = read_frame(self.request, buf)
                except (ConnectionError, OSError):
                    return
                if cmd == "CONNECT":
                    state["connects"].append(hdrs)
                    self.request.sendall(
                        build_frame("CONNECTED", {"version": "1.2"})
                    )
                elif cmd == "SEND":
                    state["sends"].append((hdrs, bytes(body)))
                    rid = hdrs.get("receipt")
                    if rid:
                        self.request.sendall(
                            build_frame("RECEIPT", {"receipt-id": rid})
                        )
                elif cmd == "DISCONNECT":
                    state["disconnects"] += 1
                    rid = hdrs.get("receipt")
                    if rid:
                        self.request.sendall(
                            build_frame("RECEIPT", {"receipt-id": rid})
                        )
                    return

    class Srv(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    srv = Srv(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv.server_address[1], state
    finally:
        srv.shutdown()


def test_frame_roundtrip_and_escaping():
    f = build_frame(
        "SEND", {"destination": "/topic/a:b", "weird": "x\ny\\z"}, b"body"
    )
    cmd, hdrs, body = parse_frame(f[:-1])
    assert cmd == "SEND"
    assert hdrs["destination"] == "/topic/a:b"
    assert hdrs["weird"] == "x\ny\\z"
    assert body == b"body"


def test_connect_requires_spec_headers(broker):
    port, state = broker
    t = StompTransport("127.0.0.1", port, login="u", passcode="p")
    hdrs = t.connect()
    assert hdrs["version"] == "1.2"
    t.disconnect()
    c = state["connects"][0]
    # spec-mandated CONNECT headers
    assert c["accept-version"] == "1.2"
    assert c["host"] == "127.0.0.1"
    assert (c["login"], c["passcode"]) == ("u", "p")
    assert state["disconnects"] == 1


def test_send_with_receipts(broker):
    port, state = broker
    t = StompTransport("127.0.0.1", port, receipt_every=2)
    t.connect()
    for i in range(5):
        t.send("/topic/cms", json.dumps({"i": i}).encode())
    t.disconnect()
    assert len(state["sends"]) == 5
    # every 2nd SEND carried a receipt header (2 of 5), all acked
    assert sum("receipt" in h for h, _ in state["sends"]) == 2
    bodies = [json.loads(b) for h, b in state["sends"]]
    assert bodies == [{"i": i} for i in range(5)]
    hdr = state["sends"][0][0]
    assert hdr["destination"] == "/topic/cms"
    assert int(hdr["content-length"]) == len(state["sends"][0][1])


def test_make_notification_envelope():
    doc = {"hash": "abc", "site": "T1", "n": 3}
    n = make_notification(doc, producer="cms", doc_type="metric", ts_ms=123)
    assert n["metadata"] == {
        "producer": "cms", "type": "metric", "timestamp": 123, "_id": "abc",
    }
    assert n["data"] == doc


def test_push_documents_through_amq_transport(spark, broker):
    """The full cern_monit mile: aggregated DataFrame → chunked docs →
    MONIT envelopes → STOMP SEND frames into the live broker, via the
    executor-side foreachPartition path."""
    port, state = broker
    df = spark.createDataFrame(
        [(i, f"site{i % 3}", float(i)) for i in range(20)],
        "doc_id: long, site: string, v: double",
    ).coalesce(2)
    transport = amq_transport(
        "127.0.0.1", port, "/topic/cms.metrics",
        producer="cms-test", receipt_every=4, ts_ms=999,
    )
    push_documents(df, transport, chunk_size=8, executor_side=False)
    transport.close()
    assert len(state["sends"]) == 20
    notes = [json.loads(b) for _, b in state["sends"]]
    assert {n["metadata"]["producer"] for n in notes} == {"cms-test"}
    assert {n["metadata"]["_id"] for n in notes} == {str(i) for i in range(20)}
    assert sorted(n["data"]["doc_id"] for n in notes) == list(range(20))
    assert {h["destination"] for h, _ in state["sends"]} == {
        "/topic/cms.metrics"
    }


def test_executor_side_push(spark, broker):
    """foreachPartition path: the transport factory's closure must be
    by-value picklable; one lazy connection per partition."""
    port, state = broker
    df = spark.range(12).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("v")
    ).repartition(3)
    transport = amq_transport(
        "127.0.0.1", port, "/topic/x", producer="p", ts_ms=1
    )
    push_documents(df, transport, chunk_size=5, executor_side=True)
    assert len(state["sends"]) == 12
    assert len(state["connects"]) <= 3  # ≤ one connection per partition


def test_streaming_foreachbatch_to_stomp(spark, broker, tmp_path):
    """Structured-Streaming → AMQ mile: a file-source stream pushed to
    the live STOMP broker via foreachBatch + push_documents — the
    streaming form of cern_monit's send2monit (micro-batch at-least-
    once: each batch's SENDs complete before the epoch commits)."""
    import json as _json

    port, state = broker
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(_json.dumps({"doc_id": i, "v": i * 1.5}) for i in range(7))
    )
    stream = (
        spark.readStream.schema("doc_id long, v double")
        .json(str(src))
    )
    transport = amq_transport(
        "127.0.0.1", port, "/topic/stream", producer="streamer", ts_ms=5
    )

    def _push(batch_df, epoch_id):
        push_documents(batch_df, transport, chunk_size=3, executor_side=False)

    q = (
        stream.writeStream.foreachBatch(_push)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    transport.close()
    assert len(state["sends"]) == 7
    notes = [json.loads(b) for _, b in state["sends"]]
    assert sorted(n["data"]["doc_id"] for n in notes) == list(range(7))
    assert {n["metadata"]["producer"] for n in notes} == {"streamer"}
