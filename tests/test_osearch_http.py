"""K5/K6 integration against a REAL (in-process, localhost-only) HTTP
server: the bulk NDJSON protocol the reference speaks to OpenSearch
(osearch/osearch.py:189-217) driven end-to-end — index creation PUT,
chunked _bulk POSTs, null-dropping — with the server recording every
request. No network beyond 127.0.0.1; the server lives for one test."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest


@pytest.fixture()
def http_es():
    """Minimal OpenSearch-ish endpoint: PUT /<index> creates, POST
    /<index>/_bulk ingests NDJSON; everything is recorded."""
    state = {"created": [], "bulks": [], "docs": {}}

    class Handler(BaseHTTPRequestHandler):
        def _body(self) -> bytes:
            n = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(n)

        def do_PUT(self):  # index creation
            body = self._body()
            index = self.path.strip("/")
            state["created"].append((index, json.loads(body or b"{}")))
            state["docs"].setdefault(index, [])
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b'{"acknowledged": true}')

        def do_POST(self):  # _bulk
            body = self._body().decode()
            index = self.path.strip("/").removesuffix("/_bulk").strip("/")
            lines = [ln for ln in body.split("\n") if ln]
            docs = [json.loads(ln) for ln in lines[1::2]]
            actions = [json.loads(ln) for ln in lines[0::2]]
            assert all(a == {"index": {}} for a in actions)
            state["bulks"].append((index, len(docs)))
            state["docs"].setdefault(index, []).extend(docs)
            self.send_response(200)
            self.end_headers()
            self.wfile.write(
                json.dumps({"errors": False, "items": [{} for _ in docs]}).encode()
            )

        def log_message(self, *a):  # quiet
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}", state
    finally:
        srv.shutdown()
        t.join(timeout=5)


def _http(method: str, url: str, body: bytes) -> dict:
    from urllib.request import Request, urlopen

    req = Request(url, data=body, method=method,
                  headers={"Content-Type": "application/json"})
    with urlopen(req, timeout=10) as resp:
        return json.loads(resp.read() or b"{}")


def test_opensearch_sink_bulk_roundtrip_over_http(http_es):
    from cmsspark_spark.sinks.osearch import OpenSearchSink, index_schema_body

    base, state = http_es

    sink = OpenSearchSink(
        index_template="cms-mon",
        schema_body=index_schema_body({"day": {"type": "keyword"}}, shards=2),
        create_index=lambda name, schema: _http(
            "PUT", f"{base}/{name}", json.dumps(schema).encode()
        ),
        bulk_post=lambda name, ndjson: (
            0
            if not _http("POST", f"{base}/{name}/_bulk", ndjson.encode())["errors"]
            else 1
        ),
        index_mod="D",
        batch_size=3,
        drop_nulls=True,
    )
    docs = [
        {"timestamp": 1704067200 + i, "day": "2024-01-01", "n": i,
         "maybe": None if i % 2 else "x"}
        for i in range(8)
    ]
    assert sink.send(docs) == 0
    # one daily index created exactly once despite 3 chunks
    assert [c[0] for c in state["created"]] == ["cms-mon-2024-01-01"]
    assert state["created"][0][1]["settings"]["index"]["number_of_shards"] == "2"
    # chunking: 8 docs at batch_size=3 → 3,3,2
    assert [n for _, n in state["bulks"]] == [3, 3, 2]
    landed = state["docs"]["cms-mon-2024-01-01"]
    assert len(landed) == 8
    # null-dropping applied before shipping
    assert all("maybe" not in d for d in landed if d["n"] % 2 == 1)
    assert all(d.get("maybe") == "x" for d in landed if d["n"] % 2 == 0)


def test_push_documents_executor_side_over_http(spark, http_es):
    """The scale path: push_documents ships the transport to executors
    via foreachPartition; each executor-side chunk POSTs to the local
    server. Asserts every row lands exactly once with nulls dropped."""
    from cmsspark_spark.sinks import push_documents

    base, state = http_es
    url = f"{base}/events-idx/_bulk"  # by-value string for the closure

    def transport(docs: list[dict]) -> None:
        # By-value closure: stdlib-only, no cmsspark_spark references.
        import json as _json
        from urllib.request import Request, urlopen

        body = "".join(
            _json.dumps({"index": {}}) + "\n" + _json.dumps(d) + "\n"
            for d in docs
        )
        req = Request(url, data=body.encode(), method="POST",
                      headers={"Content-Type": "application/json"})
        with urlopen(req, timeout=10) as resp:
            resp.read()

    df = spark.createDataFrame(
        [(i, f"u{i}", None if i % 3 else f"t{i}") for i in range(20)],
        "id: long, user: string, tag: string",
    ).repartition(4)
    push_documents(df, transport, chunk_size=4, drop_nulls=True)

    landed = state["docs"].get("events-idx", [])
    assert sorted(d["id"] for d in landed) == list(range(20))
    # chunk discipline: no POST carried more than chunk_size docs
    assert all(n <= 4 for _, n in state["bulks"])
    # nulls dropped per-doc, survivors intact
    assert all("tag" not in d for d in landed if d["id"] % 3 != 0)
    assert all(d["tag"] == f"t{d['id']}" for d in landed if d["id"] % 3 == 0)
