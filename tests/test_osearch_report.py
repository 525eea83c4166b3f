"""Parity tests for the OpenSearch index-lifecycle pure functions
(osearch/osearch.py:116-217) and the K7 report writer
(condor_cpu_efficiency.py:398-445) — no cluster, no browser: every
rule is checked against an independent in-test replica of the
reference's code path."""

from __future__ import annotations

import json
import time
from datetime import datetime

import pandas as pd
import pytest

from cmsspark_spark.sinks import osearch, report

UTC_TS = 1717245296  # 2024-06-01T12:34:56Z


def _ref_index_name(template, timestamp, index_mod):
    """Independent replica of the reference's naming
    (osearch.py:128-139): time.strftime over utcfromtimestamp."""
    ts = int(timestamp)
    mod = index_mod.upper()
    tt = datetime.utcfromtimestamp(ts).timetuple()
    if mod == "Y":
        return time.strftime(f"{template}-%Y", tt)
    if mod == "M":
        return time.strftime(f"{template}-%Y-%m", tt)
    if mod == "D":
        return time.strftime(f"{template}-%Y-%m-%d", tt)
    return template


@pytest.mark.parametrize("mod", ["", "Y", "M", "D", "y", "m", "d"])
@pytest.mark.parametrize(
    "ts",
    [
        UTC_TS,
        UTC_TS + 0.9,       # float truncation, not rounding
        1704067199,         # 2023-12-31T23:59:59Z — UTC/local boundary
        1704067200,         # 2024-01-01T00:00:00Z
    ],
)
def test_index_name_parity(mod, ts):
    assert osearch.index_name("test-foo", ts, mod) == _ref_index_name(
        "test-foo", ts, mod
    )


def test_index_name_is_utc_not_local():
    # one second before midnight UTC must stay on the UTC date even if
    # the local zone has rolled over
    assert osearch.index_name("t", 1704067199, "D") == "t-2023-12-31"


def test_index_schema_body_shape():
    body = osearch.index_schema_body(
        {"timestamp": {"format": "epoch_second", "type": "date"}},
        shards=3,
        replicas=2,
    )
    # reference convention: string-typed counts (osearch.py:23)
    assert body["settings"]["index"] == {
        "number_of_shards": "3",
        "number_of_replicas": "2",
    }
    assert body["mappings"]["properties"]["timestamp"]["type"] == "date"
    json.dumps(body)  # must be JSON-serializable as-is


def _ref_make_es_body(bulk_list, metadata=None):
    """Verbatim logic twin of osearch.py:181-192 (on copied dicts)."""
    metadata = metadata or {}
    body = ""
    for data in bulk_list:
        data = json.loads(json.dumps(data))
        if metadata:
            data.setdefault("metadata", {}).update(metadata)
        body += json.dumps({"index": {}}) + "\n"
        body += json.dumps(data) + "\n"
    return body


def test_make_bulk_body_parity():
    docs = [
        {"a": 1, "b": "x"},
        {"a": 2, "metadata": {"doc_local": True, "agent": "old"}},
    ]
    meta = {"agent": "spark", "v": 3}
    assert osearch.make_bulk_body(docs, meta) == _ref_make_es_body(docs, meta)
    assert osearch.make_bulk_body(docs, None) == _ref_make_es_body(docs, None)
    # caller's docs are not mutated (the reference mutates; we don't)
    assert docs[1]["metadata"] == {"doc_local": True, "agent": "old"}


def test_bulk_body_is_valid_ndjson():
    body = osearch.make_bulk_body([{"a": 1}, {"a": None}], {"m": 1})
    lines = body.strip().split("\n")
    assert len(lines) == 4
    assert json.loads(lines[0]) == {"index": {}}
    assert json.loads(lines[1]) == {"a": 1, "metadata": {"m": 1}}
    assert body.endswith("\n")


def test_chunks_and_drop_nulls():
    assert [len(c) for c in osearch.to_chunks(list(range(25)), 10)] == [10, 10, 5]
    assert osearch.drop_nulls_in_dict({"a": 1, "b": None, "c": 0, "d": ""}) == {
        "a": 1,
        "c": 0,
        "d": "",
    }


def _make_sink(**kw):
    created, posted = [], []
    sink = osearch.OpenSearchSink(
        index_template="test-foo",
        schema_body=osearch.index_schema_body({"timestamp": {"type": "date"}}),
        create_index=lambda name, body: created.append((name, body)),
        bulk_post=lambda name, body: posted.append((name, body)) or 0,
        **kw,
    )
    return sink, created, posted


def test_sink_creates_each_index_once():
    sink, created, posted = _make_sink(index_mod="D", batch_size=2)
    day1, day2 = UTC_TS, UTC_TS + 86400
    sink.send([{"timestamp": day1, "v": i} for i in range(3)])
    sink.send([{"timestamp": day2, "v": 9}])
    sink.send([{"timestamp": day1, "v": 99}])
    assert [c[0] for c in created] == ["test-foo-2024-06-01", "test-foo-2024-06-02"]
    # 3 docs at batch_size=2 → 2 posts, then 1 + 1
    assert [p[0] for p in posted] == [
        "test-foo-2024-06-01",
        "test-foo-2024-06-01",
        "test-foo-2024-06-02",
        "test-foo-2024-06-01",
    ]


def test_sink_drop_nulls_and_metadata_in_payload():
    sink, _, posted = _make_sink(drop_nulls=True, metadata={"producer": "cms"})
    sink.send([{"timestamp": UTC_TS, "v": None, "w": 1}])
    doc = json.loads(posted[0][1].strip().split("\n")[1])
    assert doc == {"timestamp": UTC_TS, "w": 1, "metadata": {"producer": "cms"}}


def test_sink_failure_accounting():
    fails = iter([2, None, 1])
    sink = osearch.OpenSearchSink(
        "t",
        {},
        create_index=lambda *a: None,
        bulk_post=lambda *a: next(fails),
        batch_size=1,
    )
    assert sink.send([{"timestamp": UTC_TS}] * 3) == 3


def test_sink_send_partition_from_spark_rows(spark):
    sink, created, posted = _make_sink(index_mod="M")
    df = spark.createDataFrame(
        [(UTC_TS, "a"), (UTC_TS + 1, "b")], "timestamp: long, site: string"
    )
    n_failed = sink.send_partition(df.collect())
    assert n_failed == 0
    assert created[0][0] == "test-foo-2024-06"
    docs = [
        json.loads(line)
        for line in posted[0][1].strip().split("\n")[1::2]
    ]
    assert {d["site"] for d in docs} == {"a", "b"}
    assert sink.send_partition([]) == 0


def test_format_pandas_percent_and_nan():
    pdf = pd.DataFrame({"eff": [95.123, float("nan")], "n": [1, 2]})
    out = report.format_pandas(pdf, {"eff": "{:,.1f}%"})
    assert list(out["eff"]) == ["95.1%", "-"]
    assert list(pdf["eff"])[0] == 95.123  # input untouched


def test_write_report_artifacts(spark, tmp_path):
    df = spark.createDataFrame(
        [("T1_US", 95.1234, 10), ("T2_DE", None, 3)],
        "site: string, eff: double, n: int",
    )
    pdf = report.write_report(
        df.orderBy("site"),
        str(tmp_path),
        name="eff",
        title="CPU efficiency <test>",
        subtitle="2024-06-01 to 2024-06-07",
        percent_cols={"eff": "{:,.1f}%"},
    )
    assert len(pdf) == 2
    # CSV carries raw values
    back = pd.read_csv(tmp_path / "eff.csv")
    assert back["eff"][0] == pytest.approx(95.1234)
    html = (tmp_path / "eff.html").read_text()
    # reference's table-tag rewrite applied; right-align stripped
    assert 'table id="dataframe" class="display compact"' in html
    assert "text-align: right" not in html
    # formatted percent + NaN dash rendered; title HTML-escaped
    assert "95.1%" in html and ">-<" in html.replace("</td>", "<")
    assert "CPU efficiency &lt;test&gt;" in html
    assert "2024-06-01 to 2024-06-07" in html


def test_write_report_max_rows_guard(spark, tmp_path):
    df = spark.range(50).withColumnRenamed("id", "v")
    with pytest.raises(ValueError, match="max_rows"):
        report.write_report(df, str(tmp_path), "big", "t", max_rows=10)


def test_report_embeds_svg_plots(spark, tmp_path):
    """The report_builder composition: one HTML artifact carrying the
    plot AND the datatable (reports/report_builder.py shape) — SVG
    inlined, no side image files."""
    import pyspark.sql.functions as F
    from cmsspark_spark.sinks.plots import bar_svg
    from cmsspark_spark.sinks.report import write_report

    agg = spark.createDataFrame(
        [("a", 3.0), ("b", 7.0)], "k: string, v: double"
    )
    svg = bar_svg(agg.toPandas(), "k", ["v"], title="inline")
    write_report(
        agg, str(tmp_path), "rep", "Title", plots=[svg],
    )
    html = (tmp_path / "rep.html").read_text()
    assert '<div class="plot"><svg' in html
    assert 'class="bar"' in html
    assert "table" in html  # the datatable still renders
    assert (tmp_path / "rep.csv").exists()
