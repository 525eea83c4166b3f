"""SVG plot mile (sinks/plots.py): geometry read back from the SVG
must reproduce the aggregated values — the plot is a sink, so the test
treats the emitted file as the contract (like the HTML report tests)."""

from __future__ import annotations

import math
import xml.etree.ElementTree as ET

import pytest
import pyspark.sql.functions as F

from cmsspark_spark.sinks.plots import PlotTooLargeError, write_plot

NS = {"svg": "http://www.w3.org/2000/svg"}


def _monthly(spark):
    # the dbs_event_count shape: month × type pivot of event counts
    return (
        spark.createDataFrame(
            [("2024-01", 10.0, 5.0), ("2024-02", 20.0, 0.0),
             ("2024-03", 15.0, 30.0)],
            "month: string, clicks: double, views: double",
        )
    )


def test_bar_svg_stacked_geometry(spark, tmp_path):
    p = str(tmp_path / "bars.svg")
    write_plot(_monthly(spark), p, kind="bar", x="month",
               y_cols=["clicks", "views"], title="Event count",
               ylabel="events")
    root = ET.parse(p).getroot()
    bars = root.findall(".//svg:rect[@class='bar']", NS)
    assert len(bars) == 6  # 3 months × 2 series
    # stacked: per-month total bar height proportional to value sum;
    # vmax = 45 (2024-03), so heights/h == value/45
    by_x = {}
    for b in bars:
        by_x.setdefault(b.get("data-x"), 0.0)
        by_x[b.get("data-x")] += float(b.get("height"))
    h_total = by_x["2024-03"]
    assert math.isclose(by_x["2024-01"] / h_total, 15.0 / 45.0, rel_tol=1e-3)
    assert math.isclose(by_x["2024-02"] / h_total, 20.0 / 45.0, rel_tol=1e-3)
    # legend + title present
    assert [t.text for t in root.findall(".//svg:text[@class='legend']", NS)] == [
        "clicks", "views",
    ]


def test_bar_svg_grouped_and_values(spark, tmp_path):
    p = str(tmp_path / "grouped.svg")
    write_plot(_monthly(spark), p, kind="bar", x="month",
               y_cols=["clicks", "views"], stacked=False)
    root = ET.parse(p).getroot()
    bars = root.findall(".//svg:rect[@class='bar']", NS)
    assert len(bars) == 6
    # grouped: every bar height proportional to its own value (vmax=30)
    ref = next(b for b in bars if float(b.get("data-value")) == 30.0)
    h_ref = float(ref.get("height"))
    for b in bars:
        v = float(b.get("data-value"))
        assert math.isclose(
            float(b.get("height")), v / 30.0 * h_ref, abs_tol=0.02
        )


def test_line_svg_points_match_series(spark, tmp_path):
    p = str(tmp_path / "line.svg")
    write_plot(_monthly(spark), p, kind="line", x="month",
               y_cols=["clicks", "views"], title="t")
    root = ET.parse(p).getroot()
    lines = root.findall(".//svg:polyline[@class='series']", NS)
    assert {ln.get("data-series") for ln in lines} == {"clicks", "views"}
    for ln in lines:
        pts = ln.get("points").split()
        assert len(pts) == 3  # one vertex per month
    # y decreases as value increases: clicks 2024-02 (20) above 2024-01 (10)
    clicks = next(ln for ln in lines if ln.get("data-series") == "clicks")
    ys = [float(pt.split(",")[1]) for pt in clicks.get("points").split()]
    assert ys[1] < ys[0] < ys[2] or ys[1] < ys[0]  # 20 higher than 10


def test_pie_svg_fractions(spark, tmp_path):
    df = spark.createDataFrame(
        [("T1_US_FNAL", 75.0), ("T2_CH_CERN", 25.0)],
        "site: string, pb: double",
    )
    p = str(tmp_path / "pie.svg")
    write_plot(df, p, kind="pie", label_col="site", value_col="pb",
               title="PB by site")
    root = ET.parse(p).getroot()
    slices = root.findall(".//svg:path[@class='slice']", NS)
    assert len(slices) == 2
    labels = root.findall(".//svg:text[@class='slice-label']", NS)
    texts = [t.text for t in labels]
    assert any("75.0%" in t for t in texts)
    assert any("25.0%" in t for t in texts)
    # the 75% slice uses the large-arc flag, the 25% one doesn't
    d75 = next(s for s in slices if s.get("data-label") == "T1_US_FNAL")
    assert " 1 1 " in d75.get("d")


def test_pie_single_slice_full_circle(spark, tmp_path):
    df = spark.createDataFrame([("only", 5.0)], "k: string, v: double")
    p = str(tmp_path / "one.svg")
    write_plot(df, p, kind="pie", label_col="k", value_col="v")
    root = ET.parse(p).getroot()
    assert root.findall(".//svg:circle[@class='slice']", NS)


def test_max_rows_guard(spark, tmp_path):
    big = spark.range(50).select(
        F.col("id").cast("string").alias("x"), F.lit(1.0).alias("y")
    )
    with pytest.raises(PlotTooLargeError):
        write_plot(big, str(tmp_path / "x.svg"), kind="bar", x="x",
                   y_cols=["y"], max_rows=10)


def test_end_to_end_event_count_plot(spark, tmp_path):
    """The dbs_event_count composition: events → month×type pivot →
    stacked bars, all driver-side after the aggregation."""
    from tests.conftest import SF_ORACLE
    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    pivoted = (
        ev.withColumn("month", F.date_format("ts", "yyyy-MM"))
        .groupBy("month").pivot("event_type").count().na.fill(0)
        .orderBy("month")
    )
    p = write_plot(
        pivoted, str(tmp_path / "events.svg"), kind="bar", x="month",
        y_cols=[c for c in pivoted.columns if c != "month"],
        title="Event count by month", ylabel="events",
    )
    root = ET.parse(p).getroot()
    assert root.findall(".//svg:rect[@class='bar']", NS)


def test_replica_core_hours_line_plot(spark, tmp_path):
    """The condor_hs06coreHrPlot composition: the hs06_core_hours
    replica's per-day aggregate rendered through the SVG line writer —
    the reference's savefig mile on a REAL replica output."""
    from cmsspark_spark.jobs.cms_replicas import hs06_core_hours
    from cmsspark_spark.sinks.plots import write_plot
    from tests.cms_fixtures import MS0, crab_condor_df

    agg = hs06_core_hours(
        crab_condor_df(spark), MS0, MS0 + 42 * 86400_000, by="month"
    )
    num_cols = [
        c for c, t in agg.dtypes
        if t in ("double", "bigint", "long") and c != agg.columns[0]
    ][:2]
    x_col = agg.columns[0]
    p = write_plot(
        agg.orderBy(x_col), str(tmp_path / "corehr.svg"), kind="line",
        x=x_col, y_cols=num_cols, title="HS06 core hours",
    )
    root = ET.parse(p).getroot()
    series = root.findall(".//svg:polyline[@class='series']", NS)
    assert {s.get("data-series") for s in series} == set(num_cols)
    n_rows = agg.count()
    for s in series:
        assert len(s.get("points").split()) == n_rows


def test_campaign_report_pie_composition(spark, tmp_path):
    """The visualize_campaigns mile end-to-end: campaign_mss_report's
    top campaigns by PhEDEx bytes rendered as the reference's pie
    (reports/visualize_campaigns.py:105-117), slice fractions matching
    the aggregate."""
    from cmsspark_spark.jobs.cms_replicas import campaign_mss_report
    from cmsspark_spark.sinks.plots import write_plot
    from tests.cms_fixtures import phedex_df, files_df, datasets_df
    import pyspark.sql.functions as _F

    phedex = phedex_df(spark).select(
        _F.col("dataset").alias("dataset_name"),
        _F.col("node").alias("node_name"),
        _F.col("bytes").alias("block_bytes"),
    )
    dbs = (
        files_df(spark).join(datasets_df(spark), on="dataset_id")
        .groupBy("dataset").agg(_F.sum("file_size").alias("dbs_size"))
    )
    top = campaign_mss_report(phedex, dbs, limit=6).select(
        "campaign", "phedex_size"
    )
    p = write_plot(
        top, str(tmp_path / "campaigns.svg"), kind="pie",
        label_col="campaign", value_col="phedex_size",
        title="Top campaigns by PhEDEx size",
    )
    root = ET.parse(p).getroot()
    slices = root.findall(".//svg:*[@class='slice']", NS)
    rows = {r["campaign"]: r["phedex_size"] for r in top.collect()}
    assert len(slices) == len(rows)
    total = sum(rows.values())
    for s in slices:
        assert math.isclose(
            float(s.get("data-value")), rows[s.get("data-label")]
        )
    assert total > 0
