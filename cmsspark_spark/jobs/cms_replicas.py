"""Workflow replicas of the reference's flagship pipelines (SURVEY §5
level 2), as DataFrame→DataFrame functions over CMS-shaped inputs.

Each function takes its source DataFrames explicitly (dependency
injection: production wires the source registry, tests wire fixtures)
and composes the engine's operators. Reference pipelines replicated:

1. ``dataset_popularity``      — data_collection.py:161-174
2. ``rucio_dataset_stats``     — rucio_datasets_stats.py:143-676 (core)
3. ``condor_cpu_efficiency``   — degraded/condor_cpu_efficiency.py:363-420
4. ``hpc_core_hours_daily``    — hpc_running_cores_and_corehr.py:155-227
5. ``phedex_leftovers``        — reports/aggregate_leftovers.py:100-146
6. ``event_count_tier_month``  — dbs_event_count_plot.py:152-210
7. ``wmarchive_step_metrics``  — wmarchive.py:108-154
8. ``crab_unique_users``       — condor_crab_unique_users.py:55-95
9. ``aso_fts_stats``           — aso_stats.py:55-101
10. ``hs06_core_hours``        — condor_hs06coreHrPlot.py:54-93
11. ``dbs_block_file_match``   — dbs_lfn.py:40-55
12. ``dbs_block_lumis``        — dbs_block_lumis.py:41-60
13. ``phedex_merge``           — src/Go/mergePhedex.go:152-325
14. ``dbs_access_stream_counts`` — dbs_cmssw.py:63-76 (+ the aaa/eos/jm
    clones, parametrized away)
15. ``monit_envelope``         — cmssw_avro2json.py:18-50
16. ``crab_dataset_popularity`` — dbs_hdfs_crab.py:71-105
17. ``dbs_file_checksums``     — dbs_adler.py:40-62
18. ``rucio_datasets_monitoring`` — rucio_datasets_monitoring.py:385-470
19. ``wma_agent_count``        — wma_agent_count_to_opensearch.py:54-147
20. ``phedex_days_present``    — degraded/phedex_agg.py:37-91
21. ``dbs_events_agg``         — degraded/dbs_events.py:40-59
22. ``anonymize_columns``      — hdfs_an.py:23-67
23. ``rucio_daily``            — rucio_daily.py:31-64
24. ``campaign_mss_report``    — reports/aggregate_campaigns.py:136-210
25. ``fts_issuer_totals``      — fts_aso.py:41-77
26. ``eos_dataset_totals``     — dbs_hdfs_eos.py:70-121
27. ``rucio_ds_summary``       — rucio_ds_summary.py:210-335
28. ``dbs_condor_agg``         — degraded/dbs_condor.py:76-190
29. ``rucio_last_access_report`` — degraded/rucio_datasets_last_access_ts.py:184-336
30. ``aggregate_dbs_stats``    — reports/aggregate_dbs.py:56-77
31. ``campaign_tier_sizes``    — reports/aggregate_campaign_tier.py:84-140
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from cmsspark_spark.functions.cms import (
    clean_site_name,
    parse_dn,
    rse_tags,
    split_dataset,
    split_dataset_col,
    tier_from_site,
)
from cmsspark_spark.operators.joins import broadcast_if_small
from cmsspark_spark.operators.aggregations import (
    conditional_count,
    ratio_of_sums,
    two_level_agg,
)
from cmsspark_spark.operators.dedup import exact_dedup
from cmsspark_spark.operators.joins import (
    anti_join,
    day_template_fill,
    enrich,
    full_outer_coverage,
)


def dataset_popularity(
    access: DataFrame, files: DataFrame, datasets: DataFrame
) -> DataFrame:
    """Per (site, data tier): accesses, distinct users, bytes read.

    access stream ⋈ file catalog ⋈ dataset catalog — the dims are
    broadcast so the stream never shuffles before the aggregate
    (data_collection.py:161-174 with the J7 broadcast upgrade).
    Unresolvable file names (FIXTURES §14.2: 10%) drop out via the
    inner join, as in the reference.
    """
    f = files.select(
        F.col("logical_file_name").alias("file_lfn"), "dataset_id"
    )
    d = datasets.select("dataset_id", "dataset")
    _, _, tier = split_dataset_col("dataset")
    joined = (
        # DBS files/datasets are NOT fixed-size dims — they grow with
        # the catalog (hundreds of millions of files at production
        # scale), so the hint must be size-aware, not forced.
        access.join(broadcast_if_small(f), on="file_lfn")
        .join(broadcast_if_small(d), on="dataset_id")
        .withColumn("tier", tier)
        .withColumn("site", clean_site_name("site_name"))
        .withColumn("user", parse_dn("user_dn"))
    )
    return joined.groupBy("site", "tier").agg(
        F.count(F.lit(1)).alias("n_accesses"),
        F.countDistinct("user").alias("n_users"),
        F.round(F.sum("read_bytes") / 1e9, 4).alias("gb_read"),
    )


def rucio_dataset_stats(
    replicas: DataFrame,
    dids: DataFrame,
    contents: DataFrame,
    rses: DataFrame,
    files: DataFrame,
    datasets: DataFrame,
) -> DataFrame:
    """Per-dataset storage summary across RSEs (rucio_ds_summary /
    rucio_datasets_stats core): two-hop file→block→dataset mapping from
    Rucio contents (J9), last-access coalescing across replicas and
    DIDs via greatest (F8), per-(RSE, dataset) sums re-aggregated to
    per-dataset max/min/sum (A7), conditional never-accessed counts
    (A3)."""
    f2b = contents.filter(F.col("child_type") == "FILE").select(
        F.col("child").alias("name"), F.col("parent").alias("block")
    )
    b2d = contents.filter(F.col("child_type") == "BLOCK").select(
        F.col("child").alias("block"), F.col("parent").alias("dataset")
    )
    f2d = f2b.join(b2d, on="block").select("name", "dataset")

    did_access = dids.select("name", F.col("accessed_at").alias("did_accessed_at"))
    rep = (
        replicas.join(F.broadcast(rses), on="rse_id", how="left")
        .join(f2d, on="name", how="inner")
        .join(did_access, on="name", how="left")
        .withColumn("last_access", F.greatest("accessed_at", "did_accessed_at"))
    )
    per_rse_ds = rep.groupBy("rse", "dataset").agg(
        F.sum("bytes").alias("rse_bytes"),
        F.count(F.lit(1)).alias("n_replicas"),
        conditional_count(F.col("accessed_at").isNull()).alias("n_never_accessed"),
        F.max("last_access").alias("rse_last_access"),
    )
    return (
        per_rse_ds.groupBy("dataset")
        .agg(
            F.count(F.lit(1)).alias("n_rses"),
            F.round(F.sum("rse_bytes") / 1e9, 4).alias("total_gb"),
            F.round(F.max("rse_bytes") / 1e9, 4).alias("max_rse_gb"),
            F.sum("n_replicas").alias("n_replicas"),
            F.sum("n_never_accessed").alias("n_never_accessed"),
            F.max("rse_last_access").alias("last_access"),
        )
    )


def rucio_dbs_file_coverage(
    replicas: DataFrame, files: DataFrame
) -> DataFrame:
    """The run-stats coverage report (rucio_datasets_stats.py:408-437):
    which file names exist in Rucio only / DBS only / both (J4)."""
    cov = full_outer_coverage(
        replicas.select(F.col("name").alias("file_lfn")),
        files.select(F.col("logical_file_name").alias("file_lfn")),
        on=["file_lfn"],
    )
    return cov.groupBy("presence").agg(F.count(F.lit(1)).alias("n_files"))


def condor_cpu_efficiency(condor: DataFrame) -> DataFrame:
    """CPU efficiency per (site tier, job type): flatten the data
    envelope (P2), keep Completed (P3), dedup GlobalJobId keeping the
    earliest record (P9 — deterministic upgrade of drop_duplicates),
    eff = 100·Σcpu/ΣcoreTime with CoreTime = RequestCpus·WallClockHr
    (degraded/condor_cpu_efficiency.py:369-420). Null RequestCpus rows
    (FIXTURES §14.3: 10%) drop from the ratio via null propagation +
    coalesce guard, matching the reference's fillna-then-filter."""
    flat = condor.select("data.*").filter(F.col("Status") == "Completed")
    deduped = exact_dedup(flat, ["GlobalJobId"], tie_breaker="RecordTime")
    with_core = deduped.withColumn(
        "CoreTime", F.col("RequestCpus") * F.col("WallClockHr")
    ).filter(F.col("CoreTime").isNotNull())
    return with_core.groupBy(
        tier_from_site("Site").alias("site_tier"), F.col("Type").alias("job_type")
    ).agg(
        F.count(F.lit(1)).alias("n_jobs"),
        F.round(ratio_of_sums(F.col("CpuTimeHr"), F.col("CoreTime")), 4).alias(
            "cpu_eff_pct"
        ),
        F.round(
            F.sum(F.col("CoreTime") - F.col("CpuTimeHr")), 2
        ).alias("wasted_core_hr"),
    )


def hpc_core_hours_daily(
    condor: DataFrame, start: str, end: str
) -> DataFrame:
    """Daily core-hours with 12-min producer dedup and day-template
    zero-fill (hpc_running_cores_and_corehr.py:155-227): max CoreHr per
    (job, 12-min window) → per (site, day) sums → left join onto the
    full day×site template so missing days read 0."""
    flat = condor.select("data.*").withColumn(
        "ts", F.timestamp_seconds(F.col("RecordTime"))
    )
    win = F.window("ts", "12 minutes")
    per_window = flat.groupBy(
        win.alias("w"), F.col("GlobalJobId"), clean_site_name("Site").alias("site")
    ).agg(F.max("CoreHr").alias("wmax"))
    daily = (
        per_window.withColumn("day", F.to_date("w.start"))
        .groupBy("day", "site")
        .agg(F.round(F.sum("wmax"), 2).alias("core_hr"))
    )
    filled = day_template_fill(
        daily, "day", ["site"], ["core_hr"], start=start, end=end
    )
    return filled.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "site", "core_hr"
    )


def phedex_leftovers(phedex: DataFrame, datasets: DataFrame) -> DataFrame:
    """Datasets PhEDEx holds that DBS doesn't know (aggregate_leftovers
    .py:100-146), as ONE left_anti (J8) instead of subtract + re-join:
    per node, leftover dataset count and bytes."""
    leftover = anti_join(
        phedex, datasets.select("dataset").distinct(), on=["dataset"]
    )
    return leftover.groupBy("node").agg(
        F.countDistinct("dataset").alias("n_leftover_datasets"),
        F.round(F.sum("bytes") / 1e12, 4).alias("leftover_tb"),
    )


def wmarchive_step_metrics(reports: DataFrame) -> DataFrame:
    """Per-report metrics of the FIRST cmsRun* step (wmarchive.py:
    108-154). The reference RDD-maps a Python ``getdata`` over parsed
    Avro records, breaking at the first step whose name starts with
    'cmsrun'; here it is a pure array expression — ``element_at(
    filter(steps, …), 1)`` — so the extraction is a narrow map that
    stays JVM-side (no RDD, no Python worker). Records without a
    cmsRun step keep null metrics, like the reference's dict that
    simply lacks those keys."""
    # try_element_at: records with no cmsRun step yield null, not an
    # ANSI INVALID_ARRAY_INDEX error.
    first_cms = F.try_element_at(
        F.filter(
            "steps", lambda s: F.lower(s["name"]).startswith("cmsrun")
        ),
        F.lit(1),
    )
    return reports.select("wmaid", "task", first_cms.alias("st")).select(
        "wmaid",
        "task",
        F.col("st.site").alias("site"),
        F.col("st.jobCPU").alias("job_cpu"),
        F.col("st.jobTime").alias("job_time"),
        F.col("st.threads").alias("nthreads"),
    )


def crab_unique_users(
    condor: DataFrame,
    start_ms: int,
    end_ms: int,
    by: str = "weekofyear",
    include_re: str = "^T2_.*$",
    exclude_re: str = ".*_CERN.*",
) -> DataFrame:
    """Unique CRAB users per (year, week-of-year | month)
    (condor_crab_unique_users.py:55-95): flatten the ``data``
    envelope, keep Completed analysis jobs on included sites inside
    the [start, end) RecordTime window (milliseconds, as in the
    source), dedup retried GlobalJobIds, countDistinct CRAB_UserHN."""
    if by not in ("weekofyear", "month"):
        raise ValueError("by must be 'weekofyear' or 'month'")
    flat = condor.select("data.*").filter(
        (F.col("Status") == "Completed")
        & (F.col("Type") == "analysis")
        & F.col("Site").rlike(include_re)
        & ~F.col("Site").rlike(exclude_re)
        & (F.col("RecordTime") >= start_ms)
        & (F.col("RecordTime") < end_ms)
    )
    rd = F.timestamp_seconds(F.col("RecordTime") / 1000)
    bucket = F.weekofyear(rd) if by == "weekofyear" else F.month(rd)
    return (
        flat.dropDuplicates(["GlobalJobId"])
        .groupBy(F.year(rd).alias("year"), bucket.alias(by))
        .agg(F.countDistinct("CRAB_UserHN").alias("n_users"))
    )


def aso_fts_stats(fts: DataFrame, aso: DataFrame) -> DataFrame:
    """ASO↔FTS transfer latency stats (aso_stats.py:55-101): ASO-issued
    FTS transfers left-joined to ASO transfer rows on (filename,
    job_id), then per (job_id, state, publish, retry_count) record
    counts and mean durations/delays. The reference's two
    ``split("/")[-1]`` Python UDFs become ``substring_index`` column
    expressions (codegen, no Python workers); its ms→s scalings are
    kept verbatim."""
    f = (
        fts.select(
            F.col("job_metadata.issuer").alias("issuer"),
            "job_id",
            "src_url",
            "t_final_transfer_state",
            "tr_timestamp_start",
            "tr_timestamp_complete",
        )
        .filter(F.col("issuer") == "ASO")
        .withColumn("filename", F.substring_index("src_url", "/", -1))
        .withColumn(
            "fts_duration",
            (F.col("tr_timestamp_complete") - F.col("tr_timestamp_start")) / 1000.0,
        )
    )
    a = (
        aso.select(
            "tm_source_lfn",
            F.col("tm_fts_id").alias("job_id"),
            "tm_last_update",
            "tm_start_time",
            "tm_transfer_state",
            "tm_transfer_retry_count",
            "tm_publish",
        )
        .withColumn("filename", F.substring_index("tm_source_lfn", "/", -1))
        .filter(F.col("tm_transfer_state").isin(2, 3))
        .filter(F.col("job_id").isNotNull())
    )
    joined = f.join(a, on=["filename", "job_id"], how="left_outer")
    return joined.groupBy(
        "job_id", "tm_transfer_state", "tm_publish", "tm_transfer_retry_count"
    ).agg(
        F.count(F.lit(1)).alias("n_records"),
        F.round(F.avg(F.col("tm_last_update") - F.col("tm_start_time")), 4).alias(
            "aso_duration"
        ),
        F.round(
            F.avg(F.col("tr_timestamp_start") / 1000.0 - F.col("tm_start_time")), 4
        ).alias("aso_delay_start"),
        F.round(
            F.avg(F.col("tm_last_update") - F.col("tr_timestamp_complete") / 1000.0), 4
        ).alias("aso_delay"),
        F.round(F.avg("fts_duration"), 4).alias("fts_duration"),
    )


def event_count_tier_month(files: DataFrame, datasets: DataFrame) -> DataFrame:
    """Events by (tier, month) UNION events by (tier+skim, month)
    (dbs_event_count_plot.py:152-210): the two granularities unioned
    and deduped exactly as the reference's SQL UNION."""
    _, procds, tier = split_dataset_col("dataset")
    joined = enrich(
        files.select("dataset_id", "event_count", "creation_date"),
        datasets.select("dataset_id", "dataset"),
        on=["dataset_id"],
        how="inner",
    ).withColumn("tier", tier).withColumn("procds", procds)
    month = F.date_format(F.timestamp_seconds("creation_date"), "yyyy-MM")
    by_tier = joined.groupBy(
        month.alias("month"), F.col("tier").alias("key")
    ).agg(F.sum("event_count").alias("n_events"))
    by_tier_skim = joined.groupBy(
        month.alias("month"),
        F.concat_ws("/", "tier", F.split("procds", "-").getItem(0)).alias("key"),
    ).agg(F.sum("event_count").alias("n_events"))
    return by_tier.union(by_tier_skim).distinct()


def hs06_core_hours(
    condor: DataFrame,
    start_ms: int,
    end_ms: int,
    by: str = "month",
    include_re: str = "^T2_.*$",
    exclude_re: str = ".*_CERN.*",
) -> DataFrame:
    """HS06-normalized CPU hours by (year, month | ISO week)
    (condor_hs06coreHrPlot.py:54-93): flatten the ``data`` envelope,
    keep Completed jobs on included sites in the [start, end)
    RecordTime window, collapse retried GlobalJobIds, sum
    HS06CpuTimeHr (nulls skip, as in the reference's agg)."""
    if by not in ("month", "weekofyear"):
        raise ValueError("by must be 'month' or 'weekofyear'")
    flat = condor.select("data.*").filter(
        (F.col("Status") == "Completed")
        & F.col("Site").rlike(include_re)
        & ~F.col("Site").rlike(exclude_re)
        & (F.col("RecordTime") >= start_ms)
        & (F.col("RecordTime") < end_ms)
    )
    rd = F.timestamp_seconds(F.col("RecordTime") / 1000)
    bucket = F.month(rd) if by == "month" else F.weekofyear(rd)
    return (
        flat.dropDuplicates(["GlobalJobId"])
        .groupBy(F.year(rd).alias("year"), bucket.alias(by))
        .agg(F.round(F.sum("HS06CpuTimeHr"), 4).alias("hs06_cpu_hr"))
    )


def dbs_block_file_match(
    blocks: DataFrame, files: DataFrame, pattern: str
) -> DataFrame:
    """Block↔file lookup by LFN pattern (dbs_lfn.py:40-55): the
    reference persists the full block⋈file join, then filters LIKE.
    Declared filter-then-join instead: the LIKE predicate pushes to
    the file scan, and the block side is a size-aware broadcast — at
    catalog scale the join never shuffles the (pre-filtered, tiny)
    file side."""
    f = files.select("block_id", "logical_file_name").filter(
        F.col("logical_file_name").like(pattern)
    )
    b = blocks.select("block_id", "block_name")
    return f.join(broadcast_if_small(b), on="block_id").select(
        "block_name", "logical_file_name"
    )


def dbs_block_lumis(
    blocks: DataFrame, files: DataFrame, file_lumis: DataFrame
) -> DataFrame:
    """Lumi-section count per block (dbs_block_lumis.py:41-60):
    blocks ⋈ files ⋈ file_lumis, count lumi rows per block name.
    The fact-fact join (files⋈file_lumis) shuffles on file_id; the
    block dim rides along as a size-aware broadcast. Files without
    lumi rows drop out via the inner join, as in the reference SQL."""
    fl = file_lumis.select(
        F.col("fl_file_id").alias("file_id"), "fl_lumi_section_num"
    )
    j = (
        files.select("file_id", "block_id")
        .join(fl, on="file_id")
        .join(broadcast_if_small(blocks.select("block_id", "block_name")), on="block_id")
    )
    return j.groupBy("block_name").agg(
        F.count("fl_lumi_section_num").alias("nlumis")
    )


def phedex_merge(daily: DataFrame) -> DataFrame:
    """Declarative twin of the Go PhEDEx snapshot merger
    (src/Go/mergePhedex.go:152-325): fold one row per (day, replica)
    into per-(site, dataset, rdate, gid) lifetime stats.

    - gid reconciliation (mergePhedex.go:263-291): null gid → -1;
      rows adopt the group's valid gid when one exists anywhere in
      the stream. The Go map does this order-dependently; here every
      row takes ``max(gid) over (site, dataset, rdate)``, the
      order-free equivalent when a key carries at most one valid gid
      (production data does: gid identifies the subscription group).
    - daily totals, min/max date, day count, max daily size.
    - ``ave_size`` reproduces the merger's running integer average
      (mergePhedex.go:300-317) exactly: processed in date order, the
      average folds in each COMPLETED day on the next day's arrival,
      so the newest day never contributes; with a single day the
      daily total stands in (the Go value is its first parsed record
      — a read-order artifact a declarative engine shouldn't copy).

    One shuffle to daily totals, one to the per-key arrays; the fold
    is a row-local Catalyst ``aggregate`` over the date-sorted array
    (bounded: one element per day of replica lifetime).
    """
    gid_eff = F.coalesce(
        F.max("gid").over(Window.partitionBy("site", "dataset", "rdate")),
        F.lit(-1),
    )
    day_tot = (
        daily.withColumn("gid", gid_eff)
        .groupBy("site", "dataset", "rdate", "gid", "date")
        .agg(F.sum("size").alias("total"))
    )
    per_key = day_tot.groupBy("site", "dataset", "rdate", "gid").agg(
        F.sort_array(F.collect_list(F.struct("date", "total"))).alias("dt")
    )
    # Go fold: after consuming j completed days, folding day j+1:
    #   j=0 → ave = T1;  j≥1 → ave = (ave*(j+1) + T_{j+1}) div (j+2)
    # (mergePhedex.go:300-308, integer division; totals are positive
    # so floor == the Go truncation)
    folded = F.aggregate(
        F.expr("slice(dt, 1, size(dt) - 1)"),
        F.struct(
            F.lit(0).cast("long").alias("ave"), F.lit(0).cast("long").alias("j")
        ),
        lambda acc, x: F.struct(
            F.when(acc["j"] == 0, x["total"])
            .otherwise(
                F.floor(
                    (acc["ave"] * (acc["j"] + F.lit(1)) + x["total"])
                    / (acc["j"] + F.lit(2))
                ).cast("long")
            )
            .alias("ave"),
            (acc["j"] + F.lit(1)).alias("j"),
        ),
    )
    return per_key.select(
        "site",
        "dataset",
        "rdate",
        "gid",
        F.element_at("dt", 1)["date"].alias("min_date"),
        F.element_at("dt", -1)["date"].alias("max_date"),
        F.when(F.size("dt") == 1, F.element_at("dt", 1)["total"])
        .otherwise(folded["ave"])
        .alias("ave_size"),
        F.array_max(F.transform("dt", lambda s: s["total"])).alias("max_size"),
        F.size("dt").alias("days"),
    )


def dbs_access_stream_counts(
    datasets: DataFrame,
    files: DataFrame,
    access: DataFrame,
    count_type: str,
    date_unix: float,
    lfn_col: str = "file_lfn",
    site_col: str = "site_name",
) -> DataFrame:
    """Access counts per (site, dataset) — the whole dbs_{cmssw, aaa,
    eos, jm} script family as ONE parametrized pipeline (dbs_cmssw.py:
    63-76; dbs_aaa.py:60-75, dbs_eos.py:63-80, dbs_jm.py:64-78 repeat
    it verbatim, differing only in the stream's LFN/site column names
    and the ``count_type`` tag).

    Dataset dim joins the file catalog on dataset_id as a size-aware
    broadcast; the day's access stream joins on LFN — the only real
    shuffle, keyed on the high-cardinality LFN so it scales with the
    day's traffic, not the catalog. Counts are tagged with the stream
    name and day like the reference, and the dataset key is split to
    primds/procds/tier for the CSV sink (dbs_cmssw.py:84-87)."""
    cat = files.select("logical_file_name", "dataset_id").join(
        broadcast_if_small(datasets.select("dataset_id", "dataset")),
        on="dataset_id",
    )
    stream = access.select(
        F.col(lfn_col).alias("file_lfn"), F.col(site_col).alias("site_name")
    )
    j = stream.join(cat, F.col("file_lfn") == F.col("logical_file_name"))
    agg = (
        j.groupBy("site_name", "dataset")
        .agg(F.count("file_lfn").alias("count"))
        .withColumn("date", F.lit(date_unix))
        .withColumn("count_type", F.lit(count_type))
    )
    return split_dataset(agg, "dataset")


def monit_envelope(
    df: DataFrame,
    topic: str,
    producer: str,
    tstamp_ms: int,
    hostname: str = "",
) -> DataFrame:
    """Monitoring-envelope wrap — cmssw_avro2json.py:18-50 without the
    RDD round-trip: the reference maps every row through a Python
    ``row.asDict`` → dict-wrap → ``createDataFrame`` cycle; here the
    same ``{"data": <record>, "metadata": {...}}`` shape is a pure
    struct projection (codegen'd, zero Python per-row cost, streams
    through any sink including ``write_json``)."""
    meta = F.struct(
        F.lit(hostname).alias("hostname"),
        F.lit(str(tstamp_ms)).alias("kafka_timestamp"),
        F.lit("1").alias("partition"),
        F.lit(producer).alias("producer"),
        F.lit(str(tstamp_ms)).alias("timestamp"),
        F.lit(topic).alias("topic"),
        F.lit("metric").alias("type"),
        F.lit("raw").alias("type_prefix"),
        F.lit("001").alias("version"),
    )
    return df.select(
        F.struct(*[F.col(c) for c in df.columns]).alias("data"),
        meta.alias("metadata"),
    )


def crab_dataset_popularity(crab: DataFrame) -> DataFrame:
    """CRAB dataset popularity (dbs_hdfs_crab.py:71-105): completed or
    removed jobs deduped per GlobalJobId; dataset and datatier parsed
    from the data-block name with the reference's own regexp (whose
    greedy group leaves the tier OUT of ``dataset`` and returns '' on
    malformed blocks — both kept faithfully); per (datatier, primary
    dataset, dataset): record-time span, job count, distinct
    workflows, summed read bytes; null names → 'Unknown'.

    Scale note: the reference repartitions on CRAB_DataBlock and THEN
    drops duplicates on GlobalJobId — an extra full shuffle on a key
    that doesn't help the dedup. Declared as a bare dropDuplicates
    (one shuffle, on the dedup key); the aggregation reshuffles only
    the surviving jobs."""
    flat = crab.select("data.*")
    block_re = r"^(.*)/([^/]*)#.*$"
    jobs = (
        flat.filter(
            F.col("Status").isin("Completed", "Removed")
            & F.col("CRAB_DataBlock").isNotNull()
        )
        .dropDuplicates(["GlobalJobId"])
        .withColumn("dataset", F.regexp_extract("CRAB_DataBlock", block_re, 1))
        .withColumn("datatier", F.regexp_extract("CRAB_DataBlock", block_re, 2))
        .withColumnRenamed("CMSPrimaryPrimaryDataset", "primary_dataset")
    )
    return (
        jobs.groupBy("datatier", "primary_dataset", "dataset")
        .agg(
            F.max("RecordTime").alias("max_record_time"),
            F.min("RecordTime").alias("min_record_time"),
            F.count(F.lit(1)).alias("job_count"),
            F.countDistinct("CRAB_Workflow").alias("workflow_count"),
            F.sum("ChirpCMSSWReadBytes").alias("read_bytes"),
        )
        .na.fill("Unknown", ["datatier", "primary_dataset", "dataset"])
    )


def dbs_file_checksums(
    datasets: DataFrame,
    files: DataFrame,
    patterns: list[str] | None = None,
    antipatterns: list[str] | None = None,
) -> DataFrame:
    """Dataset→file checksum export with pattern selection
    (dbs_adler.py:40-62): dataset dim ⋈ file catalog, keeping
    (dataset, lfn, adler32); ``patterns`` keep datasets LIKE any of
    them, ``antipatterns`` drop datasets LIKE any of them. Both
    filters collapse to one Catalyst predicate on the (broadcast)
    dataset dim, so they prune before the join fans out."""
    d = datasets.select("dataset_id", "dataset")
    if patterns:
        keep = F.lit(False)
        for p in patterns:
            keep = keep | F.col("dataset").like(p)
        d = d.filter(keep)
    if antipatterns:
        for p in antipatterns:
            d = d.filter(~F.col("dataset").like(p))
    f = files.select("dataset_id", "logical_file_name", "adler32")
    return f.join(broadcast_if_small(d), on="dataset_id").select(
        "dataset", "logical_file_name", "adler32"
    )


#: The reference's production lock accounts
#: (rucio_datasets_monitoring.py:56-66); "sync" is both a literal
#: account and the collapse prefix for per-site sync_* accounts.
RUCIO_PROD_ACCOUNTS = (
    "transfer_ops",
    "wma_prod",
    "wmcore_output",
    "wmcore_pileup",
    "wmcore_transferor",
    "crab_tape_recall",
    "crab_input",
    "sync",
)


def rucio_datasets_monitoring(
    replicas: DataFrame,
    contents: DataFrame,
    rses: DataFrame,
    dlocks: DataFrame,
    prod_accounts: tuple[str, ...] = RUCIO_PROD_ACCOUNTS,
    sync_prefix: str = "sync",
) -> DataFrame:
    """Per-(RSE, dataset) replica monitoring — the last flagship
    (rucio_datasets_monitoring.py:385-470): file replicas roll up to
    (RSE, dataset) size/count/access stats; DBS-side totals give the
    DecimalType(6,2) FilePercentage (:391-401) and IsFullyReplicated;
    open prod-account block locks (sync_* accounts collapse to the
    prefix, :426-435 + :200-260) classify each cell FULLY / PARTIAL /
    DYNAMIC; RSE names tag prod/temp/test kind (:167-187).

    Plan shape: the fact (file replicas) shuffles ONCE into the
    (rse_id, dataset) rollup; rses broadcast; the two per-dataset
    total frames and the per-(dataset, rse) lock counts are
    block/dataset-grain (orders smaller than file grain) and join onto
    the rolled-up cells, not the fact.
    """
    f2b = contents.filter(F.col("child_type") == "FILE").select(
        F.col("child").alias("name"), F.col("parent").alias("block")
    )
    b2d = contents.filter(F.col("child_type") == "BLOCK").select(
        F.col("child").alias("block"), F.col("parent").alias("dataset")
    )
    f2d = f2b.join(b2d, on="block").select("name", "dataset")

    per_cell = (
        replicas.join(f2d, on="name")
        .groupBy("rse_id", "dataset")
        .agg(
            F.sum("bytes").alias("size_bytes"),
            F.count(F.lit(1)).alias("file_count"),
            conditional_count(F.col("accessed_at").isNotNull()).alias(
                "accessed_file_count"
            ),
            F.max("accessed_at").alias("last_access"),
            F.max("created_at").alias("last_create"),
        )
    )

    totals = (
        f2d.groupBy("dataset")
        .agg(F.countDistinct("name").alias("tot_file_cnt"))
        .join(
            b2d.groupBy("dataset").agg(
                F.countDistinct("block").alias("tot_block_cnt")
            ),
            on="dataset",
        )
    )

    locked = (
        dlocks.filter(F.col("state") == "O")
        .withColumn(
            "account",
            F.when(
                F.col("account").startswith(sync_prefix), F.lit(sync_prefix)
            ).otherwise(F.col("account")),
        )
        .filter(F.col("account").isin(*prod_accounts))
        .join(b2d, dlocks["name"] == b2d["block"])
        .groupBy("rse_id", "dataset")
        .agg(F.countDistinct("block").alias("prod_locked_block_count"))
    )

    tags = rse_tags("rse")
    tagged_rses = rses.select(
        "rse_id", "rse", *[c.alias(n) for n, c in tags.items()]
    )

    return (
        per_cell.join(broadcast_if_small(totals), on="dataset", how="left")
        .join(locked, on=["rse_id", "dataset"], how="left")
        .join(F.broadcast(tagged_rses), on="rse_id", how="left")
        .withColumn(
            "file_percentage",
            (100 * F.col("file_count") / F.col("tot_file_cnt")).cast(
                "decimal(6,2)"
            ),
        )
        .withColumn(
            "is_fully_replicated",
            F.col("file_count") == F.col("tot_file_cnt"),
        )
        .withColumn(
            "is_locked",
            F.when(
                F.col("tot_block_cnt") == F.col("prod_locked_block_count"),
                F.lit("FULLY"),
            )
            .when(F.col("prod_locked_block_count") >= 1, F.lit("PARTIAL"))
            .otherwise(F.lit("DYNAMIC")),
        )
        .withColumn(
            "prod_locked_block_count",
            F.coalesce("prod_locked_block_count", F.lit(0)).cast("int"),
        )
        .select(
            "rse",
            "rse_kind",
            "dataset",
            "size_bytes",
            "last_access",
            "last_create",
            "file_count",
            "accessed_file_count",
            "is_fully_replicated",
            "file_percentage",
            F.col("tot_block_cnt").alias("block_count"),
            "prod_locked_block_count",
            "is_locked",
        )
    )


def rucio_monitoring_kind_counts(monitoring: DataFrame) -> DataFrame:
    """Datasets-per-RSE-kind rollup (rucio_datasets_monitoring.py's
    prod/temp/test split, :167-187): distinct datasets and total bytes
    by rse_kind over the monitoring frame."""
    return monitoring.groupBy("rse_kind").agg(
        F.countDistinct("dataset").alias("n_datasets"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("size_bytes").alias("total_bytes"),
    )


#: rucio_ds_summary.py:264 — files whose dataset ownership can't be
#: resolved through DBS keep a monitoring tag instead of a null name.
UNKNOWN_DATASET_TAG = "UnknownDatasetNameOfFiles_MonitoringTag"


def rucio_ds_summary(
    replicas: DataFrame,
    dids: DataFrame,
    contents: DataFrame,
    rses: DataFrame,
    files: DataFrame,
    datasets: DataFrame,
    tiers: DataFrame,
    eras: DataFrame | None = None,
    unknown: str = "UNKNOWN",
) -> DataFrame:
    """Per-(RseType, dataset) summary documents for the MongoDB-backed
    web service (rucio_ds_summary.py:210-335) — kin of
    ``rucio_dataset_stats`` but a different output contract:

    - file size ELECTION, not a plain sum: REPLICAS bytes win, DIDS
      bytes fill the gaps (the reference's ordered when-chain, :214-221);
      access AND create times are each the greatest of both sides
      (:211-220 — ``greatest(dids_created_at, rep_created_at)``);
    - unresolvable files keep ``UNKNOWN_DATASET_TAG`` as their dataset
      instead of being dropped (:258-268);
    - two-level fold: (rse_id, dataset) size/count cells carry RseType
      via ``first()`` (:283-308), then re-aggregate per (RseType,
      Dataset) into Max/Min/Avg/Sum LongType sizes (:311-328 — Avg is
      cast-truncated exactly as the reference's ``.cast(LongType())``);
    - DBS general info joins on AFTER the fold (RealSize = summed file
      sizes, TotalFileCnt = distinct LFNs, tier / acquisition-era
      names), and every string dim left null by a failed lookup is
      replaced with 'UNKNOWN' (:58-66 STR_TYPE_COLUMNS fillna — ES
      term queries skip null fields, so the doc must not carry them).
      DELIBERATE DEVIATION: the info join keys on the dataset NAME,
      not the reference's dataset_id — the Rucio side only knows names
      (contents parents), and DBS maps id↔name 1:1, so the name is the
      natural shared key here; the reference resolves names to ids
      first because its fold carries dataset_id end-to-end.

    Plan shape: replicas⋈dids is a file-grain hash join that feeds the
    ONE fact shuffle (the (rse_id, dataset) rollup); rses broadcast;
    the second-level fold and the DBS info frames are dataset-grain.
    ``eras`` is optional — absent, AcquisitionEraName is all-'UNKNOWN'.
    """
    f2b = contents.filter(F.col("child_type") == "FILE").select(
        F.col("child").alias("name"), F.col("parent").alias("block")
    )
    b2d = contents.filter(F.col("child_type") == "BLOCK").select(
        F.col("child").alias("block"), F.col("parent").alias("dataset")
    )
    f2d = f2b.join(b2d, on="block").select("name", "dataset")

    did_side = dids.select(
        "name",
        F.col("bytes").alias("did_bytes"),
        F.col("accessed_at").alias("did_accessed_at"),
        F.col("created_at").alias("did_created_at"),
    )
    file_grain = (
        replicas.join(did_side, on="name", how="left")
        .withColumn(
            "f_size",
            F.when(F.col("bytes").isNotNull(), F.col("bytes")).otherwise(
                F.col("did_bytes")
            ),
        )
        .withColumn(
            "f_accessed", F.greatest("accessed_at", "did_accessed_at")
        )
        .withColumn(
            "f_created", F.greatest("created_at", "did_created_at")
        )
        .join(f2d, on="name", how="left")
        .fillna({"dataset": UNKNOWN_DATASET_TAG})
    )

    cells = (
        file_grain.join(
            F.broadcast(rses.select("rse_id", "rse_type")),
            on="rse_id",
            how="left",
        )
        .groupBy("rse_id", "dataset")
        .agg(
            F.sum("f_size").alias("size_in_rse"),
            F.max("f_accessed").alias("last_access_in_rse"),
            F.max("f_created").alias("last_create_in_rse"),
            F.count(F.lit(1)).alias("file_cnt"),
            conditional_count(F.col("f_accessed").isNotNull()).alias(
                "accessed_file_cnt"
            ),
            F.first("rse_type").alias("rse_type"),
        )
    )

    folded = cells.groupBy(
        F.col("rse_type").alias("RseType"), F.col("dataset").alias("Dataset")
    ).agg(
        F.max("size_in_rse").cast("long").alias("Max"),
        F.min("size_in_rse").cast("long").alias("Min"),
        F.avg("size_in_rse").cast("long").alias("Avg"),
        F.sum("size_in_rse").cast("long").alias("Sum"),
        F.max("last_access_in_rse").cast("long").alias("LastAccess"),
        F.max("last_create_in_rse").cast("long").alias("LastCreate"),
        F.sum("file_cnt").cast("long").alias("FileCnt"),
        F.sum("accessed_file_cnt").cast("long").alias("AccessedFileCnt"),
    )

    gen = files.groupBy("dataset_id").agg(
        F.sum("file_size").cast("long").alias("RealSize"),
        F.countDistinct("logical_file_name").alias("TotalFileCnt"),
    )
    info = (
        datasets.join(F.broadcast(tiers), on="data_tier_id", how="left")
        .join(gen, on="dataset_id", how="left")
        .select(
            F.col("dataset").alias("Dataset"),
            F.col("dataset_id").alias("Id"),
            F.col("is_dataset_valid").alias("IsDatasetValid"),
            F.col("data_tier_name").alias("TierName"),
            "acquisition_era_id",
            "RealSize",
            "TotalFileCnt",
        )
    )
    if eras is not None:
        info = info.join(
            F.broadcast(
                eras.select(
                    F.col("era_id").alias("acquisition_era_id"),
                    F.col("era_name").alias("AcquisitionEraName"),
                )
            ),
            on="acquisition_era_id",
            how="left",
        )
    else:
        info = info.withColumn(
            "AcquisitionEraName", F.lit(None).cast("string")
        )

    return (
        folded.join(
            broadcast_if_small(info.drop("acquisition_era_id")),
            on="Dataset",
            how="left",
        )
        .fillna({"TierName": unknown, "AcquisitionEraName": unknown})
        .select(
            "Id",
            "RseType",
            "Dataset",
            "LastAccess",
            "LastCreate",
            "Max",
            "Min",
            "Avg",
            "Sum",
            "FileCnt",
            "AccessedFileCnt",
            "RealSize",
            "TotalFileCnt",
            "IsDatasetValid",
            "TierName",
            "AcquisitionEraName",
        )
    )


def wma_agent_count(reports: DataFrame) -> DataFrame:
    """Per-(day, host) WMArchive agent counts
    (wma_agent_count_to_opensearch.py:54-147): the reference RDD-maps
    ``udf_step_extract`` over each record (site = LAST step with a
    non-null site else 'UNKNOWN', number_of_steps = len(steps)), dedups
    on wmaid, then aggregates count / avg step count / site set / a
    midday-rounded epoch per (day, host). Here the per-record extract
    is pure array expressions (try_element_at(filter(...), -1)) — no
    RDD, no Python worker — and the midday timestamp is derived from
    min(wmats) (every record in a (day, host) group shares the same
    UTC day, so the reference's ``first(wmats)`` rounds to the same
    midday; min makes it order-independent).

    Output: (day, host, count, avg_steps_count, sites, wmats_midday)
    with ``sites`` sorted for deterministic comparison (the reference
    emits a set)."""
    last_site = F.try_element_at(
        F.filter("steps", lambda s: s["site"].isNotNull()), F.lit(-1)
    )["site"]
    flat = reports.select(
        "wmaid",
        "host",
        F.col("wmats").cast("long").alias("wmats"),
        F.coalesce(last_site, F.lit("UNKNOWN")).alias("site"),
        F.size("steps").alias("number_of_steps"),
    ).dropDuplicates(["wmaid"])
    return (
        flat.withColumn("day", F.from_unixtime("wmats", "yyyy-MM-dd"))
        .groupBy("day", "host")
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.avg("number_of_steps").alias("avg_steps_count"),
            F.sort_array(F.collect_set("site")).alias("sites"),
            (
                F.min("wmats") - (F.min("wmats") % 86400) + 43200
            ).alias("wmats_midday"),
        )
    )


def phedex_days_present(daily: DataFrame) -> DataFrame:
    """Replica-lifetime span per (site, dataset, size)
    (degraded/phedex_agg.py:37-91): min/max of the YYYYMMDD snapshot
    date and of the replica-creation date, plus ``days`` — the span in
    days between the overall earliest and latest of the four.

    The reference computes ``days`` with a per-row Python UDF
    (``days_present``: mktime round-trips through epoch seconds); here
    it is ``datediff`` over ``to_date(..., 'yyyyMMdd')`` — a narrow
    JVM-side map after the one groupBy shuffle. The UDF's ``-1`` branch
    (any of the four endpoints missing) is kept via a null guard."""
    agg = daily.groupBy("site", "dataset", "size").agg(
        F.min("date").alias("min_date"),
        F.max("date").alias("max_date"),
        F.min("rdate").alias("min_rdate"),
        F.max("rdate").alias("max_rdate"),
    )
    as_date = lambda c: F.to_date(F.col(c).cast("string"), "yyyyMMdd")
    span = F.datediff(
        F.greatest(as_date("max_date"), as_date("max_rdate")),
        F.least(as_date("min_date"), as_date("min_rdate")),
    )
    missing = (
        F.col("min_date").isNull()
        | F.col("max_date").isNull()
        | F.col("min_rdate").isNull()
        | F.col("max_rdate").isNull()
    )
    return agg.withColumn(
        "days", F.when(missing, F.lit(-1)).otherwise(span).cast("int")
    )


def dbs_events_agg(
    datasets: DataFrame, blocks: DataFrame, files: DataFrame
) -> DataFrame:
    """Per-(dataset, creation_date) file/event/size totals
    (degraded/dbs_events.py:40-59): dataset ⋈ block ⋈ file, then the
    reference's dict-form ``agg({'f_file_id': 'count', ...})`` with
    ``withColumnRenamed`` — reproduced verbatim as the one sanctioned
    use of that idiom (everywhere else the repo aliases inline).

    ``files`` must carry an ``is_file_valid`` int column (the
    reference's FILES table has it; the synthetic fixture derives it).
    The two dimension joins are broadcast when small; the single
    shuffle is the groupBy on (dataset, creation_date)."""
    joined = (
        files.join(
            broadcast_if_small(blocks.select("block_id", "dataset_id")),
            on="block_id",
        )
        .drop(files["dataset_id"])
        .join(
            broadcast_if_small(
                datasets.select(
                    "dataset_id", "dataset", F.col("creation_date").alias("d_creation_date")
                )
            ),
            on="dataset_id",
        )
    )
    return (
        joined.groupBy(["dataset", "d_creation_date"])
        .agg(
            {
                "file_id": "count",
                "event_count": "sum",
                "file_size": "sum",
                "is_file_valid": "sum",
            }
        )
        .withColumnRenamed("count(file_id)", "nfiles")
        .withColumnRenamed("sum(event_count)", "nevents")
        .withColumnRenamed("sum(file_size)", "size")
        .withColumnRenamed("d_creation_date", "creation_date")
        .withColumnRenamed("sum(is_file_valid)", "nfiles_valid")
    )


def anonymize_columns(
    df: DataFrame, attrs: list[str], impl: str = "sql"
) -> DataFrame:
    """Column anonymization (hdfs_an.py:23-67): each listed attribute
    is replaced by ``<attr>_hash`` = md5 of its value and the original
    is dropped; nulls stay null.

    The reference runs a per-row Python UDF (md5 over the
    NFKD-normalized, ASCII-ignored string). ``impl='sql'`` keeps the
    whole job in Catalyst — ``md5(cast(col AS STRING))`` — which is
    bit-identical to the reference for ASCII data (the NFKD fold is a
    no-op there). For corpora with accented identifiers,
    ``impl='arrow'`` reproduces the reference's normalize+ignore
    semantics exactly in one vectorized Arrow batch per partition
    (closure pickles by value: stdlib only)."""
    out = df
    if impl == "sql":
        for a in attrs:
            out = out.withColumn(
                a + "_hash", F.md5(F.col(a).cast("string"))
            )
    elif impl == "arrow":
        from pyspark.sql.functions import pandas_udf

        def _an(s):
            import hashlib
            import unicodedata

            def one(v):
                if v is None:
                    return None
                b = unicodedata.normalize("NFKD", str(v)).encode(
                    "ASCII", "ignore"
                )
                return hashlib.md5(b).hexdigest()

            return s.map(one)

        an = pandas_udf(_an, "string")
        for a in attrs:
            out = out.withColumn(a + "_hash", an(F.col(a).cast("string")))
    else:
        raise ValueError(f"unknown impl: {impl!r}")
    return out.drop(*attrs)


def rucio_daily(spark, rucio_paths, dbs_files: DataFrame) -> DataFrame:
    """Daily Rucio replica dump aggregation (rucio_daily.py:31-64):
    Avro replica records (RSE_ID, BYTES, NAME, SCOPE, CREATED_AT) read
    with the vendored codec, tally date parsed FROM THE FILE PATH
    (`…/rucio/<date>/replicas/…` — the snapshot date lives in the
    layout, not the data), create_day from the ms CREATED_AT, joined to
    DBS files on logical name and summed per (RSE_ID, f_dataset_id,
    SCOPE, tally_day, create_day).

    End-to-end source→shape parity: same substring_index parses, same
    yyyyMMdd day rendering, same inner join and sum. The reference
    repartitions to 3000 before a per-row UDF it no longer uses; here
    the only shuffle is the final groupBy."""
    from cmsspark_spark.sources.avro_io import read_avro

    rucio_info = read_avro(spark, rucio_paths, with_path=True)
    tmp1 = F.substring_index("_source_file", "/rucio/", -1)
    rucio_df = (
        rucio_info.withColumn("tally_date", F.substring_index(tmp1, "/", 1))
        .withColumn(
            "create_day",
            F.date_format(
                F.to_date(
                    (F.col("CREATED_AT") / F.lit(1000))
                    .cast("long")
                    .cast("timestamp")
                ),
                "yyyyMMdd",
            ),
        )
        .withColumn(
            "tally_day",
            F.date_format(F.to_date("tally_date", "yyyy-MM-dd"), "yyyyMMdd"),
        )
        .select("RSE_ID", "BYTES", "NAME", "SCOPE", "tally_day", "create_day")
    )
    files = dbs_files.select(
        F.col("logical_file_name").alias("f_logical_file_name"),
        F.col("dataset_id").alias("f_dataset_id"),
    )
    return (
        rucio_df.join(
            files, files.f_logical_file_name == rucio_df.NAME
        )
        .groupBy("RSE_ID", "f_dataset_id", "SCOPE", "tally_day", "create_day")
        .agg(F.sum("BYTES").alias("rep_size"))
    )


def campaign_mss_report(
    phedex: DataFrame, dbs: DataFrame, limit: int = 100,
    disk_only: bool = False,
) -> DataFrame:
    """Campaign storage report (reports/aggregate_campaigns.py:136-210):
    per campaign — site count, largest and second-largest site by
    PhEDEx bytes (the reference's ``mss``/``second_mss``), DBS vs
    PhEDEx totals, top-``limit`` campaigns by PhEDEx size.

    The reference pivots sites into columns and runs FIVE per-row
    Python UDFs over the pivoted struct (count-nonzero, max,
    max-name, second-max, second-max-name). Pivoting defeats itself at
    scale (one column per site, rows carry every site) — here the same
    answer is a rank-2 window over the (campaign, site) aggregate:
    deterministic (ties break site-name ascending), no Python, no
    pivot, one shuffle each for the agg and the window.

    ``phedex``: (dataset_name, node_name, block_bytes);
    ``dbs``: (dataset, dbs_size) already at dataset grain."""
    if disk_only:
        tape = (
            F.col("node_name").endswith("_MSS")
            | F.col("node_name").endswith("_Buffer")
            | F.col("node_name").endswith("_Export")
        )
        phedex = phedex.filter(~tape)
    campaign = F.split("dataset_name", "/").getItem(2)
    cs = (
        phedex.withColumn("campaign", campaign)
        .groupBy("campaign", F.col("node_name").alias("site"))
        .agg(F.sum("block_bytes").alias("size"))
    )
    w = Window.partitionBy("campaign").orderBy(
        F.col("size").desc(), F.col("site").asc()
    )
    ranked = cs.withColumn("_rk", F.row_number().over(w))
    per_campaign = ranked.groupBy("campaign").agg(
        F.count(F.lit(1)).alias("sites"),
        F.max(F.when(F.col("_rk") == 1, F.col("size"))).alias("mss"),
        F.max(F.when(F.col("_rk") == 1, F.col("site"))).alias("mss_name"),
        F.max(F.when(F.col("_rk") == 2, F.col("size"))).alias("second_mss"),
        F.max(F.when(F.col("_rk") == 2, F.col("site"))).alias(
            "second_mss_name"
        ),
        F.sum("size").alias("phedex_size"),
    )
    dbs_per_campaign = (
        dbs.withColumn("campaign", F.split("dataset", "/").getItem(2))
        .groupBy("campaign")
        .agg(F.sum("dbs_size").alias("dbs_size"))
    )
    return (
        per_campaign.join(dbs_per_campaign, on="campaign")
        .orderBy(F.col("phedex_size").desc(), F.col("campaign"))
        .limit(limit)
    )


def fts_issuer_totals(fts: DataFrame) -> DataFrame:
    """FTS transferred-bytes per token issuer (fts_aso.py:41-77):
    groupBy directly on the NESTED field ``job_metadata.issuer`` — no
    flatten/select step — summing f_size. The nested-key groupBy is
    the one idiom here the flat replicas don't already show; Catalyst
    prunes the struct to the single accessed leaf."""
    return fts.groupBy(F.col("job_metadata.issuer").alias("issuer")).agg(
        F.sum("f_size").alias("sum_f_size")
    )


def eos_dataset_totals(
    eos: DataFrame, files: DataFrame, datasets: DataFrame,
    is_cms_user: bool = True,
) -> DataFrame:
    """EOS access totals per (dataset, application)
    (dbs_hdfs_eos.py:70-121): per-session pre-aggregation, then the
    CONCAT-prefix expression join — EOS logs carry ``/eos/cms`` +
    DBS's logical file name, so the join key is computed, not a
    column — and the cms-user filter, rolled up to distinct sessions
    and MB/second unit totals."""
    per_session = eos.groupBy(
        "session", "file_lfn", "application", "user"
    ).agg(
        F.sum("rb").alias("rb"),
        F.sum("wb").alias("wb"),
        F.sum("rt").alias("rt"),
        F.sum("wt").alias("wt"),
    )
    user_ok = (
        F.col("user").like("cms%")
        if is_cms_user
        else ~F.col("user").like("cms%")
    )
    joined = (
        per_session.filter(user_ok)
        .join(
            files.select("logical_file_name", "dataset_id"),
            per_session.file_lfn
            == F.concat(F.lit("/eos/cms"), F.col("logical_file_name")),
        )
        .join(
            broadcast_if_small(datasets.select("dataset_id", "dataset")),
            on="dataset_id",
        )
    )
    return joined.groupBy(
        F.col("dataset").alias("d_dataset"), "application"
    ).agg(
        F.countDistinct("session").alias("nevents"),
        F.round(F.sum("rb") / (1024 * 1024), 4).alias("total_rb"),
        F.round(F.sum("wb") / (1024 * 1024), 4).alias("total_wb"),
        F.round(F.sum("rt") / 1000, 4).alias("total_rt"),
        F.round(F.sum("wt") / 1000, 4).alias("total_wt"),
    )


def dbs_condor_agg(
    condor: DataFrame,
    datasets: DataFrame,
    files: DataFrame,
    access_types: DataFrame,
    acquisition_eras: DataFrame,
    processing_eras: DataFrame,
    mod_configs: DataFrame,
    output_configs: DataFrame,
    release_versions: DataFrame,
    date: str = "20240101",
) -> dict[str, DataFrame]:
    """Four-granularity DBS×Condor aggregation family
    (degraded/dbs_condor.py:76-190): daily Condor job metrics rolled
    up per dataset / campaign / release / acquisition-era, each keyed
    by (user, exit code, type, task type, record time), tagged with
    the run date, with the events-per-core-hour ``rate``.

    Reference semantics kept bug-for-bug:

    - the DBS pre-join (:76-85) is file grain then ``.distinct()``
      over (dataset, …, event_count, file_size) TUPLES — two files of
      a dataset with identical (event_count, file_size) collapse
      before the sums;
    - the release bridge (:96-101) multiplies a dataset with N output
      configs into N release rows — the release/era rollups count
      such datasets once per release, as the reference does;
    - ``rate`` (:126-133) is the reference's truthiness UDF: -1.0
      when either side is null OR zero — here a column expression,
      not a UDF;
    - dataset/campaign granularities aggregate ALL condor rows; the
      release/era granularities aggregate only rows that joined DBS
      with KEvents > 0 (:110-115).

    Spark-first collapse: the reference splits every rollup into
    ExitCode==0 / ExitCode!=0 branches and unions them back — its own
    comment says this is purely an engine workaround ("reduce
    dimensionality of the input"). ExitCode is part of every grouping
    key, so the branch-union is exactly ONE groupBy over all rows;
    we run the single groupBy (one shuffle per granularity instead of
    two half-shuffles plus a union).

    Plan shape at scale: the DBS side reduces to DATASET grain
    (newdf) before it ever meets the condor fact, so the fact join's
    build side is catalog-dataset-sized and `broadcast_if_small`
    upgrades it to a broadcast; datasets⋈files is the one DBS-side
    shuffle (file grain, unavoidable — the reference does the same);
    the tiny dims broadcast unconditionally; the four rollups share
    the flattened envelope projection; no UDFs.
    """
    env = condor.select("data.*")

    fjoin = (
        datasets.join(
            files.select("dataset_id", "event_count", "file_size"),
            on="dataset_id",
        )
        .join(F.broadcast(access_types), on="dataset_access_type_id")
        .join(F.broadcast(acquisition_eras), on="acquisition_era_id")
        .join(F.broadcast(processing_eras), on="processing_era_id")
        .filter(
            (F.col("dataset_access_type") == "VALID")
            & (F.col("is_dataset_valid") == 1)
        )
        .select(
            F.col("dataset_id").alias("d_dataset_id"),
            F.col("dataset").alias("d_dataset"),
            F.col("creation_date").alias("d_creation_date"),
            "event_count",
            "file_size",
            "dataset_access_type",
            "acquisition_era_name",
            "processing_version",
        )
        .distinct()
    )
    newdf = fjoin.groupBy(
        "d_dataset",
        "d_dataset_id",
        "dataset_access_type",
        "acquisition_era_name",
        "processing_version",
    ).agg(
        F.sum("event_count").alias("evts"),
        F.sum("file_size").alias("size"),
        F.max("d_creation_date").alias("created"),
    )
    agg_dbs = (
        newdf.join(
            F.broadcast(mod_configs),
            F.col("d_dataset_id") == F.col("mc_dataset_id"),
        )
        .join(
            F.broadcast(output_configs),
            F.col("mc_output_mod_config_id")
            == F.col("oc_output_mod_config_id"),
        )
        .join(
            F.broadcast(release_versions),
            F.col("oc_release_version_id") == F.col("r_release_version_id"),
        )
        .select(
            "d_dataset",
            "acquisition_era_name",
            "r_release_version",
        )
    )
    final = env.join(
        broadcast_if_small(agg_dbs),
        env["DESIRED_CMSDataset"] == F.col("d_dataset"),
    ).filter(F.col("KEvents") > 0)

    rate = F.when(
        F.col("sum_evts").isNotNull()
        & (F.col("sum_evts") != 0)
        & F.col("sum_chr").isNotNull()
        & (F.col("sum_chr") != 0),
        F.col("sum_evts") / F.col("sum_chr"),
    ).otherwise(F.lit(-1.0))

    def rollup(src: DataFrame, key: str, out_name: str) -> DataFrame:
        base = (
            src.groupBy(
                key, "CRAB_UserHN", "ExitCode", "Type", "TaskType",
                "RecordTime",
            )
            .agg(
                F.sum("KEvents").alias("sum_evts"),
                F.sum("CoreHr").alias("sum_chr"),
            )
            .withColumn("date", F.lit(date))
            .withColumn("rate", rate)
            .withColumnRenamed("CRAB_UserHN", "user")
            .withColumnRenamed("RecordTime", "rec_time")
        )
        return base.withColumnRenamed(key, out_name)

    per_dataset = rollup(env, "DESIRED_CMSDataset", "dataset").withColumn(
        "tier", F.split(F.col("dataset"), "/").getItem(3)
    )
    per_campaign = rollup(env, "Campaign", "campaign")
    per_release = rollup(final, "r_release_version", "release")
    per_era = rollup(final, "acquisition_era_name", "era")
    return {
        "dataset": per_dataset,
        "campaign": per_campaign,
        "release": per_release,
        "era": per_era,
    }


def rucio_last_access_report(
    replicas: DataFrame,
    dids: DataFrame,
    files: DataFrame,
    datasets: DataFrame,
    rses: DataFrame,
    min_tb: float = 0.0,
    not_read_since_epoch: float = 0.0,
    mode: str = "disk",
) -> dict[str, DataFrame]:
    """The last-access-threshold report family
    (degraded/rucio_datasets_last_access_ts.py:184-336): per-RSE
    "sub" detail tables and per-dataset "main" rollups for (a)
    datasets NEVER read and (b) datasets not read since a threshold.

    File-grain base (:184-220, shared with ``rucio_ds_summary``):
    REPLICAS bytes win, DIDS bytes fill gaps; accessed/created are the
    greatest of both sides. Dataset names come from DBS
    (files⋈datasets on LFN, :196-216) and files with no DBS dataset
    are DROPPED (unlike rucio_ds_summary's UNKNOWN tag — the two
    reference scripts disagree, both shapes are replicated
    faithfully).

    RSE population (``mode``, reference :60-71 ``get_rse_ids``): the
    reference partitions the namespace into two separate runs —
    ``mode='disk'`` (default) drops any RSE whose name CONTAINS
    'Tape', 'Test' or 'Temp' (case-sensitive containment, exactly the
    pickle filter); ``mode='tape'`` keeps only names ending '_Tape'.
    ``mode='all'`` is an engine EXTENSION (a merged report using
    ``rse_tags``'s case-insensitive endswith prod cascade) — it has
    no reference twin and its numbers match neither reference run;
    earlier rounds shipped it as the only behavior, which this mode
    parameter corrects (r5 ADVICE). All modes drop
    ``/store/backfill/`` LFNs before any join, as the reference does
    unconditionally (:46 BACKFILL_PREFIX, :124).

    Report semantics (:223-336) kept code-for-code (the reference's
    docstring CLAIMS a dataset with even one null-accessed file is
    filtered from not-read-since; its code only requires max(accessed)
    non-null — the code behavior is what's replicated):

    - sub_never_read: (RSE, dataset) cells where max(accessed_at) is
      null and size > min_tb; per-cell TB rounded to 5;
    - main_never_read: max/min/avg/sum of the per-RSE TB sizes, last
      create across RSEs, comma-joined RSE list;
    - sub_not_read_since: cells with non-null last access below the
      epoch threshold and size > min_tb, with accessed-file counts;
    - main_not_read_since: same rollup keyed by last access.

    Spark-first deviations, both documented: the RSE id→name remap is
    a broadcast dim join, not the reference's driver-side
    ``.replace(dict)``; the RSE(s) list is sorted before concat_ws so
    the report is deterministic under repartitioning (the reference's
    collect_list order is whatever the shuffle delivered).

    Plan shape at scale: one file-grain hash join chain feeds ONE
    (rse, dataset) shuffle; both "main" rollups re-aggregate the tiny
    cell table; rses broadcast; no UDFs, no driver-side maps.
    """
    if mode == "disk":
        rse_pick = ~(
            F.col("rse").contains("Tape")
            | F.col("rse").contains("Test")
            | F.col("rse").contains("Temp")
        )
    elif mode == "tape":
        rse_pick = F.col("rse").endswith("_Tape")
    elif mode == "all":
        rse_pick = rse_tags("rse")["rse_kind"] == F.lit("prod")
    else:
        raise ValueError(f"mode must be disk|tape|all, got {mode!r}")
    prod_rses = rses.filter(rse_pick).select("rse_id", "rse")
    replicas = replicas.filter(
        ~F.col("name").startswith("/store/backfill/")
    )
    f2d = files.select(
        F.col("logical_file_name").alias("name"), "dataset_id"
    ).join(
        broadcast_if_small(datasets.select("dataset_id", "dataset")),
        on="dataset_id",
    )
    did_side = dids.select(
        "name",
        F.col("bytes").alias("did_bytes"),
        F.col("accessed_at").alias("did_accessed_at"),
        F.col("created_at").alias("did_created_at"),
    )
    base = (
        replicas.join(F.broadcast(prod_rses), on="rse_id")
        .join(did_side, on="name", how="left")
        .join(f2d.select("name", "dataset"), on="name", how="left")
        .filter(F.col("dataset").isNotNull())
        .select(
            "rse",
            "dataset",
            F.when(
                F.col("bytes").isNotNull(), F.col("bytes")
            ).otherwise(F.col("did_bytes")).alias("f_size"),
            F.greatest("accessed_at", "did_accessed_at").alias("f_accessed"),
            F.greatest("created_at", "did_created_at").alias("f_created"),
        )
    )
    cells = base.groupBy("rse", "dataset").agg(
        F.round(F.sum("f_size") / 1e12, 5).alias("dataset_size_in_rse_tb"),
        F.max("f_accessed").alias("last_access_time_of_dataset_in_rse"),
        F.max("f_created").alias("last_create_time_of_dataset_in_rse"),
        conditional_count(F.col("f_accessed").isNotNull()).alias(
            "n_accessed_files_of_dataset_in_rse"
        ),
        F.count(F.lit(1)).alias("n_files_of_dataset_in_rse"),
    )

    sub_never = (
        cells.filter(
            F.col("last_access_time_of_dataset_in_rse").isNull()
            & (F.col("dataset_size_in_rse_tb") > min_tb)
        )
        .select(
            F.col("rse").alias("rse_name"),
            "dataset",
            "dataset_size_in_rse_tb",
            "last_create_time_of_dataset_in_rse",
            "n_files_of_dataset_in_rse",
        )
    )
    main_never = sub_never.groupBy("dataset").agg(
        F.max("dataset_size_in_rse_tb").alias("max_dataset_size_in_rses_tb"),
        F.min("dataset_size_in_rse_tb").alias("min_dataset_size_in_rses_tb"),
        F.avg("dataset_size_in_rse_tb").alias("avg_dataset_size_in_rses_tb"),
        F.sum("dataset_size_in_rse_tb").alias("sum_dataset_size_in_rses_tb"),
        F.max("last_create_time_of_dataset_in_rse").alias(
            "last_create_time_of_dataset_in_all_rses"
        ),
        F.concat_ws(
            ", ", F.array_sort(F.collect_list("rse_name"))
        ).alias("rses"),
    )

    sub_since = (
        cells.filter(
            F.col("last_access_time_of_dataset_in_rse").isNotNull()
            & (
                F.col("last_access_time_of_dataset_in_rse")
                < F.lit(not_read_since_epoch)
            )
            & (F.col("dataset_size_in_rse_tb") > min_tb)
        )
        .select(
            F.col("rse").alias("rse_name"),
            "dataset",
            "dataset_size_in_rse_tb",
            "last_access_time_of_dataset_in_rse",
            "n_files_of_dataset_in_rse",
            "n_accessed_files_of_dataset_in_rse",
        )
    )
    main_since = sub_since.groupBy("dataset").agg(
        F.max("dataset_size_in_rse_tb").alias("max_dataset_size_in_rses_tb"),
        F.min("dataset_size_in_rse_tb").alias("min_dataset_size_in_rses_tb"),
        F.avg("dataset_size_in_rse_tb").alias("avg_dataset_size_in_rses_tb"),
        F.sum("dataset_size_in_rse_tb").alias("sum_dataset_size_in_rses_tb"),
        F.max("last_access_time_of_dataset_in_rse").alias(
            "last_access_time_of_dataset_in_all_rses"
        ),
        F.concat_ws(
            ", ", F.array_sort(F.collect_list("rse_name"))
        ).alias("rses"),
    )
    return {
        "sub_never_read": sub_never,
        "main_never_read": main_never,
        "sub_not_read_since": sub_since,
        "main_not_read_since": main_since,
    }


def aggregate_dbs_stats(
    datasets: DataFrame, blocks: DataFrame, files: DataFrame
) -> DataFrame:
    """Per-dataset DBS totals (reports/aggregate_dbs.py:56-77): the
    3-table ddf⋈bdf⋈fdf join rolled up per dataset into nfiles /
    nevents / size.

    Bug-for-bug: ``nfiles`` is ``sum(b_file_count)`` over FILE-grain
    rows (the reference joins blocks to files and then sums the
    per-BLOCK file_count once per file), so a block with N files
    contributes N·file_count — the reference's number, not the true
    file count. Dims broadcast; one dataset-grain shuffle."""
    j = (
        files.select("block_id", "event_count", "file_size")
        .join(
            broadcast_if_small(
                blocks.select("block_id", "dataset_id", "file_count")
            ),
            on="block_id",
        )
        .join(
            broadcast_if_small(datasets.select("dataset_id", "dataset")),
            on="dataset_id",
        )
    )
    return j.groupBy("dataset").agg(
        F.sum("file_count").cast("long").alias("nfiles"),
        F.sum("event_count").cast("long").alias("nevents"),
        F.sum("file_size").alias("size"),
    )


def campaign_tier_sizes(
    files: DataFrame,
    datasets: DataFrame,
    access_types: DataFrame,
    phedex: DataFrame,
    limit: int = 100,
) -> DataFrame:
    """DBS-vs-PhEDEx sizes per (campaign, tier)
    (reports/aggregate_campaign_tier.py:84-140): VALID DBS datasets'
    file sizes and PhEDEx replica sizes (with size_on_disk zeroed on
    tape/staging endpoints — node name endswith _MSS/_Buffer/_Export,
    the reference's UDF as a column expression), joined per dataset,
    campaign = name part 2 / tier = part 3, top-``limit`` by combined
    size. The order key (dbs_size + phedex_size) is dropped from the
    output exactly as the reference drops its ``sum_size``."""
    dbs = (
        files.select("dataset_id", "file_size")
        .join(
            broadcast_if_small(
                datasets.select(
                    "dataset_id", "dataset", "dataset_access_type_id"
                )
            ),
            on="dataset_id",
        )
        .join(F.broadcast(access_types), on="dataset_access_type_id")
        .filter(F.col("dataset_access_type") == "VALID")
        .groupBy("dataset")
        .agg(F.sum("file_size").alias("dbs_size"))
    )
    on_disk = F.when(
        F.col("node").endswith("_MSS")
        | F.col("node").endswith("_Buffer")
        | F.col("node").endswith("_Export"),
        F.lit(0.0),
    ).otherwise(F.col("bytes"))
    ph = phedex.groupBy("dataset").agg(
        F.sum("bytes").alias("phedex_size"),
        F.sum(on_disk).alias("size_on_disk"),
    )
    parts = F.split(F.col("dataset"), "/")
    return (
        ph.join(dbs, on="dataset")
        .select(
            parts.getItem(2).alias("campaign"),
            parts.getItem(3).alias("tier"),
            "dbs_size",
            "phedex_size",
            "size_on_disk",
        )
        .groupBy("campaign", "tier")
        .agg(
            F.sum("dbs_size").alias("dbs_size"),
            F.sum("phedex_size").alias("phedex_size"),
            F.sum("size_on_disk").alias("size_on_disk"),
        )
        .orderBy(
            (F.col("dbs_size") + F.col("phedex_size")).desc(),
            "campaign",
            "tier",
        )
        .limit(limit)
    )
