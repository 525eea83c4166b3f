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
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from cmsspark_spark.functions.cms import (
    clean_site_name,
    parse_dn,
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
