"""Workflow-replica tests (SURVEY §5 level 2): the six flagship
pipelines on CMS-shaped fixtures, verified against independent DuckDB
computations over the SAME fixture rows (uploaded via Arrow)."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from cmsspark_spark.jobs import cms_replicas as R
from tests.cms_fixtures import all_fixtures


@pytest.fixture(scope="module")
def fx(spark):
    return all_fixtures(spark)


@pytest.fixture(scope="module")
def duck_fx(fx):
    """DuckDB connection holding the flat fixtures (nested condor/wma
    are flattened Spark-side before upload)."""
    con = duckdb.connect()
    for name in [
        "dbs_datasets", "dbs_files", "rucio_rses", "rucio_replicas",
        "rucio_dids", "rucio_contents", "access_events", "phedex_replicas",
    ]:
        con.register(name, fx[name].toPandas())
    con.register("condor_flat", fx["condor_jobs"].select("data.*").toPandas())
    yield con
    con.close()


def _nullsafe_key(row):
    return tuple((v is None, v) for v in row)


def _rows(df, *cols):
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()), key=_nullsafe_key
    )


def test_dataset_popularity(fx, duck_fx):
    got = R.dataset_popularity(
        fx["access_events"], fx["dbs_files"], fx["dbs_datasets"]
    )
    expect = duck_fx.execute(
        """
        WITH j AS (
          SELECT CASE WHEN len(string_split(a.site_name, '_')) > 3
                      THEN array_to_string(string_split(a.site_name, '_')[1:3], '_')
                      ELSE a.site_name END AS site,
                 string_split(d.dataset, '/')[4] AS tier,
                 regexp_extract(split_part(a.user_dn, '&', 1),
                                '.*/CN=([^0-9/][^/]*)', 1) AS u,
                 a.read_bytes
          FROM access_events a
          JOIN dbs_files f ON a.file_lfn = f.logical_file_name
          JOIN dbs_datasets d ON f.dataset_id = d.dataset_id
        )
        SELECT site, tier, count(*), count(DISTINCT u),
               round(sum(read_bytes)/1e9, 4)
        FROM j GROUP BY 1, 2
        """
    ).fetchall()
    assert _rows(got, "site", "tier", "n_accesses", "n_users", "gb_read") == sorted(
        tuple(r) for r in expect
    )
    # invariant: 10% dangling names dropped
    assert got.agg({"n_accesses": "sum"}).collect()[0][0] < 5000


def test_rucio_dataset_stats(fx, duck_fx):
    got = R.rucio_dataset_stats(
        fx["rucio_replicas"], fx["rucio_dids"], fx["rucio_contents"],
        fx["rucio_rses"], fx["dbs_files"], fx["dbs_datasets"],
    )
    expect = duck_fx.execute(
        """
        WITH f2d AS (
          SELECT fb.child AS name, bd.parent AS dataset
          FROM (SELECT * FROM rucio_contents WHERE child_type='FILE') fb
          JOIN (SELECT * FROM rucio_contents WHERE child_type='BLOCK') bd
            ON fb.parent = bd.child
        ),
        rep AS (
          SELECT r.*, rs.rse, f2d.dataset, d.accessed_at AS did_at,
                 greatest(r.accessed_at, d.accessed_at) AS last_access
          FROM rucio_replicas r
          LEFT JOIN rucio_rses rs USING (rse_id)
          JOIN f2d USING (name)
          LEFT JOIN (SELECT name, accessed_at FROM rucio_dids) d USING (name)
        ),
        lvl1 AS (
          SELECT rse, dataset, sum(bytes) AS b, count(*) AS n,
                 sum(CASE WHEN accessed_at IS NULL THEN 1 ELSE 0 END) AS nn,
                 max(last_access) AS la
          FROM rep GROUP BY 1, 2
        )
        SELECT dataset, count(*), round(sum(b)/1e9, 4), round(max(b)/1e9, 4),
               sum(n)::BIGINT, sum(nn)::BIGINT, max(la)
        FROM lvl1 GROUP BY dataset
        """
    ).fetchall()
    assert _rows(
        got, "dataset", "n_rses", "total_gb", "max_rse_gb",
        "n_replicas", "n_never_accessed", "last_access",
    ) == sorted(tuple(r) for r in expect)


def test_rucio_dbs_coverage_has_all_three_classes(fx):
    cov = {
        r.presence: r.n_files
        for r in R.rucio_dbs_file_coverage(
            fx["rucio_replicas"], fx["dbs_files"]
        ).collect()
    }
    # FIXTURES invariant 2: 90% resolve, 10% dangle → all classes present
    assert set(cov) == {"both", "left_only", "right_only"}
    assert cov["left_only"] > 0 and cov["both"] > 0


def test_condor_cpu_efficiency(fx, duck_fx):
    got = R.condor_cpu_efficiency(fx["condor_jobs"])
    expect = duck_fx.execute(
        """
        WITH dd AS (
          SELECT *, row_number() OVER (PARTITION BY GlobalJobId
                                       ORDER BY RecordTime) AS rn
          FROM condor_flat WHERE Status = 'Completed'
        ),
        core AS (
          SELECT string_split(Site, '_')[1] AS site_tier, Type AS job_type,
                 CpuTimeHr, RequestCpus * WallClockHr AS CoreTime
          FROM dd WHERE rn = 1 AND RequestCpus IS NOT NULL
        )
        SELECT site_tier, job_type, count(*),
               round(100 * sum(CpuTimeHr) / sum(CoreTime), 4),
               round(sum(CoreTime - CpuTimeHr), 2)
        FROM core GROUP BY 1, 2
        """
    ).fetchall()
    assert _rows(
        got, "site_tier", "job_type", "n_jobs", "cpu_eff_pct", "wasted_core_hr"
    ) == sorted(tuple(r) for r in expect)


def test_hpc_core_hours_day_template(fx):
    got = R.hpc_core_hours_daily(fx["condor_jobs"], "2024-01-01", "2024-01-10")
    rows = got.collect()
    sites = {r.site for r in rows}
    # every (day, site) cell exists: 10 days × |sites|
    assert len(rows) == 10 * len(sites)
    # fixture events span 7 days (±1h) → the tail days are zero-filled
    by_day = {}
    for r in rows:
        by_day[r.day] = by_day.get(r.day, 0) + r.core_hr
    assert by_day["2024-01-10"] == 0
    assert by_day["2024-01-03"] > 0


def test_phedex_leftovers(fx, duck_fx):
    got = R.phedex_leftovers(fx["phedex_replicas"], fx["dbs_datasets"])
    expect = duck_fx.execute(
        """
        SELECT node, count(DISTINCT dataset),
               round(sum(bytes)/1e12, 4)
        FROM phedex_replicas
        WHERE dataset NOT IN (SELECT dataset FROM dbs_datasets)
        GROUP BY node
        """
    ).fetchall()
    assert _rows(got, "node", "n_leftover_datasets", "leftover_tb") == sorted(
        tuple(r) for r in expect
    )
    # invariant: ~30% of phedex datasets are leftovers → non-empty
    assert got.count() > 0


def test_event_count_tier_month_union(fx, duck_fx):
    got = R.event_count_tier_month(fx["dbs_files"], fx["dbs_datasets"])
    expect = duck_fx.execute(
        """
        WITH j AS (
          SELECT string_split(d.dataset, '/')[4] AS tier,
                 string_split(string_split(d.dataset, '/')[3], '-')[1] AS skim,
                 f.event_count,
                 strftime(to_timestamp(f.creation_date), '%Y-%m') AS month
          FROM dbs_files f JOIN dbs_datasets d USING (dataset_id)
        )
        SELECT month, tier AS key, sum(event_count)::BIGINT FROM j GROUP BY 1, 2
        UNION
        SELECT month, tier || '/' || skim, sum(event_count)::BIGINT FROM j GROUP BY 1, 2
        """
    ).fetchall()
    assert _rows(got, "month", "key", "n_events") == sorted(tuple(r) for r in expect)


def test_wmarchive_step_metrics(fx):
    """First-cmsRun extraction vs an independent Python replica of the
    reference's getdata loop (wmarchive.py:118-142): records without a
    cmsRun step keep null metrics; a later cmsRun2 must lose to the
    first match."""
    got = {
        r.wmaid: (r.task, r.site, r.job_cpu, r.job_time, r.nthreads)
        for r in R.wmarchive_step_metrics(fx["wma_reports"]).collect()
    }
    rows = fx["wma_reports"].collect()
    assert len(got) == len(rows)
    n_missing = n_shadowed = 0
    for rec in rows:
        first = next(
            (s for s in rec.steps if s.name.lower().startswith("cmsrun")), None
        )
        if first is None:
            exp = (rec.task, None, None, None, None)
            n_missing += 1
        else:
            exp = (rec.task, first.site, first.jobCPU, first.jobTime, first.threads)
            if first.name != "cmsRun2" and any(
                s.name == "cmsRun2" for s in rec.steps
            ):
                n_shadowed += 1
                # a later cmsRun2 (threads=9) must lose to the first match
                assert got[rec.wmaid][4] != 9, rec.wmaid
        assert got[rec.wmaid] == exp, rec.wmaid
    # the fixture really exercises both adversarial branches
    assert n_missing > 50 and n_shadowed > 50


def test_crab_unique_users(fx, duck_fx):
    """Unique users by (year, ISO week) vs a DuckDB twin — retries share
    a GlobalJobId and must collapse before the distinct count
    (condor_crab_unique_users.py:68-95)."""
    from tests.cms_fixtures import MS0

    start, end = MS0 + 7 * 86400_000, MS0 + 35 * 86400_000
    duck_fx.register(
        "crab_flat", fx["crab_condor"].select("data.*").toPandas()
    )
    got = R.crab_unique_users(fx["crab_condor"], start, end, by="weekofyear")
    expect = duck_fx.execute(
        f"""
        WITH f AS (
          SELECT DISTINCT GlobalJobId, CRAB_UserHN,
                 year(to_timestamp(RecordTime / 1000)) AS y,
                 weekofyear(to_timestamp(RecordTime / 1000)) AS w
          FROM crab_flat
          WHERE Status = 'Completed' AND Type = 'analysis'
            AND regexp_matches(Site, '^T2_.*$')
            AND NOT regexp_matches(Site, '.*_CERN.*')
            AND RecordTime >= {start} AND RecordTime < {end}
        )
        SELECT y, w, count(DISTINCT CRAB_UserHN) FROM f GROUP BY 1, 2
        """
    ).fetchall()
    assert _rows(got, "year", "weekofyear", "n_users") == sorted(
        tuple(r) for r in expect
    )
    assert got.count() > 1  # window spans several ISO weeks


def test_aso_fts_stats(fx, duck_fx):
    """FTS⋈ASO latency stats vs a DuckDB twin (aso_stats.py:69-91):
    non-ASO issuers dropped, states outside (2,3) dropped, unmatched
    FTS rows survive the left join with null ASO metrics."""
    duck_fx.register(
        "fts_flat",
        fx["fts_transfers"].select(
            F.col("job_metadata.issuer").alias("issuer"),
            "job_id", "src_url", "tr_timestamp_start", "tr_timestamp_complete",
        ).toPandas(),
    )
    duck_fx.register("aso_t", fx["aso_transfers"].toPandas())
    got = R.aso_fts_stats(fx["fts_transfers"], fx["aso_transfers"])
    expect = duck_fx.execute(
        """
        WITH f AS (
          SELECT job_id, string_split(src_url, '/')[-1] AS filename,
                 tr_timestamp_start, tr_timestamp_complete,
                 (tr_timestamp_complete - tr_timestamp_start) / 1000.0 AS fts_duration
          FROM fts_flat WHERE issuer = 'ASO'
        ),
        a AS (
          SELECT string_split(tm_source_lfn, '/')[-1] AS filename,
                 tm_fts_id AS job_id, tm_last_update, tm_start_time,
                 tm_transfer_state, tm_transfer_retry_count, tm_publish
          FROM aso_t
          WHERE tm_transfer_state IN (2, 3) AND tm_fts_id IS NOT NULL
        )
        SELECT f.job_id, tm_transfer_state, tm_publish, tm_transfer_retry_count,
               count(*),
               round(avg(tm_last_update - tm_start_time), 4),
               round(avg(tr_timestamp_start / 1000.0 - tm_start_time), 4),
               round(avg(tm_last_update - tr_timestamp_complete / 1000.0), 4),
               round(avg(fts_duration), 4)
        FROM f LEFT JOIN a USING (filename, job_id)
        GROUP BY 1, 2, 3, 4
        """
    ).fetchall()
    assert _rows(
        got, "job_id", "tm_transfer_state", "tm_publish",
        "tm_transfer_retry_count", "n_records", "aso_duration",
        "aso_delay_start", "aso_delay", "fts_duration",
    ) == sorted((tuple(r) for r in expect), key=_nullsafe_key)
    # left-outer: unmatched FTS rows present with null ASO state
    assert got.filter(F.col("tm_transfer_state").isNull()).count() > 0


def test_hs06_core_hours(fx, duck_fx):
    """HS06 CPU-hour sums by (year, month) vs a DuckDB twin
    (condor_hs06coreHrPlot.py:54-93): retries collapse before the sum,
    null HS06CpuTimeHr records are skipped, _CERN sites excluded."""
    from tests.cms_fixtures import MS0

    start, end = MS0, MS0 + 42 * 86400_000
    duck_fx.register(
        "hs06_flat", fx["crab_condor"].select("data.*").toPandas()
    )
    got = R.hs06_core_hours(fx["crab_condor"], start, end, by="month")
    expect = duck_fx.execute(
        f"""
        WITH d AS (
          SELECT DISTINCT GlobalJobId, HS06CpuTimeHr,
                 year(to_timestamp(RecordTime / 1000)) AS y,
                 month(to_timestamp(RecordTime / 1000)) AS m
          FROM hs06_flat
          WHERE Status = 'Completed'
            AND regexp_matches(Site, '^T2_.*$')
            AND NOT regexp_matches(Site, '.*_CERN.*')
            AND RecordTime >= {start} AND RecordTime < {end}
        )
        SELECT y, m, round(sum(HS06CpuTimeHr), 4) FROM d GROUP BY 1, 2
        """
    ).fetchall()
    assert _rows(got, "year", "month", "hs06_cpu_hr") == sorted(
        tuple(r) for r in expect
    )
    assert got.count() >= 2


def test_dbs_block_file_match(fx, duck_fx):
    """LFN-pattern lookup vs the DuckDB twin of the reference's
    join-then-LIKE (dbs_lfn.py:40-55)."""
    duck_fx.register("dbs_blocks", fx["dbs_blocks"].toPandas())
    got = R.dbs_block_file_match(
        fx["dbs_blocks"], fx["dbs_files"], "%/Primary7/file_%"
    )
    expect = duck_fx.execute(
        """
        SELECT b.block_name, f.logical_file_name
        FROM dbs_blocks b JOIN dbs_files f ON b.block_id = f.block_id
        WHERE f.logical_file_name LIKE '%/Primary7/file_%'
        """
    ).fetchall()
    assert _rows(got, "block_name", "logical_file_name") == sorted(
        tuple(r) for r in expect
    )
    assert got.count() > 10


def test_dbs_block_lumis(fx, duck_fx):
    """Per-block lumi counts vs the DuckDB twin of the 3-way join
    (dbs_block_lumis.py:41-60); files with no lumi rows (every 7th)
    contribute nothing, blocks whose files all lack lumis vanish."""
    duck_fx.register("dbs_blocks2", fx["dbs_blocks"].toPandas())
    duck_fx.register("dbs_file_lumis", fx["dbs_file_lumis"].toPandas())
    got = R.dbs_block_lumis(
        fx["dbs_blocks"], fx["dbs_files"], fx["dbs_file_lumis"]
    )
    expect = duck_fx.execute(
        """
        SELECT b.block_name, count(fl.fl_lumi_section_num)
        FROM dbs_blocks2 b
        JOIN dbs_files f ON b.block_id = f.block_id
        JOIN dbs_file_lumis fl ON f.file_id = fl.fl_file_id
        GROUP BY 1
        """
    ).fetchall()
    assert _rows(got, "block_name", "nlumis") == sorted(
        tuple(r) for r in expect
    )


def test_phedex_merge(fx):
    """Declarative mergePhedex vs an independent Python replica of the
    Go fold (mergePhedex.go:263-325) run in date order: gid adoption,
    day-hole handling, the running integer average, and the
    single-day edge case."""
    rows = fx["phedex_daily"].collect()

    # gid adoption: max valid gid per (site, dataset, rdate), else -1
    valid = {}
    for r in rows:
        if r.gid is not None:
            k = (r.site, r.dataset, r.rdate)
            valid[k] = max(valid.get(k, r.gid), r.gid)

    daily = {}
    for r in rows:
        gid = valid.get((r.site, r.dataset, r.rdate), -1)
        k = (r.site, r.dataset, r.rdate, gid)
        daily.setdefault(k, {})
        daily[k][r.date] = daily[k].get(r.date, 0) + r.size

    expect = {}
    for k, by_day in daily.items():
        days = sorted(by_day)
        totals = [by_day[d] for d in days]
        n = len(totals)
        if n == 1:
            ave = totals[0]
        else:
            ave, j = 0, 0
            for t in totals[:-1]:
                ave = t if j == 0 else (ave * (j + 1) + t) // (j + 2)
                j += 1
        expect[k] = (days[0], days[-1], ave, max(totals), n)

    got = {
        (r.site, r.dataset, r.rdate, r.gid): (
            r.min_date, r.max_date, r.ave_size, r.max_size, r.days
        )
        for r in R.phedex_merge(fx["phedex_daily"]).collect()
    }
    assert got == expect
    # the fixture exercises both branches
    assert any(v[4] == 1 for v in expect.values())
    assert any(v[4] > 3 for v in expect.values())
    assert any(k[3] == -1 for k in expect)
    assert any(k[3] != -1 for k in expect)


def test_dbs_access_stream_counts(fx, duck_fx):
    got = R.dbs_access_stream_counts(
        fx["dbs_datasets"], fx["dbs_files"], fx["access_events"],
        count_type="cmssw", date_unix=1700000000.0,
    )
    expect = duck_fx.execute(
        """
        SELECT a.site_name, d.dataset, count(a.file_lfn) AS cnt,
               string_split(d.dataset, '/')[2] AS primds,
               string_split(d.dataset, '/')[3] AS procds,
               string_split(d.dataset, '/')[4] AS tier
        FROM access_events a
        JOIN dbs_files f ON a.file_lfn = f.logical_file_name
        JOIN dbs_datasets d ON f.dataset_id = d.dataset_id
        GROUP BY 1, 2, 4, 5, 6
        """
    ).fetchall()
    assert _rows(
        got, "site_name", "dataset", "count", "primds", "procds", "tier"
    ) == sorted(
        ((s, ds, c, p, pr, t) for s, ds, c, p, pr, t in expect),
        key=_nullsafe_key,
    )
    one = got.collect()[0]
    assert one.count_type == "cmssw" and one.date == 1700000000.0
    # unresolvable LFNs (access rows with no catalog file) must drop out
    n_unresolved = fx["access_events"].filter(
        F.col("file_lfn").like("/store/unknown/%")
    ).count()
    assert n_unresolved > 0
    total = got.agg(F.sum("count")).collect()[0][0]
    assert total == fx["access_events"].count() - n_unresolved


def test_monit_envelope_shape_and_json(fx, spark, tmp_path):
    src = fx["dbs_datasets"].select("dataset_id", "dataset").limit(7)
    env = R.monit_envelope(
        src, topic="cmssw_pop_raw_metric", producer="convert_avro2json",
        tstamp_ms=1700000000000,
    )
    assert env.columns == ["data", "metadata"]
    assert [f.name for f in env.schema["data"].dataType.fields] == [
        "dataset_id", "dataset"
    ]
    rows = env.collect()
    assert len(rows) == 7
    m = rows[0].metadata
    assert (m.topic, m.producer, m.type, m.type_prefix, m.version) == (
        "cmssw_pop_raw_metric", "convert_avro2json", "metric", "raw", "001"
    )
    assert m.kafka_timestamp == m.timestamp == "1700000000000"
    # end-to-end like the reference job: envelope → JSON lines on disk
    out = str(tmp_path / "monit_json")
    env.write.format("json").save(out)
    back = spark.read.json(out)
    assert back.count() == 7
    assert {f.name for f in back.schema.fields} == {"data", "metadata"}


def test_crab_dataset_popularity(fx, duck_fx, spark):
    got = R.crab_dataset_popularity(fx["crab_dataset_jobs"])
    duck = duckdb.connect()
    duck.register("crab_flat", fx["crab_dataset_jobs"].select("data.*").toPandas())
    expect = duck.execute(
        """
        WITH jobs AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY GlobalJobId
                                         ORDER BY GlobalJobId) AS rn
            FROM crab_flat
            WHERE Status IN ('Completed', 'Removed')
              AND CRAB_DataBlock IS NOT NULL
          ) WHERE rn = 1
        ),
        parsed AS (
          SELECT coalesce(regexp_extract(CRAB_DataBlock,
                   '^(.*)/([^/]*)#.*$', 2), '') AS datatier,
                 coalesce(CMSPrimaryPrimaryDataset, 'Unknown') AS primary_dataset,
                 coalesce(regexp_extract(CRAB_DataBlock,
                   '^(.*)/([^/]*)#.*$', 1), '') AS dataset,
                 RecordTime, CRAB_Workflow, ChirpCMSSWReadBytes
          FROM jobs
        )
        SELECT datatier, primary_dataset, dataset,
               max(RecordTime), min(RecordTime), count(*),
               count(DISTINCT CRAB_Workflow), sum(ChirpCMSSWReadBytes)
        FROM parsed GROUP BY 1, 2, 3
        """
    ).fetchall()
    # Spark dedup keeps an arbitrary row per GlobalJobId, but every
    # retry shares all aggregated fields except RecordTime; compare on
    # the time-independent columns exactly and spans loosely.
    got_rows = {
        (r.datatier, r.primary_dataset, r.dataset): (
            r.job_count, r.workflow_count,
        )
        for r in got.collect()
    }
    exp_rows = {
        (t, p, d): (jc, wc)
        for t, p, d, _mx, _mn, jc, wc, _rb in expect
    }
    assert got_rows == exp_rows and len(got_rows) > 0
    # fillna path: null primaries became 'Unknown'; malformed blocks ''
    keys = list(got_rows)
    assert any(p == "Unknown" for _t, p, _d in keys)
    assert any(t == "" for t, _p, _d in keys)
    # datatier parsed from block name, not the dataset tail (reference
    # regexp semantics: greedy group keeps tier OUT of dataset)
    assert all("#" not in d for _t, _p, d in keys)
    duck.close()


def test_dbs_file_checksums_patterns(fx, duck_fx):
    got = R.dbs_file_checksums(
        fx["dbs_datasets"], fx["dbs_files"],
        patterns=["/Primary1%", "/Primary2%"], antipatterns=["%/RAW"],
    )
    expect = duck_fx.execute(
        """
        SELECT d.dataset, f.logical_file_name, f.adler32
        FROM dbs_files f JOIN dbs_datasets d USING (dataset_id)
        WHERE (d.dataset LIKE '/Primary1%' OR d.dataset LIKE '/Primary2%')
          AND d.dataset NOT LIKE '%/RAW'
        """
    ).fetchall()
    assert _rows(got, "dataset", "logical_file_name", "adler32") == sorted(
        expect, key=_nullsafe_key
    )
    assert len(expect) > 0
