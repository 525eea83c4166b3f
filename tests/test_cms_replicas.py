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
        "rucio_dlocks", "dbs_access_types", "dbs_acquisition_eras",
        "dbs_processing_eras", "dbs_mod_configs", "dbs_output_configs",
        "dbs_release_versions",
    ]:
        con.register(name, fx[name].toPandas())
    con.register("condor_flat", fx["condor_jobs"].select("data.*").toPandas())
    con.register(
        "dbs_condor_flat", fx["dbs_condor_jobs"].select("data.*").toPandas()
    )
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


def test_rucio_datasets_monitoring(fx, duck_fx):
    got = R.rucio_datasets_monitoring(
        fx["rucio_replicas"],
        fx["rucio_contents"],
        fx["rucio_rses"],
        fx["rucio_dlocks"],
    )
    expect = duck_fx.execute(
        """
        WITH f2b AS (SELECT child AS name, parent AS block
                     FROM rucio_contents WHERE child_type = 'FILE'),
        b2d AS (SELECT child AS block, parent AS dataset
                FROM rucio_contents WHERE child_type = 'BLOCK'),
        f2d AS (SELECT f.name, b.dataset
                FROM f2b f JOIN b2d b USING (block)),
        cell AS (
          SELECT r.rse_id, m.dataset,
                 sum(r.bytes) AS size_bytes,
                 count(*) AS file_count,
                 count(r.accessed_at) AS accessed_file_count,
                 max(r.accessed_at) AS last_access,
                 max(r.created_at) AS last_create
          FROM rucio_replicas r JOIN f2d m USING (name)
          GROUP BY 1, 2
        ),
        totals AS (
          SELECT f.dataset, count(DISTINCT f.name) AS tot_file_cnt,
                 b.tot_block_cnt
          FROM f2d f JOIN (
            SELECT dataset, count(DISTINCT block) AS tot_block_cnt
            FROM b2d GROUP BY 1) b USING (dataset)
          GROUP BY 1, 3
        ),
        locks AS (
          SELECT l.rse_id, b.dataset,
                 count(DISTINCT b.block) AS prod_locked_block_count
          FROM rucio_dlocks l JOIN b2d b ON l.name = b.block
          WHERE l.state = 'O'
            AND (CASE WHEN starts_with(l.account, 'sync') THEN 'sync'
                      ELSE l.account END) IN
                ('transfer_ops','wma_prod','wmcore_output','wmcore_pileup',
                 'wmcore_transferor','crab_tape_recall','crab_input','sync')
          GROUP BY 1, 2
        )
        SELECT s.rse,
               CASE WHEN lower(s.rse) LIKE '%temp' THEN 'temp'
                    WHEN lower(s.rse) LIKE '%test' THEN 'test'
                    ELSE 'prod' END AS rse_kind,
               c.dataset, c.size_bytes, c.last_access, c.last_create,
               c.file_count, c.accessed_file_count,
               c.file_count = t.tot_file_cnt AS is_fully_replicated,
               CAST(100 * c.file_count / t.tot_file_cnt
                    AS DECIMAL(6,2)) AS file_percentage,
               t.tot_block_cnt AS block_count,
               coalesce(k.prod_locked_block_count, 0) AS plbc,
               CASE WHEN t.tot_block_cnt = k.prod_locked_block_count
                      THEN 'FULLY'
                    WHEN k.prod_locked_block_count >= 1 THEN 'PARTIAL'
                    ELSE 'DYNAMIC' END AS is_locked
        FROM cell c
        JOIN totals t USING (dataset)
        LEFT JOIN locks k ON k.rse_id = c.rse_id AND k.dataset = c.dataset
        LEFT JOIN rucio_rses s ON s.rse_id = c.rse_id
        """
    ).fetchall()
    cols = [
        "rse", "rse_kind", "dataset", "size_bytes", "last_access",
        "last_create", "file_count", "accessed_file_count",
        "is_fully_replicated", "file_percentage", "block_count",
        "prod_locked_block_count", "is_locked",
    ]
    got_rows = [
        tuple(
            float(v) if c == "file_percentage" and v is not None else v
            for c, v in zip(cols, row)
        )
        for row in _rows(got, *cols)
    ]
    exp_rows = sorted(
        (
            tuple(
                float(v) if i == 9 and v is not None else v
                for i, v in enumerate(r)
            )
            for r in expect
        ),
        key=_nullsafe_key,
    )
    assert len(got_rows) == len(exp_rows) > 0
    assert got_rows == exp_rows
    # every lock state appears (the fixture plants all three)
    states = {r["is_locked"] for r in got.collect()}
    assert states == {"FULLY", "PARTIAL", "DYNAMIC"}
    # the DecimalType(6,2) contract of the reference (:391-401)
    assert dict(got.dtypes)["file_percentage"] == "decimal(6,2)"
    # prod/temp/test kinds all present via rse_tags
    kinds = {r["rse_kind"] for r in R.rucio_monitoring_kind_counts(got).collect()}
    assert kinds == {"prod", "temp", "test"}


def test_wma_agent_count(fx, duck_fx, spark):
    import pyspark.sql.functions as F

    # host derived from task; duplicate the first 50 wmaids to exercise
    # the reference's dropDuplicates(['wmaid'])
    base = fx["wma_reports"].withColumn(
        "host", F.concat(F.lit("vocms"), F.substring("task", -2, 2))
    ).withColumn("wmats", F.col("meta_ts"))
    dup = base.limit(50)
    got = R.wma_agent_count(base.unionByName(dup))

    duck_fx.register(
        "wma_flat",
        base.select(
            "wmaid",
            "host",
            "wmats",
            F.coalesce(
                F.try_element_at(
                    F.filter("steps", lambda s: s["site"].isNotNull()),
                    F.lit(-1),
                )["site"],
                F.lit("UNKNOWN"),
            ).alias("site"),
            F.size("steps").alias("number_of_steps"),
        ).toPandas(),
    )
    expect = duck_fx.execute(
        """
        SELECT strftime(to_timestamp(CAST(wmats AS BIGINT)), '%Y-%m-%d') AS day,
               host,
               count(*) AS count,
               avg(number_of_steps) AS avg_steps_count,
               list_sort(list(DISTINCT site)) AS sites,
               min(CAST(wmats AS BIGINT))
                 - (min(CAST(wmats AS BIGINT)) % 86400) + 43200
                 AS wmats_midday
        FROM wma_flat
        GROUP BY 1, 2
        """
    ).fetchall()
    got_rows = sorted(
        (
            (r["day"], r["host"], r["count"], round(r["avg_steps_count"], 9),
             tuple(r["sites"]), r["wmats_midday"])
            for r in got.collect()
        ),
        key=_nullsafe_key,
    )
    exp_rows = sorted(
        ((d, h, c, round(a, 9), tuple(s), m) for d, h, c, a, s, m in expect),
        key=_nullsafe_key,
    )
    assert got_rows == exp_rows and len(got_rows) > 0
    # midday stamps land exactly at 12:00 UTC
    assert all(r["wmats_midday"] % 86400 == 43200 for r in got.collect())


def test_wma_agent_count_to_opensearch_end_to_end(fx, spark):
    """The reference job end-to-end (wma_agent_count_to_opensearch.py:
    103-147): aggregate → dict docs → monthly index naming → bulk NDJSON
    through a recorded transport."""
    import json

    import pyspark.sql.functions as F

    from cmsspark_spark.sinks.osearch import (
        OpenSearchSink,
        index_schema_body,
    )

    base = fx["wma_reports"].withColumn(
        "host", F.concat(F.lit("vocms"), F.substring("task", -2, 2))
    ).withColumn("wmats", F.col("meta_ts"))
    df = R.wma_agent_count(base)

    created, posted = [], []
    sink = OpenSearchSink(
        index_template="test-wmarchive-agent-count",
        schema_body=index_schema_body(
            {
                "wmats_midday": {"format": "epoch_second", "type": "date"},
                "day": {"ignore_above": 32, "type": "keyword"},
                "host": {"ignore_above": 256, "type": "keyword"},
                "count": {"type": "long"},
                "avg_steps_count": {"type": "long"},
                "sites": {"type": "text"},
            },
            shards=2,
            replicas=1,
        ),
        create_index=lambda name, body: created.append((name, body)),
        bulk_post=lambda name, body: posted.append((name, body)) and 0,
        index_mod="M",  # the reference pushes to a monthly index
        drop_nulls=True,
    )
    docs = [r.asDict(recursive=True) for r in df.collect()]
    n_failed = sink.send(docs, timestamp_field="wmats_midday")
    assert n_failed == 0
    # monthly index name derives from the doc midday timestamp
    assert len(created) == 1
    assert created[0][0].startswith("test-wmarchive-agent-count-2024-")
    assert created[0][1]["settings"]["index"]["number_of_shards"] == "2"
    # bulk body round-trips every doc with the action line interleaved
    lines = [ln for p in posted for ln in p[1].strip().split("\n")]
    actions, payloads = lines[0::2], lines[1::2]
    assert all(json.loads(a) == {"index": {}} for a in actions)
    assert len(payloads) == len(docs)
    sent_hosts = {json.loads(p)["host"] for p in payloads}
    assert sent_hosts == {d["host"] for d in docs}


def test_phedex_days_present(fx, duck_fx):
    got = R.phedex_days_present(fx["phedex_daily"])
    duck_fx.register("phedex_daily", fx["phedex_daily"].toPandas())
    expect = duck_fx.execute(
        """
        WITH agg AS (
          SELECT site, dataset, size,
                 min(date) AS min_date, max(date) AS max_date,
                 min(rdate) AS min_rdate, max(rdate) AS max_rdate
          FROM phedex_daily GROUP BY site, dataset, size
        )
        SELECT site, dataset, size, min_date, max_date, min_rdate, max_rdate,
               date_diff('day',
                 least(strptime(CAST(min_date AS VARCHAR), '%Y%m%d'),
                       strptime(CAST(min_rdate AS VARCHAR), '%Y%m%d')),
                 greatest(strptime(CAST(max_date AS VARCHAR), '%Y%m%d'),
                          strptime(CAST(max_rdate AS VARCHAR), '%Y%m%d'))
               )::INT AS days
        FROM agg
        """
    ).fetchall()
    cols = ["site", "dataset", "size", "min_date", "max_date",
            "min_rdate", "max_rdate", "days"]
    assert _rows(got, *cols) == sorted(
        (tuple(r) for r in expect), key=_nullsafe_key
    )
    # rdate (Dec 2023) always precedes the first snapshot day (Jan
    # 2024), so every span is strictly positive
    assert got.filter(F.col("days") <= 0).count() == 0


def test_phedex_days_present_null_guard(spark):
    daily = spark.createDataFrame(
        [(None, "s", "d", 1, 20240101)],
        "date: int, site: string, dataset: string, size: long, rdate: int",
    )
    got = R.phedex_days_present(daily).collect()
    assert got[0]["days"] == -1  # reference's udf returns -1 on missing


def test_dbs_events_agg(fx, duck_fx):
    files = fx["dbs_files"].withColumn(
        "is_file_valid", (F.col("file_id") % 10 != 0).cast("int")
    )
    got = R.dbs_events_agg(fx["dbs_datasets"], fx["dbs_blocks"], files)
    duck_fx.register("dbs_blocks", fx["dbs_blocks"].toPandas())
    expect = duck_fx.execute(
        """
        SELECT d.dataset, d.creation_date AS creation_date,
               count(f.file_id)::BIGINT AS nfiles,
               sum(f.event_count)::BIGINT AS nevents,
               sum(f.file_size) AS size,
               sum(CASE WHEN f.file_id % 10 <> 0 THEN 1 ELSE 0 END)::BIGINT
                 AS nfiles_valid
        FROM dbs_files f
        JOIN dbs_blocks b ON f.block_id = b.block_id
        JOIN dbs_datasets d ON b.dataset_id = d.dataset_id
        GROUP BY 1, 2
        """
    ).fetchall()
    assert _rows(
        got, "dataset", "creation_date", "nfiles", "nevents", "size",
        "nfiles_valid"
    ) == sorted((tuple(r) for r in expect), key=_nullsafe_key)
    # dict-form agg renames landed (the reference's exact output names)
    assert set(got.columns) == {
        "dataset", "creation_date", "nfiles", "nevents", "size",
        "nfiles_valid",
    }


def test_anonymize_columns_sql_and_arrow(spark):
    import hashlib
    import unicodedata

    df = spark.createDataFrame(
        [("alice@x.ch", "Zürich", 1), (None, "plain", 2)],
        "user: string, city: string, n: int",
    )
    got_sql = R.anonymize_columns(df, ["user"], impl="sql")
    assert set(got_sql.columns) == {"city", "n", "user_hash"}
    rows = {r["n"]: r["user_hash"] for r in got_sql.collect()}
    assert rows[1] == hashlib.md5(b"alice@x.ch").hexdigest()
    assert rows[2] is None  # null stays null, like the reference's UDF
    # arrow impl reproduces the NFKD+ASCII-ignore fold exactly
    got_ar = R.anonymize_columns(df, ["user", "city"], impl="arrow")
    rows = {r["n"]: (r["user_hash"], r["city_hash"]) for r in got_ar.collect()}
    zur = unicodedata.normalize("NFKD", "Zürich").encode("ASCII", "ignore")
    assert rows[1] == (
        hashlib.md5(b"alice@x.ch").hexdigest(),
        hashlib.md5(zur).hexdigest(),
    )
    # on pure-ASCII data the two impls agree bit-for-bit
    ascii_sql = {
        r["n"]: r["city_hash"]
        for r in R.anonymize_columns(
            df.filter("city = 'plain'"), ["city"], impl="sql"
        ).collect()
    }
    ascii_ar = {
        r["n"]: r["city_hash"]
        for r in R.anonymize_columns(
            df.filter("city = 'plain'"), ["city"], impl="arrow"
        ).collect()
    }
    assert ascii_sql == ascii_ar


def test_rucio_daily_avro_end_to_end(fx, duck_fx, spark, tmp_path):
    """rucio_daily from REAL avro bytes: replica rows written with the
    vendored container writer under the reference's path layout, read
    back distributed, tally day from the path, joined to DBS files,
    summed — vs a DuckDB twin over the same logical rows."""
    from cmsspark_spark.sources.avro_io import write_container
    from tests.cms_fixtures import _lfn

    schema = {
        "type": "record", "name": "replica",
        "fields": [
            {"name": "RSE_ID", "type": "string"},
            {"name": "BYTES", "type": "long"},
            {"name": "NAME", "type": "string"},
            {"name": "SCOPE", "type": "string"},
            {"name": "CREATED_AT", "type": "long"},
        ],
    }
    day_ms = 1704067200_000
    rows = [
        {
            "RSE_ID": f"rse_{i % 3}",
            "BYTES": (i + 1) * 100,
            "NAME": _lfn(i) if i % 5 else "/store/unknown.root",
            "SCOPE": "cms",
            "CREATED_AT": day_ms + (i % 2) * 86400_000,
        }
        for i in range(40)
    ]
    base = tmp_path / "rucio" / "2024-01-15" / "replicas"
    base.mkdir(parents=True)
    write_container(str(base / "part-0.avro"), schema, rows[:25])
    write_container(str(base / "part-1.avro"), schema, rows[25:])

    got = R.rucio_daily(
        spark, str(tmp_path / "rucio" / "*" / "replicas" / "part*.avro"),
        fx["dbs_files"],
    )
    import pandas as pd
    duck_fx.register("rucio_rows", pd.DataFrame(rows))
    expect = duck_fx.execute(
        """
        SELECT r.RSE_ID, f.dataset_id, r.SCOPE, '20240115',
               strftime(to_timestamp(r.CREATED_AT // 1000), '%Y%m%d'),
               sum(r.BYTES)::BIGINT
        FROM rucio_rows r
        JOIN dbs_files f ON f.logical_file_name = r.NAME
        GROUP BY ALL
        """
    ).fetchall()
    assert _rows(
        got, "RSE_ID", "f_dataset_id", "SCOPE", "tally_day", "create_day",
        "rep_size"
    ) == sorted((tuple(r) for r in expect), key=_nullsafe_key)
    # unknown lfns (every 5th) dropped by the inner join
    assert got.agg(F.sum("rep_size")).collect()[0][0] < sum(
        r["BYTES"] for r in rows
    )


def test_campaign_mss_report(fx, duck_fx):
    phedex = fx["phedex_replicas"].select(
        F.col("dataset").alias("dataset_name"),
        F.col("node").alias("node_name"),
        F.col("bytes").alias("block_bytes"),
    )
    dbs = (
        fx["dbs_files"]
        .join(fx["dbs_datasets"], on="dataset_id")
        .groupBy("dataset")
        .agg(F.sum("file_size").alias("dbs_size"))
    )
    got = R.campaign_mss_report(phedex, dbs, limit=100)
    expect = duck_fx.execute(
        """
        WITH cs AS (
          SELECT string_split(dataset, '/')[3] AS campaign, node AS site,
                 sum(bytes) AS size
          FROM phedex_replicas GROUP BY 1, 2
        ),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY campaign ORDER BY size DESC, site ASC) AS rk
          FROM cs
        ),
        pc AS (
          SELECT campaign,
                 count(*)::BIGINT AS sites,
                 max(CASE WHEN rk = 1 THEN size END) AS mss,
                 max(CASE WHEN rk = 1 THEN site END) AS mss_name,
                 max(CASE WHEN rk = 2 THEN size END) AS second_mss,
                 max(CASE WHEN rk = 2 THEN site END) AS second_mss_name,
                 sum(size) AS phedex_size
          FROM ranked GROUP BY campaign
        ),
        dbs AS (
          SELECT string_split(d.dataset, '/')[3] AS campaign,
                 sum(f.file_size) AS dbs_size
          FROM dbs_files f JOIN dbs_datasets d USING (dataset_id)
          GROUP BY 1
        )
        SELECT pc.*, dbs.dbs_size
        FROM pc JOIN dbs USING (campaign)
        ORDER BY phedex_size DESC, campaign LIMIT 100
        """
    ).fetchall()
    cols = ["campaign", "sites", "mss", "mss_name", "second_mss",
            "second_mss_name", "phedex_size", "dbs_size"]
    assert _rows(got, *cols) == sorted(
        (tuple(r) for r in expect), key=_nullsafe_key
    )
    # disk_only drops tape endpoints entirely
    tape_free = R.campaign_mss_report(phedex, dbs, disk_only=True)
    assert tape_free.filter(
        F.col("mss_name").endswith("_MSS")
        | F.col("mss_name").endswith("_Buffer")
        | F.col("mss_name").endswith("_Export")
    ).count() == 0


def test_fts_issuer_totals_nested_groupby(spark, duck_fx):
    fts = spark.createDataFrame(
        [(i, {"issuer": f"iss{i % 3}", "q": "x"}, float((i + 1) * 10))
         for i in range(30)],
        "tid: long, job_metadata: struct<issuer: string, q: string>, "
        "f_size: double",
    )
    got = R.fts_issuer_totals(fts)
    want = {
        f"iss{k}": sum((i + 1) * 10.0 for i in range(30) if i % 3 == k)
        for k in range(3)
    }
    assert {r["issuer"]: r["sum_f_size"] for r in got.collect()} == want


def test_eos_dataset_totals_concat_join(fx, duck_fx, spark):
    from tests.cms_fixtures import _lfn

    rows = [
        (
            f"s{i % 7}",
            ("/eos/cms" + _lfn(i % 40)) if i % 4 else "/eos/other/file",
            "xrootd" if i % 2 else "fuse",
            "cmsusr" if i % 3 else "other",
            float(i), float(i * 2), float(i * 3), float(i * 4),
        )
        for i in range(60)
    ]
    eos = spark.createDataFrame(
        rows,
        "session: string, file_lfn: string, application: string, "
        "user: string, rb: double, wb: double, rt: double, wt: double",
    )
    got = R.eos_dataset_totals(eos, fx["dbs_files"], fx["dbs_datasets"])
    import pandas as pd
    duck_fx.register(
        "eos_rows",
        pd.DataFrame(rows, columns=["session", "file_lfn", "application",
                                    "user", "rb", "wb", "rt", "wt"]),
    )
    expect = duck_fx.execute(
        """
        WITH per AS (
          SELECT session, file_lfn, application, user,
                 sum(rb) rb, sum(wb) wb, sum(rt) rt, sum(wt) wt
          FROM eos_rows GROUP BY 1, 2, 3, 4
        )
        SELECT d.dataset, p.application,
               count(DISTINCT p.session)::BIGINT,
               round(sum(p.rb) / (1024*1024), 4),
               round(sum(p.wb) / (1024*1024), 4),
               round(sum(p.rt) / 1000, 4),
               round(sum(p.wt) / 1000, 4)
        FROM per p
        JOIN dbs_files f
          ON p.file_lfn = '/eos/cms' || f.logical_file_name
        JOIN dbs_datasets d USING (dataset_id)
        WHERE p.user LIKE 'cms%'
        GROUP BY 1, 2
        """
    ).fetchall()
    cols = ["d_dataset", "application", "nevents", "total_rb", "total_wb",
            "total_rt", "total_wt"]
    assert _rows(got, *cols) == sorted(
        (tuple(r) for r in expect), key=_nullsafe_key
    )
    # the /eos/other rows can never match the concat key
    assert got.count() > 0


def test_rucio_ds_summary(fx, duck_fx, spark):
    eras = spark.createDataFrame(
        [(i + 1, f"Era{i + 1}") for i in range(6)],
        "era_id: int, era_name: string",
    )
    got = R.rucio_ds_summary(
        fx["rucio_replicas"],
        fx["rucio_dids"],
        fx["rucio_contents"],
        fx["rucio_rses"],
        fx["dbs_files"],
        fx["dbs_datasets"],
        fx["dbs_data_tiers"],
        eras=eras,
    )
    duck_fx.register("dbs_data_tiers", fx["dbs_data_tiers"].toPandas())
    duck_fx.register("eras", eras.toPandas())
    expect = duck_fx.execute(
        """
        WITH f2b AS (SELECT child AS name, parent AS block
                     FROM rucio_contents WHERE child_type = 'FILE'),
        b2d AS (SELECT child AS block, parent AS dataset
                FROM rucio_contents WHERE child_type = 'BLOCK'),
        f2d AS (SELECT f.name, b.dataset
                FROM f2b f JOIN b2d b USING (block)),
        fg AS (
          SELECT r.name, r.rse_id,
                 CASE WHEN r.bytes IS NOT NULL THEN r.bytes
                      ELSE d.bytes END AS f_size,
                 greatest(r.accessed_at, d.accessed_at) AS f_accessed,
                 greatest(r.created_at, d.created_at) AS f_created,
                 coalesce(m.dataset,
                          'UnknownDatasetNameOfFiles_MonitoringTag')
                   AS dataset
          FROM rucio_replicas r
          LEFT JOIN (SELECT name, bytes, accessed_at, created_at
                     FROM rucio_dids) d
            USING (name)
          LEFT JOIN f2d m USING (name)
        ),
        cell AS (
          SELECT fg.rse_id, fg.dataset, rs.rse_type,
                 sum(f_size) AS sz, max(f_accessed) AS la,
                 max(f_created) AS lc, count(*) AS fc,
                 count(f_accessed) AS afc
          FROM fg LEFT JOIN rucio_rses rs USING (rse_id)
          GROUP BY 1, 2, 3
        ),
        folded AS (
          SELECT rse_type AS RseType, dataset,
                 trunc(max(sz))::BIGINT AS mx, trunc(min(sz))::BIGINT AS mn,
                 trunc(avg(sz))::BIGINT AS av, trunc(sum(sz))::BIGINT AS sm,
                 trunc(max(la))::BIGINT AS lastaccess,
                 trunc(max(lc))::BIGINT AS lastcreate,
                 sum(fc)::BIGINT AS filecnt, sum(afc)::BIGINT AS accfilecnt
          FROM cell GROUP BY 1, 2
        ),
        gen AS (
          SELECT dataset_id, trunc(sum(file_size))::BIGINT AS realsize,
                 count(DISTINCT logical_file_name) AS totalfilecnt
          FROM dbs_files GROUP BY 1
        ),
        info AS (
          SELECT d.dataset, d.dataset_id AS id, d.is_dataset_valid,
                 t.data_tier_name AS tiername, e.era_name AS eraname,
                 g.realsize, g.totalfilecnt
          FROM dbs_datasets d
          LEFT JOIN dbs_data_tiers t USING (data_tier_id)
          LEFT JOIN eras e ON e.era_id = d.acquisition_era_id
          LEFT JOIN gen g USING (dataset_id)
        )
        SELECT f.RseType, f.dataset, i.id, f.lastaccess, f.lastcreate,
               f.mx, f.mn, f.av, f.sm, f.filecnt, f.accfilecnt,
               i.realsize, i.totalfilecnt, i.is_dataset_valid,
               coalesce(i.tiername, 'UNKNOWN'),
               coalesce(i.eraname, 'UNKNOWN')
        FROM folded f LEFT JOIN info i ON i.dataset = f.dataset
        """
    ).fetchall()
    cols = ["RseType", "Dataset", "Id", "LastAccess", "LastCreate", "Max",
            "Min", "Avg", "Sum", "FileCnt", "AccessedFileCnt", "RealSize",
            "TotalFileCnt", "IsDatasetValid", "TierName",
            "AcquisitionEraName"]
    assert _rows(got, *cols) == sorted(
        (tuple(r) for r in expect), key=_nullsafe_key
    )
    # the size election and the unresolved-dataset tag both fire
    tagged = got.filter(
        F.col("Dataset") == R.UNKNOWN_DATASET_TAG
    ).count()
    assert tagged > 0
    # era fillna fires: ~5% of datasets have a null era id
    assert got.filter(F.col("AcquisitionEraName") == "UNKNOWN").count() > 0


def test_dbs_condor_agg(fx, duck_fx):
    got = R.dbs_condor_agg(
        fx["dbs_condor_jobs"],
        fx["dbs_datasets"],
        fx["dbs_files"],
        fx["dbs_access_types"],
        fx["dbs_acquisition_eras"],
        fx["dbs_processing_eras"],
        fx["dbs_mod_configs"],
        fx["dbs_output_configs"],
        fx["dbs_release_versions"],
        date="20240101",
    )
    base_ctes = """
        WITH fjoin AS (
          SELECT DISTINCT d.dataset_id AS d_dataset_id,
                 d.dataset AS d_dataset, d.creation_date,
                 f.event_count, f.file_size,
                 a.acquisition_era_name, p.processing_version
          FROM dbs_datasets d
          JOIN dbs_files f USING (dataset_id)
          JOIN dbs_access_types t USING (dataset_access_type_id)
          JOIN dbs_acquisition_eras a USING (acquisition_era_id)
          JOIN dbs_processing_eras p USING (processing_era_id)
          WHERE t.dataset_access_type = 'VALID' AND d.is_dataset_valid = 1
        ),
        newdf AS (
          SELECT d_dataset, d_dataset_id, acquisition_era_name,
                 processing_version,
                 sum(event_count) AS evts, sum(file_size) AS size,
                 max(creation_date) AS created
          FROM fjoin
          GROUP BY 1, 2, 3, 4
        ),
        agg_dbs AS (
          SELECT n.d_dataset, n.acquisition_era_name, r.r_release_version
          FROM newdf n
          JOIN dbs_mod_configs m ON n.d_dataset_id = m.mc_dataset_id
          JOIN dbs_output_configs o
            ON m.mc_output_mod_config_id = o.oc_output_mod_config_id
          JOIN dbs_release_versions r
            ON o.oc_release_version_id = r.r_release_version_id
        ),
        final AS (
          SELECT c.*, a.acquisition_era_name, a.r_release_version
          FROM dbs_condor_flat c
          JOIN agg_dbs a ON c.DESIRED_CMSDataset = a.d_dataset
          WHERE c.KEvents > 0
        )
    """
    rate = (
        "CASE WHEN sum(KEvents) IS NOT NULL AND sum(KEvents) <> 0 "
        "AND sum(CoreHr) IS NOT NULL AND sum(CoreHr) <> 0 "
        "THEN sum(KEvents) / sum(CoreHr) ELSE -1.0 END"
    )
    cases = {
        "dataset": (
            f"""{base_ctes}
            SELECT DESIRED_CMSDataset AS ds, CRAB_UserHN, ExitCode, Type,
                   TaskType, RecordTime, sum(KEvents), sum(CoreHr),
                   {rate} AS rate,
                   string_split(DESIRED_CMSDataset, '/')[4] AS tier
            FROM dbs_condor_flat GROUP BY 1, 2, 3, 4, 5, 6
            """,
            ["dataset", "user", "ExitCode", "Type", "TaskType", "rec_time",
             "sum_evts", "sum_chr", "rate", "tier"],
        ),
        "campaign": (
            f"""{base_ctes}
            SELECT Campaign, CRAB_UserHN, ExitCode, Type, TaskType,
                   RecordTime, sum(KEvents), sum(CoreHr), {rate} AS rate
            FROM dbs_condor_flat GROUP BY 1, 2, 3, 4, 5, 6
            """,
            ["campaign", "user", "ExitCode", "Type", "TaskType", "rec_time",
             "sum_evts", "sum_chr", "rate"],
        ),
        "release": (
            f"""{base_ctes}
            SELECT r_release_version, CRAB_UserHN, ExitCode, Type, TaskType,
                   RecordTime, sum(KEvents), sum(CoreHr), {rate} AS rate
            FROM final GROUP BY 1, 2, 3, 4, 5, 6
            """,
            ["release", "user", "ExitCode", "Type", "TaskType", "rec_time",
             "sum_evts", "sum_chr", "rate"],
        ),
        "era": (
            f"""{base_ctes}
            SELECT acquisition_era_name, CRAB_UserHN, ExitCode, Type,
                   TaskType, RecordTime, sum(KEvents), sum(CoreHr),
                   {rate} AS rate
            FROM final GROUP BY 1, 2, 3, 4, 5, 6
            """,
            ["era", "user", "ExitCode", "Type", "TaskType", "rec_time",
             "sum_evts", "sum_chr", "rate"],
        ),
    }
    for gran, (sql, cols) in cases.items():
        expect = duck_fx.execute(sql).fetchall()
        assert _rows(got[gran], *cols) == sorted(
            (tuple(r) for r in expect), key=_nullsafe_key
        ), gran
        # every row carries the run-date tag
        assert got[gran].filter(F.col("date") != "20240101").count() == 0
    # the -1 rate sentinel fires (null/zero KEvents or CoreHr groups)
    assert got["dataset"].filter(F.col("rate") == -1.0).count() > 0
    # dangling datasets appear at condor granularity but never in DBS ones
    assert got["dataset"].filter(
        F.col("dataset").like("/Unknown%")
    ).count() > 0


def test_rucio_last_access_report(fx, duck_fx):
    from tests.cms_fixtures import DAY0

    # fixture access times span days 0-6 (+1h skews): a day-30
    # threshold marks every accessed cell stale while still excluding
    # the never-read (null) cells from the since-family
    threshold = float(DAY0 + 30 * 86400)
    got = R.rucio_last_access_report(
        fx["rucio_replicas"],
        fx["rucio_dids"],
        fx["dbs_files"],
        fx["dbs_datasets"],
        fx["rucio_rses"],
        min_tb=0.0,
        not_read_since_epoch=threshold,
        mode="all",
    )
    base = f"""
        WITH prod AS (
          SELECT rse_id, rse FROM rucio_rses
          WHERE NOT (lower(rse) LIKE '%temp' OR lower(rse) LIKE '%test')
        ),
        f2d AS (
          SELECT f.logical_file_name AS name, d.dataset
          FROM dbs_files f JOIN dbs_datasets d USING (dataset_id)
        ),
        base AS (
          SELECT p.rse, m.dataset,
                 CASE WHEN r.bytes IS NOT NULL THEN r.bytes
                      ELSE d.bytes END AS f_size,
                 greatest(r.accessed_at, d.accessed_at) AS f_accessed,
                 greatest(r.created_at, d.created_at) AS f_created
          FROM rucio_replicas r
          JOIN prod p USING (rse_id)
          LEFT JOIN (SELECT name, bytes, accessed_at, created_at
                     FROM rucio_dids) d USING (name)
          LEFT JOIN f2d m USING (name)
          WHERE m.dataset IS NOT NULL
        ),
        cells AS (
          SELECT rse, dataset,
                 round(sum(f_size) / 1e12, 5) AS tb,
                 max(f_accessed) AS la, max(f_created) AS lc,
                 count(f_accessed) AS afc, count(*) AS fc
          FROM base GROUP BY 1, 2
        )
    """
    sub_never_sql = f"""{base}
        SELECT rse, dataset, tb, lc, fc FROM cells
        WHERE la IS NULL AND tb > 0.0
    """
    expect = duck_fx.execute(sub_never_sql).fetchall()
    cols = ["rse_name", "dataset", "dataset_size_in_rse_tb",
            "last_create_time_of_dataset_in_rse", "n_files_of_dataset_in_rse"]
    assert _rows(got["sub_never_read"], *cols) == sorted(
        (tuple(r) for r in expect), key=_nullsafe_key
    )

    main_never_sql = f"""{base},
        sub AS (SELECT rse, dataset, tb, lc FROM cells
                WHERE la IS NULL AND tb > 0.0)
        SELECT dataset, max(tb), min(tb), avg(tb), sum(tb), max(lc),
               array_to_string(list_sort(list(rse)), ', ')
        FROM sub GROUP BY 1
    """
    expect = duck_fx.execute(main_never_sql).fetchall()
    cols = ["dataset", "max_dataset_size_in_rses_tb",
            "min_dataset_size_in_rses_tb", "avg_dataset_size_in_rses_tb",
            "sum_dataset_size_in_rses_tb",
            "last_create_time_of_dataset_in_all_rses", "rses"]
    assert _rows(got["main_never_read"], *cols) == sorted(
        (tuple(r) for r in expect), key=_nullsafe_key
    )

    sub_since_sql = f"""{base}
        SELECT rse, dataset, tb, la, fc, afc FROM cells
        WHERE la IS NOT NULL AND la < {threshold} AND tb > 0.0
    """
    expect = duck_fx.execute(sub_since_sql).fetchall()
    cols = ["rse_name", "dataset", "dataset_size_in_rse_tb",
            "last_access_time_of_dataset_in_rse", "n_files_of_dataset_in_rse",
            "n_accessed_files_of_dataset_in_rse"]
    assert _rows(got["sub_not_read_since"], *cols) == sorted(
        (tuple(r) for r in expect), key=_nullsafe_key
    )

    main_since_sql = f"""{base},
        sub AS (SELECT rse, dataset, tb, la FROM cells
                WHERE la IS NOT NULL AND la < {threshold} AND tb > 0.0)
        SELECT dataset, max(tb), min(tb), avg(tb), sum(tb), max(la),
               array_to_string(list_sort(list(rse)), ', ')
        FROM sub GROUP BY 1
    """
    expect = duck_fx.execute(main_since_sql).fetchall()
    cols = ["dataset", "max_dataset_size_in_rses_tb",
            "min_dataset_size_in_rses_tb", "avg_dataset_size_in_rses_tb",
            "sum_dataset_size_in_rses_tb",
            "last_access_time_of_dataset_in_all_rses", "rses"]
    assert _rows(got["main_not_read_since"], *cols) == sorted(
        (tuple(r) for r in expect), key=_nullsafe_key
    )
    # both report families are non-trivial on the fixtures
    assert got["sub_never_read"].count() > 0
    assert got["sub_not_read_since"].count() > 0


def test_aggregate_dbs_stats(fx, duck_fx):
    duck_fx.register("dbs_blocks", fx["dbs_blocks"].toPandas())
    got = R.aggregate_dbs_stats(
        fx["dbs_datasets"], fx["dbs_blocks"], fx["dbs_files"]
    )
    expect = duck_fx.execute(
        """
        SELECT d.dataset, sum(b.file_count)::BIGINT,
               sum(f.event_count)::BIGINT, sum(f.file_size)
        FROM dbs_files f
        JOIN dbs_blocks b USING (block_id)
        JOIN dbs_datasets d ON b.dataset_id = d.dataset_id
        GROUP BY 1
        """
    ).fetchall()
    assert _rows(got, "dataset", "nfiles", "nevents", "size") == sorted(
        (tuple(r) for r in expect), key=_nullsafe_key
    )


def test_campaign_tier_sizes(fx, duck_fx):
    got = R.campaign_tier_sizes(
        fx["dbs_files"],
        fx["dbs_datasets"],
        fx["dbs_access_types"],
        fx["phedex_replicas"],
        limit=50,
    )
    expect = duck_fx.execute(
        """
        WITH dbs AS (
          SELECT d.dataset, sum(f.file_size) AS dbs_size
          FROM dbs_files f
          JOIN dbs_datasets d USING (dataset_id)
          JOIN dbs_access_types t USING (dataset_access_type_id)
          WHERE t.dataset_access_type = 'VALID'
          GROUP BY 1
        ),
        ph AS (
          SELECT dataset, sum(bytes) AS phedex_size,
                 sum(CASE WHEN node LIKE '%\\_MSS' ESCAPE '\\'
                            OR node LIKE '%\\_Buffer' ESCAPE '\\'
                            OR node LIKE '%\\_Export' ESCAPE '\\'
                          THEN 0.0 ELSE bytes END) AS size_on_disk
          FROM phedex_replicas GROUP BY 1
        ),
        j AS (
          SELECT string_split(p.dataset, '/')[3] AS campaign,
                 string_split(p.dataset, '/')[4] AS tier,
                 d.dbs_size, p.phedex_size, p.size_on_disk
          FROM ph p JOIN dbs d USING (dataset)
        )
        SELECT campaign, tier, sum(dbs_size), sum(phedex_size),
               sum(size_on_disk)
        FROM j GROUP BY 1, 2
        ORDER BY sum(dbs_size) + sum(phedex_size) DESC, campaign, tier
        LIMIT 50
        """
    ).fetchall()
    # ordered comparison: the replica's output IS the ranked report
    got_rows = [
        (r["campaign"], r["tier"], r["dbs_size"], r["phedex_size"],
         r["size_on_disk"])
        for r in got.collect()
    ]
    assert got_rows == [tuple(r) for r in expect]
    # the tape/staging zeroing fires: some group has disk < total
    assert any(r[4] < r[3] for r in got_rows)


def test_dbs_condor_agg_plan_shape(fx):
    """Scale invariants of the r5 replica: every tiny DBS dim
    (access types, eras, processing eras, the 3-table release bridge)
    joins as a broadcast; the only sort-merge joins key on the two
    legitimately-big relations — datasets⋈files on dataset_id and the
    condor fact join (which AQE upgrades to broadcast at runtime once
    the dataset-grain build side's true size is known)."""
    import re

    from cmsspark_spark import plans

    got = R.dbs_condor_agg(
        fx["dbs_condor_jobs"], fx["dbs_datasets"], fx["dbs_files"],
        fx["dbs_access_types"], fx["dbs_acquisition_eras"],
        fx["dbs_processing_eras"], fx["dbs_mod_configs"],
        fx["dbs_output_configs"], fx["dbs_release_versions"],
    )
    for gran in ("release", "era"):
        plan = plans.formatted_plan(got[gran])
        assert plan.count("BroadcastHashJoin") >= 3, gran
        smj_keys = re.findall(
            r"\(\d+\) SortMergeJoin\nLeft keys[^\n]*\nRight keys[^\n]*",
            plan,
        )
        for block in smj_keys:
            assert (
                "dataset_id" in block or "DESIRED_CMSDataset" in block
            ), f"{gran}: dim key shuffled instead of broadcast:\n{block}"


def test_rucio_last_access_report_disk_tape_modes(spark):
    """Reference get_rse_ids semantics (degraded/
    rucio_datasets_last_access_ts.py:60-71): disk mode drops RSEs
    whose name CONTAINS Tape/Test/Temp (case-SENSITIVE containment —
    an all-caps '_TEST' suffix survives, bug-for-bug), tape mode keeps
    only '_Tape'-suffixed names; /store/backfill/ LFNs are dropped in
    every mode (:46,:124)."""
    rses = spark.createDataFrame(
        [
            ("01", "T1_US_X_Disk"),
            ("02", "T1_US_X_Tape"),
            ("03", "T2_DE_Y_Temp"),
            ("04", "T2_DE_Y_TEST"),
            ("05", "T3_FR_Z"),
        ],
        "rse_id: string, rse: string",
    )
    tb = 1.0e12
    replicas = spark.createDataFrame(
        [
            ("01", "/store/data/f1.root", tb, None, 10.0),
            ("02", "/store/data/f2.root", tb, None, 10.0),
            ("05", "/store/data/f3.root", tb, 100.0, 10.0),
            ("04", "/store/data/f4.root", tb, None, 10.0),
            ("01", "/store/backfill/f5.root", tb, None, 10.0),
            ("03", "/store/data/f6.root", tb, None, 10.0),
        ],
        "rse_id: string, name: string, bytes: double, "
        "accessed_at: double, created_at: double",
    )
    dids = spark.createDataFrame(
        [], "name: string, bytes: double, accessed_at: double, "
        "created_at: double"
    )
    files = spark.createDataFrame(
        [(f"/store/data/f{i}.root", 1) for i in range(1, 7)]
        + [("/store/backfill/f5.root", 1)],
        "logical_file_name: string, dataset_id: long",
    )
    datasets = spark.createDataFrame(
        [(1, "/P/Q/R")], "dataset_id: long, dataset: string"
    )

    disk = R.rucio_last_access_report(
        replicas, dids, files, datasets, rses,
        not_read_since_epoch=1000.0, mode="disk",
    )
    never_rses = {
        r.rse_name for r in disk["sub_never_read"].collect()
    }
    # Tape + Temp excluded; case-mismatched '_TEST' kept; backfill
    # LFN gone so rse 01's only cell is f1
    assert never_rses == {"T1_US_X_Disk", "T2_DE_Y_TEST"}
    assert {
        r.rse_name for r in disk["sub_not_read_since"].collect()
    } == {"T3_FR_Z"}

    tape = R.rucio_last_access_report(
        replicas, dids, files, datasets, rses,
        not_read_since_epoch=1000.0, mode="tape",
    )
    assert {
        r.rse_name for r in tape["sub_never_read"].collect()
    } == {"T1_US_X_Tape"}
    assert tape["sub_not_read_since"].count() == 0

    with pytest.raises(ValueError, match="disk|tape|all"):
        R.rucio_last_access_report(
            replicas, dids, files, datasets, rses, mode="bogus"
        )


def test_rucio_last_access_report_single_cell_shuffle(fx):
    """The report family rolls the file grain into (rse, dataset)
    cells EXACTLY once; both 'main' rollups re-agg the tiny cell
    table, and the rses dim joins as a broadcast."""
    from cmsspark_spark import plans

    got = R.rucio_last_access_report(
        fx["rucio_replicas"], fx["rucio_dids"], fx["dbs_files"],
        fx["dbs_datasets"], fx["rucio_rses"], 0.0, 1e18,
    )
    plan = plans.formatted_plan(got["main_not_read_since"])
    assert "BroadcastHashJoin" in plan
    # one exchange hashes on the (rse, dataset) cell key — the single
    # fact-grain rollup; the dataset-grain main re-agg is its own
    # (tiny) exchange keyed on dataset alone
    assert plan.count("hashpartitioning(rse") == 1
