"""Deterministic CMS-shaped fixture generator (FIXTURES.md §1-§13).

Row content is a pure function of (table, row index) under a fixed
seed — invariant 1. Scaled-down cardinalities (tests run in seconds)
but every structural invariant of FIXTURES.md §14 holds:

- 90% of access/replica file names resolve in dbs_files, 10% dangle
- null injection: ACCESSED_AT 40%, BYTES 2%, RequestCpus 10%, era 5%
- dataset names 3-slash-part; sites ``T?_CC_Name[_Suffix]``
- 7 consecutive event days, event time within day ±1h
- replicas vs dids timestamps disagree on 30% of shared files
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 7
N_DATASETS = 200
N_BLOCKS = 600
N_FILES = 3000
N_RSES = 40
N_REPLICAS = 5000
N_ACCESS = 5000
N_CONDOR = 2000
N_WMA = 400
N_PHEDEX = 800

TIERS = ["RAW", "AOD", "MINIAOD", "NANOAOD", "GEN-SIM", "ALCARECO", "USER", "SKIM"]
COUNTRIES = ["CH", "US", "DE", "FR", "IT", "UK", "ES", "RU"]
SITE_NAMES = ["CERN", "FNAL", "DESY", "IN2P3", "CNAF", "RAL", "PIC", "JINR"]
DAY0 = 1704067200  # 2024-01-01 UTC


def _rng(table: str) -> np.random.Generator:
    return np.random.default_rng(abs(hash((SEED, table))) % 2**31)


def _site(i: int, suffix_every: int = 4) -> str:
    t = f"T{1 + i % 3}_{COUNTRIES[i % 8]}_{SITE_NAMES[(i * 3) % 8]}"
    return t + ("_Disk" if i % suffix_every == 0 else "")


def _dataset_name(i: int) -> str:
    return f"/Primary{i % 40}/Proc{i % 7}-v{i % 3}/{TIERS[i % 8]}"


def _lfn(i: int) -> str:
    return f"/store/data/Run2024/Primary{i % 40}/file_{i}.root"


def datasets_df(spark: SparkSession) -> DataFrame:
    rng = _rng("datasets")
    era_null = rng.random(N_DATASETS) < 0.05
    rows = [
        (
            i + 1,
            _dataset_name(i),
            1 if i % 10 else 0,
            (i % 8) + 1,
            (i % 4) + 1,
            None if era_null[i] else (i % 6) + 1,
            (i % 4) + 1,
            float(DAY0 - 86400 * (i % 300)),
            f"/DC=ch/DC=cern/OU=Users/CN=user{i % 30}/CN=111/CN=First Last{i % 30}",
        )
        for i in range(N_DATASETS)
    ]
    return spark.createDataFrame(
        rows,
        "dataset_id: long, dataset: string, is_dataset_valid: int, "
        "data_tier_id: int, dataset_access_type_id: int, "
        "acquisition_era_id: int, processing_era_id: int, "
        "creation_date: double, create_by: string",
    )


def tiers_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(TIERS)],
        "data_tier_id: int, data_tier_name: string",
    )


def blocks_df(spark: SparkSession) -> DataFrame:
    rows = [
        (
            i + 1,
            f"{_dataset_name(i % N_DATASETS)}#{i:08x}",
            (i % N_DATASETS) + 1,
            _site(i),
            float((i % 97) * 1e9),
            (i % 20) + 1,
        )
        for i in range(N_BLOCKS)
    ]
    return spark.createDataFrame(
        rows,
        "block_id: long, block_name: string, dataset_id: long, "
        "origin_site_name: string, block_size: double, file_count: int",
    )


def files_df(spark: SparkSession) -> DataFrame:
    rows = [
        (
            i + 1,
            _lfn(i),
            (i % N_BLOCKS) + 1,
            ((i % N_BLOCKS) % N_DATASETS) + 1,
            (i % 5000) + 100,            # event_count
            float((i % 997) * 1e6 + 1),  # file_size
            float(DAY0 - 86400 * (i % 200)),
            f"{(i * 2654435761) % (1 << 32):08x}",  # adler32 checksum
        )
        for i in range(N_FILES)
    ]
    return spark.createDataFrame(
        rows,
        "file_id: long, logical_file_name: string, block_id: long, "
        "dataset_id: long, event_count: int, file_size: double, "
        "creation_date: double, adler32: string",
    )


def rses_df(spark: SparkSession) -> DataFrame:
    """Every 10th-ish RSE is a Temp/Test endpoint (case-varied like the
    real namespace) so rse_tags' prod/temp/test split is exercised."""
    rows = []
    for i in range(N_RSES):
        name = _site(i, suffix_every=5)
        # NOT i%10==7: those rses only ever receive the unresolvable
        # replica names (replica i sits on rse i%40 and dangles when
        # i%10==7, and 10|40), so they'd never appear in file-grain
        # rollups.
        if i % 10 == 3:
            name += "_Temp" if i % 20 == 3 else "_temp"
        elif i % 10 == 4:
            name += "_Test" if i % 20 == 4 else "_TEST"
        rows.append((f"{i:032x}", name, "TAPE" if i % 4 == 0 else "DISK"))
    return spark.createDataFrame(rows, "rse_id: string, rse: string, rse_type: string")


def _never_read_file(file_idx: int) -> bool:
    """Files of dataset index 0 (block cycle: i%600 ∈ {0,200,400}) are
    NEVER accessed on either the replica or the DID side, so the
    last-access report's never-read family is non-empty."""
    return file_idx % 600 in (0, 200, 400)


def replicas_df(spark: SparkSession) -> DataFrame:
    rng = _rng("replicas")
    accessed_null = rng.random(N_REPLICAS) < 0.40
    bytes_null = rng.random(N_REPLICAS) < 0.02
    rows = []
    for i in range(N_REPLICAS):
        resolves = i % 10 != 7  # 90% resolve
        name = _lfn(i % N_FILES) if resolves else f"/store/unknown/file_{i}.root"
        never = resolves and _never_read_file(i % N_FILES)
        rows.append(
            (
                "cms",
                name,
                f"{i % N_RSES:032x}",
                None if bytes_null[i] else float((i % 997) * 1e6 + 1),
                None
                if (never or accessed_null[i])
                else float(DAY0 + (i % 7) * 86400),
                float(DAY0 - 86400 * (i % 100)),
            )
        )
    return spark.createDataFrame(
        rows,
        "scope: string, name: string, rse_id: string, bytes: double, "
        "accessed_at: double, created_at: double",
    )


def dids_df(spark: SparkSession) -> DataFrame:
    # file-grain DIDs for resolvable names; 30% disagree on accessed_at
    # and 20% carry a LATER created_at than any replica row (so the
    # greatest(rep_created_at, dids_created_at) election is exercised)
    rows = []
    for i in range(N_FILES):
        disagree = i % 10 < 3
        base = float(DAY0 + (i % 7) * 86400)
        created = float(DAY0 - 86400 * (i % 100)) + (
            7200.0 if i % 5 == 0 else -3600.0
        )
        rows.append(
            (
                "cms",
                _lfn(i),
                "FILE",
                None
                if _never_read_file(i)
                else base + (3600.0 if disagree else 0.0),
                created,
                float((i % 997) * 1e6 + 1),
            )
        )
    return spark.createDataFrame(
        rows,
        "scope: string, name: string, did_type: string, accessed_at: double, "
        "created_at: double, bytes: double",
    )


def contents_df(spark: SparkSession) -> DataFrame:
    """Containment edges: file→block and block→dataset (FIXTURES §8)."""
    rows = []
    for i in range(N_FILES):
        block = f"{_dataset_name((i % N_BLOCKS) % N_DATASETS)}#{i % N_BLOCKS:08x}"
        rows.append((_lfn(i), block, "FILE"))
    for b in range(N_BLOCKS):
        block = f"{_dataset_name(b % N_DATASETS)}#{b:08x}"
        rows.append((block, _dataset_name(b % N_DATASETS), "BLOCK"))
    return spark.createDataFrame(rows, "child: string, parent: string, child_type: string")


def condor_df(spark: SparkSession) -> DataFrame:
    """HTCondor job metrics with the data envelope (FIXTURES §10)."""
    rng = _rng("condor")
    cpus_null = rng.random(N_CONDOR) < 0.10
    rows = []
    for i in range(N_CONDOR):
        wall = float((i % 50) + 1)
        cpus = None if cpus_null[i] else (i % 8) + 1
        rows.append(
            (
                (
                    f"crab_{i // 3}#{i}",  # duplicates every ~3 rows pre-dedup
                    float(DAY0 + (i % 7) * 86400 + (i % 7200) - 3600),
                    _site(i),
                    "Completed" if i % 5 else "Removed",
                    cpus,
                    wall * 0.7 * (cpus or 1),     # CpuTimeHr
                    wall,                          # WallClockHr
                    wall * (cpus or 1),            # CoreHr
                    "analysis" if i % 3 else "production",
                    f"{_dataset_name(i % N_DATASETS)}#{i % N_BLOCKS:08x}",
                ),
            )
        )
    schema = (
        "data: struct<GlobalJobId: string, RecordTime: double, Site: string, "
        "Status: string, RequestCpus: int, CpuTimeHr: double, WallClockHr: double, "
        "CoreHr: double, Type: string, CRAB_DataBlock: string>"
    )
    return spark.createDataFrame(rows, schema)


def access_events_df(spark: SparkSession) -> DataFrame:
    rows = []
    for i in range(N_ACCESS):
        resolves = i % 10 != 3
        rows.append(
            (
                _lfn((i * 13) % N_FILES) if resolves else f"/store/unknown/a_{i}.root",
                _site(i * 7),
                # A quarter get a numeric trailing CN (must be skipped per
                # NUM_PAT), a tenth an '&' proxy suffix (must be stripped).
                f"/DC=ch/DC=cern/OU=Users/CN=user{i % 50}/CN=222/CN=Person {i % 50}"
                + ("/CN=555" if i % 4 == 0 else "")
                + ("&rfc=proxy" if i % 10 == 0 else ""),
                float((i % 89) * 1e6),
                float(DAY0 + (i % 7) * 86400 + (i % 7200) - 3600),
            )
        )
    return spark.createDataFrame(
        rows,
        "file_lfn: string, site_name: string, user_dn: string, "
        "read_bytes: double, ts: double",
    )


def wma_reports_df(spark: SparkSession) -> DataFrame:
    """Step arrays are adversarial for first-cmsRun extraction: i%3==1
    records have NO cmsRun step, i%3==2 have it at position 2 (not
    first), and every 5th record has a SECOND cmsRun step whose metrics
    must lose to the first match (the reference breaks at the first)."""
    rows = []
    for i in range(N_WMA):
        steps = []
        for sidx in range((i % 3) + 1):
            name = ["cmsRun1", "stageOut1", "logArch1"][(sidx + i) % 3]
            steps.append(
                (
                    name,
                    _site(i + sidx),
                    float((i % 40) + sidx),        # jobCPU
                    float((i % 40) + sidx + 10),   # jobTime
                    (i % 4) + 1,                   # threads
                )
            )
        if i % 5 == 0:
            steps.append(("cmsRun2", _site(i + 9), 999.0, 999.0, 9))
        rows.append((f"wma_{i:06d}", f"task_{i % 25}", steps, float(DAY0 + (i % 7) * 86400)))
    schema = (
        "wmaid: string, task: string, steps: array<struct<name: string, "
        "site: string, jobCPU: double, jobTime: double, threads: int>>, "
        "meta_ts: double"
    )
    return spark.createDataFrame(rows, schema)


N_CRAB = 1500
N_FTS = 1200
N_ASO = 900
MS0 = DAY0 * 1000


def crab_condor_df(spark: SparkSession) -> DataFrame:
    """CRAB-subset condor records (condor_crab_unique_users.py schema):
    RecordTime in MILLISECONDS like the monitoring source; every 3rd
    row is a retry sharing a GlobalJobId; sites span T1/T2 incl.
    _CERN (excluded by the default regex)."""
    rows = []
    for i in range(N_CRAB):
        rows.append(
            (
                (
                    f"crab_{i // 3}#{i % 3}",
                    MS0 + (i % 42) * 86400_000 + (i % 3600) * 1000,
                    f"crabuser{(i * 7) % 37}",
                    "Completed" if i % 5 else "Removed",
                    _site(i * 11),
                    "analysis" if i % 4 else "production",
                    # normalized-CPU hours; 1 in 11 records lacks the
                    # benchmark field (sum must skip nulls)
                    None if i % 11 == 0 else round((i % 97) / 3.0, 3),
                ),
            )
        )
    schema = (
        "data: struct<GlobalJobId: string, RecordTime: long, "
        "CRAB_UserHN: string, Status: string, Site: string, Type: string, "
        "HS06CpuTimeHr: double>"
    )
    return spark.createDataFrame(rows, schema)


def crab_dataset_jobs_df(spark: SparkSession) -> DataFrame:
    """CRAB job records with data-block provenance (dbs_hdfs_crab.py
    _get_crab_condor_schema subset): every 4th row is a retry sharing
    a GlobalJobId; 1 in 9 has a null primary dataset (fillna path);
    1 in 13 a malformed block name (regexp no-match → empty string);
    statuses beyond Completed/Removed must be filtered out."""
    rows = []
    for i in range(N_CRAB):
        ds = _dataset_name(i % N_DATASETS)
        block = (
            f"{ds}#{i % 40:08x}" if i % 13 else f"malformed_block_{i}"
        )
        rows.append(
            (
                (
                    f"crabds_{i // 4}#{i % 4}",
                    MS0 + (i % 42) * 86400_000 + (i % 7200) * 500,
                    "Completed" if i % 5 else ("Removed" if i % 2 else "Running"),
                    None if i % 17 == 0 else block,
                    f"wf_{(i * 3) % 97}",
                    None if i % 9 == 0 else ds.split("/")[1],
                    float((i % 89) * 1e5),
                ),
            )
        )
    schema = (
        "data: struct<GlobalJobId: string, RecordTime: long, "
        "Status: string, CRAB_DataBlock: string, CRAB_Workflow: string, "
        "CMSPrimaryPrimaryDataset: string, ChirpCMSSWReadBytes: double>"
    )
    return spark.createDataFrame(rows, schema)


def fts_df(spark: SparkSession) -> DataFrame:
    """FTS transfer records (aso_stats.py fts_tables shape): nested
    job_metadata.issuer envelope; 1 in 5 transfers is non-ASO."""
    rows = []
    for i in range(N_FTS):
        start = MS0 + i * 60_000
        rows.append(
            (
                ("ASO" if i % 5 else "other",),
                f"fts_{i % 120}",
                f"srm://se.example/store/user/f_{i % 600}.root",
                "FINISHED" if i % 7 else "FAILED",
                float(start),
                float(start + (i % 300) * 1000),
            )
        )
    schema = (
        "job_metadata: struct<issuer: string>, job_id: string, "
        "src_url: string, t_final_transfer_state: string, "
        "tr_timestamp_start: double, tr_timestamp_complete: double"
    )
    return spark.createDataFrame(rows, schema)


def aso_df(spark: SparkSession) -> DataFrame:
    """ASO transfer rows keyed (filename, tm_fts_id); states 1/2/3 with
    nulls — only 2 and 3 survive the replica's filter."""
    rows = []
    for i in range(N_ASO):
        start = DAY0 + i * 60
        rows.append(
            (
                f"/store/user/f_{i % 600}.root",
                None if i % 13 == 0 else f"fts_{i % 120}",
                None if i % 11 == 0 else (i % 3) + 1,
                float(start),
                float(start + (i % 500)),
                i % 4,      # retry count
                i % 2,      # publish flag
            )
        )
    schema = (
        "tm_source_lfn: string, tm_fts_id: string, tm_transfer_state: int, "
        "tm_start_time: double, tm_last_update: double, "
        "tm_transfer_retry_count: int, tm_publish: int"
    )
    return spark.createDataFrame(rows, schema)


def phedex_df(spark: SparkSession) -> DataFrame:
    rows = []
    for i in range(N_PHEDEX):
        # 70% datasets overlap DBS; 30% are leftovers ("/Leftover...")
        overlap = i % 10 < 7
        ds = _dataset_name(i % N_DATASETS) if overlap else f"/Leftover{i % 23}/ProcX-v1/USER"
        # ~2/7 of nodes are tape/staging endpoints (_MSS / _Buffer)
        # so the campaign-tier report's size-on-disk zeroing fires
        node = _site(i * 5) + (
            "_MSS" if i % 7 == 2 else "_Buffer" if i % 7 == 5 else ""
        )
        rows.append(
            (
                ds,
                f"{ds}#{i:08x}",
                node,
                float((i % 499) * 1e9 + 1),
                float(DAY0 - 86400 * (i % 400)),
            )
        )
    return spark.createDataFrame(
        rows,
        "dataset: string, block: string, node: string, bytes: double, "
        "time_create: double",
    )


def file_lumis_df(spark: SparkSession) -> DataFrame:
    """DBS FILE_LUMIS rows (dbs_block_lumis.py flf table): a variable
    number of (run, lumi-section) rows per file; every 7th file has
    none (blocks whose files carry no lumis must drop out of the
    count, as in the reference's inner join)."""
    rows = []
    for i in range(N_FILES):
        if i % 7 == 0:
            continue
        for k in range(1 + i % 4):
            rows.append((i + 1, 300000 + i % 50, k + 1))
    return spark.createDataFrame(
        rows,
        "fl_file_id: long, fl_run_num: long, fl_lumi_section_num: long",
    )


#: (site, dataset, rdate) keys in the phedex_daily fixture.
N_PHEDEX_KEYS = 60
PHEDEX_DAYS = [20240101 + d for d in range(6)]


def phedex_daily_df(spark: SparkSession) -> DataFrame:
    """mergePhedex input snapshots (src/Go/mergePhedex.go:257-262):
    one row per (day, block replica) — multiple rows per key per day
    sum to the daily size. gid is null on every 3rd row; keys
    divisible by 5 have ONLY null gids (stay -1), the rest also carry
    exactly one valid gid so the null rows must adopt it. Keys skip
    some days (days count ≠ span) and key%4 spans only one day
    (the days==1 ave edge case)."""
    rows = []
    for k in range(N_PHEDEX_KEYS):
        site = _site(k)
        dataset = _dataset_name(k * 3)
        rdate = 20231201 + (k % 2)
        base_gid = None if k % 5 == 0 else 1000 + (k % 9)
        days = PHEDEX_DAYS[: 1 if k % 4 == 0 else 2 + k % 5]
        for di, day in enumerate(days):
            if k % 3 == 1 and di == 1:
                continue  # hole in the middle of the span
            for r in range(1 + (k + di) % 3):
                gid = None if (k + di + r) % 3 == 0 else base_gid
                size = (k * 131 + di * 17 + r * 7 + 1) * 10_000_000
                rows.append((day, site, dataset, size, rdate, gid))
    return spark.createDataFrame(
        rows,
        "date: int, site: string, dataset: string, size: long, "
        "rdate: int, gid: long",
    )


def dlocks_df(spark: SparkSession) -> DataFrame:
    """Rucio dataset_locks at BLOCK grain (rucio_datasets_monitoring.py
    :200-260 input shape): account mix spans prod accounts, sync-prefix
    accounts (collapse to the prefix), and user accounts (filtered
    out). Lock placement: one lock per block on rse b%N_RSES — the one
    rse that actually holds the dataset's file replicas (replica i sits
    on rse i%40 and dataset i%200, and 40|200). A dataset's blocks are
    b, b+200, b+400: the ACCOUNT selector b%5 aligns across them
    (200 ≡ 0 mod 5) so account class decides prod-vs-user per dataset,
    while the STATE selector b%7 de-aligns (200 ≡ 4 mod 7) so some
    datasets get a non-open 'R' on a strict subset of blocks. Result:
    d%5==4 → user account → DYNAMIC; else d%7 ∈ {2,3,6} → one block R
    → PARTIAL; else all three open prod locks → FULLY."""
    accounts = ["transfer_ops", "wma_prod", "wmcore_output",
                "sync_rucio_site_a", "user_joe"]
    rows = []
    for b in range(N_BLOCKS):
        block = f"{_dataset_name(b % N_DATASETS)}#{b:08x}"
        rows.append(
            (
                "cms",
                block,
                f"{b % N_RSES:032x}",
                accounts[b % len(accounts)],
                "O" if b % 7 != 3 else "R",
            )
        )
    return spark.createDataFrame(
        rows,
        "scope: string, name: string, rse_id: string, account: string, "
        "state: string",
    )


def access_types_df(spark: SparkSession) -> DataFrame:
    """DBS DATASET_ACCESS_TYPES dim (dbs_condor.py daf): ids 1-4 match
    datasets_df's (i % 4) + 1 so ~25% of datasets are VALID."""
    return spark.createDataFrame(
        [(1, "VALID"), (2, "DELETED"), (3, "INVALID"), (4, "PRODUCTION")],
        "dataset_access_type_id: int, dataset_access_type: string",
    )


def acquisition_eras_df(spark: SparkSession) -> DataFrame:
    """DBS ACQUISITION_ERAS dim (dbs_condor.py aef)."""
    return spark.createDataFrame(
        [(e, f"Era{e}") for e in range(1, 7)],
        "acquisition_era_id: int, acquisition_era_name: string",
    )


def processing_eras_df(spark: SparkSession) -> DataFrame:
    """DBS PROCESSING_ERAS dim (dbs_condor.py pef)."""
    return spark.createDataFrame(
        [(p, f"v{p}") for p in range(1, 5)],
        "processing_era_id: int, processing_version: string",
    )


def mod_configs_df(spark: SparkSession) -> DataFrame:
    """DBS DATASET_OUTPUT_MOD_CONFIGS bridge (dbs_condor.py mcf):
    every dataset has one config; every 5th has a second (two release
    versions → the release-granularity agg double-counts that dataset,
    exactly like the reference's 3-table bridge join does)."""
    rows = [(d, d) for d in range(1, N_DATASETS + 1)]
    rows += [
        (d, N_DATASETS + d) for d in range(1, N_DATASETS + 1) if d % 5 == 0
    ]
    return spark.createDataFrame(
        rows, "mc_dataset_id: long, mc_output_mod_config_id: long"
    )


def output_configs_df(spark: SparkSession) -> DataFrame:
    """DBS OUTPUT_MODULE_CONFIGS bridge (dbs_condor.py ocf)."""
    rows = [(c, (c % 10) + 1) for c in range(1, 2 * N_DATASETS + 1)]
    return spark.createDataFrame(
        rows, "oc_output_mod_config_id: long, oc_release_version_id: int"
    )


def release_versions_df(spark: SparkSession) -> DataFrame:
    """DBS RELEASE_VERSIONS dim (dbs_condor.py rvf)."""
    return spark.createDataFrame(
        [(r, f"CMSSW_14_0_{r}") for r in range(1, 11)],
        "r_release_version_id: int, r_release_version: string",
    )


def dbs_condor_jobs_df(spark: SparkSession) -> DataFrame:
    """Condor envelope records with the dbs_condor.py fields
    (DESIRED_CMSDataset / Campaign / CRAB_UserHN / ExitCode / KEvents /
    CoreHr): 10% of datasets dangle (never join DBS), KEvents is 0
    every 9th row and null every 13th, CoreHr 0 every 11th — the rate
    sentinel (-1) fires on all three."""
    n = 1500
    rows = []
    for i in range(n):
        dangles = i % 10 == 7
        ds = (
            f"/Unknown{i}/NoProc-v0/NONE"
            if dangles
            else _dataset_name(i % N_DATASETS)
        )
        kevents = None if i % 13 == 0 else (0.0 if i % 9 == 0 else float((i % 500) + 1) * 1.5)
        corehr = 0.0 if i % 11 == 0 else float((i % 40) + 1)
        rows.append(
            (
                (
                    ds,
                    f"Campaign{i % 12}",
                    f"wf_{i % 50}",
                    f"user{i % 25}",
                    0 if i % 4 else 8021 if i % 8 else 134,
                    "analysis" if i % 3 else "production",
                    "analysis" if i % 2 else "harvest",
                    float(DAY0 + (i % 7) * 86400),
                    kevents,
                    corehr,
                ),
            )
        )
    schema = (
        "data: struct<DESIRED_CMSDataset: string, Campaign: string, "
        "Workflow: string, CRAB_UserHN: string, ExitCode: int, Type: string, "
        "TaskType: string, RecordTime: double, KEvents: double, CoreHr: double>"
    )
    return spark.createDataFrame(rows, schema)


def all_fixtures(spark: SparkSession) -> dict[str, DataFrame]:
    return {
        "dbs_datasets": datasets_df(spark),
        "dbs_data_tiers": tiers_df(spark),
        "dbs_blocks": blocks_df(spark),
        "dbs_files": files_df(spark),
        "rucio_rses": rses_df(spark),
        "rucio_replicas": replicas_df(spark),
        "rucio_dids": dids_df(spark),
        "rucio_contents": contents_df(spark),
        "condor_jobs": condor_df(spark),
        "access_events": access_events_df(spark),
        "wma_reports": wma_reports_df(spark),
        "phedex_replicas": phedex_df(spark),
        "crab_condor": crab_condor_df(spark),
        "crab_dataset_jobs": crab_dataset_jobs_df(spark),
        "fts_transfers": fts_df(spark),
        "aso_transfers": aso_df(spark),
        "dbs_file_lumis": file_lumis_df(spark),
        "phedex_daily": phedex_daily_df(spark),
        "rucio_dlocks": dlocks_df(spark),
        "dbs_access_types": access_types_df(spark),
        "dbs_acquisition_eras": acquisition_eras_df(spark),
        "dbs_processing_eras": processing_eras_df(spark),
        "dbs_mod_configs": mod_configs_df(spark),
        "dbs_output_configs": output_configs_df(spark),
        "dbs_release_versions": release_versions_df(spark),
        "dbs_condor_jobs": dbs_condor_jobs_df(spark),
    }
