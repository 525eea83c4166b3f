"""Fixed schema factories (SURVEY §1.3 regime 1).

The reference hand-declares ~24 StructTypes (schemas.py:13-770) with a
per-table column-prefix convention carrying lineage through joins
(d_/b_/f_/fl_ for DBS, r_ for replicas...), then CSV/Avro loads pin
them with nullValue='null' and sometimes FAILFAST
(spark_utils.py:287-290, rucio_datasets_stats.py:146-148).

This module re-expresses that regime compactly: one spec table of
(column, type) pairs per source, expanded to StructTypes by a single
factory. The OTHER two schema regimes of §1.3 live in
``sources/readers.py``: partial-schema projection pushdown for huge
JSON (SourceSpec.schema + flatten) and inference with samplingRatio +
empty-input fallback.

These are *shapes*, not copies: field lists cover the columns the
replica jobs (jobs/cms_replicas.py) actually consume, in the
reference's prefix vocabulary, so a reference user's join code reads
unchanged.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_TYPES = {"s": StringType(), "l": LongType(), "d": DoubleType()}

#: source → ((column, typecode), ...). Prefixes follow the reference's
#: lineage convention (schemas.py:122-139, 201-213, 271-289): d_ =
#: dataset, b_ = block, f_ = file, fl_ = file-lumi, r_ = replica.
_SPECS: dict[str, tuple[tuple[str, str], ...]] = {
    "dbs_datasets": (
        ("d_dataset_id", "l"),
        ("d_dataset", "s"),
        ("d_creation_date", "d"),
        ("d_is_dataset_valid", "l"),
        ("d_primary_ds_id", "l"),
        ("d_processed_ds_id", "l"),
        ("d_data_tier_id", "l"),
        ("d_dataset_access_type_id", "l"),
        ("d_acquisition_era_id", "l"),
        ("d_physics_group_id", "l"),
    ),
    "dbs_blocks": (
        ("b_block_id", "l"),
        ("b_block_name", "s"),
        ("b_dataset_id", "l"),
        ("b_file_count", "l"),
        ("b_block_size", "d"),
        ("b_creation_date", "d"),
    ),
    "dbs_files": (
        ("f_file_id", "l"),
        ("f_logical_file_name", "s"),
        ("f_dataset_id", "l"),
        ("f_block_id", "l"),
        ("f_event_count", "l"),
        ("f_file_size", "d"),
        ("f_adler32", "s"),
        ("f_check_sum", "s"),
        ("f_creation_date", "d"),
        ("f_is_file_valid", "l"),
    ),
    "dbs_file_lumis": (
        ("fl_run_num", "l"),
        ("fl_lumi_section_num", "l"),
        ("fl_file_id", "l"),
    ),
    "phedex": (
        ("now_sec", "d"),
        ("dataset_name", "s"),
        ("dataset_is_open", "s"),
        ("block_name", "s"),
        ("block_bytes", "d"),
        ("node_name", "s"),
        ("br_src_bytes", "d"),
        ("br_dest_bytes", "d"),
        ("br_node_bytes", "d"),
    ),
    "rucio_replicas": (
        ("rse_id", "s"),
        ("scope", "s"),
        ("name", "s"),
        ("bytes", "l"),
        ("accessed_at", "l"),
        ("created_at", "l"),
        ("state", "s"),
    ),
    "rucio_dids": (
        ("scope", "s"),
        ("name", "s"),
        ("did_type", "s"),
        ("bytes", "l"),
        ("accessed_at", "l"),
        ("hidden", "s"),
        ("deleted_at", "l"),
    ),
    "rucio_rses": (
        ("rse_id", "s"),
        ("rse", "s"),
        ("rse_type", "s"),
        ("deleted_at", "l"),
    ),
    "condor_slim": (
        ("GlobalJobId", "s"),
        ("Workflow", "s"),
        ("WMAgent_SubTaskName", "s"),
        ("Site", "s"),
        ("Tier", "s"),
        ("Type", "s"),
        ("Status", "s"),
        ("JobFailed", "l"),
        ("CoreHr", "d"),
        ("CpuTimeHr", "d"),
        ("WallClockHr", "d"),
        ("RequestCpus", "d"),
        ("RecordTime", "l"),
    ),
    "aso_transfers": (
        ("tm_id", "s"),
        ("tm_user", "s"),
        ("tm_taskname", "s"),
        ("tm_transfer_state", "s"),
        ("tm_source", "s"),
        ("tm_destination", "s"),
        ("tm_start_time", "l"),
        ("tm_end_time", "l"),
    ),
}


def schema(name: str) -> StructType:
    """StructType for a named source (all fields nullable, matching the
    reference's declarations)."""
    return StructType(
        [StructField(c, _TYPES[t], True) for c, t in _SPECS[name]]
    )


def available() -> list[str]:
    return sorted(_SPECS)


def empty_fallback(name: str) -> StructType:
    """The schema an empty-input day falls back to (reference
    schemas.py:669-709 via spark_utils.py:538,598) — same shape as the
    real read so downstream unions/joins never branch on emptiness."""
    return schema(name)
