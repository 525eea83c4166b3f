"""Table-maintenance job: VACUUM manifest-orphaned files and apply
day-partition retention — the cleanup half of the layout family
(jobs/optimize_table.py is the rewrite half).

Two concerns, both metadata-driven (no data scans):

``--vacuum``: parquet files on disk that the stats-manifest sidecar
does not list are the residue of interrupted compactions/rewrites —
no planner routes to them, they only cost storage and listing time.
Deletion is age-guarded (``--min-age-s``, default 24 h) so a
concurrent writer's just-written, not-yet-manifested files are never
touched, and DRY-RUN by default — pass ``--delete`` to act.

``--retain-days N``: keep the newest N ``day=`` partitions of a
day-partitioned curated table and drop the rest (the operational
complement of incremental recompute — history otherwise grows one
partition per day forever). With ``--refresh-dims`` the stats
manifest is rebuilt from the survivors' footers afterwards.

Run:
    python -m cmsspark_spark.jobs.vacuum_table \\
        --table /data/curated --vacuum --min-age-s 86400 --delete
    python -m cmsspark_spark.jobs.vacuum_table \\
        --table /data/daily --retain-days 60 --delete \\
        --refresh-dims user_id
"""

from __future__ import annotations

import argparse
import json

from cmsspark_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--table", required=True)
    ap.add_argument("--vacuum", action="store_true",
                    help="remove manifest-orphaned parquet files")
    ap.add_argument("--min-age-s", type=int, default=86400,
                    help="vacuum age guard: only files at least this "
                         "old are candidates (concurrent-writer grace)")
    ap.add_argument("--retain-days", type=int,
                    help="keep only the newest N day= partitions")
    ap.add_argument("--day-col", default="day")
    ap.add_argument("--refresh-dims", nargs="*",
                    help="rebuild the stats manifest over these dims "
                         "after retention deletes")
    ap.add_argument("--delete", action="store_true",
                    help="actually delete (default: dry-run report)")
    args = ap.parse_args()
    if not args.vacuum and args.retain_days is None:
        ap.error("nothing to do: pass --vacuum and/or --retain-days")
    spark = get_spark("vacuum-table")
    from cmsspark_spark.operators.layout import (
        retain_day_partitions,
        vacuum_table,
    )

    report: dict = {"table": args.table, "dry_run": not args.delete}
    if args.vacuum:
        report["vacuum"] = vacuum_table(
            spark, args.table,
            min_age_s=args.min_age_s, dry_run=not args.delete,
        )
    if args.retain_days is not None:
        report["retention"] = retain_day_partitions(
            spark, args.table, args.retain_days,
            day_col=args.day_col, dry_run=not args.delete,
            refresh_manifest_dims=args.refresh_dims,
        )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
