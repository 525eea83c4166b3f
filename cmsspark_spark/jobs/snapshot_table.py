"""Snapshot administration CLI: history / rollback / expire / changes
for a snapshot-versioned table (operators/snapshots.py) — the
operational companion of ``jobs/vacuum_table.py`` for tables that keep
time-travel history instead of a single live manifest.

Run:
    python -m cmsspark_spark.jobs.snapshot_table history  --table /data/t
    python -m cmsspark_spark.jobs.snapshot_table rollback --table /data/t --version 3
    python -m cmsspark_spark.jobs.snapshot_table expire   --table /data/t --keep-last 7 [--delete]
    python -m cmsspark_spark.jobs.snapshot_table changes  --table /data/t --from-version 3 [--to-version 5] [--out /tmp/delta]
    python -m cmsspark_spark.jobs.snapshot_table vacuum   --table /data/t [--min-age-s 3600] [--delete]
    python -m cmsspark_spark.jobs.snapshot_table tag      --table /data/t --name baseline [--version 3] [--replace]
    python -m cmsspark_spark.jobs.snapshot_table untag    --table /data/t --name baseline
    python -m cmsspark_spark.jobs.snapshot_table tags     --table /data/t
    python -m cmsspark_spark.jobs.snapshot_table stages   --table /data/t
    python -m cmsspark_spark.jobs.snapshot_table publish  --table /data/t --stage <id>
    python -m cmsspark_spark.jobs.snapshot_table discard  --table /data/t --stage <id>
    python -m cmsspark_spark.jobs.snapshot_table rewrite-manifests --table /data/t [--chunk N]
    python -m cmsspark_spark.jobs.snapshot_table maintain --table /data/t [--keep-last 7] [--vacuum-min-age-s 3600] [--run]

``expire`` and ``vacuum`` are dry-run unless ``--delete`` is passed.
``vacuum`` reclaims data files NO version references (crashed or
conflict-aborted writes) — the residue expire cannot see. ``changes`` writes (or counts) the rows added
between two versions: the incremental-training read. ``tag``/``untag``
manage named refs that pin retention; ``stages``/``publish``/
``discard`` drive the write-audit-publish flow; ``rewrite-manifests``
folds pointer metadata without touching data.
"""

from __future__ import annotations

import argparse

from cmsspark_spark.operators import snapshots as S
from cmsspark_spark.session import get_spark


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    h = sub.add_parser("history")
    h.add_argument("--table", required=True)

    r = sub.add_parser("rollback")
    r.add_argument("--table", required=True)
    r.add_argument("--version", type=int, required=True)

    e = sub.add_parser("expire")
    e.add_argument("--table", required=True)
    e.add_argument("--keep-last", type=int, default=None)
    e.add_argument("--keep-newer-than-s", type=float, default=None)
    e.add_argument("--delete", action="store_true")

    vv = sub.add_parser("vacuum")
    vv.add_argument("--table", required=True)
    vv.add_argument("--min-age-s", type=int, default=3600)
    vv.add_argument("--delete", action="store_true")

    tg = sub.add_parser("tag")
    tg.add_argument("--table", required=True)
    tg.add_argument("--name", required=True)
    tg.add_argument("--version", type=int, default=None)
    tg.add_argument("--replace", action="store_true")

    ut = sub.add_parser("untag")
    ut.add_argument("--table", required=True)
    ut.add_argument("--name", required=True)

    ts = sub.add_parser("tags")
    ts.add_argument("--table", required=True)

    st = sub.add_parser("stages")
    st.add_argument("--table", required=True)

    pb = sub.add_parser("publish")
    pb.add_argument("--table", required=True)
    pb.add_argument("--stage", required=True)

    dc = sub.add_parser("discard")
    dc.add_argument("--table", required=True)
    dc.add_argument("--stage", required=True)

    rm = sub.add_parser("rewrite-manifests")
    rm.add_argument("--table", required=True)
    rm.add_argument("--chunk", type=int, default=None)

    mt = sub.add_parser("maintain")
    mt.add_argument("--table", required=True)
    mt.add_argument("--target-files", type=int, default=64)
    mt.add_argument("--max-small-files", type=int, default=256)
    mt.add_argument("--max-delete-files", type=int, default=8)
    mt.add_argument("--max-manifests", type=int, default=64)
    mt.add_argument("--keep-last", type=int, default=None)
    mt.add_argument("--vacuum-min-age-s", type=int, default=None)
    mt.add_argument("--run", action="store_true")

    c = sub.add_parser("changes")
    c.add_argument("--table", required=True)
    c.add_argument("--from-version", type=int, required=True)
    c.add_argument("--to-version", type=int, default=None)
    c.add_argument("--out", default=None)

    args = ap.parse_args(argv)
    spark = get_spark("snapshot-table")

    if args.cmd == "history":
        S.snapshot_history(spark, args.table).orderBy("version").show(
            100, truncate=False
        )
    elif args.cmd == "rollback":
        v = S.rollback_snapshot(spark, args.table, args.version)
        print({"rolled_back_to": args.version, "new_version": v})
    elif args.cmd == "expire":
        res = S.expire_snapshots(
            spark, args.table, keep_last=args.keep_last,
            keep_newer_than_s=args.keep_newer_than_s,
            dry_run=not args.delete,
        )
        print(res)
    elif args.cmd == "vacuum":
        res = S.vacuum_snapshot_table(
            spark, args.table, min_age_s=args.min_age_s,
            dry_run=not args.delete,
        )
        print(res)
    elif args.cmd == "tag":
        v = S.snapshot_tag(
            spark, args.table, args.name, args.version,
            replace=args.replace,
        )
        print({"tag": args.name, "version": v})
    elif args.cmd == "untag":
        v = S.snapshot_untag(spark, args.table, args.name)
        print({"untagged": args.name, "was_version": v})
    elif args.cmd == "tags":
        print(S.snapshot_tags(spark, args.table))
    elif args.cmd == "stages":
        print(S.list_staged(spark, args.table))
    elif args.cmd == "publish":
        v = S.publish_staged(spark, args.table, args.stage)
        print({"published": args.stage, "version": v})
    elif args.cmd == "discard":
        e = S.discard_staged(spark, args.table, args.stage)
        print({"discarded": args.stage, "files": len(e.get("files", []))})
    elif args.cmd == "rewrite-manifests":
        v = S.rewrite_manifests(spark, args.table, chunk=args.chunk)
        print({"rewrote": v is not None, "version": v})
    elif args.cmd == "maintain":
        print(S.maintain_table(
            spark, args.table,
            target_files=args.target_files,
            max_small_files=args.max_small_files,
            max_delete_files=args.max_delete_files,
            max_manifests=args.max_manifests,
            keep_last=args.keep_last,
            vacuum_min_age_s=args.vacuum_min_age_s,
            dry_run=not args.run,
        ))
    elif args.cmd == "changes":
        df = S.snapshot_changes(
            spark, args.table, args.from_version, args.to_version
        )
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
        print({"rows_added": df.count(), "out": args.out})


if __name__ == "__main__":
    main()
