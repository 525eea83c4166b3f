#!/usr/bin/env python
"""Round-14 optimization profiler.

Times registry queries with the bench methodology (memo-cold entry:
invalidate_session_memos + clearCache BEFORE each entry, then 2-run
min) and writes ``.explain("formatted")`` output to
plans/r14/<query>_<tag>.txt so plan-shape claims are checkable
without running Spark.

Usage:
  python tools/opt_profile.py [--tag before|after] [--runs N] q1 q2 ...
  python tools/opt_profile.py --no-plans q1 q2        # timing only

Timing uses the same terminal action as bench.py (collect) so numbers
are comparable with the BENCH_SELF record; plans are captured once
per query outside the clock.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cmsspark_spark.queries import QUERIES  # noqa: E402
from cmsspark_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default=None, help="plan file suffix")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from cmsspark_spark.plans import formatted_plan

    spark = get_spark("opt-profile")
    spark.sparkContext.setLogLevel("ERROR")
    # warm up like bench.py
    QUERIES["global_lineitem_stats"](spark, args.sf_dir).collect()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(here, "plans", "r14")
    os.makedirs(plan_dir, exist_ok=True)

    from cmsspark_spark.operators.memo import invalidate_session_memos

    out: dict[str, float] = {}
    for name in args.names:
        spark.sparkContext.setJobDescription(f"opt-profile: {name}")
        # memo-cold entry, same discipline as bench.py timed()
        invalidate_session_memos()
        spark.catalog.clearCache()
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, args.sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        if not args.no_plans and args.tag:
            df = QUERIES[name](spark, args.sf_dir)
            path = os.path.join(plan_dir, f"{name}_{args.tag}.txt")
            with open(path, "w") as fh:
                fh.write(formatted_plan(df))
        spark.catalog.clearCache()
        print(f"{out[name]:8.3f}  {name}", file=sys.stderr)
    print(json.dumps({"timings": out, "load_1m": round(os.getloadavg()[0], 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
