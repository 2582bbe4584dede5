#!/usr/bin/env python
"""Round-15 second-pass profiler: split each query's cold time into
CONSTRUCTION (fn(spark, sf_dir) — includes any driver-side actions the
operator runs while building the plan) vs EXECUTION (the noop write),
and count the Spark jobs each phase submits (statusTracker job ids).

Construction-heavy rows are fold candidates (guide §6 — fewer actions
per query; the r14 brier/cochrans and r15 drift-wing folds were found
exactly this way). Usage:

    python tools/build_exec_split_r15.py [--top N] [--names q_a q_b ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument("--top", type=int, default=60,
                    help="profile the N slowest cold queries from BENCH_LOCAL.json")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from table_computing_spark.session import get_spark

    spark = get_spark("tc-split-profile-r15")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    import __spark_entry__ as entry
    from table_computing_spark.sources.parquet import TABLES, load_df

    qs = entry.queries()
    for t in TABLES:
        load_df(spark, args.sf, t).write.mode("overwrite").format("noop").save()

    if args.names:
        names = args.names
    else:
        with open(os.path.join(REPO, "BENCH_LOCAL.json")) as f:
            prior = json.load(f)["queries"]
        names = [k for k, _ in sorted(prior.items(), key=lambda kv: -kv[1])[: args.top]]

    tracker = spark.sparkContext.statusTracker()

    def n_jobs() -> int:
        try:
            ids = tracker.getJobIdsForGroup(None)
            return (max(ids) + 1) if ids else 0
        except Exception:  # noqa: BLE001
            return 0

    def clear() -> None:
        spark.catalog.clearCache()
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
        except Exception:  # noqa: BLE001
            pass

    rows = []
    for name in names:
        if name not in qs:
            print(f"skip {name}: not in registry", flush=True)
            continue
        clear()
        j0 = n_jobs()
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, args.sf)
            t1 = time.perf_counter()
            j1 = n_jobs()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            j2 = n_jobs()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}"[:160], flush=True)
            continue
        rows.append({
            "query": name,
            "build_s": round(t1 - t0, 3),
            "exec_s": round(t2 - t1, 3),
            "build_jobs": j1 - j0,
            "exec_jobs": j2 - j1,
        })
        print(f"{name:34s} build {t1-t0:6.2f}s ({j1-j0:3d} jobs)  "
              f"exec {t2-t1:6.2f}s ({j2-j1:3d} jobs)", flush=True)

    rows.sort(key=lambda r: -r["build_s"])
    print("\n== construction-heaviest ==", flush=True)
    for r in rows[:25]:
        print(f"{r['query']:34s} build {r['build_s']:6.2f}s ({r['build_jobs']:3d} jobs) "
              f"exec {r['exec_s']:6.2f}s", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"sf": args.sf, "rows": rows}, f, indent=1)
        print(f"wrote {args.out}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
