#!/usr/bin/env python
"""Benchmark harness: run every entry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {...per-query sec...}, "sf": 0.1}

Queries are materialized through the `noop` sink so the full plan
executes (count() alone would let Catalyst prune most of the work).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from table_computing_spark.session import get_spark

    spark = get_spark("tc-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()

    # JVM/codegen warm-up so q1 doesn't pay session startup.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            timings[name] = round(time.perf_counter() - t0, 3)
            print(f"[bench] {name}: {timings[name]}s", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 — a failing query must not hide the rest
            failures[name] = f"{type(e).__name__}: {e}"[:200]
            print(f"[bench] {name}: FAILED {failures[name]}", file=sys.stderr, flush=True)

    out = {
        "metric": "total_query_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
    }
    if failures:
        out["failures"] = failures
    print(json.dumps(out))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
