#!/usr/bin/env python
"""Round-14 same-boot re-rep study for the inverted-index Jaccard
family (r13 verdict task 3): q_jaccard_prefix + q_dedup_jaccard have
risen monotonically across four driver captures (3.96 → 7.71 s and
3.96 → 7.08 s, r10→r13) with ZERO plan-fingerprint drift. The ivf /
spatial / rolling_corr precedents all adjudicated environmental via a
panel-bracketed by-name study; this gives the Jaccard family the same
treatment, plus a leak probe: the BPE warm inversion (r13) was real
accumulated session state, so each rep also records the persistent-RDD
block count and cached-table count — a monotonic rise WITHIN this
study would indicate the shared tokenize/posting-list path leaks state
the way the BPE merge loop did.

Protocol: one boot, standard bench warm-up, calibration panel BEFORE,
then ALTERNATING warm reps (prefix, dedup, prefix, ...) x6 each so a
mid-study host-window shift hits both queries equally, panel AFTER.
Emits .scale/rerep_r14.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NAMES = ["q_jaccard_prefix", "q_dedup_jaccard"]
REPS = 6


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from table_computing_spark.session import get_spark

    spark = get_spark("tc-rerep-r14")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    import bench
    import __spark_entry__ as entry
    from table_computing_spark.plans import plan_fingerprint

    qs = entry.queries()

    def session_state() -> dict:
        try:
            n_rdd = len(spark.sparkContext._jsc.getPersistentRDDs())
        except Exception:  # noqa: BLE001
            n_rdd = -1
        return {"persistent_rdds": n_rdd}

    def run(name: str) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 3)

    out: dict = {"sf_dir": sf_dir, "protocol": "alternating x%d, panel-bracketed" % REPS}
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            out["boot_id"] = f.read().strip()
    except OSError:
        out["boot_id"] = "unknown"

    # cold pass + fingerprint (must equal the committed shas — the
    # study is only meaningful on the unchanged plans)
    studies: dict = {n: {"plan_sha": plan_fingerprint(qs[n](spark, sf_dir)),
                         "cold": run(n), "reps": [], "state": []}
                     for n in NAMES}

    panel_before = {k: v.get("min") for k, v in
                    bench._calibration_panel(spark, sf_dir).items()
                    if isinstance(v, dict)}
    out["panel_before"] = panel_before
    print(f"panel_before {panel_before}", flush=True)

    for i in range(REPS):
        for n in NAMES:
            t = run(n)
            studies[n]["reps"].append(t)
            studies[n]["state"].append(session_state())
            print(f"rep{i} {n}: {t}s state={studies[n]['state'][-1]}", flush=True)

    panel_after = {k: v.get("min") for k, v in
                   bench._calibration_panel(spark, sf_dir).items()
                   if isinstance(v, dict)}
    out["panel_after"] = panel_after
    print(f"panel_after {panel_after}", flush=True)

    for n in NAMES:
        studies[n]["min"] = min(studies[n]["reps"])
    out["studies"] = studies
    path = os.path.join(REPO, ".scale", "rerep_r14.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
