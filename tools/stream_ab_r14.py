#!/usr/bin/env python
"""Streaming shuffle-partitions A/B (r13 verdict task 8): the r11-era
18.8k rows/s steady rate vs the r13 10.9k best-batch has a named
mechanism — per-batch trigger/task scheduling fixed cost × state
partitions — but no quantifying experiment. Each ~16.7k-row micro-batch
of the bench's 6-slice replay pays (task launch + state-store
read-merge-write + commit) PER STATE PARTITION; at
spark.sql.shuffle.partitions=32 that is 32 near-empty state tasks per
batch. This A/B runs the EXACT bench streaming pipeline
(bench._bench_streaming) at shuffle.partitions ∈ {32, 8, 4, 2},
panel-bracketed, 2 reps each (keep best), recording how much of the
per-batch fixed cost the partition count explains. Emits
.scale/stream_ab_r14.json + a BASELINE.md adjudication block.

Note: the partition count is picked up at STREAM START from the session
conf (fresh checkpoint dir per run — bench mkdtemps one), so one boot
covers all arms; arms alternate to decorrelate host-window drift.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ARMS = [32, 8, 4, 2]
REPS = 2


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from table_computing_spark.session import get_spark

    spark = get_spark("tc-stream-ab-r14")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    import bench

    out: dict = {"sf_dir": sf_dir, "arms": {}}
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            out["boot_id"] = f.read().strip()
    except OSError:
        out["boot_id"] = "unknown"

    out["panel_before"] = {
        k: v.get("min")
        for k, v in bench._calibration_panel(spark, sf_dir).items()
        if isinstance(v, dict)
    }
    print(f"panel_before {out['panel_before']}", flush=True)

    base = spark.conf.get("spark.sql.shuffle.partitions")
    for rep in range(REPS):
        for p in ARMS:
            spark.conf.set("spark.sql.shuffle.partitions", str(p))
            r = bench._bench_streaming(spark, sf_dir)
            arm = out["arms"].setdefault(str(p), [])
            arm.append(r)
            print(
                f"rep{rep} partitions={p}: steady={r.get('steady_rows_per_sec')} "
                f"best_batch={r.get('best_batch_rows_per_sec')} "
                f"wall={r.get('wall_sec')}",
                flush=True,
            )
    spark.conf.set("spark.sql.shuffle.partitions", base)

    out["panel_after"] = {
        k: v.get("min")
        for k, v in bench._calibration_panel(spark, sf_dir).items()
        if isinstance(v, dict)
    }
    print(f"panel_after {out['panel_after']}", flush=True)

    best = {
        p: max(
            (r.get("best_batch_rows_per_sec") or 0) for r in runs
        )
        for p, runs in out["arms"].items()
    }
    out["best_batch_by_partitions"] = best
    path = os.path.join(REPO, ".scale", "stream_ab_r14.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {path}: {best}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
