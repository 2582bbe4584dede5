#!/usr/bin/env python
"""Round-13 scaling-exponent audit: fitted log-log slopes for the ten
operators added this round (wasserstein_1d, cvm_2sample, cliffs_delta,
err_at_k, brier_decomposition, qini_uplift, holt_winters,
prop_compare, vocab_richness, mantel_haenszel) plus the two cost-board
anchors (q_groupby_agg, q_dedup_exact) so this host window
cross-checks against the r11-r12 tables.

Method per tools/scaling_audit_r11b.py (self-consistent .scale/s0.1 and
.scale/s1 corpora, noop sink, untimed warm-up), hardened with TWO timed
reps per scale keeping the MIN (the r11 verdict's spearman finding was
a one-rep cache artifact suspect; the min is the least-contended
estimate, same rule as bench.py's outlier guard). Emits
.scale/audit_r13.json + a markdown table for PLANS.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCALES = {0.1: os.path.join(REPO, ".scale", "s0.1"),
          1.0: os.path.join(REPO, ".scale", "s1")}
REPS = 2

NAMES = [
    "q_groupby_agg", "q_dedup_exact",  # host-window anchors
    "q_wasserstein", "q_cvm_drift", "q_cliffs_delta",
    "q_err_at_k", "q_brier_decomp", "q_qini_uplift",
    "q_holt_winters", "q_prop_compare", "q_vocab_richness",
    "q_mantel_haenszel",
]


def main() -> None:
    from table_computing_spark.session import get_spark

    spark = get_spark("scaling-audit-r13")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    import __spark_entry__ as entry

    qs = entry.queries()

    def run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 2)

    out: dict = {}
    for name in NAMES:
        row: dict = {}
        try:
            run(name, SCALES[0.1])  # warm-up (plan + page cache + codegen)
        except Exception as e:  # noqa: BLE001
            row["error"] = repr(e)[:140]
            out[name] = row
            print(f"{name}: warmup FAILED {row['error']}", flush=True)
            continue
        ok = True
        for s, d in SCALES.items():
            try:
                reps = [run(name, d) for _ in range(REPS)]
                row[str(s)] = min(reps)
                row[f"reps_{s}"] = reps
            except Exception as e:  # noqa: BLE001
                row[str(s)] = None
                row["error"] = repr(e)[:140]
                ok = False
        if ok and row.get("0.1") and row.get("1.0"):
            row["slope"] = round(math.log10(row["1.0"] / row["0.1"]), 3)
        spark.catalog.clearCache()
        out[name] = row
        print(f"{name}: s0.1={row.get('0.1')}s s1={row.get('1.0')}s "
              f"slope={row.get('slope')} reps={row.get('reps_0.1')}/"
              f"{row.get('reps_1.0')}", flush=True)
        with open(os.path.join(REPO, ".scale", "audit_r13.json"), "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
    spark.stop()

    print("\n| query | t(s0.1) | t(s1) | slope (top decade) |")
    print("| --- | --- | --- | --- |")
    for name, row in sorted(out.items(), key=lambda kv: -(kv[1].get("slope") or -9)):
        mark = "⚠ " if (row.get("slope") or 0) > 1.1 else ""
        print(f"| {name} | {row.get('0.1')} | {row.get('1.0')} "
              f"| {mark}{row.get('slope')} |")


if __name__ == "__main__":
    main()
