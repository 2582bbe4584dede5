#!/usr/bin/env python
"""Round-12 scaling-exponent audit: fitted log-log slopes for the 10
operators added this round (Kruskal-Wallis, one-way ANOVA,
Brown-Forsythe, Cochran-Armitage, Matthews, Krippendorff alpha,
Theil-Sen, Page-Hinkley, temperature weights, the bounded-probe
dim-ablation twin), plus the two re-measurements the r11 verdict asked
for — q_kendall_tau on the NEW default inversion-count path (task 2:
expect the 0.81/decade pair-join slope to drop) and q_spearman (task 3:
settle the 1.031-vs-0.654 discrepancy) — and the two cost-board anchors
(q_groupby_agg, q_dedup_exact) so this host window cross-checks against
the r11/r11b tables.

Method per tools/scaling_audit_r11b.py (self-consistent .scale/s0.1 and
.scale/s1 corpora, noop sink, untimed warm-up), hardened with TWO timed
reps per scale keeping the MIN (the r11 verdict's spearman finding was
a one-rep cache artifact suspect; the min is the least-contended
estimate, same rule as bench.py's outlier guard). Emits
.scale/audit_r12.json + a markdown table for PLANS.md.
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
    "q_kendall_tau",  # r11 verdict task 2 re-measure (sort path now default)
    "q_spearman",     # r11 verdict task 3 re-measure (2 reps, min)
    "q_dim_ablation_fixed",  # r11 verdict task 5 done-criterion (<= ~1.1)
    "q_kruskal_wallis", "q_anova_f", "q_levene_bf", "q_cochran_armitage",
    "q_matthews", "q_krippendorff", "q_theil_sen", "q_page_hinkley",
    "q_temperature_weights",
]


def main() -> None:
    from table_computing_spark.session import get_spark

    spark = get_spark("scaling-audit-r12")
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
        with open(os.path.join(REPO, ".scale", "audit_r12.json"), "w") as f:
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
