#!/usr/bin/env python
"""Round-11b scaling-exponent audit: fitted log-log slopes for the 12
operators added after the r11 window froze (average precision, kappa,
BLEU, pass@k, Bradley-Terry, Kendall tau, Spearman, Mann-Whitney,
BH-FDR, max drawdown, Nelson-Aalen, clustering coefficient), plus two
cost-board anchors (q_groupby_agg, q_dedup_exact) so this run's host
window can be cross-checked against the r11 audit table.

Method identical to tools/scaling_audit_r11.py: each query runs at the
self-consistent .scale/s0.1 and .scale/s1 corpora (10x per decade)
through the noop sink after an untimed warm-up; slope =
log10(t1/t0.1). Emits .scale/audit_r11b.json + a markdown table for
PLANS.md.
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

NAMES = [
    "q_groupby_agg", "q_dedup_exact",  # host-window anchors
    "q_avg_precision", "q_cohens_kappa", "q_bleu", "q_pass_at_k",
    "q_bradley_terry", "q_kendall_tau", "q_spearman", "q_mann_whitney",
    "q_bh_fdr", "q_max_drawdown", "q_nelson_aalen", "q_clustering_coeff",
    "q_decision_stump", "q_isotonic", "q_chi2_screen", "q_cuped",
    "q_cumulative_gains",
    # streaming q_stream_eval excluded (cadence-bound, r10 protocol)
    "q_acf", "q_seasonal_decompose", "q_embedding_standardize", "q_flesch",
    "q_wilson", "q_eb_shrink", "q_trimmed_mean",
]


def main() -> None:
    from table_computing_spark.session import get_spark

    spark = get_spark("scaling-audit-r11b")
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
                row[str(s)] = run(name, d)
            except Exception as e:  # noqa: BLE001
                row[str(s)] = None
                row["error"] = repr(e)[:140]
                ok = False
        if ok and row.get("0.1") and row.get("1.0"):
            row["slope"] = round(math.log10(row["1.0"] / row["0.1"]), 3)
        spark.catalog.clearCache()
        out[name] = row
        print(f"{name}: s0.1={row.get('0.1')}s s1={row.get('1.0')}s "
              f"slope={row.get('slope')}", flush=True)
        with open(os.path.join(REPO, ".scale", "audit_r11b.json"), "w") as f:
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
