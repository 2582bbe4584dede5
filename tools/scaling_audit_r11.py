#!/usr/bin/env python
"""Round-11 scaling-exponent audit (r10 verdict task 7): extend the
fitted log-log slope tables (PLANS.md r07/r08) to every family added
in r09–r11, re-measuring the original cost board in the same run so
all slopes share one host window.

Method (identical to tools/scaling_audit.py): each query runs at the
self-consistent .scale/s0.1 and .scale/s1 corpora (10× per decade,
driver-shaped schemas) through the noop sink, after an untimed warm-up;
slope = log10(t1/t0.1). Streaming queries are excluded (cadence-bound —
their wall time measures trigger scheduling, BASELINE.md r10 protocol).

Special case: q_grid_dbscan runs through `eps="auto"` (the r11
dbscan_eps_estimate advisor) instead of its fixed semantic eps=5000 —
the fixed value on the densifying s1 cloud grows the eps-graph ~N²
(adjudicated OOM, PLANS.md r10); auto applies the 1/sqrt(density)
sizing the adjudication prescribes, which doubles as the verdict-task-5
two-scale sweep row.

Emits .scale/audit_r11.json + a markdown table on stdout for PLANS.md.
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCALES = {0.1: os.path.join(REPO, ".scale", "s0.1"),
          1.0: os.path.join(REPO, ".scale", "s1")}

COST_BOARD = [
    "q_dedup_exact", "q_dedup_jaccard", "q_containment_pairs",
    "q_minhash_lsh", "q_simhash_pairs", "q_semantic_dedup",
    "q_dedup_groups", "q_ivf_topk", "q_lsh_bucketed_topk",
    "q_rolling_corr", "q_exact_global_quantiles", "q_kn_bigram_nll",
    "q_bpe_merges", "q_groupby_agg", "q_window_tumble",
]


def _families() -> "dict[str, str]":
    """Query -> round tag, from the '(New rNN.)' docstring markers."""
    src = open(os.path.join(REPO, "__spark_entry__.py")).read()
    blocks = re.split(r"\ndef (q_\w+)\(spark, sf_dir\):", src)
    tags: dict[str, str] = {}
    for i in range(1, len(blocks), 2):
        m = re.search(r"\(New (r\d+)[^)]*\)", blocks[i + 1][:2000])
        if m:
            tags[blocks[i]] = m.group(1)
    return tags


def main() -> None:
    from pyspark.sql import functions as F

    from table_computing_spark.session import get_spark

    spark = get_spark("scaling-audit-r11")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    import __spark_entry__ as entry

    qs = entry.queries()
    tags = _families()
    names = list(dict.fromkeys(
        COST_BOARD
        + sorted(n for n, t in tags.items() if t in ("r09", "r10", "r11"))
    ))
    names = [n for n in names if not n.startswith(("q_stream", "q_streaming"))]

    def run(name: str, sf_dir: str) -> "float | None":
        t0 = time.perf_counter()
        if name == "q_grid_dbscan":
            from table_computing_spark.operators.spatial import grid_dbscan

            pts = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).select(
                F.col("c_custkey").alias("id"),
                ((F.col("c_custkey") * 7919) % 100000).alias("x"),
                ((F.col("c_custkey") * 104729) % 100000).alias("y"),
            )
            grid_dbscan(pts, "id", "x", "y", eps="auto", min_pts=8).write.mode(
                "overwrite").format("noop").save()
        else:
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 2)

    # untimed warm-up of the whole surface at the small scale
    out: dict = {}
    for name in names:
        row: dict = {"round": tags.get(name, "board")}
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
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
        except Exception:  # noqa: BLE001
            pass
        out[name] = row
        print(f"{name}: s0.1={row.get('0.1')}s s1={row.get('1.0')}s "
              f"slope={row.get('slope')}", flush=True)
        with open(os.path.join(REPO, ".scale", "audit_r11.json"), "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
    spark.stop()

    print("\n| query | round | t(s0.1) | t(s1) | slope (top decade) |")
    print("| --- | --- | --- | --- | --- |")
    for name, row in sorted(out.items(), key=lambda kv: -(kv[1].get("slope") or -9)):
        mark = "⚠ " if (row.get("slope") or 0) > 1.1 else ""
        print(f"| {name} | {row['round']} | {row.get('0.1')} | {row.get('1.0')} "
              f"| {mark}{row.get('slope')} |")


if __name__ == "__main__":
    main()
