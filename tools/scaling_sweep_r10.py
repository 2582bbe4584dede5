"""Round-10 two-scale sweep: the 13 new batch queries at s0.1 → s1,
plus the spatial-family DEFAULT-config rows the r09 verdict task 8
asked for (grid_knn_join(cell_size="auto") and grid_radius_join as a
user would call them — not the pinned oracle configs), with decade
ratios normalized per unit of work (the query side scales 10× with
the corpus, so per-query ratios are total/10).

Same timing discipline as tools/scaling_audit_r09.py: noop sink,
untimed JVM/scan warm-up, one measurement per (query, scale). Emits
.scale/sweep_r10.json.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from table_computing_spark.session import get_spark

    spark = get_spark("scaling-sweep-r10")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    import __spark_entry__ as entry

    scales = {0.1: os.path.join(repo, ".scale", "s0.1"),
              1.0: os.path.join(repo, ".scale", "s1")}
    new_queries = [
        "q_item_cf", "q_link_prediction", "q_sssp_weighted",
        "q_kaplan_meier", "q_forecast_eval", "q_conformal", "q_did",
        "q_js_divergence", "q_binpack_files", "q_phrase_search",
        "q_rake_keywords", "q_window_kmv", "q_grid_dbscan",
    ]

    def run(fn, sf_dir: str) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = round(time.perf_counter() - t0, 2)
        spark.catalog.clearCache()
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
        except Exception:  # noqa: BLE001
            pass
        return dt

    path = os.path.join(repo, ".scale", "sweep_r10.json")

    def flush(out: dict) -> None:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")

    out: dict = {}
    for name in new_queries:
        fn = getattr(entry, name)
        row: dict = {}
        ok = True
        for s, d in scales.items():
            if name == "q_grid_dbscan":
                # fixed eps on a densifying fixed-extent cloud grows the
                # eps-graph ~quadratically (the first r10 sweep attempt
                # OOM'd at s1 on eps=5000 — adjudicated in PLANS.md).
                # The per-unit-of-work row holds avg neighborhood size
                # constant: eps ∝ 1/sqrt(N) (s0.1 keeps the query's 5000)
                from table_computing_spark.operators.spatial import grid_dbscan

                eps = 5000 if s == 0.1 else 1581
                pts = spark.read.parquet(os.path.join(d, "customer.parquet"))
                from pyspark.sql import functions as FF
                pts = pts.select(
                    FF.col("c_custkey").alias("id"),
                    ((FF.col("c_custkey") * 7919) % 100000).alias("x"),
                    ((FF.col("c_custkey") * 104729) % 100000).alias("y"),
                )
                t0 = time.perf_counter()
                try:
                    grid_dbscan(pts, "id", "x", "y", eps=eps, min_pts=8).write.mode(
                        "overwrite").format("noop").save()
                    row[str(s)] = round(time.perf_counter() - t0, 2)
                    row[f"eps_{s:g}"] = eps
                except Exception as e:  # noqa: BLE001
                    row[str(s)] = None
                    row["error"] = repr(e)[:120]
                    ok = False
                row["note"] = ("density-scaled eps (constant avg neighborhood) "
                               "— fixed eps=5000 at s1 OOMs on the ~N^2 "
                               "densified eps-graph, see PLANS.md r10")
                print(f"{name} @ s{s:g} (eps={eps}): {row[str(s)]}s", flush=True)
                continue
            try:
                row[str(s)] = run(fn, d)
            except Exception as e:  # noqa: BLE001
                row[str(s)] = None
                row["error"] = repr(e)[:120]
                ok = False
            print(f"{name} @ s{s:g}: {row[str(s)]}s", flush=True)
        if ok and row.get("0.1"):
            row["decade_ratio"] = round(row["1.0"] / row["0.1"], 2)
        out[name] = row
        flush(out)

    # --- spatial DEFAULT-config rows (r09 verdict task 8) -------------
    # grid_knn_join(cell_size="auto", queries=ALL points): work units =
    # N queries, so the per-unit ratio is decade_ratio / 10.
    from pyspark.sql import functions as F

    from table_computing_spark.operators.spatial import (
        grid_knn_join, grid_radius_join,
    )

    def pts(sf_dir):
        c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
        return c.select(
            F.col("c_custkey").alias("id"),
            ((F.col("c_custkey") * 7919) % 100000).alias("x"),
            ((F.col("c_custkey") * 104729) % 100000).alias("y"),
        )

    knn = {}
    for s, d in scales.items():
        t0 = time.perf_counter()
        grid_knn_join(pts(d), "id", "x", "y", k=5).write.mode(
            "overwrite"
        ).format("noop").save()
        knn[str(s)] = round(time.perf_counter() - t0, 2)
        print(f"grid_knn_join(auto, all-queries) @ s{s:g}: {knn[str(s)]}s",
              flush=True)
    knn["decade_ratio"] = round(knn["1.0"] / knn["0.1"], 2)
    knn["per_query_ratio"] = round(knn["decade_ratio"] / 10.0, 2)
    knn["note"] = ("DEFAULT config; queries scale 10x with the corpus, so "
                   "per-unit-of-work ratio = decade_ratio / 10")
    out["grid_knn_join_default"] = knn

    rad = {}
    for s, d in scales.items():
        t0 = time.perf_counter()
        n_pairs = grid_radius_join(pts(d), "id", "x", "y", radius=1000).count()
        rad[str(s)] = round(time.perf_counter() - t0, 2)
        rad[f"pairs_{s:g}"] = n_pairs
        print(f"grid_radius_join(r=1000) @ s{s:g}: {rad[str(s)]}s "
              f"({n_pairs} pairs)", flush=True)
    rad["decade_ratio"] = round(rad["1.0"] / rad["0.1"], 2)
    rad["pairs_ratio"] = round(rad["pairs_1"] / max(1, rad["pairs_0.1"]), 2)
    rad["note"] = ("DEFAULT config on the FIXED 100k grid extent: 10x points "
                   "= 10x density, so true pair OUTPUT grows ~100x — the "
                   "honest per-unit read is time_ratio vs pairs_ratio")
    out["grid_radius_join_default"] = rad

    flush(out)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
