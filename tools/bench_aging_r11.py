#!/usr/bin/env python
"""Same-session A/B for the r10→r10-driver bench inflation (r10 verdict
task 3): every plan fingerprint was unchanged, yet warm-vs-warm medians
drifted 1.27x (worst 1.76x) between captures on the same boot. The two
candidate mechanisms are (a) host variance and (b) ACCUMULATED-SESSION
state — heap growth, GC pressure, codegen/broadcast caches — across a
289-query run with warm reps.

This script isolates (b) with one run, three measurements of the SAME
panel on the SAME host back-to-back:

  fresh   — new JVM, standard bench warmup, panel (cold + warm reps)
  aged    — same JVM after ~N_FILLER untimed cold passes of OTHER
            queries (bench-identical hygiene: clearCache + RDD
            unpersist between queries)
  fresh2  — JVM restarted, warmup, panel again (controls host drift
            WITHIN the experiment: if fresh2 ≈ fresh but aged ≫ fresh,
            the inflation is session state, not the host)

Writes .scale/aging_ab_r11.json with per-query warm times and the
aged/fresh + fresh2/fresh ratio medians. Run with nothing else on the
box (the bench concurrency rule)."""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_PANEL = 12
N_FILLER = 150


def _new_session(tag: str):
    from table_computing_spark.session import get_spark

    spark = get_spark(f"tc-aging-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    # the bench warmup: JVM codegen, a shuffle join, the Arrow worker
    # pool, and one touch of every table (page cache is shared across
    # JVM restarts, so fresh2 sees the same cache state as aged)
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    warm.join(warm.selectExpr("r_regionkey as k"), warm.r_regionkey == F.col("k")).groupBy(
        "r_name"
    ).count().write.mode("overwrite").format("noop").save()

    # lambda form: the decorator's type-hint inference rejects
    # stringified hints under `from __future__ import annotations`
    _w = pandas_udf(lambda s: s, "long")
    spark.range(1000).select(_w("id")).write.mode("overwrite").format("noop").save()
    from table_computing_spark.sources.parquet import TABLES, load_df

    for t in TABLES:
        load_df(spark, SF_DIR, t).write.mode("overwrite").format("noop").save()
    return spark


def _hygiene(spark) -> None:
    spark.catalog.clearCache()
    try:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    except Exception:  # noqa: BLE001
        pass


def _run(spark, fn) -> float:
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def _panel_pass(spark, qs, panel) -> "dict[str, dict[str, float]]":
    out = {}
    for name in panel:
        cold = _run(spark, qs[name])
        _hygiene(spark)
        wrm = _run(spark, qs[name])
        _hygiene(spark)
        out[name] = {"cold": cold, "warm": wrm}
        print(f"  {name}: cold {cold}s warm {wrm}s", flush=True)
    return out


def main() -> None:
    import __spark_entry__ as entry

    qs = entry.queries()
    with open(os.path.join(ROOT, "BENCH_LOCAL.json")) as f:
        bench = json.load(f)
    # panel: heaviest warm-rep queries (the warm-vs-warm grading set),
    # non-streaming, q_minhash_accuracy pinned (the r10 inversion row)
    warm_rows = {
        k: bench["queries"].get(k, 0.0)
        for k in bench.get("warm", {})
        if not k.startswith(("q_stream", "q_streaming"))
    }
    panel = sorted(warm_rows, key=warm_rows.get, reverse=True)[:N_PANEL]
    if "q_minhash_accuracy" in warm_rows and "q_minhash_accuracy" not in panel:
        panel[-1] = "q_minhash_accuracy"
    filler = [
        n for n in qs
        if n not in panel and not n.startswith(("q_stream", "q_streaming"))
    ][:N_FILLER]
    print(f"panel ({len(panel)}): {panel}", flush=True)
    print(f"filler: {len(filler)} queries", flush=True)

    spark = _new_session("fresh")
    print("== fresh ==", flush=True)
    fresh = _panel_pass(spark, qs, panel)

    print(f"== aging: {len(filler)} filler cold passes ==", flush=True)
    t0 = time.perf_counter()
    for name in filler:
        try:
            _run(spark, qs[name])
        except Exception as e:  # noqa: BLE001 — filler is load, not a gate
            print(f"  filler {name} failed: {e}"[:120], flush=True)
        _hygiene(spark)
    filler_sec = round(time.perf_counter() - t0, 1)
    print(f"  filler took {filler_sec}s", flush=True)

    print("== aged (same JVM) ==", flush=True)
    aged = _panel_pass(spark, qs, panel)
    spark.stop()

    spark = _new_session("fresh2")
    print("== fresh2 (restarted JVM) ==", flush=True)
    fresh2 = _panel_pass(spark, qs, panel)
    spark.stop()

    def med(xs):
        xs = sorted(xs)
        return round(xs[len(xs) // 2], 3)

    ratios_aged = [aged[n]["warm"] / fresh[n]["warm"] for n in panel]
    ratios_f2 = [fresh2[n]["warm"] / fresh[n]["warm"] for n in panel]
    out = {
        "sf_dir": SF_DIR,
        "panel": panel,
        "n_filler": len(filler),
        "filler_sec": filler_sec,
        "fresh": fresh,
        "aged": aged,
        "fresh2": fresh2,
        "median_aged_over_fresh_warm": med(ratios_aged),
        "median_fresh2_over_fresh_warm": med(ratios_f2),
        "per_query_aged_ratio": {
            n: round(aged[n]["warm"] / fresh[n]["warm"], 3) for n in panel
        },
    }
    os.makedirs(os.path.join(ROOT, ".scale"), exist_ok=True)
    with open(os.path.join(ROOT, ".scale", "aging_ab_r11.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: out[k] for k in (
        "median_aged_over_fresh_warm", "median_fresh2_over_fresh_warm",
        "per_query_aged_ratio")}, indent=1), flush=True)


if __name__ == "__main__":
    main()
