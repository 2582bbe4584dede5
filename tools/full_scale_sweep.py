"""Full-surface scale sweep: every BATCH query at s0.1 and s1.

The per-family audits (scaling_audit.py, _r08) fit slopes for the
21-query cost board; this sweep closes the coverage gap by timing the
ENTIRE batch surface at two scales (one decade apart) and reporting
the decade ratio per query — any query whose documented shape is
(sub-)linear should land well under 10×. Dimension tables now ship in
the scale family (gen_scale_data.gen_dims), so the TPC-H shapes run
too.

Caveats recorded, not hidden: the synthetic family's value
distributions differ from the driver data (e.g. o_orderpriority has
'5-NONE', not '5-LOW'), so a few predicate-heavy queries process
realistic volume but emit few/zero rows — timing is still the scan +
shuffle cost, which is what the sweep measures. Streaming queries are
excluded (micro-batch replay time is dominated by trigger cadence,
not data volume).

Usage: python tools/full_scale_sweep.py  → markdown + .scale/sweep.json
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

    spark = get_spark("full-scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = {
        n: f
        for n, f in entry.queries().items()
        if not n.startswith(("q_stream", "q_streaming"))
    }
    dirs = {s: os.path.join(repo, ".scale", f"s{s:g}") for s in (0.1, 1.0)}
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results: "dict[str, dict]" = {}
    for i, (name, fn) in enumerate(sorted(qs.items())):
        rec: "dict[str, float | str | None]" = {}
        for s, d in dirs.items():
            t0 = time.perf_counter()
            try:
                fn(spark, d).write.mode("overwrite").format("noop").save()
                rec[f"t{s:g}"] = round(time.perf_counter() - t0, 2)
            except Exception as e:  # noqa: BLE001 — record, keep sweeping
                rec[f"t{s:g}"] = None
                rec["err"] = f"{type(e).__name__}: {e}"[:160]
            spark.catalog.clearCache()
            try:
                for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                    rdd.unpersist()
            except Exception:  # noqa: BLE001
                pass
        t1, t10 = rec.get("t0.1"), rec.get("t1")
        rec["ratio"] = round(t10 / t1, 2) if t1 and t10 else None
        results[name] = rec
        print(f"[sweep {i + 1}/{len(qs)}] {name}: {rec}", file=sys.stderr, flush=True)

    with open(os.path.join(repo, ".scale", "sweep.json"), "w") as f:
        json.dump(results, f, indent=1)
    ok = {n: r for n, r in results.items() if r["ratio"] is not None}
    worst = sorted(ok.items(), key=lambda kv: -kv[1]["ratio"])[:15]
    print("| query | t(s0.1) | t(s1) | decade ratio |")
    print("| --- | --- | --- | --- |")
    for n, r in worst:
        print(f"| {n} | {r['t0.1']} | {r['t1']} | {r['ratio']} |")
    fails = {n: r.get("err") for n, r in results.items() if r.get("err")}
    print(f"\nswept {len(results)} queries; {len(fails)} failures: {fails}")
    import statistics

    print("median decade ratio:", round(statistics.median(r["ratio"] for r in ok.values()), 2))
    spark.stop()


if __name__ == "__main__":
    main()
