"""Round-8 scaling re-measure for the three r07 audit caveats (VERDICT
r07 item 5): the r07 table marked jaccard/simhash/semantic as
super-linear, each with a shipped linear-path alternative that could
not be measured doing real work on the closed 31-token corpus. This
script measures the alternatives on corpora where they are exercised:

 (a) `ngram_jaccard_pairs(max_token_df=500)` on the open Zipf/Heaps-law
     corpus (tools/gen_scale_data.py --corpus heaps), where the cap
     prunes only the Zipf head and a long content tail KEEPS matching;
     plus the uncapped run at the two smaller scales for contrast.
 (b) `semantic_dedup(bucket_col=ivf_assign cells)` with the cell count
     scaled with the corpus (k = max(16, n/250)) — the documented fix
     for the fixed-cell alpha~2.
 (c) `ivf_assign` alone (assign-only index maintenance) at s1.

Same timing discipline as tools/scaling_audit.py (noop sink, untimed
small-scale warm-up, log-log fit). Emits markdown + .scale/audit_r08.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time


def _fit(times: "dict[float, float | None]") -> "tuple[float | None, float | None]":
    ok = sorted((s, t) for s, t in times.items() if t)
    if len(ok) < 2:
        return None, None
    xs = [math.log10(s) for s, _ in ok]
    ys = [math.log10(t) for _, t in ok]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    alpha = round(sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 3)
    top = round((ys[-1] - ys[-2]) / (xs[-1] - xs[-2]), 3)
    return alpha, top


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from table_computing_spark.session import get_spark

    spark = get_spark("scaling-audit-r08")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from table_computing_spark.operators import dedup
    from table_computing_spark.operators import similarity as sim

    scales = [0.01, 0.1, 1.0]
    heaps = {s: os.path.join(repo, ".scale", f"heaps_s{s:g}") for s in scales}
    plain = {s: os.path.join(repo, ".scale", f"s{s:g}") for s in scales}

    def jaccard_capped(d):
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        return dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_token_df=500)

    def jaccard_uncapped(d):
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        return dedup.ngram_jaccard_pairs(docs, threshold=0.5)

    def semantic_ivf_cells(d):
        # cells must SCALE IN COUNT with the corpus *and* stay balanced:
        # lowest-id seeds collapse onto the generator's 8 true clusters
        # (occupancy then grows with n and the per-cell epsilon join is
        # quadratic again — measured 63 s at s1 before this fix), so fit
        # real Lloyd centroids, which subdivide dense clusters
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        n = emb.count()
        k = max(16, n // 250)
        cents = sim.ivf_fit(emb, n_centroids=k, iters=2)
        cells = sim.ivf_assign(emb, cents)
        return sim.semantic_dedup(
            emb.join(cells.select("vec_id", "cell"), "vec_id"),
            threshold=0.35,
            bucket_col="cell",
        )

    def assign_only(d):
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        seeds = emb.orderBy("vec_id").limit(64).select("embedding").collect()
        return sim.ivf_assign(emb, [list(r["embedding"]) for r in seeds])

    cases = {
        "jaccard_heaps_capped_df500": (jaccard_capped, heaps, scales),
        # uncapped on the Zipf head is the documented quadratic cliff:
        # contrast at the two smaller scales only (s1 uncapped would
        # join ~1e9 candidate rows by design — the thing the cap fixes)
        "jaccard_heaps_uncapped": (jaccard_uncapped, heaps, [0.01, 0.1]),
        "semantic_dedup_ivf_cells": (semantic_ivf_cells, plain, scales),
        "ivf_assign_only": (assign_only, plain, scales),
    }

    results: "dict[str, dict]" = {}
    for name, (fn, dirs, use_scales) in cases.items():
        try:
            fn(dirs[use_scales[0]]).write.mode("overwrite").format("noop").save()
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001 — timed run reports it
            pass
        times: "dict[float, float | None]" = {}
        for s in use_scales:
            t0 = time.perf_counter()
            try:
                fn(dirs[s]).write.mode("overwrite").format("noop").save()
                times[s] = round(time.perf_counter() - t0, 3)
            except Exception as e:  # noqa: BLE001
                times[s] = None
                print(f"[audit-r08] {name}@{s}: FAILED {type(e).__name__}: {e}"[:200],
                      file=sys.stderr, flush=True)
            spark.catalog.clearCache()
            try:
                for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                    rdd.unpersist()
            except Exception:  # noqa: BLE001
                pass
        alpha, top = _fit(times)
        results[name] = {"times": times, "alpha": alpha, "alpha_top_decade": top}
        print(f"[audit-r08] {name}: {times} alpha={alpha} top={top}",
              file=sys.stderr, flush=True)

    with open(os.path.join(repo, ".scale", "audit_r08.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("| case | t(s0.01) | t(s0.1) | t(s1) | alpha (fit) | alpha (top decade) |")
    print("| --- | --- | --- | --- | --- | --- |")
    for name, r in results.items():
        t = r["times"]
        print(
            f"| {name} | {t.get(0.01)} | {t.get(0.1)} | {t.get(1.0)} "
            f"| {r['alpha']} | {r['alpha_top_decade']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
