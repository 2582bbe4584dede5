"""Round-9 scaling re-measures for the r08 verdict tasks 2 and 4.

 (2) `semantic_dedup` now defaults to the measured-linear path
     (`bucket_col="auto"` → internal `ivf_fit` Lloyd cells at
     n_cells ≈ √N past `auto_min_rows`). Re-measure the r08 audit row
     THROUGH THE DEFAULT ENTRY POINT — done-bar: top-decade alpha
     ≤ ~0.9. Also time the Lloyd branch forced at every scale
     (auto_min_rows=0) for a clean same-path fit.

 (4) `cosine_pairs(bits="auto")` and `simhash_pairs(chunk_bits="auto")`
     got the occupancy-scaled bucket rules. Record the sweep rows the
     verdict asked for: resolved parameter + mean/max bucket occupancy
     across s0.1 → s1 — occupancy must stay ~flat for cosine auto-bits
     (bucket count grows with N) and far below the 16→32-bit switch
     threshold for simhash at these corpus sizes (the rule's switch
     point is also recorded analytically).

Same timing discipline as tools/scaling_audit_r08.py (noop sink,
untimed warm-up, log-log fit). Emits markdown + .scale/audit_r09.json.
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
    from pyspark.sql import functions as F

    from table_computing_spark.session import get_spark

    spark = get_spark("scaling-audit-r09")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from table_computing_spark.operators import dedup
    from table_computing_spark.operators import similarity as sim

    scales = [0.01, 0.1, 1.0]
    plain = {s: os.path.join(repo, ".scale", f"s{s:g}") for s in scales}
    heaps = {s: os.path.join(repo, ".scale", f"heaps_s{s:g}") for s in scales}

    results: "dict[str, dict]" = {}

    # ---- (2) semantic_dedup through the DEFAULT entry point -------------
    def semantic_default(d):
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        return sim.semantic_dedup(emb, threshold=0.35)

    def semantic_forced_lloyd(d):
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        return sim.semantic_dedup(emb, threshold=0.35, auto_min_rows=0)

    for name, fn, use_scales in (
        ("semantic_dedup_DEFAULT", semantic_default, scales),
        ("semantic_dedup_forced_lloyd", semantic_forced_lloyd, [0.1, 1.0]),
    ):
        try:
            fn(plain[use_scales[0]]).write.mode("overwrite").format("noop").save()
        except Exception:  # noqa: BLE001
            pass
        times: "dict[float, float | None]" = {}
        for s in use_scales:
            t0 = time.perf_counter()
            try:
                fn(plain[s]).write.mode("overwrite").format("noop").save()
                times[s] = round(time.perf_counter() - t0, 3)
            except Exception as e:  # noqa: BLE001
                times[s] = None
                print(f"[audit-r09] {name}@{s}: FAILED {e}"[:200], file=sys.stderr)
            spark.catalog.clearCache()
        alpha, top = _fit(times)
        results[name] = {"times": times, "alpha": alpha, "top_decade": top}
        print(name, times, "alpha", alpha, "top", top, flush=True)

    # ---- (4a) cosine_pairs auto-bits occupancy + timing ------------------
    for s in (0.1, 1.0):
        emb = spark.read.parquet(os.path.join(plain[s], "embeddings.parquet"))
        n = emb.count()
        dim = emb.select(F.size("embedding")).first()[0]
        bits = max(4, min(dim, math.ceil(math.log2(max(n / 256, 2)))))
        occ = (
            emb.select(sim.sign_bucket(F.col("embedding"), bits).alias("b"))
            .groupBy("b").count()
            .agg(F.avg("count").alias("avg"), F.max("count").alias("max"),
                 F.count(F.lit(1)).alias("n_buckets"))
            .first()
        )
        t0 = time.perf_counter()
        sim.cosine_pairs(emb, threshold=0.9, broadcast_limit=0).write.mode(
            "overwrite"
        ).format("noop").save()
        dt = round(time.perf_counter() - t0, 3)
        results[f"cosine_pairs_auto@s{s:g}"] = {
            "n": n, "auto_bits": bits, "avg_occupancy": round(occ["avg"], 1),
            "max_occupancy": occ["max"], "n_buckets": occ["n_buckets"],
            "time_s": dt,
        }
        print(f"cosine_pairs_auto@s{s:g}", results[f"cosine_pairs_auto@s{s:g}"],
              flush=True)

    # ---- (4b) simhash auto chunk layout occupancy -------------------------
    for s in (0.1, 1.0):
        docs = spark.read.parquet(os.path.join(heaps[s], "documents.parquet"))
        n = docs.count()
        chunk_bits = 32 if n > 4 * 65536 else 16
        n_chunks = 64 // chunk_bits
        fps = dedup.simhash(docs)
        cmask = (1 << chunk_bits) - 1
        chunks = fps.select(
            F.explode(F.array(*[
                F.struct(
                    F.lit(i).alias("chunk"),
                    F.shiftright("simhash", i * chunk_bits)
                    .bitwiseAND(F.lit(cmask)).alias("val"),
                )
                for i in range(n_chunks)
            ])).alias("c")
        ).select("c.chunk", "c.val")
        occ = (
            chunks.groupBy("chunk", "val").count()
            .agg(F.avg("count").alias("avg"), F.max("count").alias("max"))
            .first()
        )
        results[f"simhash_auto@heaps_s{s:g}"] = {
            "n_docs": n, "auto_chunk_bits": chunk_bits,
            "avg_occupancy": round(occ["avg"], 2), "max_occupancy": occ["max"],
            "switch_point_docs": 4 * 65536,
        }
        print(f"simhash_auto@heaps_s{s:g}",
              results[f"simhash_auto@heaps_s{s:g}"], flush=True)

    out = os.path.join(repo, ".scale", "audit_r09.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
