"""Exact GLOBAL quantiles by distributed selection — no single-reducer
sort, no full-column state on any one node.

The existing ladder: per-group exact `percentile()` (state bounded by
group size) and mergeable Greenwald-Khanna `percentile_approx` for
scale. This module completes it: EXACT order statistics of a column of
any size, via classic iterative histogram refinement (selection in
rounds):

  round k: one scan computes a B-bucket count histogram of each still-
  open rank need; the bucket containing the rank narrows the candidate
  set by ~B×. After ceil(log_B(distinct)) rounds (2-3 in practice for
  B=8192) the candidate set holds <= `slice_limit` rows; one final scan
  sorts just those rows and reads the exact order statistics.

Float-safety: a need's membership is NEVER an open-coded value-range
filter (float rounding at bucket edges would let the histogram and the
refinement disagree about edge rows). Membership is a conjunction of
clamped bucket-index equalities — the exact expression the histogram
grouped by — so the count bookkeeping is consistent by construction.
The clamp also makes the bucket index a total, monotone function of
the value, which is all selection needs.

Driver traffic per round: B longs per open need. Scan work per round:
one full pass with pure-codegen bucket arithmetic — the cost profile
of an ordinary aggregate, repeated 3-4 times. Nothing is globally
sorted; no executor ever holds more than `slice_limit` values.

Quantile positions use the linear-interpolation convention shared by
Spark `percentile()` and DuckDB `quantile_cont`: pos = q*(n-1);
result = v[floor(pos)] + frac*(v[floor(pos)+1] - v[floor(pos)]).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_expr(lo: float, width: float, buckets: int) -> Column:
    raw = F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("int")
    return F.greatest(F.lit(0), F.least(raw, F.lit(buckets - 1)))


def _member_expr(chain: "list[tuple[float, float, int]]", buckets: int) -> Column:
    cond = F.lit(True)
    for lo, width, bi in chain:
        cond = cond & (_bucket_expr(lo, width, buckets) == bi)
    return cond


def _order_stats(
    vals: DataFrame,
    ks: "list[int]",
    buckets: int,
    slice_limit: int,
    max_rounds: int,
) -> "dict[int, float]":
    """Exact 0-indexed order statistics of the sorted `vals.v`.
    State per rank: (chain of bucket picks, ranks below the set)."""
    row = vals.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).first()
    lo0, hi0 = float(row["lo"]), float(row["hi"])
    needs: "dict[int, tuple[tuple, int]]" = {k: ((), 0) for k in ks}
    out: "dict[int, float]" = {}
    width0 = hi0 - lo0
    if width0 == 0.0:
        return {k: lo0 for k in ks}
    roots = {(): (lo0, width0)}  # chain -> (interval lo, interval width)

    for _ in range(max_rounds):
        open_by_chain: "dict[tuple, list[int]]" = {}
        for k, (chain, _off) in needs.items():
            if k not in out:
                open_by_chain.setdefault(chain, []).append(k)
        if not open_by_chain:
            return out
        for chain, kk in open_by_chain.items():
            off = needs[kk[0]][1]
            member = _member_expr(list(chain), buckets)
            sub = vals.where(member)
            stats = sub.agg(
                F.count("v").alias("c"),
                F.min("v").alias("mn"),
                F.max("v").alias("mx"),
            ).first()
            cnt, mn, mx = stats["c"], stats["mn"], stats["mx"]
            if mn == mx:
                for k in kk:
                    out[k] = float(mn)
                continue
            if cnt <= slice_limit:
                slice_vals = [r["v"] for r in sub.orderBy("v").collect()]
                for k in kk:
                    out[k] = slice_vals[k - off]
                continue
            lo, width = roots[chain]
            bw = width / buckets
            bexpr = _bucket_expr(lo, bw, buckets)
            hist = {
                r["b"]: r["c"]
                for r in sub.groupBy(bexpr.alias("b"))
                .agg(F.count(F.lit(1)).alias("c"))
                .collect()
            }
            cums, cum = [], 0
            for i in range(buckets):
                cums.append(cum)
                cum += hist.get(i, 0)
            for k in kk:
                rank_in = k - off
                bi = 0
                for i in range(buckets):
                    if hist.get(i, 0) and cums[i] <= rank_in:
                        bi = i
                nchain = chain + ((lo, bw, bi),)
                roots[nchain] = (lo + bi * bw, bw)
                needs[k] = (nchain, off + cums[bi])
    missing = [k for k in ks if k not in out]
    if missing:
        raise RuntimeError(f"selection did not converge for ranks {missing}")
    return out


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: Sequence[float],
    buckets: int = 8192,
    slice_limit: int = 65536,
    max_rounds: int = 12,
) -> DataFrame:
    """Exact global quantiles of `df[col]` (nulls dropped) as (q,
    value) rows with quantile_cont interpolation. Exact because the
    answer is always read from actual data values in a final sorted
    slice, never from a bucket midpoint."""
    qs = list(qs)
    vals = df.select(F.col(col).cast("double").alias("v")).where(
        F.col("v").isNotNull()
    )
    # the candidate-set scans re-read this subtree once per round —
    # pin it so an expensive upstream runs once
    vals = vals.localCheckpoint(eager=False)
    n = vals.count()
    spark = df.sparkSession
    if n == 0:
        return spark.createDataFrame(
            [(float(q), None) for q in qs], "q double, value double"
        )
    ks: "set[int]" = set()
    pos = {}
    for q in qs:
        p = q * (n - 1)
        lo = int(math.floor(p))
        pos[q] = (lo, p - lo)
        ks.add(lo)
        if p - lo > 0:
            ks.add(lo + 1)
    stats = _order_stats(vals, sorted(ks), buckets, slice_limit, max_rounds)
    rows = []
    for q in qs:
        lo, frac = pos[q]
        v = stats[lo] if frac == 0 else stats[lo] + frac * (stats[lo + 1] - stats[lo])
        rows.append((float(q), float(v)))
    return spark.createDataFrame(rows, "q double, value double")
