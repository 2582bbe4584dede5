"""KMV (k-minimum-values) sketches — mergeable distinct-count AND
set-operation estimates from one tiny deterministic state per group
(Bar-Yossef et al. 2002; the Theta-sketch family's core idea, public).

Where the engine's other sketches stop: bitmaps are exact but
id-domain-sized, HLL estimates |A| but cannot estimate |A ∩ B|.
A KMV sketch — the k smallest md5 hash values of a set — supports
union (merge + trim), intersection (inclusion over the union's k-th
minimum), and Jaccard, all from k longs per group.

Determinism is the oracle story: md5 is the repo-wide portable hash,
so the sketch CONTENT (not just its estimate) is a pure function of
the data — DuckDB reproduces the exact same k values, making even the
estimates hash-comparable across engines.

    hash h(v)  = first 15 hex chars of md5(v) as a 60-bit int
    sketch(A)  = k smallest distinct h(v), v ∈ A
    |A|        ≈ (k−1) · 2^60 / h_(k)          (k-th minimum)
    |A ∩ B|    ≈ ρ · |A ∪ B|, ρ = |sketch(A) ∩ sketch(B) ∩ U_k| / k
                 with U_k = the k smallest of sketch(A) ∪ sketch(B)

Shape: distinct (group, hash) pairs → a SALTED two-stage k-min trim:
stage 1 trims per (group, hash mod n_cells) cell (collect_set state =
the cell's distinct hashes, 1/n_cells of the group), stage 2 merges
≤ n_cells·k candidates per group to the final k. No stage ever holds
a group's full distinct set in one aggregation buffer; n_cells="auto"
(default) sizes the salt from a cheap approx distinct-count estimate
so the per-cell buffer stays bounded at any cardinality."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPACE = float(1 << 60)


def _h60(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


# per-cell distinct-hash budget: ~4.2M longs ≈ 34 MB of aggregation
# buffer — the bound "auto" sizes the salt against
_CELL_BUDGET = 1 << 22


def kmv_sketch(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    k: int = 256,
    n_cells: "int | str" = "auto",
) -> DataFrame:
    """(keys..., kmv array<long>): the k smallest distinct 60-bit
    hashes of `col` per group. Deterministic; mergeable with
    kmv_merge. The sketch CONTENT is invariant to `n_cells` (the
    k-min of a set does not depend on how the set was partitioned) —
    pinned by tests/test_r09_ops.py::test_kmv_sketch_ncells_invariant.

    n_cells="auto" (default — r09 verdict task 3): a FIXED salt of 256
    cells bounds the per-cell collect_set buffer at 1/256th of the
    largest group's distinct set — ~300 MB in one buffer at 10^10
    distinct values. auto pre-estimates the global distinct count with
    one approx_count_distinct aggregate (map-side combined, one cheap
    extra job) and sizes the salt so a cell holds <= ~4M hashes
    (34 MB) even if one group owns every value; floors at 256."""
    keys = list(keys)
    if n_cells == "auto":
        est = df.agg(
            F.approx_count_distinct(F.col(col)).alias("d")
        ).first()["d"] or 0
        n_cells = 256
        while n_cells < (1 << 20) and est > _CELL_BUDGET * n_cells:
            n_cells *= 2
    # no .distinct() here: the per-cell collect_set dedups at exactly
    # the same (keys, hash) granularity with map-side partials — a
    # distinct would add a whole extra Exchange over the widest frame
    hashed = df.select(*keys, _h60(F.col(col)).alias("__h"))
    cells = hashed.groupBy(
        *keys, F.pmod("__h", F.lit(int(n_cells))).alias("__cell")
    ).agg(
        F.slice(F.sort_array(F.collect_set("__h")), 1, k).alias("__part")
    )
    return (
        cells.select(*keys, F.explode("__part").alias("__h"))
        .groupBy(*keys)
        .agg(F.slice(F.sort_array(F.collect_set("__h")), 1, k).alias("kmv"))
    )


def kmv_merge(a: DataFrame, b: DataFrame, keys: Sequence[str], k: int = 256) -> DataFrame:
    """Union-merge two sketch tables on keys: concat, trim to the k
    smallest — the sketch of the UNION of the underlying sets. No
    .distinct() on the exploded hashes: collect_set dedups at the
    same (keys, hash) granularity, so a distinct would only add an
    extra Exchange over the widest frame (r09 verdict finding #1;
    plan-gated to exactly one Exchange in
    tests/test_r09_ops.py::test_kmv_merge_single_exchange)."""
    keys = list(keys)
    u = a.select(*keys, "kmv").unionByName(b.select(*keys, "kmv"))
    return (
        u.select(*keys, F.explode("kmv").alias("__h"))
        .groupBy(*keys)
        .agg(F.slice(F.sort_array(F.collect_set("__h")), 1, k).alias("kmv"))
    )


def kmv_estimate(state: DataFrame, keys: Sequence[str], k: int = 256) -> DataFrame:
    """(keys..., n_est): distinct-count estimate. Exact (the sketch IS
    the distinct set) whenever the group holds fewer than k distinct
    values; (k−1)·2^60/h_(k) otherwise."""
    keys = list(keys)
    n = F.size("kmv")
    kth = F.element_at("kmv", k).cast("double")
    return state.select(
        *keys,
        F.when(n < k, n.cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(_SPACE) / kth)
        .alias("n_est"),
    )


def kmv_set_ops(
    a: DataFrame,
    b: DataFrame,
    keys: Sequence[str],
    k: int = 256,
    round_to: int = 4,
) -> DataFrame:
    """Per-key set-op estimates between two sketch tables:
    (keys..., union_est, intersect_est, jaccard_est). All arithmetic
    is a fixed-order expression over the two sorted arrays, so the
    estimates are engine-exact given the (deterministic) sketches."""
    keys = list(keys)
    j = (
        a.select(*keys, F.col("kmv").alias("__ka"))
        .join(b.select(*keys, F.col("kmv").alias("__kb")), keys)
    )
    uk = F.slice(
        F.array_sort(F.array_distinct(F.concat("__ka", "__kb"))), 1, k
    )
    j = j.withColumn("__u", uk)
    nu = F.size("__u")
    kth = F.element_at("__u", k).cast("double")
    union_est = F.when(nu < k, nu.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(_SPACE) / kth
    )
    inter_in_u = F.size(
        F.array_intersect(F.array_intersect("__ka", "__kb"), F.col("__u"))
    )
    rho = inter_in_u.cast("double") / F.least(nu, F.lit(k)).cast("double")
    return j.select(
        *keys,
        F.round(union_est, round_to).alias("union_est"),
        F.round(rho * union_est, round_to).alias("intersect_est"),
        F.round(rho, round_to).alias("jaccard_est"),
    )


def kmv_rollup(
    state: DataFrame, to_keys: Sequence[str], k: int = 256
) -> DataFrame:
    """Re-aggregate sketches to a COARSER grain: build once at the
    finest grain, answer every rollup from the state — the bitmap
    family's rollup_distinct contract for KMV. Because the k-min trim
    is associative and the hashes are a pure function of the values,
    the rolled-up sketch equals the direct sketch of the coarser
    grouping BIT-FOR-BIT (pinned in tests). One explode + one hash
    aggregate keyed by the coarser keys."""
    to_keys = list(to_keys)
    return (
        state.select(*to_keys, F.explode("kmv").alias("__h"))
        .groupBy(*to_keys)
        .agg(F.slice(F.sort_array(F.collect_set("__h")), 1, k).alias("kmv"))
    )
