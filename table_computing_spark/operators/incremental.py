"""Incremental materialized-aggregate maintenance (delta-only view
refresh).

A 100 TB pipeline cannot recompute `GROUP BY` summaries from scratch
every ingest cycle; it maintains them from the change stream. For the
self-maintainable aggregates (COUNT, SUM — and AVG as SUM/COUNT) the
classic result (Gupta & Mumick, "Maintenance of Materialized Views")
is that the new state is a pure function of (old state, insert delta,
delete delta): aggregate the deltas with signs, merge by key, drop
groups whose count reaches zero. MIN/MAX are NOT self-maintainable
under deletes (a deleted minimum needs the base data to find the next
one) — this module deliberately exposes only the self-maintainable
set; pair it with cdc.snapshot_diff to turn daily snapshots into the
insert/delete deltas.

Scale shape: both deltas aggregate map-side down to their own group
counts before any shuffle; the merge is one groupBy over
|state| + |delta groups| rows — the base FACT table is never
rescanned, which is the entire point. Write the state through
sources/bucketed on the group key and the merge groupBy is
Exchange-free on the state side.

Engine-exactness: counts are longs; sums should be handed in as
DECIMAL expressions (repo-wide discipline) so merge order cannot
change a bit.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def agg_state(
    facts: DataFrame,
    keys: Sequence[str],
    measures: Mapping[str, Column],
    cnt_col: str = "cnt",
) -> DataFrame:
    """Materialize the aggregate state: one row per key group with a
    row count plus SUM(expr) per measure. `measures` maps output
    column name -> expression over fact rows (use DECIMAL casts for
    float inputs)."""
    aggs = [F.count(F.lit(1)).alias(cnt_col)] + [
        F.sum(expr).alias(name) for name, expr in measures.items()
    ]
    return facts.groupBy(*keys).agg(*aggs)


def maintain_agg(
    state: DataFrame,
    inserts: DataFrame,
    deletes: DataFrame,
    keys: Sequence[str],
    measures: Mapping[str, Column],
    cnt_col: str = "cnt",
) -> DataFrame:
    """New state from (old state, inserted fact rows, deleted fact
    rows) — the base facts are never read. `deletes` rows must be
    rows that exist in the base (the cdc.snapshot_diff contract).
    Groups whose maintained count reaches zero are dropped, so the
    result is exactly `agg_state` of the post-delta fact set."""
    keys = list(keys)

    def delta(facts: DataFrame, sign: int) -> DataFrame:
        aggs = [(F.count(F.lit(1)) * sign).cast("long").alias(cnt_col)] + [
            (F.sum(expr) * sign).alias(name) for name, expr in measures.items()
        ]
        return facts.groupBy(*keys).agg(*aggs)

    cols = keys + [cnt_col] + list(measures)
    merged = (
        state.select(*cols)
        .unionByName(delta(inserts, 1).select(*cols))
        .unionByName(delta(deletes, -1).select(*cols))
    )
    out = merged.groupBy(*keys).agg(
        F.sum(cnt_col).cast("long").alias(cnt_col),
        *[F.sum(name).alias(name) for name in measures],
    )
    return out.where(F.col(cnt_col) > 0)


# ---------------------------------------------- sketched distinct counts

def distinct_state(
    facts: DataFrame,
    keys: Sequence[str],
    col: str,
    lgk: int = 12,
) -> DataFrame:
    """Materialized DISTINCT-count state as HLL sketch columns
    (Apache DataSketches via Spark's hll_sketch_agg): one binary
    sketch per key group. COUNT DISTINCT is the classic
    NON-self-maintainable aggregate — maintain_agg above cannot
    update it from deltas because arriving rows may or may not be
    new values. Sketches restore incrementality for append-only
    facts: union(sketch(A), sketch(B)) estimates |A ∪ B| within the
    same rsd bound as a single-pass sketch (the union changes the
    target register type, so the two estimates are close but not
    bit-identical — measured +-2%% on the testdata), and the state
    updates from the delta alone at ~2^lgk bytes per group. Deletes
    remain impossible by construction — recompute or accept
    staleness, documented."""
    return facts.groupBy(*list(keys)).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias("sketch")
    )


def maintain_distinct(
    state: DataFrame,
    inserts: DataFrame,
    keys: Sequence[str],
    col: str,
    lgk: int = 12,
) -> DataFrame:
    """New sketch state from (old state, inserted fact rows) — the
    historical facts are never rescanned. The merge is one groupBy
    over |state| + |delta groups| sketch rows."""
    keys = list(keys)
    delta = distinct_state(inserts, keys, col, lgk)
    merged = state.select(*keys, "sketch").unionByName(
        delta.select(*keys, "sketch")
    )
    return merged.groupBy(*keys).agg(F.hll_union_agg("sketch").alias("sketch"))


def distinct_estimate(state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """(keys..., distinct_est) from a sketch state."""
    return state.select(
        *list(keys), F.hll_sketch_estimate("sketch").alias("distinct_est")
    )
