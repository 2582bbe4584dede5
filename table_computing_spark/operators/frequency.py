"""Frequent-item (heavy-hitter) detection at 100 TB scale.

The reference has no sketch operators (its aggregation surface is
UDF-everything, sp/StreamProcessing.java:77-109); heavy hitters are a
core corpus-hygiene primitive for training-data pipelines (frequent
tokens / boilerplate n-grams / dominant hosts), so we add them
first-class.

Two-phase EXACT algorithm (Misra-Gries candidates + recount):

1. Per-partition Misra-Gries summary with `capacity` counters
   (mapInPandas, Arrow-batched pandas value_counts merged into a
   bounded counter with the Agarwal et al. "Mergeable Summaries" prune:
   subtract the (capacity+1)-th largest counter from all, drop <= 0).
   Guarantee: an item absent from a partition's summary has partition
   count <= n_p/(capacity+1); absent from ALL summaries => global count
   <= n/(capacity+1). So for any k <= capacity, the union of summaries
   is a SUPERSET of every item with global count > n/k.
2. Exact recount of the candidate set only: broadcast the candidates,
   hash-semi-join the scan against them, groupBy(candidate).count().

Why not a plain groupBy(key).count().having(...)? That shuffles one
partial-agg row per DISTINCT key per partition. With billions of
distinct keys (token n-grams at 100 TB), the shuffle and the final
hash-agg state are O(distinct). Here the shuffle is O(partitions x
capacity) in phase 1 and O(candidates) in phase 2 — both tiny — while
the scans stay embarrassingly parallel. The result is still EXACT
(candidates are recounted, never estimated), which is what lets the
driver hash-match it against a DuckDB GROUP BY/HAVING oracle.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def misra_gries_summaries(
    df: DataFrame, key_col: str, capacity: int = 64
) -> DataFrame:
    """Per-partition Misra-Gries summaries: (key, mg_count) with at most
    `capacity` rows per partition. mg_count is a LOWER bound on the
    partition count, under-counting by at most n_p/(capacity+1).

    Null keys are ignored (they are not items). Memory per task is
    O(capacity + arrow_batch_distinct), independent of partition size.
    """
    key_field = df.schema[key_col]
    out_schema = T.StructType(
        [
            T.StructField(key_col, key_field.dataType),
            T.StructField("mg_count", T.LongType()),
        ]
    )

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.Series | None = None
        for pdf in batches:
            vc = pdf[key_col].dropna().value_counts()
            if vc.empty:
                continue
            acc = vc if acc is None else acc.add(vc, fill_value=0)
            if len(acc) > capacity:
                cut = acc.nlargest(capacity + 1).iloc[-1]
                acc = acc.subtract(cut)
                acc = acc[acc > 0]
        if acc is not None and len(acc):
            yield pd.DataFrame(
                {key_col: acc.index, "mg_count": acc.to_numpy(dtype="int64")}
            )

    return df.select(key_col).mapInPandas(summarize, out_schema)


def heavy_hitters(
    df: DataFrame, key_col: str, k: int = 32, capacity: int | None = None
) -> DataFrame:
    """EXACT heavy hitters: every non-null key whose count satisfies
    `count * k > total_rows`, as (key, cnt). One lazy plan, no driver
    actions.

    `capacity` (default 2k) must be >= k for the superset guarantee.
    The threshold compare is pure integer math (cnt * k > n) so it is
    engine-portable — no float division at the decision boundary.
    """
    if capacity is None:
        capacity = 2 * k
    if capacity < k:
        raise ValueError(f"capacity {capacity} must be >= k {k}")
    candidates = (
        misra_gries_summaries(df, key_col, capacity)
        .groupBy(key_col)
        .agg(F.sum("mg_count").alias("mg_lower"))
        .select(key_col)
    )
    base = df.filter(F.col(key_col).isNotNull())
    exact = (
        base.join(F.broadcast(candidates), on=key_col, how="left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # count(*) over a parquet scan prunes to an empty ReadSchema — near
    # free next to the two data scans.
    total = base.agg(F.count(F.lit(1)).alias("__n"))
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(k) > F.col("__n"))
        .select(key_col, "cnt")
    )


# ------------------------------------------------------------------ CMS

def _cms_slots(key_col: str, depth: int, width: int):
    """One struct(row, slot) per sketch row: slot = first 15 md5 hex
    chars of "i:key" mod width — pure codegen, engine-portable."""
    return [
        F.struct(
            F.lit(i).alias("row"),
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":", F.lit(str(i)), F.col(key_col).cast("string")
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % width
            ).alias("slot"),
        )
        for i in range(depth)
    ]


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as a DataFrame:
    `depth` x `width` counters, returned as narrow rows (row, slot,
    cnt). Row i's hash is the first 15 hex chars of md5(i || ':' ||
    key) mod width — pure codegen expressions, and md5 (not xxhash64)
    so the DuckDB oracle reproduces every counter exactly.

    Complements heavy_hitters above: Misra-Gries answers "which items
    are frequent" exactly; a CMS answers point-frequency queries for
    ANY key with a one-sided error (estimate >= truth, overshoot
    <= 2n/width with prob 1 - 2^-depth) in depth*width integers —
    small enough to broadcast, mergeable across shards/streams by
    elementwise sum (cms_merge).

    Scale shape: one groupBy over (row, slot) — map-side partial
    aggregation compresses each partition to <= depth*width rows
    before the shuffle, so wire cost is O(partitions * depth * width),
    independent of row count or key cardinality."""
    return (
        df.select(F.explode(F.array(*_cms_slots(key_col, depth, width))).alias("rs"))
        .select("rs.row", "rs.slot")
        .groupBy("row", "slot")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width): elementwise
    counter sum — the property that lets shards/streams sketch
    independently and combine at the end."""
    import functools

    u = functools.reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy("row", "slot").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for `keys`: min over the sketch's
    `depth` counters each key hashes to. Missing counters are zero
    (the key was never seen). The sketch (<= depth*width rows) is
    broadcast — the probe side never shuffles."""
    probes = (
        keys.select(F.col(key_col))
        .withColumn("rs", F.explode(F.array(*_cms_slots(key_col, depth, width))))
        .select(key_col, F.col("rs.row").alias("row"), F.col("rs.slot").alias("slot"))
    )
    joined = probes.join(F.broadcast(sketch), ["row", "slot"], "left")
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def top_k_with_others(
    df: DataFrame,
    keys: Sequence[str],
    item_col: str,
    measure: Column,
    k: int = 5,
    others_label: str = "OTHER",
) -> DataFrame:
    """Per-group top-k items by a measure, with everything below the
    cut rolled into one `others_label` row per group — the standard
    reporting shape ("top 5 brands per region + other"), done without
    ever materializing the full ranking twice.

    One hash aggregate to (keys, item, total), one PARTITIONED rank
    window over the aggregated rows (state = items per group, not data
    rows), one conditional re-aggregate for the tail. Totals are
    DECIMAL-exact; ranking ties break by item for a total order.
    Output: (keys..., item, total, rank) with rank NULL on the OTHER
    row; group totals are preserved exactly: Σ top-k + OTHER == group
    total."""
    from pyspark.sql.window import Window as W

    keys = list(keys)
    per = df.groupBy(*keys, F.col(item_col).alias("item")).agg(
        F.sum(measure.cast("decimal(28,6)")).alias("total")
    )
    w = W.partitionBy(*keys).orderBy(F.col("total").desc(), F.col("item").asc())
    ranked = per.withColumn("rank", F.row_number().over(w))
    top = ranked.filter(F.col("rank") <= k).select(
        *keys, "item", "total", F.col("rank").cast("int").alias("rank")
    )
    others = (
        ranked.filter(F.col("rank") > k)
        .groupBy(*keys)
        .agg(F.sum("total").alias("total"))
        .select(
            *keys,
            F.lit(others_label).alias("item"),
            F.col("total").cast("decimal(38,6)").alias("total"),
            F.lit(None).cast("int").alias("rank"),
        )
    )
    return top.unionByName(others)
