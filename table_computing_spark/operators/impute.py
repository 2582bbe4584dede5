"""Per-group missing-value imputation (median / mode) for feature
preparation.

A training-data pipeline fills NULLs before featurization; doing it
per group (median account balance per nation, modal segment per
region) preserves far more signal than one global constant. The
reference has no imputation surface (SURVEY §2 — its pipelines drop
or forward NULLs); this is Spark-first widening like classify.py.

Engine-exact discipline:
  * numeric strategy is the exact MEDIAN (an order statistic —
    portable across engines; the even-count midpoint (a+b)/2 is one
    fixed operation on two doubles). Mean is deliberately NOT offered:
    a float mean is summation-order-dependent and would break the
    repo's oracle rules; use decimal-cast aggregates directly if a
    mean fill is really wanted.
  * categorical strategy is the MODE with a deterministic tie-break
    (highest count, then smallest value) — two hash aggregates, no
    window, so the choice is engine-reproducible.

Scale shape: one aggregate per strategy keyed on the group (map-side
combinable), a |groups|-row stats table joined back (AQE broadcasts
it when small), plus a 1-row global fallback cross-joined broadcast
for groups whose slice is entirely NULL and for NULL group keys. The
data is scanned twice (stats + fill) — at 100 TB that beats any
per-group subquery plan by construction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def median_stats(df: DataFrame, keys: Sequence[str], cols: Sequence[str]) -> DataFrame:
    """(keys..., <col>__med ...) exact per-group medians of non-NULL
    values; groups with no non-NULL values carry NULL (the fill step
    falls back to the global median)."""
    return df.groupBy(*list(keys)).agg(
        *[F.median(c).alias(f"{c}__med") for c in cols]
    )


def mode_stats(df: DataFrame, keys: Sequence[str], col: str) -> DataFrame:
    """(keys..., <col>__mode) per-group modal value of `col`,
    tie-broken deterministically (max count, then min value) with two
    hash aggregates — no window over the data."""
    keys = list(keys)
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(*keys, col)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    top = counts.groupBy(*keys).agg(F.max("__n").alias("__n"))
    return (
        counts.join(top, keys + ["__n"])
        .groupBy(*keys)
        .agg(F.min(col).alias(f"{col}__mode"))
    )


def impute(
    df: DataFrame,
    keys: Sequence[str],
    numeric: Sequence[str] = (),
    categorical: Sequence[str] = (),
) -> DataFrame:
    """Fill NULLs in `numeric` columns with the per-group exact median
    and in `categorical` columns with the per-group mode; groups whose
    slice is entirely NULL (and rows with NULL group keys) fall back
    to the global statistic. Output schema == input schema."""
    keys = list(keys)
    out = df
    stats: DataFrame | None = None
    if numeric:
        stats = median_stats(df, keys, numeric)
    for c in categorical:
        m = mode_stats(df, keys, c)
        stats = m if stats is None else stats.join(m, keys, "outer")
    if stats is None:
        return out
    g_aggs = [F.median(c).alias(f"{c}__gmed") for c in numeric]
    out = out.join(stats, keys, "left")
    if g_aggs:
        out = out.crossJoin(F.broadcast(df.agg(*g_aggs)))
    for c in categorical:
        gm = mode_stats(df.select(F.lit(1).alias("__g"), c), ["__g"], c).select(
            F.col(f"{c}__mode").alias(f"{c}__gmode")
        )
        out = out.crossJoin(F.broadcast(gm))
    fills = []
    for c in numeric:
        fills.append((c, F.coalesce(F.col(c), F.col(f"{c}__med"), F.col(f"{c}__gmed"))))
    for c in categorical:
        fills.append((c, F.coalesce(F.col(c), F.col(f"{c}__mode"), F.col(f"{c}__gmode"))))
    for c, e in fills:
        out = out.withColumn(c, e)
    return out.select(*df.columns)
