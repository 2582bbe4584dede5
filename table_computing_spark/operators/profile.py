"""Snapshot profile diff — "what changed about this table since
yesterday?" as one operator.

A data-quality system doesn't just profile a table (q_data_profile's
Deequ-style pass); it compares today's profile against the last
accepted one and alerts on the DELTAS: completeness dropping, distinct
cardinality exploding (a fanout bug upstream), min/max walking outside
the historical envelope (unit change, epoch-vs-ms mixups). cdc.py
answers "which ROWS changed"; this answers "which COLUMN PROPERTIES
changed" — cheaper than any row diff and often the first alarm.

Shape: each side is ONE unpivot scan + one hash aggregate of
|cols| rows (the q_data_profile plan); the diff is a |cols|-row join.
The string-cast envelope comparison is self-consistent WITHIN an
engine (both snapshots use the same rendering), and cross-engine
portable for int/decimal/string/date columns whose renderings agree.
It is NOT cross-engine portable for float/double columns: Spark
renders large doubles in scientific notation ('9.0E7') where DuckDB
writes '90000000.0', so the lexicographic arg-min/max can be a
different VALUE per engine — keep envelope-gated oracle queries to
the portable types (the distinct COUNT stays portable for any type:
casting is injective per engine).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column (col_name, n_rows, n_present, n_distinct, min_s,
    max_s) in ONE pass: columns unpivot to narrow (col_name, value)
    rows so a single shuffle serves every column.

    Two-level aggregation instead of count_distinct-next-to-plain-aggs:
    the mixed form plans an Expand that DOUBLES every unpivoted row
    before the exchange, while groupBy(col, value) first is map-side
    combinable — the shuffle carries only distinct (col, value) pairs
    (guide §2.3). Values are identical: n_rows = Σ group counts,
    n_present = Σ counts of non-NULL values, n_distinct = count of
    non-NULL groups, min/max over group keys."""
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("kv")
    ).select("kv.*")
    per_v = stacked.groupBy("col_name", "v").agg(F.count(F.lit(1)).alias("__c"))
    return per_v.groupBy("col_name").agg(
        F.sum("__c").alias("n_rows"),
        F.sum(
            F.when(F.col("v").isNotNull(), F.col("__c")).otherwise(F.lit(0))
        ).alias("n_present"),
        F.count("v").alias("n_distinct"),
        F.min("v").alias("min_s"),
        F.max("v").alias("max_s"),
    )


def profile_diff(
    old: DataFrame,
    new: DataFrame,
    cols: Sequence[str],
    round_to: int = 6,
) -> DataFrame:
    """Column-property deltas between two snapshots. Per column:
    row/present/distinct counts on both sides, the completeness delta,
    the distinct-cardinality ratio, and whether the [min, max]
    envelope moved — the column-level alarms a nightly quality gate
    fires on before any row-level diff runs."""
    po = column_profile(old, cols)
    pn = column_profile(new, cols)
    o = po.select(
        "col_name",
        F.col("n_rows").alias("rows_old"),
        F.col("n_present").alias("present_old"),
        F.col("n_distinct").alias("distinct_old"),
        F.col("min_s").alias("min_old"),
        F.col("max_s").alias("max_old"),
    )
    n = pn.select(
        "col_name",
        F.col("n_rows").alias("rows_new"),
        F.col("n_present").alias("present_new"),
        F.col("n_distinct").alias("distinct_new"),
        F.col("min_s").alias("min_new"),
        F.col("max_s").alias("max_new"),
    )
    j = o.join(n, "col_name")
    comp_old = F.col("present_old").cast("double") / F.col("rows_old").cast("double")
    comp_new = F.col("present_new").cast("double") / F.col("rows_new").cast("double")
    return j.select(
        "col_name",
        "rows_old",
        "rows_new",
        "distinct_old",
        "distinct_new",
        F.round(comp_new - comp_old, round_to).alias("completeness_delta"),
        F.round(
            F.col("distinct_new").cast("double")
            / F.greatest(F.col("distinct_old"), F.lit(1)).cast("double"),
            round_to,
        ).alias("distinct_ratio"),
        # null-safe: an all-NULL column turning non-NULL (or vice versa)
        # must flag true, not NULL — plain != would let a gate filtering
        # envelope_moved = true miss exactly that transition (r08 ADVICE)
        (
            (~F.col("min_new").eqNullSafe(F.col("min_old")))
            | (~F.col("max_new").eqNullSafe(F.col("max_old")))
        ).alias("envelope_moved"),
    )
