"""Distribution drift detection between two dataset versions.

Retraining pipelines need a cheap, auditable answer to "did this
column's distribution move since the last snapshot?" before deciding
to retrain or to quarantine an ingest batch. The standard industry
metric is PSI (population stability index):

    PSI = Σ_buckets (p_i - q_i) · ln(p_i / q_i)

with the usual reading: < 0.1 stable, 0.1–0.25 moderate shift,
> 0.25 action required.

Engine-exact discipline (the repo-wide oracle rules):
  * fixed arithmetic binning — bucket = clamp(⌊(x-lo)/(hi-lo)·bins⌋)
    (DuckDB has no width_bucket; this form is portable);
  * counts are exact integers; p, q derive from them by one division;
  * each bucket's PSI term is rounded to integer NANOS and the total
    is an exact integer sum — no float-summation-order dependence
    (same trick as functions/aggregate.moment_stats);
  * ε = 1e-6 is added to both p and q so empty buckets are defined
    (the standard PSI smoothing).

Plan shape: each side is one scan + one hash aggregation of ≤ `bins`
rows; everything after the two aggregations operates on ≤ `bins` rows
(broadcast territory at any corpus size).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPS = 1e-6


def bucketize(col: Column, lo: float, hi: float, bins: int) -> Column:
    """Clamped fixed-width bucket index in [0, bins-1] — portable
    arithmetic form of width_bucket."""
    raw = F.floor((col - F.lit(lo)) / F.lit(hi - lo) * F.lit(bins)).cast("int")
    return F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw))


def psi_drift(
    old: DataFrame,
    new: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 10,
) -> DataFrame:
    """Per-bucket drift report + total PSI (repeated on each row so the
    result is a single self-contained table):
    (bucket, n_old, n_new, p_old, p_new, psi_term, psi_total)."""
    spark = old.sparkSession

    def dist(df: DataFrame, name: str) -> DataFrame:
        return (
            df.filter(F.col(col).isNotNull())
            .groupBy(bucketize(F.col(col), lo, hi, bins).alias("bucket"))
            .agg(F.count(F.lit(1)).alias(name))
        )

    all_buckets = spark.range(bins).select(F.col("id").cast("int").alias("bucket"))
    j = (
        all_buckets.join(dist(old, "n_old"), "bucket", "left")
        .join(dist(new, "n_new"), "bucket", "left")
        .fillna(0, subset=["n_old", "n_new"])
    )
    from pyspark.sql import Window

    w = Window.partitionBy()  # <= bins rows — single tiny partition is fine
    p = F.col("n_old") / F.sum("n_old").over(w) + F.lit(_EPS)
    q = F.col("n_new") / F.sum("n_new").over(w) + F.lit(_EPS)
    term_nano = F.round((p - q) * F.log(p / q) * 1e9).cast("long")
    return (
        j.withColumn("p_old", F.round(p - _EPS, 9))
        .withColumn("p_new", F.round(q - _EPS, 9))
        .withColumn("__t", term_nano)
        .withColumn("psi_term", F.round(F.col("__t") / 1e9, 9))
        .withColumn("psi_total", F.round(F.sum("__t").over(w) / 1e9, 6))
        .drop("__t")
    )
