"""Persistence for learned pipeline artifacts — parquet in, parquet out.

Operators that LEARN something (BPE merge tables, IVF centroids,
Fellegi–Sunter weights, domain mixture plans) need their artifacts to
outlive the job: the apply side usually runs in a different pipeline,
often on a different cluster. Everything here round-trips through
plain parquet — no pickles (version-fragile, unreadable elsewhere),
no JSON sidecars (no schema), just small schema'd tables any engine
can read back.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def save_bpe(spark: SparkSession, merges, path: str) -> None:
    """Merge list from operators/bpe.learn_bpe -> one tiny parquet."""
    from table_computing_spark.operators.bpe import merges_df

    merges_df(spark, merges).coalesce(1).write.mode("overwrite").parquet(path)


def load_bpe(spark: SparkSession, path: str):
    """Parquet -> merge list in merge order, ready for bpe_segment."""
    rows = spark.read.parquet(path).orderBy("iteration").collect()
    return [
        (r["iteration"], r["left"], r["right"], r["pair_count"]) for r in rows
    ]


def save_centroids(spark: SparkSession, centroids, path: str) -> None:
    """IVF centroid list (k x dim floats) -> parquet (cell, centroid)."""
    df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)


def load_centroids(spark: SparkSession, path: str):
    rows = spark.read.parquet(path).orderBy("cell").collect()
    return [list(r["centroid"]) for r in rows]


def save_linkage_weights(spark: SparkSession, field_names, mu, prior, path: str) -> None:
    """EM output from operators/linkage.estimate_em -> parquet
    (field, m, u) plus a (field='__prior__', m=prior) row."""
    rows = [(name, float(m), float(u)) for name, (m, u) in zip(field_names, mu)]
    rows.append(("__prior__", float(prior), float("nan")))
    spark.createDataFrame(rows, "field string, m double, u double").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def load_linkage_weights(spark: SparkSession, path: str):
    """-> ({field: (m, u)}, prior)."""
    rows = spark.read.parquet(path).collect()
    prior = next(float(r["m"]) for r in rows if r["field"] == "__prior__")
    mu = {
        r["field"]: (float(r["m"]), float(r["u"]))
        for r in rows
        if r["field"] != "__prior__"
    }
    return mu, prior
