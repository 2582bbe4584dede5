"""Similarity search over embedding columns (array<float>).

Two paths:
  cosine_topk     — exact brute force: query x corpus equi-free join,
                    JVM-side dot product (zip_with + aggregate), top-k
                    per query via bounded window. Baseline + oracle.
  lsh_topk        — sign-LSH bucketed: hyperplane sign bits put vectors
                    in buckets; queries only scan their own bucket. At
                    100 TB this turns an O(Q x N) cross join into
                    O(Q x N / 2^bits) with a bucket equi-join.

The dot product stays in whole-stage codegen: `aggregate(zip_with(a, b,
(x,y) -> x*y), 0D, (acc,x) -> acc+x)` — sequential left-to-right adds,
so the same float result on any engine that folds in list order.

Embedding near-dup (SURVEY 'embedding-cosine near-dup') = cosine_pairs
with a threshold instead of top-k.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType
from pyspark.sql.window import Window as W


def _dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Pure-expression cosine. Exact left-to-right fold (engine-portable
    bit-for-bit), but higher-order lambdas are INTERPRETED per element —
    use only off the hot path."""
    return _dot_expr(a, b) / (_norm_expr(a) * _norm_expr(b))


@pandas_udf(DoubleType())
def _cosine_pd(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched cosine similarity: each batch becomes two dense
    (rows × dim) float64 matrices and one vectorized einsum — the fast
    path for the O(candidates) scoring stage. ~100× the interpreted
    higher-order-function fold."""
    import numpy as np

    ma = np.array(a.tolist(), dtype="float64")
    mb = np.array(b.tolist(), dtype="float64")
    dots = np.einsum("ij,ij->i", ma, mb)
    norms = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        return pd.Series(dots / norms)


def cosine(a: Column, b: Column) -> Column:
    return _cosine_pd(a, b)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact top-k neighbors per query vector (brute force).

    Scale: the cross join is Q x N — fine when Q is small (queries are
    broadcast); for large Q use lsh_topk. Ties break by neighbor id so
    ranking is total and engine-portable.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), round_to).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= t).
    Brute force O(N^2/2) — use lsh buckets (below) past ~10^5 vectors."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("__va"), F.col("__vb")), round_to).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def sign_bucket(vec: Column, bits: int = 4) -> Column:
    """Axis-aligned sign-LSH bucket id: bit i = sign(vec[i]) — a
    deterministic, engine-portable random-hyperplane surrogate (the
    embedding dims are zero-centered)."""
    b = F.lit(0)
    for i in range(bits):
        b = b + F.when(F.element_at(vec, i + 1) > 0, F.lit(2**i)).otherwise(F.lit(0))
    return b


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 4,
    round_to: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's sign-LSH
    bucket — bucket equi-join instead of a cross join. Recall improves
    with multi-probe (probe adjacent buckets) — future knob."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        sign_bucket(F.col(vec_col), bits).alias("__bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        sign_bucket(F.col(vec_col), bits).alias("__bucket"),
    )
    scored = (
        q.join(c, "__bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), round_to).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
