"""Shared repartition-invariance property harness.

The repo's exact-arithmetic discipline (integer-unit / DECIMAL
accumulation before any float math — SURVEY §7.4) claims BIT-IDENTICAL
results under any partitioning. Several operators used to hand-roll
that check; this module is the one parametrized harness: each case
builds the same query twice — over `repartition(1)` and
`repartition(13)` of the same input — and the collected row sets must
be exactly equal (no tolerance, floats compared by bit).

A case is (name, builder) where builder(spark, df_by_name) returns the
output DataFrame; the input tables are pulled at sf0.001 for speed —
invariance is a property of the arithmetic, not the data volume.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _li(spark, n):
    return (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            "l_suppkey", "l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_shipdate", "l_partkey",
        )
        .withColumn("ship_ms", F.unix_millis(F.col("l_shipdate").cast("timestamp")))
        .repartition(n)
    )


def _docs(spark, n):
    return spark.read.parquet(f"{SF}/documents.parquet").repartition(n)


def _edges(spark, n):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    return (
        o.select(
            (F.col("o_custkey") % 97).alias("src"),
            (F.col("o_orderkey") % 89).alias("dst"),
        )
        .distinct()
        .repartition(n)
    )


def _moment_stats(spark, n):
    from table_computing_spark import functions as tcf

    return tcf.moment_stats(
        _li(spark, n), "l_quantity", "l_extendedprice", ["l_suppkey"]
    )


def _linreg(spark, n):
    from table_computing_spark import functions as tcf

    return tcf.linreg(_li(spark, n), "l_quantity", "l_extendedprice", ["l_suppkey"])


def _twap(spark, n):
    from table_computing_spark.operators.temporal import twap

    return twap(
        _li(spark, n), ["l_suppkey"], "ship_ms", "l_orderkey",
        "l_quantity", 7 * 86_400_000,
    )


def _rolling_corr(spark, n):
    from table_computing_spark.operators.temporal import rolling_corr

    return rolling_corr(
        _li(spark, n), ["l_suppkey"],
        ["ship_ms", "l_orderkey", "l_linenumber"],
        "l_quantity", "l_extendedprice", n=10, x_scale=0, y_scale=2,
    )


def _ema_trailing(spark, n):
    from table_computing_spark.operators.temporal import ema_trailing

    # ema_trailing's window orders by time alone, so the contract
    # requires a UNIQUE (key, time) — aggregate to one row per time
    # first, exactly as q_ema_trailing does
    obs = (
        _li(spark, n)
        .withColumn("t", F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .groupBy("l_suppkey", "t")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
        .withColumn("qty", F.col("qty").cast("double"))
    )
    return ema_trailing(obs, ["l_suppkey"], "t", "qty", alpha=0.3, k=5)


def _kn_bigram_nll(spark, n):
    from table_computing_spark.operators.text import kn_bigram_nll

    return kn_bigram_nll(_docs(spark, n))


def _pagerank_nano(spark, n):
    from table_computing_spark.operators.graph import pagerank_nano

    return pagerank_nano(_edges(spark, n), iterations=3)


def _hits(spark, n):
    from table_computing_spark.operators.graph import hits_nano

    return hits_nano(_edges(spark, n), iterations=2)


def _group_quantiles(spark, n):
    from table_computing_spark import functions as tcf

    return tcf.group_quantiles(
        _li(spark, n), "l_extendedprice", ["l_suppkey"], qs=(0.25, 0.5, 0.9)
    )


def _running_balance(spark, n):
    from table_computing_spark.operators.temporal import bounded_running_balance

    li = _li(spark, n).select(
        "l_partkey", "ship_ms", "l_orderkey", "l_linenumber",
        F.when(F.col("l_suppkey") % 2 == 0, F.col("l_quantity"))
        .otherwise(-F.col("l_quantity"))
        .alias("delta"),
    )
    return bounded_running_balance(
        li, ["l_partkey"], ["ship_ms", "l_orderkey", "l_linenumber"], "delta"
    )


CASES = [
    ("moment_stats", _moment_stats),
    ("linreg", _linreg),
    ("twap", _twap),
    ("rolling_corr", _rolling_corr),
    ("ema_trailing", _ema_trailing),
    ("kn_bigram_nll", _kn_bigram_nll),
    ("pagerank_nano", _pagerank_nano),
    ("hits_nano", _hits),
    ("group_quantiles", _group_quantiles),
    ("running_balance", _running_balance),
]


@pytest.mark.parametrize("name,builder", CASES, ids=[c[0] for c in CASES])
def test_repartition_invariant(spark, name, builder):
    a = builder(spark, 1).collect()
    b = builder(spark, 13).collect()
    sa = sorted(map(tuple, a))
    sb = sorted(map(tuple, b))
    assert len(sa) > 0, f"{name}: empty result proves nothing"
    assert sa == sb, f"{name}: results differ under repartitioning"
