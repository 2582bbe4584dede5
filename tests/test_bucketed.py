"""Bucketed-table co-location: the write-once shuffle contract.

Proves the scale claim, not just the values: joining two tables
bucketed on the join key must produce a plan with NO shuffle exchange
(the reference pays its `rehash` network shuffle on every batch
instead — sp/Rehash.java:297-345)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from table_computing_spark.sources.bucketed import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    # warehouse dir is a static conf — tables land in ./spark-warehouse
    # (gitignored) and are dropped on teardown
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    write_bucketed(orders, "b_orders", ["o_orderkey"], num_buckets=8)
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], num_buckets=8)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    ot, lt = bucketed_pair
    o = read_bucketed(spark, ot).df
    li = read_bucketed(spark, lt).df
    # force the shuffle-join path: broadcast would bypass the bucketed
    # scan (at real scale neither side broadcasts — that's the case
    # bucketing exists for)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan, plan
    # and the join is still correct
    n = joined.count()
    plain = (
        spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        .join(
            spark.read.parquet("/root/testdata/sf0.01/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert n == plain


def test_bucketed_aggregation_has_no_shuffle(spark, bucketed_pair):
    _, lt = bucketed_pair
    li = read_bucketed(spark, lt).df
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_partitioned_write_prunes_partitions(spark, tmp_path_factory):
    """Hive-style partitionBy layout: a filter on the partition column
    must prune at PLANNING time (PartitionFilters on the scan, only the
    matching directory's files read) — the other half of the
    write-layout story besides bucketing, and the first lever against a
    100 TB scan."""
    d = str(tmp_path_factory.mktemp("part_events"))
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(d)

    rd = spark.read.parquet(d).filter(F.col("event_type") == "click")
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan, plan
    # files actually read come only from the matching partition dir
    files = [r[0] for r in rd.select(F.input_file_name()).distinct().collect()]
    assert files and all("event_type=click" in f for f in files)
    # and values are intact
    assert rd.count() == ev.filter(F.col("event_type") == "click").count()
