"""Bucketed tables — co-located joins without a shuffle.

The reference co-locates join/window state by `rehash`ing every batch
across threads/servers on the key hash (sp/Rehash.java:297-345) — paid
on EVERY query. Spark's bucketing pays the shuffle ONCE at write time:
`bucketBy(n, keys)` persists data pre-hash-partitioned AND records the
layout in the catalog, so every later equi-join or aggregation on the
bucket keys skips its Exchange entirely (verified by
tests/test_bucketed.py asserting no shuffle in the plan).

At 100 TB this is the difference between re-shuffling the fact table
per query and scanning co-located buckets: bucket both sides of a
recurring join on the same keys with the same bucket count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from table_computing_spark.table import Table


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: Sequence[str],
    num_buckets: int = 32,
    sort_by: Sequence[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist `df` hash-bucketed by `bucket_by` (optionally sorted
    within buckets — enables shuffle-AND-sort-free sort-merge joins)."""
    writer = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> Table:
    """Read a bucketed table with its layout metadata (the catalog read
    path — a plain `spark.read.parquet` of the files would lose the
    bucket spec and reintroduce shuffles)."""
    return Table(spark.table(table_name), table_name)
