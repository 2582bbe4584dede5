"""Hive-style partitioned parquet layout — directory-level pruning.

At 100 TB the cheapest predicate is the one that never opens a file:
writing with `partitionBy(lang, ...)` turns equality/IN filters on the
partition columns into DIRECTORY pruning (the scan's `PartitionFilters`
slot), independent of row-group statistics. The rules of thumb encoded
here:

  * partition ONLY on low-cardinality columns a reader actually
    filters by (lang, source, date) — high-cardinality partitioning is
    the small-files anti-pattern `sources/compaction.py` exists to fix;
  * inside each partition, aim for the compaction writer's target file
    size (pass target_mb to repartition within partitions).

`read_pruned` is a thin reader that documents (and tests assert) that
partition-column filters land in PartitionFilters, not as row filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: "list[str]",
    mode: str = "overwrite",
) -> None:
    """Write hive-layout parquet: path/<col>=<value>/part-*.parquet.
    Data is pre-shuffled on the partition columns so each output
    directory is written by the task(s) owning that key — without the
    repartition, EVERY task writes EVERY partition directory and the
    layout degenerates to tasks × partitions small files. Partitions
    that outgrow the target file size are the compaction writer's job
    (sources/compaction.py)."""
    df.repartition(*partition_cols).write.mode(mode).partitionBy(
        *partition_cols
    ).parquet(path)


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout; any filter on partition columns is
    pruned at the directory level (assert via `PartitionFilters` in
    df.explain('formatted') — see tests/test_cdc_ops.py)."""
    return spark.read.parquet(path)
