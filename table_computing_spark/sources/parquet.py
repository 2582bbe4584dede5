"""Parquet scan over the driver's testdata star schema (TESTDATA.md).

Columnar parquet is the scale path: Catalyst pushes filters and prunes
columns into this scan (check `PushedFilters` / `ReadSchema` in
`df.explain('formatted')`), so downstream operators only pay for the
bytes they touch — the property that matters at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from table_computing_spark.table import Table

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_df(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver may hand us a session without our defaults; these are
    # runtime SQL confs, so set them defensively (older testdata stored
    # events.ts as TIMESTAMP(NANOS), which Spark can't read natively;
    # TZ parity with the DuckDB oracle requires UTC rendering of NTZ
    # timestamps).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        # Normalize ts to TimestampType whatever the generator wrote —
        # the physical type has changed across testdata regenerations,
        # so dispatch on the actual scan dtype:
        #   bigint        → epoch-ns under nanosAsLong. Integer `div`
        #                   is mandatory: `/` coerces the ~1.7e18 ns
        #                   value to double (exact only to 2^53) and
        #                   corrupts microseconds; `div` stays in long
        #                   arithmetic and matches DuckDB's exact ns→µs
        #                   truncation of the same file.
        #   timestamp_ntz → native timestamp[us]; cast to LTZ is the
        #                   identity instant under the UTC session TZ.
        #   timestamp     → already what we want.
        dtype = dict(df.dtypes).get("ts", "")
        if dtype in ("bigint", "int", "long"):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dtype != "timestamp":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> Table:
    return Table(load_df(spark, sf_dir, name), name)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, Table]:
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}
