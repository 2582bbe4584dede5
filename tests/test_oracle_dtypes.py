"""Pin the dtype lattice in tests/oracle.py to the driver's observed
hash behavior (4 rounds of CORRECTNESS_r*.json evidence):

- round 4's red trio (q_pivot / q_token_budget / q_pipeline_curation)
  were uncast integer sum() → DuckDB HUGEINT vs Spark BIGINT: values
  equal, hash red. The local sim MUST fail that shape.
- int32 vs BIGINT (rank() outputs etc.) has been hash-green since
  round 1 → must NOT be flagged.
- DECIMAL(15,1) vs Spark double (q_histogram) was hash-green → must
  NOT be flagged.
"""

import sys

import duckdb
import pytest

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from oracle import compare  # noqa: E402


def _spark_df(spark, sql):
    return spark.sql(sql)


def test_uncast_int_sum_hugeint_fails(spark):
    """The exact round-4 bug shape: Spark BIGINT vs DuckDB HUGEINT."""
    sdf = _spark_df(spark, "SELECT CAST(6 AS BIGINT) AS s")
    rel = duckdb.sql("SELECT sum(x) AS s FROM (SELECT unnest([1,2,3]) AS x)")
    issues = compare(sdf, rel)
    assert issues and "dtype mismatch" in issues[0], issues


def test_cast_bigint_sum_passes(spark):
    sdf = _spark_df(spark, "SELECT CAST(6 AS BIGINT) AS s")
    rel = duckdb.sql(
        "SELECT CAST(sum(x) AS BIGINT) AS s FROM (SELECT unnest([1,2,3]) AS x)"
    )
    assert compare(sdf, rel) == []


def test_int_width_difference_not_flagged(spark):
    """rank() is int32 in Spark, BIGINT in DuckDB — driver-green since r01."""
    sdf = _spark_df(spark, "SELECT CAST(1 AS INT) AS rank")
    rel = duckdb.sql("SELECT CAST(1 AS BIGINT) AS rank")
    assert compare(sdf, rel) == []


def test_decimal_vs_double_not_flagged(spark):
    """DECIMAL(15,1) materializes as float64 — q_histogram was green."""
    sdf = _spark_df(spark, "SELECT CAST(5500.0 AS DOUBLE) AS lo")
    rel = duckdb.sql("SELECT CAST(5500.0 AS DECIMAL(15,1)) AS lo")
    assert compare(sdf, rel) == []


def test_int_vs_double_flagged(spark):
    """float64 6.0 vs int64 6 hash differently — must be caught."""
    sdf = _spark_df(spark, "SELECT CAST(6 AS BIGINT) AS v")
    rel = duckdb.sql("SELECT CAST(6 AS DOUBLE) AS v")
    issues = compare(sdf, rel)
    assert issues and "dtype mismatch" in issues[0], issues


def test_spark_decimal_output_flagged(spark):
    """Spark DecimalType → object(Decimal) in pandas; never ship one."""
    sdf = _spark_df(spark, "SELECT CAST(1.5 AS DECIMAL(18,6)) AS v")
    rel = duckdb.sql("SELECT CAST(1.5 AS DOUBLE) AS v")
    issues = compare(sdf, rel)
    assert issues and "dtype mismatch" in issues[0], issues


def test_value_diff_still_caught(spark):
    sdf = _spark_df(spark, "SELECT CAST(7 AS BIGINT) AS s")
    rel = duckdb.sql("SELECT CAST(6 AS BIGINT) AS s")
    issues = compare(sdf, rel)
    assert issues, "value mismatch must be reported"
