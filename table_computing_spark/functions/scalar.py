"""Null-safe scalar functions. ref util/ScalarUtil.java:8-55.

All are thin expression builders — they stay JVM-side inside
whole-stage codegen (no Python UDFs).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from table_computing_spark.table import ColumnLike, _col


def to_integer(c: ColumnLike) -> Column:
    """ref util/ScalarUtil.java toInteger — null-safe cast."""
    return _col(c).cast("int")


def to_long(c: ColumnLike) -> Column:
    return _col(c).cast("bigint")


def to_double(c: ColumnLike) -> Column:
    return _col(c).cast("double")


def to_str(c: ColumnLike) -> Column:
    return _col(c).cast("string")


def to_bigdecimal(c: ColumnLike, precision: int = 38, scale: int = 18) -> Column:
    """Reference BigDecimal is unbounded (table/BigDecimalColumn.java);
    DecimalType(38,18) is the Spark bound — documented delta."""
    return _col(c).cast(f"decimal({precision},{scale})")


def substr(c: ColumnLike, begin: int, end: int | None = None) -> Column:
    """ref util/ScalarUtil.java substr(begin[,end]) — 0-based begin,
    exclusive end (Java String.substring semantics), null-safe."""
    if end is None:
        return F.substring(_col(c), begin + 1, 2**31 - 1)
    return F.substring(_col(c), begin + 1, end - begin)


def trim_char(c: ColumnLike, ch: str) -> Column:
    """ref util/ScalarUtil.java trim(char) — strip a specific char from
    both ends (BTRIM)."""
    return F.btrim(_col(c), F.lit(ch))


def ltrim_char(c: ColumnLike, ch: str) -> Column:
    """ref util/ScalarUtil.java ltrim(char) — regexp form keeps it
    expression-only (codegen), same semantics as char-strip."""
    return F.regexp_replace(_col(c), f"^[{re.escape(ch)}]+", "")


def rtrim_char(c: ColumnLike, ch: str) -> Column:
    """ref util/ScalarUtil.java rtrim(char)."""
    return F.regexp_replace(_col(c), f"[{re.escape(ch)}]+$", "")
