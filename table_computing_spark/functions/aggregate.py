"""Aggregate function library with the reference's null semantics.

ref util/AggregationUtil.java:
  sumInt :17-28, sumLong :30-41 (returns double!), sumDouble :43-54,
  max :56-71, avg :73-75 (denominator counts null rows — not SQL AVG),
  groupConcat :8-15 (nulls rendered as the string 'null', input order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from table_computing_spark.table import ColumnLike, _col


def sum_int(c: ColumnLike) -> Column:
    """ref AggregationUtil.sumInt — null-skipping int sum."""
    return F.sum(_col(c)).cast("int")


def sum_long(c: ColumnLike) -> Column:
    """ref AggregationUtil.sumLong — NOTE the reference returns the long
    sum as a double; preserved here for parity."""
    return F.sum(_col(c)).cast("double")


def sum_double(c: ColumnLike) -> Column:
    return F.sum(_col(c).cast("double"))


def sum_exact(c: ColumnLike, scale: int = 4) -> Column:
    """Order-independent exact sum: cast to decimal first so partial
    aggregation order can't perturb low bits (doubles don't associate).
    Use for oracle-compared results and money columns."""
    return F.sum(_col(c).cast(f"decimal(30,{scale})"))


def max_ref(c: ColumnLike) -> Column:
    """ref AggregationUtil.max — null-skipping (matches SQL MAX)."""
    return F.max(_col(c))


def min_ref(c: ColumnLike) -> Column:
    return F.min(_col(c))


def avg_ref(c: ColumnLike) -> Column:
    """ref AggregationUtil.avg:73-75 — sumDouble / rows.size(): the
    denominator counts rows whose value is NULL (SQL AVG ignores them).
    """
    return F.sum(_col(c).cast("double")) / F.count(F.lit(1))


def count_all() -> Column:
    """rows.size() inside the reference UDAF (TableTest.java:119)."""
    return F.count(F.lit(1))


def group_concat(c: ColumnLike, sort: bool = True, sep: str = ",") -> Column:
    """ref AggregationUtil.groupConcat:8-15 — comma-joined values with
    NULL rendered as the literal string 'null'.

    The reference preserves input order (single-threaded per group);
    under a distributed shuffle input order is nondeterministic, so the
    deterministic contract here is sorted order (sort=False opts out,
    for single-partition / pre-sorted pipelines).
    """
    lst = F.collect_list(F.coalesce(_col(c).cast("string"), F.lit("null")))
    if sort:
        lst = F.sort_array(lst)
    return F.array_join(lst, sep)
