"""Date/time functions: epoch-ms BIGINT ↔ string.

ref util/DateUtil.java:8-23 — the reference's only time type is a
BIGINT epoch-millis column; these convert at the boundary. Default
pattern 'yyyy-MM-dd HH:mm:ss' matches the reference's.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from table_computing_spark.table import ColumnLike, _col

DEFAULT_PATTERN = "yyyy-MM-dd HH:mm:ss"


def parse_date(c: ColumnLike, pattern: str = DEFAULT_PATTERN) -> Column:
    """string → epoch-ms BIGINT (ref DateUtil.parseDate)."""
    return F.unix_millis(F.to_timestamp(_col(c), pattern))


def parse_date_with_zone(c: ColumnLike, pattern: str = DEFAULT_PATTERN + " z") -> Column:
    """string with zone NAME → epoch-ms (ref DateUtil.parseDateWithZone —
    SimpleDateFormat pattern 'yyyy-MM-dd HH:mm:ss z', e.g. '... EDT';
    DateUtilTest.java pins 2021-08-19 23:10:20 EDT == 1629429020000).
    Pass an 'XXX' pattern for numeric offsets instead."""
    return F.unix_millis(F.to_timestamp(_col(c), pattern))


def to_date(c: ColumnLike, pattern: str = DEFAULT_PATTERN) -> Column:
    """epoch-ms BIGINT → formatted string (ref DateUtil.toDate)."""
    return F.date_format(F.timestamp_millis(_col(c).cast("bigint")), pattern)


def epoch_ms(c: ColumnLike) -> Column:
    """timestamp column → epoch-ms BIGINT (testdata uses native
    timestamps; the reference convention is epoch-ms longs). The cast
    handles TIMESTAMP_NTZ sources — identity under the UTC session TZ."""
    return F.unix_millis(_col(c).cast("timestamp"))


def from_epoch_ms(c: ColumnLike) -> Column:
    """epoch-ms BIGINT → timestamp (for window()/session_window())."""
    return F.timestamp_millis(_col(c).cast("bigint"))
