"""Function library mirroring the reference's util/* statics.

ref util/ScalarUtil.java (null-safe casts, substr, trims),
util/DateUtil.java (epoch-ms ↔ string), util/AggregationUtil.java
(sum/max/avg/group_concat with reference null semantics),
util/WindowUtil.java + util/OrderByWindowUtil.java (topN/rank → Table.top_n/over).
"""

from table_computing_spark.functions.aggregate import (
    avg_ref,
    count_all,
    group_concat,
    group_quantiles,
    max_ref,
    linreg,
    moment_stats,
    min_ref,
    sum_double,
    sum_exact,
    sum_int,
    sum_long,
)
from table_computing_spark.functions.datetime import (
    epoch_ms,
    from_epoch_ms,
    parse_date,
    parse_date_with_zone,
    to_date,
)
from table_computing_spark.functions.scalar import (
    ltrim_char,
    rtrim_char,
    substr,
    to_bigdecimal,
    to_double,
    to_integer,
    to_long,
    to_str,
    trim_char,
)

__all__ = [
    "avg_ref", "count_all", "group_concat", "group_quantiles", "linreg", "max_ref", "min_ref", "moment_stats",
    "sum_double", "sum_exact", "sum_int", "sum_long",
    "epoch_ms", "from_epoch_ms", "parse_date", "parse_date_with_zone", "to_date",
    "ltrim_char", "rtrim_char", "substr", "to_bigdecimal",
    "to_double", "to_integer", "to_long", "to_str", "trim_char",
]
