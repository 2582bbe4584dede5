"""Stream-stream interval (time-bounded) equi-join.

The reference joins a stream only against dimension snapshots
(sp/dimension/DimensionTable.java) — stream×stream correlation must be
hand-rolled in user Compute code. In Spark it is a first-class stateful
operator: with a watermark on BOTH inputs and a time-range predicate on
the two event-time columns, the state store keeps exactly the
watermark+range-bounded window of each side and expires the rest —
join state is O(rate × bound), independent of stream length. That
range predicate must reference the raw event-time columns (no casts),
or Spark cannot derive the state-eviction condition and the state
grows without bound.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[tuple[str, str]],
    left_time: str,
    right_time: str,
    lower_ms: int,
    upper_ms: int,
    watermark: str = "10 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join right rows whose event time lies in
    [left_time - lower_ms, left_time + upper_ms].

    `left_time` / `right_time` must be distinct TimestampType column
    names (the condition is built as an expression over both inputs).
    """
    l = left.withWatermark(left_time, watermark)
    r = right.withWatermark(right_time, watermark)
    cond = F.expr(
        f"{right_time} >= {left_time} - INTERVAL {lower_ms} MILLISECOND AND "
        f"{right_time} <= {left_time} + INTERVAL {upper_ms} MILLISECOND"
    )
    for lc, rc in on:
        cond = cond & (l[lc] == r[rc])
    return l.join(r, cond, how)
