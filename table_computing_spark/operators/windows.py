"""Time windows — batch semantics (streaming variants in streaming/windows.py).

ref window/SlideWindow.java:283-373 (hopping), TumbleWindow.java:10-50,
SessionWindow.java:93-123, OverWindowBySize.java:54-89 (trailing count),
OverWindowByDuration.java:63-92 (trailing range).

The reference fires windows imperatively as event time passes the window
end, with per-thread keyed state after a `rehash` shuffle. Declaratively
the same window assignment is `window()` / `session_window()` /
WindowSpec frames; Spark assigns ALL hop memberships exactly (the
reference's out-of-order single-element firings — SlideWindow.java:254-261
— are an engine artifact we deliberately do not replicate; see SURVEY §2.6).

All functions take the time column as either a timestamp or an epoch-ms
BIGINT (the reference's only time type) and emit `window_start`/
`window_end` as epoch-ms BIGINT so results are engine-portable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from table_computing_spark.table import ColumnLike, Table, _col


def _ts(c: ColumnLike) -> Column:
    """Normalize time column: BIGINT epoch-ms → timestamp, else as-is."""
    col = _col(c)
    return col


def _as_timestamp(df: DataFrame, time_col: str) -> Column:
    dtype = dict(df.dtypes).get(time_col)
    if dtype in ("bigint", "int", "long"):
        return F.timestamp_millis(F.col(time_col))
    # NTZ → LTZ is identity under the UTC session TZ; unix_millis on the
    # window bounds requires LTZ.
    return F.col(time_col).cast("timestamp")


def tumble(
    t: Table,
    time_col: str,
    size: str,
    partition_by: Sequence[str],
    **aggs: Column,
) -> Table:
    """Tumbling window (ref window/TumbleWindow.java:10-50 — slide with
    hop == size). First window aligned at floor(time/size)*size, same as
    Spark's epoch-aligned window()."""
    return slide(t, time_col, size, size, partition_by, **aggs)


def slide(
    t: Table,
    time_col: str,
    size: str,
    hop: str,
    partition_by: Sequence[str],
    **aggs: Column,
) -> Table:
    """Hopping window (ref window/SlideWindow.java:283-373).

    Spark's window(ts, size, hop) enumerates every hop an event belongs
    to (size/hop memberships) and the groupBy computes all of them with
    map-side partial aggregation — the declarative equivalent of the
    reference's buffer-evict-fire loop, minus its artifacts.
    """
    ts = _as_timestamp(t.df, time_col)
    win = F.window(ts, size, hop)
    out = (
        t.df.groupBy(win.alias("__w"), *[F.col(p) for p in partition_by])
        .agg(*[v.alias(k) for k, v in aggs.items()])
        .withColumn("window_start", F.unix_millis(F.col("__w.start")))
        .withColumn("window_end", F.unix_millis(F.col("__w.end")))
        .drop("__w")
    )
    return Table(out, t.name + "_slide")


def session(
    t: Table,
    time_col: str,
    gap: str,
    partition_by: Sequence[str],
    **aggs: Column,
) -> Table:
    """Session window (ref window/SessionWindow.java:93-123,
    InThreadSessionWindow.java:50-136): per-key sessions close when the
    next event is >= gap after the last.

    Note the reference's session end is lastTime+1 ms
    (InThreadSessionWindow fires [firstTime, lastTime+1)); Spark's
    session_window end is lastTime+gap. We emit BOTH window bounds as
    session_start/session_end (Spark semantics) — callers needing the
    reference's bound can compute max(time)+1 via an agg.
    """
    ts = _as_timestamp(t.df, time_col)
    win = F.session_window(ts, gap)
    out = (
        t.df.groupBy(win.alias("__w"), *[F.col(p) for p in partition_by])
        .agg(*[v.alias(k) for k, v in aggs.items()])
        .withColumn("session_start", F.unix_millis(F.col("__w.start")))
        .withColumn("session_end", F.unix_millis(F.col("__w.end")))
        .drop("__w")
    )
    return Table(out, t.name + "_session")


def over_by_size(
    t: Table,
    partition_by: Sequence[str],
    order_by: Sequence[ColumnLike],
    n: int,
    **aggs: Column,
) -> Table:
    """Trailing count window, ROWS (n-1) PRECEDING .. CURRENT ROW —
    computed for EVERY row, appended as new columns (ref
    window/OverWindowBySize.java:54-89, function/OverFunction.java).

    `aggs` values are ordinary aggregate Columns; they're bound to the
    frame here.
    """
    spec = (
        W.partitionBy(*[F.col(p) for p in partition_by])
        .orderBy(*[_col(o) for o in order_by])
        .rowsBetween(-(n - 1), 0)
    )
    cols = {k: v.over(spec) for k, v in aggs.items()}
    return Table(t.df.withColumns(cols), t.name + "_overn")


def over_by_duration(
    t: Table,
    partition_by: Sequence[str],
    time_col: str,
    duration_ms: int,
    **aggs: Column,
) -> Table:
    """Trailing time window, RANGE duration PRECEDING .. CURRENT ROW per
    key (ref window/OverWindowByDuration.java:63-92,
    InThreadOverWindow.java:38-104). Ordering key is epoch-ms.

    The reference evicts rows with time < current - size + 1, i.e. the
    frame is [current - duration + 1, current] — rangeBetween is
    inclusive on both ends so the Spark frame is (-(duration-1), 0).
    """
    dtype = dict(t.df.dtypes).get(time_col)
    order = (
        F.col(time_col)
        if dtype in ("bigint", "int", "long")
        else F.unix_millis(F.col(time_col))
    )
    spec = (
        W.partitionBy(*[F.col(p) for p in partition_by])
        .orderBy(order)
        .rangeBetween(-(duration_ms - 1), 0)
    )
    cols = {k: v.over(spec) for k, v in aggs.items()}
    return Table(t.df.withColumns(cols), t.name + "_overd")


def session_capped(
    df: DataFrame,
    time_col: str,
    key_cols: Sequence[str],
    gap_ms: int,
    cap_ms: int,
) -> DataFrame:
    """Sessionization with BOTH an inactivity gap and a hard duration
    cap — the production variant `session_window` lacks: real
    analytics sessions split at 30 min of silence OR at a hard ceiling
    (bots, long-lived tabs) measured from the session's first event.

    Two window passes per key, no self-join:
      1. gap sessions: cumulative sum of (this event starts >= gap_ms
         after the previous) flags;
      2. cap sub-split: within each gap session, sub_id =
         floor((t - session_first_t) / cap_ms) — exact for a cap
         anchored at the session's first event.
    Returns the input plus (session_id string, session_start bigint) —
    session_id is '<gapid>_<subid>' per key.

    Scale: both windows shuffle once on the key; state per row is a
    running counter — the same cost as any per-key ordered window."""
    keys = [F.col(k) for k in key_cols]
    w = W.partitionBy(*keys).orderBy(F.col(time_col))
    prev = F.lag(time_col, 1).over(w)
    new_flag = (
        F.when(prev.isNull() | (F.col(time_col) - prev >= gap_ms), 1).otherwise(0)
    )
    gap_id = F.sum(new_flag).over(
        W.partitionBy(*keys).orderBy(F.col(time_col)).rowsBetween(
            W.unboundedPreceding, 0
        )
    )
    out = df.withColumn("__gid", gap_id)
    wg = W.partitionBy(*keys, F.col("__gid"))
    first_t = F.min(time_col).over(wg)
    sub_id = F.floor((F.col(time_col) - first_t) / cap_ms).cast("long")
    return (
        out.withColumn("__sub", sub_id)
        .withColumn(
            "session_id",
            F.concat_ws("_", F.col("__gid").cast("string"), F.col("__sub")),
        )
        .withColumn(
            "session_start",
            F.min(time_col).over(
                W.partitionBy(*keys, F.col("__gid"), F.col("__sub"))
            ).cast("long"),
        )
        .drop("__gid", "__sub")
    )
