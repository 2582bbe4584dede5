"""Streaming time windows over Structured Streaming.

ref window/SlideWindow.java:283-373, TumbleWindow.java:10-50,
SessionWindow.java:93-123, TimeWindow.java:72-136 (watermark reorder
buffer, default 1000 ms).

Semantics mapping (SURVEY §2.6 deltas):
  * The reference buffers & reorders rows for `watermark` ms, then
    fires a window when event time passes its end. Spark instead keeps
    window state open until the watermark passes the end and emits on
    the trigger — identical FINAL per-window aggregates, different
    firing cadence. Correctness is defined on final aggregates.
  * Late rows beyond the watermark: reference fires standalone
    single-element windows (SlideWindow.java:254-261 — an artifact);
    Spark drops them. Keep late data inside the watermark.
  * No-data advance (TimeWindow.java:110 wall-clock extrapolation) has
    no declarative analog; processing-time triggers fire regardless of
    data, which covers the operational need.

Column contract matches the batch variants (operators/windows.py):
window bounds surface as `window_start`/`window_end` epoch-ms BIGINT.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "1 second"  # ref window/TimeWindow.java:32


def _with_event_time(sdf: DataFrame, time_col: str) -> tuple[DataFrame, str]:
    """Normalize the event-time column to TimestampType for watermarking
    (the reference's only time type is epoch-ms BIGINT)."""
    dtype = dict(sdf.dtypes).get(time_col)
    if dtype in ("bigint", "int", "long"):
        sdf = sdf.withColumn("__event_time", F.timestamp_millis(F.col(time_col)))
        return sdf, "__event_time"
    return sdf.withColumn("__event_time", F.col(time_col).cast("timestamp")), "__event_time"


def _emit(grouped: DataFrame, window_field: str = "window") -> DataFrame:
    out_cols = [
        F.unix_millis(F.col(f"{window_field}.start")).alias("window_start"),
        F.unix_millis(F.col(f"{window_field}.end")).alias("window_end"),
        *[c for c in grouped.columns if c != window_field],
    ]
    return grouped.select(*out_cols)


def stream_tumble(
    sdf: DataFrame,
    time_col: str,
    size: str,
    partition_by: Sequence[str],
    watermark: str = DEFAULT_WATERMARK,
    **aggs: Column,
) -> DataFrame:
    """Streaming tumbling window (ref TumbleWindow = slide with H=S)."""
    return stream_slide(sdf, time_col, size, size, partition_by, watermark, **aggs)


def stream_slide(
    sdf: DataFrame,
    time_col: str,
    size: str,
    hop: str,
    partition_by: Sequence[str],
    watermark: str = DEFAULT_WATERMARK,
    **aggs: Column,
) -> DataFrame:
    """Streaming hopping window (ref SlideWindow.slide:283-373). Spark
    assigns every hop membership declaratively; keyed state lives behind
    the implicit shuffle on (window, keys) — the reference's `rehash` +
    per-thread buffers (window/Window.java:10-14), managed."""
    sdf, et = _with_event_time(sdf, time_col)
    sdf = sdf.withWatermark(et, watermark)
    grouped = sdf.groupBy(
        F.window(F.col(et), size, hop).alias("window"),
        *[F.col(c) for c in partition_by],
    ).agg(*[c.alias(n) for n, c in aggs.items()])
    return _emit(grouped)


def stream_dedup_exact(
    sdf: DataFrame,
    time_col: str,
    keys: Sequence[str] | None = None,
    watermark: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Streaming exact deduplication — the training-pipeline ingest op:
    keep the first occurrence of each fingerprint (or explicit key set).

    With `watermark` set, uses dropDuplicatesWithinWatermark: state for
    a fingerprint is evicted once the watermark passes it — bounded
    state, dedup only within the watermark horizon (the 100 TB
    configuration). Without it, state grows unboundedly but dedup is
    global (bounded replays / small streams)."""
    from table_computing_spark.operators.text import fingerprint

    if keys is None:
        sdf = sdf.withColumn("fingerprint", fingerprint(F.col(text_col)))
        keys = ["fingerprint"]
    if watermark is not None:
        sdf, et = _with_event_time(sdf, time_col)
        sdf = sdf.withWatermark(et, watermark)
        return sdf.dropDuplicatesWithinWatermark(list(keys)).drop("__event_time")
    return sdf.dropDuplicates(list(keys))


def stream_session(
    sdf: DataFrame,
    time_col: str,
    gap: str,
    partition_by: Sequence[str],
    watermark: str = DEFAULT_WATERMARK,
    **aggs: Column,
) -> DataFrame:
    """Streaming session window (ref SessionWindow.session:93-123 —
    per-key gap timeout; session end = lastTime + gap). Spark's
    session_window merges on gap identically (boundary delta: the
    reference closes at >= gap, Spark at > gap — SURVEY §2.6)."""
    sdf, et = _with_event_time(sdf, time_col)
    sdf = sdf.withWatermark(et, watermark)
    grouped = sdf.groupBy(
        F.session_window(F.col(et), gap).alias("session"),
        *[F.col(c) for c in partition_by],
    ).agg(*[c.alias(n) for n, c in aggs.items()])
    out_cols = [
        F.unix_millis(F.col("session.start")).alias("session_start"),
        F.unix_millis(F.col("session.end")).alias("session_end"),
        *[c for c in grouped.columns if c != "session"],
    ]
    return grouped.select(*out_cols)
