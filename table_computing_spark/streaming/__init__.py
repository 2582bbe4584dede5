"""Structured-Streaming surface: watermarked windows, refreshing
dimension joins, stateful over-windows, and the StreamProcessing facade
(SURVEY.md §2.6/§2.8 → Spark Structured Streaming)."""

from table_computing_spark.streaming.dimension import DimensionTable
from table_computing_spark.streaming.processing import StreamProcessing
from table_computing_spark.streaming.windows import (
    stream_session,
    stream_slide,
    stream_tumble,
)

__all__ = [
    "DimensionTable",
    "StreamProcessing",
    "stream_session",
    "stream_slide",
    "stream_tumble",
]
