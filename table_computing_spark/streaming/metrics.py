"""Streaming observability — the reference's metrics loggers, Spark-first.

ref sp/Throughput.java:18-64 (rows/sec per named stage, logged each
interval), sp/Delay.java:16-87 (event-time delay + in-engine residence
time), sp/QueueSizeLogger.java:19-78 (queue depths). Structured
Streaming surfaces the same numbers on every micro-batch through
`StreamingQueryListener` progress events; this module adapts them to
the reference's logging shape, plus programmatic access for tests.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener

log = logging.getLogger("table_computing_spark.metrics")


@dataclass
class BatchMetrics:
    query_name: str
    batch_id: int
    input_rows: int
    rows_per_sec: float
    process_ms: float
    event_time_max: str | None
    watermark: str | None
    state_rows: int


@dataclass
class ThroughputListener(StreamingQueryListener):
    """Collects per-batch throughput/delay/state metrics (Throughput +
    Delay + QueueSizeLogger in one): attach with
    `spark.streams.addListener(listener)`; read `.history` or watch the
    log lines."""

    history: list[BatchMetrics] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        log.info("query started: %s (%s)", event.name, event.id)

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        state = p.get("stateOperators") or []
        m = BatchMetrics(
            query_name=p.get("name") or str(p.get("id")),
            batch_id=p.get("batchId", -1),
            input_rows=p.get("numInputRows", 0),
            rows_per_sec=p.get("processedRowsPerSecond", 0.0),
            process_ms=(p.get("durationMs") or {}).get("triggerExecution", 0),
            event_time_max=(p.get("eventTime") or {}).get("max"),
            watermark=(p.get("eventTime") or {}).get("watermark"),
            state_rows=sum(s.get("numRowsTotal", 0) for s in state),
        )
        self.history.append(m)
        log.info(
            "%s batch %d: %d rows, %.0f rows/s, %.0f ms, state=%d rows",
            m.query_name, m.batch_id, m.input_rows, m.rows_per_sec,
            m.process_ms, m.state_rows,
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        log.info("query terminated: %s", event.id)

    def totals(self) -> dict[str, float]:
        rows = sum(m.input_rows for m in self.history)
        ms = sum(m.process_ms for m in self.history)
        return {
            "input_rows": rows,
            "process_sec": ms / 1000.0,
            "rows_per_sec": rows / (ms / 1000.0) if ms else 0.0,
        }
