"""Stateful streaming over-windows via applyInPandasWithState.

ref window/OverWindowBySize.java:54-89 — per key, a ring buffer of the
last N rows (SortedTable by orderBy cols); EVERY input row gets agg
columns computed over the buffer ending at that row.
ref window/OverWindowByDuration.java:63-92 + InThreadOverWindow.java:38-104
— same, but the buffer is a trailing time range [t - size + 1, t].

The reference reaches these semantics with hand-managed per-thread maps
behind a `rehash`; here the shuffle is the groupBy and the buffer lives
in the state store (checkpointable, fault-tolerant — strictly more than
the reference, which loses state on crash; README.md:141-152).

State is the trailing buffer serialized as a JSON string — schema-stable
across arbitrary input columns, and bounded: N rows (by-size) or one
time-range of rows (by-duration) per key.

Batch equivalents with identical semantics: operators/windows.py
over_by_size / over_by_duration (WindowSpec frames) — the correctness
oracle for these functions (tests/test_streaming.py compares both).
"""

from __future__ import annotations

import json
import math
from collections.abc import Callable, Sequence
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

RowAgg = Callable[[pd.DataFrame], dict[str, Any]]
"""(trailing buffer ending at the current row) → {output col → value} —
the OverFunction.agg(key, bufferRows) analog (function/OverFunction.java:7-10)."""


class VectorizedRowAgg:
    """Batch-at-once variant of RowAgg for aggregates pandas can roll
    (sum/count/mean/min/max...): `fn(history, n_old)` sees the whole
    key history (state buffer + sorted batch) and returns a DataFrame
    of the added columns aligned to rows [n_old:]. Same semantics as
    the per-row loop, ~100x less Python dispatch — use it when the
    aggregate is expressible as a pandas rolling; fall back to a plain
    RowAgg for arbitrary buffer functions."""

    def __init__(self, fn: Callable[[pd.DataFrame, int], pd.DataFrame]):
        self.fn = fn


def _run_buffered(
    pdfs: Iterator[pd.DataFrame],
    state,
    order_col: str,
    agg_fn: RowAgg | VectorizedRowAgg,
    added_cols: list[str],
    keep_fn: Callable[[pd.DataFrame], pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    if state.exists:
        buf = pd.read_json(state.get[0], orient="table")
    else:
        buf = None
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values(order_col, kind="mergesort").reset_index(drop=True)
    history = batch if buf is None else pd.concat([buf, batch], ignore_index=True)
    n_old = 0 if buf is None else len(buf)
    if isinstance(agg_fn, VectorizedRowAgg):
        added = agg_fn.fn(history, n_old)
        for c in added_cols:
            batch[c] = added[c].values
    else:
        out_rows = {c: [] for c in added_cols}
        for i in range(len(batch)):
            upto = history.iloc[: n_old + i + 1]
            trailing = keep_fn(upto)
            vals = agg_fn(trailing)
            for c in added_cols:
                out_rows[c].append(vals[c])
        for c in added_cols:
            batch[c] = out_rows[c]
    keep = keep_fn(history)
    state.update((keep.to_json(orient="table"),))
    yield batch


def stream_over_by_size(
    sdf: DataFrame,
    partition_by: Sequence[str],
    order_col: str,
    n: int,
    agg_fn: RowAgg,
    added_fields: Sequence[T.StructField],
) -> DataFrame:
    """Streaming trailing count window: ROWS (n-1) PRECEDING → CURRENT
    per key, agg recomputed on every row (ref OverWindowBySize.java:54-89).

    Rows must arrive per key in nondecreasing `order_col` across
    micro-batches (the reference throws OutOfOrderException otherwise —
    table/SlideTableByColumn.java:36-44; feed through a watermark/sorted
    source for the same guarantee)."""
    out_schema = T.StructType(list(sdf.schema.fields) + list(added_fields))
    state_schema = T.StructType([T.StructField("buf", T.StringType())])
    added = [f.name for f in added_fields]

    def fn(key, pdfs, state):
        yield from _run_buffered(
            pdfs, state, order_col, agg_fn, added, lambda h: h.iloc[-n:]
        )

    return sdf.groupBy(*partition_by).applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout"
    )


def stream_over_by_duration(
    sdf: DataFrame,
    partition_by: Sequence[str],
    time_col_ms: str,
    duration_ms: int,
    agg_fn: RowAgg,
    added_fields: Sequence[T.StructField],
) -> DataFrame:
    """Streaming trailing time window: RANGE (duration-1) PRECEDING →
    CURRENT per key over an epoch-ms column (ref
    OverWindowByDuration.java:63-92 — buffer [t - size + 1, t])."""
    out_schema = T.StructType(list(sdf.schema.fields) + list(added_fields))
    state_schema = T.StructType([T.StructField("buf", T.StringType())])
    added = [f.name for f in added_fields]

    def keep(h: pd.DataFrame) -> pd.DataFrame:
        cutoff = h[time_col_ms].iloc[-1] - duration_ms + 1
        return h[h[time_col_ms] >= cutoff]

    def fn(key, pdfs, state):
        yield from _run_buffered(pdfs, state, time_col_ms, agg_fn, added, keep)

    return sdf.groupBy(*partition_by).applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout"
    )


SessionTransform = Callable[[tuple, pd.DataFrame, int, int], pd.DataFrame]
"""(key, session rows, session_start_ms, session_end_ms) → output rows —
the TimeWindowFunction analog (function/TimeWindowFunction.java:7-12):
the raw-row session variant that plain `session_window` aggregation
cannot express."""


def stream_session_apply(
    sdf: DataFrame,
    partition_by: Sequence[str],
    event_time_col: str,
    gap_ms: int,
    transform: SessionTransform,
    output_schema: T.StructType,
    watermark: str = "1 second",
) -> DataFrame:
    """Gap-based session windows firing a RAW-ROW transform per session
    (ref window/SessionWindow.java:93-123 + InThreadSessionWindow.java:50-136
    with a TimeWindowFunction: the user function sees every buffered row
    of the session and may emit any number of output rows).

    Mechanics: per key, buffer rows in state. A session fires when
      (a) a new row arrives >= gap after the buffered last time — the
          reference's in-band close (InThreadSessionWindow.java:50-57), or
      (b) the event-time watermark passes lastTime + gap — the timeout
          path (the reference's no-data flush, extrapolated wall clock;
          here the declarative watermark clock).
    Session bounds are [firstTime, lastTime + 1) exactly like the
    reference (SessionWindowTest.java:21-126 asserts e.g. [3,14) for
    gap=10).

    `event_time_col` must be a TimestampType column with a watermark —
    this function applies `withWatermark(event_time_col, watermark)`.
    The epoch-ms time used for gap logic is derived from it.
    """
    sdf = sdf.withWatermark(event_time_col, watermark)
    state_schema = T.StructType([T.StructField("buf", T.StringType())])
    tcol = event_time_col

    def fn(key, pdfs, state):
        import pandas as pd  # noqa: F811 — worker-side import

        if state.exists:
            buf = pd.read_json(state.get[0], orient="table")
        else:
            buf = None

        if state.hasTimedOut:
            # watermark passed lastTime + gap → flush the open session
            if buf is not None and len(buf):
                t_ms = (buf[tcol].astype("int64") // 1_000_000).tolist()
                out = transform(key, buf, t_ms[0], t_ms[-1] + 1)
                state.remove()
                if out is not None and len(out):
                    yield out
            else:
                state.remove()
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(tcol, kind="mergesort").reset_index(drop=True)
        history = batch if buf is None else pd.concat([buf, batch], ignore_index=True)
        # a within-watermark late row can precede buffered rows; re-sort
        # the full history (stable) so gaps, bounds, and the timeout
        # timestamp (t_ms[-1]) are computed on monotonic times
        history = history.sort_values(tcol, kind="mergesort").reset_index(drop=True)
        t_ms = (history[tcol].astype("int64") // 1_000_000).to_numpy()

        # split history into sessions at gaps >= gap_ms
        start = 0
        for i in range(1, len(history)):
            if t_ms[i] - t_ms[i - 1] >= gap_ms:
                rows = history.iloc[start:i]
                out = transform(key, rows, int(t_ms[start]), int(t_ms[i - 1]) + 1)
                if out is not None and len(out):
                    yield out
                start = i
        open_rows = history.iloc[start:].reset_index(drop=True)
        state.update((open_rows.to_json(orient="table"),))
        # flush when the watermark passes lastTime + gap
        state.setTimeoutTimestamp(int(t_ms[-1]) + gap_ms)

    return sdf.groupBy(*partition_by).applyInPandasWithState(
        fn, output_schema, state_schema, "append", "EventTimeTimeout"
    )


def stream_session_wallclock(
    sdf: DataFrame,
    partition_by: Sequence[str],
    time_col: str,
    gap_ms: int,
    transform: SessionTransform,
    output_schema: T.StructType,
    idle_flush_ms: int | None = None,
) -> DataFrame:
    """Gap-based raw-row sessions with the reference's NO-DATA WALL-CLOCK
    advance (ref window/TimeWindow.java:110, SlideWindow.java:304-324:
    `now − lastDataSystemTime + lastDataTime` extrapolation fires windows
    during input silence; SURVEY §7.2 M4).

    stream_session_apply's event-time timeout only fires when a NEW row
    advances the watermark — a stream that goes quiet never flushes its
    open sessions. Here the timeout clock is PROCESSING time
    (ProcessingTimeTimeout + setTimeoutDuration): a key silent for
    `idle_flush_ms` of wall clock (default: gap_ms) fires its buffered
    session even though no data arrived. In-band gap splitting is
    identical to stream_session_apply; session bounds are
    [firstTime, lastTime + 1) like the reference.

    Wall-clock firing is inherently run-dependent, so this operator is
    for liveness (dashboards/alerting), excluded from the value-hash
    correctness oracle by design (SURVEY §4.3) — pytest pins the
    behavior instead (a session MUST fire with no new data).

    `time_col` may be epoch-ms BIGINT or TimestampType; no watermark is
    required (nothing here depends on event-time progress)."""
    idle = gap_ms if idle_flush_ms is None else idle_flush_ms
    state_schema = T.StructType([T.StructField("buf", T.StringType())])
    tcol = time_col

    def _ms(series: "pd.Series") -> "pd.Series":
        if str(series.dtype).startswith("datetime64"):
            return series.astype("int64") // 1_000_000
        return series.astype("int64")

    def fn(key, pdfs, state):
        import pandas as pd  # noqa: F811 — worker-side import

        buf = pd.read_json(state.get[0], orient="table") if state.exists else None

        if state.hasTimedOut:
            # wall clock went silent past the idle horizon → flush the
            # open session with no new data (the M4 behavior)
            if buf is not None and len(buf):
                t_ms = _ms(buf[tcol]).tolist()
                out = transform(key, buf, int(t_ms[0]), int(t_ms[-1]) + 1)
                state.remove()
                if out is not None and len(out):
                    yield out
            else:
                state.remove()
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(tcol, kind="mergesort").reset_index(drop=True)
        history = batch if buf is None else pd.concat([buf, batch], ignore_index=True)
        # a cross-batch late row can land before buffered rows — re-sort
        # the full history (stable) so gap splits and [first, last+1)
        # bounds stay correct, matching single-batch behavior
        history = history.sort_values(tcol, kind="mergesort").reset_index(drop=True)
        t_ms = _ms(history[tcol]).to_numpy()

        start = 0
        for i in range(1, len(history)):
            if t_ms[i] - t_ms[i - 1] >= gap_ms:
                rows = history.iloc[start:i]
                out = transform(key, rows, int(t_ms[start]), int(t_ms[i - 1]) + 1)
                if out is not None and len(out):
                    yield out
                start = i
        open_rows = history.iloc[start:].reset_index(drop=True)
        state.update((open_rows.to_json(orient="table"),))
        state.setTimeoutDuration(idle)

    return sdf.groupBy(*partition_by).applyInPandasWithState(
        fn, output_schema, state_schema, "append", "ProcessingTimeTimeout"
    )


def stream_session_tws(
    sdf: DataFrame,
    partition_by: Sequence[str],
    time_col: str,
    gap_ms: int,
    transform: SessionTransform,
    output_schema: T.StructType,
    idle_flush_ms: int | None = None,
) -> DataFrame:
    """stream_session_wallclock on Spark 4's transformWithState API —
    the engine-native form of the reference's wall-clock no-data window
    advance (SURVEY §7.2 M4 names exactly this tool): per-key ValueState
    holds the open session buffer and an explicit REGISTERED TIMER fires
    `handleExpiredTimer` after `idle_flush_ms` of processing-time
    silence, flushing the session with no new input.

    vs the applyInPandasWithState variant: timers are first-class (one
    per key, re-registered on every batch; stale firings are filtered by
    the deadline kept in state), state is typed instead of a
    single-string convention, and the state store must be RocksDB
    (transformWithState's backend requirement — set
    spark.sql.streaming.stateStore.providerClass accordingly).

    Session semantics are identical: in-band splits at gaps >= gap_ms,
    bounds [firstTime, lastTime + 1), `time_col` epoch-ms BIGINT or
    TimestampType.

    CONTAINER LIMITATION: transformWithState's Python RUNNER imports
    protobuf, which this build environment lacks (and installs are
    prohibited), so the end-to-end pytest skips unless protobuf is
    importable. The processor LOGIC itself is protobuf-free and built
    by the module-level `make_session_processor` factory, which pytest
    drives directly with fake handle/state/timer objects — in-band
    splitting, timer re-arm, superseded-timer filtering, and the
    no-data expiry flush are all CI-proven; only Spark's wire runner
    is env-waived. stream_session_wallclock (applyInPandasWithState)
    is the end-to-end-executed variant here; this one is the
    API-of-record for deployments with a full PySpark dependency set."""
    idle = gap_ms if idle_flush_ms is None else idle_flush_ms
    return sdf.groupBy(*partition_by).transformWithStateInPandas(
        make_session_processor(time_col, gap_ms, idle, transform),
        outputStructType=output_schema,
        outputMode="Append",
        timeMode="ProcessingTime",
    )


def make_session_processor(time_col, gap_ms, idle, transform):
    """Build the transformWithState session processor (see
    stream_session_tws). Module-level so its semantics are unit-
    testable without the protobuf-dependent Spark runner."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    tcol = time_col
    state_schema = T.StructType(
        [T.StructField("buf", T.StringType()), T.StructField("deadline", T.LongType())]
    )

    def _ms(series: "pd.Series") -> "pd.Series":
        if str(series.dtype).startswith("datetime64"):
            return series.astype("int64") // 1_000_000
        return series.astype("int64")

    class _SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState("session", state_schema)

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd  # noqa: F811 — worker-side import

            existing = self._state.get() if self._state.exists() else None
            buf = pd.read_json(existing[0], orient="table") if existing else None
            batch = pd.concat(list(rows), ignore_index=True)
            batch = batch.sort_values(tcol, kind="mergesort").reset_index(drop=True)
            history = batch if buf is None else pd.concat([buf, batch], ignore_index=True)
            # re-sort the concatenated history: a cross-batch late row
            # must not leave t_ms non-monotonic (see wallclock variant)
            history = history.sort_values(tcol, kind="mergesort").reset_index(drop=True)
            t_ms = _ms(history[tcol]).to_numpy()

            start = 0
            for i in range(1, len(history)):
                if t_ms[i] - t_ms[i - 1] >= gap_ms:
                    out = transform(key, history.iloc[start:i], int(t_ms[start]), int(t_ms[i - 1]) + 1)
                    if out is not None and len(out):
                        yield out
                    start = i
            open_rows = history.iloc[start:].reset_index(drop=True)
            deadline = timer_values.getCurrentProcessingTimeInMs() + idle
            self._state.update((open_rows.to_json(orient="table"), deadline))
            # one live timer per key: re-arm on every batch; firings of
            # superseded timers are ignored against the stored deadline
            self._handle.registerTimer(deadline)

        def handleExpiredTimer(self, key, timer_values, expired_timer_info):
            import pandas as pd  # noqa: F811 — worker-side import

            self._handle.deleteTimer(expired_timer_info.getExpiryTimeInMs())
            if not self._state.exists():
                return
            buf_json, deadline = self._state.get()
            if expired_timer_info.getExpiryTimeInMs() < deadline:
                return  # superseded by a newer batch's re-arm
            buf = pd.read_json(buf_json, orient="table")
            self._state.clear()
            if len(buf):
                t_ms = _ms(buf[tcol]).tolist()
                out = transform(key, buf, int(t_ms[0]), int(t_ms[-1]) + 1)
                if out is not None and len(out):
                    yield out

        def close(self) -> None:
            pass

    return _SessionProcessor()


def stream_session_capped(
    sdf: DataFrame,
    partition_by: Sequence[str],
    event_time_col: str,
    gap_ms: int,
    cap_ms: int,
    watermark: str = "1 second",
) -> DataFrame:
    """Streaming twin of operators/windows.session_capped: gap-closed
    sessions (state + watermark timeout via stream_session_apply)
    sub-split at hard `cap_ms` boundaries anchored at each session's
    first event. The cap split is a pure function of a CLOSED
    session's rows, so it composes as a session transform — no new
    state shape, the same in-band + timeout close paths, and batch
    equivalence is testable group-for-group.

    Emits one row per event: (keys..., t_ms, session_start, sub_id)
    where session_start is the first event time of the capped
    sub-session — the same grouping batch session_capped assigns."""
    keys = list(partition_by)
    out_schema = T.StructType(
        [T.StructField(k, T.LongType()) for k in keys]
        + [
            T.StructField("t_ms", T.LongType()),
            T.StructField("session_start", T.LongType()),
            T.StructField("sub_id", T.LongType()),
        ]
    )

    def transform(key, rows, start_ms, end_ms):
        import pandas as pd

        t = (rows[event_time_col].astype("int64") // 1_000_000).to_numpy()
        sub = (t - t[0]) // cap_ms
        starts = {s: int(t[sub == s].min()) for s in set(sub.tolist())}
        data = {k: [key[i]] * len(t) for i, k in enumerate(keys)}
        data["t_ms"] = t.tolist()
        data["session_start"] = [starts[s] for s in sub.tolist()]
        data["sub_id"] = [int(s) for s in sub.tolist()]
        return pd.DataFrame(data)

    return stream_session_apply(
        sdf, keys, event_time_col, gap_ms, transform, out_schema, watermark
    )


def stream_running_balance(
    sdf: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    delta_col: str,
    floor: float = 0.0,
    scale: int = 2,
) -> DataFrame:
    """Streaming face of temporal.bounded_running_balance: per-key
    integer-cent state (balance, event count, stockout count) carried
    across micro-batches; each batch's rows fold in `order_cols` order
    on top of the persisted state, so the clamp semantics are
    IDENTICAL to the batch fold over the full history (pytest-pinned).
    Rows must arrive per key in nondecreasing order across batches —
    the same contract as stream_over_by_size (feed through a
    watermark/sorted source).

    Emits one row per (key, micro-batch) with the post-batch state:
    (keys..., n_events, final_balance, n_stockouts) — the last emitted
    row per key is the full-history answer. State is three longs per
    key, forever-bounded."""
    cents = int(10**scale)
    floor_c = int(round(floor * cents))
    keys = list(key_cols)
    ocols = list(order_cols)
    out_schema = T.StructType(
        [sdf.schema[k] for k in keys]
        + [
            T.StructField("n_events", T.LongType()),
            T.StructField("final_balance", T.DoubleType()),
            T.StructField("n_stockouts", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("bal", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("n_stockouts", T.LongType()),
        ]
    )

    def fn(key, pdfs, state):
        bal, n_ev, n_so = state.get if state.exists else (0, 0, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            # HALF_UP away from zero, like Spark round(); floor(x+0.5)
            # would shift negative half-cents by one
            batch = batch.assign(
                __dc=[
                    int(math.copysign(math.floor(abs(float(d)) * cents + 0.5), d))
                    for d in batch[delta_col]
                ]
            ).sort_values(ocols + ["__dc"], kind="mergesort")
            for dc in batch["__dc"]:
                if bal + dc < floor_c:
                    n_so += 1
                bal = max(bal + dc, floor_c)
                n_ev += 1
        state.update((int(bal), int(n_ev), int(n_so)))
        yield pd.DataFrame(
            {
                **{k: [key[i]] for i, k in enumerate(keys)},
                "n_events": [n_ev],
                "final_balance": [round(bal / cents, scale)],
                "n_stockouts": [n_so],
            }
        )

    return sdf.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout"
    )


def stream_page_hinkley(
    sdf: DataFrame,
    partition_by: Sequence[str],
    order_col: str,
    value_col: str,
    delta: float = 0.0,
    lam: float = 50.0,
) -> DataFrame:
    """Streaming Page–Hinkley upward change detection per key — the
    maintained twin of operators/temporal.page_hinkley, with the
    matview decomposition: the PH recursion is FULLY incremental
    (state per key = n, Σx, m, running-min m — four scalars; no
    history buffer at all), so each micro-batch extends the statistic
    exactly where the batch operator would, and the union of all
    emitted rows equals the batch output row-for-row (the
    q_stream_ohlc gate shape).

    Rows must arrive per key in nondecreasing `order_col` across
    micro-batches (the stream_over_by_size ordering contract); within
    a batch they are sorted. Increments are nano-quantized BEFORE the
    running sum (the batch operator's rule), accumulated in Python
    ints inside the JSON state (arbitrary precision — no wrap), and
    the per-batch extension is one numpy cumsum/accumulate pass, not a
    per-row loop. Output: input key/order/value rows + (ph, alarm)."""
    out_schema = T.StructType(
        [f for f in sdf.schema.fields if f.name in (*partition_by, order_col, value_col)]
        + [T.StructField("ph", T.DoubleType()), T.StructField("alarm", T.BooleanType())]
    )
    state_schema = T.StructType([T.StructField("buf", T.StringType())])
    cols = [*partition_by, order_col, value_col]

    def fn(key, pdfs, state):
        import json as _json

        import numpy as np

        if state.exists:
            st = _json.loads(state.get[0])
        else:
            st = {"n": 0, "sum": 0, "m": 0, "min": 0}
        batch = pd.concat(list(pdfs), ignore_index=True)[cols]
        batch = batch.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        x = batch[value_col].to_numpy(dtype="float64")
        k = len(x)
        run_n = st["n"] + np.arange(1, k + 1, dtype="float64")
        run_sum = float(st["sum"]) + np.cumsum(x)
        # HALF_UP (away from zero), matching Spark's F.round — np.rint
        # would round half-to-even and diverge on exact .5 nano ties
        raw = (x - run_sum / run_n - delta) * 1e9
        terms = (np.sign(raw) * np.floor(np.abs(raw) + 0.5)).astype("int64")
        m = st["m"] + np.cumsum(terms)
        mins = np.minimum.accumulate(np.concatenate(([st["min"]], m)))[1:]
        ph = (m - mins) / 1e9
        # HALF_UP again for the 6-decimal readout (ph is nano-exact, so
        # a .5 micro tie is reachable); alarm tests the UNROUNDED value
        batch["ph"] = np.floor(ph * 1e6 + 0.5) / 1e6  # ph >= 0 by construction
        batch["alarm"] = ph > lam
        state.update((
            _json.dumps({
                "n": int(st["n"] + k),
                "sum": int(st["sum"] + int(np.sum(x.astype("int64")))),
                "m": int(m[-1]) if k else st["m"],
                "min": int(mins[-1]) if k else st["min"],
            }),
        ))
        yield batch

    return sdf.groupBy(*partition_by).applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout"
    )
