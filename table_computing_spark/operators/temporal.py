"""Temporal joins Spark lacks natively: as-of and range (interval).

Neither exists in the reference either (SURVEY §2.3 'not present:
range/as-of/interval joins') — its users hand-roll them inside
JoinCriteria lambdas as index lookups. Here they are first-class,
composed from shuffle-friendly primitives (no UDFs, no cross joins):

  asof_join   — union both sides, one window pass per key: each left
                row picks the latest right row with t_r <= t_l via
                last(ignoreNulls) over (key ORDER BY t, side).
                ONE shuffle on the key — the same cost as an equi-join;
                never builds candidate pairs.
  range_join  — point-in-interval: intervals explode into fixed-width
                buckets, points map to their bucket, candidates meet in
                a bucket equi-join, a residual filter keeps true hits.
                Shuffle is O(points + intervals × spans), never
                O(points × intervals).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    how: str = "inner",
    suffix: str = "_r",
    direction: str = "backward",
    tolerance: "float | None" = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    `right_time` <= `left_time` within the same `on` key (pandas
    merge_asof / DuckDB ASOF JOIN semantics; ties on right_time resolve
    to the last right row in (time, input) order).

    `tolerance` bounds the match's staleness (pandas merge_asof
    tolerance / the feature-store TTL): a match further than
    `tolerance` time units from the left row (older for backward,
    later for forward) is treated as NO match — right columns null for
    how='left', row dropped for how='inner'. Same one-pass plan; the
    bound is one filter on the carried match time.

    direction='forward' flips the match to the SMALLEST
    `right_time` >= `left_time` (next tick / next delivery) — the same
    one-pass union window, ordered descending. With duplicate
    (key, right_time) rows the tie pick follows input order (same
    caveat as backward); pre-aggregate the right side to one row per
    (key, time) when the choice must be engine-deterministic.

    how='left' keeps unmatched left rows (right columns null).
    Right columns that collide with left names get `suffix`.
    """
    if how not in ("inner", "left"):
        raise ValueError("asof_join supports inner/left")
    if direction not in ("backward", "forward"):
        raise ValueError("asof_join direction must be backward/forward")
    keys = list(on)
    lcols = [c for c in left.columns if c not in keys]
    rcols = [c for c in right.columns if c not in keys and c != right_time]
    rnames = {c: (c + suffix if c in left.columns else c) for c in rcols}

    # union layout: keys, time, side (0=right first on time ties → t_r <= t_l
    # is inclusive), left payload, right payload
    lpart = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).cast("double").alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(rnames[c]) for c in rcols],
        F.lit(None).cast("double").alias("__rt"),
    )
    rpart = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).cast("double").alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(rnames[c]) for c in rcols],
        F.col(right_time).cast("double").alias("__rt"),
    )
    u = lpart.unionByName(rpart)
    torder = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        W.partitionBy(*keys)
        .orderBy(torder, F.col("__side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = u.select(
        *keys,
        "__t",
        "__side",
        *lcols,
        *[F.last(rnames[c], ignorenulls=True).over(w).alias(rnames[c]) for c in rcols],
        F.last("__rt", ignorenulls=True).over(w).alias("__rt"),
    )
    out = filled.filter(F.col("__side") == 1)
    if tolerance is not None:
        gap = (
            F.col("__t") - F.col("__rt")
            if direction == "backward"
            else F.col("__rt") - F.col("__t")
        )
        ok = F.col("__rt").isNotNull() & (gap <= F.lit(float(tolerance)))
        out = out.select(
            *keys,
            "__t",
            "__side",
            *lcols,
            *[
                F.when(ok, F.col(rnames[c])).alias(rnames[c])
                for c in rcols
            ],
            F.when(ok, F.col("__rt")).alias("__rt"),
        )
    if how == "inner":
        out = out.filter(F.col("__rt").isNotNull())
    # lcols already carries the original left_time column (typed);
    # __t/__side/__rt were only plumbing
    return out.select(*keys, *lcols, *[rnames[c] for c in rcols])


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: rows of `points` matched to every row of
    `intervals` with start <= point < end — WITHOUT a cross join.

    Each interval registers in ceil(span / bucket_width) buckets; each
    point probes exactly one bucket; the bucket equi-join + residual
    range filter is exact. Pick `bucket_width` near the typical interval
    span: shuffle is O(points + sum(spans)/width).
    """
    if how != "inner":
        raise ValueError("range_join is inner (outer variants via anti-join)")
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_col).cast("double") / bucket_width).cast("bigint")
    )
    # guard on the ORIGINAL typed columns: a double cast collapses
    # sub-ULP intervals at big magnitudes (epoch-ns bigints) and would
    # silently drop their matches; the cast is monotone, so the bucket
    # sequence still never descends for end > start
    i = intervals.where(F.col(end_col) > F.col(start_col)).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("double") / bucket_width).cast("bigint"),
                # end is exclusive, but registering THROUGH floor(end/w)
                # is the only float-safe bound: float division is not
                # strictly monotone, so a point just under a boundary
                # end can still probe the boundary bucket (an absolute
                # epsilon also breaks at small magnitudes). At most one
                # extra bucket per interval; the residual filter is
                # what's exact.
                F.floor(F.col(end_col).cast("double") / bucket_width).cast("bigint"),
            )
        ),
    )
    return (
        p.join(i, "__bucket")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("__bucket")
    )


def transition_counts(
    events: DataFrame,
    key_col: str,
    order_col: str,
    tiebreak_col: str,
    state_col: str,
    session_gap: "int | None" = None,
) -> DataFrame:
    """First-order Markov transition mining over per-key event streams:
    count (from_state -> to_state) pairs of consecutive events, with an
    optional session split (a gap of more than `session_gap` units of
    `order_col` breaks the chain — no transition is counted across it).

    Output: (from_state, to_state, n_transitions, p_transition) where
    p_transition is the row-normalized probability rounded to 6 places
    (exact ratio of two counts — portable across engines).

    Plan: one window shuffle on `key_col` (lag for the predecessor),
    then one hash aggregation keyed (from_state, to_state) plus a
    window over from_state for the normalizing row sums. At 100 TB the
    shuffle moves only (key, order, state) triples; the aggregate
    output is |states|^2 rows at most.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(order_col, tiebreak_col)
    prev_state = F.lag(state_col).over(w)
    pairs = events.select(
        F.col(state_col).alias("to_state"),
        prev_state.alias("from_state"),
        (
            (F.col(order_col) - F.lag(order_col).over(w)) <= F.lit(session_gap)
            if session_gap is not None
            else F.lit(True)
        ).alias("__in_session"),
    ).filter(F.col("from_state").isNotNull() & F.col("__in_session"))
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wf = Window.partitionBy("from_state")
    return counts.select(
        "from_state",
        "to_state",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wf), 6
        ).alias("p_transition"),
    )


def ohlc_bars(
    df: DataFrame,
    key_cols: "list[str]",
    time_col: str,
    tiebreak_col: str,
    value_col: str,
    bar_ms: int,
) -> DataFrame:
    """Time-series downsampling to OHLC bars (open/high/low/close +
    volume), the standard lossy compaction for metric/price streams:
    one hash aggregation keyed (key..., bar_start) — min_by/max_by pick
    open/close by (time, tiebreak), so the result is deterministic
    under any partitioning and reproducible in any engine (values are
    PICKED, never summed — no float-order concerns).

    Shuffle is O(bars), not O(events); at 100 TB this is the first
    stage that makes long-retention metric storage affordable."""
    bar = (F.floor(F.col(time_col) / F.lit(bar_ms)) * F.lit(bar_ms)).alias(
        "bar_start"
    )
    ordkey = F.struct(time_col, tiebreak_col)
    return df.groupBy(*key_cols, bar).agg(
        F.min_by(value_col, ordkey).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(value_col, ordkey).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


def twap(
    df: DataFrame,
    key_cols: "list[str]",
    time_col: str,
    tiebreak_col: str,
    value_col: str,
    window_ms: int,
) -> DataFrame:
    """Time-weighted average per (key, window) — the correct mean for
    irregularly sampled metrics (a value holds until the next
    observation, so sparse spikes must not dominate an arithmetic
    mean). Each observation is weighted by its holding time within the
    window: from its timestamp to the next observation's (clamped to
    the window end).

    DELIBERATE deviation from carry-forward TWAP (r05 ADVICE): the
    [window_start, first_obs) gap is attributed to the FIRST in-window
    observation (carry-BACKWARD), and windows with zero observations
    emit no row. Carry-forward across window boundaries needs the
    previous window's closing value — a per-key ordered scan whose
    state spans windows, which at 100 TB means a second window pass or
    a range self-join per gap. This operator instead stays a single
    lead() + one aggregation; if strict carry-forward semantics are
    required, explode each observation's hold interval across the
    windows it overlaps first and feed the result here (every window
    then has an in-window point at its start). The oracle encodes the
    same carry-backward convention.

    One window shuffle on the key (lead for the next timestamp), one
    hash aggregation — weights are exact integer milliseconds and the
    weighted sum is an exact integer-unit sum (value in micro-units),
    so the result is partitioning- and engine-independent."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(time_col, tiebreak_col)
    win_start = (F.floor(F.col(time_col) / F.lit(window_ms)) * F.lit(window_ms)).cast(
        "long"
    )
    nxt = F.lead(time_col).over(w)
    marked = df.select(
        *key_cols,
        win_start.alias("window_start"),
        F.col(time_col).alias("__t"),
        F.col(tiebreak_col).alias("__tb"),
        F.col(value_col).alias("__v"),
        nxt.alias("__next"),
    )
    win_end = F.col("window_start") + F.lit(window_ms)
    first_in_win = F.row_number().over(
        Window.partitionBy(*key_cols, "window_start").orderBy("__t", "__tb")
    )
    hold_from = F.when(first_in_win == 1, F.col("window_start")).otherwise(
        F.col("__t")
    )
    hold_to = F.least(F.coalesce(F.col("__next"), win_end), win_end)
    weighted = marked.select(
        *key_cols,
        "window_start",
        (hold_to - hold_from).cast("long").alias("__w_ms"),
        F.round(F.col("__v") * 1e6).cast("long").alias("__v_micro"),
    ).filter(F.col("__w_ms") > 0)
    return (
        weighted.groupBy(*key_cols, "window_start")
        .agg(
            # ms×micro products reach ~3.6e16 and their sum overflows
            # int64 — exact decimal accumulation, like moment_stats
            F.sum(
                (F.col("__w_ms") * F.col("__v_micro")).cast("decimal(38,0)")
            ).alias("__num"),
            F.sum("__w_ms").alias("__den"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .select(
            *key_cols,
            "window_start",
            F.round(
                F.col("__num").cast("double")
                / (F.col("__den").cast("double") * F.lit(1e6)),
                6,
            ).alias("twap"),
            "n_obs",
        )
    )


def resample_ffill(
    observations: DataFrame,
    key_col: str,
    time_col: str,
    step: int,
    value_cols: "Sequence[str] | None" = None,
) -> DataFrame:
    """Regularize an irregular time series: per key, emit one row per
    `step` tick from floor(first_obs/step)*step through last_obs, each
    carrying the latest observation at-or-before the tick
    (forward-fill). The standard feature-engineering move before
    sliding-window models — and the batch analog of what a streaming
    job gets from OverWindowByDuration.

    `observations` must be unique per (key, time) — pre-aggregate
    otherwise. The first tick can precede the first observation (when
    first_obs is not step-aligned); it forward-fills nothing and
    carries nulls, which is honest — there is no value to hold yet.

    Scale shape: per-key min/max is one hash aggregate; the grid is
    sequence()+explode — rows (span/step per key) materialize only in
    executors; the fill itself is asof_join's single window pass (no
    per-tick candidate pairs, no self-join). Dense keys with huge
    spans are naturally partitioned by key."""
    vcols = list(value_cols) if value_cols is not None else [
        c for c in observations.columns if c not in (key_col, time_col)
    ]
    bounds = observations.groupBy(key_col).agg(
        F.min(time_col).alias("__lo"), F.max(time_col).alias("__hi")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence(
                (F.floor(F.col("__lo") / step) * step).cast("long"),
                F.col("__hi").cast("long"),
                F.lit(step).cast("long"),
            )
        ).alias("tick"),
    )
    obs = observations.select(key_col, F.col(time_col), *vcols)
    return asof_join(
        grid, obs, on=[key_col], left_time="tick", right_time=time_col, how="left"
    ).select(key_col, "tick", *vcols)


def ema_trailing(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    value_col: str,
    alpha: float = 0.5,
    k: int = 5,
    out_col: str = "ema",
    round_to: int = 6,
) -> DataFrame:
    """Exponentially-weighted moving average over the trailing k
    observations per key — the truncated, renormalized EMA
    (pandas ewm(alpha, min_periods=1) over a k-row window):

        ema_t = Σ_{j=0..k-1} (1-α)^j · x_{t-j}  /  Σ (1-α)^j

    with both sums running over the lags that EXIST (early rows
    renormalize instead of decaying toward zero). The infinite-history
    recursive EMA is deliberately not offered: a per-row recursion
    serializes the partition and its float result depends on history
    length; the truncated form is a fixed k-term expression — exact,
    order-independent, engine-portable, and fully inside whole-stage
    codegen (k lag() calls over one window, zero Python).

    One shuffle on the key; everything else is per-row arithmetic."""
    w = W.partitionBy(*[F.col(c) for c in key_cols]).orderBy(F.col(time_col))
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(k):
        x = F.col(value_col) if j == 0 else F.lag(value_col, j).over(w)
        wt = F.lit((1.0 - alpha) ** j)
        num = num + F.coalesce(x.cast("double"), F.lit(0.0)) * wt
        den = den + F.when(x.isNotNull(), wt).otherwise(F.lit(0.0))
    return df.withColumn(out_col, F.round(num / den, round_to))


def rolling_corr(
    df: DataFrame,
    key_cols: Sequence[str],
    order_by: Sequence[str],
    x_col: str,
    y_col: str,
    n: int = 20,
    x_scale: int = 2,
    y_scale: int = 2,
    out_col: str = "roll_corr",
    round_to: int = 6,
) -> DataFrame:
    """Trailing-n rolling Pearson correlation per key — the pairs-
    trading / factor-monitoring primitive, built on the repo's exact-
    moment discipline: the five windowed sums (Σx, Σy, Σx², Σy², Σxy)
    accumulate INTEGER units (10^-scale resolution) as exact decimals
    over a ROWS (n-1) PRECEDING frame, so every window's moments are
    partitioning-independent and engine-identical; only the final
    closed-form correlation runs in floating point, on identical
    integers in an identical operation order.

    Built-in `corr(x, y) OVER w` would re-accumulate doubles per
    frame — order-dependent in the last ulps, exactly what flips
    boundary comparisons between engines.

    `order_by` must be a TOTAL order (include tiebreak columns):
    window frames over an ambiguous order are nondeterministic in any
    engine. Rows with fewer than `n` trailing observations get the
    correlation of the rows available (m >= 2) or NULL (m < 2 or zero
    variance). One shuffle on the key.

    The five trailing-frame sums are computed as RUNNING-sum
    differences (cum_i − cum_{i−n}) rather than a sliding ROWS frame:
    Spark's sliding-frame aggregation has no retraction, so each row
    re-accumulates its whole n-row frame (O(n) decimal adds per row),
    while the unbounded-preceding frame accumulates once per row and
    lag() is O(1) — a ~n× cut in decimal ops for identical values
    (integer decimals subtract exactly; an all-NULL frame yields
    var = 0 here vs NULL before, and both fall through the var > 0
    guard to the same NULL correlation). The running sums put the
    PARTITION's total in a decimal(38,0) where the frame form only
    ever held n rows — overflow needs |x|·rows ≥ 10^38 per key, far
    beyond any real corpus (10^9 rows of 10^7-unit values is 10^16)."""
    keys = [F.col(k) for k in key_cols]
    xi = F.round(F.col(x_col) * (10**x_scale)).cast("decimal(38,0)")
    yi = F.round(F.col(y_col) * (10**y_scale)).cast("decimal(38,0)")
    base = df.withColumn("__x", xi).withColumn("__y", yi)
    ord_cols = [F.col(c) for c in order_by]
    w_ord = W.partitionBy(*keys).orderBy(*ord_cols)
    w_cum = w_ord.rowsBetween(W.unboundedPreceding, 0)
    cums = base.withColumns(
        {
            "__rn": F.row_number().over(w_ord),
            "__cx": F.sum("__x").over(w_cum),
            "__cy": F.sum("__y").over(w_cum),
            "__cxx": F.sum(F.col("__x") * F.col("__x")).over(w_cum),
            "__cyy": F.sum(F.col("__y") * F.col("__y")).over(w_cum),
            "__cxy": F.sum(F.col("__x") * F.col("__y")).over(w_cum),
        }
    )
    zero = F.lit(0).cast("decimal(38,0)")

    def trail(c: str) -> Column:
        return F.col(c) - F.coalesce(F.lag(c, n).over(w_ord), zero)

    m = F.least(F.col("__rn"), F.lit(n)).cast("decimal(38,0)")
    sx, sy = trail("__cx"), trail("__cy")
    sxx, syy, sxy = trail("__cxx"), trail("__cyy"), trail("__cxy")
    var_x = (m * sxx - sx * sx).cast("double")
    var_y = (m * syy - sy * sy).cast("double")
    num = (m * sxy - sx * sy).cast("double")
    corr = F.when(
        (m.cast("long") >= 2) & (var_x > 0) & (var_y > 0),
        F.round(num / (F.sqrt(var_x) * F.sqrt(var_y)), round_to),
    )
    return cums.withColumn(out_col, corr).drop(
        "__x", "__y", "__rn", "__cx", "__cy", "__cxx", "__cyy", "__cxy"
    )


def funnel_within(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    step_col: str,
    steps: Sequence[str],
    within_ms: int,
) -> DataFrame:
    """Ordered funnel with a PER-STEP completion deadline: step i+1
    counts only if it occurs strictly after step i and within
    `within_ms` of it (first-completion semantics — each step time is
    the EARLIEST qualifying event). The unconstrained funnel
    (q_funnel) answers "did they ever"; product analytics usually
    needs "did they within the hour", and the deadline changes which
    event anchors later steps.

    Returns one row per key that reached step 1: (keys..., t_1..t_k,
    completed_depth) — stalled keys keep their partial prefix, later
    times are null.

    Plan: k-1 forward joins keyed on the key columns, each a
    conditional min-aggregation of one step's events against the
    anchor time — the decorrelated form of k ordered EXISTS
    subqueries with range predicates; no window over the full event
    stream, no self-join of events against events."""
    keys = list(key_cols)
    ev = df.select(*keys, F.col(time_col).alias("__t"), F.col(step_col).alias("__s"))
    cur = (
        ev.where(F.col("__s") == steps[0])
        .groupBy(*keys)
        .agg(F.min("__t").alias("t_1"))
    )
    for i in range(1, len(steps)):
        prev = f"t_{i}"
        nxt = (
            ev.where(F.col("__s") == steps[i])
            .join(cur.select(*keys, prev), keys)
            .where(
                (F.col("__t") > F.col(prev))
                & (F.col("__t") <= F.col(prev) + within_ms)
            )
            .groupBy(*keys)
            .agg(F.min("__t").alias(f"t_{i + 1}"))
        )
        cur = cur.join(nxt, keys, "left")
    depth = F.greatest(
        *[
            F.when(F.col(f"t_{i}").isNotNull(), F.lit(i)).otherwise(F.lit(0))
            for i in range(1, len(steps) + 1)
        ]
    )
    return cur.withColumn("completed_depth", depth.cast("int"))


def path_counts(
    df: DataFrame,
    key_cols: Sequence[str],
    order_by: Sequence[str],
    step_col: str,
    depth: int = 3,
    top_k: int = 20,
    sep: str = ">",
) -> DataFrame:
    """Top-k most frequent `depth`-step event paths across all keys —
    the product-analytics "what do users do next" view that
    generalizes transition_counts (depth=2) to longer sequences.

    One window pass builds each row's forward path from depth-1
    lead()s (rows without depth successors in their key emit
    nothing), one hash aggregation counts paths, and the top-k is a
    TakeOrderedAndProject with a path tiebreak — never a global sort.
    `order_by` must totally order events within a key."""
    keys = [F.col(k) for k in key_cols]
    w = W.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    parts = [F.col(step_col)] + [
        F.lead(step_col, i).over(w) for i in range(1, depth)
    ]
    path = F.when(parts[-1].isNotNull(), F.concat_ws(sep, *parts))
    return (
        df.select(path.alias("path"))
        .where(F.col("path").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(top_k)
    )


def resample_interp(
    observations: DataFrame,
    key_col: str,
    time_col: str,
    step: int,
    value_col: str,
    round_to: int = 6,
    out_col: str = "interp",
) -> DataFrame:
    """resample_ffill's linear-interpolation sibling: per key, one row
    per `step` tick carrying the straight-line value between the
    surrounding observations —

        v(t) = v_prev + (v_next - v_prev) * (t - t_prev)/(t_next - t_prev)

    Ticks at an exact observation time return that observation; ticks
    after the last observation hold it (forward-fill, the pandas
    `interpolate(limit_direction='forward')` contract); ticks before
    the first observation are honestly null. `observations` must be
    unique per (key, time).

    Scale shape: ONE key-shuffle window pass over grid ∪ observations
    (the asof_join union trick run in both directions at once — a
    backward last() and a forward first() in the same window spec
    family), never a per-tick self-join. The float expression is a
    fixed op-order formula on (prev, next, tick), so results are
    engine-portable bit-for-bit before the final round."""
    bounds = observations.groupBy(key_col).agg(
        F.min(time_col).alias("__lo"), F.max(time_col).alias("__hi")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence(
                (F.floor(F.col("__lo") / step) * step).cast("long"),
                F.col("__hi").cast("long"),
                F.lit(step).cast("long"),
            )
        ).alias("tick"),
    )
    gpart = grid.select(
        key_col,
        F.col("tick").cast("long").alias("__t"),
        F.lit(1).alias("__side"),  # tick AFTER same-time obs
        F.lit(None).cast("double").alias("__v"),
    )
    opart = observations.select(
        key_col,
        F.col(time_col).cast("long").alias("__t"),
        F.lit(0).alias("__side"),
        F.col(value_col).cast("double").alias("__v"),
    )
    u = gpart.unionByName(opart)
    wb = (
        W.partitionBy(key_col)
        .orderBy("__t", "__side")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wf = (
        W.partitionBy(key_col)
        .orderBy("__t", "__side")
        .rowsBetween(0, W.unboundedFollowing)
    )
    is_obs = F.col("__side") == 0
    marked = u.select(
        key_col,
        "__t",
        "__side",
        F.last(F.when(is_obs, F.col("__t")), ignorenulls=True).over(wb).alias("__pt"),
        F.last(F.when(is_obs, F.col("__v")), ignorenulls=True).over(wb).alias("__pv"),
        F.first(F.when(is_obs, F.col("__t")), ignorenulls=True).over(wf).alias("__nt"),
        F.first(F.when(is_obs, F.col("__v")), ignorenulls=True).over(wf).alias("__nv"),
    )
    interp = (
        F.when(F.col("__pt").isNull(), F.lit(None).cast("double"))
        .when(
            F.col("__nt").isNull() | (F.col("__nt") == F.col("__pt")),
            F.col("__pv"),
        )
        .otherwise(
            F.col("__pv")
            + (F.col("__nv") - F.col("__pv"))
            * (F.col("__t") - F.col("__pt"))
            / (F.col("__nt") - F.col("__pt"))
        )
    )
    return marked.where(~is_obs).select(
        key_col,
        F.col("__t").alias("tick"),
        F.round(interp, round_to).alias(out_col),
    )


def touch_attribution(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    channel_col: str,
    touch_cond: Column,
    conversion_cond: Column,
    lookback_ms: int,
) -> DataFrame:
    """Marketing-style first/last-touch attribution: for every
    conversion event, find the earliest and latest touch events of the
    same key within `lookback_ms` at-or-before the conversion, plus the
    touch count. Deterministic ties: touches at equal times resolve by
    channel string (ASC for first, DESC for last) — the struct min/max
    total order, mirrored exactly by the oracle's ORDER BY.

    Scale shape: ONE key-shuffle window pass with RANGE frames over the
    epoch-ms order — never a conversions×touches self-join (whose
    candidate volume is conversions × touches-per-lookback). Rows per
    partition are a key's events; the frame scan is linear per row in
    Spark's sliding range-frame implementation."""
    keys = list(key_cols)
    base = df.select(
        *keys,
        F.col(time_col).cast("long").alias("__t"),
        F.col(channel_col).alias("__ch"),
        touch_cond.alias("__is_touch"),
        conversion_cond.alias("__is_conv"),
    )
    w = (
        W.partitionBy(*[F.col(k) for k in keys])
        .orderBy("__t")
        .rangeBetween(-int(lookback_ms), 0)
    )
    tstruct = F.when(
        F.col("__is_touch"), F.struct(F.col("__t").alias("t"), F.col("__ch").alias("ch"))
    )
    out = base.select(
        *keys,
        "__t",
        "__is_conv",
        F.min(tstruct).over(w).alias("__first"),
        F.max(tstruct).over(w).alias("__last"),
        F.sum(F.when(F.col("__is_touch"), 1).otherwise(0)).over(w).alias("n_touches"),
    )
    return out.where(F.col("__is_conv")).select(
        *keys,
        F.col("__t").alias("conv_ms"),
        F.col("__first.ch").alias("first_channel"),
        F.col("__first.t").alias("first_ms"),
        F.col("__last.ch").alias("last_channel"),
        F.col("__last.t").alias("last_ms"),
        F.col("n_touches").cast("long").alias("n_touches"),
    )


def interval_coverage(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Union-of-intervals coverage per key (the islands-and-gaps
    classic): merge overlapping/touching [start, end) intervals and
    report per key the merged island count and the total covered
    length — "how long was this machine actually busy", "what span do
    these sessions really cover" — where naive sum(end-start) double-
    counts every overlap.

    Islands: order intervals by (start, end); an interval starts a new
    island iff its start exceeds the running max of all previous ends
    (strictly — touching intervals [0,5)[5,9) merge). One window pass
    builds the island ids (running sum of new-island flags), one
    aggregation per island, one per key — all on the key shuffle, no
    self-join, no interval pair blowup.

    Returns (keys..., n_intervals, n_islands, covered)."""
    keys = [F.col(k) for k in key_cols]
    w = W.partitionBy(*keys).orderBy(F.col(start_col).asc(), F.col(end_col).asc())
    prev_max_end = F.max(F.col(end_col)).over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "__new_island",
        F.when(
            prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
        ).otherwise(0),
    ).withColumn(
        "__island",
        F.sum("__new_island").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    islands = flagged.groupBy(*keys, F.col("__island")).agg(
        F.min(start_col).alias("__s"),
        F.max(end_col).alias("__e"),
        F.count(F.lit(1)).alias("__n"),
    )
    return islands.groupBy(*keys).agg(
        F.sum("__n").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.col("__e") - F.col("__s")).cast("long").alias("covered"),
    )


def bounded_running_balance(
    df: DataFrame,
    key_cols: Sequence[str],
    order_by: Sequence[str],
    delta_col: str,
    floor: float = 0.0,
    scale: int = 2,
) -> DataFrame:
    """Inventory-style clamped running balance per key: process deltas
    in time order, flooring the balance (stock can't go negative; a
    clamp event is a stockout). This is SEQUENTIAL state a window
    cannot express (the clamp makes each step depend on the clamped
    previous step), so it runs as a per-key ARRAY FOLD: sort_array of
    the (order, delta) structs, then one left-to-right aggregate()
    with integer-cent arithmetic — engine-exact, and DuckDB mirrors it
    with the same fold via list_reduce.

    BOUNDED-GROUP contract: a key's full history materializes as one
    array in one task (like every collect_list operator here) — fine
    for per-SKU/per-account histories; shard the key by time window
    first if a single key's events outgrow a task.

    Returns (keys..., n_events, final_balance, n_stockouts).

    For keys whose history does NOT fit one task, use
    operators/prefix.prefix_agg(partition_by=[key]) — the range shuffle
    runs on (key, order), so a hot key spreads over many partitions and
    only its per-(key, partition) totals are combined (q_running_balance_scaled).
    """
    cents = int(10**scale)
    ordered = F.sort_array(
        F.collect_list(
            F.struct(
                *[F.col(c).alias(f"o{i}") for i, c in enumerate(order_by)],
                F.round(F.col(delta_col) * cents).cast("long").alias("d"),
            )
        )
    )
    floor_c = F.lit(int(round(floor * cents))).cast("long")
    init = F.struct(
        F.lit(0).cast("long").alias("bal"), F.lit(0).cast("long").alias("n")
    )
    fold = F.aggregate(
        ordered,
        init,
        lambda acc, x: F.struct(
            F.greatest(acc["bal"] + x["d"], floor_c).alias("bal"),
            (
                acc["n"]
                + F.when(acc["bal"] + x["d"] < floor_c, 1).otherwise(0)
            ).cast("long").alias("n"),
        ),
    )
    keys = [F.col(k) for k in key_cols]
    return (
        df.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            fold.alias("__f"),
        )
        .select(
            *key_cols,
            "n_events",
            F.round(F.col("__f.bal") / cents, scale).alias("final_balance"),
            F.col("__f.n").alias("n_stockouts"),
        )
    )


def lag_autocorr(
    df: DataFrame,
    keys: "Sequence[str]",
    order_col: str,
    value_col: str,
    lag: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """Lag-k autocorrelation of an INTEGER-valued series per key — the
    "is this metric sticky or mean-reverting" diagnostic on any
    downsampled series (hourly counts, daily revenue cents). Pairs
    (x_t, x_{t-k}) come from a KEY-PARTITIONED lag window over the
    observed points in `order_col` order (gaps pair with the previous
    observed point — documented contract, deterministic); the Pearson
    correlation over pairs uses pure integer sufficient statistics

        r = (nΣxy − ΣxΣy) / sqrt((nΣxx − (Σx)²) · (nΣyy − (Σy)²))

    in DECIMAL, so every engine reproduces the division bit-for-bit.
    Shape: one partitioned window + one hash aggregate; keys with
    fewer than lag+2 points or a constant side yield NULL r."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(order_col)
    x = F.col(value_col).cast("decimal(38,0)")
    pairs = df.select(*keys, order_col, x.alias("__x")).withColumn(
        "__y", F.lag("__x", lag).over(w)
    ).filter(F.col("__y").isNotNull())
    agg = pairs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    nd = F.col("n_pairs").cast("double")
    num = nd * F.col("__sxy").cast("double") - F.col("__sx").cast("double") * F.col("__sy").cast("double")
    den_x = nd * F.col("__sxx").cast("double") - F.col("__sx").cast("double") * F.col("__sx").cast("double")
    den_y = nd * F.col("__syy").cast("double") - F.col("__sy").cast("double") * F.col("__sy").cast("double")
    r = F.when(
        (F.col("n_pairs") > 1) & (den_x > 0) & (den_y > 0),
        num / F.sqrt(den_x * den_y),
    )
    return agg.select(*keys, "n_pairs", F.round(r, round_to).alias("autocorr"))


def pit_features(
    spine: DataFrame,
    facts: DataFrame,
    on: Sequence[str],
    spine_time: str,
    fact_time: str,
    spine_id: str,
    last_cols: Sequence[str] = (),
    trailing: "dict[str, tuple[str, str, int]] | None" = None,
    last_ttl: "float | None" = None,
) -> DataFrame:
    """Point-in-time-correct feature enrichment (the feature-store
    join): for each spine row (entity keys `on` + as-of time
    `spine_time`, uniquely identified by `spine_id`) attach

      * `last_cols` — the fact columns of the LATEST fact at or before
        the as-of time (asof_join, left); `last_ttl` bounds its
        staleness (feature-store TTL) — a last value older than
        `last_ttl` reads as NULL instead of leaking ancient state;
      * `trailing`  — {out: (kind, col, window)} trailing-window
        aggregates over facts in (t - window, t], kind in count|sum
        (max is not prefix-subtractable — use over_by_duration for
        bounded trailing extrema), `window` in the same units as the
        time columns.

    Leakage-free by construction: no fact with t_f > t_l can reach its
    spine row, because both paths read only the running prefix at the
    probe position.

    Scale shape: NO candidate pairs and NO range join — each distinct
    trailing window costs one union + one per-entity window pass
    (facts + 2 probe rows per spine row), the asof path one more; all
    shuffles are on the entity key. Trailing values come from the
    running-prefix difference F(t) - F(t - window): probe rows at both
    ends read the running aggregate where they land (probes order
    AFTER facts at equal time, so the lower probe excludes facts at
    exactly t - window — the (lo, hi] convention). Empty-window SQL
    semantics: count 0, sum/max NULL.

    The reference reaches the same shapes imperatively (dimension
    lookup + OverWindowByDuration trailing state,
    sp/.../OverWindowByDuration analog); here both are one declarative
    plan. Facts must be pre-aggregated to one row per (key, time) if
    last_cols tie-breaks must be engine-deterministic (asof_join
    caveat).
    """
    keys = list(on)
    trailing = dict(trailing or {})
    out = spine
    if last_cols:
        right = facts.select(*keys, fact_time, *last_cols)
        out = asof_join(
            out, right, on=keys, left_time=spine_time,
            right_time=fact_time, how="left", tolerance=last_ttl,
        )

    kinds = {k: s[0] for k, s in trailing.items()}
    bad = [k for k, v in kinds.items() if v not in ("count", "sum")]
    if bad:
        raise ValueError(f"unsupported trailing kinds: {bad}")
    # one union+window pass per distinct window length
    windows: dict[int, list[str]] = {}
    for name, (_, _, win) in trailing.items():
        windows.setdefault(win, []).append(name)
    for win, names in sorted(windows.items()):
        aggs = {n: trailing[n] for n in names}
        sid_type = spine.schema[spine_id].dataType
        fpart = facts.select(
            *keys,
            F.col(fact_time).cast("double").alias("__t"),
            F.lit(0).alias("__probe"),
            F.lit(None).cast(sid_type).alias("__sid"),
            *[
                F.col(c).cast("double").alias(f"__v_{n}")
                for n, (_, c, _) in aggs.items()
            ],
        )
        probes = spine.select(
            *keys,
            F.col(spine_time).cast("double").alias("__pt"),
            F.col(spine_id).alias("__sid"),
        )
        ppart = probes.select(
            *keys, F.col("__pt").alias("__t"), F.lit(1).alias("__probe"),
            "__sid", *[F.lit(None).cast("double").alias(f"__v_{n}") for n in aggs],
        ).unionByName(
            probes.select(
                *keys, (F.col("__pt") - F.lit(float(win))).alias("__t"),
                F.lit(2).alias("__probe"), "__sid",
                *[F.lit(None).cast("double").alias(f"__v_{n}") for n in aggs],
            )
        )
        w = (
            W.partitionBy(*keys)
            .orderBy(F.col("__t").asc(), F.col("__probe").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        run_cols = [
            F.count(f"__v_{n}").over(w).alias(f"__c_{n}") for n in aggs
        ] + [
            F.sum(f"__v_{n}").over(w).alias(f"__r_{n}")
            for n in aggs
            if kinds[n] == "sum"
        ]
        ran = fpart.unionByName(ppart).select("__probe", "__sid", *run_cols)
        hi = F.col("__probe") == 1
        per_spine = ran.filter(F.col("__probe") > 0).groupBy("__sid")
        sel = []
        for n in aggs:
            cnt = F.max(F.when(hi, F.col(f"__c_{n}"))) - F.max(
                F.when(~hi, F.col(f"__c_{n}"))
            )
            if kinds[n] == "count":
                sel.append(cnt.alias(n))
            else:
                dif = F.max(F.when(hi, F.coalesce(F.col(f"__r_{n}"), F.lit(0.0)))) - F.max(
                    F.when(~hi, F.coalesce(F.col(f"__r_{n}"), F.lit(0.0)))
                )
                sel.append(F.when(cnt > 0, dif).alias(n))
        agg_df = per_spine.agg(*sel)
        out = out.join(agg_df, out[spine_id] == agg_df["__sid"], "left").drop(
            "__sid"
        )
        for n in aggs:
            if kinds[n] == "count":
                out = out.withColumn(n, F.coalesce(F.col(n), F.lit(0)))
    return out


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_width: float,
    on: Sequence[str] = (),
    suffix: str = "_b",
) -> DataFrame:
    """Interval × interval OVERLAP join (half-open [start, end);
    overlap iff a.start < b.end AND b.start < a.end) — the
    two-sided sibling of range_join, still without a cross join.

    Both sides register in the fixed-width buckets their span covers;
    candidates meet in a bucket equi-join (+ optional equi-keys `on`);
    a residual filter keeps true overlaps; and the pair is KEPT ONLY in
    the bucket containing max(a.start, b.start) — each true overlap
    intersects that bucket by construction, so the dedup needs no
    post-join distinct (the classic responsible-bucket trick).

    Shuffle is O(Σ spans / width) per side, never |a| × |b|. Pick
    bucket_width near the typical span; very long intervals cost their
    span/width in duplicate registrations (cap them upstream or raise
    the width). B's columns that collide with A's get `suffix`.
    """
    keys = list(on)

    def buckets(df, s, e):
        # register THROUGH floor(end/w): superset-safe for float
        # division's weak monotonicity (see range_join); empty
        # intervals (end <= start, compared on the ORIGINAL types —
        # a double cast collapses sub-ULP spans) overlap nothing
        return df.where(F.col(e) > F.col(s)).withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(s).cast("double") / bucket_width).cast("bigint"),
                    F.floor(F.col(e).cast("double") / bucket_width).cast("bigint"),
                )
            ),
        )
    renames = {
        c: (c + suffix if c in a.columns else c)
        for c in b.columns
        if c not in keys
    }
    b_r = b.select(*keys, *[F.col(c).alias(renames[c]) for c in renames])
    sa, ea = F.col(a_start), F.col(a_end)
    sb, eb = F.col(renames.get(b_start, b_start)), F.col(renames.get(b_end, b_end))
    joined = buckets(a, a_start, a_end).join(
        buckets(b_r, renames.get(b_start, b_start), renames.get(b_end, b_end)),
        ["__bucket", *keys],
    )
    responsible = (
        F.floor(F.greatest(sa, sb).cast("double") / bucket_width).cast("bigint")
        == F.col("__bucket")
    )
    return joined.filter((sa < eb) & (sb < ea) & responsible).drop("__bucket")


def rolling_quantile(
    df: DataFrame,
    keys: Sequence[str],
    order_by: "Sequence[str]",
    col: str,
    q: float = 0.5,
    window_rows: int = 10,
    out_col: str = "rolling_q",
) -> DataFrame:
    """Trailing-window quantile per key (rolling median and friends):
    `percentile(col, q)` over the last `window_rows` rows in
    `order_by` order — the robust sibling of a rolling mean for
    denoising metric streams (a single spike moves a rolling mean by
    spike/n; it barely moves the median).

    Engine-exact: the frame is a row-count frame (no float time
    boundaries) and Spark's exact percentile uses the same
    quantile_cont interpolation DuckDB does, so the order statistic
    matches bit-for-bit. Plan: ONE partitioned window (bounded frame,
    state = window_rows values per position) — keyed, so no
    single-task sort; the per-key history assumption is the same one
    every trailing-window operator here makes."""
    w = (
        W.partitionBy(*list(keys))
        .orderBy(*[F.col(c).asc() for c in order_by])
        .rowsBetween(-(window_rows - 1), W.currentRow)
    )
    return df.withColumn(
        out_col, F.expr(f"percentile({col}, {q})").over(w)
    )


def multi_horizon_features(
    df: DataFrame,
    keys: Sequence[str],
    t_col: str,
    value_col: str,
    horizons: "dict[str, int]",
    round_to: int = 6,
) -> DataFrame:
    """Multi-horizon trailing features in one pass: for every event,
    the trailing sum and count of `value_col` over each named horizon
    (e.g. {"1h": 3_600_000, "24h": 86_400_000} in the t_col unit) —
    the standard feature-matrix step before training a ranking or
    fraud model ("activity in the last hour / day / week").

    One key-PARTITIONED sort carries ALL horizons: each horizon is a
    RANGE BETWEEN frame over the same window ordering, so Spark plans
    a single Exchange + Sort and evaluates the frames in one
    WindowExec pass — k horizons never cost k shuffles (and never a
    global window). Sums aggregate in DECIMAL (integer units) and cast
    once, so every feature is engine-exact."""
    keys = list(keys)
    base = W.partitionBy(*keys).orderBy(F.col(t_col).cast("long"))
    cols = []
    for name, span in horizons.items():
        frame = base.rangeBetween(-int(span), 0)
        cols.append(
            F.round(
                F.sum(F.col(value_col).cast("decimal(38,6)")).over(frame)
                .cast("double"),
                round_to,
            ).alias(f"sum_{name}")
        )
        cols.append(F.count(F.lit(1)).over(frame).alias(f"cnt_{name}"))
    # one select so same-frame expressions share one Window node (sum and
    # count of a horizon always co-plan; separate withColumns would not)
    return df.select("*", *cols)


def event_gaps(
    df: DataFrame,
    keys: Sequence[str],
    t_col: str,
    min_gap: int,
) -> DataFrame:
    """Data-arrival gap report: per key, every silence between
    consecutive events longer than `min_gap` (t_col units) —
    (keys..., gap_start, gap_end, gap). The ops-monitoring question
    ("which sensors went dark, when, for how long") as one
    key-PARTITIONED lag window; no shuffle beyond the key partition."""
    keys = list(keys)
    w = W.partitionBy(*keys).orderBy(F.col(t_col).asc())
    lagged = df.select(
        *keys,
        F.col(t_col).alias("gap_end"),
        F.lag(t_col).over(w).alias("gap_start"),
    )
    return (
        lagged.withColumn("gap", F.col("gap_end") - F.col("gap_start"))
        .filter(F.col("gap") > min_gap)
        .select(*keys, "gap_start", "gap_end", "gap")
    )


def purged_split(
    df: DataFrame,
    keys: Sequence[str],
    t_col: str,
    split_t: int,
    embargo: int,
) -> DataFrame:
    """Temporal train/validation split with a PER-KEY leakage embargo
    (the "purged" split from financial ML, public — de Prado 2018):
    rows at or before `split_t` train; a key's validation rows within
    `embargo` of that key's LAST training event are quarantined as
    'embargo' (their features overlap the training window — the
    leakage an unpurged split ships silently); everything later is
    'val'. Keys with no training rows validate from their first event.

    One filtered aggregate for per-key last-train times joined back
    (NO broadcast hint — last_train is one row PER KEY, unbounded at
    corpus key cardinality; the planner picks broadcast only when it
    actually fits), one projection — no window, no self-join of data
    rows."""
    keys = list(keys)
    last_train = (
        df.filter(F.col(t_col) <= split_t)
        .groupBy(*keys)
        .agg(F.max(t_col).alias("__lt"))
    )
    j = df.join(last_train, keys, "left")
    split = (
        F.when(F.col(t_col) <= split_t, F.lit("train"))
        .when(
            F.col("__lt").isNotNull()
            & (F.col(t_col) - F.col("__lt") <= embargo),
            F.lit("embargo"),
        )
        .otherwise(F.lit("val"))
    )
    return j.withColumn("split", split).drop("__lt")


def forecast_eval(
    df: DataFrame,
    keys: Sequence[str],
    t_col: str,
    actual_col: str,
    forecast_col: str,
    season: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """Per-series forecast accuracy scorecard: MAE, sMAPE, and MASE
    (Hyndman & Koehler 2006 — the scale-free standard, public) of a
    forecast column against actuals, with the SEASONAL-NAIVE forecast
    (actual at t − season steps) as MASE's scale denominator:

        sMAPE = mean( 2|f−a| / (|f|+|a|) )        (rows with |f|+|a|>0)
        MASE  = MAE(forecast) / MAE(naive)

    MASE < 1 means the model beats "repeat last season" — the first
    bar any production forecast must clear.

    Engine-exactness: pass INTEGER-UNIT actual/forecast columns
    (cents, millis); |f−a| sums are exact DECIMAL; each per-row sMAPE
    ratio is rounded to 12 dp and summed in DECIMAL (fixed point, no
    float-order dependence); every mean is one final division. Rows
    whose naive lag is undefined (the first `season` steps) are
    excluded from ALL metrics so MAE and MASE cover the same rows.

    Plan shape: one lag window per series (partitioned by keys,
    ordered by t — never global) + one hash aggregate per key."""
    keys = list(keys)
    w = W.partitionBy(*keys).orderBy(F.col(t_col).asc())
    a = F.col(actual_col).cast("long")
    f = F.col(forecast_col).cast("long")
    naive = F.lag(a, season).over(w)
    rows = df.select(
        *keys,
        a.alias("__a"), f.alias("__f"), naive.alias("__nv"),
    ).filter(F.col("__nv").isNotNull() & F.col("__f").isNotNull())
    ae = F.abs(F.col("__f") - F.col("__a"))
    ae_naive = F.abs(F.col("__nv") - F.col("__a"))
    denom = F.abs(F.col("__f")) + F.abs(F.col("__a"))
    smape_term = F.when(
        denom > 0,
        F.round(F.lit(2.0) * ae.cast("double") / denom.cast("double"), 12),
    ).otherwise(F.lit(0.0))
    per = rows.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(ae.cast("decimal(38,0)")).alias("__sae"),
        F.sum(ae_naive.cast("decimal(38,0)")).alias("__san"),
        F.sum(smape_term.cast("decimal(38,12)")).alias("__ssm"),
    )
    nd = F.col("n").cast("double")
    mae = F.col("__sae").cast("double") / nd
    mae_naive = F.col("__san").cast("double") / nd
    return per.select(
        *keys, "n",
        F.round(mae, round_to).alias("mae"),
        F.round(F.col("__ssm").cast("double") / nd, round_to).alias("smape"),
        F.round(
            F.when(F.col("__san") > 0, mae / mae_naive), round_to
        ).alias("mase"),
    )


def changepoint_single(
    df: DataFrame,
    key_cols: "Sequence[str]",
    order_col: str,
    value_col: Column,
    round_to: int = 6,
) -> DataFrame:
    """Best single change-point per series — binary segmentation's
    first split (Scott & Knott 1974 / the AMOC variant of PELT, Killick
    2012, all public): the split index t (1-based count of rows in the
    LEFT segment) that maximizes the SSE reduction

        gain(t) = SSE(all) − SSE(1..t) − SSE(t+1..n)
        SSE(a..b) = Q − S²/m     (S, Q = segment sum / sum of squares)

    Engine-exact: pass an INTEGER-UNIT value_col; prefix sums S_t, Q_t
    are exact DECIMALs from ONE partitioned running window in order-col
    order; each gain is a fixed-order double expression rounded once
    (`round_to`), and the argmax — taken on the ROUNDED gain — breaks
    ties by SMALLEST t: total order, engine-portable. Series with
    n < 2 produce no row (no valid split exists).

    Scale shape: one window pass partitioned by key (a series' history
    lives in one task — the bounded-group contract shared with
    ohlc_bars; for a single series longer than a task, decompose with
    prefix.prefix_agg), one per-key max-join. Output: (keys..., n,
    split_t, gain) with gain in squared value units."""
    from pyspark.sql.window import Window as W

    keys = list(key_cols)
    v = value_col.cast("long")
    base = df.select(*keys, F.col(order_col).alias("__o"), v.alias("__v"))
    # squares and their sums in DECIMAL: long*long overflows at
    # ~3e9-unit values, and prefix sums of squares overflow far sooner
    sq = (F.col("__v").cast("decimal(38,0)") * F.col("__v").cast("decimal(38,0)"))
    w = W.partitionBy(*keys).orderBy("__o").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wall = W.partitionBy(*keys)
    pre = base.select(
        *keys,
        F.row_number().over(W.partitionBy(*keys).orderBy("__o")).alias("__t"),
        F.sum(F.col("__v").cast("decimal(38,0)")).over(w).alias("__S"),
        F.sum(sq).over(w).alias("__Q"),
        F.count(F.lit(1)).over(wall).alias("__n"),
        F.sum(F.col("__v").cast("decimal(38,0)")).over(wall).alias("__Sn"),
        F.sum(sq).over(wall).alias("__Qn"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    sse_all = d(F.col("__Qn")) - d(F.col("__Sn")) * d(F.col("__Sn")) / d(F.col("__n"))
    sse_l = d(F.col("__Q")) - d(F.col("__S")) * d(F.col("__S")) / d(F.col("__t"))
    sr = F.col("__Sn") - F.col("__S")
    qr = F.col("__Qn") - F.col("__Q")
    nr = F.col("__n") - F.col("__t")
    sse_r = d(qr) - d(sr) * d(sr) / d(nr)
    # round BEFORE the argmax so both engines compare the same value
    # (the expressions are fixed-order, but rounding makes the tie set
    # explicit); fixed-point micro longs would overflow on squared
    # integer-unit gains, so the rounded double IS the portable key
    cand = pre.filter(F.col("__t") < F.col("__n")).select(
        *keys, "__t", "__n",
        F.round(sse_all - sse_l - sse_r, round_to).alias("gain"),
    )
    best = cand.groupBy(*keys).agg(F.max("gain").alias("gain"))
    picked = cand.join(best, [*keys, "gain"]).groupBy(*keys, "gain").agg(
        F.min("__t").cast("long").alias("split_t"),  # long: row_number is
        F.max("__n").alias("n"),                     # int, oracles BIGINT
    )
    return picked.select(*keys, "n", "split_t", "gain")


def burstiness(
    df: DataFrame,
    key_cols: "Sequence[str]",
    time_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Inter-arrival burstiness per key (Goh & Barabási 2008, public):
    over the gaps Δ between consecutive events (ms),

        B = (σ − μ) / (σ + μ)   ∈ (−1, 1)

    −1 = perfectly periodic, 0 = Poisson, → 1 = heavy-tailed bursts —
    the traffic-shape readout next to event_gaps (which reports the
    gaps) and lag_autocorr (values, not arrivals). σ is the population
    std dev over exact integer-ms gaps: sums and sums-of-squares stay
    in DECIMAL, variance/σ/B run in fixed op order on doubles, rounded
    once. Keys with < 3 events (< 2 gaps) report NULL B — a single gap
    has no dispersion.

    Scale shape: one lag window partitioned by key + one hash
    aggregate. Output: (keys..., n_events, mean_gap_ms, b)."""
    from pyspark.sql.window import Window as W

    keys = list(key_cols)
    dtype = dict(df.dtypes).get(time_col, "")
    if dtype in ("bigint", "int", "long", "integer"):
        t_ms = F.col(time_col).cast("long")  # already epoch-ms
    else:
        t_ms = F.unix_millis(F.col(time_col).cast("timestamp"))
    base = df.select(*keys, t_ms.alias("__ms"))
    w = W.partitionBy(*keys).orderBy("__ms")
    gaps = base.select(
        *keys, (F.col("__ms") - F.lag("__ms").over(w)).alias("__g")
    ).filter(F.col("__g").isNotNull())
    dec = "decimal(38,0)"
    agg = gaps.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__m"),
        F.sum(F.col("__g").cast(dec)).alias("__s"),
        F.sum((F.col("__g") * F.col("__g")).cast(dec)).alias("__q"),
    )
    m = F.col("__m").cast("double")
    mu = F.col("__s").cast("double") / m
    var = F.col("__q").cast("double") / m - mu * mu
    sig = F.sqrt(F.greatest(var, F.lit(0.0)))
    b = F.when(F.col("__m") >= 2, (sig - mu) / (sig + mu))
    return agg.select(
        *keys,
        (F.col("__m") + 1).cast("long").alias("n_events"),
        F.round(mu, round_to).alias("mean_gap_ms"),
        F.round(b, round_to).alias("b"),
    )


def max_drawdown(
    df: DataFrame,
    keys: "Sequence[str]",
    order_cols: "Sequence[str]",
    value_col: Column,
    round_to: int = 6,
) -> DataFrame:
    """Per-key maximum drawdown — the largest peak-to-trough drop of a
    time-ordered value series (the standard risk readout for prices,
    and equally the 'worst regression' readout for any monitored
    metric: throughput, quality score, cache hit rate):

        peak_t  = max(value_{≤t})        (running, per key)
        dd_t    = peak_t − value_t
        dd%_t   = dd_t / peak_t          (NULL while peak ≤ 0)
        output  = per-key max of both, with the series length

    Plan shape: ONE partitioned running-max window per key in
    (order_cols) order, then a hash aggregate — no self-joins, no
    global sort. BOUNDED-GROUP caveat (same as bounded_running_balance):
    each key's full history flows through one task's window, so keys
    must be entity-sized (an instrument, a metric, a tenant), not
    corpus-sized; for a single giant series use prefix.prefix_agg's
    partitioned-prefix max and aggregate the result.

    Determinism: the running max is order-exact given a TOTAL order —
    include a unique tiebreak in order_cols (same contract as
    prefix_agg). max() of per-row doubles is selection, not
    summation, so no fixed-point staging is needed; values round once
    at output. Output: (keys..., n_points, max_drawdown,
    max_drawdown_pct)."""
    from pyspark.sql.window import Window as W

    keys = list(keys)
    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w = (
        W.partitionBy(*[F.col(k) for k in keys])
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    v = value_col.cast("double")
    staged = df.select(
        *keys, v.alias("__v"), F.max(v).over(w).alias("__peak")
    )
    dd = F.col("__peak") - F.col("__v")
    ddp = F.when(F.col("__peak") > 0, dd / F.col("__peak"))
    return (
        staged.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.max(dd), round_to).alias("max_drawdown"),
            F.round(F.max(ddp), round_to).alias("max_drawdown_pct"),
        )
    )


def acf_table(
    df: DataFrame,
    keys: "Sequence[str]",
    order_col: str,
    value_col: str,
    max_lag: int = 8,
    round_to: int = 6,
) -> DataFrame:
    """Autocorrelation function per key at every lag 1..max_lag — the
    multi-lag generalization of lag_autocorr (one row per (key, lag)
    instead of one call per lag): the seasonality/stickiness profile a
    forecasting pipeline reads before picking a model or a seasonal
    period.

    Same exactness contract as lag_autocorr: INTEGER-valued series
    (counts, cents), Pearson r per lag from pure DECIMAL sufficient
    statistics, gaps pair with the previous observed point. Plan
    shape: ONE key-partitioned window pass computes all max_lag lag
    columns (same window spec → Spark plans a single Window node),
    then an explode to (lag, pair) rows and ONE hash aggregate on
    (keys, lag) — cost is ~max_lag output rows per input row, not
    max_lag passes. Keys × lags with < 2 pairs or a constant side
    yield NULL r."""
    from pyspark.sql.window import Window as W

    keys = list(keys)
    w = W.partitionBy(*keys).orderBy(order_col)
    x = F.col(value_col).cast("decimal(38,0)")
    lagged = df.select(*keys, order_col, x.alias("__x")).select(
        "*",
        *[F.lag("__x", k).over(w).alias(f"__l{k}") for k in range(1, max_lag + 1)],
    )
    stacked = lagged.select(
        *keys,
        "__x",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"), F.col(f"__l{k}").alias("__y")
                    )
                    for k in range(1, max_lag + 1)
                ]
            )
        ).alias("__p"),
    ).select(*keys, "__x", F.col("__p.lag").alias("lag"), F.col("__p.__y").alias("__y")
    ).filter(F.col("__y").isNotNull())
    agg = stacked.groupBy(*keys, "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    nd = F.col("n_pairs").cast("double")
    num = nd * F.col("__sxy").cast("double") - F.col("__sx").cast("double") * F.col("__sy").cast("double")
    den_x = nd * F.col("__sxx").cast("double") - F.col("__sx").cast("double") * F.col("__sx").cast("double")
    den_y = nd * F.col("__syy").cast("double") - F.col("__sy").cast("double") * F.col("__sy").cast("double")
    r = F.when(
        (F.col("n_pairs") > 1) & (den_x > 0) & (den_y > 0),
        num / F.sqrt(den_x * den_y),
    )
    return agg.select(*keys, "lag", "n_pairs", F.round(r, round_to).alias("autocorr"))


def seasonal_decompose(
    df: DataFrame,
    keys: "Sequence[str]",
    order_col: str,
    value_col: str,
    period: int,
    round_to: int = 6,
) -> DataFrame:
    """Classical additive seasonal decomposition per key (the moving-
    average method of Macaulay 1931 — the 'decompose' every stats
    package ships; STL's simpler ancestor):

        trend_t    = classical centered moving average: for ODD period
                     the simple period-row mean; for EVEN period the
                     standard 2×period MA (period+1 rows with HALF
                     weight at the two ends — equivalently the mean of
                     the two period-row means starting at t−p/2 and
                     t−p/2+1), so no phase is double-counted
                     (NULL at the edges where the window is partial)
        seasonal_p = mean of (value − trend) at phase p = t mod period,
                     re-centered so the seasonal component sums to ~0
        residual   = value − trend − seasonal

    The even-period half-weight ends matter: an equal-weight
    (period+1)-row window covers one phase twice, shrinking the
    seasonal component by period/(period+1) (r11 ADVICE finding) —
    the 2×period form is what statsmodels/R `decompose` compute.

    The series must be INTEGER-valued (counts, cents — the
    lag_autocorr contract) and regularly sampled per key in
    `order_col` order. Engine-exactness: the trend numerator stays in
    DECIMAL(38,0) (for even periods: 2·Σwindow − first − last, one
    exact integer expression) with a single division; detrended values
    round to nano longs BEFORE the per-phase mean (float sums are
    order-dependent); the phase means and the re-centering run in
    fixed-order double arithmetic mirrored by the oracle. Plan shape:
    one key-partitioned centered window + row_number, one (key, phase)
    hash aggregate joined back, one per-key 1-row aggregate joined
    back — the bounded-group caveat applies (a key's history flows
    through one task's window).

    Output: (keys..., order_col, value, trend, seasonal, residual) —
    trend/residual NULL on the edge rows."""
    from pyspark.sql.window import Window as W

    keys = list(keys)
    h = period // 2
    win = W.partitionBy(*keys).orderBy(order_col)
    frame = win.rowsBetween(-h, h)
    v = F.col(value_col).cast("decimal(38,0)")
    base = df.select(*keys, order_col, v.alias("__v")).select(
        "*",
        ((F.row_number().over(win) - 1) % period).alias("__phase"),
        F.sum("__v").over(frame).alias("__ts"),
        F.count("__v").over(frame).alias("__tc"),
        F.lag("__v", h).over(win).alias("__vfirst"),
        F.lead("__v", h).over(win).alias("__vlast"),
    )
    if period % 2 == 0:
        # 2×period MA: half weight at the window's two end rows —
        # exact DECIMAL numerator, one division by 2·period
        num = (
            F.lit(2).cast("decimal(38,0)") * F.col("__ts")
            - F.col("__vfirst")
            - F.col("__vlast")
        )
        trend = F.when(
            F.col("__tc") == 2 * h + 1,
            num.cast("double") / F.lit(float(2 * period)),
        )
    else:
        # odd period: simple centered period-row mean (h = (p−1)/2)
        trend = F.when(
            F.col("__tc") == 2 * h + 1,
            F.col("__ts").cast("double") / F.col("__tc").cast("double"),
        )
    staged = base.withColumn("__trend", trend).withColumn(
        "__dn",
        F.round((F.col("__v").cast("double") - F.col("__trend")) * 1e9).cast("long"),
    )
    ph = staged.filter(F.col("__dn").isNotNull()).groupBy(*keys, "__phase").agg(
        F.sum("__dn").alias("__ps"), F.count(F.lit(1)).alias("__pc")
    ).select(
        *keys, "__phase",
        F.round(
            F.col("__ps").cast("double") / F.col("__pc").cast("double")
        ).cast("long").alias("__snano"),
    )
    center = ph.groupBy(*keys).agg(
        (F.sum("__snano").cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("__cn")
    )
    seasonal = (F.col("__snano").cast("double") - F.col("__cn")) / 1e9
    out = staged.join(ph, [*keys, "__phase"], "left").join(center, keys, "left")
    return out.select(
        *keys,
        order_col,
        F.col("__v").cast("long").alias("value"),
        F.round(F.col("__trend"), round_to).alias("trend"),
        F.round(seasonal, round_to).alias("seasonal"),
        F.round(
            F.col("__v").cast("double") - F.col("__trend") - seasonal, round_to
        ).alias("residual"),
    )


def theil_sen_grouped(
    df: DataFrame,
    keys: "Sequence[str]",
    order_col: Column,
    value_col: Column,
    round_to: int = 6,
) -> DataFrame:
    """Theil–Sen robust trend slope per key (Theil 1950 / Sen 1968,
    public): the median of all pairwise slopes (v_j − v_i)/(t_j − t_i)
    — the 29%-breakdown-point alternative to linreg's least squares,
    the right trend readout when a monitored series has spikes (a
    single outlier day can flip an OLS slope; it barely moves this
    one).

    BOUNDED-GROUP CONTRACT (the kendall pairs / seq_pairs class): the
    pairs come from a t_i < t_j self-equi-join on the key, so cost is
    O(Σ g²) over group sizes — per-entity monitoring series (hundreds
    to a few thousand points) are cheap at any entity count; do not
    point it at a million-row single key. Pairs with equal timestamps
    are excluded (slope undefined — the classical convention). The
    median is an exact order statistic per key: odd pair count → the
    middle slope; even → the mean of the two middles (both engines
    compute the same double average). Slopes are IEEE double divisions
    — deterministic across engines. Output:
    (keys..., n_points, n_pairs, slope) — slope NULL when no valid
    pair exists."""
    from pyspark.sql.window import Window as W

    keys = list(keys)
    base = df.select(
        *keys,
        order_col.cast("double").alias("__t"),
        value_col.cast("double").alias("__v"),
    ).filter(F.col("__t").isNotNull() & F.col("__v").isNotNull())
    a = base.select(*keys, F.col("__t").alias("__ta"), F.col("__v").alias("__va"))
    b = base.select(*keys, F.col("__t").alias("__tb"), F.col("__v").alias("__vb"))
    pairs = a.join(b, keys).filter(F.col("__ta") < F.col("__tb"))
    slopes = pairs.select(
        *keys,
        (
            (F.col("__vb") - F.col("__va")) / (F.col("__tb") - F.col("__ta"))
        ).alias("__s"),
    )
    w = W.partitionBy(*keys).orderBy("__s")
    ranked = slopes.select(
        *keys,
        "__s",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(W.partitionBy(*keys)).alias("__np"),
    )
    r_lo = F.floor((F.col("__np") + 1) / 2)
    r_hi = F.floor(F.col("__np") / 2) + 1
    med = ranked.filter(
        (F.col("__rn") == r_lo) | (F.col("__rn") == r_hi)
    ).groupBy(*keys).agg(
        (F.sum("__s") / F.count(F.lit(1))).alias("__slope"),
        F.first("__np").alias("n_pairs"),
    )
    n_pts = base.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_points"))
    out = n_pts.join(med, keys, "left")
    return out.select(
        *keys,
        "n_points",
        F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
        F.round(F.col("__slope"), round_to).alias("slope"),
    )


def page_hinkley(
    df: DataFrame,
    keys: "Sequence[str]",
    order_col: str,
    value_col: Column,
    delta: float = 0.0,
    lam: float = 50.0,
    round_to: int = 6,
) -> DataFrame:
    """Page–Hinkley upward change detection per key (Page 1954 /
    Hinkley 1971, public) — the sequential drift alarm for a monitored
    metric stream (the classical test behind most online
    concept-drift detectors):

        m_t  = Σ_{i≤t} (x_i − x̄_i − δ)     (x̄_i = running mean)
        PH_t = m_t − min_{i≤t} m_i
        alarm when PH_t > λ

    Exactness: `value_col` should be INTEGER-exact (counts, cents).
    The running mean division makes each increment rational, so each
    term is nano-rounded to a long BEFORE the running sum (the
    cumulative sums and the running min then operate on exact
    integers — reduce-order-free and engine-portable). Plan: two
    stacked key-partitioned ordered windows (running sum/count →
    terms; running term-sum + running min) — the max_drawdown
    bounded-group shape (a key's history flows through one task; use
    per-entity keys, not one global key). Ties in `order_col` within
    a key are broken by the value for a total order. Output per row:
    (keys..., order_col, value, ph, alarm)."""
    from pyspark.sql.window import Window as W

    keys = list(keys)
    dec = "decimal(38,0)"
    base = df.select(
        *keys,
        F.col(order_col).alias("__o"),
        value_col.cast("long").alias("__x"),
    ).filter(F.col("__x").isNotNull())
    w = W.partitionBy(*keys).orderBy("__o", "__x").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    staged = base.select(
        *keys,
        "__o",
        "__x",
        F.sum(F.col("__x").cast(dec)).over(w).alias("__rs"),
        F.count(F.lit(1)).over(w).alias("__rc"),
    )
    term = F.round(
        (
            F.col("__x").cast("double")
            - F.col("__rs").cast("double") / F.col("__rc").cast("double")
            - F.lit(float(delta))
        )
        * 1e9
    ).cast(dec)
    w2 = W.partitionBy(*keys).orderBy("__o", "__x").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    staged2 = staged.withColumn("__tn", term).select(
        *keys,
        "__o",
        "__x",
        F.sum("__tn").over(w2).alias("__m"),
    )
    ph_nano = F.col("__m") - F.min("__m").over(w2)
    ph = ph_nano.cast("double") / 1e9
    return staged2.select(
        *keys,
        F.col("__o").alias(order_col),
        F.col("__x").alias("value"),
        F.round(ph, round_to).alias("ph"),
        (ph > F.lit(float(lam))).alias("alarm"),
    )


def holt_linear(
    df: DataFrame,
    keys: "Sequence[str]",
    order_col: str,
    value_col: Column,
    alpha: float = 0.5,
    beta: float = 0.3,
    round_to: int = 6,
    n_buckets: int = 256,
) -> DataFrame:
    """Holt's linear (double exponential) smoothing per key (Holt
    1957, public) — the trend-aware forecaster between ema_trailing
    (no trend) and a model server (too much machinery):

        l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
        one-step forecast f_{t+1} = l_t + b_t

    Init: l_1 = x_1, b_1 = x_2 − x_1 (the standard two-point slope;
    b_1 = 0 for a single-row key). The recursion is inherently
    sequential per key, so it runs in the kendall-sort Arrow shape: a
    256-bucket hash of the key shuffles WHOLE keys together and each
    Arrow call loops its bucket's keys in numpy — one pass, no
    per-group round-trips. Engine-exactness: every step is the same
    fixed sequence of IEEE double ops the oracle's recursive CTE
    replays, so outputs are bit-identical (the q_running_balance
    sequential-fold precedent); inputs are cast to double once.
    Rows with NULL order or value drop; values must be INTEGER-exact
    (counts, cents — the lag_autocorr contract; the reported `value`
    column is a long). Ties in `order_col` within a key are broken by
    the value (the page_hinkley/sprt total-order rule) so the
    sequential recursion is deterministic under any partition layout.
    BOUNDED-GROUP caveat: one key's history must
    fit one task (the page_hinkley/max_drawdown contract). Output:
    (keys..., order_col, value, level, trend, forecast) — forecast is
    the NEXT-step prediction from this row.

    NULL-KEY rows drop (r14 adversarial pass: pandas `groupby` silently
    discards NULL-key groups inside the Arrow batch, so the drop
    happened EITHER WAY — the explicit filter makes the semantics
    engine-portable and visible in the plan instead of an Arrow-side
    accident a SQL oracle would disagree with)."""
    import pandas as pd  # noqa: F401 — applyInPandas contract

    keys = list(keys)
    base = df.select(
        *keys,
        F.col(order_col).alias("__o"),
        value_col.cast("double").alias("__x"),
    ).filter(F.col("__o").isNotNull() & F.col("__x").isNotNull())
    for k in keys:
        base = base.filter(F.col(k).isNotNull())
    ktypes = ", ".join(
        f"{k} {base.schema[k].dataType.simpleString()}" for k in keys
    )
    otype = base.schema["__o"].dataType.simpleString()
    out_schema = (
        f"{ktypes}, {order_col} {otype}, value long, "
        "level double, trend double, forecast double"
    )

    def fit(pdf):
        import numpy as np
        import pandas as pd

        frames = []
        for kv, sub in pdf.groupby(keys, sort=False):
            # (__o, __x) — the page_hinkley/sprt total-order rule: a
            # sort on __o alone leaves tied timestamps in Arrow-batch
            # arrival order, which is partition-layout-dependent, and
            # the sequential recursion would amplify that into
            # nondeterministic level/trend for every later row (r13
            # ADVICE finding). Tied (__o, __x) rows are interchangeable
            # inputs to the recursion, so this order is total in effect.
            sub = sub.sort_values(["__o", "__x"], kind="mergesort")
            x = sub["__x"].to_numpy(dtype="float64")
            n = len(x)
            lvl = np.empty(n)
            trd = np.empty(n)
            lvl[0] = x[0]
            trd[0] = (x[1] - x[0]) if n > 1 else 0.0
            for t in range(1, n):
                prev = lvl[t - 1]
                lvl[t] = alpha * x[t] + (1.0 - alpha) * (prev + trd[t - 1])
                trd[t] = beta * (lvl[t] - prev) + (1.0 - beta) * trd[t - 1]
            out = pd.DataFrame({order_col: sub["__o"].values,
                                "value": x.astype("int64"),
                                "level": lvl, "trend": trd,
                                "forecast": lvl + trd})
            if not isinstance(kv, tuple):
                kv = (kv,)
            for k, v in zip(keys, kv):
                out[k] = v
            frames.append(out[[*keys, order_col, "value", "level", "trend",
                               "forecast"]])
        return pd.concat(frames, ignore_index=True)

    bucketed = base.withColumn(
        "__gb", F.pmod(F.xxhash64(*keys), F.lit(int(n_buckets)))
    )
    raw = bucketed.groupBy("__gb").applyInPandas(
        lambda pdf: fit(pdf.drop(columns=["__gb"])), schema=out_schema
    )
    return raw.select(
        *keys,
        order_col,
        "value",
        F.round("level", round_to).alias("level"),
        F.round("trend", round_to).alias("trend"),
        F.round("forecast", round_to).alias("forecast"),
    )


def holt_winters(
    df: DataFrame,
    keys: "Sequence[str]",
    order_col: str,
    value_col: Column,
    period: int,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.5,
    round_to: int = 6,
    n_buckets: int = 256,
) -> DataFrame:
    """Holt–Winters ADDITIVE seasonal (triple exponential) smoothing
    per key (Winters 1960, public) — holt_linear plus a seasonal
    component of length `period`; the forecaster for metrics with a
    daily/weekly shape (hourly event volume, daily ingest):

        l_t = α(x_t − s_{t−p}) + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
        s_t = γ(x_t − l_t) + (1−γ)·s_{t−p}
        one-step forecast f_{t+1} = l_t + b_t + s_{t+1−p}

    Init (the documented simple convention, exactly replayable): after
    the first full season x_1..x_p, l_p = Σx/p (exact-integer sum, one
    division), b_p = 0, s_i = x_i − l_p; the recursion starts at
    t = p+1 and only rows t > p are emitted — keys with ≤ period
    points produce NO rows (no season to learn from).

    Engine-exactness: the holt_linear contract — values INTEGER-exact,
    the recursion a fixed sequence of IEEE double ops bit-identical to
    the oracle's recursive CTE (which carries the rolling seasonal
    window as a p-element list). Ties in `order_col` break by value.
    Runs in the kendall-shape bucketed Arrow batching (whole keys per
    bucket, numpy loops inside). BOUNDED-GROUP caveat: one key's
    history must fit one task. Output: (keys..., order_col, value,
    level, trend, seasonal, forecast).

    NULL-KEY rows drop (r14 adversarial pass — the holt_linear note:
    pandas `groupby` silently discards NULL-key groups either way; the
    explicit filter makes the semantics visible and oracle-portable)."""
    import pandas as pd  # noqa: F401 — applyInPandas contract

    keys = list(keys)
    p = int(period)
    if p < 1:
        raise ValueError(f"holt_winters: period must be >= 1, got {period}")
    base = df.select(
        *keys,
        F.col(order_col).alias("__o"),
        value_col.cast("double").alias("__x"),
    ).filter(F.col("__o").isNotNull() & F.col("__x").isNotNull())
    for k in keys:
        base = base.filter(F.col(k).isNotNull())
    ktypes = ", ".join(
        f"{k} {base.schema[k].dataType.simpleString()}" for k in keys
    )
    otype = base.schema["__o"].dataType.simpleString()
    out_schema = (
        f"{ktypes}, {order_col} {otype}, value long, "
        "level double, trend double, seasonal double, forecast double"
    )

    def fit(pdf):
        import numpy as np
        import pandas as pd

        frames = []
        for kv, sub in pdf.groupby(keys, sort=False):
            sub = sub.sort_values(["__o", "__x"], kind="mergesort")
            x = sub["__x"].to_numpy(dtype="float64")
            n = len(x)
            if n <= p:
                continue
            m = x[:p].sum() / p
            s = np.empty(n)
            s[:p] = x[:p] - m
            lvl = m
            trd = 0.0
            out_lvl = np.empty(n - p)
            out_trd = np.empty(n - p)
            out_sea = np.empty(n - p)
            out_fc = np.empty(n - p)
            for t in range(p, n):
                s_prev = s[t - p]
                l_new = alpha * (x[t] - s_prev) + (1.0 - alpha) * (lvl + trd)
                trd = beta * (l_new - lvl) + (1.0 - beta) * trd
                s[t] = gamma * (x[t] - l_new) + (1.0 - gamma) * s_prev
                lvl = l_new
                i = t - p
                out_lvl[i] = lvl
                out_trd[i] = trd
                out_sea[i] = s[t]
                out_fc[i] = lvl + trd + s[t + 1 - p]
            out = pd.DataFrame({order_col: sub["__o"].values[p:],
                                "value": x[p:].astype("int64"),
                                "level": out_lvl, "trend": out_trd,
                                "seasonal": out_sea, "forecast": out_fc})
            if not isinstance(kv, tuple):
                kv = (kv,)
            for k, v in zip(keys, kv):
                out[k] = v
            frames.append(out[[*keys, order_col, "value", "level", "trend",
                               "seasonal", "forecast"]])
        if not frames:
            return pd.DataFrame(
                {c: pd.Series(dtype="object") for c in
                 [*keys, order_col, "value", "level", "trend", "seasonal",
                  "forecast"]}
            )
        return pd.concat(frames, ignore_index=True)

    bucketed = base.withColumn(
        "__gb", F.pmod(F.xxhash64(*keys), F.lit(int(n_buckets)))
    )
    raw = bucketed.groupBy("__gb").applyInPandas(
        lambda pdf: fit(pdf.drop(columns=["__gb"])), schema=out_schema
    )
    return raw.select(
        *keys,
        order_col,
        "value",
        F.round("level", round_to).alias("level"),
        F.round("trend", round_to).alias("trend"),
        F.round("seasonal", round_to).alias("seasonal"),
        F.round("forecast", round_to).alias("forecast"),
    )


def mann_kendall_grouped(
    df: DataFrame,
    group_col: str,
    order_col: Column,
    value_col: Column,
    round_to: int = 6,
) -> DataFrame:
    """Mann–Kendall trend test per key (Mann 1945 / Kendall 1975,
    public) — the significance companion of theil_sen_grouped (Sen
    gives the slope, MK says whether a monotone trend EXISTS, with no
    distribution assumption):

        S = Σ_{i<j} sign(x_j − x_i)      (time-ordered pairs)
        Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18
        z = (S−1)/σ if S>0, 0 if S=0, (S+1)/σ if S<0   (continuity)

    S is exactly concordant − discordant of Kendall's tau against
    time, so it reuses the r12 inversion-count machinery
    (`evaluation._kendall_counts_sorted` — O(g log² g) vectorized
    merge rounds batched whole-key per Arrow call; never the O(g²)
    pair join). The tie term needs run SIZES, not pair counts: one
    extra (key, value) hash aggregate supplies Σ t(t−1)(2t+5) in
    DECIMAL(38,0). `order_col` must be UNIQUE per key (the classical
    no-time-ties assumption; the variance formula above is only valid
    then — duplicate timestamps should be pre-aggregated, as every
    series query here does). z is NULL below 2 points or when
    Var = 0 (all values tied). Output:
    (group, n_points, s, z)."""
    from table_computing_spark.operators.evaluation import (
        _kendall_counts_sorted,
    )

    dec = "decimal(38,0)"
    base = df.select(
        F.col(group_col).alias("__g"),
        order_col.cast("double").alias("__x"),
        value_col.cast("double").alias("__y"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull()).withColumn(
        "__it", F.col("__x")
    )
    counts = _kendall_counts_sorted(base)
    ties = (
        base.groupBy("__g", "__y")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("__g")
        .agg(
            F.sum(
                F.col("__c").cast(dec)
                * (F.col("__c") - 1).cast(dec)
                * (F.lit(2).cast(dec) * F.col("__c").cast(dec) + F.lit(5).cast(dec))
            ).alias("__tt")
        )
    )
    j = counts.join(ties, "__g")
    s = (F.col("concordant") - F.col("discordant")).cast("long")
    n = F.col("n_items").cast(dec)
    var = (
        (
            n * (n - F.lit(1).cast(dec))
            * (F.lit(2).cast(dec) * n + F.lit(5).cast(dec))
            - F.col("__tt")
        ).cast("double")
        / 18.0
    )
    sigma = F.sqrt(var)
    z = F.when(
        (F.col("n_items") >= 2) & (var > 0),
        F.when(s > 0, (s.cast("double") - 1.0) / sigma)
        .when(s < 0, (s.cast("double") + 1.0) / sigma)
        .otherwise(F.lit(0.0)),
    )
    return j.select(
        F.col("__g").alias("group"),
        F.col("n_items").cast("long").alias("n_points"),
        s.alias("s"),
        F.round(z, round_to).alias("z"),
    )
