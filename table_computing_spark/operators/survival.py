"""Survival analysis: the Kaplan–Meier product-limit estimator
(Kaplan & Meier 1958 — the standard non-parametric survival curve,
public statistics).

Pipelines use it far beyond clinical data: time-to-churn, time-to-
conversion with right-censoring (users still active at the snapshot
are censored, not converted), hardware time-to-failure. The estimator
at time t is

    S(t) = Π_{t_i ≤ t} (1 − d_i / n_i)

over the distinct EVENT times t_i, with d_i = events at t_i and
n_i = subjects still at risk at t_i (neither evented nor censored
before t_i).

Engine-exactness: d_i and n_i are exact integers (one hash aggregate +
one suffix count via total − running prefix); the product is
exp(Σ ln(1 − d/n)) accumulated by a RUNNING window sum in event-time
order — a sequential, deterministic summation order that DuckDB's
running window reproduces term for term, and ln/exp match libm
bit-for-bit across both engines (the repo-wide `ln` rule). One final
round.

Plan shape: one hash aggregate keyed by (group, t), one partitioned
running window per group ordered by t — the window input is the
DISTINCT TIME table (≤ |distinct durations| rows per group), never the
subject rows.

The reference has no survival operator; this family exists because
time-to-event curves are a standard step in retention/conversion
analytics at scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def kaplan_meier(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    event_col: Column,
    round_to: int = 6,
) -> DataFrame:
    """Per-group Kaplan–Meier curve: one row per distinct observed
    time (event or censoring) with (keys..., t, n_risk, n_event,
    n_censor, survival). `event_col` is a boolean Column — true means
    the event occurred at `time_col`, false means the subject was
    censored there. Censored subjects leave the risk set AFTER t (the
    standard convention: a subject censored at t was at risk at t).

    survival only steps down at event times; censoring rows keep the
    running value (they're reported for the at-risk bookkeeping).

    With keys=[] the running window is global over the DISTINCT-TIME
    table — fine for discretized durations (days, buckets), but
    ms-precision times make that table data-sized: pass group keys or
    discretize t first (the same rule as every global-order path)."""
    keys = list(keys)
    per_t = df.groupBy(*keys, F.col(time_col).alias("t")).agg(
        F.sum(event_col.cast("long")).alias("n_event"),
        F.sum((~event_col).cast("long")).alias("n_censor"),
    )
    w_all = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    w_run = w_all.orderBy(F.col("t").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = F.sum(F.col("n_event") + F.col("n_censor")).over(w_all)
    left_through_t = F.sum(F.col("n_event") + F.col("n_censor")).over(w_run)
    # at risk AT t = everyone minus those who left strictly before t;
    # materialized BEFORE the running-product window (windows can't nest)
    risked = per_t.select(
        *keys, "t", "n_event", "n_censor",
        (total - left_through_t + F.col("n_event") + F.col("n_censor"))
        .alias("n_risk"),
    )
    # ln(1 - d/n) term; d == n (the whole risk set events) sends the
    # curve to exactly 0 — encode as a -1e18 sentinel so exp() returns
    # 0.0 instead of ln(0)'s engine-dependent null/-inf
    term = (
        F.when(F.col("n_event") >= F.col("n_risk"), F.lit(-1e18))
        .when(
            F.col("n_event") > 0,
            F.log(
                F.lit(1.0)
                - F.col("n_event").cast("double") / F.col("n_risk").cast("double")
            ),
        )
        .otherwise(F.lit(0.0))
    )
    stepped = risked.withColumn("__lnS", F.sum(term).over(w_run))
    return stepped.select(
        *keys, "t", "n_risk", "n_event", "n_censor",
        F.round(F.exp("__lnS"), round_to).alias("survival"),
    )


def nelson_aalen(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    event_col: Column,
    round_to: int = 6,
) -> DataFrame:
    """Per-group Nelson–Aalen cumulative-hazard estimator (Nelson
    1972 / Aalen 1978 — the standard nonparametric hazard companion to
    kaplan_meier above, public statistics):

        H(t) = Σ_{t_i ≤ t} d_i / n_i

    with the same d_i (events at t_i) / n_i (at risk at t_i) risk-set
    bookkeeping as kaplan_meier — one hash aggregate keyed by
    (group, t), at-risk via total − running prefix, censoring leaves
    the risk set AFTER t. Where KM's survival needs ln/exp (a product
    limit), the hazard is a plain SUM — so here each d/n term rounds
    to a nano long and the running sum is pure integer arithmetic:
    bit-identical across engines with no transcendental at all.

    Same window contract as KM: the running window's input is the
    DISTINCT-TIME table per group; with keys=[] discretize t first.
    Output: (keys..., t, n_risk, n_event, n_censor, cumhazard)."""
    keys = list(keys)
    per_t = df.groupBy(*keys, F.col(time_col).alias("t")).agg(
        F.sum(event_col.cast("long")).alias("n_event"),
        F.sum((~event_col).cast("long")).alias("n_censor"),
    )
    w_all = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    w_run = w_all.orderBy(F.col("t").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = F.sum(F.col("n_event") + F.col("n_censor")).over(w_all)
    left_through_t = F.sum(F.col("n_event") + F.col("n_censor")).over(w_run)
    risked = per_t.select(
        *keys, "t", "n_event", "n_censor",
        (total - left_through_t + F.col("n_event") + F.col("n_censor"))
        .alias("n_risk"),
    )
    term = F.when(
        F.col("n_event") > 0,
        F.round(
            F.col("n_event").cast("double")
            / F.col("n_risk").cast("double")
            * 1e9
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    stepped = risked.withColumn("__hn", F.sum(term).over(w_run))
    return stepped.select(
        *keys, "t", "n_risk", "n_event", "n_censor",
        F.round(F.col("__hn").cast("double") / 1e9, round_to).alias("cumhazard"),
    )
