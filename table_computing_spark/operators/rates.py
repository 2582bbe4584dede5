"""Small-sample rate estimation — ranking and smoothing per-key
success rates when many keys have few trials (the "sort by rating"
and "CTR smoothing" problems every catalog/feed pipeline hits).

Two public, complementary estimators:

  wilson_lower_bound   the frequentist guardrail: rank by the lower
                       confidence bound so a 1/1 item never outranks
                       a 95/100 item (Wilson 1927; popularized for
                       rating sort by Evan Miller's "How Not To Sort
                       By Average Rating").
  eb_shrink            the empirical-Bayes alternative: fit a
                       Beta(α, β) prior to the observed per-key rates
                       by moment matching and report the posterior
                       mean (pos + α) / (n + α + β) — small-n keys
                       shrink toward the global mean, big-n keys keep
                       their data (Robinson 2015's batting-average
                       walkthrough of Efron & Morris 1975).

House exactness discipline: per-key n / pos are exact integer hash
aggregates; every cross-key accumulation goes through nano fixed-point
longs (float sums are order-dependent); the closing formulas are
fixed-order double arithmetic rounded once, so DuckDB reproduces each
value bit-for-bit.

Reference parity note: the reference engine (alibaba/table-computing)
has no statistics library — this module is part of the
pipeline-completing extension surface, like drift.py/evaluation.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def wilson_lower_bound(
    df: DataFrame,
    keys: Sequence[str],
    success_col: Column,
    z: float = 1.96,
    round_to: int = 6,
) -> DataFrame:
    """Per-key Wilson score interval lower bound for a Bernoulli rate:

        wlb = (p̂ + z²/2n − z·sqrt(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)

    Rank by `wilson_lb` instead of the raw rate and small-sample
    flukes sink to where their evidence puts them. One hash aggregate;
    keys with n = 0 rows cannot occur (no row, no key); the formula is
    one fixed-order double expression. Output:
    (keys..., n, n_pos, rate, wilson_lb)."""
    keys = list(keys)
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(success_col.cast("long")).alias("n_pos"),
    )
    nd = F.col("n").cast("double")
    p = F.col("n_pos").cast("double") / nd
    z2 = float(z) * float(z)
    wlb = (
        p
        + F.lit(z2) / (F.lit(2.0) * nd)
        - F.lit(float(z))
        * F.sqrt(p * (F.lit(1.0) - p) / nd + F.lit(z2) / (F.lit(4.0) * nd * nd))
    ) / (F.lit(1.0) + F.lit(z2) / nd)
    return agg.select(
        *keys,
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.round(p, round_to).alias("rate"),
        F.round(wlb, round_to).alias("wilson_lb"),
    )


def eb_shrink(
    df: DataFrame,
    keys: Sequence[str],
    success_col: Column,
    round_to: int = 6,
) -> DataFrame:
    """Empirical-Bayes rate shrinkage with a moment-matched
    Beta(α, β) prior:

        m = mean of per-key rates,  v = population variance of rates
        k = m(1−m)/v − 1,   α = m·k,   β = (1−m)·k
        shrunk_rate = (pos + α) / (n + α + β)

    Engine-exactness: per-key rates are single divisions; the
    cross-key mean/variance accumulate nano-rounded longs (the
    reduce-order-free staging); α/β and the posterior means are
    fixed-order doubles, rounded once. The prior row joins back as a
    1-row broadcast scalar.

    Degenerate priors fail loudly (the srm_check discipline): fewer
    than 2 keys, zero rate variance, or v ≥ m(1−m) (over-dispersion
    beyond what ANY beta prior can express — moment matching would
    produce a negative α) raise ValueError. Output: (keys..., n,
    n_pos, rate, shrunk_rate, alpha, beta) with alpha/beta repeated on
    every row."""
    keys = list(keys)
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(success_col.cast("long")).alias("n_pos"),
    )
    rate = F.col("n_pos").cast("double") / F.col("n").cast("double")
    staged = agg.withColumn("__rn", F.round(rate * 1e9).cast("long"))
    mom = staged.agg(
        F.count(F.lit(1)).alias("__k"),
        F.sum("__rn").alias("__s"),
        F.sum(F.col("__rn").cast("decimal(38,0)") * F.col("__rn").cast("decimal(38,0)"))
        .alias("__q"),
    )
    kd = F.col("__k").cast("double")
    m = F.col("__s").cast("double") / kd / 1e9
    v = (
        F.col("__q").cast("double") / 1e18
        - (F.col("__s").cast("double") / 1e9) * (F.col("__s").cast("double") / 1e9) / kd
    ) / kd
    bad = mom.filter(
        (F.col("__k") < 2)
        | (v <= 0)
        | (v >= m * (F.lit(1.0) - m))
    )
    if bad.take(1):
        raise ValueError(
            "eb_shrink: cannot moment-match a beta prior — need >= 2 keys, "
            "non-zero rate variance, and variance < m(1-m)"
        )
    kk = m * (F.lit(1.0) - m) / v - F.lit(1.0)
    prior = mom.select(
        (m * kk).alias("__alpha"), ((F.lit(1.0) - m) * kk).alias("__beta")
    )
    j = staged.crossJoin(F.broadcast(prior))  # 1-row scalar join
    shrunk = (F.col("n_pos").cast("double") + F.col("__alpha")) / (
        F.col("n").cast("double") + F.col("__alpha") + F.col("__beta")
    )
    return j.select(
        *keys,
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.round(rate, round_to).alias("rate"),
        F.round(shrunk, round_to).alias("shrunk_rate"),
        F.round(F.col("__alpha"), round_to).alias("alpha"),
        F.round(F.col("__beta"), round_to).alias("beta"),
    )


def prop_compare(
    df: DataFrame,
    in_group_a: Column,
    success_col: Column,
    z: float = 1.959963984540054,
    round_to: int = 6,
) -> DataFrame:
    """Two-proportion comparison in one pass (classical large-sample
    theory, public): the pooled two-proportion z test plus the two
    effect-size readouts experimentation reports actually quote —
    relative risk with the Katz (1978) log CI and the odds ratio with
    the Woolf (1955) log CI:

        z_stat = (p_a − p_b) / sqrt( p̂(1−p̂)(1/n_a + 1/n_b) )
        RR = p_a/p_b,  CI = exp(ln RR ± z·sqrt((1−p_a)/x_a + (1−p_b)/x_b))
        OR = (x_a·(n_b−x_b)) / (x_b·(n_a−x_a)),
             CI = exp(ln OR ± z·sqrt(1/x_a + 1/(n_a−x_a)
                                     + 1/x_b + 1/(n_b−x_b)))

    The srm_check/cohens_d discipline: ONE hash aggregate to the four
    exact integer cells, every statistic a fixed-order double
    expression on them, rounded once. z_stat is NULL when either arm
    is empty or the pooled rate is degenerate (0 or 1); RR and its CI
    are NULL when either arm has zero successes; OR and its CI are
    NULL when any cell is zero (the classical undefined cases,
    reported as NULL — never an Inf that poisons a downstream sort).
    INDICATOR CONTRACT (r14 pass): `in_group_a`/`success_col` must be
    0/1 or boolean — a non-indicator numeric silently drives the (1−a)
    complement cells negative (the mantel_haenszel note).
    Output one row: (n_a, x_a, n_b, x_b, p_a, p_b, z_stat, rr, rr_lo,
    rr_hi, or_, or_lo, or_hi)."""
    s = df.select(
        in_group_a.cast("int").alias("__a"),
        success_col.cast("long").alias("__y"),
    ).filter(F.col("__a").isNotNull() & F.col("__y").isNotNull())
    agg = s.agg(
        F.sum("__a").alias("n_a"),
        F.sum(F.lit(1) - F.col("__a")).alias("n_b"),
        F.sum(F.col("__a") * F.col("__y")).alias("x_a"),
        F.sum((F.lit(1) - F.col("__a")) * F.col("__y")).alias("x_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    xa, xb = F.col("x_a").cast("double"), F.col("x_b").cast("double")
    # every division sits INSIDE its guard: ANSI mode raises
    # DIVIDE_BY_ZERO for an unguarded expression even when the result
    # would be discarded; CASE WHEN evaluates only the taken branch
    pa = F.when(F.col("n_a") > 0, xa / na)
    pb = F.when(F.col("n_b") > 0, xb / nb)
    pool = (xa + xb) / (na + nb)
    var = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        pool * (1.0 - pool) * (1.0 / na + 1.0 / nb),
    )
    z_stat = F.when(var > 0, (pa - pb) / F.sqrt(var))
    rr_ok = (F.col("x_a") > 0) & (F.col("x_b") > 0)
    rr = F.when(rr_ok, pa / pb)
    rr_se = F.sqrt((1.0 - pa) / xa + (1.0 - pb) / xb)
    or_ok = (
        rr_ok
        & (F.col("n_a") > F.col("x_a")) & (F.col("n_b") > F.col("x_b"))
    )
    orr = F.when(or_ok, (xa * (nb - xb)) / (xb * (na - xa)))
    or_se = F.sqrt(
        1.0 / xa + 1.0 / (na - xa) + 1.0 / xb + 1.0 / (nb - xb)
    )
    zl = F.lit(float(z))
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("x_a").cast("long").alias("x_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("x_b").cast("long").alias("x_b"),
        F.round(pa, round_to).alias("p_a"),
        F.round(pb, round_to).alias("p_b"),
        F.round(z_stat, round_to).alias("z_stat"),
        F.round(rr, round_to).alias("rr"),
        F.round(
            F.when(rr_ok, F.exp(F.log(pa / pb) - zl * rr_se)), round_to
        ).alias("rr_lo"),
        F.round(
            F.when(rr_ok, F.exp(F.log(pa / pb) + zl * rr_se)), round_to
        ).alias("rr_hi"),
        F.round(orr, round_to).alias("or_"),
        F.round(
            F.when(
                or_ok,
                F.exp(
                    F.log((xa * (nb - xb)) / (xb * (na - xa))) - zl * or_se
                ),
            ),
            round_to,
        ).alias("or_lo"),
        F.round(
            F.when(
                or_ok,
                F.exp(
                    F.log((xa * (nb - xb)) / (xb * (na - xa))) + zl * or_se
                ),
            ),
            round_to,
        ).alias("or_hi"),
    )
