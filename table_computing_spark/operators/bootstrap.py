"""Deterministic Poisson-bootstrap confidence intervals — error bars
for aggregate estimates, computed distributed and reproducibly.

The Poisson bootstrap (Chamandy et al. 2012, "Estimating Uncertainty
for Massive Data Streams" — the standard big-data bootstrap) replaces
resampling-with-replacement by giving every row an independent
Poisson(1) multiplicity per replica: replica r's estimate is the
weighted aggregate under those multiplicities, and the spread of the
R replica estimates is the sampling distribution of the statistic.
No replica ever materializes as a dataset; each is just a weighted
aggregation.

Determinism discipline (the repo's md5 convention, sampling.py): the
Poisson draw for (row, replica) comes from the first 8 hex digits of
md5("<id>:<replica>") compared against FIXED hex thresholds of the
Poisson(1) CDF — fixed-width hex compares lexicographically as the
number it encodes, so Spark and any SQL oracle pick the identical
multiplicity for every (row, replica). Reruns, retries and engines
all agree; there is no RNG anywhere.

Scale shape: rows explode ×R (map-side — the per-(group, replica)
partial aggregation combines BEFORE the shuffle, so shuffle width is
|groups|·R partials per task, not |rows|·R); replica means are one
hash aggregate; the CI picks order statistics from the ≤R replica
means per group with a bounded partitioned window. Values should be
integer units (cents) so replica sums are exact and the single
mean division is engine-identical.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

# P(Poisson(1) <= k) for k = 0..10, as 8-hex-digit thresholds of u·16^8.
# Multiplicity = first k whose threshold exceeds the row's hex draw
# (tail beyond 11 has probability < 1e-8 — capped).
_POISSON1_CUM = [
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253, 0.9999988329190791,
    0.9999998786510004, 0.9999999881671395,
]
_POISSON1_HEX = [format(int(p * 16**8), "08x") for p in _POISSON1_CUM]


# _spread before the ×R replica explode + md5 draw stage (measured at
# sf0.1: 10.1 s → 1.5 s warm for bootstrap_mean_ci; results are
# row-order independent — every draw is keyed by (id, replica) md5 and
# every aggregate is an exact integer/decimal sum). Shared helper
# (r14 ADVICE: three verbatim copies consolidated).
from table_computing_spark.operators._util import _spread


def poisson1_weight(hex8) -> "F.Column":
    """Poisson(1) multiplicity from an 8-hex-digit uniform draw."""
    w = F.lit(len(_POISSON1_HEX))  # capped tail
    for k in range(len(_POISSON1_HEX) - 1, -1, -1):
        w = F.when(hex8 < F.lit(_POISSON1_HEX[k]), F.lit(k)).otherwise(w)
    return w


def bootstrap_mean_ci(
    df: DataFrame,
    keys: Sequence[str],
    value_int: str,
    id_col: str,
    replicas: int = 100,
    level_permille: int = 950,
    round_to: int = 6,
) -> DataFrame:
    """Per-group bootstrap CI of the MEAN of `value_int` (an
    integer-unit column — cents, counts — so sums stay exact).

    Output: (keys..., n, mean, n_replicas, ci_lo, ci_hi) where n and
    mean are the full-sample values, and [ci_lo, ci_hi] are the lower
    empirical (α/2, 1−α/2) quantiles of the replica means
    (α = 1 − level_permille/1000; ranks via exact integer ceil, no
    float boundary). Replicas that draw total weight 0 are dropped
    (probability e^{-n} per replica — negligible except on tiny
    groups, and the rank arithmetic uses the surviving count). Rows
    with a NULL id are EXCLUDED everywhere (no identity → no
    deterministic draw; silently hashing NULL would give them weight 0
    in Spark but weight 11 in a SQL CASE replay)."""
    keys = list(keys)
    df = _spread(df.where(F.col(id_col).isNotNull()))
    # one md5 yields 32 hex chars = FOUR independent 8-hex draws:
    # replica r = 4*rg + lane reads lane `lane` of md5("<id>:<rg>").
    # Structured as a TWO-LEVEL explode so each md5 computes once per
    # (row, rg) — 4x fewer hashes than a per-replica expression — and
    # the Poisson pick is the FLAT sum of threshold indicators (a
    # nested 12-branch CASE WHEN defeats codegen; measured 17s -> 6s
    # on 15M draws for the whole stage). Draws are bit-identical to
    # the per-replica formula, so the oracle replays unchanged.
    n_groups = (replicas + 3) // 4
    rg = df.select(
        *keys,
        F.col(id_col).cast("string").alias("__id"),
        F.col(value_int).cast("long").alias("__x"),
        F.explode(F.sequence(F.lit(0), F.lit(n_groups - 1))).alias("__rg"),
    )
    # materialize the hash in its OWN projection: four substring
    # references to the md5 expression would re-evaluate it 4x
    # (Catalyst does not CSE across the array elements)
    hashed = rg.select(
        *keys,
        "__x",
        "__rg",
        F.md5(
            F.concat(F.col("__id"), F.lit(":"), F.col("__rg").cast("string"))
        ).alias("__h32"),
    )
    lanes = hashed.select(
        *keys,
        "__x",
        "__rg",
        F.posexplode(
            F.array(
                *[F.substring(F.col("__h32"), 1 + 8 * lane, 8) for lane in range(4)]
            )
        ).alias("__lane", "__hex"),
    )
    flat_w = None
    for h in _POISSON1_HEX:
        term = (F.col("__hex") >= F.lit(h)).cast("int")
        flat_w = term if flat_w is None else flat_w + term
    weighted = lanes.select(
        *keys,
        (F.col("__rg") * 4 + F.col("__lane")).alias("__r"),
        flat_w.alias("__w"),
        "__x",
    ).filter(F.col("__r") < replicas)
    per_rep = (
        weighted.groupBy(*keys, "__r")
        .agg(
            F.sum("__w").alias("__sw"),
            # decimal like the full-sample mean below: a long replica
            # sum wraps silently at the module's advertised scale
            F.sum(
                F.col("__w").cast("decimal(38,0)") * F.col("__x").cast("decimal(38,0)")
            ).alias("__swx"),
        )
        .filter(F.col("__sw") > 0)
        .select(
            *keys,
            F.round(F.col("__swx").cast("double") / F.col("__sw").cast("double"), round_to).alias("__m"),
            "__r",
        )
    )
    wk = W.partitionBy(*keys).orderBy(F.col("__m").asc(), F.col("__r").asc())
    ranked = per_rep.select(
        *keys, "__m", F.row_number().over(wk).alias("__rn"),
        F.count(F.lit(1)).over(W.partitionBy(*keys)).alias("__cnt"),
    )
    lo_p = 1000 - level_permille  # 2*α/2 in permille
    lo_rank = F.ceil(F.col("__cnt") * F.lit(lo_p) / F.lit(2000.0)).cast("long")
    hi_rank = F.ceil(F.col("__cnt") * F.lit(2000 - lo_p) / F.lit(2000.0)).cast("long")
    ci = ranked.groupBy(*keys).agg(
        F.max(F.when(F.col("__rn") == F.greatest(lo_rank, F.lit(1)), F.col("__m"))).alias("ci_lo"),
        F.max(F.when(F.col("__rn") == F.least(hi_rank, F.col("__cnt")), F.col("__m"))).alias("ci_hi"),
        F.max("__cnt").alias("n_replicas"),
    )
    full = df.groupBy(*keys).agg(
        F.count(value_int).alias("n"),
        F.round(
            F.sum(F.col(value_int).cast("decimal(38,0)")).cast("double")
            / F.count(value_int).cast("double"),
            round_to,
        ).alias("mean"),
    )
    return full.join(ci, keys).select(
        *keys, "n", "mean", "n_replicas", "ci_lo", "ci_hi"
    )
