"""Integer quota allocation: apportion a fixed total across groups in
proportion to weights, exactly (largest-remainder / Hamilton method —
public apportionment math).

This is the mixture-sampling companion to operators/text.mixture_weights:
once a mixture says "source s gets 13.37% of the budget", something must
turn that into INTEGER example counts that sum exactly to the budget.
Largest-remainder does it deterministically and integer-exactly:

    base_s  = floor(total · w_s / W)          (exact integer arithmetic)
    rem_s   = total · w_s − base_s · W        (the scaled remainder)
    the (total − Σ base) leftover seats go to the largest rem_s
    (ties → smallest key), +1 each.

Everything is integer math on DECIMAL(38,0)-safe products, so any
engine reproduces the allocation bit-for-bit. The remainder ranking is
a window over ONE ROW PER GROUP — bounded by category cardinality, the
same provably-small-window class as the PSI/WOE totals (the plan
gate's whitelist entries carry measured bounds)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def largest_remainder(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    total: int,
) -> DataFrame:
    """(key, weight, base, extra, allocated) with Σ allocated == total.

    Weights must be non-negative integers (counts, cents). Groups with
    weight 0 can still receive a leftover seat only if every remainder
    ties at 0 and seats remain — the deterministic key order decides,
    as the method specifies."""
    dec = "decimal(38,0)"
    per = df.groupBy(key_col).agg(
        F.sum(F.col(weight_col).cast(dec)).alias("__w")
    )
    tot = per.agg(F.sum("__w").alias("__wtot"))
    j = per.crossJoin(F.broadcast(tot))
    # all-zero weights: W=0 would NULL every quotient; with W->1 the
    # zero numerators floor to 0 and every seat goes to the key-order
    # tiebreak, as the method specifies
    wtot = F.greatest(F.col("__wtot"), F.lit(1).cast(dec))
    num = F.col("__w") * F.lit(int(total)).cast(dec)
    # Spark DECIMAL division rounds the quotient (scale 6, HALF_UP)
    # BEFORE floor, so a fractional part >= .9999995 floors one too
    # high; the rounding error is < 1e-6, so one downward correction
    # restores the exact integer floor (pytest-pinned on the
    # adversarial quotient 19,999,999/20,000,000)
    raw = F.floor(num / wtot).cast(dec)
    base = F.when(raw * wtot > num, raw - 1).otherwise(raw)
    j = j.select(
        key_col,
        F.col("__w").cast("long").alias("weight"),
        base.cast("long").alias("base"),
        (num - base * wtot).alias("__rem"),
    )
    # leftover seats = total - sum(base): a 1-row broadcast
    left = j.agg((F.lit(int(total)) - F.sum("base")).alias("__left"))
    w = W.orderBy(F.col("__rem").desc(), F.col(key_col).asc())
    ranked = j.crossJoin(F.broadcast(left)).withColumn(
        "__rk", F.row_number().over(w)
    )
    return ranked.select(
        key_col,
        "weight",
        "base",
        F.when(F.col("__rk") <= F.col("__left"), F.lit(1))
        .otherwise(F.lit(0)).cast("int").alias("extra"),
        (
            F.col("base")
            + F.when(F.col("__rk") <= F.col("__left"), F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("allocated"),
    )
