"""Skew-aware join — explicit salting for hot keys.

The reference shuffles with a plain hash of the key tuple
(sp/Rehash.java:314-331): one hot key → one thread of one server melts,
and the README's only mitigation is "add servers". On Spark, AQE's
skew-join handles sort-merge skew automatically (enabled in
session.py), but explicit salting is still the tool when
  * the hot side feeds a stateful/streaming op where AQE is off,
  * both sides are too large to broadcast AND the skew is extreme
    enough that even split sub-partitions overwhelm a task, or
  * you want deterministic partition fan-out (benchmarking).

Mechanics: the skewed (large) side gets a uniform salt in [0, s);
the other side is replicated s times with every salt value; the join
key becomes (keys..., salt). Row multiplicity is unchanged — each
original pair meets exactly once, for any join type, because the
replicated side carries every salt exactly once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__tc_salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str] | Sequence[tuple[str, str]],
    how: str = "inner",
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Join with the skewed side salted and `other` replicated `salt`×.

    `on` is a list of column names (same on both sides) or
    (skewed_col, other_col) pairs. Supported join types: inner, left
    (left = the skewed side). `rand(seed)` is per-partition
    deterministic, so task retries reproduce the same salt.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left with the skewed side on the left")
    pairs = [(c, c) if isinstance(c, str) else tuple(c) for c in on]

    s = skewed.withColumn(SALT, F.floor(F.rand(seed) * salt).cast("int"))
    o = other.withColumn(SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)])))

    cond = (s[SALT] == o[SALT])
    for lc, rc in pairs:
        cond = cond & (s[lc] == o[rc])
    joined = s.join(o, cond, how).drop(s[SALT]).drop(o[SALT])
    # drop duplicate key columns for same-named keys (mirror plain join-on-names)
    for lc, rc in pairs:
        if lc == rc:
            joined = joined.drop(o[rc])
    return joined


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Shuffle-skew diagnostics for a prospective join/groupBy key: the
    top-k heaviest keys with their share of all rows, plus the
    distribution summary every row repeats — n_keys, max/avg counts,
    and skew_ratio = max/avg (the factor by which the hottest key's
    reducer outweighs the average one; >> 1 means salt this key or
    rely on AQE skew splitting).

    Plan: one hash aggregation on the key, one single-row summary
    aggregate broadcast onto the TakeOrderedAndProject top-k — never
    an unpartitioned window over the (possibly huge) distinct-key set.
    Run it BEFORE committing a 100 TB job to a bad key, for the cost
    of one count per key. All shares are exact integer ratios rounded
    per row (engine-exact)."""
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    summary = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n_rows").alias("__max"),
    )
    topk = counts.orderBy(F.desc("n_rows"), F.asc("key")).limit(top_k)
    return topk.crossJoin(F.broadcast(summary)).select(
        "key",
        "n_rows",
        F.round(F.col("n_rows") / F.col("__total"), 9).alias("share"),
        "n_keys",
        F.round(
            F.col("__max") / (F.col("__total") / F.col("n_keys")), 6
        ).alias("skew_ratio"),
    )


def join_explosion_report(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str | None = None,
    top_k: int = 10,
) -> DataFrame:
    """Pre-flight EXACT output-cardinality forecast for an equi-join:
    |A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k), computed from the two per-key
    count tables — the second pre-flight check (after key_skew_report)
    before committing a 100 TB join, because the classic blow-up (two
    many-to-many keys nobody noticed) only shows in the PRODUCT, not
    in either side's skew alone.

    Returns the top-k exploding keys (key, n_left, n_right, out_rows,
    out_share) with the total forecast repeated on every row — read
    row 1's `total_out_rows` against your budget before running the
    real join.

    Plan: one hash aggregation per side (map-side combined), an
    equi-join of the two COUNT tables (distinct-key sized, not
    row sized), a 1-row total broadcast onto TakeOrderedAndProject —
    the forecast costs two scans + a key-count join, never the join
    itself."""
    rk = right_key or left_key
    ca = left.groupBy(F.col(left_key).alias("key")).agg(
        F.count(F.lit(1)).alias("n_left")
    )
    cb = right.groupBy(F.col(rk).alias("key")).agg(
        F.count(F.lit(1)).alias("n_right")
    )
    prod = ca.join(cb, "key").select(
        "key",
        "n_left",
        "n_right",
        (F.col("n_left") * F.col("n_right")).alias("out_rows"),
    )
    total = prod.agg(F.sum("out_rows").alias("total_out_rows"))
    top = prod.orderBy(F.desc("out_rows"), F.asc("key")).limit(top_k)
    return top.crossJoin(F.broadcast(total)).select(
        "key",
        "n_left",
        "n_right",
        "out_rows",
        F.round(F.col("out_rows") / F.col("total_out_rows"), 6).alias("out_share"),
        "total_out_rows",
    )
