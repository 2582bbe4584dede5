"""Order-independent table fingerprints — verify that two copies of a
dataset are identical (migration checks, replica audits, the "did the
backfill produce the same table" question) without sorting or moving
either copy.

    row_hash   = first 15 hex chars of md5(canonical row string) as a
                 60-bit integer (md5 + hex→int are portable across
                 engines — the repo-wide oracle discipline)
    fingerprint = (Σ row_hash) mod (2^61 − 1)  — the sum is exact
                 DECIMAL internally and commutative, so partition
                 order and parallelism never matter; the Mersenne-
                 prime reduction keeps the result a portable BIGINT

Two tables match iff (n_rows, fingerprint) match; any single-row
difference moves the sum. This is one scan + one aggregate — at 100 TB
it is the cheapest possible whole-table comparison (no sort, no
shuffle beyond the final 1-row combine; map-side partial sums do the
work). Collision odds: forging an equal sum requires a second preimage
class on 60-bit truncated md5 — negligible for data-integrity use
(this is a drift detector, not a cryptographic commitment).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MOD = (1 << 61) - 1  # Mersenne prime: exact % in any engine


def row_hash(cols: Sequence[str]):
    """60-bit portable row hash over canonicalized columns: NULL and
    the string 'NULL' must differ, so each column renders as
    `coalesce(cast AS string, char(0))` joined by '|'."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols
    ]
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", *parts)), 1, 15), 16, 10
    ).cast("long")


def table_fingerprint(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One row: (n_rows, fingerprint). Engine-exact — see module doc."""
    cols = list(cols)
    return df.select(row_hash(cols).alias("__h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.pmod(
            F.sum(F.col("__h").cast("decimal(28,0)")), F.lit(_MOD).cast("decimal(28,0)")
        ).cast("long").alias("fingerprint"),
    )


def fingerprint_by_group(
    df: DataFrame, keys: Sequence[str], cols: Sequence[str]
) -> DataFrame:
    """Per-group fingerprints — localize WHERE two tables diverge
    (e.g. by day or shard) with one aggregate instead of a full diff:
    (keys..., n_rows, fingerprint)."""
    keys, cols = list(keys), list(cols)
    return (
        df.select(*keys, row_hash(cols).alias("__h"))
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.pmod(
                F.sum(F.col("__h").cast("decimal(28,0)")),
                F.lit(_MOD).cast("decimal(28,0)"),
            ).cast("long").alias("fingerprint"),
        )
    )
