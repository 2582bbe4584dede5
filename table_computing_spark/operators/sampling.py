"""Reproducible sampling for training-data pipelines.

A 100 TB corpus pipeline needs splits that are (a) deterministic across
runs and engines (no seed-dependent RNG state), (b) stable under
repartitioning, and (c) consistent for the same key everywhere (the
same document must land in the same split in every job). Hash-based
sampling gives all three: a row is kept iff a cryptographic hash of its
KEY falls under a threshold.

md5 is used (not xxhash64) because every engine agrees on it — the
DuckDB correctness oracle computes the identical sample. The first 8
hex chars are compared lexicographically against a threshold derived
from the fraction: uniform, portable, and pure codegen expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 8  # 32 bits of the hash — fraction resolution 2^-32


def _hash_prefix(key: Column) -> Column:
    return F.substring(F.md5(key.cast("string")), 1, _HEX_DIGITS)


def sample_threshold(fraction: float) -> str:
    """Hex threshold string: keep iff md5-prefix < threshold.

    fraction >= 1.0 returns 'g', which sorts above every hex digit —
    a full-hex integer threshold would be 9 chars and compare
    lexicographically BELOW 'f…' prefixes."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    n = int(fraction * (16**_HEX_DIGITS))
    if n >= 16**_HEX_DIGITS:
        return "g"
    return format(n, f"0{_HEX_DIGITS}x")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float
) -> DataFrame:
    """Keep ~`fraction` of rows, decided ONLY by the key: the same key
    is kept or dropped identically in every run, engine, and partition
    layout. The filter is a scan-level expression (no shuffle)."""
    return df.filter(_hash_prefix(F.col(key_col)) < F.lit(sample_threshold(fraction)))


def train_test_split(
    df: DataFrame, key_col: str, test_fraction: float = 0.1, split_col: str = "split"
) -> DataFrame:
    """Tag every row 'train' or 'test' by key hash — a reproducible
    held-out split that survives reprocessing and incremental appends
    (new rows with the same key join the same side)."""
    thr = F.lit(sample_threshold(test_fraction))
    return df.withColumn(
        split_col,
        F.when(_hash_prefix(F.col(key_col)) < thr, "test").otherwise("train"),
    )


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, key_col: str
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps its own
    fraction, still keyed (same key → same decision). Strata absent
    from `fractions` are dropped — the training-mix downsampler."""
    expr = None
    for stratum, frac in fractions.items():
        cond = (F.col(strata_col) == F.lit(stratum)) & (
            _hash_prefix(F.col(key_col)) < F.lit(sample_threshold(frac))
        )
        expr = cond if expr is None else (expr | cond)
    return df.filter(expr if expr is not None else F.lit(False))
