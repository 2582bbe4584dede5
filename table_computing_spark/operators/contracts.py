"""Data-contract enforcement — validate, tag, quarantine.

Ingest at 100 TB cannot hand-inspect bad rows; it needs every row
tagged with WHICH named expectations it violates, so the pipeline can
route clean rows onward, quarantine violators with their reasons
attached, and aggregate violation signatures for monitoring — all in
one scan-level projection (the rules are plain boolean expressions;
Catalyst folds them into the scan stage, no shuffle, no UDF).

This is the enforcement half of the Deequ-style constraint suite in
`q_integrity_checks` (which measures); `validate` acts per row.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate(
    df: DataFrame,
    rules: "Sequence[Tuple[str, Column]]",
    violations_col: str = "violations",
    valid_col: str = "is_valid",
) -> DataFrame:
    """Tag every row with its violated rule names (fixed rule order —
    deterministic and engine-portable) and a boolean verdict. A NULL
    rule result counts as a violation (contracts are three-valued-
    logic-hostile by design: unknown is not acceptable)."""
    flags = [
        F.when(F.coalesce(cond, F.lit(False)), F.lit(None).cast("string"))
        .otherwise(F.lit(name))
        for name, cond in rules
    ]
    viol = F.filter(F.array(*flags), lambda x: x.isNotNull())
    return df.withColumn(violations_col, viol).withColumn(
        valid_col, F.size(F.col(violations_col)) == 0
    )


def quarantine_split(
    df: DataFrame,
    rules: "Sequence[Tuple[str, Column]]",
) -> "Tuple[DataFrame, DataFrame]":
    """(clean, quarantined) pair: clean rows drop the audit columns,
    quarantined rows keep their violation reasons attached."""
    tagged = validate(df, rules)
    clean = tagged.filter(F.col("is_valid")).drop("violations", "is_valid")
    bad = tagged.filter(~F.col("is_valid")).drop("is_valid")
    return clean, bad
