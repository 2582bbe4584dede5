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


def check_unique(df: DataFrame, cols: "Sequence[str]", op: str) -> None:
    """Opt-in precondition (r13 verdict task 6): raise if any key tuple
    in `cols` appears more than once. Several operators (rbo_overlap's
    (query, item) lists, cka_linear's id-matched vectors) silently
    reweight their statistics when a caller violates the
    one-row-per-key contract; this prices the check at ONE extra hash
    aggregate with an early-out limit(1) — the documented contracts
    become enforceable without changing any default plan."""
    dup = (
        df.groupBy(*[F.col(c) for c in cols])
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        key = {c: dup[0][c] for c in cols}
        raise ValueError(
            f"{op}: duplicate key {key} appears {dup[0]['count']}x — input "
            f"must be one row per {tuple(cols)} (validate=True contract)"
        )


def check_rectangular(
    df: DataFrame,
    vec_col: str,
    op: str,
    allow_null_components: bool = False,
    check_nan: bool = False,
) -> None:
    """Opt-in precondition (r13 verdict task 6): raise if the array
    column is ragged (mixed lengths), contains NULL arrays, or — unless
    allowed — NULL components (which pass an isNotNull ARRAY filter and
    die later inside numpy with an opaque executor error, or silently
    skew moment sums). ONE aggregate over the input."""
    row = df.agg(
        F.min(F.size(F.col(vec_col))).alias("__lo"),
        F.max(F.size(F.col(vec_col))).alias("__hi"),
        F.sum(F.when(F.col(vec_col).isNull(), 1).otherwise(0)).alias("__nulls"),
        F.sum(
            F.when(
                F.exists(F.col(vec_col), lambda x: x.isNull()), 1
            ).otherwise(0)
        ).alias("__nullcomp"),
        F.sum(
            F.when(
                F.exists(
                    F.col(vec_col),
                    lambda x: x.isNotNull() & F.isnan(x.cast("double")),
                )
                if check_nan
                else F.lit(False),
                1,
            ).otherwise(0)
        ).alias("__nancomp"),
    ).first()
    if row is None or row["__lo"] is None:
        return  # empty input: nothing to violate
    if int(row["__nulls"] or 0):
        raise ValueError(
            f"{op}: {int(row['__nulls'])} NULL vectors in `{vec_col}` "
            "(validate=True contract)"
        )
    if row["__lo"] != row["__hi"]:
        raise ValueError(
            f"{op}: ragged vectors in `{vec_col}` — lengths span "
            f"[{row['__lo']}, {row['__hi']}] (validate=True contract)"
        )
    if not allow_null_components and int(row["__nullcomp"] or 0):
        raise ValueError(
            f"{op}: {int(row['__nullcomp'])} vectors with NULL components in "
            f"`{vec_col}` (validate=True contract)"
        )
    if check_nan and int(row["__nancomp"] or 0):
        raise ValueError(
            f"{op}: {int(row['__nancomp'])} vectors with NaN components in "
            f"`{vec_col}` (validate=True contract)"
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
