"""Local replica of the driver's DuckDB-oracle comparison.

For each queries() entry: run the Spark DataFrame and the oracle SQL on
the same parquet tables, sort columns by name, sort rows, and compare
values exactly. Catching a mismatch here is 100x cheaper than waiting
for CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_con(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    issues: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(oracle_pdf.columns):
        return [f"column mismatch: spark={sorted(sp.columns)} oracle={sorted(oracle_pdf.columns)}"]
    if len(sp) != len(oracle_pdf):
        issues.append(f"row count: spark={len(sp)} oracle={len(oracle_pdf)}")
    a, b = _canon(sp), _canon(oracle_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                bad = [
                    i
                    for i, (x, y) in enumerate(zip(av, bv))
                    if not (
                        (pd.isna(x) and pd.isna(y))
                        or (x == y)
                        or (
                            isinstance(x, float)
                            and isinstance(y, float)
                            and math.isclose(x, y, rel_tol=0, abs_tol=0)
                        )
                    )
                ]
            else:
                bad = [
                    i
                    for i, (x, y) in enumerate(zip(av, bv))
                    if not ((pd.isna(x) and pd.isna(y)) or x == y)
                ]
            if bad:
                i = bad[0]
                issues.append(
                    f"col {c!r}: {len(bad)} diffs, first at row {i}: "
                    f"spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}"
                )
    return issues
