"""Local replica of the driver's DuckDB-oracle comparison.

For each queries() entry: run the Spark DataFrame and the oracle SQL on
the same parquet tables, sort columns by name, sort rows, and compare
values exactly. Catching a mismatch here is 100x cheaper than waiting
for CORRECTNESS_r{N}.json.

The driver's value hash is dtype-sensitive (round 4: DuckDB HUGEINT from
an uncast integer sum() hash-mismatched Spark's BIGINT even though every
value compared equal). compare() therefore maps the Spark schema and the
DuckDB relation's result types onto one canonical type lattice and fails
on any divergence BEFORE comparing values — pass the DuckDB *relation*
(con.sql(sql)), not a pre-materialized pandas frame, to get this check.
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


# The lattice models what the driver's hash actually sees AFTER pandas
# materialization (calibrated against 4 rounds of CORRECTNESS_r*.json):
#   - integer widths hash equal (int32 rank vs BIGINT oracle was green)
#   - DuckDB HUGEINT and DECIMAL materialize as float64 → they mismatch
#     a Spark integer column (the round-4 red trio) but MATCH a Spark
#     double column (q_histogram was green vs DECIMAL(15,1))
#   - Spark DecimalType materializes as object(Decimal) → never equal
#     to float64; flag it so outputs get cast to double explicitly
_SPARK_CANON = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float32", "double": "float64",
    "string": "str", "boolean": "bool", "date": "date", "binary": "binary",
}

_DUCK_CANON = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "HUGEINT": "float64",  # pandas materialization (sum(int) gotcha)
    "FLOAT": "float32", "DOUBLE": "float64",
    "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date", "BLOB": "binary",
}


def _canon_spark_type(dt) -> str:
    s = dt.simpleString()
    if s.startswith("decimal"):
        return "spark-decimal(object)"
    if s.startswith("timestamp"):
        return "timestamp"
    if s.startswith("array"):
        return "list"
    return _SPARK_CANON.get(s, s)


def _canon_duck_type(t) -> str:
    s = str(t).upper()
    if s.startswith("DECIMAL"):
        return "float64"  # pandas materialization
    if s.startswith("TIMESTAMP"):
        return "timestamp"
    if s.endswith("[]") or s.startswith("LIST"):
        return "list"
    return _DUCK_CANON.get(s, s)


def _type_issues(spark_df, oracle_rel) -> list[str]:
    spark_types = {f.name: _canon_spark_type(f.dataType) for f in spark_df.schema.fields}
    duck_types = dict(zip(oracle_rel.columns, (_canon_duck_type(t) for t in oracle_rel.types)))
    issues = []
    for c in sorted(set(spark_types) & set(duck_types)):
        if spark_types[c] != duck_types[c]:
            issues.append(
                f"dtype mismatch col {c!r}: spark={spark_types[c]} oracle={duck_types[c]}"
                " (driver hash is dtype-exact — CAST one side)"
            )
    return issues


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(spark_df, oracle) -> list[str]:
    """Return a list of mismatch descriptions (empty = match).

    `oracle` should be the DuckDB relation (`con.sql(sql)`) so result
    dtypes can be checked against the Spark schema; a plain pandas
    DataFrame is still accepted (values-only, dtype check skipped).
    """
    issues: list[str] = []
    if isinstance(oracle, pd.DataFrame):
        oracle_pdf = oracle
    else:
        issues.extend(_type_issues(spark_df, oracle))
        oracle_pdf = oracle.df()
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(oracle_pdf.columns):
        return issues + [
            f"column mismatch: spark={sorted(sp.columns)} oracle={sorted(oracle_pdf.columns)}"
        ]
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
