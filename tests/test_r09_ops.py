"""Round-9 tests: the five r08 ADVICE fixes, plus r09 operator work.

Each test pins one low-severity defect the r08 advisor found, so the
fix can't regress.
"""
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ADVICE 1 — drop_boilerplate_lines must exempt blank lines
# ---------------------------------------------------------------------------

def test_boilerplate_exempts_blank_lines(spark):
    """A blank line appears in every document (>= min_df), but must NOT
    be stripped — paragraph structure survives; real boilerplate goes."""
    from table_computing_spark.operators.text import drop_boilerplate_lines

    docs = spark.createDataFrame(
        [
            (1, "para one\n\ncookie banner\n\npara two"),
            (2, "alpha\n\ncookie banner\n\nbeta"),
            (3, "gamma\n\ncookie banner\n\ndelta"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in drop_boilerplate_lines(docs, min_df=3).collect()}
    # the shared non-blank line is dropped from every doc
    assert "cookie banner" not in out[1]["clean_text"]
    # blank lines survive (paragraph break intact: two \n\n runs remain)
    assert out[1]["clean_text"] == "para one\n\n\npara two"
    assert out[1]["n_dropped"] == 1 and out[1]["n_kept"] == 4


# ---------------------------------------------------------------------------
# ADVICE 2 — profile_diff envelope_moved must be null-safe
# ---------------------------------------------------------------------------

def test_profile_diff_envelope_null_safe(spark):
    """All-NULL column on one side -> envelope_moved must be TRUE, not
    NULL (a `WHERE envelope_moved` gate must catch the transition)."""
    from table_computing_spark.operators.profile import column_profile, profile_diff

    old = spark.createDataFrame(
        [(1, None), (2, None)], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    )
    d = {r["col_name"]: r for r in profile_diff(old, new, ["k", "v"]).collect()}
    assert d["v"]["envelope_moved"] is True  # was NULL before the fix
    assert d["k"]["envelope_moved"] is False
    # and the flag is filterable the way a quality gate would use it
    n = profile_diff(old, new, ["v"]).filter(F.col("envelope_moved")).count()
    assert n == 1


# ---------------------------------------------------------------------------
# ADVICE 3 — winsorize with keys=[] clips globally via broadcast cross-join
# ---------------------------------------------------------------------------

def test_winsorize_global_no_keys(spark):
    from table_computing_spark.operators.quantiles import winsorize

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "id long, v double"
    )
    out = winsorize(df, keys=[], col="v", lo=0.05, hi=0.95)
    assert out.count() == 100  # no row loss, no cartesian blow-up
    vals = [r["v"] for r in out.collect()]
    # exact percentile (quantile_cont) band of 1..100 at 0.05/0.95
    assert min(vals) == pytest.approx(5.95)
    assert max(vals) == pytest.approx(95.05)
    # schema unchanged
    assert out.columns == df.columns


def test_winsorize_global_null_passthrough(spark):
    from table_computing_spark.operators.quantiles import winsorize

    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 100.0), (4, 50.0)], "id long, v double"
    )
    out = {r["id"]: r["v"] for r in winsorize(df, [], "v", 0.25, 0.75).collect()}
    assert out[2] is None


# ---------------------------------------------------------------------------
# ADVICE 4 — welch_ttest must fail loudly on a missing control group
# ---------------------------------------------------------------------------

def test_welch_ttest_missing_control_raises(spark):
    from table_computing_spark.operators.drift import welch_ttest

    df = spark.createDataFrame(
        [("a", 10), ("a", 12), ("b", 20), ("b", 22)], "grp string, v long"
    )
    with pytest.raises(ValueError, match="control group 'zz'"):
        welch_ttest(df, F.col("v"), "grp", control="zz")
    # the happy path still works and excludes the control row
    out = welch_ttest(df, F.col("v"), "grp", control="a").collect()
    assert [r["grp"] for r in out] == ["b"]


# ---------------------------------------------------------------------------
# ADVICE 5 — distinct_state id-domain contract: measured, pinned, guardable
# ---------------------------------------------------------------------------

def test_distinct_state_exact_over_adversarial_ids(spark):
    """The documented contract: Spark 4 bitmap bucket/position is
    injective over ALL longs — zero, negatives, the ±32768 bucket
    boundaries, huge magnitudes — so the state is exact COUNT(DISTINCT)
    without any positivity restriction. ~20k adversarial ids."""
    from table_computing_spark.operators import bitmaps

    ids = (
        list(range(-70000, 70000, 7))
        + list(range(-32800, -32700))
        + list(range(-50, 50))
        + list(range(32700, 32800))
        + [2**40, -(2**40), 2**40 + 5]
    )
    df = spark.createDataFrame([("k", i) for i in ids], "g string, id long")
    n = bitmaps.distinct_count(
        bitmaps.distinct_state(df, ["g"], "id"), ["g"]
    ).collect()[0]["n_distinct"]
    exact = df.select("id").distinct().count()
    assert n == exact


def test_distinct_state_optional_positivity_guard(spark):
    """validate_ids=True enforces the strictly-positive contract for
    portability to 1-based-only engines: non-positive raises, NULL is
    ignored (COUNT(DISTINCT) semantics)."""
    from table_computing_spark.operators import bitmaps

    bad = spark.createDataFrame([("k", 0), ("k", 5)], "g string, id long")
    with pytest.raises(Exception, match="must be positive"):
        bitmaps.distinct_state(bad, ["g"], "id", validate_ids=True).collect()
    neg = spark.createDataFrame([("k", -3)], "g string, id long")
    with pytest.raises(Exception, match="must be positive"):
        bitmaps.distinct_state(neg, ["g"], "id", validate_ids=True).collect()
    ok = spark.createDataFrame(
        [("k", 1), ("k", None), ("k", 2), ("k", 1)], "g string, id long"
    )
    n = bitmaps.distinct_count(
        bitmaps.distinct_state(ok, ["g"], "id", validate_ids=True), ["g"]
    ).collect()[0]["n_distinct"]
    assert n == 2
