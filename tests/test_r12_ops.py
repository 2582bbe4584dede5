"""Round-12 operator goldens: k-sample tests (Kruskal-Wallis, one-way
ANOVA, Brown-Forsythe), dose-response trend (Cochran-Armitage), binary
agreement/score (Matthews, Krippendorff alpha), robust series trend
(Theil-Sen), sequential drift (Page-Hinkley) and corpus mixture
weights (temperature sampling) — every value hand-computed or
cross-checked against the published formula on a case small enough to
verify by hand."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------- k-sample


def test_kruskal_wallis_textbook_no_ties(spark):
    """A=[1,2,3], B=[4,5,6]: ranks 1..6, R_A=6, R_B=15 →
    H = 12/(6·7)·(36/3 + 225/3) − 3·7 = 87·(12/42) − 21 = 3.857143.
    No ties → h_adj == h."""
    from table_computing_spark.operators.drift import kruskal_wallis

    rows = [("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 4.0), ("B", 5.0), ("B", 6.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = kruskal_wallis(df, "g", F.col("v")).collect()[0]
    expect = round(12.0 / 42.0 * (36.0 / 3 + 225.0 / 3) - 21.0, 6)
    assert r["h"] == expect == 3.857143
    assert r["h_adj"] == r["h"]
    assert (r["dof"], r["n"]) == (1, 6)


def test_kruskal_wallis_identical_groups_and_ties(spark):
    """Two identical groups → H = 0 (after tie correction too); a
    single group → h NULL, dof 0."""
    from table_computing_spark.operators.drift import kruskal_wallis

    rows = [("A", v) for v in (1.0, 2.0, 2.0)] + [("B", v) for v in (1.0, 2.0, 2.0)]
    r = kruskal_wallis(
        spark.createDataFrame(rows, "g string, v double"), "g", F.col("v")
    ).collect()[0]
    assert r["h"] == 0.0 and r["h_adj"] == 0.0
    one = kruskal_wallis(
        spark.createDataFrame([("A", 1.0), ("A", 2.0)], "g string, v double"),
        "g",
        F.col("v"),
    ).collect()[0]
    assert one["h"] is None and one["dof"] == 0


def test_anova_f_textbook(spark):
    """A=[1,2,3], B=[4,5,6]: SSB = 13.5, SSW = 4, F = 13.5/(4/4) = 13.5."""
    from table_computing_spark.operators.drift import anova_f

    rows = [("A", 1), ("A", 2), ("A", 3), ("B", 4), ("B", 5), ("B", 6)]
    r = anova_f(
        spark.createDataFrame(rows, "g string, v int"), "g", F.col("v")
    ).collect()[0]
    assert r["f"] == 13.5
    assert (r["dof_between"], r["dof_within"], r["n"]) == (1, 4, 6)


def test_anova_f_degenerate_within_variance(spark):
    """Constant values within every group → SSW = 0 → F NULL."""
    from table_computing_spark.operators.drift import anova_f

    rows = [("A", 1), ("A", 1), ("B", 5), ("B", 5)]
    r = anova_f(
        spark.createDataFrame(rows, "g string, v int"), "g", F.col("v")
    ).collect()[0]
    assert r["f"] is None


def test_levene_bf_hand_computed(spark):
    """A=[1,1,1] (med 1, z2=[0,0,0]), B=[1,5,9] (med 5, z2=[8,0,8]):
    ANOVA on z2 → SSB = SSW = 128/3 → F = (SSB/1)/(SSW/4) = 4.0."""
    from table_computing_spark.operators.drift import levene_bf

    rows = [("A", 1), ("A", 1), ("A", 1), ("B", 1), ("B", 5), ("B", 9)]
    r = levene_bf(
        spark.createDataFrame(rows, "g string, v int"), "g", F.col("v")
    ).collect()[0]
    assert r["f"] == 4.0
    assert (r["dof_between"], r["dof_within"], r["n"]) == (1, 4, 6)


def test_levene_bf_even_group_median(spark):
    """Even group size uses the DOUBLED median (lo+hi) so deviations
    stay integer: A=[1,3] → med2=4, z2=|2x−4|=[2,2]; B=[10,14] →
    med2=24, z2=[4,4]. SSW=0 → F NULL (exactly equal spreads within)."""
    from table_computing_spark.operators.drift import levene_bf

    rows = [("A", 1), ("A", 3), ("B", 10), ("B", 14)]
    r = levene_bf(
        spark.createDataFrame(rows, "g string, v int"), "g", F.col("v")
    ).collect()[0]
    # z2 constant within groups → SSW 0 → NULL by the anova_f contract
    assert r["f"] is None and r["n"] == 4


def test_cochran_armitage_rising_rate(spark):
    """Doses 0/1/2 with rates 0/4, 2/4, 4/4: z matches the closed form
    and is positive (rate rises with dose); reversed doses flip the
    sign exactly."""
    from table_computing_spark.operators.drift import cochran_armitage

    rows = (
        [(0, 0)] * 4 + [(1, 1)] * 2 + [(1, 0)] * 2 + [(2, 1)] * 4
    )
    df = spark.createDataFrame(rows, "c int, y int")
    r = cochran_armitage(df, F.col("c"), F.col("y") == 1).collect()[0]
    # closed form: N=12, R=6, Σcn=12, Σcr=10, Σc²n=20
    nn, rr, cn, cr, ccn = 12, 6, 12, 10, 20
    nt = cr * nn - cn * rr
    varnum = rr * (nn - rr) * (nn * ccn - cn * cn)
    assert r["z"] == round(nt / math.sqrt(varnum), 6) and r["z"] > 0
    flipped = cochran_armitage(
        df.select((F.lit(2) - F.col("c")).alias("c"), "y"),
        F.col("c"),
        F.col("y") == 1,
    ).collect()[0]
    assert flipped["z"] == -r["z"]
    assert (r["n"], r["n_pos"], r["levels"]) == (12, 6, 3)


# --------------------------------------------------------------- agreement


def test_matthews_perfect_zero_and_degenerate(spark):
    from table_computing_spark.operators.evaluation import matthews_corr

    perfect = spark.createDataFrame(
        [(True, True), (False, False), (True, True)], "y boolean, p boolean"
    )
    # tp=2, tn=1, fp=0, fn=0: all four marginals > 0 → mcc = 2/sqrt(4) = 1
    assert matthews_corr(perfect, F.col("y"), F.col("p")).collect()[0]["mcc"] == 1.0
    balanced = spark.createDataFrame(
        [(True, True), (True, True), (False, False), (False, True)],
        "y boolean, p boolean",
    )
    r = matthews_corr(balanced, F.col("y"), F.col("p")).collect()[0]
    # tp=2, tn=1, fp=1, fn=0 → (2−0)/sqrt(3·2·2·1) = 2/sqrt(12)
    assert r["mcc"] == round(2 / math.sqrt(12), 6)
    # all predictions one class → a zero marginal → NULL
    degen = spark.createDataFrame(
        [(True, True), (False, True)], "y boolean, p boolean"
    )
    assert matthews_corr(degen, F.col("y"), F.col("p")).collect()[0]["mcc"] is None


def test_matthews_perfect_classifier_is_one(spark):
    from table_computing_spark.operators.evaluation import matthews_corr

    df = spark.createDataFrame(
        [(True, True), (True, True), (False, False), (False, False)],
        "y boolean, p boolean",
    )
    r = matthews_corr(df, F.col("y"), F.col("p")).collect()[0]
    assert r["mcc"] == 1.0 and (r["tp"], r["tn"], r["fp"], r["fn"]) == (2, 2, 0, 0)


def test_krippendorff_alpha_hand_computed(spark):
    """Units (2 raters each): u1=(a,a), u2=(a,b), u3=(b,b):
    O = 0 + (4−2)/1 + 0 = 2; n_a = n_b = 3, n = 6;
    α = 1 − 5·2/(36 − 18) = 1 − 10/18 = 0.444444."""
    from table_computing_spark.operators.evaluation import krippendorff_alpha

    rows = [
        (1, "r1", "a"), (1, "r2", "a"),
        (2, "r1", "a"), (2, "r2", "b"),
        (3, "r1", "b"), (3, "r2", "b"),
    ]
    df = spark.createDataFrame(rows, "u int, r string, c string")
    r = krippendorff_alpha(df, "u", "r", F.col("c")).collect()[0]
    assert r["alpha"] == round(1 - 10 / 18, 6)
    assert (r["n_units"], r["n_ratings"], r["n_categories"]) == (3, 6, 2)


def test_krippendorff_alpha_perfect_and_single_rating_units(spark):
    """Perfect agreement → α = 1; single-rating units are excluded
    from n; all-one-category → D_e = 0 → NULL."""
    from table_computing_spark.operators.evaluation import krippendorff_alpha

    rows = [
        (1, "r1", "x"), (1, "r2", "x"),
        (2, "r1", "y"), (2, "r2", "y"),
        (9, "r1", "z"),  # unpairable — must not count
    ]
    df = spark.createDataFrame(rows, "u int, r string, c string")
    r = krippendorff_alpha(df, "u", "r", F.col("c")).collect()[0]
    assert r["alpha"] == 1.0 and r["n_ratings"] == 4 and r["n_units"] == 2
    const = spark.createDataFrame(
        [(1, "r1", "x"), (1, "r2", "x")], "u int, r string, c string"
    )
    assert krippendorff_alpha(const, "u", "r", F.col("c")).collect()[0][
        "alpha"
    ] is None


# --------------------------------------------------------------- series


def test_theil_sen_exact_line_and_median_of_slopes(spark):
    """v = 2t exactly → slope 2 regardless of pair; (0,0),(1,1),(2,4)
    → slopes {1,2,3}, median 2; an outlier barely moves it where OLS
    would swing."""
    from table_computing_spark.operators.temporal import theil_sen_grouped

    rows = [("line", t, 2 * t) for t in range(5)]
    rows += [("mid", 0, 0), ("mid", 1, 1), ("mid", 2, 4)]
    df = spark.createDataFrame(rows, "k string, t int, v int")
    out = {
        r["k"]: r
        for r in theil_sen_grouped(df, ["k"], F.col("t"), F.col("v")).collect()
    }
    assert out["line"]["slope"] == 2.0 and out["line"]["n_pairs"] == 10
    assert out["mid"]["slope"] == 2.0 and out["mid"]["n_pairs"] == 3


def test_theil_sen_even_pairs_and_equal_timestamps(spark):
    """4 points → 6 pairs (even): median = mean of the two middle
    slopes; pairs with equal t are excluded."""
    from table_computing_spark.operators.temporal import theil_sen_grouped

    rows = [("k", 0, 0), ("k", 1, 1), ("k", 2, 4), ("k", 3, 5)]
    df = spark.createDataFrame(rows, "k string, t int, v int")
    r = theil_sen_grouped(df, ["k"], F.col("t"), F.col("v")).collect()[0]
    # slopes: 1, 2, 5/3, 3, 2, 1 → sorted [1, 1, 5/3, 2, 2, 3] →
    # median = (5/3 + 2)/2 = 11/6
    assert r["n_pairs"] == 6 and r["slope"] == round((5 / 3 + 2) / 2, 6)
    dup = spark.createDataFrame(
        [("k", 0, 0), ("k", 0, 9), ("k", 1, 2)], "k string, t int, v int"
    )
    rd = theil_sen_grouped(dup, ["k"], F.col("t"), F.col("v")).collect()[0]
    assert rd["n_pairs"] == 2  # (0,0)-(1,2) and (0,9)-(1,2); the t-tie pair dropped


def test_page_hinkley_jump_detection(spark):
    """x = [0,0,0,10]: running means 0,0,0,2.5 → terms 0,0,0,7.5 →
    m = [0,0,0,7.5], running min 0 → ph = [0,0,0,7.5]; alarm only on
    the jump row with λ = 5."""
    from table_computing_spark.operators.temporal import page_hinkley

    rows = [("k", 0, 0), ("k", 1, 0), ("k", 2, 0), ("k", 3, 10)]
    df = spark.createDataFrame(rows, "k string, t int, v int")
    out = {
        r["t"]: r
        for r in page_hinkley(
            df, ["k"], "t", F.col("v"), delta=0.0, lam=5.0
        ).collect()
    }
    assert [out[t]["ph"] for t in range(4)] == [0.0, 0.0, 0.0, 7.5]
    assert [out[t]["alarm"] for t in range(4)] == [False, False, False, True]


def test_page_hinkley_downward_shift_never_alarms_upward_test(spark):
    """A downward step keeps m decreasing → ph stays 0 (the running
    min tracks m) — the test is one-sided upward by construction."""
    from table_computing_spark.operators.temporal import page_hinkley

    rows = [("k", t, 10) for t in range(3)] + [("k", t, 0) for t in range(3, 6)]
    df = spark.createDataFrame(rows, "k string, t int, v int")
    out = page_hinkley(df, ["k"], "t", F.col("v"), lam=1.0).collect()
    assert all(not r["alarm"] for r in out)


# --------------------------------------------------------------- mixtures


def test_temperature_weights_exact_sqrt_case(spark):
    """n = [90, 10], α = 0.5: q = sqrt(.9)/(sqrt(.9)+sqrt(.1)) = 3/4
    EXACTLY (√(9/10) : √(1/10) = 3 : 1) — boost 0.75/0.9 and 0.25/0.1."""
    from table_computing_spark.operators.sampling import temperature_weights

    rows = [("big",)] * 90 + [("small",)] * 10
    df = spark.createDataFrame(rows, "lang string")
    out = {
        r["group"]: r
        for r in temperature_weights(df, "lang", alpha=0.5).collect()
    }
    assert out["big"]["p_sampled"] == 0.75 and out["small"]["p_sampled"] == 0.25
    assert out["big"]["boost"] == round(0.75 / 0.9, 6)
    assert out["small"]["boost"] == round(0.25 / 0.1, 6)


def test_temperature_weights_alpha_one_is_proportional(spark):
    from table_computing_spark.operators.sampling import temperature_weights

    rows = [("a",)] * 6 + [("b",)] * 4
    df = spark.createDataFrame(rows, "lang string")
    out = {
        r["group"]: r for r in temperature_weights(df, "lang", alpha=1.0).collect()
    }
    assert out["a"]["p_sampled"] == out["a"]["p_raw"] == 0.6
    assert out["a"]["boost"] == 1.0 and out["b"]["boost"] == 1.0
