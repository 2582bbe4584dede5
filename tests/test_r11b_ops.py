"""Round-11b operator goldens: evaluation metrics (AP, kappa, BLEU,
pass@k, Bradley-Terry, Kendall tau-b), rank/multiple-testing stats
(Spearman, Mann-Whitney, BH-FDR), series risk (max drawdown), survival
hazard (Nelson-Aalen) and graph closure density (clustering
coefficient) — every value hand-computed or cross-checked against the
published formula on a case small enough to verify by hand."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------- evaluation


def test_average_precision_golden(spark):
    """Scores desc: [0.9 +, 0.8 -, 0.7 +, 0.6 +, 0.5 -]:
    AP = (1/3)(1/1 + 2/3 + 3/4)."""
    from table_computing_spark.operators.evaluation import average_precision

    df = spark.createDataFrame(
        [(1, 0.9), (0, 0.8), (1, 0.7), (1, 0.6), (0, 0.5)],
        "y int, s double",
    )
    r = average_precision(df, F.col("y"), F.col("s")).collect()[0]
    assert r["average_precision"] == round((1 + 2 / 3 + 3 / 4) / 3, 6)
    assert (r["n_pos"], r["n"]) == (3, 5)


def test_average_precision_tie_group_convention(spark):
    """All rows share one score: one threshold group — AP equals the
    positive prevalence (cumP/cumN at the single cut), not a
    tiebreak-dependent per-row value."""
    from table_computing_spark.operators.evaluation import average_precision

    df = spark.createDataFrame([(1, 5.0), (0, 5.0), (0, 5.0), (1, 5.0)], "y int, s double")
    r = average_precision(df, F.col("y"), F.col("s")).collect()[0]
    assert r["average_precision"] == 0.5


def test_cohens_kappa_2x2_golden(spark):
    """20/5/10/15 confusion: po = .7, marginals (25,25)x(30,20) →
    pe = 1250/2500 = .5 → kappa = .2/.5 = .4."""
    from table_computing_spark.operators.evaluation import cohens_kappa

    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5 + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert (r["kappa"], r["po"], r["pe"], r["n_items"]) == (0.4, 0.7, 0.5, 50)


def test_cohens_kappa_degenerate_is_null(spark):
    """Both raters constant: pe = 1 → kappa undefined → NULL."""
    from table_computing_spark.operators.evaluation import cohens_kappa

    df = spark.createDataFrame([("x", "x")] * 4, "a string, b string")
    r = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert r["kappa"] is None and r["po"] == 1.0 and r["pe"] == 1.0


def test_bleu_identity_disjoint_and_short(spark):
    from table_computing_spark.operators.evaluation import bleu_n

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "the cat sat on the mat"),
            (2, "aa bb cc dd", "xx yy zz ww"),
            (3, "one two", "one two three four five"),
        ],
        "pid int, cand string, ref string",
    )
    out = {r["pair"]: r for r in bleu_n(df, "cand", "ref", "pid").collect()}
    assert out[1]["bleu"] == 1.0  # identical → BP 1, every p_i 1
    assert out[2]["bleu"] == 0.0  # no overlap → unsmoothed 0
    assert out[3]["bleu"] is None  # cand shorter than max_n → undefined
    assert (out[3]["cand_len"], out[3]["ref_len"]) == (2, 5)


def test_bleu_brevity_penalty_value(spark):
    """cand = 3-token prefix of a 6-token ref, max_n=2: p1 = 1,
    p2 = 1, BP = exp(1 - 6/3) → bleu = e^-1."""
    from table_computing_spark.operators.evaluation import bleu_n

    df = spark.createDataFrame(
        [(1, "a b c", "a b c d e f")], "pid int, cand string, ref string"
    )
    r = bleu_n(df, "cand", "ref", "pid", max_n=2).collect()[0]
    assert r["bleu"] == round(math.exp(-1.0), 6)


def test_pass_at_k_golden_and_edges(spark):
    """n=5, c=2, k=2: 1 − C(3,2)/C(5,2) = 0.7; n<k → NULL;
    n−c<k → exactly 1."""
    from table_computing_spark.operators.evaluation import pass_at_k

    rows = (
        [("p1", True)] * 2 + [("p1", False)] * 3
        + [("p2", False)]
        + [("p3", True), ("p3", True), ("p3", False)]
    )
    df = spark.createDataFrame(rows, "prob string, ok boolean")
    out = {r["problem"]: r for r in pass_at_k(df, "prob", F.col("ok"), 2).collect()}
    assert out["p1"]["pass_at_k"] == 0.7
    assert out["p2"]["pass_at_k"] is None
    assert out["p3"]["pass_at_k"] == 1.0


def test_bradley_terry_two_player_ratio(spark):
    """Two players, A beats B 3:1 — the MM fixed point has
    p_A/p_B = W_A/W_B = 3 (and mean-1 normalization puts them at
    1.5 / 0.5)."""
    from table_computing_spark.operators.evaluation import bradley_terry

    rows = [("A", "B")] * 3 + [("B", "A")]
    df = spark.createDataFrame(rows, "w string, l string")
    out = {r["item"]: r for r in bradley_terry(df, "w", "l", iters=8).collect()}
    assert abs(out["A"]["strength"] / out["B"]["strength"] - 3.0) < 0.01
    assert out["A"]["strength"] + out["B"]["strength"] == pytest.approx(2.0, abs=1e-6)
    assert (out["A"]["wins"], out["A"]["n_games"]) == (3, 4)


def test_bradley_terry_transitive_ordering(spark):
    """A>B>C round-robin with consistent wins orders the strengths."""
    from table_computing_spark.operators.evaluation import bradley_terry

    rows = [("A", "B")] * 4 + [("B", "A")] + [("B", "C")] * 4 + [("C", "B")] + [("A", "C")] * 5
    df = spark.createDataFrame(rows, "w string, l string")
    out = {r["item"]: r["strength"] for r in bradley_terry(df, "w", "l", iters=6).collect()}
    assert out["A"] > out["B"] > out["C"]


def test_kendall_tau_perfect_reversed_and_ties(spark):
    from table_computing_spark.operators.evaluation import kendall_tau_grouped

    rows = (
        [("agree", i, float(i), float(i)) for i in range(5)]
        + [("rev", i, float(i), float(-i)) for i in range(5)]
        # tie case: x = [1,1,2], y = [1,2,3] → C=2, D=0, Tx=1, Ty=0
        # tau_b = 2 / sqrt(3*2)
        + [("tie", 0, 1.0, 1.0), ("tie", 1, 1.0, 2.0), ("tie", 2, 2.0, 3.0)]
        + [("single", 0, 1.0, 1.0)]
    )
    df = spark.createDataFrame(rows, "g string, it int, x double, y double")
    out = {
        r["group"]: r
        for r in kendall_tau_grouped(df, "g", "it", F.col("x"), F.col("y")).collect()
    }
    assert out["agree"]["tau_b"] == 1.0
    assert out["rev"]["tau_b"] == -1.0
    assert out["tie"]["tau_b"] == round(2 / math.sqrt(6), 6)
    assert out["single"]["tau_b"] is None and out["single"]["n_items"] == 1


def test_kendall_tau_sort_matches_pairs_bit_identical(spark):
    """The Knight inversion-count path (method='sort', the default)
    must reproduce the all-pairs classification bit-for-bit: identical
    (n_items, C, D, tau_b) on an adversarial mix of heavy x-ties,
    y-ties, both-ties, and NULLs (dropped by both paths)."""
    from table_computing_spark.operators.evaluation import kendall_tau_grouped

    rows = []
    # deterministic pseudo-random groups with tie mass (values mod small bases)
    for g in range(6):
        size = 3 + 7 * g  # up to 38 items — crosses several merge levels
        for i in range(size):
            h = (i * 2654435761 + g * 97) % 2**32
            x = float((h >> 3) % 7)  # heavy x ties
            y = float((h >> 9) % 5)  # heavy y ties
            rows.append((f"g{g}", i, x, y))
    # nulls must be dropped identically by both methods
    rows += [("g0", 990, None, 1.0), ("g1", 991, 2.0, None), ("g2", 992, None, None)]
    df = spark.createDataFrame(rows, "g string, it int, x double, y double")
    args = (df, "g", "it", F.col("x"), F.col("y"))
    srt = {r["group"]: r.asDict() for r in kendall_tau_grouped(*args, method="sort").collect()}
    prs = {r["group"]: r.asDict() for r in kendall_tau_grouped(*args, method="pairs").collect()}
    assert srt == prs
    # null rows were excluded from n_items
    assert srt["g0"]["n_items"] == 3


def test_kendall_tau_drops_null_rows(spark):
    """NULL x or y rows are filtered (the spearman/mann_whitney
    convention) — not silently classified as both-tied."""
    from table_computing_spark.operators.evaluation import kendall_tau_grouped

    df = spark.createDataFrame(
        [("g", 0, 1.0, 1.0), ("g", 1, 2.0, 2.0), ("g", 2, None, 9.0), ("g", 3, 3.0, None)],
        "g string, it int, x double, y double",
    )
    r = kendall_tau_grouped(df, "g", "it", F.col("x"), F.col("y")).collect()[0]
    assert r["n_items"] == 2 and r["concordant"] == 1 and r["tau_b"] == 1.0


def test_count_strict_inversions_vs_bruteforce():
    """The vectorized merge counter == O(n²) brute force on dense-rank
    arrays with ties, across sizes that exercise padding and several
    merge levels (no SparkSession needed)."""
    import numpy as np

    from table_computing_spark.operators.evaluation import _count_strict_inversions

    for n in (0, 1, 2, 3, 5, 8, 13, 33, 64, 100, 257):
        h = (np.arange(n, dtype=np.int64) * 2654435761 + 12345) % 2**31
        vals = (h >> 7) % max(1, n // 3 + 2)  # dense with ties
        uniq, ranks = np.unique(vals, return_inverse=True)
        got = _count_strict_inversions(ranks.astype(np.int64), len(uniq))
        brute = sum(
            int(vals[i] > vals[j]) for i in range(n) for j in range(i + 1, n)
        )
        assert got == brute, f"n={n}: {got} != {brute}"


# ------------------------------------------------------------------- stats


def test_spearman_monotone_and_scipy_tie_case(spark):
    from table_computing_spark.operators.drift import spearman_corr

    df = spark.createDataFrame(
        [(float(i), float(i**3)) for i in range(1, 8)], "x double, y double"
    )
    r = spearman_corr(df, F.col("x"), F.col("y")).collect()[0]
    assert r["spearman_rho"] == 1.0 and r["n"] == 7
    # x=[1,2,2,3], y=[1,2,3,3]: midranks → centered doubled
    # cx=[-3,0,0,3], cy=[-3,-1,2,2] → 15/sqrt(18*18) = 0.8(3)
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (2.0, 3.0), (3.0, 3.0)], "x double, y double"
    )
    r = spearman_corr(df, F.col("x"), F.col("y")).collect()[0]
    assert r["spearman_rho"] == round(15 / 18, 6)


def test_spearman_constant_side_is_null(spark):
    from table_computing_spark.operators.drift import spearman_corr

    df = spark.createDataFrame([(1.0, 2.0), (2.0, 2.0), (3.0, 2.0)], "x double, y double")
    assert spearman_corr(df, F.col("x"), F.col("y")).collect()[0]["spearman_rho"] is None


def test_mann_whitney_separated_groups(spark):
    """A=[1,2,3] vs B=[4,5,6]: U = 0, z = −4.5/sqrt(5.25) (no ties)."""
    from table_computing_spark.operators.drift import mann_whitney

    rows = [(1, 1.0), (1, 2.0), (1, 3.0), (0, 4.0), (0, 5.0), (0, 6.0)]
    df = spark.createDataFrame(rows, "a int, v double")
    r = mann_whitney(df, F.col("a") == 1, F.col("v")).collect()[0]
    assert r["u"] == 0.0 and (r["n_a"], r["n_b"]) == (3, 3)
    assert r["z"] == round(-4.5 / math.sqrt(5.25), 6)


def test_mann_whitney_all_tied_z_is_null(spark):
    from table_computing_spark.operators.drift import mann_whitney

    df = spark.createDataFrame([(1, 7.0), (0, 7.0), (1, 7.0)], "a int, v double")
    r = mann_whitney(df, F.col("a") == 1, F.col("v")).collect()[0]
    assert r["z"] is None
    assert r["u"] == 1.0  # midranks: R_A = 2+2 = 4, U = 4 − 3 = 1


def test_bh_fdr_textbook_case(spark):
    """p = [.01,.02,.03,.04,.2], α=.05: first four rejected; adjusted
    p is the suffix min of m·p/i = [.05,.05,.05,.05,.2]."""
    from table_computing_spark.operators.drift import bh_fdr

    rows = [("t1", 0.01), ("t2", 0.02), ("t3", 0.03), ("t4", 0.04), ("t5", 0.2)]
    df = spark.createDataFrame(rows, "id string, p double")
    out = {r["id"]: r for r in bh_fdr(df, "id", F.col("p"), alpha=0.05).collect()}
    assert [out[f"t{i}"]["rejected"] for i in range(1, 6)] == [True] * 4 + [False]
    assert out["t1"]["p_adj"] == 0.05 and out["t5"]["p_adj"] == 0.2
    assert [out[f"t{i}"]["bh_rank"] for i in range(1, 6)] == [1, 2, 3, 4, 5]


def test_bh_fdr_nonmonotone_praw_gets_suffix_min(spark):
    """p = [.01, .04, .041]: raw adjusted = [.03, .06, .041] — the
    suffix min must pull rank 2's value down to .041 (the classic BH
    step-up monotonization)."""
    from table_computing_spark.operators.drift import bh_fdr

    df = spark.createDataFrame(
        [("a", 0.01), ("b", 0.04), ("c", 0.041)], "id string, p double"
    )
    out = {r["id"]: r for r in bh_fdr(df, "id", F.col("p")).collect()}
    assert out["a"]["p_adj"] == 0.03
    assert out["b"]["p_adj"] == 0.041
    assert out["c"]["p_adj"] == 0.041


# ------------------------------------------------------------------ series


def test_max_drawdown_golden(spark):
    """10,12,8,11,6 → peak 12, trough 6: dd = 6, dd% = .5; a
    monotone-up series has drawdown exactly 0."""
    from table_computing_spark.operators.temporal import max_drawdown

    rows = [("k", i, v) for i, v in enumerate([10.0, 12.0, 8.0, 11.0, 6.0])]
    rows += [("up", i, float(i + 1)) for i in range(4)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    out = {
        r["k"]: r
        for r in max_drawdown(df, ["k"], ["t"], F.col("v")).collect()
    }
    assert out["k"]["max_drawdown"] == 6.0
    assert out["k"]["max_drawdown_pct"] == 0.5
    assert out["k"]["n_points"] == 5
    assert out["up"]["max_drawdown"] == 0.0


# ---------------------------------------------------------------- survival


def test_nelson_aalen_hand_computed(spark):
    """3 subjects: event@1, event@2, censor@3 → H = [1/3, 1/3+1/2,
    same] and the censor row keeps the running value."""
    from table_computing_spark.operators.survival import nelson_aalen

    rows = [("g", 1, True), ("g", 2, True), ("g", 3, False)]
    df = spark.createDataFrame(rows, "g string, t int, ev boolean")
    out = {r["t"]: r for r in nelson_aalen(df, ["g"], "t", F.col("ev")).collect()}
    assert out[1]["cumhazard"] == round(1 / 3, 6)
    assert out[2]["cumhazard"] == pytest.approx(1 / 3 + 1 / 2, abs=1e-6)
    assert out[3]["cumhazard"] == out[2]["cumhazard"]
    assert (out[1]["n_risk"], out[2]["n_risk"], out[3]["n_risk"]) == (3, 2, 1)


def test_nelson_aalen_tracks_kaplan_meier_exp(spark):
    """On tie-free event data with light censoring, exp(−H) ≈ S —
    the standard NA/KM consistency identity (first-order)."""
    from table_computing_spark.operators.survival import kaplan_meier, nelson_aalen

    rows = [("g", t, t % 5 != 0) for t in range(1, 40)]
    df = spark.createDataFrame(rows, "g string, t int, ev boolean")
    na = {r["t"]: r["cumhazard"] for r in nelson_aalen(df, ["g"], "t", F.col("ev")).collect()}
    km = {r["t"]: r["survival"] for r in kaplan_meier(df, ["g"], "t", F.col("ev")).collect()}
    for t in (5, 15, 25):
        assert math.exp(-na[t]) >= km[t]  # exp(−H) upper-bounds S (strict theory)
        assert math.exp(-na[t]) - km[t] < 0.08


# ------------------------------------------------------------------- graph


def test_clustering_coefficient_triangle_plus_pendant(spark):
    """Triangle 1-2-3 with pendant 4−1: cc(1) = 2·1/(3·2) = 1/3,
    cc(2) = cc(3) = 1, cc(4) NULL (degree 1)."""
    from table_computing_spark.operators.graph import clustering_coefficient

    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3), (1, 4)], "u int, v int")
    out = {r["node"]: r for r in clustering_coefficient(df).collect()}
    assert out[1]["clustering"] == round(1 / 3, 6) and out[1]["degree"] == 3
    assert out[2]["clustering"] == 1.0 and out[3]["clustering"] == 1.0
    assert out[4]["clustering"] is None and out[4]["n_triangles"] == 0


def test_clustering_coefficient_complete_graph_is_one(spark):
    from table_computing_spark.operators.graph import clustering_coefficient

    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    df = spark.createDataFrame(edges, "u int, v int")
    assert all(
        r["clustering"] == 1.0 and r["degree"] == 4
        for r in clustering_coefficient(df).collect()
    )


# ------------------------------------------- feature / experiment screening


def test_decision_stump_perfect_split(spark):
    """y = 0 below v=2, 100 above: split at 2, gain = SSE_all = 10000,
    both children pure."""
    from table_computing_spark.operators.classify import decision_stump

    rows = [("f", v, 0) for v in (1, 2)] + [("f", v, 100) for v in (3, 4)]
    df = spark.createDataFrame(rows, "feature string, v int, y int")
    r = decision_stump(df, "feature", "v", "y").collect()[0]
    assert (r["split_value"], r["gain"], r["n_left"], r["n"]) == (2.0, 10000.0, 2, 4)


def test_decision_stump_constant_feature_absent(spark):
    """A feature whose rows all tie on value has no candidate split —
    it must be absent, not reported with a degenerate threshold."""
    from table_computing_spark.operators.classify import decision_stump

    rows = [("const", 7, y) for y in (1, 2, 3)] + [("ok", v, v) for v in (1, 2)]
    df = spark.createDataFrame(rows, "feature string, v int, y int")
    out = {r["feature"] for r in decision_stump(df, "feature", "v", "y").collect()}
    assert out == {"ok"}


def test_isotonic_pools_adjacent_violators(spark):
    """Bin rates [0.8, 0.2, 0.6] (equal n): PAV pools bins 0-1 to 0.5;
    bin 2 stays 0.6 — and the output is nondecreasing."""
    from table_computing_spark.operators.classify import isotonic_calibrate

    rows = []
    for b, pos in ((0, 8), (1, 2), (2, 6)):
        score = b * 33 + 10
        rows += [(score, 1)] * pos + [(score, 0)] * (10 - pos)
    df = spark.createDataFrame(rows, "s int, y int")
    out = {r["bin"]: r for r in isotonic_calibrate(df, "s", 100, "y", bins=3).collect()}
    assert out[0]["calibrated"] == 0.5 and out[1]["calibrated"] == 0.5
    assert out[2]["calibrated"] == 0.6
    assert out[0]["raw_rate"] == 0.8  # the violator the fit repaired


def test_isotonic_already_monotone_is_identity(spark):
    from table_computing_spark.operators.classify import isotonic_calibrate

    rows = []
    for b, pos in ((0, 1), (1, 5), (2, 9)):
        rows += [(b * 33 + 5, 1)] * pos + [(b * 33 + 5, 0)] * (10 - pos)
    df = spark.createDataFrame(rows, "s int, y int")
    for r in isotonic_calibrate(df, "s", 100, "y", bins=3).collect():
        assert r["calibrated"] == r["raw_rate"]


def test_chi2_screen_independent_and_dependent(spark):
    """Exact independence → chi2 = 0; perfect 2x2 dependence → chi2 = n.
    Also pins the O=0 cell handling (these cells contribute E)."""
    from table_computing_spark.operators.drift import chi2_screen

    rows = (
        [("ind", "a", "x")] * 10 + [("ind", "a", "y")] * 10
        + [("ind", "b", "x")] * 10 + [("ind", "b", "y")] * 10
        + [("dep", "a", "x")] * 20 + [("dep", "b", "y")] * 20
    )
    df = spark.createDataFrame(rows, "feature string, v string, l string")
    out = {r["feature"]: r for r in
           chi2_screen(df, "feature", F.col("v"), F.col("l")).collect()}
    assert out["ind"]["chi2"] == 0.0 and out["ind"]["dof"] == 1
    assert out["dep"]["chi2"] == 40.0 and out["dep"]["n"] == 40


def test_cuped_removes_covariate_variance(spark):
    """Y = 2X + arm effect: theta = 2 exactly; same-X arms keep their
    raw means; the adjusted arm gap equals the true effect; the
    variance-reduction ratio equals the hand-computed 100*rho^2."""
    from table_computing_spark.operators.drift import cuped_adjust

    rows = [("A", x, 2 * x + 10) for x in range(1, 21)] + [
        ("B", x, 2 * x + 20) for x in range(1, 21)
    ]
    df = spark.createDataFrame(rows, "arm string, x int, y int")
    out = {r["arm"]: r for r in
           cuped_adjust(df, "arm", F.col("y"), F.col("x")).collect()}
    xs = list(range(1, 21)) * 2
    ys = [2 * x + 10 for x in range(1, 21)] + [2 * x + 20 for x in range(1, 21)]
    n, sx, sy = len(xs), sum(xs), sum(ys)
    cov = sum(x * y for x, y in zip(xs, ys)) - sx * sy / n
    vx = sum(x * x for x in xs) - sx * sx / n
    vy = sum(y * y for y in ys) - sy * sy / n
    assert out["A"]["theta"] == 2.0
    assert out["A"]["mean_adj"] == out["A"]["mean_raw"]
    assert abs(out["B"]["mean_adj"] - out["A"]["mean_adj"] - 10) < 1e-6
    assert out["A"]["var_reduction_pct"] == round(100 * cov * cov / (vx * vy), 6)


def test_cuped_constant_covariate_raises(spark):
    from table_computing_spark.operators.drift import cuped_adjust

    df = spark.createDataFrame([("A", 5, 1), ("B", 5, 2)], "arm string, x int, y int")
    with pytest.raises(ValueError, match="zero variance"):
        cuped_adjust(df, "arm", F.col("y"), F.col("x"))


def test_cumulative_gains_top_half_positive(spark):
    """20 rows scored descending with the top half all positive, 4
    buckets: capture 0.5 / 1.0 / 1.0 / 1.0, lift 2 / 2 / 0 / 0."""
    from table_computing_spark.operators.evaluation import cumulative_gains

    rows = [(i, 1 if i <= 10 else 0, 100.0 - i) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "id int, y int, s double")
    out = {r["bucket"]: r for r in
           cumulative_gains(df, "id", F.col("y"), F.col("s"), n_buckets=4).collect()}
    assert [out[b]["capture_rate"] for b in (1, 2, 3, 4)] == [0.5, 1.0, 1.0, 1.0]
    assert out[1]["lift"] == 2.0 and out[4]["lift"] == 0.0
    assert out[1]["n"] == 5 and out[3]["cum_pos"] == 10


# -------------------------------------------------- series / text / streams


def test_acf_table_alternating_series(spark):
    """Perfect period-2 alternation: r(1) = −1, r(2) = +1, r(3) = −1."""
    from table_computing_spark.operators.temporal import acf_table

    rows = [("k", t, 10 if t % 2 == 0 else 20) for t in range(12)]
    df = spark.createDataFrame(rows, "k string, t int, v int")
    out = {r["lag"]: r["autocorr"] for r in
           acf_table(df, ["k"], "t", "v", max_lag=3).collect()}
    assert out == {1: -1.0, 2: 1.0, 3: -1.0}


def test_acf_table_matches_lag_autocorr(spark):
    """Every acf_table row must equal the single-lag operator's value
    — same machinery, batched."""
    from table_computing_spark.operators.temporal import acf_table, lag_autocorr

    rows = [("k", t, (t * t * 7) % 23) for t in range(30)]
    df = spark.createDataFrame(rows, "k string, t int, v int")
    multi = {r["lag"]: r["autocorr"] for r in
             acf_table(df, ["k"], "t", "v", max_lag=4).collect()}
    for lag in (1, 2, 3, 4):
        single = lag_autocorr(df, ["k"], "t", "v", lag=lag).collect()[0]["autocorr"]
        assert multi[lag] == single, (lag, multi[lag], single)


def test_seasonal_decompose_pure_pattern(spark):
    """Flat level 100 + seasonal [0,10,0,-10], EVEN period 4: the
    classical 2×4 MA (half-weight ends) recovers the trend EXACTLY
    (100.0 on every interior row — an equal-weight 5-row window would
    double-count one phase and shrink the seasonal by 4/5, the r11
    ADVICE finding), and the seasonal component is the exact pattern
    re-centered; interior trend+seasonal+residual == value."""
    from table_computing_spark.operators.temporal import seasonal_decompose

    season = [0, 10, 0, -10]
    rows = [("k", t, 100 + season[t % 4]) for t in range(16)]
    df = spark.createDataFrame(rows, "k string, t int, v int")
    out = {r["t"]: r for r in
           seasonal_decompose(df, ["k"], "t", "v", period=4).collect()}
    assert out[0]["trend"] is None and out[15]["trend"] is None
    assert out[8]["trend"] == 100.0  # exact — no phase double-counting
    ss = [out[t]["seasonal"] for t in range(4)]
    assert abs(sum(ss)) < 1e-6
    assert ss == [0.0, 10.0, 0.0, -10.0]  # exact amplitude, no 4/5 shrink
    mid = out[8]
    assert mid["residual"] == pytest.approx(
        mid["value"] - mid["trend"] - mid["seasonal"], abs=2e-6
    )


def test_seasonal_decompose_odd_period_simple_ma(spark):
    """ODD period 3 keeps the simple centered 3-row mean: pure pattern
    [0,9,-9] over level 50 → exact flat trend and exact seasonal."""
    from table_computing_spark.operators.temporal import seasonal_decompose

    season = [0, 9, -9]
    rows = [("k", t, 50 + season[t % 3]) for t in range(12)]
    df = spark.createDataFrame(rows, "k string, t int, v int")
    out = {r["t"]: r for r in
           seasonal_decompose(df, ["k"], "t", "v", period=3).collect()}
    assert out[0]["trend"] is None and out[11]["trend"] is None
    assert out[5]["trend"] == 50.0
    ss = [out[t]["seasonal"] for t in range(3)]
    assert ss == [0.0, 9.0, -9.0]


def test_standardize_embeddings_known_moments(spark):
    """Dim 0 has mean 3, population std sqrt(8/3); dim 1 is constant
    (zero variance → NULL z)."""
    from table_computing_spark.operators.similarity import standardize_embeddings

    rows = [(1, [1.0, 10.0]), (2, [3.0, 10.0]), (3, [5.0, 10.0])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    out = {(r["vec_id"], r["j"]): r["z"] for r in standardize_embeddings(df).collect()}
    exp = round((1 - 3) / math.sqrt(8 / 3), 6)
    assert out[(1, 0)] == exp and out[(3, 0)] == -exp and out[(2, 0)] == 0.0
    assert out[(1, 1)] is None


def test_flesch_hand_counted(spark):
    """'The cat sat. The dog ran.' → 6 words, 2 sentences, 6 vowel
    runs; punctuation-only text → NULL score, 0 words."""
    from table_computing_spark.operators.text import flesch_readability

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran."), (2, "...")], "id int, text string"
    )
    out = {r["id"]: r for r in flesch_readability(df, "id", "text").collect()}
    r = out[1]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (6, 2, 6)
    assert r["flesch"] == round(206.835 - 1.015 * 3.0 - 84.6 * 1.0, 4)
    assert out[2]["flesch"] is None and out[2]["n_words"] == 0


def test_flesch_syllable_floor(spark):
    """An all-consonant 'word' still counts >= 1 syllable (the floor
    at word count)."""
    from table_computing_spark.operators.text import flesch_readability

    df = spark.createDataFrame([(1, "tsk tsk brr")], "id int, text string")
    r = flesch_readability(df, "id", "text").collect()[0]
    assert r["n_words"] == 3 and r["n_syllables"] == 3


def test_classification_report_from_counts_equals_rowlevel(spark):
    from table_computing_spark.operators.evaluation import (
        classification_report,
        classification_report_from_counts,
    )

    rows = [("a", "a")] * 5 + [("a", "b")] * 2 + [("b", "b")] * 3 + [("c", "a")]
    df = spark.createDataFrame(rows, "l string, p string")
    full = sorted(map(tuple, classification_report(df, F.col("l"), F.col("p")).collect()))
    cnt = df.groupBy("l", "p").count()
    fromc = sorted(map(tuple, classification_report_from_counts(
        cnt, F.col("l"), F.col("p"), F.col("count")).collect()))
    assert full == fromc


# ------------------------------------------------------ rate estimation


def test_wilson_lower_bound_ranks_evidence(spark):
    """1/1 must rank BELOW 95/100 by the lower bound; the 1/1 value
    matches the closed form."""
    from table_computing_spark.operators.rates import wilson_lower_bound

    rows = [("a", True)] + [("b", True)] * 95 + [("b", False)] * 5
    df = spark.createDataFrame(rows, "k string, s boolean")
    out = {r["k"]: r for r in wilson_lower_bound(df, ["k"], F.col("s")).collect()}
    assert out["a"]["rate"] == 1.0 and out["b"]["rate"] == 0.95
    assert out["a"]["wilson_lb"] < out["b"]["wilson_lb"]
    z, z2 = 1.96, 1.96 * 1.96
    exp = round((1.0 + z2 / 2 - z * math.sqrt(z2 / 4)) / (1 + z2), 6)
    assert out["a"]["wilson_lb"] == exp


def test_eb_shrink_pulls_small_samples(spark):
    """A 1/1 key shrinks hard toward the ~0.3 prior mean; an 18/20 key
    keeps most of its evidence; alpha/beta are positive."""
    from table_computing_spark.operators.rates import eb_shrink

    rows = []
    for i in range(50):
        pos = 4 + (i % 5)
        rows += [(f"k{i}", True)] * pos + [(f"k{i}", False)] * (20 - pos)
    rows += [("tiny", True)]
    rows += [("big", True)] * 18 + [("big", False)] * 2
    df = spark.createDataFrame(rows, "k string, s boolean")
    out = {r["k"]: r for r in eb_shrink(df, ["k"], F.col("s")).collect()}
    assert out["tiny"]["rate"] == 1.0 and out["tiny"]["shrunk_rate"] < 0.6
    assert out["big"]["shrunk_rate"] > 0.7
    assert out["big"]["alpha"] > 0 and out["big"]["beta"] > 0


def test_eb_shrink_degenerate_raises(spark):
    from table_computing_spark.operators.rates import eb_shrink

    df = spark.createDataFrame([("x", True), ("x", False)], "k string, s boolean")
    with pytest.raises(ValueError, match="moment-match"):
        eb_shrink(df, ["k"], F.col("s"))


def test_trimmed_mean_drops_outlier(spark):
    """[1..10, 1000] at 10% trim: k = 1 drops the 1 and the 1000 —
    mean of 2..10 = 6; duplicates at the trim boundary keep the same
    multiset whatever the tie order."""
    from table_computing_spark.operators.quantiles import trimmed_mean

    vals = list(range(1, 11)) + [1000]
    df = spark.createDataFrame([("k", v) for v in vals], "k string, v int")
    r = trimmed_mean(df, ["k"], F.col("v"), 0.1).collect()[0]
    assert (r["n"], r["n_trimmed_each_side"], r["trimmed_mean"]) == (11, 1, 6.0)
    # tie at the boundary: [5,5,5,9] trim .25 -> k=1 -> kept multiset {5,5}... 
    # kept ranks 2..3 over sorted [5,5,5,9] = {5,5} -> mean 5 regardless of tie order
    df = spark.createDataFrame([("k", v) for v in (5, 5, 5, 9)], "k string, v int")
    r = trimmed_mean(df, ["k"], F.col("v"), 0.25).collect()[0]
    assert r["trimmed_mean"] == 5.0
