"""Unit tests for the round-10 operator families: recsys item-CF,
Adamic-Adar link prediction, weighted SSSP, Kaplan-Meier, forecast
eval, conformal intervals, diff-in-diff, JS divergence, compaction
bin-packing, phrase search, RAKE keywords, grid DBSCAN."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- recsys

def test_item_cf_cosine_and_guard(spark):
    """Known co-occurrence cosine; the mega-user is excluded from PAIR
    generation but its rows still count toward item totals."""
    from table_computing_spark.operators.recsys import item_cf

    rows = [("u1", "a"), ("u1", "b"), ("u2", "a"), ("u2", "b"), ("u3", "a")]
    # mega-user touches everything; with max_user_items=2 it generates
    # no pairs but its interactions still count in |U_i|
    rows += [("mega", x) for x in ("a", "b", "c")]
    df = spark.createDataFrame(rows, "u string, i string")
    out = {(r["item"], r["neighbor"]): r
           for r in item_cf(df, "u", "i", k=3, min_common=2,
                            max_user_items=2).collect()}
    # n_common(a,b) = 2 (u1,u2); |U_a|=4 (incl. mega), |U_b|=3
    got = out[("a", "b")]
    assert got["n_common"] == 2
    assert got["cos_sim"] == round(2 / math.sqrt(4 * 3), 6)
    # no pair involves c (only the excluded mega-user links it)
    assert not any("c" in k for k in out)


# ----------------------------------------------------------------- graph

def test_adamic_adar_known_scores(spark):
    """Wedge 1-2 via hub 0 (deg 3): score = 1/ln(3); the existing edge
    (0,3) must not be predicted; the isolated pair has no wedge."""
    from table_computing_spark.operators.graph import adamic_adar

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 3)], "src long, dst long"
    )
    out = {(r["id_a"], r["id_b"]): r for r in adamic_adar(edges).collect()}
    # 1-2 share neighbor 0 (deg 3): 1/ln 3
    assert out[(1, 2)]["n_common"] == 1
    assert out[(1, 2)]["score"] == round(round(1e12 / math.log(3)) / 1e12, 6)
    # 2-3 share neighbor 0 -> predicted; 0-1/0-2/0-3/1-3 are edges, absent
    assert (2, 3) in out
    assert (0, 1) not in out and (1, 3) not in out


def test_adamic_adar_max_degree_truncation(spark):
    """Wedge centers above max_degree are dropped (the documented AA
    truncation): with the hub excluded, no pairs remain."""
    from table_computing_spark.operators.graph import adamic_adar

    hub = spark.range(1, 20).select(F.lit(0).alias("src"), F.col("id").alias("dst"))
    assert adamic_adar(hub, max_degree=10).count() == 0
    assert adamic_adar(hub, max_degree=None).count() > 0


def test_sssp_weighted_bounded_rounds(spark):
    """Exact distances within the round bound; a cheaper-but-longer
    path is only found once rounds cover its hop count."""
    from table_computing_spark.operators.graph import sssp_weighted

    # 0->3 direct costs 10; 0->1->2->3 costs 3 but needs 3 hops
    edges = spark.createDataFrame(
        [(0, 3, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1)],
        "src long, dst long, weight long",
    )
    d2 = {r["node"]: r["dist"] for r in sssp_weighted(edges, 0, rounds=2).collect()}
    assert d2[3] == 10  # 3-hop path not yet relaxed
    d3 = {r["node"]: r["dist"] for r in sssp_weighted(edges, 0, rounds=3).collect()}
    assert d3 == {0: 0, 1: 1, 2: 2, 3: 3}


# -------------------------------------------------------------- survival

def test_kaplan_meier_textbook(spark):
    """Hand-computed product-limit curve with censoring: events at
    t=1 (1 of 5) and t=3 (1 of 3); censorings at t=2 and t=4."""
    from table_computing_spark.operators.survival import kaplan_meier

    rows = [(1, True), (2, False), (3, True), (4, False), (5, True)]
    df = spark.createDataFrame(rows, "t long, ev boolean").withColumn(
        "g", F.lit("g")
    )
    out = {r["t"]: r for r in kaplan_meier(df, ["g"], "t", F.col("ev")).collect()}
    assert out[1]["n_risk"] == 5 and out[1]["survival"] == round(4 / 5, 6)
    assert out[2]["n_risk"] == 4 and out[2]["survival"] == round(4 / 5, 6)
    assert out[3]["n_risk"] == 3
    assert out[3]["survival"] == round(
        math.exp(math.log(4 / 5) + math.log(2 / 3)), 6
    )
    # last subject events at t=5 with n_risk=1 -> curve hits exactly 0
    assert out[5]["n_risk"] == 1 and out[5]["survival"] == 0.0


# -------------------------------------------------------------- temporal

def test_forecast_eval_hand_computed(spark):
    from table_computing_spark.operators.temporal import forecast_eval

    # series: actuals 10,20,30,40 / forecasts 12,18,33,40, season=1
    rows = [("s", 1, 10, 12), ("s", 2, 20, 18), ("s", 3, 30, 33), ("s", 4, 40, 40)]
    df = spark.createDataFrame(rows, "k string, t long, a long, f long")
    out = forecast_eval(df, ["k"], "t", "a", "f", season=1).collect()[0]
    # rows with naive defined: t=2,3,4 -> |f-a| = 2,3,0 ; naive |lag-a| = 10,10,10
    assert out["n"] == 3
    assert out["mae"] == round(5 / 3, 6)
    assert out["mase"] == round((5 / 3) / 10.0, 6)
    smape = (round(2 * 2 / 38, 12) + round(2 * 3 / 63, 12) + 0.0) / 3
    assert out["smape"] == round(smape, 6)


# -------------------------------------------------------------- classify

def test_conformal_order_statistic_and_coverage(spark):
    from table_computing_spark.operators.classify import conformal_intervals

    # calibration: residuals 1..9 (ids 2,4,..,18); alpha=0.1 ->
    # rank ceil(10*0.9) = 9 -> q_hat = 9th smallest = 9
    cal = [(i * 2, "g", 100 + i, 100) for i in range(1, 10)]
    test = [(i * 2 + 1, "g", 100 + i, 100) for i in range(1, 21)]  # residuals 1..20
    df = spark.createDataFrame(cal + test, "id long, g string, y long, p long")
    out = conformal_intervals(
        df, ["g"], "y", "p", calib_cond=F.col("id") % 2 == 0, alpha=0.1
    ).collect()[0]
    assert out["n_cal"] == 9 and out["q_hat"] == 9
    assert out["n_test"] == 20 and out["coverage"] == round(9 / 20, 6)


def test_conformal_too_few_rows_null_qhat(spark):
    from table_computing_spark.operators.classify import conformal_intervals

    df = spark.createDataFrame(
        [(0, "g", 5, 4), (1, "g", 5, 3)], "id long, g string, y long, p long"
    )
    out = conformal_intervals(
        df, ["g"], "y", "p", calib_cond=F.col("id") == 0, alpha=0.1
    ).collect()[0]
    assert out["n_cal"] == 1 and out["q_hat"] is None
    # nothing to certify -> NULL coverage, never a misleading 0.0
    assert out["coverage"] is None


# ----------------------------------------------------------------- drift

def test_diff_in_diff_hand_computed(spark):
    from table_computing_spark.operators.drift import diff_in_diff

    rows = (
        [("t", "pre", 10)] * 2 + [("t", "post", 25)] * 2
        + [("c", "pre", 10)] * 2 + [("c", "post", 15)] * 2
    )
    df = spark.createDataFrame(rows, "g string, p string, v long")
    out = diff_in_diff(df, "g", "p", F.col("v"), "t", "c", "pre", "post").collect()[0]
    assert out["did"] == round((25 - 10) - (15 - 10), 6) == 10.0


def test_diff_in_diff_missing_cell_raises(spark):
    from table_computing_spark.operators.drift import diff_in_diff

    df = spark.createDataFrame(
        [("t", "pre", 1), ("c", "pre", 1), ("c", "post", 1)],
        "g string, p string, v long",
    )
    with pytest.raises(ValueError, match="empty cells"):
        diff_in_diff(df, "g", "p", F.col("v"), "t", "c", "pre", "post")


def test_js_divergence_bounds(spark):
    from table_computing_spark.operators.drift import js_divergence

    a = spark.range(100).select((F.col("id") % 10).cast("double").alias("x"))
    # identical distributions -> 0
    z = js_divergence(a, a, "x", 0.0, 10.0).select("js_total").first()[0]
    assert z == 0.0
    # disjoint supports -> ln 2
    lo = spark.range(100).select((F.col("id") % 3).cast("double").alias("x"))
    hi = spark.range(100).select((F.col("id") % 3 + 7).cast("double").alias("x"))
    d = js_divergence(lo, hi, "x", 0.0, 10.0).select("js_total").first()[0]
    assert d == round(math.log(2), 6)


# ------------------------------------------------------------ compaction

def test_binpack_plan_next_fit_offsets(spark):
    from table_computing_spark.sources.compaction import binpack_plan

    files = spark.createDataFrame(
        [("p", "big", 120), ("p", "a", 60), ("p", "b", 50), ("p", "c", 10)],
        "part string, name string, sz long",
    )
    out = {r["name"]: (r["bin"], r["offset"])
           for r in binpack_plan(files, ["part"], "name", "sz", 100).collect()}
    # scan order (size desc, name): big(120)@0, a(60)@120, b(50)@180, c(10)@230
    assert out == {"big": (0, 0), "a": (1, 120), "b": (1, 180), "c": (2, 230)}


# ------------------------------------------------------------------ text

def test_phrase_positions_exact_and_overlapping(spark):
    from table_computing_spark.operators.text import phrase_positions

    docs = spark.createDataFrame(
        [(1, "the big cat big cat big"), (2, "big cat"), (3, "cat big")],
        "doc_id long, text string",
    )
    out = {(r["id"], r["pos"])
           for r in phrase_positions(docs, ["big", "cat"]).collect()}
    assert out == {(1, 1), (1, 3), (2, 0)}
    # 3-word phrase chains two joins
    out3 = phrase_positions(docs, ["cat", "big", "cat"]).collect()
    assert {(r["id"], r["pos"]) for r in out3} == {(1, 2)}


def test_rake_keywords_scores_and_runs(spark):
    """'data table' (between stopwords) must outrank single words; a
    punctuation token splits runs."""
    from table_computing_spark.operators.text import rake_keywords

    docs = spark.createDataFrame(
        [(i, "the data table of data table and cat . dog") for i in range(3)],
        "doc_id long, text string",
    )
    out = {r["phrase"]: r for r in rake_keywords(docs, min_count=2).collect()}
    assert "data table" in out
    assert out["data table"]["n_phrase"] == 6  # 2 per doc x 3 docs
    # word scores: data: deg 12/freq 6 = 2, table same -> phrase score 4
    assert out["data table"]["score"] == 4.0
    assert out["cat"]["score"] == 1.0  # singleton run
    # ". dog": "." splits the run -> dog is its own phrase
    assert out["dog"]["n_phrase"] == 3
    # rank is 1-based over (score desc, phrase asc)
    assert out["data table"]["rank"] == 1


# --------------------------------------------------------------- spatial

def test_grid_dbscan_two_blobs_and_noise(spark):
    from table_computing_spark.operators.spatial import grid_dbscan

    blob1 = [(i, 10 + i % 3, 10 + i // 3) for i in range(9)]           # dense 3x3
    blob2 = [(100 + i, 500 + i % 3, 500 + i // 3) for i in range(9)]   # dense 3x3
    lone = [(999, 250, 250)]
    pts = spark.createDataFrame(blob1 + blob2 + lone, "id long, x long, y long")
    out = {r["id"]: r for r in grid_dbscan(pts, "id", "x", "y",
                                           eps=3, min_pts=4).collect()}
    assert out[999]["role"] == "noise" and out[999]["cluster"] is None
    c1 = {out[i]["cluster"] for i in range(9)}
    c2 = {out[100 + i]["cluster"] for i in range(9)}
    assert c1 == {0} and c2 == {100}  # min-id labels, two distinct clusters
    assert all(out[i]["role"] in ("core", "border") for i in range(9))


def test_grid_dbscan_border_vs_core(spark):
    """A point within eps of a dense blob but with too few neighbors of
    its own is a border, assigned to the blob's cluster."""
    from table_computing_spark.operators.spatial import grid_dbscan

    blob = [(i, i % 3, i // 3) for i in range(9)]  # 3x3 at origin
    border = [(50, 4, 1)]                          # within eps=2 of the edge col
    pts = spark.createDataFrame(blob + border, "id long, x long, y long")
    out = {r["id"]: r for r in grid_dbscan(pts, "id", "x", "y",
                                           eps=2, min_pts=6).collect()}
    assert out[50]["role"] == "border" and out[50]["cluster"] == 0


# ------------------------------------------------------- late r10 batch

def test_exact_k_sample_count_and_determinism(spark):
    from table_computing_spark.operators.sampling import exact_k_sample

    df = spark.createDataFrame(
        [(f"s{i % 3}", i) for i in range(100)], "s string, id long"
    )
    out = exact_k_sample(df, "s", "id", k=5)
    per = {r["s"]: r["count"] for r in out.groupBy("s").count().collect()}
    assert per == {"s0": 5, "s1": 5, "s2": 5}
    # pure function of the data: a repartitioned rerun picks the SAME ids
    again = exact_k_sample(df.repartition(7), "s", "id", k=5)
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}
    # stratum smaller than k: keep all rows, never pad
    tiny = spark.createDataFrame([("a", 1), ("a", 2)], "s string, id long")
    assert exact_k_sample(tiny, "s", "id", k=5).count() == 2


def test_kmv_rollup_equals_direct_sketch(spark):
    """Associativity contract: rollup(fine state) == direct coarse
    sketch, bit for bit."""
    from table_computing_spark.operators import kmv

    df = spark.createDataFrame(
        [(i % 4, f"g{i % 2}", i * 13) for i in range(2000)],
        "day long, g string, v long",
    )
    fine = kmv.kmv_sketch(df, ["day", "g"], "v", k=64, n_cells=256)
    rolled = {r["g"]: r["kmv"]
              for r in kmv.kmv_rollup(fine, ["g"], k=64).collect()}
    direct = {r["g"]: r["kmv"]
              for r in kmv.kmv_sketch(df, ["g"], "v", k=64, n_cells=256).collect()}
    assert rolled == direct


def test_zipf_fit_recovers_planted_slope(spark):
    """A corpus built with freq(rank) = C / rank^1.0 must fit slope
    ~ -1 exactly on the planted range."""
    from table_computing_spark.operators.text import zipf_fit

    # one doc per token occurrence: token t_r appears floor(2000/r) times
    rows = []
    for r in range(1, 60):
        rows += [(f"t{r:03d}",)] * (2000 // r)
    docs = spark.createDataFrame(rows, "text string").selectExpr(
        "text", "monotonically_increasing_id() AS doc_id"
    )
    out = zipf_fit(docs, top_n=50, skip_top=5).collect()[0]
    assert out["n_tokens"] == sum(2000 // r for r in range(1, 60))
    # floor() quantization wobbles the fit slightly around -1
    assert -1.05 < out["slope"] < -0.95
