"""Round-7 operators: linear-interpolation resampling, touch
attribution, PMI collocations, HITS, centroid silhouette — each pinned
against an independent pure-Python/numpy reference on crafted inputs.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F


# ------------------------------------------------- resample_interp


def test_resample_interp_matches_hand_computed(spark):
    from table_computing_spark.operators.temporal import resample_interp

    obs = spark.createDataFrame(
        [("k", 95, 10.0), ("k", 200, 20.0), ("k", 400, 10.0)],
        "key string, t long, v double",
    )
    out = {
        r["tick"]: r["interp"]
        for r in resample_interp(obs, "key", "t", step=100, value_col="v").collect()
    }
    # grid starts at floor(95/100)*100 = 0; before first obs -> null
    assert out[0] is None
    # 100 is between (95, 10) and (200, 20): 10 + 10*(5/105)
    assert out[100] == round(10.0 + 10.0 * 5 / 105, 6)
    assert out[200] == 20.0  # exact observation time
    assert out[300] == round(20.0 + (10.0 - 20.0) * 100 / 200, 6)
    assert out[400] == 10.0
    assert set(out) == {0, 100, 200, 300, 400}


def test_resample_interp_holds_after_last(spark):
    from table_computing_spark.operators.temporal import resample_interp

    obs = spark.createDataFrame(
        [("k", 0, 5.0), ("k", 250, 7.0)], "key string, t long, v double"
    )
    out = {
        r["tick"]: r["interp"]
        for r in resample_interp(obs, "key", "t", step=100, value_col="v").collect()
    }
    assert out[200] == round(5.0 + 2.0 * 200 / 250, 6)
    # grid stops at hi=250 -> last tick 200; extend grid? hi not aligned:
    # sequence(0, 250, 100) = [0, 100, 200]
    assert set(out) == {0, 100, 200}


# ----------------------------------------------- touch_attribution


def test_touch_attribution_first_last_and_ties(spark):
    from table_computing_spark.operators.temporal import touch_attribution

    rows = [
        # user 1: touches at 10 (a), 10 (b) tie, 50 (c); conversion at 60
        (1, 10, "a"), (1, 10, "b"), (1, 50, "c"), (1, 60, "BUY"),
        # user 1: second conversion at 200 — only touch within 100 is c@50?
        # lookback 100 -> window [100, 200]: none -> nulls
        (1, 200, "BUY"),
        # user 2: touch exactly at conversion time counts (at-or-before)
        (2, 30, "x"), (2, 30, "BUY"),
    ]
    df = spark.createDataFrame(rows, "u long, t long, ch string")
    out = touch_attribution(
        df, ["u"], "t", "ch",
        touch_cond=F.col("ch") != "BUY",
        conversion_cond=F.col("ch") == "BUY",
        lookback_ms=100,
    ).collect()
    by = {(r["u"], r["conv_ms"]): r for r in out}
    r = by[(1, 60)]
    assert (r["first_channel"], r["first_ms"]) == ("a", 10)  # tie -> channel asc
    assert (r["last_channel"], r["last_ms"]) == ("c", 50)
    assert r["n_touches"] == 3
    r2 = by[(1, 200)]
    assert r2["first_channel"] is None and r2["n_touches"] == 0
    r3 = by[(2, 30)]
    assert r3["first_channel"] == "x" and r3["last_ms"] == 30


# ---------------------------------------------------- cooccur_pmi


def test_cooccur_pmi_matches_counter_reference(spark):
    from table_computing_spark.operators.text import cooccur_pmi

    corpus = [
        "new york new york city",
        "san francisco bay area san francisco",
        "new york is a city",
        "the bay area the bay",
    ]
    df = spark.createDataFrame([(s,) for s in corpus], "text string")
    got = {
        (r["a"], r["b"]): (r["c_ab"], r["pmi"])
        for r in cooccur_pmi(df, window=2, min_count=2, top_k=100).collect()
    }

    cab: Counter = Counter()
    uni: Counter = Counter()
    for s in corpus:
        ws = s.lower().split()
        uni.update(ws)
        for i, a in enumerate(ws):
            for k in (1, 2):
                if i + k < len(ws):
                    cab[(a, ws[i + k])] += 1
    T = sum(cab.values())
    N = sum(uni.values())
    want = {
        p: (c, round(math.log((c * float(N) * float(N))
                              / (float(T) * uni[p[0]] * uni[p[1]])), 6))
        for p, c in cab.items() if c >= 2
    }
    assert got == want


# ----------------------------------------------------------- HITS


def _hits_reference(edges, iterations):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    h = {n: 10**9 for n in nodes}
    a = {n: 0 for n in nodes}
    for _ in range(iterations):
        raw = {n: 0 for n in nodes}
        for u, v in edges:
            raw[v] += h[u]
        s = sum(raw.values())
        # round-half-up like SQL round(): floor(x+0.5) on the double ratio
        a = {n: (int(math.floor((float(x) * 1e9) / s + 0.5)) if s > 0 else 0)
             for n, x in raw.items()}
        raw = {n: 0 for n in nodes}
        for u, v in edges:
            raw[u] += a[v]
        s = sum(raw.values())
        h = {n: (int(math.floor((float(x) * 1e9) / s + 0.5)) if s > 0 else 0)
             for n, x in raw.items()}
    return {n: (round(a[n] / 1e9, 9), round(h[n] / 1e9, 9)) for n in nodes}


def test_hits_nano_matches_reference(spark):
    from table_computing_spark.operators.graph import hits_nano

    edges = [(1, 100), (1, 101), (2, 100), (3, 100), (3, 102), (4, 101)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["authority"], r["hub"])
        for r in hits_nano(df, iterations=2).collect()
    }
    assert got == _hits_reference(edges, 2)
    # hub-only nodes have authority 0; authority-only nodes hub 0
    assert got[4][0] == 0.0 and got[100][1] == 0.0
    # node 100 (in-degree 3) is the top authority
    assert got[100][0] == max(v[0] for v in got.values())


# ----------------------------------------------------- silhouette


def test_centroid_silhouette_matches_numpy(spark):
    from table_computing_spark.operators.similarity import centroid_silhouette

    rng = np.random.default_rng(5)
    centers = np.array([[5.0, 0.0], [-5.0, 0.0], [0.0, 8.0]])
    labels = rng.integers(0, 3, size=120)
    vecs = centers[labels] + rng.normal(0, 0.5, size=(120, 2))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], int(labels[i])) for i in range(120)],
        "vec_id long, embedding array<double>, label int",
    )
    got = {r["label"]: (r["n"], r["silhouette"])
           for r in centroid_silhouette(df).collect()}

    # reference: integer-micro centroids, nano-rounded per-point scores
    cents = {}
    for lab in range(3):
        pts = np.round(vecs[labels == lab] * 1e6)
        cents[lab] = (pts.sum(axis=0) / 1e6) / (labels == lab).sum()
    sums = Counter()
    ns = Counter()
    for i in range(120):
        d = {lab: math.sqrt(float(((vecs[i] - c) ** 2).sum()))
             for lab, c in cents.items()}
        a = d[labels[i]]
        b = min(v for lab, v in d.items() if lab != labels[i])
        s = int(math.floor(((b - a) / max(a, b)) * 1e9 + 0.5))
        sums[int(labels[i])] += s
        ns[int(labels[i])] += 1
    want = {lab: (ns[lab], round((sums[lab] / ns[lab]) / 1e9, 6)) for lab in ns}
    assert set(got) == set(want)
    for lab in want:
        assert got[lab][0] == want[lab][0]
        assert got[lab][1] == pytest.approx(want[lab][1], abs=2e-6)
    # well-separated clusters: strongly positive silhouettes
    assert all(v[1] > 0.7 for v in got.values())


def test_centroid_silhouette_single_cluster_is_zero(spark):
    from table_computing_spark.operators.similarity import centroid_silhouette

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    rows = centroid_silhouette(df).collect()
    assert len(rows) == 1 and rows[0]["silhouette"] == 0.0


# ----------------------------------------------- interval_coverage


def test_interval_coverage_islands(spark):
    from table_computing_spark.operators.temporal import interval_coverage

    rows = [
        # key a: [0,5) [3,9) touch-merge [9,12) -> one island [0,12)
        ("a", 0, 5), ("a", 3, 9), ("a", 9, 12),
        # gap, then [20, 25)
        ("a", 20, 25),
        # key b: identical duplicated interval + contained interval
        ("b", 0, 10), ("b", 0, 10), ("b", 2, 4),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {r["k"]: (r["n_intervals"], r["n_islands"], r["covered"])
           for r in interval_coverage(df, ["k"], "s", "e").collect()}
    assert got["a"] == (4, 2, 12 + 5)
    assert got["b"] == (3, 1, 10)


# ------------------------------------------- label_propagation


def test_label_propagation_clamped_majority(spark):
    from table_computing_spark.operators.graph import label_propagation

    # seeds: 1 -> label 10, 2 -> label 20. Node 3 touches both but has
    # two edges to 1's side (multi-edge counts). Node 4 only reaches a
    # label via 3's iteration-1 result (wavefront). Node 5 isolatedish
    # pair with no labeled neighbor stays null.
    edges = [(1, 3), (1, 3), (2, 3), (3, 4), (5, 6)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1, 10), (2, 20)], "node long, label long")
    got = {r["node"]: r["label"]
           for r in label_propagation(e, seeds, iterations=2).collect()}
    assert got[1] == 10 and got[2] == 20  # clamped
    assert got[3] == 10  # majority by multi-edge count 2 vs 1
    assert got[4] == 10  # learned from 3 in iteration 2
    assert got[5] is None and got[6] is None
    # tie-break: equal votes -> smallest label
    e2 = spark.createDataFrame([(1, 3), (2, 3)], "src long, dst long")
    got2 = {r["node"]: r["label"]
            for r in label_propagation(e2, seeds, iterations=1).collect()}
    assert got2[3] == 10


def test_label_propagation_keeps_label_without_votes(spark):
    from table_computing_spark.operators.graph import label_propagation

    # chain seed(1) - 2 - 3: after iter1, 2 is labeled; iter2 labels 3;
    # 2 must KEEP its label even though 1 and 3 are its only neighbors
    # and 3 was unlabeled during iter1's vote for 2... run 3 iters and
    # check stability
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    seeds = spark.createDataFrame([(1, 7)], "node long, label long")
    got = {r["node"]: r["label"]
           for r in label_propagation(e, seeds, iterations=3).collect()}
    assert got == {1: 7, 2: 7, 3: 7}


# -------------------------------------------- group_quantiles


def test_group_quantiles_matches_numpy(spark):
    from table_computing_spark import functions as tcf

    rng = np.random.default_rng(11)
    rows = [(k, float(v)) for k in ("a", "b")
            for v in rng.uniform(0, 1000, size=137 if k == "a" else 40)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {r["k"]: r for r in tcf.group_quantiles(
        df, "v", ["k"], qs=(0.25, 0.5, 0.9)).collect()}
    import numpy as _np

    for k in ("a", "b"):
        vals = _np.array([v for kk, v in rows if kk == k])
        assert got[k]["n"] == len(vals)
        for q, col in ((0.25, "q25"), (0.5, "q50"), (0.9, "q90")):
            want = float(_np.quantile(vals, q))  # numpy default = type 7
            assert got[k][col] == pytest.approx(want, abs=1e-6), (k, col)


def test_group_quantiles_single_row_group(spark):
    from table_computing_spark import functions as tcf

    df = spark.createDataFrame([("x", 42.0)], "k string, v double")
    r = tcf.group_quantiles(df, "v", ["k"]).collect()[0]
    assert (r["q25"], r["q50"], r["q75"]) == (42.0, 42.0, 42.0)


# -------------------------------------------------- logreg_gd


def test_logreg_gd_matches_numpy_and_separates(spark):
    from table_computing_spark.operators.classify import logreg_gd

    rng = np.random.default_rng(3)
    x1 = rng.normal(0, 1, 400)
    x2 = rng.normal(0, 1, 400)
    y = (x1 + 0.5 * x2 + rng.normal(0, 0.3, 400) > 0).astype(float)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)],
        "x1 double, x2 double, y double",
    )
    got = logreg_gd(df, ["x1", "x2"], "y", iterations=5, lr=0.5).collect()[0]

    # reference: identical nano-rounded full-batch GD in numpy
    w = np.zeros(2)
    b = 0.0
    X = np.stack([x1, x2], axis=1)
    n = len(y)
    for _ in range(5):
        p = 1.0 / (1.0 + np.exp(-(b + X @ w)))
        resid = p - y
        g = [
            np.sum(np.floor(resid * X[:, j] * 1e9 + 0.5).astype(np.int64))
            for j in range(2)
        ]
        gb = np.sum(np.floor(resid * 1e9 + 0.5).astype(np.int64))
        for j in range(2):
            w[j] -= 0.5 * (g[j] / 1e9) / n
        b -= 0.5 * (gb / 1e9) / n
    assert got["n"] == n
    assert got["w_x1"] == pytest.approx(w[0], abs=2e-6)
    assert got["w_x2"] == pytest.approx(w[1], abs=2e-6)
    assert got["bias"] == pytest.approx(b, abs=2e-6)
    # and the fit actually learned the generating direction
    assert got["w_x1"] > 0.3 and got["w_x2"] > 0.1


# ------------------------------------------------------- k-core


def test_kcore_peel_golden(spark):
    from table_computing_spark.operators.graph import kcore_peel

    # K4 on {1,2,3,4} (3-core) + a pendant path 4-5-6 that must peel off
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = k4 + [(4, 5), (5, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["degree"] for r in kcore_peel(df, k=3, rounds=4).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # k=2: the path still peels (5 and 6 drop; 4-5 edge dies with them)
    got2 = {r["node"]: r["degree"] for r in kcore_peel(df, k=2, rounds=4).collect()}
    assert set(got2) == {1, 2, 3, 4}
    # convergence on the q_kcore gated graph shape: rounds vs rounds+2
    a = sorted(map(tuple, kcore_peel(df, k=3, rounds=4).collect()))
    b = sorted(map(tuple, kcore_peel(df, k=3, rounds=6).collect()))
    assert a == b


# ----------------------------------------------- assortativity


def test_degree_assortativity_signs(spark):
    from table_computing_spark.operators.graph import degree_assortativity

    # star graph: hub degree n, leaves degree 1 -> strongly negative
    star = [(0, i) for i in range(1, 12)]
    d1 = spark.createDataFrame(star, "src long, dst long")
    r1 = degree_assortativity(d1).collect()[0]
    assert r1["assortativity"] < -0.9
    assert r1["n_directed_edges"] == 2 * len(star)
    # two disjoint cliques of different sizes: within-clique degrees are
    # equal on every edge -> correlation +1 across the mixture? (all
    # edges connect equal degrees -> du == dv on every row -> corr = 1)
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    k3 = [(a, b) for a in range(10, 13) for b in range(a + 1, 13)]
    d2 = spark.createDataFrame(k4 + k3, "src long, dst long")
    r2 = degree_assortativity(d2).collect()[0]
    assert r2["assortativity"] == pytest.approx(1.0, abs=1e-6)


# ------------------------------------------------------ bfs_hops


def test_bfs_hops_golden(spark):
    from table_computing_spark.operators.graph import bfs_hops

    # path 1-2-3-4-5 plus branch 2-6; seeds {1}
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 6)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(e, seeds, max_hops=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 6: 2, 4: 3}  # 5 is 4 hops: excluded
    # two seeds: min over seeds wins
    seeds2 = spark.createDataFrame([(1,), (5,)], "node long")
    got2 = {r["node"]: r["hops"] for r in bfs_hops(e, seeds2, max_hops=2).collect()}
    assert got2 == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2, 6: 2}


# ------------------------------------------------------- benford


def test_benford_report_digits_and_chi2(spark):
    from table_computing_spark.operators.drift import benford_report

    # crafted values: leading digits known; zeros/nulls excluded
    rows = [
        ("g", 123.4), ("g", 0.045), ("g", 1999.0), ("g", 0.0), ("g", None),
        ("g", 234.0), ("g", 0.29), ("g", 911.0),
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    out = {r["digit"]: r for r in benford_report(df, "v", ["k"]).collect()}
    # digits: 1 (123.4), 4 (0.045), 1 (1999), 2 (234), 2 (0.29), 9 (911)
    assert {d: out[d]["n_digit"] for d in out} == {1: 2, 2: 2, 4: 1, 9: 1}
    assert all(r["n"] == 6 for r in out.values())
    import math

    for d, r in out.items():
        assert r["expected"] == round(math.log10(1 + 1 / d), 6)
        assert r["observed"] == round(r["n_digit"] / 6, 6)
    # chi2 identical on every row of the group
    assert len({r["chi2"] for r in out.values()}) == 1


def test_benford_uniform_digits_deviate(spark):
    from table_computing_spark.operators.drift import benford_report

    import math

    # uniform first digits 1..9 (anti-Benford): chi2 ~ n * sum term
    rows = [(float(d) * 10 ** (i % 3),) for d in range(1, 10) for i in range(30)]
    df = spark.createDataFrame(rows, "v double")
    out = benford_report(df, "v").collect()
    n = 270
    want = n * sum(
        (1 / 9 - math.log10(1 + 1 / d)) ** 2 / math.log10(1 + 1 / d)
        for d in range(1, 10)
    )
    assert out[0]["chi2"] == pytest.approx(want, rel=1e-4)


# ----------------------------------------------------------- rfm


def test_rfm_quintiles(spark):
    import __spark_entry__ as m

    out = m.queries()["q_rfm"](spark, "/root/testdata/sf0.001").collect()
    rs = [r["r"] for r in out]
    assert set(rs) <= {1, 2, 3, 4, 5}
    # quintiles balanced within 1
    from collections import Counter

    for col in ("r", "f", "m"):
        c = Counter(r[col] for r in out)
        assert max(c.values()) - min(c.values()) <= 1
    # segment code composes the three digits
    for r in out[:50]:
        assert r["segment"] == r["r"] * 100 + r["f"] * 10 + r["m"]


# -------------------------------------------- bounded_running_balance


def test_bounded_running_balance_replay(spark):
    from table_computing_spark.operators.temporal import bounded_running_balance

    rows = [
        # key a: 10 -> clamp(10-25)=0 (stockout) -> 3 -> clamp(3-4)=0
        # (stockout) -> 6
        ("a", 1, 10.0), ("a", 2, -25.0), ("a", 3, 3.0),
        ("a", 4, -4.0), ("a", 5, 6.0),
        # key b: never clamps
        ("b", 1, 5.0), ("b", 2, -2.5),
    ]
    df = spark.createDataFrame(rows, "k string, t long, delta double")
    got = {r["k"]: (r["n_events"], r["final_balance"], r["n_stockouts"])
           for r in bounded_running_balance(df, ["k"], ["t"], "delta").collect()}
    assert got["a"] == (5, 6.0, 2)
    assert got["b"] == (2, 2.5, 0)

    # randomized agreement with a pure-python replay (integer cents)
    import random

    rnd = random.Random(9)
    data = [("x", i, round(rnd.uniform(-30, 20), 2)) for i in range(200)]
    df2 = spark.createDataFrame(data, "k string, t long, delta double")
    r = bounded_running_balance(df2, ["k"], ["t"], "delta").collect()[0]
    bal, n = 0, 0
    for _, _, d in data:
        dc = int(round(d * 100))
        if bal + dc < 0:
            n += 1
        bal = max(bal + dc, 0)
    assert (r["n_events"], r["final_balance"], r["n_stockouts"]) == (
        200, round(bal / 100, 2), n
    )
