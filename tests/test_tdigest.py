"""t-digest mergeable quantile sketch (operators/tdigest.py).

Accuracy claims are rank-band claims: an estimate for quantile q must
lie between the exact order statistics at ranks (q-eps)(n-1) and
(q+eps)(n-1). The k0 construction bounds two-level rank error at
1/delta, so eps is asserted at 2/delta — double the theoretical bound,
still far tighter than the 1% band the oracle query uses.
"""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from table_computing_spark.operators import tdigest as td


def _band_ok(sorted_vals: np.ndarray, q: float, est: float, eps: float) -> bool:
    n = sorted_vals.size
    lo = sorted_vals[max(0, int(math.floor((q - eps) * (n - 1))))]
    hi = sorted_vals[min(n - 1, int(math.ceil((q + eps) * (n - 1))))]
    return lo <= est <= hi


QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def test_tdigest_rank_band_ungrouped(spark):
    rng = np.random.default_rng(7)
    vals = np.exp(rng.normal(5, 2, size=50_000))  # heavy-tailed
    df = spark.createDataFrame(
        [(float(v),) for v in vals], "x double"
    ).repartition(8)
    sk = td.tdigest_sketch(df, "x", delta=400)
    est = {
        r["q"]: r["est"] for r in td.tdigest_quantiles(sk, QS).collect()
    }
    s = np.sort(vals)
    for q in QS:
        assert _band_ok(s, q, est[q], eps=2 / 400), (q, est[q])


def test_tdigest_extremes_are_exact(spark):
    vals = [float(v) for v in range(1000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(4)
    sk = td.tdigest_sketch(df, "x", delta=100)
    row = sk.first()
    assert row["td_min"] == 0.0 and row["td_max"] == 999.0
    assert row["td_n"] == 1000
    est = {r["q"]: r["est"] for r in td.tdigest_quantiles(sk, [0.0, 1.0]).collect()}
    assert est[0.0] == 0.0 and est[1.0] == 999.0


def test_tdigest_grouped_matches_numpy_band(spark):
    rng = np.random.default_rng(11)
    rows = []
    data = {}
    for g in ("a", "b", "c"):
        v = rng.gamma(2.0, 10.0, size=8000)
        data[g] = np.sort(v)
        rows += [(g, float(x)) for x in v]
    df = spark.createDataFrame(rows, "g string, x double").repartition(8)
    sk = td.tdigest_sketch(df, "x", delta=200, group_cols=["g"])
    assert sk.count() == 3
    out = td.tdigest_quantiles(sk, [0.25, 0.5, 0.9], group_cols=["g"]).collect()
    assert len(out) == 9
    for r in out:
        assert _band_ok(data[r["g"]], r["q"], r["est"], eps=2 / 200)


def test_merge_sketches_incremental(spark):
    rng = np.random.default_rng(3)
    a = rng.normal(0, 1, size=20_000)
    b = rng.normal(4, 1, size=20_000)  # shifted second batch
    da = spark.createDataFrame([(float(v),) for v in a], "x double").repartition(4)
    db = spark.createDataFrame([(float(v),) for v in b], "x double").repartition(4)
    merged = td.merge_sketches(
        td.tdigest_sketch(da, "x", delta=400),
        td.tdigest_sketch(db, "x", delta=400),
        delta=400,
    )
    row = merged.first()
    assert row["td_n"] == 40_000
    s = np.sort(np.concatenate([a, b]))
    est = {r["q"]: r["est"] for r in td.tdigest_quantiles(merged, QS).collect()}
    # three merge levels now: allow 3/delta
    for q in QS:
        assert _band_ok(s, q, est[q], eps=3 / 400), (q, est[q])


def test_tdigest_deterministic(spark):
    rng = np.random.default_rng(5)
    vals = rng.uniform(0, 100, size=10_000)
    df = spark.createDataFrame([(float(v),) for v in vals], "x double").repartition(8)
    r1 = td.tdigest_sketch(df, "x", delta=100).first()
    r2 = td.tdigest_sketch(df, "x", delta=100).first()
    assert r1["td_means"] == r2["td_means"]
    assert r1["td_weights"] == r2["td_weights"]


def test_tdigest_nulls_dropped_and_all_null_empty(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (2.0,), (None,), (3.0,)], "x double"
    )
    row = td.tdigest_sketch(df, "x", delta=50).first()
    assert row["td_n"] == 3 and row["td_min"] == 1.0 and row["td_max"] == 3.0
    allnull = spark.createDataFrame([(None,), (None,)], "x double")
    assert td.tdigest_sketch(allnull, "x", delta=50).count() == 0


def test_centroid_count_bounded(spark):
    vals = [float(v) for v in range(100_000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(16)
    row = td.tdigest_sketch(df, "x", delta=100).first()
    # k0 compaction: at most ~2*delta centroids regardless of n
    assert len(row["td_means"]) <= 2 * 100 + 2
    assert sum(row["td_weights"]) == 100_000
