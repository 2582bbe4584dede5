"""Round-11 operator tests: the eps advisor (r10 verdict task 5), the
r10 advice fixes that changed behavior, and new r11 operators."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _hash_cloud(spark, n: int):
    """The sweep fixture shape (tools/scaling_sweep_r10.py): pseudo-
    random points on a FIXED 100000x100000 extent — more rows = denser,
    the exact regime where a fixed eps OOMs the eps-graph."""
    return spark.range(1, n + 1).select(
        F.col("id"),
        ((F.col("id") * 7919) % 100000).alias("x"),
        ((F.col("id") * 104729) % 100000).alias("y"),
    )


def test_dbscan_eps_estimate_tracks_inverse_sqrt_density(spark):
    """The advisor must encode the adjudicated sizing rule (PLANS.md
    r10): eps ∝ 1/sqrt(density) at fixed extent — the same 1/sqrt(10)
    step the r10 sweep applied by hand (eps 5000 @ s0.1 -> 1581 @ s1)."""
    from table_computing_spark.operators.spatial import dbscan_eps_estimate

    e_small = dbscan_eps_estimate(_hash_cloud(spark, 1_500), "x", "y", min_pts=8)
    e_big = dbscan_eps_estimate(_hash_cloud(spark, 15_000), "x", "y", min_pts=8)
    # closed form on the fixture: sqrt(k * area / (pi * N))
    expect_small = math.sqrt(8 * 100000 * 100000 / (math.pi * 1_500))
    # the empirical bounding box is slightly inside the full extent
    assert abs(e_small - expect_small) / expect_small < 0.02
    ratio = e_small / e_big
    assert abs(ratio - math.sqrt(10)) < 0.2, (e_small, e_big)


def test_grid_dbscan_eps_auto_runs_and_matches_explicit(spark):
    from table_computing_spark.operators.spatial import (
        dbscan_eps_estimate,
        grid_dbscan,
    )

    pts = _hash_cloud(spark, 400)
    eps = dbscan_eps_estimate(pts, "x", "y", min_pts=4)
    auto = grid_dbscan(pts, "id", "x", "y", eps="auto", min_pts=4)
    manual = grid_dbscan(pts, "id", "x", "y", eps=eps, min_pts=4)
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, manual.collect()))


def test_js_divergence_empty_side_raises(spark):
    """r10 advice: an empty side used to return a silently all-NULL
    report; it must fail loudly like srm_check/diff_in_diff."""
    from table_computing_spark.operators.drift import js_divergence

    old = spark.range(10).select((F.col("id") * 1.0).alias("v"))
    new = spark.range(0).select((F.col("id") * 1.0).alias("v"))
    with pytest.raises(ValueError, match="js_divergence"):
        js_divergence(old, new, "v", 0.0, 10.0, bins=4)
    # all-NULL counts as empty too (buckets clamp, so only non-null
    # row count can be zero)
    nulls = spark.range(5).select(F.lit(None).cast("double").alias("v"))
    with pytest.raises(ValueError, match="js_divergence"):
        js_divergence(old, nulls, "v", 0.0, 10.0, bins=4)


def test_binpack_bin_is_exact_integer_division(spark):
    """r10 advice: bin must come from long `div`, not a double detour —
    exactness above 2^53 cumulative bytes is the documented contract."""
    from table_computing_spark.sources.compaction import binpack_plan

    big = 1 << 55  # above double's exact-integer range
    files = spark.createDataFrame(
        [("p", f"f{i}", big) for i in range(4)],
        "part string, name string, sz long",
    )
    plan = binpack_plan(files, ["part"], name_col="name", size_col="sz",
                        target_bytes=big + 1)
    rows = {r["name"]: (r["bin"], r["offset"]) for r in plan.collect()}
    # offsets are 0, big, 2*big, 3*big; exact division by big+1 gives
    # bins 0, 0, 1, 2 — a double detour would misplace the boundaries
    assert [rows[f"f{i}"][1] for i in range(4)] == [0, big, 2 * big, 3 * big]
    assert [rows[f"f{i}"][0] for i in range(4)] == [0, 0, 1, 2]
