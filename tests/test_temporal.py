"""As-of and range join tests — pandas merge_asof is the local oracle
(the DuckDB ASOF JOIN oracle runs in the driver gate via
__spark_entry__ q_asof_join)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from table_computing_spark.operators.temporal import asof_join, range_join


def test_asof_join_matches_pandas_merge_asof(spark):
    quotes = [
        ("A", 1, 10.0), ("A", 5, 11.0), ("A", 9, 12.0),
        ("B", 2, 20.0), ("B", 8, 21.0),
    ]
    trades = [
        ("A", 0, 100), ("A", 1, 101), ("A", 6, 102), ("A", 12, 103),
        ("B", 2, 200), ("B", 7, 201), ("C", 5, 300),
    ]
    qdf = spark.createDataFrame(quotes, "k string, t bigint, px double")
    tdf = spark.createDataFrame(trades, "k string, t bigint, qty int")

    got = asof_join(
        tdf, qdf, on=["k"], left_time="t", right_time="t", how="left"
    )
    pd_exp = pd.merge_asof(
        pd.DataFrame(trades, columns=["k", "t", "qty"]).sort_values("t"),
        pd.DataFrame(quotes, columns=["k", "t", "px"]).sort_values("t"),
        on="t", by="k", direction="backward",
    )
    exp = {
        (r.k, r.t): (None if pd.isna(r.px) else r.px) for r in pd_exp.itertuples()
    }
    rows = {(r["k"], r["t"]): r["px"] for r in got.collect()}
    assert rows == exp

    inner = asof_join(tdf, qdf, on=["k"], left_time="t", right_time="t", how="inner")
    assert inner.count() == sum(1 for v in exp.values() if v is not None)


def test_range_join_equals_naive(spark):
    points = spark.range(0, 200).select(F.col("id").alias("pid"), (F.col("id") * 3).alias("x"))
    intervals = spark.createDataFrame(
        [(0, 10, 50), (1, 45, 46), (2, 40, 300), (3, 590, 600), (4, 700, 800)],
        "iid int, lo bigint, hi bigint",
    )
    got = range_join(points, intervals, "x", "lo", "hi", bucket_width=50.0)
    naive = points.join(
        intervals, (F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi"))
    )
    key = lambda df: sorted((r["pid"], r["iid"]) for r in df.collect())
    assert key(got) == key(naive)
    assert got.count() > 0


def test_resample_ffill_grid_and_fill(spark):
    """Tick grid covers floor(first/step)*step..last inclusive per key;
    every tick carries the latest observation at-or-before it; ticks
    before the first observation carry null."""
    from pyspark.sql import functions as F

    from table_computing_spark.operators.temporal import resample_ffill

    rows = [
        (1, 130, 10.0), (1, 250, 11.0), (1, 380, 12.0),  # span 100..380
        (2, 100, 5.0),                                    # single obs
    ]
    obs = spark.createDataFrame(rows, "k long, t long, v double")
    out = resample_ffill(obs, "k", "t", step=100, value_cols=["v"])
    got = {(r["k"], r["tick"]): r["v"] for r in out.collect()}
    assert got == {
        (1, 100): None,          # before first obs: nothing to hold
        (1, 200): 10.0,
        (1, 300): 11.0,
        (2, 100): 5.0,
    }


def test_session_capped_gap_and_cap_splits(spark):
    """Golden: events at t=0,10,20 (gap session A), t=100 (new gap
    session), then a long run 200,230,260,290 with cap 50 must
    sub-split at 50-unit boundaries from the session's first event."""
    from table_computing_spark.operators.windows import session_capped

    rows = [(1, t) for t in [0, 10, 20, 100, 200, 230, 260, 290]]
    df = spark.createDataFrame(rows, "k long, t long")
    out = session_capped(df, "t", ["k"], gap_ms=50, cap_ms=50)
    got = {r["t"]: (r["session_id"], r["session_start"]) for r in out.collect()}
    assert got[0] == ("1_0", 0) and got[10] == ("1_0", 0) and got[20] == ("1_0", 0)
    assert got[100] == ("2_0", 100)
    # gap session 3 starts at 200; cap 50 → [200,250) sub 0, [250,300) sub 1
    assert got[200] == ("3_0", 200) and got[230] == ("3_0", 200)
    assert got[260] == ("3_1", 260) and got[290] == ("3_1", 260)


def test_ema_trailing_matches_pandas_ewm(spark):
    """Per-key trailing-5 renormalized EMA equals pandas
    ewm(alpha=0.5, min_periods=1).mean() restricted to a 5-row
    history (computed per row from the last 5 values)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from table_computing_spark.operators.temporal import ema_trailing

    rows = [(1, t, float(v)) for t, v in zip(range(8), [5, 1, 9, 2, 7, 7, 3, 8])]
    rows += [(2, 0, 4.0), (2, 1, 6.0)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    got = {
        (r["k"], r["t"]): r["ema"]
        for r in ema_trailing(df, ["k"], "t", "v", alpha=0.5, k=5).collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "t", "v"]).sort_values(["k", "t"])
    for key, grp in pdf.groupby("k"):
        vals = list(grp["v"])
        for i, t in enumerate(grp["t"]):
            hist = vals[max(0, i - 4) : i + 1][::-1]  # newest first
            ws = [0.5**j for j in range(len(hist))]
            want = round(sum(h * w for h, w in zip(hist, ws)) / sum(ws), 6)
            assert abs(got[(key, t)] - want) < 1e-9, (key, t)


def test_rolling_corr_matches_pandas_and_is_partition_invariant(spark):
    """Trailing-20 exact-moment rolling correlation equals pandas
    rolling(20, min_periods=2).corr() within rounding, and is
    IDENTICAL (not just close) under different input partitionings —
    the property built-in windowed corr() cannot give."""
    import pandas as pd
    from pyspark.sql import functions as F

    from table_computing_spark.operators.temporal import rolling_corr

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber",
        "l_quantity", "l_extendedprice",
    ).withColumn("ship_ms", F.unix_millis(F.col("l_shipdate").cast("timestamp")))
    order = ["ship_ms", "l_orderkey", "l_linenumber"]
    out = rolling_corr(
        li, ["l_suppkey"], order, "l_quantity", "l_extendedprice",
        n=20, x_scale=0, y_scale=2,
    )
    key = ["l_suppkey"] + order
    got = {tuple(r[k] for k in key): r["roll_corr"] for r in out.collect()}
    # (repartition-invariance lives in tests/test_invariance.py now)

    pdf = li.toPandas().sort_values(["l_suppkey"] + order).reset_index(drop=True)
    for supp, grp in pdf.groupby("l_suppkey"):
        x = grp["l_quantity"].round(0)
        y = (grp["l_extendedprice"] * 100).round(0) / 100
        want = x.rolling(20, min_periods=2).corr(y)
        for i, (idx, row) in enumerate(grp.iterrows()):
            k = (supp, row["ship_ms"], row["l_orderkey"], row["l_linenumber"])
            w = want.iloc[i]
            g = got[k]
            if pd.isna(w):
                # pandas emits NaN where we emit NULL (m<2 or zero var)
                assert g is None
            else:
                assert g is not None and abs(g - round(w, 6)) <= 2e-6, (k, g, w)


def test_funnel_within_deadline_changes_outcome(spark):
    """Golden: user 1 completes all steps within deadline; user 2's
    click lands after the deadline (depth 1 even though a click
    EXISTS); user 3 has a too-late click then no purchase (depth 1);
    user 4 clicks in time but purchases late (depth 2); first-
    completion anchors later steps at the EARLIEST qualifying event."""
    from table_computing_spark.operators.temporal import funnel_within

    rows = [
        (1, "view", 0), (1, "click", 50), (1, "purchase", 120),
        (2, "view", 0), (2, "click", 500),
        (3, "view", 0), (3, "click", 900),
        (4, "view", 0), (4, "click", 10), (4, "purchase", 5000),
        # user 5: two clicks — the EARLY one anchors the purchase
        # deadline, so the purchase at 140 (within 100 of click@60,
        # not of click@90) must still count
        (5, "view", 0), (5, "click", 60), (5, "click", 90),
        (5, "purchase", 140),
        (6, "click", 5),  # click with no view: not in funnel at all
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ms long")
    out = funnel_within(
        df, ["user_id"], "ms", "event_type",
        ["view", "click", "purchase"], within_ms=100,
    )
    got = {r["user_id"]: (r["t_1"], r["t_2"], r["t_3"], r["completed_depth"])
           for r in out.collect()}
    assert got == {
        1: (0, 50, 120, 3),
        2: (0, None, None, 1),
        3: (0, None, None, 1),
        4: (0, 10, None, 2),
        5: (0, 60, 140, 3),
    }


def test_path_counts_golden_and_cross_key_isolation(spark):
    """Paths never cross key boundaries; rows without depth-1
    successors emit nothing; ties in count order break by path."""
    from table_computing_spark.operators.temporal import path_counts

    rows = [
        (1, 0, "a"), (1, 1, "b"), (1, 2, "c"), (1, 3, "a"),   # a>b>c, b>c>a
        (2, 0, "a"), (2, 1, "b"), (2, 2, "c"),                # a>b>c
        (3, 0, "x"), (3, 1, "y"),                             # too short
    ]
    df = spark.createDataFrame(rows, "k long, t long, s string")
    got = [
        (r["path"], r["n"])
        for r in path_counts(df, ["k"], ["t"], "s", depth=3, top_k=10).collect()
    ]
    assert got == [("a>b>c", 2), ("b>c>a", 1)]


def test_asof_join_forward_matches_pandas(spark):
    """direction='forward' == pandas merge_asof(direction='forward')
    on unique (key, time) right rows, inclusive on equal times; 'left'
    keeps unmatched rows."""
    import pandas as pd

    from table_computing_spark.operators.temporal import asof_join

    left = [(1, 10), (1, 25), (1, 31), (2, 5), (2, 99)]
    right = [(1, 10, 100.0), (1, 30, 300.0), (2, 7, 70.0)]
    L = spark.createDataFrame(left, "k long, t long")
    R = spark.createDataFrame(right, "k long, t long, px double")
    got = {
        (r["k"], r["t"]): r["px"]
        for r in asof_join(
            L, R, ["k"], "t", "t", how="left", direction="forward"
        ).collect()
    }
    lp = pd.DataFrame(left, columns=["k", "t"]).sort_values("t")
    rp = pd.DataFrame(right, columns=["k", "t2", "px"]).sort_values("t2")
    m = pd.merge_asof(lp, rp, left_on="t", right_on="t2", by="k",
                      direction="forward")
    want = {
        (int(r.k), int(r.t)): (None if pd.isna(r.px) else float(r.px))
        for r in m.itertuples()
    }
    assert got == want
    inner = asof_join(L, R, ["k"], "t", "t", how="inner",
                      direction="forward").count()
    assert inner == sum(1 for v in want.values() if v is not None)
