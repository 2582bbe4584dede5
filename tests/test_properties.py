"""Property-based tests (hypothesis) — randomized semantics checks the
reference's suite lacks entirely (SURVEY §5: assert-based unit tests
only). Each property pins an operator against an independent naive
implementation on generated data. Example counts stay small: every
example spins Spark jobs."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from table_computing_spark.operators.temporal import asof_join, range_join
from table_computing_spark.table import Table

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys = st.sampled_from(["a", "b", "c"])
times = st.integers(min_value=0, max_value=50)


@_SETTINGS
@given(
    left=st.lists(st.tuples(keys, times), min_size=1, max_size=15),
    right=st.lists(st.tuples(keys, times), min_size=0, max_size=15),
)
def test_asof_join_property(spark, left, right):
    """asof_join == per-row 'latest right at-or-before left' scan."""
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k string, t bigint, lid int"
    )
    # unique (k, t) on the right: keep the max payload per key/time
    rmap: dict[tuple, int] = {}
    for i, (k, t) in enumerate(right):
        rmap[(k, t)] = max(rmap.get((k, t), -1), i * 10)
    rdf = spark.createDataFrame(
        [(k, t, v) for (k, t), v in rmap.items()] or [("zz", -1, -1)],
        "k string, t bigint, rv int",
    )
    got = {
        (r["k"], r["t"], r["lid"]): r["rv"]
        for r in asof_join(
            ldf, rdf, on=["k"], left_time="t", right_time="t", how="left"
        ).collect()
    }
    for i, (k, t) in enumerate(left):
        # latest right time at-or-before t wins
        best_t = max((rt for (rk, rt) in rmap if rk == k and rt <= t), default=None)
        expected = rmap[(k, best_t)] if best_t is not None else None
        assert got[(k, t, i)] == expected, (k, t, got[(k, t, i)], expected)


@_SETTINGS
@given(
    points=st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=20),
    intervals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),
            st.integers(min_value=1, max_value=60),
        ),
        min_size=1,
        max_size=8,
    ),
    width=st.sampled_from([7.0, 25.0, 100.0]),
)
def test_range_join_property(spark, points, intervals, width):
    """range_join == naive inequality join for any bucket width."""
    pdf = spark.createDataFrame(
        [(i, x) for i, x in enumerate(points)], "pid int, x bigint"
    )
    idf = spark.createDataFrame(
        [(i, lo, lo + span) for i, (lo, span) in enumerate(intervals)],
        "iid int, lo bigint, hi bigint",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(pdf, idf, "x", "lo", "hi", bucket_width=width).collect()
    )
    naive = sorted(
        (i, j)
        for i, x in enumerate(points)
        for j, (lo, span) in enumerate(intervals)
        if lo <= x < lo + span
    )
    assert got == naive


_words = st.sampled_from(["aa", "bb", "cc", "dd"])
_line = st.lists(_words, min_size=0, max_size=6).map(" ".join)
_doc = st.lists(_line, min_size=0, max_size=4).map("\n".join)


@_SETTINGS
@given(docs=st.lists(_doc, min_size=1, max_size=6))
def test_repetition_metrics_property(spark, docs):
    """repetition_metrics == a direct python computation of dup-line /
    dup-bigram / top-bigram fractions, including empty docs, one-token
    docs, and docs that are all blank lines."""
    from table_computing_spark.operators.text import repetition_metrics

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["dup_line_frac"], r["dup_bigram_frac"], r["top_bigram_frac"], r["n_bigrams"]
        )
        for r in repetition_metrics(df).collect()
    }
    assert set(got) == set(range(len(docs)))
    for i, d in enumerate(docs):
        lines = [l for l in d.split("\n") if l != ""]
        dlf = round((len(lines) - len(set(lines))) / len(lines), 6) if lines else 0.0
        toks = d.lower().split()
        bgs = [(a, b) for a, b in zip(toks, toks[1:])]
        if bgs:
            counts: dict = {}
            for b in bgs:
                counts[b] = counts.get(b, 0) + 1
            dbf = round((len(bgs) - len(counts)) / len(bgs), 6)
            tbf = round(max(counts.values()) / len(bgs), 6)
        else:
            dbf = tbf = 0.0
        assert got[i] == (dlf, dbf, tbf, len(bgs)), (i, repr(d), got[i], (dlf, dbf, tbf))


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["x", "y"]), st.integers(-5, 5)),
        min_size=1,
        max_size=20,
    ),
    n=st.sampled_from([1, 3]),
)
def test_over_by_size_property(spark, rows, n):
    """Trailing count window == pandas rolling over the same order."""
    from table_computing_spark.operators import windows as tw

    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)], "k string, v bigint, rid int"
    )
    got = {
        r["rid"]: (r["tsum"], r["tn"])
        for r in tw.over_by_size(
            Table(df), ["k"], [F.col("rid").asc()], n=n,
            tsum=F.sum("v"), tn=F.count(F.lit(1)),
        ).df.collect()
    }
    pdf = pd.DataFrame([(k, v, i) for i, (k, v) in enumerate(rows)], columns=["k", "v", "rid"])
    for k, g in pdf.groupby("k"):
        roll = g.sort_values("rid")["v"].rolling(n, min_periods=1)
        for rid, s, c in zip(g.sort_values("rid")["rid"], roll.sum(), roll.count()):
            assert got[rid] == (int(s), int(c)), (k, rid)


@_SETTINGS
@given(
    data=st.lists(
        st.sampled_from([f"k{i}" for i in range(12)]), min_size=1, max_size=300
    ),
    k=st.integers(min_value=2, max_value=10),
    capacity=st.integers(min_value=1, max_value=6),
)
def test_heavy_hitters_exact_property(spark, data, k, capacity):
    """For ANY key distribution and any capacity >= k, two-phase
    Misra-Gries heavy hitters equals the brute-force count*k > n set —
    the candidate stage may prune aggressively but never loses a true
    heavy hitter."""
    from collections import Counter

    from table_computing_spark.operators import frequency

    cap = max(capacity, k)  # contract: capacity >= k
    df = spark.createDataFrame([(x,) for x in data], "key string").repartition(4)
    got = {
        r["key"]: r["cnt"]
        for r in frequency.heavy_hitters(df, "key", k=k, capacity=cap).collect()
    }
    c = Counter(data)
    want = {key: n for key, n in c.items() if n * k > len(data)}
    assert got == want


@_SETTINGS
@given(
    events=st.lists(
        st.tuples(st.sampled_from(["u1", "u2"]), times, st.sampled_from(["x", "y", "z"])),
        min_size=1,
        max_size=20,
    ),
)
def test_scd2_property(spark, events):
    """scd2_intervals == naive per-key run-length collapse; intervals
    tile each key's timeline with no gaps or overlaps."""
    from table_computing_spark.operators.cdc import scd2_intervals

    rows = [(k, t, i, a) for i, (k, t, a) in enumerate(events)]
    df = spark.createDataFrame(rows, "k string, t bigint, id bigint, attr string")
    got = sorted(
        (
            (r["k"], r["version"], r["attr"], r["valid_from"], r["valid_to"], r["n_rows"])
            for r in scd2_intervals(df, "k", "t", "id", "attr").collect()
        )
    )

    # naive: sort by (t, id) per key, collapse consecutive equal attrs
    expect = []
    bykey: dict = {}
    for k, t, i, a in rows:
        bykey.setdefault(k, []).append((t, i, a))
    for k, evs in bykey.items():
        evs.sort()
        runs = []
        for t, _, a in evs:
            if runs and runs[-1][0] == a:
                runs[-1][2] += 1
            else:
                runs.append([a, t, 1])
        for v, (a, t0, n) in enumerate(runs, 1):
            t_next = runs[v][1] if v < len(runs) else None
            expect.append((k, v, a, t0, t_next, n))
    assert got == sorted(expect)


@_SETTINGS
@given(
    fact_keys=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=40),
    dim_keys=st.lists(st.integers(min_value=0, max_value=300), min_size=0, max_size=15),
    bits=st.sampled_from([256, 4096]),
)
def test_bloom_join_property(spark, fact_keys, dim_keys, bits):
    """bloom_join == plain inner join for any data and any filter size
    (false positives are removed by the final join; no false negatives
    exist) — even at absurdly small bitmaps where FP rates are high."""
    from table_computing_spark.operators.bloomjoin import bloom_join

    fact = spark.createDataFrame([(k,) for k in fact_keys], "fk bigint")
    dim = spark.createDataFrame(
        [(k,) for k in set(dim_keys)] or [(-1,)], "dk bigint"
    )
    # plain-join truth from Spark itself
    expect = sorted(
        r["fk"] for r in fact.join(dim, fact.fk == dim.dk).select("fk").collect()
    )
    got = sorted(
        r["fk"]
        for r in bloom_join(fact, dim, "fk", "dk", num_bits=bits, num_hashes=2)
        .select("fk")
        .collect()
    )
    assert got == expect


@_SETTINGS
@given(
    events=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), times, st.integers(-50, 50)),
        min_size=1,
        max_size=25,
    ),
)
def test_ohlc_property(spark, events):
    """ohlc_bars == naive per-(key, bar) open/high/low/close scan."""
    from table_computing_spark.operators.temporal import ohlc_bars

    rows = [(k, t, i, float(v)) for i, (k, t, v) in enumerate(events)]
    df = spark.createDataFrame(rows, "k string, t bigint, id bigint, v double")
    got = {
        (r["k"], r["bar_start"]): (r["open"], r["high"], r["low"], r["close"], r["n_events"])
        for r in ohlc_bars(df, ["k"], "t", "id", "v", 10).collect()
    }
    bars: dict = {}
    for k, t, i, v in rows:
        bars.setdefault((k, (t // 10) * 10), []).append((t, i, v))
    expect = {}
    for key, obs in bars.items():
        obs.sort()
        vals = [v for _, _, v in obs]
        expect[key] = (obs[0][2], max(vals), min(vals), obs[-1][2], len(obs))
    assert got == expect


@_SETTINGS
@given(
    events=st.lists(
        st.tuples(st.sampled_from(["u1", "u2"]), times, st.sampled_from(["x", "y"])),
        min_size=1,
        max_size=25,
    ),
    gap=st.sampled_from([5, 20, 1000]),
)
def test_transition_counts_property(spark, events, gap):
    """transition_counts == naive lag scan with session-gap breaks."""
    from collections import Counter

    from table_computing_spark.operators.temporal import transition_counts

    rows = [(k, t, i, s) for i, (k, t, s) in enumerate(events)]
    df = spark.createDataFrame(rows, "k string, t bigint, id bigint, s string")
    got = {
        (r["from_state"], r["to_state"]): r["n_transitions"]
        for r in transition_counts(df, "k", "t", "id", "s", session_gap=gap).collect()
    }
    c: Counter = Counter()
    bykey: dict = {}
    for k, t, i, s in rows:
        bykey.setdefault(k, []).append((t, i, s))
    for evs in bykey.values():
        evs.sort()
        for (t0, _, s0), (t1, _, s1) in zip(evs, evs[1:]):
            if t1 - t0 <= gap:
                c[(s0, s1)] += 1
    assert got == dict(c)


@given(
    xs=st.lists(
        st.tuples(st.integers(0, 30), st.integers(-1000, 1000)),
        min_size=1,
        max_size=60,
    ),
    n=st.integers(1, 7),
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ntile_distributed_property(spark, xs, n):
    """ntile_distributed == pandas-computed SQL ntile on arbitrary
    small frames (ties everywhere, duplicate values, any n)."""
    from pyspark.sql import functions as F

    from table_computing_spark.operators.ids import ntile_distributed

    rows = [(i, v) for i, (v, _) in enumerate(xs)]
    d = spark.createDataFrame(rows, "rid long, v long")
    got = {
        r["rid"]: r["b"]
        for r in ntile_distributed(d, ["v", "rid"], n, out_col="b").collect()
    }
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    N = len(order)
    q, r = divmod(N, n)
    want = {}
    for pos, (rid, _) in enumerate(order):
        if pos < r * (q + 1):
            want[rid] = pos // (q + 1) + 1
        else:
            want[rid] = r + (pos - r * (q + 1)) // max(q, 1) + 1
    assert got == want


@given(
    xs=st.lists(
        st.tuples(st.integers(0, 10), st.integers(-50, 50)),
        min_size=1,
        max_size=50,
    ),
    exclusive=st.booleans(),
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_prefix_agg_property(spark, xs, exclusive):
    """prefix_agg running sum/min == the python prefix fold on
    arbitrary frames with heavy ties, both frames."""
    from pyspark.sql import functions as F

    from table_computing_spark.operators.prefix import prefix_agg

    rows = [(i, t, v) for i, (t, v) in enumerate(xs)]
    d = spark.createDataFrame(rows, "rid long, t long, v long").repartition(5)
    got = {
        r["rid"]: (r["s"], r["mn"])
        for r in prefix_agg(
            d, ["t", "rid"], {"s": ("sum", "v"), "mn": ("min", "v")},
            exclusive=exclusive, num_partitions=3,
        ).collect()
    }
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    want = {}
    run_s, run_m = 0, None
    seen = 0
    for rid, _, v in order:
        if exclusive:
            want[rid] = (run_s if seen else None, run_m)
        run_s += v
        run_m = v if run_m is None else min(run_m, v)
        seen += 1
        if not exclusive:
            want[rid] = (run_s, run_m)
    assert got == want


@_SETTINGS
@given(
    facts=st.lists(
        st.tuples(keys, times, st.integers(min_value=-9, max_value=9)),
        min_size=0,
        max_size=20,
    ),
    spine=st.lists(st.tuples(keys, times), min_size=1, max_size=12),
    win=st.integers(min_value=1, max_value=15),
)
def test_pit_features_property(spark, facts, spine, win):
    """pit_features == per-spine-row brute force: latest fact value
    at-or-before t, and count/sum over the half-open trailing window
    (t-win, t] — including the boundary exclusions, NULL group keys
    are absent here but empty-history rows must yield (None, 0, None)."""
    from table_computing_spark.operators.temporal import pit_features

    # unique (key, time) facts for a deterministic 'last' pick
    fmap: dict = {}
    for k, t, v in facts:
        fmap[(k, t)] = v
    frows = [(k, t, v) for (k, t), v in fmap.items()]
    fdf = spark.createDataFrame(frows, "k string, t long, v long").repartition(3)
    srows = [(i, k, t) for i, (k, t) in enumerate(spine)]
    sdf = spark.createDataFrame(srows, "sid long, k string, t long").repartition(2)
    out = pit_features(
        sdf, fdf, on=["k"], spine_time="t", fact_time="t", spine_id="sid",
        last_cols=["v"],
        trailing={"n": ("count", "v", win), "s": ("sum", "v", win)},
    )
    got = {r["sid"]: (r["v"], r["n"], r["s"]) for r in out.collect()}
    for sid, k, t in srows:
        hist = [(ft, fv) for (fk, ft), fv in fmap.items() if fk == k]
        before = [(ft, fv) for ft, fv in hist if ft <= t]
        last = max(before)[1] if before else None
        inwin = [fv for ft, fv in hist if t - win < ft <= t]
        want = (last, len(inwin), sum(inwin) if inwin else None)
        assert got[sid] == want, (sid, k, t, got[sid], want)


# --- r11 operator properties --------------------------------------------


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.floats(min_value=-100, max_value=100, allow_nan=False),
                  st.booleans()),
        min_size=2, max_size=25,
    ).filter(lambda r: 0 < sum(y for _, y in r) < len(r)),
)
def test_roc_auc_matches_naive_pair_count(spark, rows):
    """AUC == P(score⁺ > score⁻) + ½P(tie) by the probabilistic
    definition — check the rank-sum implementation against the naive
    O(P·N) pair count on generated data (ties included)."""
    from table_computing_spark.operators.evaluation import roc_auc

    df = spark.createDataFrame(
        [(float(s), int(y)) for s, y in rows], "s double, y int"
    )
    got = roc_auc(df, F.col("y"), F.col("s")).first()
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    naive = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    ) / (len(pos) * len(neg))
    assert got["auc"] == round(naive, 6)
    assert (got["n_pos"], got["n_neg"]) == (len(pos), len(neg))


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.sampled_from("ab"), st.sampled_from("ab")),
        min_size=1, max_size=20,
    ),
)
def test_classification_report_matches_naive(spark, rows):
    from collections import Counter

    from table_computing_spark.operators.evaluation import classification_report

    df = spark.createDataFrame(rows, "l string, p string")
    got = {
        r["clazz"]: r
        for r in classification_report(df, F.col("l"), F.col("p")).collect()
    }
    classes = sorted({l for l, _ in rows} | {p for _, p in rows})
    cnt = Counter(rows)

    def eng_round(x: float, n: int = 6) -> float:
        # Spark's F.round(double) goes through BigDecimal.valueOf —
        # the SHORTEST decimal repr — then HALF_UP; DuckDB matches.
        # Python's round() uses the true binary value and half-even,
        # which disagrees exactly on decimal .5 boundaries (e.g.
        # 857143/2/1e6 -> engines 0.428572, python 0.428571).
        from decimal import ROUND_HALF_UP, Decimal

        return float(Decimal(repr(x)).quantize(
            Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP))

    f1us = []
    for c in classes:
        tp = cnt[(c, c)]
        sup = sum(v for (l, _), v in cnt.items() if l == c)
        prd = sum(v for (_, p), v in cnt.items() if p == c)
        prec = tp / prd if prd else 0.0
        rec = tp / sup if sup else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        f1us.append(int(eng_round(f1 * 1e6, 0)))
        assert got[c]["support"] == sup
        assert got[c]["precision"] == eng_round(prec)
        assert got[c]["recall"] == eng_round(rec)
        assert got[c]["f1"] == eng_round(f1us[-1] / 1e6)
    assert got["__macro__"]["f1"] == eng_round(sum(f1us) / len(classes) / 1e6)


@_SETTINGS
@given(
    vals=st.lists(st.integers(min_value=-50, max_value=50),
                  min_size=2, max_size=20),
)
def test_changepoint_matches_naive_argmax(spark, vals):
    """The windowed prefix-sum gain must equal the O(n²) naive split
    scan, including the smallest-t tie rule."""
    from table_computing_spark.operators.temporal import changepoint_single

    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], "k string, o int, v int"
    )
    got = changepoint_single(df, ["k"], "o", F.col("v")).first()

    def sse(xs):
        if not xs:
            return 0.0
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs)

    total = sse(vals)
    best_gain, best_t = None, None
    for t in range(1, len(vals)):
        gain = round(total - sse(vals[:t]) - sse(vals[t:]), 6)
        if best_gain is None or gain > best_gain:
            best_gain, best_t = gain, t
    assert (got["split_t"], got["n"]) == (best_t, len(vals))
    assert abs(got["gain"] - best_gain) <= 2e-6  # fp op-order slack


@_SETTINGS
@given(
    edges=st.lists(
        st.tuples(st.integers(1, 8), st.integers(1, 8)).filter(
            lambda e: e[0] < e[1]  # increasing edges -> guaranteed DAG
        ),
        min_size=1, max_size=15,
    ),
)
def test_topo_layers_matches_longest_path(spark, edges):
    from table_computing_spark.operators.graph import topo_layers

    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["layer"] for r in topo_layers(df, rounds=8).collect()}
    nodes = {n for e in edges for n in e}
    depth = {n: 0 for n in nodes}
    for _ in range(len(nodes)):
        for s, d in edges:
            depth[d] = max(depth[d], depth[s] + 1)
    assert got == depth


@_SETTINGS
@given(
    edges=st.lists(
        st.tuples(st.integers(1, 10), st.integers(1, 10)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1, max_size=20,
    ),
)
def test_modularity_total_matches_naive_and_bounds(spark, edges):
    """Q total == the naive Σ_c [e_c/m − (d_c/2m)²] over canonical
    deduped edges, and sits inside Newman's [−0.5, 1) bounds."""
    from table_computing_spark.operators.graph import modularity

    canon = {(max(a, b), min(a, b)) for a, b in edges}
    nodes = sorted({n for e in canon for n in e})
    lab = {n: "even" if n % 2 == 0 else "odd" for n in nodes}
    e_df = spark.createDataFrame(sorted(canon), "src int, dst int")
    l_df = spark.createDataFrame(
        [(n, lab[n]) for n in nodes], "node int, label string"
    )
    rows = modularity(e_df, l_df).collect()
    m = len(canon)
    total_naive = 0.0
    for c in sorted({*lab.values()}):
        e_in = sum(1 for a, b in canon if lab[a] == c and lab[b] == c)
        deg = sum((lab[a] == c) + (lab[b] == c) for a, b in canon)
        total_naive += round((e_in / m - (deg / (2 * m)) ** 2) * 1e9) / 1e9
    got_total = rows[0]["q_total"]
    assert all(r["q_total"] == got_total for r in rows)
    assert abs(got_total - total_naive) <= 2e-6
    assert -0.5 - 1e-9 <= got_total < 1.0


@_SETTINGS
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=12),
        min_size=1, max_size=4,
    ),
)
def test_rouge_identical_pair_is_perfect(spark, texts):
    """ROUGE-N of a text against ITSELF is exactly 1/1 whenever the
    text has ≥ n tokens, and NULL otherwise — the clipped-count
    identity."""
    from table_computing_spark.operators.evaluation import rouge_n

    pairs = spark.createDataFrame(
        [(i, t, t) for i, t in enumerate(texts)], "pair int, c string, r string"
    )
    got = {r["pair"]: r for r in rouge_n(pairs, "c", "r", "pair", n=2).collect()}
    for i, t in enumerate(texts):
        toks = [w for w in t.lower().split() if w]
        n_bigrams = max(0, len(toks) - 1)
        assert got[i]["n_ref"] == n_bigrams == got[i]["n_cand"]
        if n_bigrams:
            assert got[i]["rouge_recall"] == 1.0 == got[i]["rouge_precision"]
        else:
            assert got[i]["rouge_recall"] is None


# ---------------------------------------------------------- r11b operators


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.booleans(), st.integers(min_value=0, max_value=9)),
        min_size=2,
        max_size=25,
    ).filter(lambda r: any(y for y, _ in r) and any(not y for y, _ in r))
)
def test_average_precision_matches_naive(spark, rows):
    """average_precision == the naive threshold-group scan (ties as one
    group), and sits in (0, 1]."""
    from table_computing_spark.operators.evaluation import average_precision

    df = spark.createDataFrame(
        [(int(y), float(s)) for y, s in rows], "y int, s double"
    )
    got = average_precision(df, F.col("y"), F.col("s")).collect()[0]
    # naive: group by score desc
    from collections import defaultdict

    g = defaultdict(lambda: [0, 0])
    for y, s in rows:
        g[s][0] += 1
        g[s][1] += int(y)
    P = sum(int(y) for y, _ in rows)
    cn = cp = 0
    ap = 0.0
    for s in sorted(g, reverse=True):
        n, p = g[s]
        cn += n
        cp += p
        ap += round(p * cp / cn * 1e9)
    ap = ap / 1e9 / P
    assert got["average_precision"] == round(ap, 6)
    assert 0.0 < got["average_precision"] <= 1.0


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=3,
        max_size=25,
    )
)
def test_spearman_bounds_and_symmetry(spark, rows):
    """rho ∈ [−1, 1] (or NULL on a constant side) and rho(x, y) ==
    rho(y, x)."""
    from table_computing_spark.operators.drift import spearman_corr

    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in rows], "x double, y double"
    )
    a = spearman_corr(df, F.col("x"), F.col("y")).collect()[0]["spearman_rho"]
    b = spearman_corr(df, F.col("y"), F.col("x")).collect()[0]["spearman_rho"]
    assert a == b
    if a is not None:
        assert -1.0 <= a <= 1.0


@_SETTINGS
@given(
    ps=st.lists(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
def test_bh_fdr_adjusted_p_properties(spark, ps):
    """p_adj is capped at 1, >= the raw p, and nondecreasing in rank
    (the step-up monotonization); rejection is downward-closed in
    rank."""
    from table_computing_spark.operators.drift import bh_fdr

    df = spark.createDataFrame(
        [(f"t{i}", float(p)) for i, p in enumerate(ps)], "id string, p double"
    )
    rows = sorted(
        bh_fdr(df, "id", F.col("p"), alpha=0.1).collect(),
        key=lambda r: r["bh_rank"],
    )
    prev_adj = 0.0
    seen_reject_end = False
    for r in rows:
        assert r["p_adj"] <= 1.0 + 1e-12
        assert r["p_adj"] >= r["p_value"] - 1e-9
        assert r["p_adj"] >= prev_adj - 1e-9  # nondecreasing
        prev_adj = r["p_adj"]
        if not r["rejected"]:
            seen_reject_end = True
        else:
            assert not seen_reject_end  # rejections form a prefix


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["u", "v", "w"]), st.booleans()),
        min_size=1,
        max_size=40,
    )
)
def test_wilson_lb_below_rate_and_in_unit_interval(spark, rows):
    from table_computing_spark.operators.rates import wilson_lower_bound

    df = spark.createDataFrame(rows, "k string, s boolean")
    for r in wilson_lower_bound(df, ["k"], F.col("s")).collect():
        assert 0.0 <= r["wilson_lb"] <= r["rate"] + 1e-9
        assert r["wilson_lb"] <= 1.0


@_SETTINGS
@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=30),
    trim=st.sampled_from([0.0, 0.1, 0.25]),
)
def test_trimmed_mean_between_extremes_and_matches_naive(spark, vals, trim):
    from table_computing_spark.operators.quantiles import trimmed_mean

    df = spark.createDataFrame([("k", v) for v in vals], "k string, v int")
    r = trimmed_mean(df, ["k"], F.col("v"), trim).collect()[0]
    s = sorted(vals)
    k = int(len(s) * trim)
    kept = s[k : len(s) - k]
    naive = sum(kept) / len(kept)
    assert r["trimmed_mean"] == round(naive, 6)
    assert min(vals) - 1e-9 <= r["trimmed_mean"] <= max(vals) + 1e-9


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)),
        min_size=4,
        max_size=25,
    )
)
def test_kendall_tau_antisymmetry(spark, rows):
    """Negating one ranking negates tau (C and D swap; tie terms are
    unchanged)."""
    from table_computing_spark.operators.evaluation import kendall_tau_grouped

    df = spark.createDataFrame(
        [("g", i, float(x), float(y)) for i, (x, y) in enumerate(rows)],
        "g string, it int, x double, y double",
    )
    a = kendall_tau_grouped(df, "g", "it", F.col("x"), F.col("y")).collect()[0]
    b = kendall_tau_grouped(df, "g", "it", F.col("x"), -F.col("y")).collect()[0]
    if a["tau_b"] is None:
        assert b["tau_b"] is None
    else:
        assert abs(a["tau_b"] + b["tau_b"]) < 2e-6
        assert -1.0 <= a["tau_b"] <= 1.0


@_SETTINGS
@given(
    groups=st.lists(
        st.tuples(st.integers(1, 12), st.integers(0, 12)),
        min_size=1,
        max_size=10,
    )
)
def test_pass_at_k_bounds_and_monotonicity(spark, groups):
    """pass@k ∈ [0, 1]; more correct samples at the same n never
    lowers it; c = 0 → 0, c = n → 1 (when n >= k)."""
    from table_computing_spark.operators.evaluation import pass_at_k

    rows = []
    for i, (n, c) in enumerate(groups):
        c = min(c, n)
        rows += [(f"p{i}", True)] * c + [(f"p{i}", False)] * (n - c)
    df = spark.createDataFrame(rows, "prob string, ok boolean")
    out = {r["problem"]: r for r in pass_at_k(df, "prob", F.col("ok"), 3).collect()}
    for i, (n, c) in enumerate(groups):
        c = min(c, n)
        v = out[f"p{i}"]["pass_at_k"]
        if n < 3:
            assert v is None
        else:
            assert 0.0 <= v <= 1.0
            if c == 0:
                assert v == 0.0
            if c == n:
                assert v == 1.0


# ------------------------------------------------------------------ r12 ops


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 30)),
        min_size=4,
        max_size=24,
    ),
)
def test_kendall_sort_equals_pairs_property(spark, rows):
    """The inversion-count path is bit-identical to the all-pairs
    classification on ANY generated tie structure (property form of
    the fixed adversarial pin)."""
    from table_computing_spark.operators.evaluation import kendall_tau_grouped

    df = spark.createDataFrame(
        [(g, i, float(v), float((v * 7) % 11)) for i, (g, v) in enumerate(rows)],
        "g string, it int, x double, y double",
    )
    args = (df, "g", "it", F.col("x"), F.col("y"))
    srt = sorted(
        (r["group"], r["n_items"], r["concordant"], r["discordant"], r["tau_b"])
        for r in kendall_tau_grouped(*args, method="sort").collect()
    )
    prs = sorted(
        (r["group"], r["n_items"], r["concordant"], r["discordant"], r["tau_b"])
        for r in kendall_tau_grouped(*args, method="pairs").collect()
    )
    assert srt == prs


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["u", "v"]), st.integers(0, 15)),
        min_size=4,
        max_size=20,
    ),
)
def test_kruskal_wallis_monotone_invariance(spark, rows):
    """A rank test must be invariant under any strictly monotone value
    transform: H(x) == H(3x + 7) exactly."""
    from table_computing_spark.operators.drift import kruskal_wallis

    df = spark.createDataFrame(rows, "g string, v int")
    h1 = kruskal_wallis(df, "g", F.col("v")).collect()[0]
    h2 = kruskal_wallis(
        df.select("g", (F.col("v") * 3 + 7).alias("v")), "g", F.col("v")
    ).collect()[0]
    assert (h1["h"], h1["h_adj"], h1["n"]) == (h2["h"], h2["h_adj"], h2["n"])


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["u", "v"]), st.integers(-20, 20)),
        min_size=4,
        max_size=20,
    ),
)
def test_anova_f_translation_invariance(spark, rows):
    """F is invariant under a common shift: F(x) == F(x + 13)."""
    from table_computing_spark.operators.drift import anova_f

    df = spark.createDataFrame(rows, "g string, v int")
    f1 = anova_f(df, "g", F.col("v")).collect()[0]
    f2 = anova_f(
        df.select("g", (F.col("v") + 13).alias("v")), "g", F.col("v")
    ).collect()[0]
    assert f1["f"] == f2["f"] and f1["n"] == f2["n"]


@_SETTINGS
@given(
    vals=st.lists(st.integers(0, 40), min_size=2, max_size=25),
)
def test_page_hinkley_nonnegative_and_alarm_consistency(spark, vals):
    """PH_t ≥ 0 always (m − running-min m); alarm ⇔ ph > λ at 6-decimal
    resolution; a constant series never alarms."""
    from table_computing_spark.operators.temporal import page_hinkley

    df = spark.createDataFrame(
        [("k", t, v) for t, v in enumerate(vals)], "g string, t int, v int"
    )
    out = page_hinkley(df, ["g"], "t", F.col("v"), lam=3.0).collect()
    for r in out:
        assert r["ph"] >= 0.0
        # rounded readout vs exact alarm can only disagree inside half
        # a micro of the threshold
        if r["ph"] > 3.0 + 1e-6:
            assert r["alarm"]
        if r["ph"] < 3.0 - 1e-6:
            assert not r["alarm"]
    const = spark.createDataFrame(
        [("k", t, 9) for t in range(6)], "g string, t int, v int"
    )
    assert all(
        not r["alarm"]
        for r in page_hinkley(const, ["g"], "t", F.col("v"), lam=0.001).collect()
    )


@_SETTINGS
@given(
    counts=st.lists(st.integers(1, 50), min_size=1, max_size=5),
    alpha=st.sampled_from([0.3, 0.5, 1.0]),
)
def test_temperature_weights_simplex_and_direction(spark, counts, alpha):
    """q sums to 1 (±nano staging); α < 1 boosts every below-average
    group (boost ≥ 1 iff p_raw ≤ max share); α = 1 is proportional."""
    from table_computing_spark.operators.sampling import temperature_weights

    rows = [(f"g{i}",) for i, c in enumerate(counts) for _ in range(c)]
    df = spark.createDataFrame(rows, "lang string")
    out = temperature_weights(df, "lang", alpha=alpha).collect()
    assert abs(sum(r["p_sampled"] for r in out) - 1.0) < 1e-5
    if alpha == 1.0:
        for r in out:
            assert abs(r["boost"] - 1.0) < 1e-5
    else:
        smallest = min(out, key=lambda r: r["n"])
        largest = max(out, key=lambda r: r["n"])
        assert smallest["boost"] >= largest["boost"] - 1e-9


@_SETTINGS
@given(
    rows=st.lists(st.tuples(st.booleans(), st.booleans()), min_size=2, max_size=30),
)
def test_matthews_swap_symmetry_and_bounds(spark, rows):
    """|MCC| ≤ 1; swapping label and prediction roles leaves MCC
    unchanged (the confusion matrix transposes, the formula is
    symmetric in FP↔FN)."""
    from table_computing_spark.operators.evaluation import matthews_corr

    df = spark.createDataFrame(rows, "y boolean, p boolean")
    m1 = matthews_corr(df, F.col("y"), F.col("p")).collect()[0]["mcc"]
    m2 = matthews_corr(df, F.col("p"), F.col("y")).collect()[0]["mcc"]
    assert m1 == m2
    if m1 is not None:
        assert -1.0 <= m1 <= 1.0


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 5), st.sampled_from(["r1", "r2", "r3"]),
                  st.sampled_from(["x", "y"])),
        min_size=2,
        max_size=25,
    ),
)
def test_krippendorff_rater_permutation_invariance(spark, rows):
    """alpha ignores WHICH rater said what — permuting rater ids never
    changes it; alpha ≤ 1 always."""
    from table_computing_spark.operators.evaluation import krippendorff_alpha

    dedup = {(u, r): c for u, r, c in rows}  # one rating per (unit, rater)
    rows = [(u, r, c) for (u, r), c in dedup.items()]
    df = spark.createDataFrame(rows, "u int, r string, c string")
    perm = {"r1": "r3", "r2": "r1", "r3": "r2"}
    df2 = spark.createDataFrame(
        [(u, perm[r], c) for u, r, c in rows], "u int, r string, c string"
    )
    a1 = krippendorff_alpha(df, "u", "r", F.col("c")).collect()
    a2 = krippendorff_alpha(df2, "u", "r", F.col("c")).collect()
    v1 = a1[0]["alpha"] if a1 else None
    v2 = a2[0]["alpha"] if a2 else None
    assert v1 == v2
    if v1 is not None:
        assert v1 <= 1.0


@_SETTINGS
@given(
    vals=st.lists(st.integers(0, 100), min_size=3, max_size=15),
)
def test_theil_sen_affine_equivariance(spark, vals):
    """slope(a·x + b over t) == a·slope(x over t) + 0 when x IS the
    series; with x = 2t+c the slope is exactly 2; adding a constant
    never changes the slope."""
    from table_computing_spark.operators.temporal import theil_sen_grouped

    rows = [("k", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t int, v int")
    s1 = theil_sen_grouped(df, ["k"], F.col("t"), F.col("v")).collect()[0]["slope"]
    df2 = spark.createDataFrame(
        [("k", t, v + 55) for t, v in enumerate(vals)], "k string, t int, v int"
    )
    s2 = theil_sen_grouped(df2, ["k"], F.col("t"), F.col("v")).collect()[0]["slope"]
    assert s1 == s2


@_SETTINGS
@given(
    vals=st.lists(st.integers(-30, 30), min_size=3, max_size=15),
)
def test_mann_kendall_antisymmetry(spark, vals):
    """Negating the series flips S and z exactly; |S| ≤ n(n−1)/2."""
    from table_computing_spark.operators.temporal import mann_kendall_grouped

    df = spark.createDataFrame(
        [("k", t, v) for t, v in enumerate(vals)], "k string, t int, v int"
    )
    neg = spark.createDataFrame(
        [("k", t, -v) for t, v in enumerate(vals)], "k string, t int, v int"
    )
    r1 = mann_kendall_grouped(df, "k", F.col("t"), F.col("v")).collect()[0]
    r2 = mann_kendall_grouped(neg, "k", F.col("t"), F.col("v")).collect()[0]
    n = len(vals)
    assert r1["s"] == -r2["s"] and abs(r1["s"]) <= n * (n - 1) // 2
    if r1["z"] is not None:
        assert r2["z"] is not None and abs(r1["z"] + r2["z"]) < 2e-6


@_SETTINGS
@given(
    rows=st.lists(st.tuples(st.integers(0, 10), st.booleans()),
                  min_size=2, max_size=30),
)
def test_brier_bounds_and_perfect_scores(spark, rows):
    """0 ≤ brier ≤ 1; a perfect hard scorer has brier 0 and the
    minimal clamped logloss."""
    import math

    from table_computing_spark.operators.classify import brier_logloss

    df = spark.createDataFrame(
        [(s, int(y)) for s, y in rows], "s int, y int"
    )
    r = brier_logloss(df, "s", 10, "y").collect()[0]
    assert 0.0 <= r["brier"] <= 1.0 and r["logloss"] >= 0.0
    perfect = spark.createDataFrame(
        [(10 * int(y), int(y)) for _, y in rows], "s int, y int"
    )
    rp = brier_logloss(perfect, "s", 10, "y").collect()[0]
    assert rp["brier"] == 0.0
    assert abs(rp["logloss"] - (-math.log(0.95))) < 2e-6


@_SETTINGS
@given(
    ranks=st.permutations(list(range(1, 6))),
)
def test_rbo_self_similarity_and_range(spark, ranks):
    """RBO(A, A) == 1 for any permutation; RBO against a disjoint list
    is 0; always within [0, 1]."""
    from table_computing_spark.operators.evaluation import rbo_overlap

    a = spark.createDataFrame(
        [(1, f"i{i}", r) for i, r in enumerate(ranks)], "q int, it string, rank int"
    )
    self_r = rbo_overlap(a, a, "q", "it", "rank", k=5, p=0.8).collect()[0]
    assert self_r["rbo"] == 1.0
    b = spark.createDataFrame(
        [(1, f"z{i}", r) for i, r in enumerate(ranks)], "q int, it string, rank int"
    )
    dis = rbo_overlap(a, b, "q", "it", "rank", k=5, p=0.8).collect()[0]
    assert dis["rbo"] == 0.0


# ------------------------------------------------------ r13 properties


vals = st.integers(min_value=-20, max_value=20)


@_SETTINGS
@given(
    a=st.lists(vals, min_size=1, max_size=12),
    b=st.lists(vals, min_size=1, max_size=12),
    c=st.lists(vals, min_size=1, max_size=12),
)
def test_wasserstein_is_a_metric(spark, a, b, c):
    """W1 symmetry, identity-of-indiscernibles (on equal samples), and
    the triangle inequality — checked against a naive O(m²) CDF scan."""
    from table_computing_spark.operators.drift import wasserstein_1d

    def df(xs):
        return spark.createDataFrame([(x,) for x in xs], "v long")

    def naive(x, y):
        pool = sorted(set(x) | set(y))
        tot = 0.0
        for v0, v1 in zip(pool, pool[1:]):
            fo = sum(1 for t in x if t <= v0) / len(x)
            fn = sum(1 for t in y if t <= v0) / len(y)
            tot += abs(fo - fn) * (v1 - v0)
        return round(tot, 6)

    def w1(x, y):
        return wasserstein_1d(df(x), df(y), F.col("v")).collect()[0]["w1"]

    ab, ba = w1(a, b), w1(b, a)
    assert ab == ba
    assert abs(ab - naive(a, b)) <= 2e-6
    assert w1(a, a) == 0.0
    assert ab <= w1(a, c) + w1(c, b) + 2e-6  # triangle (rounding slack)


@_SETTINGS
@given(
    a=st.lists(vals, min_size=1, max_size=12),
    b=st.lists(vals, min_size=1, max_size=12),
)
def test_cliffs_delta_antisymmetry_and_bounds(spark, a, b):
    """delta(a, b) == -delta(b, a), |delta| <= 1, and equality with the
    brute-force pair classification."""
    from table_computing_spark.operators.drift import cliffs_delta

    def df(avals, bvals):
        rows = [(v, True) for v in avals] + [(v, False) for v in bvals]
        return spark.createDataFrame(rows, "v long, a boolean")

    d_ab = cliffs_delta(df(a, b), F.col("a"), F.col("v")).collect()[0]["delta"]
    d_ba = cliffs_delta(df(b, a), F.col("a"), F.col("v")).collect()[0]["delta"]
    gt = sum(1 for x in a for y in b if x > y)
    lt = sum(1 for x in a for y in b if x < y)
    assert d_ab == round((gt - lt) / (len(a) * len(b)), 6)
    assert abs(d_ab + d_ba) <= 2e-6
    assert -1.0 <= d_ab <= 1.0


@_SETTINGS
@given(
    a=st.lists(vals, min_size=1, max_size=12),
    b=st.lists(vals, min_size=1, max_size=12),
)
def test_cvm_symmetry_and_naive_equality(spark, a, b):
    """CvM is symmetric in the two samples and equals the naive pooled
    integral computed rationally."""
    from fractions import Fraction

    from table_computing_spark.operators.drift import cvm_2sample

    def df(xs):
        return spark.createDataFrame([(x,) for x in xs], "v long")

    def t(x, y):
        return cvm_2sample(df(x), df(y), F.col("v")).collect()[0]["t"]

    def naive(x, y):
        pool = sorted(set(x) | set(y))
        no, nn = len(x), len(y)
        tot = Fraction(0)
        for v in pool:
            ni = sum(1 for u in x if u == v) + sum(1 for u in y if u == v)
            d = Fraction(sum(1 for u in x if u <= v), no) - Fraction(
                sum(1 for u in y if u <= v), nn
            )
            tot += Fraction(ni) * d * d
        t_exact = Fraction(no * nn, (no + nn) ** 2) * tot
        return float(t_exact)

    ab, ba = t(a, b), t(b, a)
    assert ab == ba
    assert abs(ab - naive(a, b)) <= 2e-6


@_SETTINGS
@given(
    probs=st.lists(
        st.integers(min_value=0, max_value=100), min_size=2, max_size=30
    ),
    labels=st.lists(st.booleans(), min_size=2, max_size=30),
)
def test_brier_murphy_identity(spark, probs, labels):
    """REL − RES + UNC == Brier score of the binned forecast, for any
    prob/label sample (the exact Murphy identity)."""
    from table_computing_spark.operators.evaluation import brier_decomposition

    n = min(len(probs), len(labels))
    rows = [(probs[i] / 100.0, int(labels[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "p double, y int")
    r = brier_decomposition(df, F.col("p"), F.col("y"), n_bins=10).collect()[0]
    import collections

    bins = collections.defaultdict(list)
    for p, y in rows:
        bins[min(int(p * 10), 9)].append((p, y))
    binned = sum(
        (sum(p for p, _ in g) / len(g) - y) ** 2 for g in bins.values() for _, y in g
    ) / n
    assert abs((r["reliability"] - r["resolution"] + r["uncertainty"]) - binned) < 3e-6


@_SETTINGS
@given(
    a=st.lists(vals, min_size=1, max_size=12),
    b=st.lists(vals, min_size=1, max_size=12),
)
def test_energy_distance_nonneg_symmetric_naive(spark, a, b):
    """Energy distance >= 0, symmetric, equals the naive O(n²) pair
    computation (and 0 on identical samples)."""
    from table_computing_spark.operators.drift import energy_distance

    def df(xs):
        return spark.createDataFrame([(x,) for x in xs], "v long")

    def e(x, y):
        return energy_distance(df(x), df(y), F.col("v")).collect()[0]["e_dist"]

    def mean_abs(u, w):
        return sum(abs(p - q) for p in u for q in w) / (len(u) * len(w))

    ab = e(a, b)
    assert ab == e(b, a)
    assert ab >= 0.0
    naive = 2 * mean_abs(a, b) - mean_abs(a, a) - mean_abs(b, b)
    assert abs(ab - naive) <= 2e-6
    assert e(a, a) == 0.0
