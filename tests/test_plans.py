"""Automated physical-plan audit — the 100 TB contract, enforced.

PLANS.md documents what the headline plans must look like; this test
keeps every batch query honest as the surface grows:

- no CartesianProduct anywhere (quadratic at scale);
- no BatchEvalPython (row-at-a-time Python UDF) — Python only enters
  via Arrow (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas);
- every lineitem scan prunes columns (never reads all 16 fields);
- headline scans carry PushedFilters down to parquet;
- dimension joins are broadcast, and the Q1 shape keeps its single
  pre-sort shuffle.

Streaming queries are excluded (building them executes a micro-batch
run; their state/shuffle story is asserted in test_streaming.py).
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.01"

BATCH_QUERIES = sorted(
    n for n in entrymod.queries() if not n.startswith(("q_stream", "q_streaming"))
)


from table_computing_spark.plans import (  # noqa: E402 — single source
    _read_schema_width as read_schema_width_lib,
    plan_of,
)


@pytest.fixture(scope="module")
def plans(spark):
    # pooled construction (guide §2.6: driver actions from a thread
    # pool overlap): each query's CONSTRUCTION runs its probe actions
    # (counts/first()s) serially when built one-by-one — 156 s for 342
    # plans; 8 threads cut the fixture to ~45 s. plan_of is thread-safe
    # as of r15 (direct explainString, no stdout redirection).
    from concurrent.futures import ThreadPoolExecutor

    qs = entrymod.queries()

    def one(name):
        return name, plan_of(qs[name](spark, SF))

    with ThreadPoolExecutor(max_workers=8) as pool:
        return dict(pool.map(one, BATCH_QUERIES))


def scan_blocks(plan: str, table: str) -> list[str]:
    """Detail blocks of parquet scans of `table` in a formatted plan."""
    blocks = re.split(r"\n\n", plan)
    return [
        b
        for b in blocks
        if "Scan parquet" in b and f"{table}.parquet" in b and "ReadSchema" in b
    ]


def read_schema_width(block: str) -> int:
    return read_schema_width_lib(block)


def test_no_cartesian_product(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not offenders, offenders


def test_no_row_at_a_time_python_udf(plans):
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not offenders, offenders


def test_lineitem_scans_always_prune_columns(plans):
    # lineitem is the fact table (16 columns); a full-width read means a
    # missing projection and is exactly what kills a 100 TB scan.
    fat = {
        n: [read_schema_width(b) for b in scan_blocks(p, "lineitem")]
        for n, p in plans.items()
    }
    offenders = {n: ws for n, ws in fat.items() if any(w >= 16 for w in ws)}
    assert not offenders, offenders


def test_q1_pushdown_pruning_and_single_agg_shuffle(plans):
    p = plans["q_groupby_agg"]
    (scan,) = scan_blocks(p, "lineitem")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in scan
    assert read_schema_width(scan) <= 6
    # partial -> Exchange -> final agg, plus at most the output sort
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2


def test_filter_scan_pushes_all_predicates(plans):
    (scan,) = scan_blocks(plans["q_filter_select"], "lineitem")
    m = re.search(r"PushedFilters: \[(.*?)\]", scan)
    assert m and "GreaterThan(l_quantity" in m.group(1), scan


def test_approx_distinct_avoids_expand(plans):
    """Exact distincts must plan via two-level aggregation, not the
    EXPAND a multi-countDistinct agg produces (doubles the 100 TB scan
    rows; measured 5× slower at sf0.1). Expand is fine where grouping
    sets genuinely need it (q_rollup / q_grouping_sets)."""
    assert "Expand" not in plans["q_approx_distinct"], plans["q_approx_distinct"]


def test_range_join_compresses_points_before_join(plans):
    """The point side must aggregate to distinct values BELOW the
    bucket join — candidate volume scales with distinct values, not
    rows (PLANS.md round-4 note). Seen as: at least one HashAggregate
    on the lineitem branch before any join node."""
    p = plans["q_range_join"]
    join = re.search(r"\(\d+\) (BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", p)
    agg = re.search(r"\(\d+\) HashAggregate", p)
    assert join and agg, p
    # formatted plans list operators bottom-up by id: the compress agg
    # must carry a smaller id than every join
    first_join_id = min(
        int(m.group(1))
        for m in re.finditer(r"\((\d+)\) (?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", p)
    )
    agg_ids = [int(m.group(1)) for m in re.finditer(r"\((\d+)\) HashAggregate", p)]
    assert any(a < first_join_id for a in agg_ids), p


def test_dimension_joins_broadcast(plans):
    # Q5 shape: supplier/nation/region must come in as broadcast joins,
    # never shuffled sort-merge, at any SF where they fit the threshold.
    for name in ("q_join_multi", "q_join_broadcast"):
        if name in plans:
            assert "BroadcastHashJoin" in plans[name], name
            assert "SortMergeJoin" not in plans[name], name


def test_heavy_hitters_recount_is_broadcast_semi(plans):
    p = plans["q_heavy_hitters"]
    assert "BroadcastHashJoin LeftSemi BuildRight" in p, p
    assert "SortMergeJoin" not in p


def test_top_n_uses_window_group_limit(plans):
    # row_number <= n must rewrite to WindowGroupLimit twice: a partial
    # per-mapper limit BEFORE the shuffle (only n rows per group per
    # task ever shuffle) and a final one after.
    p = plans["q_flagship_top100"]
    assert len(re.findall(r"\(\d+\) WindowGroupLimit", p)) == 2, p


# Unpartitioned-window whitelist: sites where the window input is
# PROVABLY bounded, so the single-task sort is a few rows, not the data.
# Whitelisted global-window sites. VERDICT r08 item 8: every entry
# carries a MEASURED input-cardinality bound (a callable the suite
# executes against the gate's own data), so the whitelist cannot grow
# into an escape hatch — a name in this dict without a tight measured
# bound fails test_global_window_whitelist_inputs_are_bounded.
_GLOBAL_WINDOW_OK = {
    # row_number over DISTINCT event_type — bounded by category
    # cardinality (the id-assignment pattern; the data-sized rank path
    # is ids.dense_ids, which this gate still covers)
    "q_label_prop": (
        "distinct event_type label ids",
        lambda spark: spark.read.parquet(f"{SF}/events.parquet")
        .select("event_type").distinct().count(),
        64,
    ),
    # sum(x) OVER () over a contingency table of category pairs
    "q_mutual_info": (
        "global total over |a|x|b| category cells",
        lambda spark: spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderpriority").distinct().count()
        * spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderstatus").distinct().count(),
        256,
    ),
    # sum(x) OVER () over fixed-width histogram bins (10 + under/over)
    "q_psi_drift": ("global totals over fixed bin table", lambda spark: 12, 12),
    # largest-remainder seat rank — one row per nation
    "q_quota_allocation": (
        "remainder rank over one row per nation",
        lambda spark: spark.read.parquet(f"{SF}/customer.parquet")
        .select("c_nationkey").distinct().count(),
        32,
    ),
    # sum(x) OVER () over fixed-width WOE buckets (10 + under/over)
    "q_woe_iv": ("global totals over fixed bucket table", lambda spark: 12, 12),
    # sum(x) OVER () over fixed-width JS-divergence bins (r10 twin of psi)
    "q_js_divergence": ("global totals over fixed bin table", lambda spark: 12, 12),
    # rank labels over the already-LIMITed top-k phrase rows; the
    # data-sized global ordering itself is TakeOrderedAndProject
    "q_rake_keywords": (
        "row_number over LIMIT top_k rows (constant)", lambda spark: 20, 20,
    ),
    # zipf rank over the LIMITed top-1000 token rows (same shape)
    "q_zipf_fit": (
        "row_number over LIMIT top_n rows (constant)", lambda spark: 1000, 1000,
    ),
    # r11: per-list ranks + the fused rank, each over LIMITed rows
    # (100-row TakeOrdered lists in, 20-row fused list out)
    "q_rrf_fusion": (
        "row_number over LIMIT 100/20 rows (constant)", lambda spark: 100, 100,
    ),
    # r11b: cumulative capture over the fixed 10-row decile table
    "q_cumulative_gains": (
        "running totals over fixed n_buckets decile table", lambda spark: 10, 10,
    ),
    # r11b: PAV index/prefix over the fixed 20-row bin table
    "q_isotonic": (
        "PAV pooling over fixed bin table", lambda spark: 20, 20,
    ),
    # r13: cumulative treated/control totals over the fixed 10-row
    # uplift-decile table (the cumulative_gains shape)
    "q_qini_uplift": (
        "running totals over fixed n_buckets decile table", lambda spark: 10, 10,
    ),
    # r11: sum(term) OVER () over one row per community (nation labels)
    "q_graph_modularity": (
        "global total over one row per community",
        lambda spark: spark.read.parquet(f"{SF}/customer.parquet")
        .select("c_nationkey").distinct().count(),
        32,
    ),
}


def test_global_window_whitelist_inputs_are_bounded(spark):
    """Each whitelisted global-window plan's window INPUT is provably
    small: the measured cardinality (run here, against the gate data)
    must sit under the entry's declared bound, and every bound is a
    constant or category count — never data-sized."""
    for name, (reason, measure, bound) in _GLOBAL_WINDOW_OK.items():
        measured = measure(spark)
        assert measured <= bound, (
            f"{name}: whitelisted global window claims '{reason}' but its "
            f"measured input is {measured} rows (> bound {bound})"
        )
        # the bound itself stays O(categories), not O(rows)
        assert bound <= 1024, f"{name}: bound {bound} is not 'provably small'"


# single source of truth: the library's pre-flight audit
# (table_computing_spark/plans.py) — the suite gate and the user-facing
# plan_report must agree by construction
from table_computing_spark.plans import unpartitioned_windows as _unpartitioned_windows  # noqa: E402


def test_no_unpartitioned_window_over_data(plans):
    """The 100 TB window contract: no batch query may plan a Window
    with an empty partition spec over data-sized input — Spark funnels
    the ENTIRE input through one task ("No Partition Defined for Window
    operation"). Exact global ranks go through ids.dense_ids /
    ids.ntile_distributed (range shuffle + closed form) instead. This
    is the gate that would have caught q_rfm's three global ntiles and
    zorder_value's per-column ntile (both de-globalized in r08)."""
    offenders = {
        n: ws
        for n, p in plans.items()
        if (ws := _unpartitioned_windows(p)) and n not in _GLOBAL_WINDOW_OK
    }
    assert not offenders, offenders


def test_write_zordered_plan_has_no_global_window(spark):
    """VERDICT r07 item 3: the zorder write path must never plan an
    unpartitioned data window (the per-column bucketing is
    ntile_distributed now; only the ids.py __pid offset cumsum — one
    row per partition — may order globally)."""
    from table_computing_spark.sources.zorder import zorder_value

    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_custkey"
    )
    z = zorder_value(o, ["o_totalprice", "o_custkey"], bits=4, tiebreak="o_orderkey")
    assert not _unpartitioned_windows(plan_of(z))


def test_every_batch_query_plans(plans):
    # plan construction itself succeeded for the whole surface
    assert len(plans) == len(BATCH_QUERIES)


def test_cosine_pairs_big_n_path_is_blocked_not_cartesian(spark):
    # Past the broadcast bound, cosine_pairs must route to sign-LSH
    # blocking (bucket equi-join) — the round-1 crossJoin fallback was a
    # scale-killer and is gone. Force the big-N path with a zero limit.
    from table_computing_spark.operators.similarity import cosine_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = plan_of(cosine_pairs(emb, threshold=0.9, broadcast_limit=0))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert "hashpartitioning(__bucket" in p or "__bucket" in p, p


def test_cosine_pairs_broadcast_bound_is_byte_based(spark):
    # 200k rows of 1024-dim float64 is >1.5 GB — the row-count bound
    # alone must NOT select the collect+broadcast path for wide vectors.
    from table_computing_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(64)
    dim = len(emb.first()["embedding"])
    # byte budget below one row's matrix footprint → must take LSH path
    p = plan_of(sim.cosine_pairs(emb, broadcast_bytes=dim * 8 - 1))
    assert "MapInPandas" not in p, p  # broadcast path would MapInPandas-score
    assert "CartesianProduct" not in p, p


def test_decontaminate_bench_side_broadcast(plans):
    """The benchmark n-gram set must reach the corpus via a broadcast
    hash join — never a shuffled SMJ of the corpus n-grams against it
    (the eval set is always tiny relative to the corpus)."""
    p = plans["q_decontaminate"]
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_nb_classify_argmax_is_aggregate_not_window(plans):
    """The per-doc argmax class must plan as max(struct(score, class))
    — an aggregate — not a rank window over the scored corpus (a
    corpus-wide sort at 100 TB)."""
    assert "Window" not in plans["q_nb_classify"]


def test_span_ops_ngram_build_in_codegen(plans):
    """_ngram_rows assembles n-grams with lead() windows so the build
    stays JVM-side: no Python evaluation of any flavor in the span
    ops (PLANS.md round-5: the interpreted transform/slice array path
    measured ~10x slower)."""
    for name in ("q_dup_spans", "q_decontaminate"):
        p = plans[name]
        assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_cms_estimate_probes_broadcast_sketch(plans):
    """The sketch (≤ depth×width rows) must broadcast onto the probe
    side — a shuffled join would move the probe stream for a table
    that always fits in one executor."""
    p = plans["q_cms_counts"]
    assert "BroadcastHashJoin" in p, p


def test_semantic_dedup_centroids_broadcast(plans):
    """Per-cell centroids (≤ 2^bits rows) broadcast back onto the
    corpus; the epsilon test is a bucket equi-join, never cartesian."""
    p = plans["q_semantic_dedup"]
    assert "BroadcastHashJoin" in p, p
