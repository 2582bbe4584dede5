"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (Top100Test-shaped) at sf0.001.
queries()     — one callable per implemented operator (SURVEY.md §2).
oracle_sql()  — DuckDB-equivalent SQL for each query key.

Design notes for oracle parity:
  * Every computed column is aliased identically on both sides.
  * Double SUMs are order-dependent in the last bits; anywhere a sum of
    non-integer doubles is emitted we cast to DECIMAL first (exact,
    order-independent) and cast the final value back to DOUBLE.
  * Timestamps are emitted as epoch-ms BIGINT (unix_millis vs epoch_ms)
    so engine timestamp types never reach the comparator.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from table_computing_spark import functions as tcf
from table_computing_spark.operators import windows as tw
from table_computing_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# flagship — the reference's Top100 pipeline shape (Top100Test.java:147-182):
# stream → dimension left-join → hopping window sum → per-window top-N.
# Here: events × event-type dimension (derived) → 1h/30m window → top 100.
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    sf_dir = "/root/testdata/sf0.001"
    events = load_table(spark, sf_dir, "events")
    # tiny dimension: event_type -> weight (stands in for the commodity
    # dim of Top100Test); broadcast like a refreshed dimension snapshot.
    dim = spark.createDataFrame(
        [("click", 1), ("view", 1), ("purchase", 10), ("signup", 5), ("error", 0)],
        "event_type string, weight int",
    )
    joined = events.left_join(dim, on=["event_type"], broadcast_other=True, null_safe=False)
    windowed = tw.slide(
        joined,
        "ts",
        "1 hour",
        "30 minutes",
        ["event_type"],
        sales_volume=F.sum(F.col("value") * F.col("weight")),
        n_events=F.count(F.lit(1)),
    )
    top = windowed.top_n(["window_start"], ["sales_volume"], n=100, rank_col="rank")
    return top.df


# ---------------------------------------------------------------------------
# queries — each exercises one operator family from SURVEY.md §2
# ---------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str):
    return load_table(spark, sf_dir, name)


def q_filter_select(spark, sf_dir):
    """Table.filter + select (ref table/Table.java:265-280,306-331)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") > 45) & (F.col("l_shipdate") >= F.lit("1998-01-01")))
        .select(
            "l_orderkey",
            "l_linenumber",
            qty=F.col("l_quantity"),
            revenue=F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4),
        )
        .df
    )


def q_project_negative(spark, sf_dir):
    """Table.projectNegative (ref table/Table.java:639-659)."""
    return _t(spark, sf_dir, "supplier").project_negative("s_acctbal", "s_name").df


def q_groupby_agg(spark, sf_dir):
    """TPC-H Q1 shape — groupBy + multi-agg (ref table/Table.java:436-467)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .group_by(
            ["l_returnflag", "l_linestatus"],
            sum_qty=F.sum("l_quantity"),
            sum_base_price=F.round(tcf.sum_exact("l_extendedprice").cast("double"), 2),
            sum_disc_price=F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
                ).cast("double"),
                2,
            ),
            avg_qty=F.round(F.sum("l_quantity") / F.count(F.lit(1)), 6),
            avg_price=F.round(tcf.sum_exact("l_extendedprice").cast("double") / F.count(F.lit(1)), 6),
            count_order=F.count(F.lit(1)),
        )
        .df
    )


def q_avg_ref_nulls(spark, sf_dir):
    """Reference avg counts null rows in the denominator
    (util/AggregationUtil.java:73-75) — exercised via a derived null."""
    ev = _t(spark, sf_dir, "events")
    with_nulls = ev.select(
        "event_type",
        v=F.when(F.col("value") > 100, F.col("value")).otherwise(F.lit(None)),
    )
    vsum = F.sum(F.col("v").cast("decimal(18,6)")).cast("double")
    return (
        with_nulls.group_by(
            ["event_type"],
            # reference avg: null rows count in the denominator
            avg_ref=F.round(vsum / F.count(F.lit(1)), 6),
            # SQL AVG: nulls excluded from the denominator
            avg_sql=F.round(vsum / F.count("v"), 6),
            n=tcf.count_all(),
        )
        .df
    )


def q_join_inner(spark, sf_dir):
    """Inner equi-join (ref table/Table.java:610-616)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, on=[("o_custkey", "c_custkey")], null_safe=False)
        .group_by(
            ["c_mktsegment"],
            n_orders=F.count(F.lit(1)),
            total=F.round(tcf.sum_exact("o_totalprice").cast("double"), 2),
        )
        .df
    )


def q_join_left(spark, sf_dir):
    """Left join keeps unmatched left rows (ref table/Table.java:618-620)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.left_join(o, on=[("c_custkey", "o_custkey")], null_safe=False)
        .group_by(
            ["c_custkey"],
            n_orders=F.count("o_orderkey"),
            max_price=F.max("o_totalprice"),
        )
        .df
    )


def q_join_full_outer(spark, sf_dir):
    """Full outer join (ref table/Table.java:622-624)."""
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    sn = s.group_by(["s_nationkey"], n_supp=F.count(F.lit(1)))
    cn = c.group_by(["c_nationkey"], n_cust=F.count(F.lit(1)))
    return (
        sn.outer_join(cn, on=[("s_nationkey", "c_nationkey")], null_safe=False)
        .select(
            nationkey=F.coalesce(F.col("s_nationkey"), F.col("c_nationkey")),
            n_supp=F.coalesce(F.col("n_supp"), F.lit(0)),
            n_cust=F.coalesce(F.col("n_cust"), F.lit(0)),
        )
        .df
    )


def q_join_nullsafe(spark, sf_dir):
    """NULL join keys match each other — the reference's hash-index join
    semantics (TableTest.java:209-232) → eqNullSafe."""
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", rk=F.expr("nullif(n_regionkey, 0)")
    )
    r = _t(spark, sf_dir, "region").select(
        "r_name", rk2=F.expr("nullif(r_regionkey, 0)")
    )
    return (
        n.join(r, on=[("rk", "rk2")], null_safe=True)
        .select("n_nationkey", "n_name", "r_name")
        .df
    )


def q_join_multi(spark, sf_dir):
    """TPC-H Q5 shape — multi-way join with broadcast dims, revenue per
    nation (SURVEY §2.3 dimension-join pattern)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, on=[("l_orderkey", "o_orderkey")], null_safe=False)
        .join(s, on=[("l_suppkey", "s_suppkey")], null_safe=False, broadcast_other=True)
        .join(n, on=[("s_nationkey", "n_nationkey")], null_safe=False, broadcast_other=True)
        .join(r, on=[("n_regionkey", "r_regionkey")], null_safe=False, broadcast_other=True)
        .filter(F.col("o_orderdate") >= F.lit("1996-01-01"))
        .group_by(
            ["r_name", "n_name"],
            revenue=F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
                ).cast("double"),
                2,
            ),
            n_items=F.count(F.lit(1)),
        )
        .df
    )


def q_semi_anti_join(spark, sf_dir):
    """Semi/anti joins (Spark-native addition; reference expresses these
    through user JoinCriteria returning empty match lists)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    with_orders = c.semi_join(o, on=[("c_custkey", "o_custkey")]).select(
        "c_custkey", has_orders=F.lit(1)
    )
    without = c.anti_join(o, on=[("c_custkey", "o_custkey")]).select(
        "c_custkey", has_orders=F.lit(0)
    )
    return with_orders.append(without).df


def q_over_rank(spark, sf_dir):
    """Table.over + rank → ROW_NUMBER per partition (ref
    table/Table.java:469-533, util/OrderByWindowUtil.java:3-7)."""
    c = _t(spark, sf_dir, "customer")
    ranked = c.over(
        ["c_nationkey"],
        [F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        rank=lambda w: F.row_number().over(w),
    )
    return ranked.filter(F.col("rank") <= 3).select("c_nationkey", "c_custkey", "rank").df


def q_top_n(spark, sf_dir):
    """util/WindowUtil.java:19-53 topN — per-group top-k by value."""
    p = _t(spark, sf_dir, "part")
    return (
        p.top_n(["p_brand"], [F.col("p_retailprice").desc(), F.col("p_partkey").asc()], n=5)
        .select("p_brand", "p_partkey", "p_retailprice", "rank")
        .df
    )


def q_group_concat(spark, sf_dir):
    """util/AggregationUtil.groupConcat:8-15 — nulls as 'null', sorted
    deterministic order (distributed contract, SURVEY §4.3)."""
    n = _t(spark, sf_dir, "nation")
    return (
        n.group_by(
            ["n_regionkey"],
            names=tcf.group_concat("n_name"),
            n_nations=tcf.count_all(),
        )
        .df
    )


def q_scalar_functions(spark, sf_dir):
    """util/ScalarUtil.java:8-55 — substr/trim/casts."""
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            name5=tcf.substr("p_name", 0, 5),
            brand_num=tcf.to_integer(tcf.ltrim_char(tcf.substr("p_brand", 6), "#")),
            size_str=tcf.to_str("p_size"),
            price_int=tcf.to_long(F.floor("p_retailprice")),
        )
        .df
    )


def q_date_functions(spark, sf_dir):
    """util/DateUtil.java:8-23 — epoch-ms ↔ formatted string."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            order_ms=tcf.epoch_ms("o_orderdate"),
            order_day=F.date_format("o_orderdate", "yyyy-MM-dd"),
            order_month=F.date_format("o_orderdate", "yyyy-MM"),
            roundtrip=tcf.to_date(tcf.epoch_ms("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
        )
        .df
    )


def q_transform_explode(spark, sf_dir):
    """TransformFunction (UDTF, ref table/Table.java:333-373) —
    declarative explode path: one doc row → N token rows → token counts."""
    d = _t(spark, sf_dir, "documents")
    tokens = d.select(
        tok=F.explode(F.split(F.col("text"), " "))
    ).filter(F.col("tok") != "")
    return tokens.group_by(["tok"], n=tcf.count_all()).df


def q_union_distinct(spark, sf_dir):
    """Table.append (ref table/Table.java:192-202) + dropDuplicates
    (Spark-native set op, SURVEY §2.7)."""
    o = _t(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 200000).select("o_custkey")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return hi.append(urgent).distinct().select("o_custkey").df


def q_window_tumble(spark, sf_dir):
    """Tumbling window (ref window/TumbleWindow.java:10-50)."""
    ev = _t(spark, sf_dir, "events")
    return tw.tumble(
        ev,
        "ts",
        "1 hour",
        ["event_type"],
        n=tcf.count_all(),
        total=F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2),
    ).df


def q_window_slide(spark, sf_dir):
    """Hopping window size=1h hop=30m (ref window/SlideWindow.java:283-373)."""
    ev = _t(spark, sf_dir, "events")
    return tw.slide(
        ev,
        "ts",
        "1 hour",
        "30 minutes",
        ["event_type"],
        n=tcf.count_all(),
    ).df


def q_window_session(spark, sf_dir):
    """Session window gap=30m per user (ref window/SessionWindow.java:93-123)."""
    ev = _t(spark, sf_dir, "events")
    return tw.session(
        ev,
        "ts",
        "30 minutes",
        ["user_id"],
        n=tcf.count_all(),
        total=F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2),
    ).df


def q_over_by_size(spark, sf_dir):
    """Trailing 5-row window per key (ref window/OverWindowBySize.java:54-89)."""
    ev = _t(spark, sf_dir, "events")
    out = tw.over_by_size(
        ev,
        ["user_id"],
        [F.col("ts").asc(), F.col("event_id").asc()],
        n=5,
        trailing_avg=F.avg(F.col("value")),
        trailing_n=tcf.count_all(),
    )
    return out.select(
        "event_id", "user_id", "trailing_n", trailing_avg=F.round("trailing_avg", 6)
    ).df


def q_over_by_duration(spark, sf_dir):
    """Trailing 1h range window per key (ref window/OverWindowByDuration.java:63-92)."""
    ev = _t(spark, sf_dir, "events")
    with_ms = ev.select_all(ts_ms=tcf.epoch_ms("ts"))
    out = tw.over_by_duration(
        with_ms,
        ["user_id"],
        "ts_ms",
        duration_ms=3_600_000,
        trailing_sum=F.sum(F.col("value").cast("decimal(18,6)")),
        trailing_n=tcf.count_all(),
    )
    return out.select(
        "event_id",
        "user_id",
        "trailing_n",
        trailing_sum=F.round(F.col("trailing_sum").cast("double"), 2),
    ).df


def q_flagship_top100(spark, sf_dir):
    """Top100Test pipeline at scale: hopping window volume + per-window
    top-100 (Top100Test.java:147-182)."""
    ev = _t(spark, sf_dir, "events")
    windowed = tw.slide(
        ev,
        "ts",
        "1 hour",
        "30 minutes",
        ["event_type"],
        sales_volume=F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2),
    )
    top = windowed.top_n(
        ["window_start"],
        [F.col("sales_volume").desc(), F.col("event_type").asc()],
        n=100,
        rank_col="rank",
    )
    return top.select("window_start", "window_end", "event_type", "sales_volume", "rank").df


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_filter_select": q_filter_select,
        "q_project_negative": q_project_negative,
        "q_groupby_agg": q_groupby_agg,
        "q_avg_ref_nulls": q_avg_ref_nulls,
        "q_join_inner": q_join_inner,
        "q_join_left": q_join_left,
        "q_join_full_outer": q_join_full_outer,
        "q_join_nullsafe": q_join_nullsafe,
        "q_join_multi": q_join_multi,
        "q_semi_anti_join": q_semi_anti_join,
        "q_over_rank": q_over_rank,
        "q_top_n": q_top_n,
        "q_group_concat": q_group_concat,
        "q_scalar_functions": q_scalar_functions,
        "q_date_functions": q_date_functions,
        "q_transform_explode": q_transform_explode,
        "q_union_distinct": q_union_distinct,
        "q_window_tumble": q_window_tumble,
        "q_window_slide": q_window_slide,
        "q_window_session": q_window_session,
        "q_over_by_size": q_over_by_size,
        "q_over_by_duration": q_over_by_duration,
        "q_flagship_top100": q_flagship_top100,
    }


# ---------------------------------------------------------------------------
# oracles — ANSI SQL for DuckDB over the same parquet views
# ---------------------------------------------------------------------------

_HOP_EVENTS = """
WITH e AS (
  SELECT *, epoch_ms(ts) AS t FROM events
), hops AS (
  SELECT *, (t // 1800000) * 1800000 AS window_start FROM e
  UNION ALL
  SELECT *, (t // 1800000) * 1800000 - 1800000 AS window_start FROM e
)
"""

_SESSIONS_30M = """
WITH e AS (
  SELECT user_id, event_id, value, epoch_ms(ts) AS t FROM events
), marked AS (
  -- Spark session_window merges when the inter-event gap == the timeout
  -- (strictly-greater closes); the reference closes at >= timeout
  -- (InThreadSessionWindow.java:50-136) — documented delta, Spark wins.
  SELECT *, CASE WHEN t - lag(t) OVER w > 1800000 OR lag(t) OVER w IS NULL
                 THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
), sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "q_filter_select": """
            SELECT l_orderkey, l_linenumber, l_quantity AS qty,
                   round(l_extendedprice * (1 - l_discount), 4) AS revenue
            FROM lineitem
            WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '1998-01-01'
        """,
        "q_project_negative": """
            SELECT s_suppkey, s_nationkey FROM supplier
        """,
        "q_groupby_agg": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE), 2) AS sum_base_price,
                   round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 2) AS sum_disc_price,
                   round(sum(l_quantity) / count(*), 6) AS avg_qty,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) / count(*), 6) AS avg_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q_avg_ref_nulls": """
            WITH t AS (
              SELECT event_type,
                     CASE WHEN value > 100 THEN value END AS v
              FROM events
            )
            SELECT event_type,
                   round(CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_ref,
                   round(CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / count(v), 6) AS avg_sql,
                   count(*) AS n
            FROM t GROUP BY event_type
        """,
        "q_join_inner": """
            SELECT c_mktsegment,
                   count(*) AS n_orders,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE), 2) AS total
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "q_join_left": """
            SELECT c_custkey,
                   count(o_orderkey) AS n_orders,
                   max(o_totalprice) AS max_price
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        """,
        "q_join_full_outer": """
            WITH sn AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey),
                 cn AS (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey)
            SELECT coalesce(s_nationkey, c_nationkey) AS nationkey,
                   coalesce(n_supp, 0) AS n_supp,
                   coalesce(n_cust, 0) AS n_cust
            FROM sn FULL OUTER JOIN cn ON s_nationkey = c_nationkey
        """,
        "q_join_nullsafe": """
            WITH n AS (SELECT n_nationkey, n_name, nullif(n_regionkey, 0) AS rk FROM nation),
                 r AS (SELECT r_name, nullif(r_regionkey, 0) AS rk2 FROM region)
            SELECT n_nationkey, n_name, r_name
            FROM n JOIN r ON rk IS NOT DISTINCT FROM rk2
        """,
        "q_join_multi": """
            SELECT r_name, n_name,
                   round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
            GROUP BY r_name, n_name
        """,
        "q_semi_anti_join": """
            SELECT c_custkey, 1 AS has_orders FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            UNION ALL
            SELECT c_custkey, 0 AS has_orders FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "q_over_rank": """
            SELECT c_nationkey, c_custkey, rank FROM (
              SELECT c_nationkey, c_custkey,
                     row_number() OVER (PARTITION BY c_nationkey
                                        ORDER BY c_acctbal DESC, c_custkey ASC) AS rank
              FROM customer
            ) WHERE rank <= 3
        """,
        "q_top_n": """
            SELECT p_brand, p_partkey, p_retailprice, rank FROM (
              SELECT p_brand, p_partkey, p_retailprice,
                     row_number() OVER (PARTITION BY p_brand
                                        ORDER BY p_retailprice DESC, p_partkey ASC) AS rank
              FROM part
            ) WHERE rank <= 5
        """,
        "q_group_concat": """
            SELECT n_regionkey,
                   string_agg(coalesce(n_name, 'null'), ',' ORDER BY coalesce(n_name, 'null')) AS names,
                   count(*) AS n_nations
            FROM nation GROUP BY n_regionkey
        """,
        "q_scalar_functions": """
            SELECT p_partkey,
                   substr(p_name, 1, 5) AS name5,
                   CAST(ltrim(substr(p_brand, 7), '#') AS INT) AS brand_num,
                   CAST(p_size AS VARCHAR) AS size_str,
                   CAST(floor(p_retailprice) AS BIGINT) AS price_int
            FROM part
        """,
        "q_date_functions": """
            SELECT o_orderkey,
                   epoch_ms(o_orderdate) AS order_ms,
                   strftime(o_orderdate, '%Y-%m-%d') AS order_day,
                   strftime(o_orderdate, '%Y-%m') AS order_month,
                   strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS roundtrip
            FROM orders
        """,
        "q_transform_explode": """
            SELECT tok, count(*) AS n FROM (
              SELECT unnest(string_split(text, ' ')) AS tok FROM documents
            ) WHERE tok <> '' GROUP BY tok
        """,
        "q_union_distinct": """
            SELECT DISTINCT o_custkey FROM (
              SELECT o_custkey FROM orders WHERE o_totalprice > 200000
              UNION ALL
              SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            )
        """,
        "q_window_tumble": """
            SELECT event_type,
                   count(*) AS n,
                   round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS total,
                   (epoch_ms(ts) // 3600000) * 3600000 AS window_start,
                   (epoch_ms(ts) // 3600000) * 3600000 + 3600000 AS window_end
            FROM events
            GROUP BY event_type, window_start, window_end
        """,
        "q_window_slide": _HOP_EVENTS + """
            SELECT event_type, count(*) AS n,
                   window_start, window_start + 3600000 AS window_end
            FROM hops
            WHERE t >= window_start AND t < window_start + 3600000
            GROUP BY event_type, window_start
        """,
        "q_window_session": _SESSIONS_30M + """
            SELECT user_id, count(*) AS n,
                   round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS total,
                   min(t) AS session_start,
                   max(t) + 1800000 AS session_end
            FROM sess GROUP BY user_id, sid
        """,
        "q_over_by_size": """
            SELECT event_id, user_id,
                   round(avg(value) OVER w, 6) AS trailing_avg,
                   count(*) OVER w AS trailing_n
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        """,
        "q_over_by_duration": """
            WITH e AS (SELECT event_id, user_id, value, epoch_ms(ts) AS ts_ms FROM events)
            SELECT event_id, user_id,
                   round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE), 2) AS trailing_sum,
                   count(*) OVER w AS trailing_n
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
                         RANGE BETWEEN 3599999 PRECEDING AND CURRENT ROW)
        """,
        "q_flagship_top100": _HOP_EVENTS + """
            , agg AS (
              SELECT event_type, window_start, window_start + 3600000 AS window_end,
                     round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS sales_volume
              FROM hops
              WHERE t >= window_start AND t < window_start + 3600000
              GROUP BY event_type, window_start
            )
            SELECT window_start, window_end, event_type, sales_volume, rank FROM (
              SELECT *, row_number() OVER (PARTITION BY window_start
                                           ORDER BY sales_volume DESC, event_type ASC) AS rank
              FROM agg
            ) WHERE rank <= 100
        """,
    }
