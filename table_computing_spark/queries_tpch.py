"""TPC-H-shaped analytical queries over the Table API.

The reference's users hand-write relational plans in Java lambdas; the
equivalence claim of this engine is that every such analytical shape is
expressible (and optimizer-planned) here. These cover the classic
shapes not already exercised by the operator queries in
__spark_entry__.py: top-k join aggregation (Q3), conditional aggregates
(Q12/Q14), double aggregation distributions (Q13), join-on-aggregate
(Q15), correlated-average subqueries (Q17), HAVING (Q18), and anti-join
with scalar subquery (Q22). All run on the driver's star schema (no
partsupp table, so Q2/Q11/Q16/Q20 shapes are out of reach).

Every aggregate that sums doubles casts to DECIMAL first so results are
addition-order-independent (oracle-hash-safe); see __spark_entry__
docstring.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from table_computing_spark import functions as tcf
from table_computing_spark.sources.parquet import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _dsum(col_expr, scale=6, round_to=2):
    return F.round(
        F.sum(col_expr.cast(f"decimal(30,{scale})")).cast("double"), round_to
    )


def q3_unshipped_revenue(spark, sf_dir):
    """Q3: top-10 unshipped orders by revenue (join, agg, total-order
    top-k with tiebreak)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1997-06-01"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1997-06-01"))
    return (
        c.join(o, on=[("c_custkey", "o_custkey")], null_safe=False)
        .join(li, on=[("o_orderkey", "l_orderkey")], null_safe=False)
        .group_by(
            ["o_orderkey"],
            revenue=_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            order_ms=F.min(tcf.epoch_ms("o_orderdate")),
        )
        .order_by(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .df
    )


def q12_shipmode_priority(spark, sf_dir):
    """Q12: conditional aggregation — CASE WHEN counts per ship bucket
    (the reference would hand-code this in an AggregationFunction)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    is_urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int")
    return (
        li.filter(F.col("l_shipdate") >= F.lit("1997-01-01"))
        .join(o, on=[("l_orderkey", "o_orderkey")], null_safe=False)
        .select(
            bucket=F.when(F.col("l_quantity") >= 25, "bulk").otherwise("small"),
            urgent=is_urgent,
        )
        .group_by(
            ["bucket"],
            high_line_count=F.sum(F.col("urgent")),
            low_line_count=F.sum(1 - F.col("urgent")),
        )
        .df
    )


def q13_order_distribution(spark, sf_dir):
    """Q13: customers-per-order-count distribution (left join preserving
    zero-order customers, then aggregate of an aggregate)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").startswith("4")
    )
    per_cust = c.left_join(o, on=[("c_custkey", "o_custkey")], null_safe=False).group_by(
        ["c_custkey"], c_count=F.count("o_orderkey")
    )
    return per_cust.group_by(["c_count"], custdist=tcf.count_all()).df


def q14_promo_revenue(spark, sf_dir):
    """Q14: promo revenue share — conditional numerator over a common
    denominator in one pass."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
        F.lit(0).cast("decimal(30,6)")
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-02-01"))
        )
        .join(p, on=[("l_partkey", "p_partkey")], null_safe=False, broadcast_other=True)
        .group_by(
            [],
            promo_revenue=F.round(
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(rev).cast("double"),
                4,
            ),
            n=tcf.count_all(),
        )
        .df
    )


def q15_top_supplier(spark, sf_dir):
    """Q15: supplier(s) with maximum revenue — aggregate, then join on
    the aggregate's max (the view + scalar subquery shape)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    rev = li.group_by(
        ["l_suppkey"],
        total_revenue=_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
    )
    mx = rev.group_by([], mx=F.max("total_revenue"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.join(mx, on=[("total_revenue", "mx")], null_safe=False, broadcast_other=True)
        .join(s, on=[("l_suppkey", "s_suppkey")], null_safe=False)
        .select("s_suppkey", "s_nationkey", "total_revenue")
        .df
    )


def q17_small_quantity_revenue(spark, sf_dir):
    """Q17: correlated average subquery — lineitems below 20% of their
    part's average quantity (decorrelated into a join, which is exactly
    what an optimizer does; the reference user would build an Index)."""
    li = _t(spark, sf_dir, "lineitem")
    avg_qty = li.group_by(
        ["l_partkey"],
        threshold=F.round(F.lit(0.2) * F.avg("l_quantity"), 10),
    )
    return (
        li.join(avg_qty, on=["l_partkey"], null_safe=False)
        .filter(F.col("l_quantity") < F.col("threshold"))
        .group_by(
            [],
            avg_yearly=F.round(
                tcf.sum_exact("l_extendedprice").cast("double") / 7.0, 4
            ),
            n=tcf.count_all(),
        )
        .df
    )


def q18_large_orders(spark, sf_dir):
    """Q18: HAVING over a join — orders whose total quantity exceeds
    250, with customer attribution."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.group_by(["l_orderkey"], total_qty=F.sum("l_quantity"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(o, on=[("l_orderkey", "o_orderkey")], null_safe=False)
        .join(c, on=[("o_custkey", "c_custkey")], null_safe=False)
        .select("c_custkey", "l_orderkey", "total_qty", price=F.col("o_totalprice"))
        .df
    )


def q22_global_sales_opportunity(spark, sf_dir):
    """Q22: anti join + scalar subquery — customers above the average
    balance of positive-balance customers, who have no orders, grouped
    by nation key (stands in for the phone-prefix country code)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).group_by(
        [], abal=F.avg("c_acctbal")
    )
    rich = (
        c.join(avg_bal, on=[], null_safe=False, broadcast_other=True)
        .filter(F.col("c_acctbal") > F.col("abal"))
    )
    no_orders = rich.anti_join(o, on=[("c_custkey", "o_custkey")])
    return no_orders.group_by(
        ["c_nationkey"],
        numcust=tcf.count_all(),
        totacctbal=_dsum(F.col("c_acctbal"), scale=2),
    ).df


TPCH_QUERIES = {
    "q_tpch_q3": q3_unshipped_revenue,
    "q_tpch_q12": q12_shipmode_priority,
    "q_tpch_q13": q13_order_distribution,
    "q_tpch_q14": q14_promo_revenue,
    "q_tpch_q15": q15_top_supplier,
    "q_tpch_q17": q17_small_quantity_revenue,
    "q_tpch_q18": q18_large_orders,
    "q_tpch_q22": q22_global_sales_opportunity,
}

TPCH_ORACLES = {
    "q_tpch_q3": """
        SELECT o_orderkey,
               round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 2) AS revenue,
               min(epoch_ms(o_orderdate)) AS order_ms
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-06-01'
          AND l_shipdate  > TIMESTAMP '1997-06-01'
        GROUP BY o_orderkey
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    "q_tpch_q12": """
        SELECT CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'small' END AS bucket,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS high_line_count,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        GROUP BY 1
    """,
    "q_tpch_q13": """
        SELECT c_count, count(*) AS custdist FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '4%'
          GROUP BY c_custkey
        ) GROUP BY c_count
    """,
    "q_tpch_q14": """
        SELECT round(100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))
                     ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)
                 / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 4) AS promo_revenue,
               count(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-02-01'
    """,
    "q_tpch_q15": """
        WITH rev AS (
          SELECT l_suppkey,
                 round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 2) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_nationkey, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    "q_tpch_q17": """
        WITH t AS (
          SELECT l_partkey, round(0.2 * avg(l_quantity), 10) AS threshold
          FROM lineitem GROUP BY l_partkey
        )
        SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) / 7.0, 4) AS avg_yearly,
               count(*) AS n
        FROM lineitem JOIN t USING (l_partkey)
        WHERE l_quantity < threshold
    """,
    "q_tpch_q18": """
        WITH big AS (
          SELECT l_orderkey, sum(l_quantity) AS total_qty
          FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
        )
        SELECT c_custkey, l_orderkey, total_qty, o_totalprice AS price
        FROM big
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "q_tpch_q22": """
        SELECT c_nationkey, count(*) AS numcust,
               round(CAST(sum(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey
    """,
}
