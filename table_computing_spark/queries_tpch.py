"""TPC-H-shaped analytical queries over the Table API.

The reference's users hand-write relational plans in Java lambdas; the
equivalence claim of this engine is that every such analytical shape is
expressible (and optimizer-planned) here. These cover the classic
shapes not already exercised by the operator queries in
__spark_entry__.py — all 22 classic TPC-H query structures. The
driver's star schema has no partsupp table and no commit/receipt
dates, so Q2/Q4/Q9/Q11/Q16/Q20/Q21 keep the original's JOIN/subquery
STRUCTURE with an adapted predicate (each docstring states the
substitution); the rest are near-verbatim.

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


def q1_pricing_summary(spark, sf_dir):
    """Q1: full-scan pricing summary — the canonical wide aggregate.
    Quantity sums are exact (integer-valued doubles); price/charge sums
    go through DECIMAL so the result is addition-order-independent."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    cnt = tcf.count_all()
    return (
        li.group_by(
            ["l_returnflag", "l_linestatus"],
            sum_qty=F.sum("l_quantity"),
            sum_base_price=_dsum(F.col("l_extendedprice")),
            sum_disc_price=_dsum(disc_price),
            sum_charge=_dsum(charge),
            avg_qty=F.round(F.sum("l_quantity") / cnt, 4),
            avg_price=F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).cast("double")
                / cnt,
                4,
            ),
            avg_disc=F.round(
                F.sum(F.col("l_discount").cast("decimal(30,6)")).cast("double") / cnt,
                4,
            ),
            count_order=tcf.count_all(),
        ).df
    )


def q2_best_supplier(spark, sf_dir):
    """Q2 (adapted: no partsupp/supplycost): for each STANDARD size-15
    part, the richest supplier (max s_acctbal) among suppliers that ever
    shipped it, restricted to EUROPE. The original's correlated min()
    subquery decorrelates to a PARTITION-MAX WINDOW over the candidate
    set — one pass plus one shuffle on p_partkey — instead of the
    textbook aggregate-then-self-join, which would compute the whole
    candidate subtree (including the lineitem distinct) twice."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    pairs = _t(spark, sf_dir, "lineitem").project("l_partkey", "l_suppkey").distinct()
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cand = (
        pairs.join(p, on=[("l_partkey", "p_partkey")], null_safe=False, broadcast_other=True)
        .join(s, on=[("l_suppkey", "s_suppkey")], null_safe=False)
        .join(n, on=[("s_nationkey", "n_nationkey")], null_safe=False, broadcast_other=True)
        .join(r, on=[("n_regionkey", "r_regionkey")], null_safe=False, broadcast_other=True)
    )
    from pyspark.sql.window import Window as W

    return (
        cand.select_all(best_bal=F.max("s_acctbal").over(W.partitionBy("p_partkey")))
        .filter(F.col("s_acctbal") == F.col("best_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey")
        .order_by(
            F.col("s_acctbal").desc(), F.col("n_name").asc(),
            F.col("s_name").asc(), F.col("p_partkey").asc(),
        )
        .limit(100)
        .df
    )


def q4_order_priority(spark, sf_dir):
    """Q4 (adapted: no commit/receipt dates — 'problem order' = has a
    returned lineitem): EXISTS decorrelated to a semi join, priority
    histogram over one quarter."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01"))
        & (F.col("o_orderdate") < F.lit("1997-10-01"))
    )
    returned = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.semi_join(returned, on=[("o_orderkey", "l_orderkey")])
        .group_by(["o_orderpriority"], order_count=tcf.count_all())
        .df
    )


def q5_local_supplier_volume(spark, sf_dir):
    """Q5: six-table star join — revenue where the supplier and the
    customer share a nation, per ASIA nation. The residual
    c_nationkey = s_nationkey predicate rides as a post-join filter
    (Catalyst pushes it into the join)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, on=[("c_custkey", "o_custkey")], null_safe=False)
        .join(li, on=[("o_orderkey", "l_orderkey")], null_safe=False)
        .join(s, on=[("l_suppkey", "s_suppkey")], null_safe=False, broadcast_other=True)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(n, on=[("s_nationkey", "n_nationkey")], null_safe=False, broadcast_other=True)
        .join(r, on=[("n_regionkey", "r_regionkey")], null_safe=False, broadcast_other=True)
        .group_by(
            ["n_name"],
            revenue=_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
        )
        .df
    )


def q6_forecast_revenue(spark, sf_dir):
    """Q6: pure scan-filter-aggregate — the predicate-pushdown poster
    child (no join, no shuffle beyond the final partial-agg merge)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.group_by(
        [],
        revenue=_dsum(F.col("l_extendedprice") * F.col("l_discount")),
        n=tcf.count_all(),
    ).df


def q7_volume_shipping(spark, sf_dir):
    """Q7: bidirectional nation-pair trade volume by ship year — the
    two-aliased-dimension join (nation joined once for the supplier
    side, once for the customer side)."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        sn_key=F.col("n_nationkey"), supp_nation=F.col("n_name")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        cn_key=F.col("n_nationkey"), cust_nation=F.col("n_name")
    )
    pair_ok = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        s.join(li, on=[("s_suppkey", "l_suppkey")], null_safe=False)
        .join(o, on=[("l_orderkey", "o_orderkey")], null_safe=False)
        .join(c, on=[("o_custkey", "c_custkey")], null_safe=False)
        .join(n1, on=[("s_nationkey", "sn_key")], null_safe=False, broadcast_other=True)
        .join(n2, on=[("c_nationkey", "cn_key")], null_safe=False, broadcast_other=True)
        .filter(pair_ok)
        .select_all(l_year=F.year("l_shipdate"))
        .group_by(
            ["supp_nation", "cust_nation", "l_year"],
            revenue=_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
        )
        .df
    )


def q8_market_share(spark, sf_dir):
    """Q8: national market share — ratio of two conditional decimal
    sums per order year, over a five-join constellation (parts of one
    type, customers in AMERICA, supplier nation as numerator flag)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n_c = _t(spark, sf_dir, "nation").select(
        cn_key=F.col("n_nationkey"), cn_region=F.col("n_regionkey")
    )
    n_s = _t(spark, sf_dir, "nation").select(
        sn_key=F.col("n_nationkey"), supp_nation=F.col("n_name")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
    nat_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast("decimal(30,6)")
    )
    return (
        li.join(p, on=[("l_partkey", "p_partkey")], null_safe=False, broadcast_other=True)
        .join(o, on=[("l_orderkey", "o_orderkey")], null_safe=False)
        .join(c, on=[("o_custkey", "c_custkey")], null_safe=False)
        .join(s, on=[("l_suppkey", "s_suppkey")], null_safe=False, broadcast_other=True)
        .join(n_c, on=[("c_nationkey", "cn_key")], null_safe=False, broadcast_other=True)
        .join(r, on=[("cn_region", "r_regionkey")], null_safe=False, broadcast_other=True)
        .join(n_s, on=[("s_nationkey", "sn_key")], null_safe=False, broadcast_other=True)
        .select_all(o_year=F.year("o_orderdate"))
        .group_by(
            ["o_year"],
            mkt_share=F.round(
                F.sum(nat_vol).cast("double") / F.sum(vol).cast("double"), 4
            ),
            total=F.round(F.sum(vol).cast("double"), 2),
        )
        .df
    )


def q9_product_profit(spark, sf_dir):
    """Q9 (adapted: profit = revenue, no ps_supplycost term): per
    supplier-nation per order-year revenue on 'widget' parts — the
    LIKE-filtered five-way join with a two-key aggregate."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(p, on=[("l_partkey", "p_partkey")], null_safe=False, broadcast_other=True)
        .join(s, on=[("l_suppkey", "s_suppkey")], null_safe=False, broadcast_other=True)
        .join(o, on=[("l_orderkey", "o_orderkey")], null_safe=False)
        .join(n, on=[("s_nationkey", "n_nationkey")], null_safe=False, broadcast_other=True)
        .select_all(o_year=F.year("o_orderdate"))
        .group_by(
            ["n_name", "o_year"],
            sum_profit=_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
        )
        .df
    )


def q10_returned_items(spark, sf_dir):
    """Q10: top-20 customers by revenue lost to returns in one quarter
    (join + agg + deterministic total-order top-k)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, on=[("c_custkey", "o_custkey")], null_safe=False)
        .join(li, on=[("o_orderkey", "l_orderkey")], null_safe=False)
        .join(n, on=[("c_nationkey", "n_nationkey")], null_safe=False, broadcast_other=True)
        .group_by(
            ["c_custkey", "c_name", "c_acctbal", "n_name"],
            revenue=_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
        )
        .order_by(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .df
    )


def q11_important_stock(spark, sf_dir):
    """Q11 (adapted: stock value = shipped extendedprice*quantity, no
    partsupp): parts of NATION_5's suppliers worth more than 0.1% of
    that nation's total — groupBy with a broadcast scalar-aggregate
    threshold."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    base = li.join(
        s, on=[("l_suppkey", "s_suppkey")], null_safe=False, broadcast_other=True
    ).join(n, on=[("s_nationkey", "n_nationkey")], null_safe=False, broadcast_other=True)
    per_part = base.group_by(
        ["l_partkey"],
        part_value=F.sum(
            (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(30,6)")
        ),
    )
    total = per_part.group_by([], threshold=F.sum("part_value") * F.lit(0.001))
    return (
        per_part.join(total, on=[], null_safe=False, broadcast_other=True)
        .filter(F.col("part_value").cast("double") > F.col("threshold").cast("double"))
        .select(
            "l_partkey", value=F.round(F.col("part_value").cast("double"), 2)
        )
        .df
    )


def q16_supplier_counts(spark, sf_dir):
    """Q16 (adapted: supplier-part relationships from lineitem, no
    partsupp): distinct supplier count per (brand, type, size) slice
    with NOT-style predicates."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(p, on=[("l_partkey", "p_partkey")], null_safe=False, broadcast_other=True)
        .group_by(
            ["p_brand", "p_type", "p_size"],
            supplier_cnt=F.count_distinct(F.col("l_suppkey")),
        )
        .df
    )


def q19_discounted_revenue(spark, sf_dir):
    """Q19: disjunctive multi-attribute predicate over a part join —
    three OR'd brand/quantity/size envelopes in one pass."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11)
            & (F.col("p_size") >= 1) & (F.col("p_size") <= 5)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20)
            & (F.col("p_size") >= 1) & (F.col("p_size") <= 10)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30)
            & (F.col("p_size") >= 1) & (F.col("p_size") <= 15)
        )
    )
    return (
        li.join(p, on=[("l_partkey", "p_partkey")], null_safe=False, broadcast_other=True)
        .filter(cond)
        .group_by(
            [],
            revenue=_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            n=tcf.count_all(),
        )
        .df
    )


def q20_promotion_suppliers(spark, sf_dir):
    """Q20 (adapted: 'has surplus stock' = shipped > 100 units in 1997,
    no partsupp availqty): nested semi-join chain — parts by name
    prefix → heavy (supplier, part) shipments → suppliers in
    NATION_7."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    heavy = (
        li.semi_join(p, on=[("l_partkey", "p_partkey")])
        .group_by(["l_suppkey", "l_partkey"], qty=F.sum("l_quantity"))
        .filter(F.col("qty") > 100)
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    return (
        s.semi_join(heavy, on=[("s_suppkey", "l_suppkey")])
        .join(n, on=[("s_nationkey", "n_nationkey")], null_safe=False, broadcast_other=True)
        .select("s_suppkey", "s_name")
        .df
    )


def q21_waiting_suppliers(spark, sf_dir):
    """Q21 (adapted: 'the supplier who failed' = sole returned-flag
    supplier on a multi-supplier finished order): the EXISTS/NOT-EXISTS
    pair decorrelated into one per-order aggregate — n_supp >= 2 (some
    other supplier exists) and r_supp == 1 (no other supplier also
    returned). Oracle states it as the original correlated EXISTS /
    NOT EXISTS, proving the rewrite."""
    li = _t(spark, sf_dir, "lineitem")
    ord_stats = li.group_by(
        ["l_orderkey"],
        n_supp=F.count_distinct(F.col("l_suppkey")),
        r_supp=F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ),
    ).rename({"l_orderkey": "so_key"})
    l1 = li.filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    return (
        l1.join(o, on=[("l_orderkey", "o_orderkey")], null_safe=False)
        .join(ord_stats, on=[("l_orderkey", "so_key")], null_safe=False)
        .filter((F.col("n_supp") >= 2) & (F.col("r_supp") == 1))
        .join(s, on=[("l_suppkey", "s_suppkey")], null_safe=False, broadcast_other=True)
        .group_by(["s_name"], numwait=tcf.count_all())
        .order_by(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
        .df
    )


TPCH_QUERIES = {
    "q_tpch_q1": q1_pricing_summary,
    "q_tpch_q2": q2_best_supplier,
    "q_tpch_q4": q4_order_priority,
    "q_tpch_q5": q5_local_supplier_volume,
    "q_tpch_q6": q6_forecast_revenue,
    "q_tpch_q7": q7_volume_shipping,
    "q_tpch_q8": q8_market_share,
    "q_tpch_q9": q9_product_profit,
    "q_tpch_q10": q10_returned_items,
    "q_tpch_q11": q11_important_stock,
    "q_tpch_q16": q16_supplier_counts,
    "q_tpch_q19": q19_discounted_revenue,
    "q_tpch_q20": q20_promotion_suppliers,
    "q_tpch_q21": q21_waiting_suppliers,
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
    "q_tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE), 2) AS sum_base_price,
               round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 2) AS sum_disc_price,
               round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE), 2) AS sum_charge,
               round(sum(l_quantity) / count(*), 4) AS avg_qty,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / count(*), 4) AS avg_price,
               round(CAST(sum(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) / count(*), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q_tpch_q2": """
        WITH cand AS (
          SELECT DISTINCT p_partkey, s_suppkey, s_name, s_acctbal, n_name
          FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
          JOIN part     ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
          WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey
        FROM cand
        WHERE s_acctbal = (SELECT max(s_acctbal) FROM cand c2
                           WHERE c2.p_partkey = cand.p_partkey)
        ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
        LIMIT 100
    """,
    "q_tpch_q4": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01'
          AND o_orderdate <  TIMESTAMP '1997-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
    """,
    "q_tpch_q5": """
        SELECT n_name,
               round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "q_tpch_q6": """
        SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE), 2) AS revenue,
               count(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q_tpch_q7": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 2) AS revenue
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "q_tpch_q8": """
        SELECT year(o_orderdate) AS o_year,
               round(CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                          THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))
                          ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)
                   / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 4) AS mkt_share,
               round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 2) AS total
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY o_year
    """,
    "q_tpch_q9": """
        SELECT n_name, year(o_orderdate) AS o_year,
               round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 2) AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY n_name, o_year
    """,
    "q_tpch_q10": """
        SELECT c_custkey, c_name, c_acctbal, n_name,
               round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-04-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "q_tpch_q11": """
        WITH per_part AS (
          SELECT l_partkey,
                 sum(CAST(l_extendedprice * l_quantity AS DECIMAL(30,6))) AS part_value
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_5'
          GROUP BY l_partkey
        )
        SELECT l_partkey, round(CAST(part_value AS DOUBLE), 2) AS value
        FROM per_part
        WHERE CAST(part_value AS DOUBLE) >
              (SELECT CAST(sum(part_value) * 0.001 AS DOUBLE) FROM per_part)
    """,
    "q_tpch_q16": """
        SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        GROUP BY p_brand, p_type, p_size
    """,
    "q_tpch_q19": """
        SELECT round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 2) AS revenue,
               count(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#11' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
           OR (p_brand = 'Brand#13' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
           OR (p_brand = 'Brand#15' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
    """,
    "q_tpch_q20": """
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
          AND s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY l_suppkey, l_partkey
            HAVING sum(l_quantity) > 100
          )
    """,
    "q_tpch_q21": """
        SELECT s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN orders   ON l1.l_orderkey = o_orderkey
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 100
    """,
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
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
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
