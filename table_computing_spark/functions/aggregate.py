"""Aggregate function library with the reference's null semantics.

ref util/AggregationUtil.java:
  sumInt :17-28, sumLong :30-41 (returns double!), sumDouble :43-54,
  max :56-71, avg :73-75 (denominator counts null rows — not SQL AVG),
  groupConcat :8-15 (nulls rendered as the string 'null', input order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from table_computing_spark.table import ColumnLike, _col


def sum_int(c: ColumnLike) -> Column:
    """ref AggregationUtil.sumInt — null-skipping int sum."""
    return F.sum(_col(c)).cast("int")


def sum_long(c: ColumnLike) -> Column:
    """ref AggregationUtil.sumLong — NOTE the reference returns the long
    sum as a double; preserved here for parity."""
    return F.sum(_col(c)).cast("double")


def sum_double(c: ColumnLike) -> Column:
    return F.sum(_col(c).cast("double"))


def sum_exact(c: ColumnLike, scale: int = 4) -> Column:
    """Order-independent exact sum: cast to decimal first so partial
    aggregation order can't perturb low bits (doubles don't associate).
    Use for oracle-compared results and money columns."""
    return F.sum(_col(c).cast(f"decimal(30,{scale})"))


def max_ref(c: ColumnLike) -> Column:
    """ref AggregationUtil.max — null-skipping (matches SQL MAX)."""
    return F.max(_col(c))


def min_ref(c: ColumnLike) -> Column:
    return F.min(_col(c))


def avg_ref(c: ColumnLike) -> Column:
    """ref AggregationUtil.avg:73-75 — sumDouble / rows.size(): the
    denominator counts rows whose value is NULL (SQL AVG ignores them).
    """
    return F.sum(_col(c).cast("double")) / F.count(F.lit(1))


def count_all() -> Column:
    """rows.size() inside the reference UDAF (TableTest.java:119)."""
    return F.count(F.lit(1))


def group_concat(c: ColumnLike, sort: bool = True, sep: str = ",") -> Column:
    """ref AggregationUtil.groupConcat:8-15 — comma-joined values with
    NULL rendered as the literal string 'null'.

    The reference preserves input order (single-threaded per group);
    under a distributed shuffle input order is nondeterministic, so the
    deterministic contract here is sorted order (sort=False opts out,
    for single-partition / pre-sorted pipelines).
    """
    lst = F.collect_list(F.coalesce(_col(c).cast("string"), F.lit("null")))
    if sort:
        lst = F.sort_array(lst)
    return F.array_join(lst, sep)


def moment_stats(
    df,
    x: str,
    y: str,
    by: "list[str]",
    x_scale: int = 0,
    y_scale: int = 2,
):
    """Population mean/variance/correlation per group from EXACT
    integer-unit sums (x at 10^-x_scale resolution, y at 10^-y_scale).

    Why not corr()/var_pop(): their double accumulators are
    order-dependent, so results drift across partitionings and engines.
    Here the five moments (Σx, Σy, Σx², Σy², Σxy) are summed as exact
    decimals — associative, partitioning-independent — and only the
    final closed-form formulas run in floating point, on identical
    integer inputs in an identical operation order. Engine-portable to
    the last bit (before the 6-dp round), and the map-side partial agg
    still applies.
    """
    xi = F.round(F.col(x) * (10 ** x_scale)).cast("decimal(38,0)")
    yi = F.round(F.col(y) * (10 ** y_scale)).cast("decimal(38,0)")
    g = df.select(*by, xi.alias("__x"), yi.alias("__y")).groupBy(*by)
    m = g.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("syy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
    )
    n_d = F.col("n").cast("double")
    fx, fy = float(10 ** x_scale), float(10 ** y_scale)
    var_num_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    var_num_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    corr_num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    return m.select(
        *by,
        F.col("n").cast("long").alias("n"),
        F.round(F.col("sx").cast("double") / (n_d * fx), 6).alias("mean_x"),
        F.round(F.col("sy").cast("double") / (n_d * fy), 6).alias("mean_y"),
        F.round(var_num_x / (n_d * n_d * fx * fx), 6).alias("var_x"),
        F.round(var_num_y / (n_d * n_d * fy * fy), 6).alias("var_y"),
        F.round(corr_num / (F.sqrt(var_num_x) * F.sqrt(var_num_y)), 6).alias("corr_xy"),
    )


def linreg(
    df,
    x: str,
    y: str,
    by: "list[str]",
    x_scale: int = 0,
    y_scale: int = 2,
):
    """Per-group ordinary-least-squares fit y = slope·x + intercept
    from the same EXACT integer-unit moment sums as moment_stats —
    order-independent decimal accumulation, closed-form solve in
    floating point on identical inputs in identical op order, so slope
    and intercept match bit-for-bit in any engine (before the round).
    R² comes from the same five moments. One hash aggregation with
    map-side partials; the trend-per-key primitive for metric series.
    """
    xi = F.round(F.col(x) * (10 ** x_scale)).cast("decimal(38,0)")
    yi = F.round(F.col(y) * (10 ** y_scale)).cast("decimal(38,0)")
    g = df.select(*by, xi.alias("__x"), yi.alias("__y")).groupBy(*by)
    m = g.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("syy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
    )
    fx, fy = float(10 ** x_scale), float(10 ** y_scale)
    n_d = F.col("n").cast("double")
    sxx_c = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    syy_c = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    sxy_c = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    # slope in original units: (cov/var_x) * (fx/fy)
    slope = sxy_c / sxx_c * (fx / fy)
    mean_x = F.col("sx").cast("double") / (n_d * fx)
    mean_y = F.col("sy").cast("double") / (n_d * fy)
    return m.select(
        *by,
        F.col("n").cast("long").alias("n"),
        F.round(slope, 9).alias("slope"),
        F.round(mean_y - slope * mean_x, 6).alias("intercept"),
        F.round((sxy_c * sxy_c) / (sxx_c * syy_c), 6).alias("r2"),
    )


def group_quantiles(
    df,
    value_col: str,
    by: "list[str]",
    qs: "tuple[float, ...]" = (0.25, 0.5, 0.75),
    round_to: int = 6,
):
    """EXACT linearly-interpolated quantiles per group (numpy/type-7:
    index (n-1)·q, value = lo·(1-frac) + hi·frac) WITHOUT collecting
    the group into an array: one sort-within-group window pass ranks
    the rows, then a conditional aggregate picks the two bracketing
    order statistics per quantile. Output columns are q25/q50/... .

    Why not percentile_approx: it is approximate; why not
    collect_list+sort: the group materializes on one executor. Here
    memory per task is O(1) beyond the sort — the scalable exact path
    for per-group quantiles (the GLOBAL-column variant with bounded
    driver traffic is operators/quantiles.exact_quantiles).

    The interpolation is a fixed-op-order double expression on exact
    order statistics, so results hash-match DuckDB's mirror of the
    same construction (never quantile_cont, whose interpolation op
    order is engine-private)."""
    from pyspark.sql.window import Window as W

    keys = [F.col(c) for c in by]
    wall = W.partitionBy(*keys)
    base = df.select(
        *keys,
        F.col(value_col).cast("double").alias("__v"),
    ).select(
        *keys,
        "__v",
        F.row_number().over(wall.orderBy(F.col("__v").asc())).alias("__rn"),
        F.count(F.lit(1)).over(wall).alias("__n"),
    )
    aggs = [F.max("__n").cast("long").alias("n")]
    names = []
    for q in qs:
        name = f"q{int(round(q * 100))}"
        names.append(name)
        idx = (F.col("__n") - F.lit(1)).cast("double") * F.lit(float(q))
        lo = F.floor(idx).cast("long") + 1
        hi = F.ceil(idx).cast("long") + 1
        frac = idx - F.floor(idx)
        aggs.append(F.min(F.when(F.col("__rn") == lo, F.col("__v"))).alias(f"__lo_{name}"))
        aggs.append(F.min(F.when(F.col("__rn") == hi, F.col("__v"))).alias(f"__hi_{name}"))
        aggs.append(F.min(F.when(F.col("__rn") == 1, frac)).alias(f"__fr_{name}"))
    agg = base.groupBy(*keys).agg(*aggs)
    outs = [*by, "n"]
    for name in names:
        val = (
            F.col(f"__lo_{name}") * (F.lit(1.0) - F.col(f"__fr_{name}"))
            + F.col(f"__hi_{name}") * F.col(f"__fr_{name}")
        )
        agg = agg.withColumn(name, F.round(val, round_to))
        outs.append(name)
    return agg.select(*outs)


def corr_matrix(
    df,
    cols: "dict[str, int]",
    by: "list[str] | None" = None,
    round_to: int = 6,
):
    """Pairwise Pearson correlation matrix over k numeric columns in
    ONE aggregation pass — the feature-selection / profiling
    primitive. `cols` maps column → decimal scale (values are
    converted to integer units like moment_stats/linreg, so the
    k + k + k(k−1)/2 moment sums accumulate order-independently in
    DECIMAL and every engine reproduces each r bit-for-bit from
    identical closed-form inputs).

    Output: one row per unordered pair (col_x, col_y in input order),
    with (by..., col_x, col_y, n, r); r is NULL when either side is
    constant. Shape: one hash aggregate over the data (map-side
    partials; shuffle width k²/2 sums per group), then k(k−1)/2
    column-arithmetic selects over the tiny per-group moment table —
    the data is never rescanned per pair, which is the whole point at
    100 TB (k scans → 1 scan).
    """
    from functools import reduce

    names = list(cols)
    by = list(by or [])
    ivals = [
        F.round(F.col(c) * (10 ** cols[c])).cast("decimal(38,0)").alias(f"__v{i}")
        for i, c in enumerate(names)
    ]
    sel = df.select(*by, *ivals)
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("n")]
    for i in range(len(names)):
        aggs.append(F.sum(F.col(f"__v{i}")).alias(f"s{i}"))
        aggs.append(F.sum(F.col(f"__v{i}") * F.col(f"__v{i}")).alias(f"q{i}"))
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            aggs.append(F.sum(F.col(f"__v{i}") * F.col(f"__v{j}")).alias(f"p{i}_{j}"))
    g = sel.groupBy(*by).agg(*aggs)
    outs = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            num = (F.col("n") * F.col(f"p{i}_{j}") - F.col(f"s{i}") * F.col(f"s{j}")).cast("double")
            dx = (F.col("n") * F.col(f"q{i}") - F.col(f"s{i}") * F.col(f"s{i}")).cast("double")
            dy = (F.col("n") * F.col(f"q{j}") - F.col(f"s{j}") * F.col(f"s{j}")).cast("double")
            r = F.when((dx > 0) & (dy > 0), num / F.sqrt(dx * dy))
            outs.append(
                g.select(
                    *by,
                    F.lit(names[i]).alias("col_x"),
                    F.lit(names[j]).alias("col_y"),
                    F.col("n").cast("long").alias("n"),
                    F.round(r, round_to).alias("r"),
                )
            )
    return reduce(lambda a, b: a.unionByName(b), outs)
