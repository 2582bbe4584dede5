"""Table — the relational-operator surface of the reference, Spark-first.

The reference's Table (table/Table.java) is an eager, single-node,
columnar batch; every operator takes a user lambda. Here Table is a thin
wrapper over a lazy DataFrame: declarative expressions are the fast path
(whole-stage codegen), and each reference UDF interface keeps an
Arrow-batched pandas escape hatch for opaque logic.

Reference semantics preserved on purpose:
  * joins match NULL keys to each other (TableTest.java:209-232) →
    `eqNullSafe` is the default equality; pass null_safe=False for ANSI.
  * `select` with a row-function drops rows whose function returns null
    (table/Table.java:306-331) — see `select_rows`.
  * column-name collisions on join are resolved by caller rename maps
    (table/As.java:6-17) → the `rename=` argument.
  * group_concat renders nulls as the string 'null' in deterministic
    order (util/AggregationUtil.java:8-15) → functions.aggregate.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

ColumnLike = Column | str


def _col(c: ColumnLike) -> Column:
    return c if isinstance(c, Column) else F.col(c)


class Table:
    """Wraps a DataFrame with the reference's operator names/semantics."""

    def __init__(self, df: DataFrame, name: str = "t"):
        self._df = df
        self.name = name

    # -- plumbing ---------------------------------------------------------

    @property
    def df(self) -> DataFrame:
        return self._df

    def _wrap(self, df: DataFrame, name: str | None = None) -> "Table":
        return Table(df, name or self.name)

    @property
    def columns(self) -> list[str]:
        return self._df.columns

    def size(self) -> int:
        """ref table/Table.java size(); an action in Spark."""
        return self._df.count()

    def print(self, n: int = 100) -> None:
        """ref table/Table.java:48-67 (console sink)."""
        self._df.show(n, truncate=False)

    def explain(self, mode: str = "formatted") -> None:
        self._df.explain(mode)

    # -- projection / filter / row transforms (ref §2.2) -------------------

    def filter(self, condition: ColumnLike) -> "Table":
        """ref table/Table.java:265-280 (Criteria row predicate).

        `condition` is a Column expression or SQL string — the
        declarative fast path Catalyst can push into the scan. For
        opaque Python predicates use `filter_rows`.
        """
        cond = F.expr(condition) if isinstance(condition, str) else condition
        return self._wrap(self._df.filter(cond))

    def filter_rows(self, predicate: Callable, *cols: str) -> "Table":
        """Opaque predicate over row values via an Arrow-batched pandas
        UDF (slow path — ref criteria/Criteria.java:5-7)."""
        import pandas as pd  # noqa: F401

        from pyspark.sql.functions import pandas_udf

        @pandas_udf(T.BooleanType())
        def _pred(*series):
            import pandas as pd

            frame = pd.concat(series, axis=1)
            return frame.apply(lambda r: bool(predicate(*r)), axis=1)

        use = list(cols) if cols else self._df.columns
        return self._wrap(self._df.filter(_pred(*[F.col(c) for c in use])))

    def select(self, *exprs: ColumnLike, **named: ColumnLike) -> "Table":
        """Declarative projection (ref table/Table.java:306-331 fast path).

        `named` kwargs become aliased output columns:
            t.select("a", total=F.col("x") + F.col("y"))
        """
        out = [_col(e) for e in exprs]
        out += [_col(e).alias(n) for n, e in named.items()]
        return self._wrap(self._df.select(*out))

    def select_all(self, **named: ColumnLike) -> "Table":
        """selectAll=true variant: keep existing columns, append computed
        ones (ref table/Table.java:306-331)."""
        return self._wrap(self._df.withColumns({n: _col(e) for n, e in named.items()}))

    def select_rows(
        self,
        fn: Callable,
        output_schema: T.StructType,
        select_all: bool = False,
    ) -> "Table":
        """ScalarFunction escape hatch: `fn(row_dict) -> tuple | None`;
        returning None DROPS the row (filter fused into project — ref
        table/Table.java:306-331, function/ScalarFunction.java).

        Runs via mapInPandas (Arrow batches); at scale prefer `select`.
        """
        in_cols = self._df.columns
        full = (
            T.StructType(self._df.schema.fields + output_schema.fields)
            if select_all
            else output_schema
        )
        out_names = [f.name for f in output_schema.fields]

        def _map(batches):
            import pandas as pd

            for pdf in batches:
                rows = []
                for rec in pdf.to_dict("records"):
                    res = fn(rec)
                    if res is None:
                        continue
                    vals = list(res) if isinstance(res, (tuple, list)) else [res]
                    if select_all:
                        rows.append([rec[c] for c in in_cols] + vals)
                    else:
                        rows.append(vals)
                cols = (in_cols + out_names) if select_all else out_names
                yield pd.DataFrame(rows, columns=cols)

        return self._wrap(self._df.mapInPandas(_map, schema=full))

    def transform_rows(
        self,
        fn: Callable,
        output_schema: T.StructType,
        select_all: bool = False,
    ) -> "Table":
        """TransformFunction (UDTF): `fn(row_dict) -> list[tuple] | None`
        — one input row to N output rows; None/[] drops the row (ref
        table/Table.java:333-373, function/TransformFunction.java:7-9).

        Declarative alternative: explode() over an array expression.
        """
        in_cols = self._df.columns
        full = (
            T.StructType(self._df.schema.fields + output_schema.fields)
            if select_all
            else output_schema
        )
        out_names = [f.name for f in output_schema.fields]

        def _map(batches):
            import pandas as pd

            for pdf in batches:
                rows = []
                for rec in pdf.to_dict("records"):
                    multi = fn(rec)
                    if not multi:
                        continue
                    for res in multi:
                        vals = list(res) if isinstance(res, (tuple, list)) else [res]
                        if select_all:
                            rows.append([rec[c] for c in in_cols] + vals)
                        else:
                            rows.append(vals)
                cols = (in_cols + out_names) if select_all else out_names
                yield pd.DataFrame(rows, columns=cols)

        return self._wrap(self._df.mapInPandas(_map, schema=full))

    def project(self, *cols: str) -> "Table":
        """ref table/Table.java:626-637 — column subset (zero-copy there,
        column pruning here)."""
        return self._wrap(self._df.select(*cols))

    def project_negative(self, *cols: str) -> "Table":
        """ref table/Table.java:639-659 — all columns except named."""
        return self._wrap(self._df.drop(*cols))

    def add_columns(self, **named: ColumnLike) -> "Table":
        """ref table/Table.java:204-216."""
        return self.select_all(**named)

    def rename(self, mapping: Mapping[str, str]) -> "Table":
        """ref table/As.java:6-17 (join collision rename maps)."""
        return self._wrap(self._df.withColumnsRenamed(dict(mapping)))

    # -- joins (ref §2.3) ---------------------------------------------------

    def _join(
        self,
        other: "Table | DataFrame",
        on: Sequence[str | tuple[str, str]],
        how: str,
        null_safe: bool,
        rename: Mapping[str, str] | None,
        theta: Column | None,
        broadcast_other: bool,
    ) -> "Table":
        right_df = other.df if isinstance(other, Table) else other
        if rename:
            right_df = right_df.withColumnsRenamed(dict(rename))
        if broadcast_other:
            right_df = F.broadcast(right_df)
        left, right = self._df.alias("__l"), right_df.alias("__r")
        conds = []
        dup_right_keys = []
        for key in on:
            lk, rk = key if isinstance(key, tuple) else (key, key)
            if rename and rk in rename:
                rk = rename[rk]
            lc, rc = F.col(f"__l.{lk}"), F.col(f"__r.{rk}")
            if lk == rk and how != "full":
                # same-named equi-key: keep only the left copy (for full
                # outer both survive — callers coalesce)
                dup_right_keys.append(rk)
            # Reference joins match null keys to each other
            # (TableTest.java:209-232) — eqNullSafe, not `=`.
            conds.append(lc.eqNullSafe(rc) if null_safe else lc == rc)
        cond = conds[0] if conds else F.lit(True)
        for c in conds[1:]:
            cond = cond & c
        if theta is not None:
            cond = cond & theta
        joined = left.join(right, cond, how)
        if how not in ("left_semi", "left_anti"):
            for rk in dup_right_keys:
                joined = joined.drop(F.col(f"__r.{rk}"))
        return self._wrap(joined)

    def join(
        self,
        other: "Table | DataFrame",
        on: Sequence[str | tuple[str, str]],
        null_safe: bool = True,
        rename: Mapping[str, str] | None = None,
        theta: Column | None = None,
        broadcast_other: bool = False,
    ) -> "Table":
        """Inner join (ref table/Table.java:610-616)."""
        return self._join(other, on, "inner", null_safe, rename, theta, broadcast_other)

    def left_join(
        self,
        other: "Table | DataFrame",
        on: Sequence[str | tuple[str, str]],
        null_safe: bool = True,
        rename: Mapping[str, str] | None = None,
        theta: Column | None = None,
        broadcast_other: bool = False,
    ) -> "Table":
        """Left outer join (ref table/Table.java:618-620). The dimension
        join pattern (README.md:104-120) is `left_join(dim,
        broadcast_other=True)`."""
        return self._join(other, on, "left", null_safe, rename, theta, broadcast_other)

    def outer_join(
        self,
        other: "Table | DataFrame",
        on: Sequence[str | tuple[str, str]],
        null_safe: bool = True,
        rename: Mapping[str, str] | None = None,
        theta: Column | None = None,
    ) -> "Table":
        """Full outer join (ref table/Table.java:622-624)."""
        return self._join(other, on, "full", null_safe, rename, theta, False)

    def semi_join(self, other: "Table | DataFrame", on: Sequence[str | tuple[str, str]],
                  null_safe: bool = False) -> "Table":
        return self._join(other, on, "left_semi", null_safe, None, None, False)

    def anti_join(self, other: "Table | DataFrame", on: Sequence[str | tuple[str, str]],
                  null_safe: bool = False) -> "Table":
        return self._join(other, on, "left_anti", null_safe, None, None, False)

    # -- aggregation (ref §2.4) ---------------------------------------------

    def group_by(self, keys: Sequence[str], **aggs: Column) -> "Table":
        """Builtin-agg fast path (ref table/Table.java:436-467). `aggs`
        map output-column name → aggregate expression; partial (map-side)
        aggregation and codegen come free from Catalyst."""
        exprs = [v.alias(k) for k, v in aggs.items()]
        return self._wrap(self._df.groupBy(*[F.col(k) for k in keys]).agg(*exprs))

    def group_by_rollup(self, keys: Sequence[str], **aggs: Column) -> "Table":
        """ROLLUP aggregation — hierarchical subtotals + grand total
        (Spark-native addition; SURVEY §2.4 notes grouping sets are
        absent in the reference and free in Spark)."""
        exprs = [v.alias(k) for k, v in aggs.items()]
        return self._wrap(self._df.rollup(*[F.col(k) for k in keys]).agg(*exprs))

    def group_by_cube(self, keys: Sequence[str], **aggs: Column) -> "Table":
        """CUBE aggregation — all grouping-set combinations."""
        exprs = [v.alias(k) for k, v in aggs.items()]
        return self._wrap(self._df.cube(*[F.col(k) for k in keys]).agg(*exprs))

    def group_by_grouping_sets(
        self,
        grouping_sets: Sequence[Sequence[str]],
        keys: Sequence[str],
        **aggs: Column,
    ) -> "Table":
        """Explicit GROUPING SETS — arbitrary subtotal combinations."""
        exprs = [v.alias(k) for k, v in aggs.items()]
        sets = [[F.col(c) for c in s] for s in grouping_sets]
        return self._wrap(
            self._df.groupingSets(sets, *[F.col(k) for k in keys]).agg(*exprs)
        )

    def group_by_apply(
        self,
        keys: Sequence[str],
        fn: Callable,
        output_schema: T.StructType,
    ) -> "Table":
        """AggregationFunction escape hatch: `fn(key_tuple, pandas_df) ->
        tuple | None` — whole group in memory, N agg columns at once;
        None drops the group (ref function/AggregationFunction.java:7-9).

        Scale note: collects each group onto one worker (like the
        reference's per-thread hash agg). Prefer `group_by` builtins —
        they do partial aggregation — unless logic is truly opaque.
        """
        out_names = [f.name for f in output_schema.fields]
        full = T.StructType(
            [self._df.schema[k] for k in keys] + list(output_schema.fields)
        )

        def _apply(key, pdf):
            import pandas as pd

            res = fn(key, pdf)
            if res is None:
                return pd.DataFrame(columns=list(keys) + out_names)
            vals = list(res) if isinstance(res, (tuple, list)) else [res]
            return pd.DataFrame([list(key) + vals], columns=list(keys) + out_names)

        return self._wrap(self._df.groupBy(*keys).applyInPandas(_apply, schema=full))

    def group_by_partial(
        self,
        keys: Sequence[str],
        partial_fn: Callable,
        merge_fn: Callable,
        state_schema: T.StructType,
        output_schema: T.StructType,
    ) -> "Table":
        """Two-phase custom aggregation — the scale path for opaque
        UDAFs that `group_by_apply` (whole-group collection) can't take
        to 100 TB.

        partial_fn(pandas_df) -> per-key partial-state DataFrame with
        columns keys + state_schema, computed per Arrow batch WITHIN
        each input partition (the map-side combine: shuffle carries one
        state row per key per batch, not every input row).
        merge_fn(key_tuple, state_pandas_df) -> tuple of output values
        per output_schema (the reduce side).

        Mirrors Spark's own partial/final HashAggregate split for
        builtin aggregates (ref §2.4 notes the reference has no partial
        aggregation at all — single-node per thread).
        """
        state_full = T.StructType(
            [self._df.schema[k] for k in keys] + list(state_schema.fields)
        )
        out_full = T.StructType(
            [self._df.schema[k] for k in keys] + list(output_schema.fields)
        )
        out_names = [f.name for f in output_schema.fields]

        def _partial(batches):
            for pdf in batches:
                yield partial_fn(pdf)

        def _merge(key, states):
            import pandas as pd

            res = merge_fn(key, states)
            vals = list(res) if isinstance(res, (tuple, list)) else [res]
            return pd.DataFrame([list(key) + vals], columns=list(keys) + out_names)

        partials = self._df.mapInPandas(_partial, schema=state_full)
        return self._wrap(
            partials.groupBy(*keys).applyInPandas(_merge, schema=out_full)
        )

    # -- batch OVER window (ref §2.5) ----------------------------------------

    def over(
        self,
        partition_by: Sequence[str],
        order_by: Sequence[ColumnLike],
        **named: Callable[[Window], Column] | Column,
    ) -> "Table":
        """ref table/Table.java:469-533. Reference sorts each partition
        nulls-first ascending (comparator at :486-509) and hands the whole
        partition to OverWindowFunction; declaratively that is a
        WindowSpec. Values may be Columns already bound to a window or
        callables receiving the spec:

            t.over(["c1"], ["c2"], rank=lambda w: F.row_number().over(w))
        """
        spec = Window.partitionBy(*[F.col(p) for p in partition_by]).orderBy(
            *[_col(o).asc_nulls_first() if isinstance(o, str) else o for o in order_by]
        )
        cols = {}
        for name, v in named.items():
            cols[name] = v(spec) if callable(v) else v
        return self._wrap(self._df.withColumns(cols))

    def over_apply(
        self,
        partition_by: Sequence[str],
        order_by: Sequence[str],
        fn: Callable,
        output_schema: T.StructType,
    ) -> "Table":
        """OverWindowFunction escape hatch: whole sorted partition as a
        pandas frame; `fn(pdf) -> pandas.DataFrame` of extra columns, row
        aligned (ref function/OverWindowFunction.java:7-10). Sort matches
        the reference: ascending, nulls first (table/Table.java:486-509).
        """
        import pandas as pd

        full = T.StructType(self._df.schema.fields + list(output_schema.fields))

        def _apply(pdf: "pd.DataFrame") -> "pd.DataFrame":
            sdf = pdf.sort_values(list(order_by), na_position="first", kind="stable")
            extra = fn(sdf.reset_index(drop=True))
            return pd.concat([sdf.reset_index(drop=True), extra], axis=1)

        return self._wrap(
            self._df.groupBy(*partition_by).applyInPandas(_apply, schema=full)
        )

    def top_n(
        self,
        partition_by: Sequence[str],
        order_by: Sequence[ColumnLike],
        n: int,
        rank_col: str = "rank",
    ) -> "Table":
        """ref util/WindowUtil.java:19-53 (bounded-heap top-N per group)
        → row_number over desc window; Spark plans a per-partition
        TakeOrderedAndProject-style bounded sort, same asymptotics."""
        spec = Window.partitionBy(*[F.col(p) for p in partition_by]).orderBy(
            *[F.col(o).desc() if isinstance(o, str) else o for o in order_by]
        )
        return self._wrap(
            self._df.withColumn(rank_col, F.row_number().over(spec)).filter(
                F.col(rank_col) <= n
            )
        )

    # -- set ops / sort / limit (ref §2.7) ------------------------------------

    def append(self, other: "Table | DataFrame") -> "Table":
        """ref table/Table.java:192-202 + sp/DataAnalysis.java:50-61."""
        right = other.df if isinstance(other, Table) else other
        return self._wrap(self._df.unionByName(right))

    union = append

    def intersect(self, other: "Table | DataFrame") -> "Table":
        """Set intersection, distinct rows (SURVEY §2.7 — absent in the
        reference, free in Spark)."""
        o = other.df if isinstance(other, Table) else other
        return self._wrap(self._df.intersect(o))

    def except_all(self, other: "Table | DataFrame") -> "Table":
        """Multiset difference preserving duplicates (EXCEPT ALL)."""
        o = other.df if isinstance(other, Table) else other
        return self._wrap(self._df.exceptAll(o))

    def distinct(self, *cols: str) -> "Table":
        return self._wrap(self._df.dropDuplicates(list(cols)) if cols else self._df.distinct())

    def order_by(self, *cols: ColumnLike) -> "Table":
        return self._wrap(
            self._df.orderBy(*[_col(c).asc_nulls_first() if isinstance(c, str) else c for c in cols])
        )

    def limit(self, n: int) -> "Table":
        return self._wrap(self._df.limit(n))

    # -- physical hints (ref §2.8 Rehash) --------------------------------------

    def rehash(self, *keys: str, partitions: int | None = None) -> "Table":
        """ref sp/Rehash.java:297-345 — explicit hash shuffle by key so
        downstream keyed state/windows are co-located. Usually
        unnecessary: groupBy/join/window insert it implicitly."""
        if partitions:
            return self._wrap(self._df.repartition(partitions, *[F.col(k) for k in keys]))
        return self._wrap(self._df.repartition(*[F.col(k) for k in keys]))

    def rebalance(self, partitions: int) -> "Table":
        """ref sp/Rehash.java:293-295 — keyless round-robin."""
        return self._wrap(self._df.repartition(partitions))

    def cache(self) -> "Table":
        self._df.cache()
        return self


def rows_to_table(spark, rows: Iterable[Sequence], schema: T.StructType, name: str = "t") -> Table:
    """ref table/Table.java:418-434 (rowsToTable) + TableBuilder
    (table/TableBuilder.java:17-131): materialize explicit rows."""
    return Table(spark.createDataFrame(list(rows), schema), name)
