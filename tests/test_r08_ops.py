"""Round-8 late-session operator families: exact bitmap distinct
counts, product quantization, point-in-time features, KS drift."""

import pytest
from pyspark.sql import functions as F

from table_computing_spark.operators import bitmaps
from table_computing_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return load_table(spark, SF, "orders").df


class TestBitmapDistinct:
    def test_matches_exact_count_distinct(self, spark):
        o = _orders(spark)
        st = bitmaps.distinct_state(o, ["o_orderpriority"], "o_custkey")
        got = {
            r["o_orderpriority"]: r["n_distinct"]
            for r in bitmaps.distinct_count(st, ["o_orderpriority"]).collect()
        }
        want = {
            r["o_orderpriority"]: r["n"]
            for r in o.groupBy("o_orderpriority")
            .agg(F.countDistinct("o_custkey").alias("n"))
            .collect()
        }
        assert got == want

    def test_incremental_merge_is_exact(self, spark):
        """state(base) OR state(delta) == state(full) — append-only
        maintenance with exact answers (the HLL twin only bounds the
        error; bitmaps eliminate it)."""
        o = _orders(spark)
        base = o.where(F.col("o_orderkey") % 7 != 0)
        delta = o.where(F.col("o_orderkey") % 7 == 0)
        merged = bitmaps.merge_states(
            bitmaps.distinct_state(base, ["o_orderstatus"], "o_custkey"),
            bitmaps.distinct_state(delta, ["o_orderstatus"], "o_custkey"),
            ["o_orderstatus"],
        )
        got = {
            r["o_orderstatus"]: r["n_distinct"]
            for r in bitmaps.distinct_count(merged, ["o_orderstatus"]).collect()
        }
        want = {
            r["o_orderstatus"]: r["n"]
            for r in o.groupBy("o_orderstatus")
            .agg(F.countDistinct("o_custkey").alias("n"))
            .collect()
        }
        assert got == want

    def test_rollup_from_fine_grain_is_exact(self, spark):
        """Distinct customers per priority derived from the
        (priority, status) state — facts never rescanned, counts still
        exact because bit-OR is set union (a sketch rollup would only
        approximate)."""
        o = _orders(spark)
        fine = bitmaps.distinct_state(
            o, ["o_orderpriority", "o_orderstatus"], "o_custkey"
        )
        got = {
            r["o_orderpriority"]: r["n_distinct"]
            for r in bitmaps.rollup_distinct(
                fine, ["o_orderpriority", "o_orderstatus"], ["o_orderpriority"]
            ).collect()
        }
        want = {
            r["o_orderpriority"]: r["n"]
            for r in o.groupBy("o_orderpriority")
            .agg(F.countDistinct("o_custkey").alias("n"))
            .collect()
        }
        assert got == want

    def test_rollup_rejects_unknown_coarse_key(self, spark):
        o = _orders(spark)
        fine = bitmaps.distinct_state(o, ["o_orderstatus"], "o_custkey")
        with pytest.raises(ValueError, match="not in the state grain"):
            bitmaps.rollup_distinct(fine, ["o_orderstatus"], ["o_orderpriority"])
