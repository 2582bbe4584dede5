"""Z-order (Morton) clustering — multi-column file skipping.

Range-partitioning a table on ONE column gives perfect file-level
min/max pruning on that column and none on any other. Interleaving the
bits of several normalized columns into one Morton code and
range-partitioning on THAT gives useful pruning on every participating
column simultaneously — the technique behind Delta/Iceberg
`OPTIMIZE ZORDER BY`, implemented here as plain Spark expressions plus
the size-targeted writer.

`zorder_value` rank-normalizes each column to `bits` quantile buckets
(exact ntile semantics — value-distribution-proof) and interleaves the
bucket bits. Pure integer arithmetic → the same expression is
reproducible in any engine, and the locality claim itself is
oracle-checkable: within any Morton-range slice, BOTH dimensions'
min/max spans are narrow (see q_zorder_locality).

Scale: each column's bucketing is `operators.ids.ntile_distributed` —
a range-partitioned global rank + closed-form bucket, never an
unpartitioned window, so no single task ever holds the table. The
legacy single-task `ntile()` window survives only behind
`use_window=True` for tiny-data tests.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: Sequence[Column], bits: int) -> Column:
    """Morton code: bit j of column i lands at position j*len(cols)+i.
    Inputs must already be integers in [0, 2^bits)."""
    n = len(cols)
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        for j in range(bits):
            out = out + (
                F.shiftleft(
                    F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1).cast("long")),
                    j * n + i,
                )
            )
    return out


def zorder_value(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    out_col: str = "zvalue",
    tiebreak: "str | None" = None,
    use_window: bool = False,
) -> DataFrame:
    """Add a Morton code over rank-normalized columns: each column is
    quantile-bucketed into 2^bits ntile buckets (distribution-proof),
    buckets interleaved bitwise. Pass `tiebreak` (a unique column) to
    make the bucket assignment a total order — required for
    engine-exact reproducibility when values repeat.

    Default path is `ntile_distributed` (exact ntile, no unpartitioned
    window — one range shuffle per column). `use_window=True` keeps the
    literal single-task `ntile()` window for tiny-data tests; the two
    paths produce identical buckets."""
    from table_computing_spark.operators.ids import ntile_distributed

    buckets = []
    tmp = df
    for c in cols:
        b = f"__zb_{c}"
        order = [c, tiebreak] if tiebreak else [c]
        if use_window:
            from pyspark.sql import Window

            tmp = tmp.withColumn(
                b, (F.ntile(2**bits).over(Window.orderBy(*order)) - 1).cast("long")
            )
        else:
            tmp = ntile_distributed(tmp, order, 2**bits, out_col=b).withColumn(
                b, (F.col(b) - 1).cast("long")
            )
        buckets.append(b)
    out = tmp.withColumn(out_col, interleave_bits([F.col(b) for b in buckets], bits))
    return out.drop(*buckets)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    target_mb: int = 256,
    bits: int = 8,
    mode: str = "overwrite",
) -> int:
    """Write parquet clustered by the Morton code of `cols` at the
    compaction writer's target file size: every file covers a narrow
    range of EVERY z-ordered column, so min/max statistics prune files
    for predicates on any of them."""
    from table_computing_spark.sources.compaction import (
        estimate_row_bytes,
        plan_file_count,
    )

    z = zorder_value(df, cols, bits).cache()
    try:
        n = z.count()
        files = plan_file_count(n, estimate_row_bytes(z), target_mb)
        (
            z.repartitionByRange(files, "zvalue")
            .sortWithinPartitions("zvalue")
            .drop("zvalue")
            .write.mode(mode)
            .parquet(path)
        )
    finally:
        z.unpersist()
    return files
