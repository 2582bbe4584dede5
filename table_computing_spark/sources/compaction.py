"""Size-targeted parquet writing — the small-files / giant-files fix.

A 100 TB curation job that writes with whatever partitioning the last
shuffle left behind produces either millions of kilobyte files (each a
namenode entry, an open/close, a scheduler task downstream) or a
handful of multi-gigabyte files (no read parallelism, whole-file
retries). Sinks must hit a TARGET FILE SIZE instead, and the knob
Spark gives is the number of write partitions.

`write_compacted` sizes that number from the data itself: a
`df.count()` plus a bounded row sample estimate bytes-per-row (both
jobs reuse the cached plan), then `repartition(n)` — or
`repartitionByRange(n, sort_cols)` when the reader benefits from
clustering (range partitioning also gives min/max column statistics
per file, which parquet readers turn into file-level skipping).

The estimate is intentionally cheap and approximate: parquet
compression varies by column entropy, so files land within ~2x of the
target, which is exactly what matters (no 4 KB files, no 8 GB files).
For incremental pipelines, `plan_file_count` is exposed separately so
an orchestrator can log / override the decision.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def estimate_row_bytes(df: DataFrame, sample_rows: int = 10_000) -> float:
    """Approximate on-disk bytes per row: serialize a bounded sample to
    parquet-like binary via Arrow and apply a typical parquet
    compression discount. Bounded driver transfer (sample_rows rows)."""
    sample = df.limit(sample_rows).toPandas()
    if len(sample) == 0:
        return 1.0
    mem = float(sample.memory_usage(index=False, deep=True).sum())
    # parquet (snappy + encodings) typically lands near 1/3 of in-memory
    return max(1.0, mem / len(sample) / 3.0)


def plan_file_count(
    n_rows: int, row_bytes: float, target_mb: int = 256
) -> int:
    """Number of output files that puts each near target_mb."""
    total = n_rows * row_bytes
    return max(1, math.ceil(total / (target_mb * 1024 * 1024)))


def write_compacted(
    df: DataFrame,
    path: str,
    target_mb: int = 256,
    sort_cols: "list[str] | None" = None,
    mode: str = "overwrite",
) -> int:
    """Write `df` as parquet files sized near `target_mb`. Returns the
    planned file count. With `sort_cols`, data is range-partitioned and
    sorted within files on those columns — clustered files whose
    min/max statistics let readers skip whole files."""
    df = df.cache()
    try:
        n = df.count()
        files = plan_file_count(n, estimate_row_bytes(df), target_mb)
        if sort_cols:
            out = df.repartitionByRange(files, *sort_cols).sortWithinPartitions(
                *sort_cols
            )
        else:
            out = df.repartition(files)
        out.write.mode(mode).parquet(path)
    finally:
        df.unpersist()
    return files


def binpack_plan(
    files: DataFrame,
    keys,
    name_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Compaction PLAN for an existing file inventory: within each
    partition (keys), walk the files in deterministic (size desc,
    name) order and assign each to the output bin its running byte
    offset lands in — bin = ⌊offset_before / target⌋ (next-fit by
    offset). Every bin then holds ~target_bytes, outsized files get
    bins of their own, and the assignment is a pure function of the
    inventory: rerunning the planner on the same listing yields the
    same plan (idempotent orchestration).

    Output: (keys..., `name_col`, `size_col`, bin, offset). The
    descending-size first pass packs large files tight before the
    small-file tail fills gaps — the greedy FFD intuition with ONE
    window pass instead of an O(n·bins) driver loop.

    Scale shape: one running-sum window PARTITIONED by the table
    partition keys over the file inventory (metadata-sized, millions
    of rows at most — never the data). Exact integer arithmetic.
    `name_col` must be unique within a partition (file listings are) —
    duplicate (size, name) rows would make the running offsets of the
    duplicates order-dependent."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(
        F.col(size_col).desc(), F.col(name_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sz = F.col(size_col).cast("long")
    run = F.sum(sz).over(w)
    # long `div` keeps the "exact integer arithmetic" claim true: a
    # double division would silently lose exactness once cumulative
    # per-partition offsets pass 2^53 bytes, and could diverge from the
    # oracle's integer `//` (r10 advice). offset >= 0, so div == floor.
    return files.select(
        *keys, name_col, size_col, (run - sz).alias("offset")
    ).withColumn(
        "bin", F.expr(f"offset div {int(target_bytes)}")
    ).select(*keys, name_col, size_col, "bin", "offset")
