"""Change-data-capture operators: snapshot diff and SCD2 history build.

A pipeline that re-ingests a mutable upstream table every day needs two
primitives the reference's batch layer leaves to the user:

  snapshot_diff   — compare two keyed snapshots and classify every key
                    as insert / delete / update (unchanged rows are
                    dropped — at 100 TB they are the overwhelming
                    majority and must never leave the scan stage
                    fatter than (key, fingerprint)).
  scd2_intervals  — collapse a change log into slowly-changing-
                    dimension type-2 validity intervals
                    [valid_from, valid_to) per key, one row per
                    distinct consecutive attribute value.

Scale notes:
  * snapshot_diff shuffles only (key, md5-fingerprint) — payload
    columns are re-attached AFTER the diff by a semi-join that touches
    only changed keys. With both snapshots written through
    sources/bucketed on the key, the diff join is Exchange-free.
  * The fingerprint is md5 over a canonical string encoding, so any
    engine (the DuckDB oracle included) reproduces it bit-for-bit.
  * scd2_intervals is one window shuffle on the key — lag() for change
    detection, lead() for interval close — no self-join, no state.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEP = "|"

# bump when row_fingerprint's byte encoding changes; persist next to any
# stored digest table and refuse cross-version compares (see docstring)
FINGERPRINT_FORMAT = 2


def row_fingerprint(cols: Sequence[str]) -> Column:
    """md5 over an INJECTIVE, engine-portable encoding of `cols`: each
    value is hashed per-column first (md5 of its string cast, NULL →
    the 4-char literal 'null'), then the fixed-width tokens are joined
    and hashed again. Because every token is either 32 hex chars or
    'null', no value content can shift bytes across column boundaries
    — the naive join of raw strings is NOT injective (('a|b','c') and
    ('a','b|c') collide for any separator that can appear in data).
    Two rows fingerprint equal iff every column is equal under
    NULL-distinct semantics (up to md5 collision); the DuckDB oracle
    mirrors this with IS DISTINCT FROM per column.

    FORMAT v2 (round 6): the encoding changed from joining raw string
    casts to joining per-column md5 tokens (the injectivity fix).
    Fingerprints/digests persisted by the v1 encoding (snapshot states,
    partition_digest tables written before round 6) are NOT comparable
    to v2 values — every v1-vs-v2 comparison reads as 'changed'.
    Recompute stored digests once after upgrading, or keep them in
    separate tables; `FINGERPRINT_FORMAT` below is the version tag to
    store alongside persisted digests so stale comparisons are
    mechanically detectable rather than silent."""
    parts = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit("null")) for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Narrow diff: (key..., change_type) for every key that changed.

    change_type ∈ {'insert', 'delete', 'update'}; keys whose
    fingerprints match are dropped before anything wide shuffles.
    Both sides are projected to key + fingerprint at the scan, so the
    full-outer join moves ~40 bytes/row regardless of snapshot width."""
    keys = list(key_cols)
    o = old.select(*keys, row_fingerprint(compare_cols).alias("__fp_old"))
    n = new.select(*keys, row_fingerprint(compare_cols).alias("__fp_new"))
    joined = o.join(n, keys, "full_outer")
    return joined.select(
        *keys,
        F.when(F.col("__fp_old").isNull(), F.lit("insert"))
        .when(F.col("__fp_new").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("change_type"),
        "__fp_old",
        "__fp_new",
    ).filter(
        F.col("__fp_old").isNull()
        | F.col("__fp_new").isNull()
        | (F.col("__fp_old") != F.col("__fp_new"))
    ).drop("__fp_old", "__fp_new")


def snapshot_diff_full(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """snapshot_diff + changed-row payloads: for inserts/updates the NEW
    values, for deletes the OLD values. The wide tables are touched only
    by a join against the (small) changed-key set — Catalyst pushes the
    join keys down to both scans, and with AQE the payload join sides
    broadcast when the day's churn is small (the common case)."""
    keys = list(key_cols)
    diff = snapshot_diff(old, new, keys, compare_cols)
    payload = list(compare_cols)
    new_side = new.select(*keys, *payload)
    old_side = old.select(*keys, *payload)
    from_new = (
        diff.filter(F.col("change_type") != "delete")
        .join(new_side, keys, "inner")
    )
    from_old = (
        diff.filter(F.col("change_type") == "delete")
        .join(old_side, keys, "inner")
    )
    return from_new.unionByName(from_old)


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    order_col: str,
    tiebreak_col: str,
    attr_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2: one row per maximal run of
    consecutive equal `attr_col` values per key, with
    [valid_from, valid_to) bounds and a 1-based version number.
    valid_to is NULL for the current (open) interval.

    Plan: a single shuffle on `key_col`; lag() marks run starts,
    a running sum numbers the runs, one groupBy collapses them. Ties
    in `order_col` are broken by `tiebreak_col` so the result is
    deterministic under any partitioning."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(order_col, tiebreak_col)
    marked = df.select(
        key_col,
        order_col,
        tiebreak_col,
        attr_col,
        F.when(
            F.lag(attr_col).over(w).isNull()
            | (F.lag(attr_col).over(w) != F.col(attr_col)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("__is_start"),
    )
    runs = marked.withColumn(
        "version", F.sum("__is_start").over(w).cast("int")
    )
    collapsed = runs.groupBy(key_col, "version").agg(
        F.min_by(attr_col, F.struct(order_col, tiebreak_col)).alias(attr_col),
        F.min(order_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    w2 = Window.partitionBy(key_col).orderBy("version")
    return collapsed.select(
        key_col,
        "version",
        attr_col,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_rows",
    )


def apply_diff(
    old: DataFrame,
    diff: DataFrame,
    key_cols: Sequence[str],
    change_col: str = "change_type",
) -> DataFrame:
    """Replicate a snapshot forward: OLD + diff -> NEW. The inverse of
    `snapshot_diff_full`, giving the round-trip guarantee
    apply_diff(old, snapshot_diff_full(old, new)) == new — the property
    that makes the diff a safe replication/backfill format.

    Keys present in the diff (any change type) are dropped from OLD by
    one anti-join; inserts and updates are re-added with their NEW
    payloads. Shuffle moves only the diff keys against OLD — at 0.1%
    daily churn the anti-join side broadcasts."""
    keys = list(key_cols)
    changed_keys = diff.select(*keys)
    kept = old.join(changed_keys, keys, "left_anti")
    upserts = diff.filter(F.col(change_col) != "delete").drop(change_col)
    return kept.unionByName(upserts)


def partition_digest(
    df: DataFrame,
    partition_cols: Sequence[str],
    content_cols: Sequence[str],
) -> DataFrame:
    """Order-independent per-partition content digest: (row count,
    decimal sum of each row's 60-bit fingerprint int). Two partitions
    digest equal iff their row MULTISETS are equal (up to md5
    collision) — the primitive that lets an incremental job decide
    WHICH date/source partitions to recompute by comparing two
    digest tables instead of two datasets.

    The sum is exact DECIMAL(38,0) (no float, no overflow below ~10^20
    rows) and commutative, so the digest is independent of row order
    and partitioning — and reproducible by the DuckDB oracle. Content
    casts follow row_fingerprint's portability contract: feed it
    integer/string columns (cast floats to integer units first).

    One map-side-combinable aggregation; shuffle width = number of
    partitions."""
    fp_int = F.conv(
        F.substring(row_fingerprint(list(content_cols)), 1, 15), 16, 10
    ).cast("decimal(38,0)")
    return df.groupBy(*list(partition_cols)).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(fp_int).cast("decimal(38,0)").alias("digest"),
    )


def changed_partitions(
    old: DataFrame,
    new: DataFrame,
    partition_cols: Sequence[str],
    content_cols: Sequence[str],
) -> DataFrame:
    """Compare two snapshots partition-by-partition WITHOUT comparing
    rows: full-outer-join their digests and classify each partition
    added / removed / changed / unchanged. Feed the changed list to
    the incremental recompute (or to snapshot_diff for row-level
    detail on just those partitions)."""
    pc = list(partition_cols)
    od = partition_digest(old, pc, content_cols).withColumnRenamed(
        "n_rows", "old_rows"
    ).withColumnRenamed("digest", "old_digest")
    nd = partition_digest(new, pc, content_cols).withColumnRenamed(
        "n_rows", "new_rows"
    ).withColumnRenamed("digest", "new_digest")
    j = od.join(nd, pc, "full_outer")
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(
            (F.col("old_digest") == F.col("new_digest"))
            & (F.col("old_rows") == F.col("new_rows")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return j.select(*pc, status.alias("status"), "old_rows", "new_rows")


def scd2_lookup(
    facts: DataFrame,
    intervals: DataFrame,
    key_col: str,
    fact_time_col: str,
    how: str = "left",
) -> DataFrame:
    """Temporal dimension lookup — the query side of scd2_intervals:
    attach to each fact row the dimension version whose
    [valid_from, valid_to) interval contains the fact's time (open
    current versions have valid_to NULL and match everything at or
    after valid_from). This closes the SCD2 loop: build history with
    scd2_intervals, ASK it with scd2_lookup — the "what did this
    customer's segment look like WHEN the order was placed" join that
    plain dimension joins get silently wrong.

    Plan: one equi-join on the key followed by the interval filter —
    versions per key are few (the interval table is maximal runs, not
    events), so the per-key fan-out is bounded by version count; no
    range-join machinery needed. At most ONE interval can match per
    fact by the non-overlap invariant scd2_intervals guarantees.

    how='left' keeps facts that predate the first version (dimension
    columns null); 'inner' drops them."""
    if how not in ("inner", "left"):
        raise ValueError("scd2_lookup supports inner/left")
    overlap = (set(facts.columns) & set(intervals.columns)) - {key_col}
    overlap.update({"__k"} & set(facts.columns))
    if overlap:
        # an ambiguous join would silently mis-resolve valid_from /
        # valid_to (or a stray __k) — refuse instead
        raise ValueError(
            "scd2_lookup: fact and interval column names must be disjoint "
            f"apart from the key; rename these on one side first: {sorted(overlap)}"
        )
    ivs = intervals.withColumnRenamed(key_col, "__k")
    cond = (
        (F.col(key_col) == F.col("__k"))
        & (F.col(fact_time_col) >= F.col("valid_from"))
        & (
            F.col("valid_to").isNull()
            | (F.col(fact_time_col) < F.col("valid_to"))
        )
    )
    return facts.join(ivs, cond, how).drop("__k")
