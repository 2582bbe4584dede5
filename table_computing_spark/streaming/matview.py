"""Streaming materialized-view maintenance: keep a batch GROUP BY
summary continuously up to date from an append stream, using the
delta-merge of operators/incremental.maintain_agg inside foreachBatch.

This is the streaming face of the same idea (the lakehouse
"incremental MV refresh" pattern): each micro-batch aggregates
map-side to group-sized delta rows and merges with the persisted
state — the historical stream is never replayed, and the state table
is always a complete, queryable GROUP BY result (unlike an
update-mode in-memory sink, it survives the process).

Exactly-once: foreachBatch is at-least-once, so the version pointer
records the last applied batch id — a replayed batch is skipped, which
makes the merge idempotent (the standard foreachBatch dedup contract).
State versions ping-pong under `state_dir/v{n}` because Spark cannot
overwrite a parquet path it is reading; the pointer file flips only
after the new version is fully written, and the superseded version is
deleted immediately after the flip so disk usage stays at one state
copy (plus the in-flight one) no matter how long the stream runs.

At 100 TB: the state merge is |state| + |batch groups| rows keyed by
the group key — write the state bucketed on the key and the merge
groupBy is Exchange-free; the micro-batch side cost is the batch's own
map-side aggregation.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame

from table_computing_spark.operators import incremental

_POINTER = "_VERSION.json"


def _read_pointer(state_dir: str) -> dict:
    try:
        with open(os.path.join(state_dir, _POINTER)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {"version": -1, "last_batch": -1}


def read_state(spark, state_dir: str) -> "DataFrame | None":
    """Current materialized state, or None before the first batch."""
    ptr = _read_pointer(state_dir)
    if ptr["version"] < 0:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"v{ptr['version']}"))


def _write_pointer(state_dir: str, version: int, batch_id: int) -> None:
    """Atomic pointer flip: write a temp file, then os.replace — a
    crash mid-write must never leave truncated JSON, which
    _read_pointer would read as "no state yet", silently rebuilding
    from one batch and losing every earlier merge."""
    tmp = os.path.join(state_dir, _POINTER + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"version": version, "last_batch": batch_id}, f)
    os.replace(tmp, os.path.join(state_dir, _POINTER))


def _stream_maintain(
    sdf: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    build_first,
    merge_in,
    available_now: bool,
):
    """The shared versioned ping-pong maintenance loop: per micro-batch
    (replays skipped by batch id — foreachBatch is at-least-once),
    either build the first state from the batch or merge the batch
    into the persisted version, write v{n+1}, flip the pointer
    ATOMICALLY, drop v{n}. The three public maintainers (sums / exact
    distinct / t-digest quantiles) differ only in their two callables:
    build_first(batch_df) and merge_in(old_state_df, batch_df)."""
    os.makedirs(state_dir, exist_ok=True)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        ptr = _read_pointer(state_dir)
        if batch_id <= ptr["last_batch"]:
            return  # replayed batch — already merged (idempotence)
        spark = batch_df.sparkSession
        if ptr["version"] >= 0:
            old = spark.read.parquet(os.path.join(state_dir, f"v{ptr['version']}"))
            new = merge_in(old, batch_df)
        else:
            new = build_first(batch_df)
        nxt = ptr["version"] + 1
        new.write.mode("overwrite").parquet(os.path.join(state_dir, f"v{nxt}"))
        _write_pointer(state_dir, nxt, batch_id)
        if ptr["version"] >= 0:
            # true ping-pong: the flipped-away version is dead now
            shutil.rmtree(
                os.path.join(state_dir, f"v{ptr['version']}"), ignore_errors=True
            )

    writer = (
        sdf.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()



def stream_maintain_agg(
    sdf: DataFrame,
    keys: Sequence[str],
    measures: Mapping[str, Column],
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start a streaming query that maintains agg_state(stream-so-far)
    under `state_dir`. Returns the StreamingQuery; await it, then
    `read_state` is the full GROUP BY of everything ingested."""
    keys = list(keys)
    return _stream_maintain(
        sdf, state_dir, checkpoint_dir,
        build_first=lambda b: incremental.agg_state(b, keys, measures),
        merge_in=lambda old, b: incremental.maintain_agg(
            old, b, b.limit(0), keys, measures
        ),
        available_now=available_now,
    )


def stream_maintain_distinct(
    sdf: DataFrame,
    keys: Sequence[str],
    col: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Maintain EXACT per-group DISTINCT counts from an append stream:
    each micro-batch collapses to its own bitmap state
    (operators/bitmaps.distinct_state — one 4 KiB bitmap per
    (group, id-bucket)) and OR-merges with the persisted state, under
    the same versioned ping-pong + batch-id idempotence contract as
    stream_maintain_agg. COUNT DISTINCT is the classic
    non-self-maintainable aggregate; the bitmap state restores
    incrementality with NO error bar (the HLL twin
    incremental.maintain_distinct trades exactness for fixed size —
    use it when the id domain is not integral or state size rules).

    Query the result with bitmaps.distinct_count(read_state(...), keys)
    — or roll the SAME state up to any coarser grain with
    rollup_distinct, which a count-valued state could never do.
    """
    from table_computing_spark.operators import bitmaps

    keys = list(keys)
    return _stream_maintain(
        sdf, state_dir, checkpoint_dir,
        build_first=lambda b: bitmaps.distinct_state(b, keys, col),
        merge_in=lambda old, b: bitmaps.merge_states(
            old, bitmaps.distinct_state(b, keys, col), keys
        ),
        available_now=available_now,
    )


def stream_maintain_tdigest(
    sdf: DataFrame,
    col: str,
    state_dir: str,
    checkpoint_dir: str,
    group_cols: "Sequence[str] | None" = None,
    delta: int = 400,
    available_now: bool = True,
):
    """Maintain per-group QUANTILE state (a mergeable t-digest,
    operators/tdigest.py) from an append stream: each micro-batch
    sketches its own rows and merges with the persisted digest under
    the versioned ping-pong + batch-id idempotence contract — the
    quantile face of the same pattern as stream_maintain_agg (sums)
    and stream_maintain_distinct (bitmaps). Historical rows are never
    replayed; state is O(delta) floats per group.

    Query the result with tdigest.tdigest_quantiles(read_state(...)).
    The two-level rank-error bound (1/delta per merge level) holds
    however many batches merged in — digests compose associatively.
    """
    from table_computing_spark.operators import tdigest as td

    groups = list(group_cols or [])
    return _stream_maintain(
        sdf, state_dir, checkpoint_dir,
        build_first=lambda b: td.tdigest_sketch(b, col, delta, groups or None),
        merge_in=lambda old, b: td.merge_sketches(
            old, td.tdigest_sketch(b, col, delta, groups or None),
            delta, groups or None,
        ),
        available_now=available_now,
    )


def stream_maintain_kmv(
    sdf: DataFrame,
    keys: Sequence[str],
    col: str,
    state_dir: str,
    checkpoint_dir: str,
    k: int = 256,
    available_now: bool = True,
):
    """Maintain per-group KMV sketches (operators/kmv.py) from an
    append stream: each micro-batch sketches its own rows and
    union-merges with the persisted state under the same versioned
    ping-pong + batch-id idempotence contract as the other maintainers
    (sums / bitmaps / t-digests / hash-sums). Because the sketch is a
    pure md5 function of the data, the maintained state equals the
    batch sketch of everything ingested BIT-FOR-BIT — which is what
    the oracle gate hashes. State is k longs per group.

    Query with kmv.kmv_estimate(read_state(...), keys) or feed two
    maintained states to kmv.kmv_set_ops."""
    from table_computing_spark.operators import kmv

    keys = list(keys)
    # n_cells pinned: a micro-batch's distinct set is bounded by the
    # batch size, and "auto"'s approx-distinct pre-estimate would add
    # an extra job to every trigger
    return _stream_maintain(
        sdf, state_dir, checkpoint_dir,
        build_first=lambda b: kmv.kmv_sketch(b, keys, col, k, n_cells=256),
        merge_in=lambda old, b: kmv.kmv_merge(
            old, kmv.kmv_sketch(b, keys, col, k, n_cells=256), keys, k
        ),
        available_now=available_now,
    )
