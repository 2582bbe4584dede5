"""Streaming near-duplicate detection — MinHash + banded LSH over an
unbounded document stream.

Batch minhash (operators/dedup.py) computes signatures with an
explode + groupBy aggregate; in streaming that would be a stateful
aggregation BEFORE the dedup state op (two chained stateful operators).
Instead the whole signature → band-bucket pipeline runs INSIDE one row
(a vectorized Arrow-batched pandas UDF), so the only stateful operator
is the bucket registry:

    doc row ──(pandas UDF: shingle→minhash→band buckets array)──▶
    posexplode ──▶ (band, bucket) rows ──groupBy(band, bucket)──▶
    applyInPandasWithState: first doc to claim a bucket is the anchor;
    every later doc in the same bucket emits a candidate pair
    (id_a=anchor, id_b=later, band, bucket).

Output is the streaming analog of batch minhash_lsh's candidate pairs:
the same (a, b) pair may surface from several bands — consumers dedup /
verify downstream (exact Jaccard on the candidate set is cheap).

State is ONE row per occupied (band, bucket) — O(distinct buckets), not
O(docs) — and expires `state_retention_ms` after the bucket's last
event via EventTimeTimeout, so a 100 TB/day stream holds only the
retention horizon. A doc arriving after its anchor expired re-anchors
the bucket (documented recall loss at the horizon — the standard
trade).

The hash family here (pandas hash_array + splitmix-style affine mixes)
is deterministic across runs/executors but intentionally NOT the batch
operator's xxhash64 family — signatures are engine-internal either way;
tests pin planted-duplicate recall, not hash values.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _band_buckets_udf(num_hashes: int, bands: int, shingle_k: int):
    """pandas UDF (doc_id, text) → array<long> of `bands` bucket ids.

    Vectorized per doc: one hash_array over the shingle strings, then a
    (num_hashes × shingles) affine family in uint64 (wrapping) and a
    per-band polynomial fold. Shingle-less docs get a per-id sentinel
    shingle so they only ever bucket with themselves (mirrors batch
    minhash_signatures' sentinel)."""
    rows_per_band = num_hashes // bands
    if rows_per_band * bands != num_hashes:
        raise ValueError("num_hashes must be divisible by bands")

    @pandas_udf(T.ArrayType(T.LongType()))
    def buckets(ids: pd.Series, texts: pd.Series) -> pd.Series:
        import numpy as np

        # deterministic splitmix-style odd multipliers / offsets per hash
        idx = np.arange(num_hashes, dtype=np.uint64)
        A = idx * np.uint64(0x9E3779B97F4A7C15) | np.uint64(1)
        B = idx * np.uint64(0xBF58476D1CE4E5B9)
        out = []
        for doc_id, txt in zip(ids, texts):
            toks = (txt or "").lower().split()
            if len(toks) >= shingle_k:
                sh = [
                    " ".join(toks[i : i + shingle_k])
                    for i in range(len(toks) - shingle_k + 1)
                ]
            else:
                # sentinel: unique per doc, never collides with real text
                sh = [f"\x00sentinel\x00{doc_id}"]
            base = pd.util.hash_array(np.array(sh, dtype=object)).astype(np.uint64)
            M = base[None, :] * A[:, None] + B[:, None]  # (H, S), wraps mod 2^64
            mins = M.min(axis=1).reshape(bands, rows_per_band)
            acc = np.zeros(bands, dtype=np.uint64)
            for r in range(rows_per_band):
                acc = acc * np.uint64(1099511628211) + mins[:, r]
            out.append(acc.astype(np.int64).tolist())
        return pd.Series(out)

    return buckets


def stream_minhash_pairs(
    sdf: DataFrame,
    event_time_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    watermark: str = "10 seconds",
    state_retention_ms: int = 3_600_000,
) -> DataFrame:
    """Streaming MinHash+LSH near-dup candidate pairs.

    `event_time_col` must be TimestampType; a watermark is applied here.
    Returns an append stream of (id_a, id_b, band, bucket) where id_a is
    the bucket's anchor (first-seen doc) and id_b a later doc whose
    signature collided in that band.
    """
    sdf = sdf.withWatermark(event_time_col, watermark)
    mk = _band_buckets_udf(num_hashes, bands, shingle_k)
    ex = sdf.select(
        F.col(id_col).alias("__id"),
        F.col(event_time_col).alias("__t"),
        F.posexplode(mk(F.col(id_col), F.col(text_col))).alias("band", "bucket"),
    )
    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("band", T.IntegerType()),
            T.StructField("bucket", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("anchor", T.LongType())])

    def fn(key, pdfs, state):
        band, bucket = key
        if state.hasTimedOut:
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if not len(batch):
            return
        batch = batch.sort_values(["__t", "__id"], kind="mergesort")
        anchor = int(state.get[0]) if state.exists else None
        pairs = []
        for doc in batch["__id"].astype("int64"):
            doc = int(doc)
            if anchor is None:
                anchor = doc
            elif doc != anchor:
                pairs.append((anchor, doc, int(band), int(bucket)))
        state.update((anchor,))
        last_ms = int(batch["__t"].max().value // 1_000_000)
        state.setTimeoutTimestamp(last_ms + state_retention_ms)
        if pairs:
            yield pd.DataFrame(pairs, columns=["id_a", "id_b", "band", "bucket"])

    return ex.groupBy("band", "bucket").applyInPandasWithState(
        fn, out_schema, state_schema, "append", "EventTimeTimeout"
    )
