"""Mergeable t-digest quantile sketch — the 100 TB quantile path.

Completes the quantile ladder (functions.percentile exact-per-group /
percentile_approx GK / quantiles.exact_quantiles distributed selection)
with a sketch the OTHERS can't be: a small, serializable, MERGEABLE
artifact. A digest built today can be unioned with tomorrow's digest
without touching yesterday's data — the maintenance shape incremental
pipelines need (same role HLL plays for distinct counts in
incremental.py, here for order statistics).

Reference parity note: the reference has no sketch surface at all (its
aggregation is UDF-everything, sp/StreamProcessing.java:77-109); this
is part of the Spark-native extension set.

Algorithm: the *merging* t-digest construction (Dunning & Ertl,
"Computing extremely accurate quantiles using t-digests") with the k0
(uniform) scale function: values are sorted and greedily merged into
centroids of weight <= ceil(W/delta), so every centroid spans at most
a 1/delta rank slice and the midpoint-rank of any centroid is known to
within 1/(2*delta). Two merge levels (partition partials -> global)
at most double that: rank error <= 1/delta, i.e. 0.25% at the default
delta=400 — far inside the 1% audit band q_tdigest_accuracy checks.

Distribution shape (NO bounded-group caveat anywhere):

1. `tdigest_partials` — one mapInPandas pass; each task streams its
   Arrow batches into a buffered digest (memory O(delta + buffer),
   independent of partition size) and emits ONE row per
   (partition, group): (group..., means array, weights array).
2. `tdigest_merge` — groupBy(group).applyInPandas; input per group is
   (#partitions-holding-group) x O(delta) centroid rows, bounded by
   the cluster's partition count, never by data volume.
3. `tdigest_quantiles` — estimation over the sketch rows themselves
   (one tiny row per group), vectorized pandas.

Determinism: centroids are accumulated in sorted-value order with a
stable sort keyed on (mean, weight), so for a fixed input file layout
the sketch — and every estimate — is bit-stable run to run. That is
what lets the accuracy audit sit under the driver's value-hash oracle.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_GLOBAL_KEY = "__td_all__"


def _compact(means: np.ndarray, weights: np.ndarray, delta: int):
    """Merge sorted (mean, weight) clusters under the k0 size limit
    ceil(W/delta). Input must be ascending by mean; ties broken by
    weight upstream for determinism. Returns (means, weights) with at
    most ~2*delta centroids, min/max values preserved as the first and
    last cluster boundaries only in aggregate (exact extremes are
    tracked separately by callers that need them)."""
    if means.size == 0:
        return means, weights
    total = int(weights.sum())
    limit = max(1, -(-total // delta))  # ceil(W/delta)
    out_m: "list[float]" = []
    out_w: "list[int]" = []
    cur_m = float(means[0])
    cur_w = int(weights[0])
    for m, w in zip(means[1:], weights[1:]):
        w = int(w)
        if cur_w + w <= limit:
            cur_w += w
            cur_m += (float(m) - cur_m) * (w / cur_w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            cur_m, cur_w = float(m), w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m, dtype=np.float64), np.asarray(out_w, dtype=np.int64)


def _digest_of(values: np.ndarray, delta: int):
    """Digest of raw values: sort (stable) then one compaction pass."""
    v = np.sort(values.astype(np.float64), kind="stable")
    return _compact(v, np.ones(v.size, dtype=np.int64), delta)


def _merge_digests(frames: "list[tuple[np.ndarray, np.ndarray]]", delta: int):
    """Merge centroid sets: concatenate, stable-sort by (mean, weight),
    recompact. The (mean, weight) sort key pins the accumulation order
    even when distinct partitions produce centroids with equal means."""
    means = np.concatenate([m for m, _ in frames])
    weights = np.concatenate([w for _, w in frames])
    order = np.lexsort((weights, means))
    return _compact(means[order], weights[order], delta)


def _out_fields(df: DataFrame, group_cols: "list[str]") -> "list[T.StructField]":
    fields = [T.StructField(c, df.schema[c].dataType) for c in group_cols]
    fields += [
        T.StructField("td_means", T.ArrayType(T.DoubleType())),
        T.StructField("td_weights", T.ArrayType(T.LongType())),
        T.StructField("td_min", T.DoubleType()),
        T.StructField("td_max", T.DoubleType()),
    ]
    return fields


def tdigest_partials(
    df: DataFrame,
    col: str,
    delta: int = 400,
    group_cols: "Optional[Sequence[str]]" = None,
) -> DataFrame:
    """Per-partition partial digests: one output row per (partition,
    group) with centroid arrays plus exact min/max. Null values are
    dropped (they have no rank). Groups with null keys are kept —
    nulls are a real group, matching SQL GROUP BY."""
    gcols = list(group_cols or [])
    schema = T.StructType(_out_fields(df, gcols))
    cols = gcols + [col]
    src = df.select(*cols)
    buffer_cap = 32 * delta

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # group key -> [means, weights, buffered raw values, min, max]
        state: "dict[tuple, list]" = {}

        def flush(st: "list") -> None:
            if st[2]:
                raw = np.concatenate(st[2])
                st[2] = []
                dm, dw = _digest_of(raw, delta)
                st[0], st[1] = _merge_digests([(st[0], st[1]), (dm, dw)], delta)
                st[3] = min(st[3], float(raw.min()))
                st[4] = max(st[4], float(raw.max()))

        empty_m = np.empty(0, dtype=np.float64)
        empty_w = np.empty(0, dtype=np.int64)
        for pdf in batches:
            vals = pd.to_numeric(pdf[col], errors="coerce")
            mask = vals.notna().to_numpy()
            if not mask.any():
                continue
            if gcols:
                keys = list(zip(*(pdf[c][mask] for c in gcols)))
            else:
                keys = None
            arr = vals.to_numpy(dtype=np.float64)[mask]
            if keys is None:
                st = state.setdefault(
                    (_GLOBAL_KEY,), [empty_m, empty_w, [], np.inf, -np.inf]
                )
                st[2].append(arr)
                if sum(a.size for a in st[2]) >= buffer_cap:
                    flush(st)
            else:
                kf = pd.DataFrame({"__k": keys, "__v": arr})
                for key, sub in kf.groupby("__k", sort=False, dropna=False):
                    st = state.setdefault(
                        key, [empty_m, empty_w, [], np.inf, -np.inf]
                    )
                    st[2].append(sub["__v"].to_numpy())
                    if sum(a.size for a in st[2]) >= buffer_cap:
                        flush(st)
        rows = []
        for key, st in state.items():
            flush(st)
            g = list(key) if gcols else []
            rows.append(g + [st[0].tolist(), st[1].tolist(), st[3], st[4]])
        if rows:
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return src.mapInPandas(summarize, schema=schema)


def tdigest_merge(
    partials: DataFrame,
    delta: int = 400,
    group_cols: "Optional[Sequence[str]]" = None,
) -> DataFrame:
    """Merge partial digests to one sketch row per group. Input per
    group is O(partitions x delta) centroids — bounded by cluster
    shape, not data volume."""
    gcols = list(group_cols or [])
    schema = T.StructType(
        _out_fields(partials, gcols) + [T.StructField("td_n", T.LongType())]
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = [
            (
                np.asarray(m, dtype=np.float64),
                np.asarray(w, dtype=np.int64),
            )
            for m, w in zip(pdf["td_means"], pdf["td_weights"])
            if len(m)
        ]
        if not frames:
            mm, ww = np.empty(0), np.empty(0, dtype=np.int64)
        else:
            mm, ww = _merge_digests(frames, delta)
        row = [pdf.iloc[0][c] for c in gcols] + [
            mm.tolist(),
            ww.tolist(),
            float(pdf["td_min"].min()),
            float(pdf["td_max"].max()),
            int(ww.sum()),
        ]
        return pd.DataFrame([row], columns=[f.name for f in schema.fields])

    if gcols:
        return partials.groupBy(*gcols).applyInPandas(merge, schema=schema)
    return partials.groupBy(F.lit(0).alias("__g")).applyInPandas(
        lambda pdf: merge(pdf.drop(columns="__g", errors="ignore")), schema=schema
    )


def tdigest_sketch(
    df: DataFrame,
    col: str,
    delta: int = 400,
    group_cols: "Optional[Sequence[str]]" = None,
) -> DataFrame:
    """Build a sketch: (group..., td_means, td_weights, td_min, td_max,
    td_n), one row per group (one row total when ungrouped)."""
    return tdigest_merge(
        tdigest_partials(df, col, delta, group_cols), delta, group_cols
    )


def merge_sketches(
    a: DataFrame, b: DataFrame, delta: int = 400,
    group_cols: "Optional[Sequence[str]]" = None,
) -> DataFrame:
    """Incremental maintenance: sketch(old data) ++ sketch(new batch)
    without rereading old data — union the sketch rows, re-merge."""
    cols = list(group_cols or []) + ["td_means", "td_weights", "td_min", "td_max"]
    return tdigest_merge(
        a.select(*cols).unionByName(b.select(*cols)), delta, group_cols
    )


def _estimate(
    means: np.ndarray, weights: np.ndarray, vmin: float, vmax: float, qs: np.ndarray
) -> np.ndarray:
    """Standard t-digest quantile read: centroid midpoint ranks,
    linear interpolation between adjacent midpoints, clamped to the
    exact [min, max]."""
    n = weights.sum()
    if n == 0:
        return np.full(qs.size, np.nan)
    cum = np.cumsum(weights) - weights / 2.0  # midpoint ranks
    targets = qs * n
    out = np.interp(targets, cum, means)
    out = np.clip(out, vmin, vmax)
    out[targets <= cum[0]] = np.interp(
        targets[targets <= cum[0]], [0.0, cum[0]], [vmin, means[0]]
    )
    tail = targets >= cum[-1]
    out[tail] = np.interp(targets[tail], [cum[-1], float(n)], [means[-1], vmax])
    return out


def tdigest_quantiles(
    sketch: DataFrame,
    qs: Sequence[float],
    group_cols: "Optional[Sequence[str]]" = None,
) -> DataFrame:
    """Quantile estimates from a sketch: (group..., q, est) rows.
    Runs over the sketch rows (one per group) — negligible work."""
    gcols = list(group_cols or [])
    qarr = [float(q) for q in qs]
    schema = T.StructType(
        [T.StructField(c, sketch.schema[c].dataType) for c in gcols]
        + [T.StructField("q", T.DoubleType()), T.StructField("est", T.DoubleType())]
    )

    def read(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, r in pdf.iterrows():
                est = _estimate(
                    np.asarray(r["td_means"], dtype=np.float64),
                    np.asarray(r["td_weights"], dtype=np.float64),
                    float(r["td_min"]),
                    float(r["td_max"]),
                    np.asarray(qarr),
                )
                yield pd.DataFrame(
                    {
                        **{c: [r[c]] * len(qarr) for c in gcols},
                        "q": qarr,
                        "est": est,
                    }
                )

    return sketch.mapInPandas(read, schema=schema)
