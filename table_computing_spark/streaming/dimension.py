"""Periodically refreshed dimension tables for stream enrichment.

ref sp/dimension/DimensionTable.java:8-59 + RdsDimensionTable.java:37-145:
a scheduled thread re-SELECTs the whole dimension every refreshInterval,
builds a hash index on the PK columns, and atomically swaps the snapshot
(`volatile tableIndex`); compute threads read the current snapshot and
do an index nested-loop left join. Readers block until the first load.

Spark-first: the snapshot is a DataFrame produced by any loader
(spark.read.jdbc / parquet / ...), refreshed on wall-clock inside
`foreachBatch`, and joined with `broadcast()` — the broadcast IS the
hash index, shipped to every executor. Atomic swap == rebinding the
Python reference; each micro-batch plan captures one snapshot.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DimensionTable:
    """Refreshing dimension snapshot + broadcast join.

    loader          — () -> DataFrame, called at refresh time (the
                      re-SELECT of RdsDimensionTable.java:73-145).
    refresh_interval_s — wall-clock seconds between reloads (ref
                      refreshInterval; <= 0 reloads every access).
    cache           — persist each snapshot so repeated joins inside an
                      interval don't re-read the source.
    """

    def __init__(
        self,
        loader: Callable[[], DataFrame],
        refresh_interval_s: float = 60.0,
        cache: bool = True,
    ):
        self._loader = loader
        self._interval = refresh_interval_s
        self._cache = cache
        self._snapshot: DataFrame | None = None
        self._loaded_at: float = float("-inf")
        self.reload_count = 0

    def snapshot(self) -> DataFrame:
        """Current snapshot; reloads when stale. First call blocks on the
        initial load (ref DimensionTable.java:47-50 waits for tableIndex)."""
        now = time.monotonic()
        if self._snapshot is None or now - self._loaded_at >= self._interval:
            fresh = self._loader()
            if self._cache:
                fresh = fresh.persist()
                fresh.count()  # materialize eagerly: swap only a ready snapshot
            old = self._snapshot
            self._snapshot = fresh  # atomic swap (volatile-field analog)
            self._loaded_at = now
            self.reload_count += 1
            if old is not None and self._cache:
                old.unpersist()
        return self._snapshot

    def join(
        self,
        fact: DataFrame,
        on: Sequence[str] | Sequence[tuple[str, str]],
        how: str = "left",
        null_safe: bool = True,
    ) -> DataFrame:
        """Dimension join against the current snapshot (ref README.md:104-120
        leftJoin via TableIndex.getRows). Broadcast by construction —
        dimension snapshots are small relative to the stream. Null keys
        match by default (reference hash-index semantics, SURVEY §1.2)."""
        dim = F.broadcast(self.snapshot())
        pairs = [(c, c) if isinstance(c, str) else c for c in on]
        eq = [
            (fact[l].eqNullSafe(dim[r]) if null_safe else fact[l] == dim[r])
            for l, r in pairs
        ]
        cond = eq[0]
        for e in eq[1:]:
            cond = cond & e
        joined = fact.join(dim, cond, how)
        # drop the duplicate right-side key columns (reference joins emit
        # renamed columns via As maps; equi-keys are redundant)
        for l, r in pairs:
            if l == r:
                joined = joined.drop(dim[r])
        return joined

    def unpersist(self) -> None:
        if self._snapshot is not None and self._cache:
            self._snapshot.unpersist()
