"""Recent-window hot tier — the Gorilla-cache analogue (S7/X3).

Reference: server/.../store/cache/DataStoreCache.java keeps the last N
hours of every (cacheable) series in per-series Gorilla compressors and
answers the recent part of a query from memory; a subquery spanning the
cache boundary is split at the cache's oldest timestamp and the partial
results merge per series (DataStore.java:655-690).

Spark shape: there is only ONE durable tier (partitioned Parquet), so the
hot tier is an *optimization*, not a semantic feature — a recent-window
DataFrame pinned with ``.cache()`` (Tungsten columnar, lineage-backed; no
per-series compressor needed — Parquet encodings already play Gorilla's
compression role at rest). The hybrid read unions cache + store with the
split at the cache's oldest ts, exactly the reference's seam, and because
both sides share schema the downstream aggregation is one plan —
Catalyst handles the per-series merge that DataStore.java:655-690 did by
hand.

At scale: the cache covers `window_ms` of ingest (default 2 h ≈ the
reference's hourly-archived live compressors). Memory is bounded by
recent-window volume, not corpus size; executors evict blocks LRU under
pressure and lineage recomputes from Parquet — degradation, not failure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class HotCache:
    """Pin the trailing ``window_ms`` of the store in executor memory."""

    def __init__(self, spark: SparkSession, window_ms: int = 2 * 3_600_000):
        self.spark = spark
        self.window_ms = window_ms
        self._df: DataFrame | None = None
        self._cut: int | None = None  # window cutoff = hybrid split boundary
        self._newest: int | None = None

    # ------------------------------------------------------------ refresh

    def refresh(self, points: DataFrame, now_ms: int | None = None) -> None:
        """(Re)pin the recent window; called post-ingest or on a timer
        (the archive/age-off cycle, DataStoreCache.java:635-644).

        Job budget: ZERO Spark jobs when the caller supplies ``now_ms``
        (the ingest path already knows its batch max), ONE max(ts)
        aggregation otherwise. The split boundary is the window CUTOFF
        (now - window), not the oldest cached row — every row above the
        cutoff is in the cache by construction, so the hybrid seam is
        identical and the old min(ts)-over-the-window job disappears.
        The pinned DataFrame materializes lazily on first query."""
        if now_ms is None:
            hi = points.agg(F.max("ts")).collect()[0][0]
            now_ms = hi if hi is not None else 0
        if self._newest is not None:
            now_ms = max(now_ms, self._newest)  # window never moves backward
        cut = now_ms - self.window_ms
        fresh = points.filter(F.col("ts") > cut)
        if self._df is not None:
            self._df.unpersist()
        self._df = fresh.cache()
        self._cut, self._newest = cut, now_ms

    # ------------------------------------------------------------- status

    @property
    def oldest_ts(self) -> int | None:
        """Cache boundary: queries older than this go to the store
        (getOldestTimestamp, DataStoreCache.java:911-922). This is the
        window cutoff; the oldest actual row is >= it."""
        return None if self._cut is None else self._cut + 1

    @property
    def newest_ts(self) -> int | None:
        return self._newest

    def status(self) -> dict:
        """One aggregation job over the (cached) window — min/max/names
        together; the reference likewise walks its live maps per status
        call (DataStoreCache.java:911-922)."""
        if self._df is None:
            return {"oldestTs": None, "newestTs": None, "metrics": []}
        row = self._df.agg(
            F.min("ts").alias("lo"),
            F.max("ts").alias("hi"),
            F.sort_array(F.collect_set("metric")).alias("names"),
        ).collect()[0]
        return {"oldestTs": row["lo"], "newestTs": row["hi"], "metrics": row["names"]}

    # -------------------------------------------------------------- reads

    def hybrid(self, store_points: DataFrame) -> DataFrame:
        """Union view: recent rows from the cached tier, older rows from
        the store, split at the cache's oldest ts (DataStore.java:655-690).

        Returns a plain DataFrame — callers (the query builder) see one
        logical table; the cached side serves from memory, the store side
        keeps its partition pruning.
        """
        if self._df is None or self._cut is None:
            return store_points
        cold = store_points.filter(F.col("ts") <= self._cut)
        hot = self._df
        cols = [c for c in store_points.columns if c in hot.columns]
        return cold.select(*cols).unionByName(hot.select(*cols))

    def close(self) -> None:
        if self._df is not None:
            self._df.unpersist()
            self._df = None
            self._cut = self._newest = None
