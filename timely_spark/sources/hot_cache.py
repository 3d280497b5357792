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
        self._oldest: int | None = None
        self._newest: int | None = None

    # ------------------------------------------------------------ refresh

    def refresh(self, points: DataFrame, now_ms: int | None = None) -> None:
        """(Re)load the recent window; called post-ingest or on a timer
        (the archive/age-off cycle, DataStoreCache.java:635-644)."""
        if now_ms is None:
            hi = points.agg(F.max("ts")).collect()[0][0]
            now_ms = hi if hi is not None else 0
        lo = now_ms - self.window_ms
        fresh = points.filter(F.col("ts") > lo)
        if self._df is not None:
            self._df.unpersist()
        self._df = fresh.cache()
        bounds = self._df.agg(
            F.min("ts").alias("lo"), F.max("ts").alias("hi")
        ).collect()[0]
        self._oldest, self._newest = bounds["lo"], bounds["hi"]

    # ------------------------------------------------------------- status

    @property
    def oldest_ts(self) -> int | None:
        """Cache boundary: queries older than this go to the store
        (getOldestTimestamp, DataStoreCache.java:911-922)."""
        return self._oldest

    @property
    def newest_ts(self) -> int | None:
        return self._newest

    def status(self) -> dict:
        names = (
            []
            if self._df is None
            else [
                r["metric"]
                for r in self._df.select("metric").distinct().orderBy("metric").collect()
            ]
        )
        return {"oldestTs": self._oldest, "newestTs": self._newest, "metrics": names}

    # -------------------------------------------------------------- reads

    def hybrid(self, store_points: DataFrame) -> DataFrame:
        """Union view: recent rows from the cached tier, older rows from
        the store, split at the cache's oldest ts (DataStore.java:655-690).

        Returns a plain DataFrame — callers (the query builder) see one
        logical table; the cached side serves from memory, the store side
        keeps its partition pruning.
        """
        if self._df is None or self._oldest is None:
            return store_points
        cold = store_points.filter(F.col("ts") < self._oldest)
        hot = self._df
        cols = [c for c in store_points.columns if c in hot.columns]
        return cold.select(*cols).unionByName(hot.select(*cols))

    def close(self) -> None:
        if self._df is not None:
            self._df.unpersist()
            self._df = None
            self._oldest = self._newest = None
