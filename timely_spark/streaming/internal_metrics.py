"""Internal telemetry — the engine reports its own ``timely.*`` metrics.

Reference: server/.../store/InternalMetrics.java:10-21,76-101 writes
counters (metrics received, queries run, cache size) back into the store
every 30 s (DataStore.java:224-227).

Spark: a StreamingQueryListener translating streaming progress events
into points, written through the normal store path — so the engine's own
health is queryable with the same API.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class InternalMetricsListener(StreamingQueryListener):
    """Collects per-progress-event rates; ``drain()`` returns accumulated
    points (metric, ts, value, tags, viz) for a periodic store write."""

    def __init__(self) -> None:
        self._buf: list[tuple] = []

    def onQueryStarted(self, event) -> None:
        self._buf.append(
            ("timely.query.started", int(time.time() * 1000), 1.0, {"id": str(event.id)}, None)
        )

    def onQueryProgress(self, event) -> None:
        p = event.progress
        ts = int(time.time() * 1000)
        tags = {"id": str(p.id), "name": p.name or ""}
        self._buf.append(("timely.stream.inputRows", ts, float(p.numInputRows), tags, None))
        if p.inputRowsPerSecond is not None:
            self._buf.append(
                ("timely.stream.inputRate", ts, float(p.inputRowsPerSecond), tags, None)
            )
        if p.processedRowsPerSecond is not None:
            self._buf.append(
                ("timely.stream.processRate", ts, float(p.processedRowsPerSecond), tags, None)
            )

    def onQueryTerminated(self, event) -> None:
        self._buf.append(
            ("timely.query.terminated", int(time.time() * 1000), 1.0, {"id": str(event.id)}, None)
        )

    def onQueryIdle(self, event) -> None:
        pass

    def drain(self, spark: SparkSession):
        from ..model import METRIC_SCHEMA

        rows, self._buf = self._buf, []
        return spark.createDataFrame(rows, METRIC_SCHEMA)
