"""The Flink summarization job's FULL topology, Spark-native:
WS subscription source -> tumbling event-time windows -> put-line TCP sink.

Reference: analytics/src/main/java/timely/analytics/flink/SummarizationJob.java:40-105
(addSource(SubscriptionSource) -> keyBy(metric, tags) -> tumbling window
fold into MetricHistogram -> SocketClientSink put-lines back to Timely's
TCP port) and SubscriptionSource.java:32-140 (the WS client that turns
subscription frames into the stream, counting complete:true markers per
metric to know when the source is exhausted).

Spark mapping: Structured Streaming has no arbitrary-socket source, so
the subscription client bridges frames into a JSONL spool directory
(atomic per-frame files) that a ``readStream`` file source consumes —
the standard external-push -> file-bridge pattern. The windowed
aggregation is the SAME plan as :func:`..summarize.summarization_query`
(one expression list shared with the batch path), and the write-back
serializes each summary row into the reference's sample-tagged put
lines and sends them over a REAL TCP connection to the engine's put
socket — the SocketClientSink analogue, closing the loop through the
same ingest path every other producer uses.

Scale: the spool bridge runs on the driver (one WS session, line-rate
I/O only — the reference's SubscriptionSource is likewise a single
non-parallel source, SubscriptionSource.java:32); all aggregation work
is distributed behind the file source. At production volume the same
job shape runs against the store-backed subscription directly
(streaming/subscription.py), skipping the socket hop.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .summarize import summarization_query

# MetricResponse frame fields (MetricResponse.java:14-22)
_SPOOL_SCHEMA = (
    "metric string, timestamp long, value double, "
    "tags array<struct<key:string,value:string>>"
)


class SubscriptionSpool:
    """Bridge WS subscription frames into a file-source-readable spool.

    Each incoming frame's non-complete responses append ONE atomic JSONL
    file (write-to-tmp + rename), so the Spark file source never
    observes a partial file. ``complete:true`` markers decrement the
    per-metric remaining counter (SubscriptionSource.java:62,118)."""

    def __init__(self, spool_dir: str, n_metrics: int):
        self.dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self._n = 0
        self._lock = threading.Lock()
        self.remaining = n_metrics
        self.rows_spooled = 0

    def handle(self, frame: dict) -> None:
        rows = []
        for r in frame.get("responses", []):
            if r.get("complete"):
                with self._lock:
                    self.remaining -= 1
            else:
                rows.append(
                    {
                        "metric": r["metric"],
                        "timestamp": r["timestamp"],
                        "value": r["value"],
                        "tags": r.get("tags") or [],
                    }
                )
        if not rows:
            return
        with self._lock:
            part = os.path.join(self.dir, f"part-{self._n:06d}.jsonl")
            self._n += 1
            self.rows_spooled += len(rows)
        tmp = part + ".tmp"
        with open(tmp, "w") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
        os.rename(tmp, part)

    def await_complete(self, timeout: float = 120.0) -> bool:
        deadline = time.time() + timeout
        while time.time() < deadline:
            with self._lock:
                if self.remaining <= 0:
                    return True
            time.sleep(0.2)
        return False

    def await_rows(self, n: int, timeout: float = 120.0) -> bool:
        deadline = time.time() + timeout
        while time.time() < deadline:
            with self._lock:
                if self.rows_spooled >= n:
                    return True
            time.sleep(0.2)
        return False


def spool_points(spark: SparkSession, spool_dir: str):
    """Streaming points frame over a subscription spool: MetricResponse
    rows -> the engine's point schema (tags entry-list -> map)."""
    raw = (
        spark.readStream.schema(_SPOOL_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .json(spool_dir)
    )
    return raw.select(
        "metric",
        F.col("timestamp").alias("ts"),
        "value",
        F.map_from_entries("tags").alias("tags"),
    )


def summary_put_lines(summary_rows) -> list[str]:
    """Serialize summary rows into the reference's write-back put lines:
    one line per stat with a ``sample=<stat>`` tag
    (MetricHistogram.serialize:123-167 emits exactly this wire form)."""
    from .summarize import SAMPLE_TAG

    lines = []
    for r in summary_rows:
        base = dict(r["tags"] or {})
        for col, sample in SAMPLE_TAG.items():
            tags = {**base, "sample": sample}
            tag_str = " ".join(f"{k}={v}" for k, v in sorted(tags.items()))
            lines.append(f"put {r['metric']} {r['bucket_ts']} {float(r[col])} {tag_str}")
    return lines


class SubscriptionSummarizationJob:
    """SummarizationJob.java:40-105 as one driveable object.

    ``run_backlog`` executes the bounded form: subscribe (finite or
    externally-completed), drain the spool through the watermarked
    streaming summarization plan with ``availableNow``, then push the
    summary as put lines over a real TCP connection to the engine's
    ingest socket."""

    def __init__(
        self,
        spark: SparkSession,
        ws_host: str,
        ws_port: int,
        tcp_host: str,
        tcp_port: int,
        metrics: list[str],
        window_seconds: int,
        work_dir: str,
        watermark_seconds: int = 120,
    ):
        self.spark = spark
        self.ws = (ws_host, ws_port)
        self.tcp = (tcp_host, tcp_port)
        self.metrics = list(metrics)
        self.window_seconds = window_seconds
        self.work_dir = work_dir
        self.watermark_seconds = watermark_seconds
        self.spool = SubscriptionSpool(
            os.path.join(work_dir, "spool"), len(self.metrics)
        )
        self.client = None

    def subscribe(self, start_ms: int = 0, end_ms: int = 0, tags=None):
        from ..client import TimelySubscriptionClient

        self.client = TimelySubscriptionClient(
            self.ws[0], self.ws[1], subscription_id=f"sumjob-{uuid.uuid4()}"
        ).open(self.spool.handle)
        for m in self.metrics:
            self.client.add_subscription(
                m, tags=tags, start_time_ms=start_ms, end_time_ms=end_ms
            )
        return self

    def stop_subscription(self) -> None:
        if self.client is not None:
            for m in self.metrics:
                self.client.remove_subscription(m)

    def run_backlog(self, exact: bool = False, timeout: float = 240.0) -> int:
        """Drain everything spooled so far through the summarization plan
        and TCP-sink the result; returns the number of put lines sent."""
        out = os.path.join(self.work_dir, "summary_out")
        q = summarization_query(
            spool_points(self.spark, self.spool.dir),
            self.window_seconds,
            checkpoint=os.path.join(self.work_dir, "ck"),
            out_path=out,
            watermark_seconds=self.watermark_seconds,
            exact=exact,
            available_now=True,
        )
        q.awaitTermination(timeout)
        try:
            rows = self.spark.read.parquet(out).collect()
        except Exception:
            rows = []  # no closed windows yet
        lines = summary_put_lines(rows)
        if lines:
            from ..client import TimelyTcpClient

            with TimelyTcpClient(self.tcp[0], self.tcp[1]) as tc:
                for line in lines:
                    tc.write(line + "\n")
                tc.flush()
        return len(lines)

    def close(self) -> None:
        if self.client is not None:
            self.client.close()
