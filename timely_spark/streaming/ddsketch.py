"""Streaming DDSketch percentiles — bounded-state quantile telemetry.

The streaming counterpart of ``operators/rollup.py``'s DDSketch tier:
per (metric, event-time window) the state the streaming aggregation
carries is the SKETCH — one counter per occupied (sign, log-bucket) —
so state size is bounded by the value log-range (~hundreds of rows at
gamma=1.02) no matter how many points a window receives. Contrast the
exact-percentile streaming summarize path, whose per-window state
buffers every value: that is the parity/testing mode, this is the
always-on production shape for percentile monitoring.

The sink carries PARTIALS (mergeable count vectors), not quantiles:
reading quantiles is a batch-side walk (``ddsketch_quantile``) over the
sink, so late re-emissions or multi-run sinks still merge exactly —
the same property the batch rollup tier relies on.

Reference analogue: none (the Flink job emits exact histograms,
MetricHistogram.java:64-167); this is the sketch-upgrade of that path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.rollup import DD_GAMMA, _dd_bucket


def ddsketch_stream_query(
    stream: DataFrame,
    window_seconds: int,
    checkpoint: str,
    out_path: str,
    watermark_seconds: int = 120,
    gamma: float = DD_GAMMA,
    available_now: bool = False,
    state_store: str = "auto",
    expected_keys: int | None = None,
):
    """Event-time tumbling windows + watermark -> DDSketch partial rows
    (metric, bucket_ts, dd_sign, dd_idx, cnt) in an append-mode parquet
    sink. Drain with ``available_now=True`` for bounded backlogs; read
    quantiles off the sink with ``operators.rollup.ddsketch_quantile``.

    ``state_store`` / ``expected_keys``: provider + stateful-shuffle
    sizing knob per ``streaming.state`` (same contract as
    ``summarization_query``); keys here are open
    (metric, window, sign, idx) partials.
    """
    wm = stream.withColumn(
        "event_time", F.timestamp_millis(F.col("ts"))
    ).withWatermark("event_time", f"{watermark_seconds} seconds")
    sign, idx = _dd_bucket("value", gamma)
    agg = (
        wm.filter(F.col("value").isNotNull())
        .groupBy(
            F.col("metric"),
            F.window("event_time", f"{window_seconds} seconds").alias("w"),
            sign,
            idx,
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "metric",
            F.unix_millis(F.col("w.start")).alias("bucket_ts"),
            "dd_sign",
            "dd_idx",
            "cnt",
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    from .state import provider_for_start

    with provider_for_start(stream.sparkSession, state_store, expected_keys):
        return writer.start()
