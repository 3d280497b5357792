"""Gap-based sessionization, batch and streaming, via native session
windows.

The batch driver query (``events_sessionize``) expresses 30-minute
inactivity sessions with lag + running-sum — the portable SQL shape its
DuckDB oracle can mirror. This module is the engine-native counterpart:
``F.session_window`` gives the same gap semantics as a first-class
(and STREAMING-capable) operator, with Spark's session-window state
store carrying open sessions across micro-batches — the piece a
training-data pipeline needs when events arrive continuously.

Boundary note: the lag formulation starts a new session when
``diff > gap`` while ``session_window`` closes at ``diff >= gap`` (the
window spans ``[t, t+gap)``). Real event streams hit the exact-gap
millisecond with probability ~0; tests steer clear of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_ms_col: str = "ts_ms",
    value_col: str = "value",
) -> DataFrame:
    """Batch sessionization over (user, epoch-ms, value) rows: one row
    per session with count/duration/value-sum. Single shuffle on the
    user key; the session grouping itself is a native aggregation."""
    ev = events.withColumn("event_time", F.timestamp_millis(F.col(ts_ms_col)))
    return (
        ev.groupBy(
            F.col(user_col),
            F.session_window("event_time", f"{gap_minutes} minutes").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(ts_ms_col) - F.min(ts_ms_col)).alias("duration_ms"),
            F.round(F.sum(F.col(value_col).cast("decimal(38,10)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            user_col,
            F.unix_millis("w.start").alias("session_start_ms"),
            "n_events",
            "duration_ms",
            "sum_value",
        )
    )


def sessionize_stream(
    stream: DataFrame,
    checkpoint: str,
    out_path: str,
    gap_minutes: int = 30,
    watermark_seconds: int = 120,
    user_col: str = "user_id",
    ts_ms_col: str = "ts_ms",
    value_col: str = "value",
    available_now: bool = False,
):
    """Streaming sessionization: the same session_window aggregation with
    a watermark; Spark's state store keeps open sessions across
    micro-batches and emits each one when the watermark passes its close
    (append mode). At scale, state is bounded by OPEN sessions only —
    closed sessions leave the store on emission."""
    wm = stream.withColumn(
        "event_time", F.timestamp_millis(F.col(ts_ms_col))
    ).withWatermark("event_time", f"{watermark_seconds} seconds")
    agg = (
        wm.groupBy(
            F.col(user_col),
            F.session_window("event_time", f"{gap_minutes} minutes").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(ts_ms_col) - F.min(ts_ms_col)).alias("duration_ms"),
            F.round(F.sum(F.col(value_col).cast("decimal(38,10)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            user_col,
            F.unix_millis("w.start").alias("session_start_ms"),
            "n_events",
            "duration_ms",
            "sum_value",
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
    return writer.start()
