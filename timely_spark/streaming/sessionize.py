"""Gap-based sessionization, batch and streaming, via native session
windows.

The batch driver query (``events_sessionize``) expresses 30-minute
inactivity sessions with lag + running-sum — the portable SQL shape its
DuckDB oracle can mirror. This module is the engine-native counterpart:
``F.session_window`` gives the same gap semantics as a first-class
(and STREAMING-capable) operator, with Spark's session-window state
store carrying open sessions across micro-batches — the piece a
training-data pipeline needs when events arrive continuously.

Boundary note: the two formulations AGREE at the exact-gap boundary —
Spark's session-window merge is inclusive (an event landing exactly on
a window's end ``t+gap`` extends the session), matching the lag
formulation's strict ``diff > gap`` split. Pinned empirically by
``test_sessionize_exact_gap_boundary`` (an earlier revision documented
a ``>=`` divergence here; Spark's MergingSessionsIterator proves it
wrong, so both DuckDB oracles use ``> gap``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_lag(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_ms_col: str = "ts_ms",
    value_col: str = "value",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The lag + running-sum batch formulation (the portable SQL shape a
    DuckDB oracle mirrors 1:1): a NEW session starts when the gap to the
    previous event is STRICTLY greater than ``gap`` — events exactly
    gap-separated stay in ONE session, where ``sessionize`` (native
    session_window, half-open ``[t, t+gap)``) splits them. Output keys on
    per-session min timestamp, same shape as ``sessionize``.

    ``order_cols``: extra orderBy tiebreak columns for rows sharing a
    (user, millisecond) — without one, tied rows straddling a boundary
    would order engine-dependently."""
    w = Window.partitionBy(user_col).orderBy(ts_ms_col, *order_cols)
    gap = gap_minutes * 60_000
    flagged = events.withColumn(
        "new_sess",
        F.when(F.col(ts_ms_col) - F.lag(ts_ms_col).over(w) > gap, 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "sess_no", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy(user_col, "sess_no")
        .agg(
            F.min(ts_ms_col).alias("session_start_ms"),
            F.count(F.lit(1)).alias("n_events"),
            (F.max(ts_ms_col) - F.min(ts_ms_col)).alias("duration_ms"),
            # decimal(38,10) sum is exact, hence order-independent: a double
            # sum accumulates in partition order and round(.,4) can land on
            # either side of a half-boundary depending on the engine's plan
            F.round(F.sum(F.col(value_col).cast("decimal(38,10)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .drop("sess_no")
    )


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
    processing_time: str | None = None,
    state_store: str = "auto",
    expected_keys: int | None = None,
):
    """Streaming sessionization: the same session_window aggregation with
    a watermark; Spark's state store keeps open sessions across
    micro-batches and emits each one when the watermark passes its close
    (append mode). At scale, state is bounded by OPEN sessions only —
    closed sessions leave the store on emission. ``state_store`` /
    ``expected_keys`` (open sessions, not users): provider knob per
    streaming/state.py — 'auto' flips to RocksDB past the measured
    ~1M-open-keys-per-GiB heap ceiling."""
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
    elif processing_time:
        # forever-loop mode for the live soak (tests/test_streaming_soak)
        writer = writer.trigger(processingTime=processing_time)
    from .state import provider_for_start

    with provider_for_start(stream.sparkSession, state_store, expected_keys):
        return writer.start()
