"""Streaming rate — W1 (RateIterator.java:23-108) over a live stream.

Batch rate uses a window function (operators/rate.py); a *stream* can't:
the previous point of each series may be many micro-batches in the past.
This is exactly the custom-stateful-operator shape Structured Streaming
covers with ``applyInPandasWithState`` — state = the last (ts, value) per
series, updated per micro-batch, emitting one rate row per consecutive
pair exactly like the iterator.

Semantics parity with the batch operator (golden-tested against it):
- rate = (v2 - v1) / (t2 - t1) * interval_ms
- counter mode: on decrease add counter_max (or the previous value when
  counter_max is unset); result > reset_value (>0) emits 0
- each series' first-ever point emits nothing (no pair yet)

Scale notes: state is ~24 bytes per live series, hash-partitioned by
series key across executors — the same key the store sorts by, so state
access is local after the one groupBy shuffle per micro-batch. Use
watermarks upstream to bound how out-of-order points can be; like the
reference's Gorilla cache (GorillaStore.java:293-316), an out-of-order
point within a micro-batch is handled by sorting the batch, while one
arriving in a LATER batch than a newer point is dropped (monotonic-state
guard) rather than emitting a negative-dt rate.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from ..operators.rate import RateOptions

RATE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("series_key", T.StringType(), False),
        T.StructField("metric", T.StringType(), True),
        T.StructField("ts", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts", T.LongType()),
        T.StructField("last_value", T.DoubleType()),
    ]
)


def streaming_rate(
    points: DataFrame,
    options: RateOptions | None = None,
) -> DataFrame:
    """points stream (metric, ts, value, tags, viz) -> per-series rate
    stream (series_key, metric, ts, value).

    Works on both streaming and batch DataFrames (applyInPandasWithState
    requires streaming; for batch inputs Spark executes the same function
    with per-group state scoped to the batch).
    """
    opt = options or RateOptions()
    interval = float(opt.interval_ms if opt.interval_ms is not None else 1000)
    counter = opt.counter
    counter_max = opt.counter_max
    reset_value = float(opt.reset_value or 0)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # r13 (guide §4.2): vectorized — the old per-row itertuples loop
        # was the drain's dominant Python cost at backlog volume. The
        # numpy form reproduces the scalar semantics exactly, per pdf
        # chunk with the (last_ts, last_value) state carried across
        # chunks like the loop did:
        # - within a sorted chunk only the PREFIX can violate the
        #   monotonic-state guard (t < incoming last_ts), so the guard
        #   is one boolean mask;
        # - rate = diff(v)/diff(t)*interval elementwise, the same IEEE
        #   double ops in the same order as the scalar code;
        # - equal-timestamp pairs (dt == 0) emit 0.0;
        # - counter mode adds counter_max (or the previous value) to
        #   negative deltas and zeroes rates above reset_value.
        import numpy as np

        (series_key,) = key
        if state.exists:
            last_ts, last_v = state.get
        else:
            last_ts, last_v = None, None

        frames: list[pd.DataFrame] = []
        metric = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values("ts")
            metric = pdf["metric"].iloc[-1]
            ts = pdf["ts"].to_numpy(dtype=np.int64)
            vv = pdf["value"].to_numpy(dtype=np.float64)
            if last_ts is not None:
                keep = ts >= last_ts  # monotonic-state guard prefix
                ts, vv = ts[keep], vv[keep]
                if len(ts) == 0:
                    continue
                seq_t = np.concatenate(([last_ts], ts))
                seq_v = np.concatenate(([last_v], vv))
            else:
                seq_t, seq_v = ts, vv
            last_ts, last_v = int(seq_t[-1]), float(seq_v[-1])
            if len(seq_t) < 2:
                continue
            dt = np.diff(seq_t)
            dv = seq_v[1:] - seq_v[:-1]
            if counter:
                neg = dv < 0
                if counter_max is not None:
                    dv = np.where(neg, dv + counter_max, dv)
                else:
                    dv = np.where(neg, dv + seq_v[:-1], dv)
            with np.errstate(divide="ignore", invalid="ignore"):
                r = dv / dt * interval
            if counter and reset_value > 0:
                r = np.where(r > reset_value, 0.0, r)
            r = np.where(dt == 0, 0.0, r)  # equal-timestamp pair -> 0.0
            frames.append(
                pd.DataFrame(
                    {
                        "series_key": series_key,
                        "metric": metric,
                        "ts": seq_t[1:],
                        "value": r,
                    }
                )
            )
        state.update((last_ts, last_v))
        if frames:
            yield pd.concat(frames, ignore_index=True)

    from ..model import series_id

    keyed = points.withColumn("__series", series_id())
    return keyed.groupBy("__series").applyInPandasWithState(
        update,
        outputStructType=RATE_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
