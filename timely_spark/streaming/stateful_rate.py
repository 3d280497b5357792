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
        (series_key,) = key
        if state.exists:
            last_ts, last_v = state.get
        else:
            last_ts, last_v = None, None

        out_ts: list[int] = []
        out_v: list[float] = []
        metric = None
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for row in pdf.itertuples(index=False):
                metric = row.metric
                t, v = int(row.ts), float(row.value)
                if last_ts is not None:
                    if t < last_ts:
                        continue  # monotonic-state guard (GorillaStore.java:293-316)
                    if t == last_ts:
                        # RateIterator.java:93-95: equal-timestamp pair -> 0.0
                        r = 0.0
                    else:
                        dv = v - last_v
                        if counter and dv < 0:
                            dv += counter_max if counter_max is not None else last_v
                        r = dv / (t - last_ts) * interval
                        # RateIterator.java:101-104: counter mode only, signed
                        if counter and reset_value > 0 and r > reset_value:
                            r = 0.0
                    out_ts.append(t)
                    out_v.append(r)
                last_ts, last_v = t, v
        state.update((last_ts, last_v))
        if out_ts:
            yield pd.DataFrame(
                {
                    "series_key": series_key,
                    "metric": metric,
                    "ts": out_ts,
                    "value": out_v,
                }
            )

    from ..model import series_id

    keyed = points.withColumn("__series", series_id())
    return keyed.groupBy("__series").applyInPandasWithState(
        update,
        outputStructType=RATE_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
