"""Streaming FIR filter — W2 (TimeSeriesGroupingIterator.java:30-259)
over a live stream.

Batch FIR is a linear combination of ``lag`` columns inside one window
(operators/fir.py); a *stream* can't use ``lag`` because the previous
F-1 points of a series may be in earlier micro-batches. Same shape as
streaming rate (stateful_rate.py): ``applyInPandasWithState`` with
state = the ring buffer of the last F-1 values per series (plus the
last timestamp for the monotonic-state guard).

Semantics parity with the batch operator (golden-tested against it):
- once a series has F points, each point emits
  sum(weights[i] * window[i]) with weights in time order
  (weights[0] -> oldest, TimeSeriesGroupingIterator.java:215-247)
- the first F-1 points of each series emit nothing
- out-of-order points arriving in a later micro-batch than a newer
  point are dropped (same guard as streaming rate)

Scale notes: state is ~8*(F-1)+8 bytes per live series, hash-partitioned
by series key — the one groupBy shuffle per micro-batch, after which
state access is executor-local. F is a query constant (typically <=
tens of weights), so state stays tiny even with millions of live series.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T  # noqa: N812

from ..operators.fir import parse_weights

FIR_OUTPUT_SCHEMA = T.StructType(
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
        T.StructField("window", T.ArrayType(T.DoubleType())),
    ]
)


def streaming_fir(
    points: DataFrame,
    weights: list[float] | str,
) -> DataFrame:
    """points stream (metric, ts, value, tags, viz) -> per-series FIR
    stream (series_key, metric, ts, value)."""
    if isinstance(weights, str):
        weights = parse_weights(weights)
    ws = [float(w) for w in weights]
    n = len(ws)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (series_key,) = key
        if state.exists:
            last_ts, window = state.get
            window = list(window)
        else:
            last_ts, window = None, []

        out_ts: list[int] = []
        out_v: list[float] = []
        metric = None
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for row in pdf.itertuples(index=False):
                metric = row.metric
                t, v = int(row.ts), float(row.value)
                if last_ts is not None and t <= last_ts:
                    continue  # monotonic-state guard, as in streaming rate
                window.append(v)
                if len(window) > n:
                    window.pop(0)
                if len(window) == n:
                    out_ts.append(t)
                    out_v.append(sum(w * x for w, x in zip(ws, window)))
                last_ts = t
        state.update((last_ts, window))
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
        outputStructType=FIR_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
