"""Rate (first derivative) with counter semantics.

Reference: server/.../sample/iterators/RateIterator.java:23-108 — per
series, over consecutive point pairs:

    rate = (v2 - v1) / (t2 - t1) * interval_ms

- default ``interval`` = the downsample period, else 1000 ms
  (DataStore.java:713-721);
- counter mode: when v2 < v1 the counter wrapped — add ``counterMax``
  (or, when counterMax unset, the previous value v1) to the delta;
- if the resulting rate exceeds ``resetValue`` (>0), emit 0.

Spark shape: ``lag`` over ``Window.partitionBy(series).orderBy(ts)`` —
one shuffle on series id; with the store partitioned by (metric, day)
and sorted within partitions by (series, ts), AQE turns this into a
mostly local sort at scale. The first point of each series produces no
output row (no previous pair), matching the iterator.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..model import series_id


@dataclass
class RateOptions:
    counter: bool = False
    counter_max: int | None = None
    reset_value: int = 0
    # None = "not set": defaults to the downsample period when one exists,
    # else 1000 ms (DataStore.java:713-721)
    interval_ms: int | None = None

    @classmethod
    def from_dict(cls, d: dict | None) -> "RateOptions":
        d = d or {}
        interval = d.get("interval")
        interval_ms: int | None
        if isinstance(interval, str):
            import re

            from ..parse import _UNIT_MS

            m = re.match(r"^(\d+)(ms|s|m|h|d)$", interval)
            interval_ms = int(m.group(1)) * _UNIT_MS[m.group(2)] if m else None
        else:
            interval_ms = int(interval) if interval else None
        return cls(
            counter=bool(d.get("counter", False)),
            counter_max=d.get("counterMax"),
            reset_value=int(d.get("resetValue", 0) or 0),
            interval_ms=interval_ms,
        )


def rate(
    df: DataFrame,
    options: RateOptions | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
    series_col: str | None = None,
) -> DataFrame:
    """Replace ``value`` with its per-series rate; drops each series' first point.

    ``series_col``: name of a MATERIALIZED series-key column to window on
    instead of the computed ``series_id()`` expression. When the input is
    a series-bucketed table (store.write_points_bucketed), windowing on
    the stored column lets the bucketed scan satisfy the window's
    distribution — the Exchange disappears from the plan entirely.
    """
    opt = options or RateOptions()
    key = F.col(series_col) if series_col else series_id()
    w = Window.partitionBy(key).orderBy(F.col(ts_col))
    prev_v = F.lag(value_col).over(w)
    prev_t = F.lag(ts_col).over(w)
    dt = (F.col(ts_col) - prev_t).cast("double")
    dv = F.col(value_col) - prev_v

    if opt.counter:
        # RateIterator.java:60-82: on decrease, add counterMax (or prev
        # value). The unset test is maxCounter > 0 (RateIterator.java:79),
        # NOT presence: the Grafana backend always marshals counterMax
        # (int32 zero-value, grafana/timely-datasource/backend/types.go:59),
        # so 0 must mean "no max" here too.
        wrap_add = (
            F.lit(float(opt.counter_max))
            if opt.counter_max is not None and opt.counter_max > 0
            else prev_v
        )
        dv = F.when(dv < 0, dv + wrap_add).otherwise(dv)

    interval = F.lit(float(opt.interval_ms if opt.interval_ms is not None else 1000))
    # RateIterator.java:93-95: equal-timestamp pairs emit 0.0, not a dropped
    # row (and the explicit branch is ANSI-safe — no divide-by-zero NULL).
    # A missing prev (series' first point) keeps dt NULL -> NULL -> dropped.
    r = F.when(dt == 0, F.lit(0.0)).otherwise(dv / dt * interval)

    if opt.counter and opt.reset_value > 0:
        # RateIterator.java:101-104: only a rate EXCEEDING resetValue clamps
        # to 0 — signed compare; a large negative post-wrap rate passes through
        r = F.when(r > F.lit(float(opt.reset_value)), F.lit(0.0)).otherwise(r)

    out = df.withColumn("__rate", r).filter(F.col("__rate").isNotNull())
    return out.withColumn(value_col, F.col("__rate")).drop("__rate")
