"""Sliding dot-product (FIR) filter over each series.

Reference: server/.../sample/iterators/TimeSeriesGroupingIterator.java:30-259
— a general finite-impulse-response filter: given F weights, emit at each
point (once a series has F points) the dot product of the weights with the
last F values. A 5-point moving average is weights "0.2,0.2,0.2,0.2,0.2".

Spark shape: no collect_list needed — the dot product is a fixed linear
combination of ``lag`` columns, all inside one window over the series
(single shuffle, whole-stage codegen). Points before the window fills are
dropped, matching the iterator (it emits at the last key of each window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..model import series_id


def parse_weights(spec: str) -> list[float]:
    """Parse the reference's comma-separated filter string (e.g. "0.2,0.2,0.2,0.2,0.2")."""
    ws = [float(x) for x in spec.split(",") if x.strip() != ""]
    if not ws:
        raise ValueError(f"empty FIR filter spec {spec!r}")
    return ws


def fir_filter(
    df: DataFrame,
    weights: list[float] | str,
    ts_col: str = "ts",
    value_col: str = "value",
    series_col: str | None = None,
) -> DataFrame:
    """Replace ``value`` with the FIR-filtered value.

    weights[0] applies to the oldest point in the window, weights[-1] to
    the current point (TimeSeriesGroupingIterator.java:215-247 multiplies
    in time order).

    ``series_col``: window on a materialized series-key column (from the
    bucketed store) instead of the computed expression — zero-Exchange
    plan, same as rate().
    """
    if isinstance(weights, str):
        weights = parse_weights(weights)
    n = len(weights)
    key = F.col(series_col) if series_col else series_id()
    w = Window.partitionBy(key).orderBy(F.col(ts_col))
    # current point gets weights[-1]; lag(i) gets weights[-1-i]
    terms = [F.lag(value_col, i).over(w) * F.lit(weights[n - 1 - i]) for i in range(n)]
    filtered = terms[0]
    for t in terms[1:]:
        filtered = filtered + t
    # NULL until the window has n points -> dropped, like the iterator
    out = df.withColumn("__fir", filtered).filter(F.col("__fir").isNotNull())
    return out.withColumn(value_col, F.col("__fir")).drop("__fir")
