"""Downsample (per-series time-bucket aggregation) and cross-series combine.

Reference semantics (server/.../sample/iterators/DownsampleIterator.java:34-186
and AggregationIterator.java:27-128):

1. DOWNSAMPLE: group points by exact tag set + time bucket
   (``start + floor((ts-start)/period)*period``), apply the aggregator
   per bucket.
2. AGGREGATION: fold the per-series buckets across all series that share
   the *queried* tag projection (the OpenTSDB cross-series aggregator).

Spark shape: two groupBys. Catalyst's partial/final hash aggregation
replaces the reference's memory-estimator batching
(DownsampleMemoryEstimator.java:1-101) and coordinator-side
``combineAggregation`` merge (DataStore.java:844-858) — at scale the first
groupBy is a single shuffle on (metric, series, bucket) and the second is
map-side-combinable because its keys are a subset.

``aggregator="none"`` disables bucketing (1 ms buckets == identity,
Aggregator.java:40-59) — we return the raw points unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.time import query_aligned_bucket
from ..model import projected_tags, series_id
from ..parse import DownsampleSpec
from .aggregators import agg_expr


def downsample(
    df: DataFrame,
    spec: str | DownsampleSpec,
    start_ms: int = 0,
    ts_col: str = "ts",
    value_col: str = "value",
    series_col: str | None = None,
) -> DataFrame:
    """Per-series downsample: one row per (metric, tags, bucket_ts).

    Output columns: metric, tags, bucket_ts (epoch ms), value.

    ``series_col``: group on a materialized series-key column (bucketed
    store) — HashPartitioning(series_key) satisfies the grouping's
    ClusteredDistribution, so the aggregation runs without an Exchange.
    """
    if isinstance(spec, str):
        spec = DownsampleSpec.parse(spec)
    if spec.aggregator == "none":
        # 1 ms buckets == identity (DownsampleIterator.java:161-169)
        return df.select(
            "metric", "tags", F.col(ts_col).alias("bucket_ts"), F.col(value_col).alias("value")
        )
    bucket = query_aligned_bucket(ts_col, start_ms, spec.period_ms)
    key = F.col(series_col) if series_col else series_id()
    return (
        df.withColumn("bucket_ts", bucket)
        .withColumn("__series", key)
        .groupBy("__series", "bucket_ts")
        .agg(
            F.first("metric").alias("metric"),
            F.first("tags").alias("tags"),
            agg_expr(spec.aggregator, value_col).alias("value"),
        )
        .drop("__series")
        .select("metric", "tags", "bucket_ts", "value")
    )


def combine_series(
    downsampled: DataFrame,
    group_tag_keys: list[str],
    aggregator: str,
    value_col: str = "value",
) -> DataFrame:
    """Cross-series combine keyed by the queried tag projection.

    Tag projection: the result keeps ONLY the tag keys named in the query
    (DataStore.java:752-762); all series mapping to the same projected tag
    set merge under ``aggregator`` (AggregationIterator.java:27-128).

    Output: metric, tags (projected map), bucket_ts, value.
    """
    # r13: SQL-rendered projection (one parse, not a lambda-builder
    # py4j exchange) — values identical, see model.projected_tags
    proj = downsampled.withColumn(
        "tags", projected_tags(group_tag_keys)
    )
    # map columns can't be groupBy keys pre-Spark-3.x semantics; use the
    # canonical sorted rendering as the shuffle key, keep the map via first()
    proj = proj.withColumn("__gkey", series_id())
    return (
        proj.groupBy("__gkey", "bucket_ts")
        .agg(
            F.first("metric").alias("metric"),
            F.first("tags").alias("tags"),
            agg_expr(aggregator, value_col).alias("value"),
        )
        .select("metric", "tags", "bucket_ts", "value")
    )
