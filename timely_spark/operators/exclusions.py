"""Ingest exclusions: metric blocklist + per-metric tag stripping.

Reference: common/src/main/java/timely/util/Exclusions.java:26-115 — a
regex list of metrics to drop entirely and, per metric, tag keys to strip
before storage; applied on the hot ingest path (DataStore.java:390-395).

Spark: one Column predicate + one ``map_filter`` — both codegen, applied
in the ingest stream before the store write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_exclusions(
    points: DataFrame,
    metric_blocklist: list[str] | None = None,
    tag_strips: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Drop blocklisted metrics; strip configured tag keys per metric.

    ``metric_blocklist``: regexes — a metric matching ANY is dropped.
    ``tag_strips``: metric-name -> tag keys to remove from that metric's
    points ('*' as the metric applies to every metric).
    """
    df = points
    for pattern in metric_blocklist or []:
        df = df.filter(~F.col("metric").rlike(pattern))
    strips = dict(tag_strips or {})
    global_strip = strips.pop("*", [])
    if global_strip:
        keys = F.array(*[F.lit(k) for k in global_strip])
        df = df.withColumn(
            "tags", F.map_filter("tags", lambda k, _v: ~F.array_contains(keys, k))
        )
    for metric, tag_keys in strips.items():
        keys = F.array(*[F.lit(k) for k in tag_keys])
        df = df.withColumn(
            "tags",
            F.when(
                F.col("metric") == metric,
                F.map_filter("tags", lambda k, _v: ~F.array_contains(keys, k)),
            ).otherwise(F.col("tags")),
        )
    return df
