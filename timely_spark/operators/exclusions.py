"""Ingest exclusions: metric blocklist + per-metric tag stripping.

Reference: common/src/main/java/timely/util/Exclusions.java:60-149 — a
regex list of metrics to drop entirely and, per metric, tag keys to
strip before storage; applied on the hot ingest path
(DataStore.java:390-395). Exact reference semantics (pinned by
ExclusionTest.java:31-44, ported in tests/test_operators.py):

- each blocklist pattern gets ``.*`` auto-appended unless it already
  ends with ``.*`` (Exclusions.getFilteredMetrics:62-69);
- the pattern FULL-matches (``String.matches``) the *metric line* —
  ``metric tag1=v1 tag2=v2`` with tags key-sorted
  (Exclusions.buildMetricLine:118-123) — so exclusions can key off tag
  values, not just metric names;
- tag strips are an exact metric-name lookup removing listed keys
  (Exclusions.filterExcludedTags:140-149).

Spark: one Column predicate + one ``map_filter`` — both codegen,
applied in the ingest stream before the store write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import sorted_tag_line


def _metric_line():
    """``metric tag1=v1 tag2=v2`` with key-sorted tags — the string the
    reference matches its exclusion regexes against."""
    return F.when(
        F.size(F.map_keys("tags")) > 0,
        F.concat(F.col("metric"), F.lit(" "), sorted_tag_line("tags")),
    ).otherwise(F.col("metric"))


def apply_exclusions(
    points: DataFrame,
    metric_blocklist: list[str] | None = None,
    tag_strips: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Drop blocklisted metrics; strip configured tag keys per metric.

    ``metric_blocklist``: regexes, reference-normalized (``.*``
    auto-appended, full-match against the metric line) — a point
    matching ANY is dropped.
    ``tag_strips``: metric-name -> tag keys to remove from that metric's
    points ('*' as the metric applies to every metric — an engine
    extension the reference's exact-lookup does not have).
    """
    df = points
    if metric_blocklist:
        # materialize the line ONCE (per-pattern filters would each
        # re-render the sorted tag map per point on the hot ingest path)
        # but keep one rlike PER pattern: the reference compiles each
        # regex independently, so OR-ing them into one alternation would
        # renumber groups and break patterns using backreferences. The
        # temp column name is collision-checked against the caller's.
        tmp = "__excl_line"
        while tmp in df.columns:
            tmp += "_"
        df = df.withColumn(tmp, _metric_line())
        for p in metric_blocklist:
            pat = p if p.endswith(".*") else p + ".*"
            df = df.filter(~F.col(tmp).rlike(f"^(?:{pat})$"))
        df = df.drop(tmp)
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
