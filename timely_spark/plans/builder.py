"""Compile a QueryRequest into a DataFrame plan.

Pipeline per SubQuery, mirroring the reference's iterator stack order
(DataStore.java:711-745: TagFilter(100) -> Rate(499) -> Downsample(500)
-> Aggregation(501), then the coordinator merge at :748-779):

    scan -> time-range + metric + tag + visibility filters
         -> [rate]
         -> downsample (per-series buckets)
         -> cross-series combine on the projected tag keys
         -> orderBy(bucket_ts)

All filters are plain Column predicates so Catalyst pushes them into the
Parquet scan (the analogue of the reference's hour-range planning
DataStore.getQueryRanges:997-1039 + column-family fetch :936-947 — with a
time/metric-partitioned store these become partition pruning for free).

Semantics notes:
- Tag values that are not ``^\\w+$`` are regexes (DataStore.java:860-862),
  compiled to ``rlike`` anchored on both ends, matching Java
  ``Matcher.matches()``.
- When the cross-series aggregator equals the downsample aggregator (or
  there is no downsample), the two groupBys collapse into ONE aggregation
  over the projected tags — this reproduces the reference's partial-merge
  semantics exactly (Aggregation.java:85-96 re-accumulates raw
  sums/counts, so e.g. avg is the weighted average over all points, and
  count counts points, not series) while saving a shuffle.
- ``start`` is floored to the downsample period before bucketing
  (DataStore.java:693-695).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.viz import viz_filter
from ..model import projected_tags, series_id
from ..operators.aggregators import agg_expr
from ..operators.downsample import combine_series, downsample
from ..operators.rate import rate
from ..parse import is_tag_regex
from .request import QueryRequest, SubQuery


def _decode_tsuid(t: str) -> str:
    """Wire tsuid -> series_id string. Hex-encoded UTF-8 (the comma-free GET
    form, encode_tsuid's output) decodes; anything non-hex is already a raw
    series_id string and passes through."""
    try:
        return bytes.fromhex(t).decode("utf-8")
    except ValueError:
        return t


def encode_tsuid(series: str) -> str:
    """series_id string -> wire tsuid (hex UTF-8), safe inside the GET
    ``?tsuid=agg:id,id`` comma list."""
    return series.encode("utf-8").hex()


def _tag_predicates(df: DataFrame, tags: dict[str, str]) -> DataFrame:
    for k, v in tags.items():
        # prefer a promoted tag_<k> column (sources/store.with_promoted_tags):
        # a plain string column's predicate reaches PushedFilters + row-group
        # stats, which a tags-map access never can
        pc = f"tag_{k}"
        col = F.col(pc) if pc in df.columns else F.col("tags").getItem(k)
        if v == "*" or v == ".*":
            df = df.filter(col.isNotNull())
        elif is_tag_regex(v):
            df = df.filter(col.rlike(f"^(?:{v})$"))  # Matcher.matches() semantics
        else:
            df = df.filter(col == v)
    return df


def build_subquery(
    points: DataFrame,
    q: SubQuery,
    start_ms: int,
    end_ms: int,
    auths: set[str] | None = None,
    viz_exprs: list[str] | None = None,
    bucket_metrics: int | None = None,
) -> DataFrame:
    """Returns (metric, tags, bucket_ts, value) for one SubQuery.

    ``bucket_metrics``: the store's metric-bucket modulus (layout
    sidecar, sources/store.read_layout) — lets the metric predicate
    reconstruct its directory bucket so partition pruning survives the
    bucketed layout a >100k-metric deployment needs."""
    spec = q.downsample_spec()
    period = spec.period_ms if spec else 1
    # floor the query start to the bucket period (DataStore.java:693-695)
    start_ms = start_ms - (start_ms % period) if period > 1 else start_ms

    if q.tsuids:
        # tsuid SubQuery (GET ?tsuid=agg:id,.. — QueryRequest.java:615-627):
        # a tsuid here IS the canonical series_id (metric + sorted k=v tag
        # pairs, model.series_id), hex-encoded on the wire so the GET
        # comma-separated list stays unambiguous (the reference's tsuids are
        # likewise hex UID strings). Raw series-id strings are accepted too
        # (JSON path). Selects the listed series directly; the metric
        # predicate is skipped (metric is "" on these SubQueries).
        ids = [_decode_tsuid(t) for t in q.tsuids]
        if "series_key" in points.columns:
            # series-bucketed store: the materialized key is a plain string
            # column, so the IN-list reaches PushedFilters and the
            # (series_key, ts)-sorted row groups prune
            df = points.filter(F.col("series_key").isin(ids))
        else:
            df = points.filter(series_id().isin(ids))
    else:
        df = points.filter(F.col("metric") == q.metric)
        if bucket_metrics and "metric_bucket" in df.columns:
            # directory pruning under the bucketed layout: the bucket id
            # is a pure function of the metric literal, so this predicate
            # folds to a constant and lands in PartitionFilters
            df = df.filter(
                F.col("metric_bucket")
                == F.pmod(F.xxhash64(F.lit(q.metric)), F.lit(bucket_metrics))
            )
    if "metric_bucket" in df.columns:
        df = df.drop("metric_bucket")
    df = df.filter((F.col("ts") >= start_ms) & (F.col("ts") <= end_ms))
    if "dt" in df.columns:
        # partition pruning: dt = ts div 1d is a store partition column
        # (sources/store.py), so this predicate prunes whole directories —
        # the F1 hour-range-scan analogue (DataStore.java:997-1039)
        day_ms = 86_400_000
        df = df.filter(
            (F.col("dt") >= start_ms // day_ms) & (F.col("dt") <= end_ms // day_ms)
        ).drop("dt")
    df = _tag_predicates(df, q.tags)
    # non-grouping filters (Filter.groupBy=false): predicate only — the
    # tag key does NOT enter the projected tag set / series identity
    df = _tag_predicates(df, q.filters)
    promoted = [c for c in df.columns if c.startswith("tag_")]
    if promoted:  # layout columns: filtered on above, never projected
        df = df.drop(*promoted)
    if auths is not None:
        # ALWAYS before any aggregation; viz_exprs (from the meta catalog)
        # saves the per-query distinct-viz scan
        df = viz_filter(df, auths, known_exprs=viz_exprs)

    if q.rate:
        opts = q.rate_options
        if spec and opts.interval_ms is None:
            # DataStore.java:713-721: rate interval defaults to the
            # downsample period when one is set
            from dataclasses import replace

            opts = replace(opts, interval_ms=spec.period_ms)
        # series-bucketed store: window on the materialized series_key —
        # the bucketed scan's HashPartitioning already satisfies the
        # window distribution, so the rate stage adds NO Exchange
        df = rate(
            df,
            opts,
            series_col="series_key" if "series_key" in df.columns else None,
        )

    group_keys = sorted(q.tags.keys())

    if q.aggregator == "none":
        # 'none' disables downsampling AND cross-series combine
        # (Aggregator.java:40-59): raw points, tags projected
        return df.select(
            "metric",
            projected_tags(group_keys).alias("tags"),
            F.col("ts").alias("bucket_ts"),
            "value",
        )

    if spec is None or spec.aggregator == "none" or spec.aggregator == q.aggregator:
        # single-shuffle path: one aggregation over (projected tags, bucket)
        agg_name = q.aggregator
        projected = projected_tags(group_keys)
        if spec is None or spec.aggregator == "none":
            bucket = F.col("ts")
        else:
            off = F.col("ts") - F.lit(start_ms)
            bucket = F.lit(start_ms) + (off - (off % F.lit(spec.period_ms)))
        pre = df.withColumn("tags", projected).withColumn("bucket_ts", bucket)
        pre = pre.withColumn("__gkey", series_id())
        return (
            pre.groupBy("__gkey", "bucket_ts")
            .agg(
                F.first("metric").alias("metric"),
                F.first("tags").alias("tags"),
                agg_expr(agg_name).alias("value"),
            )
            .select("metric", "tags", "bucket_ts", "value")
        )

    # two-stage path: downsample agg differs from the cross-series agg.
    # Over a series-bucketed store the per-series stage groups on the
    # materialized series_key — HashPartitioning(series_key) satisfies the
    # grouping distribution, so only the cross-series combine shuffles.
    ds = downsample(
        df,
        spec,
        start_ms=start_ms,
        series_col="series_key" if "series_key" in df.columns else None,
    )
    return combine_series(ds, group_keys, q.aggregator)


def run_query(
    points: DataFrame,
    request: QueryRequest,
    auths: set[str] | None = None,
    viz_exprs: list[str] | None = None,
    bucket_metrics: int | None = None,
) -> list[DataFrame]:
    """One result DataFrame per SubQuery (concatenated by the API layer,
    QueryRequest.java:370-372 / DataStore.java:645)."""
    return [
        build_subquery(
            points,
            q,
            request.start,
            request.end,
            auths=auths,
            viz_exprs=viz_exprs,
            bucket_metrics=bucket_metrics,
        )
        for q in request.queries
    ]
