"""OpenTSDB-style JSON response shaping.

Reference: server/.../api/response/timeseries/QueryResponse.java:8-60 —
one element per surviving series: ``{"metric", "tags", "aggregatedTags",
"dps": {ts: value}}``; dps keys are epoch seconds unless msResolution
(DataStore.java:774, QueryRequest.java:375).

This runs driver-side on the (small) aggregated result — the heavy
lifting stayed distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def to_query_response(result: DataFrame, ms_resolution: bool = False) -> list[dict]:
    rows = result.orderBy("metric", "bucket_ts").collect()
    series: dict[tuple, dict] = {}
    for r in rows:
        tags = dict(r["tags"] or {})
        key = (r["metric"], tuple(sorted(tags.items())))
        s = series.setdefault(
            key, {"metric": r["metric"], "tags": tags, "aggregatedTags": [], "dps": {}}
        )
        ts = r["bucket_ts"] if ms_resolution else r["bucket_ts"] // 1000
        s["dps"][str(ts)] = r["value"]
    return list(series.values())
