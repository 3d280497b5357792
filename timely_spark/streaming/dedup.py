"""Streaming exact deduplication — the ingest-time "have I seen this
document before" pass of a training-data pipeline.

Structured Streaming's ``dropDuplicates`` keeps per-key state in the state
store, so duplicates are caught ACROSS micro-batches, not just within one.
The key is the md5 of the text (16 bytes of state per distinct doc), never
the text itself. ``dropDuplicatesWithinWatermark`` + an event-time
watermark bounds state for unbounded runs: two copies arriving within the
watermark window dedupe; state older than the watermark is evicted — the
standard correctness/state-size trade for infinite streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Drop exact-duplicate documents from a stream by content hash.

    ``watermark`` (e.g. ``"10 minutes"``) requires ``ts_col`` (epoch-ms
    long) and switches to bounded-state dedup via
    ``dropDuplicatesWithinWatermark``; without it, state grows with the
    number of distinct documents (fine for bounded backfills).
    """
    keyed = docs.withColumn("__content_hash", F.md5(F.col(text_col)))
    if watermark is not None:
        if ts_col is None:
            raise ValueError("watermark requires ts_col")
        keyed = keyed.withColumn(
            "__event_time", F.timestamp_millis(F.col(ts_col))
        ).withWatermark("__event_time", watermark)
        out = keyed.dropDuplicatesWithinWatermark(["__content_hash"])
        return out.drop("__event_time", "__content_hash")
    return keyed.dropDuplicates(["__content_hash"]).drop("__content_hash")
