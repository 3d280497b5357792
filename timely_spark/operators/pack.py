"""Sequence packing — concat-and-chop training-batch assignment.

GPT-style pretraining concatenates the token streams of consecutive
documents (one EOS unit between docs) and chops the stream into
fixed-length sequences. Given a deterministic document order, each doc's
placement is a pure function of the prefix sum of token counts — so the
operator is a distributed prefix sum, not a packing heuristic.

Scale shape: a naive ``Window.orderBy(doc_id)`` with no partition key
collapses to ONE partition — a scale-killer. Instead the prefix sum is
two-phase, the textbook distributed scan:

1. order-aligned buckets (``doc_id // bucket_docs``) — a per-bucket
   window cumsum (one hash-partitioned shuffle, parallel across buckets);
2. bucket totals (tiny: one row per bucket) get their own prefix via a
   single-partition window THAT IS SIZED IN BUCKETS, then broadcast-join
   back as each bucket's starting offset.

At 100 TB with 4096-doc buckets the single-partition step sees ~25k rows
per 100M docs — driver-trivial, corpus never re-sorts globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def seq_pack(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 512,
    bucket_docs: int = 4096,
) -> DataFrame:
    """Assign each document its span in the packed training stream.

    Documents are laid out in ``id_col`` order; each contributes
    ``token_count + 1`` units (the +1 is the EOS separator). Output per
    doc: ``n_units``, ``pack_first``/``pack_last`` (sequence indices the
    doc lands in), ``pack_offset`` (position within its first sequence).
    ``pack_last > pack_first`` marks a doc split across sequences.
    """
    from .text import token_count

    ids = F.col(id_col)
    n = (token_count(text_col) + F.lit(1)).alias("n_units")
    # integer DIV for the bucket key too: full-range 64-bit ids (xxhash64
    # doc ids from curate.py) lose precision through a double division;
    # ordering survives but boundaries drift vs any integer-math layout
    t = df.select(
        ids, n, F.expr(f"{id_col} DIV {int(bucket_docs)}").alias("__b")
    )

    w = (
        Window.partitionBy("__b")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = t.withColumn("__local_end", F.sum("n_units").over(w))

    totals = t.groupBy("__b").agg(F.sum("n_units").alias("__tot"))
    wb = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.withColumn(
        "__start", F.sum("__tot").over(wb) - F.col("__tot")
    ).select("__b", "__start")

    out = local.join(F.broadcast(offsets), "__b").select(
        id_col,
        "n_units",
        (F.col("__start") + F.col("__local_end")).alias("__cum_end"),
    )
    # integer DIV, not floor(float division): cumulative ends exceed 2^53
    # long before 100 TB and float rounding would misplace documents
    return out.select(
        id_col,
        "n_units",
        F.expr(f"(__cum_end - n_units) DIV {seq_len}").alias("pack_first"),
        F.expr(f"(__cum_end - 1) DIV {seq_len}").alias("pack_last"),
        F.expr(f"(__cum_end - n_units) % {seq_len}").alias("pack_offset"),
    )


def seq_pack_sql(
    c: str = "text", id_col: str = "doc_id", seq_len: int = 512
) -> str:
    """DuckDB equivalent of :func:`seq_pack` over ``documents``."""
    from .text import TOKEN_COUNT_SQL

    tc = TOKEN_COUNT_SQL.format(c=c)
    return f"""
WITH t AS (SELECT {id_col}, {tc} + 1 AS n_units FROM documents),
cum AS (
  SELECT {id_col}, n_units,
    sum(n_units) OVER (ORDER BY {id_col}
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
  FROM t)
SELECT {id_col}, CAST(n_units AS BIGINT) AS n_units,
  CAST((cum_end - n_units) // {seq_len} AS BIGINT) AS pack_first,
  CAST((cum_end - 1) // {seq_len} AS BIGINT) AS pack_last,
  CAST((cum_end - n_units) % {seq_len} AS BIGINT) AS pack_offset
FROM cum"""


def write_packed_corpus(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 512,
    packs_per_shard: int = 64,
    bucket_docs: int = 4096,
) -> int:
    """Materialize the packed corpus as shard-partitioned Parquet — the
    sink half of :func:`seq_pack`.

    Each doc lands in ``shard = pack_first // packs_per_shard``; a
    training loader then reads one shard directory per worker and
    reconstructs sequences locally (docs are sorted by id within a
    shard, and the pack/offset columns say exactly where each doc's
    tokens sit). Writing is ``partitionBy(shard)`` — Spark's writer
    creates one directory per shard, and because shard ids are
    monotone in doc id, each input partition feeds few shards (no
    write-side shuffle storm).

    Returns the shard count.
    """
    spans = seq_pack(
        df, text_col=text_col, id_col=id_col, seq_len=seq_len, bucket_docs=bucket_docs
    )
    packed = (
        df.select(id_col, text_col)
        .join(spans, id_col)
        .withColumn(
            "shard", F.expr(f"pack_first DIV {packs_per_shard}").cast("int")
        )
    )
    packed = packed.persist()  # shard count + write share one compute
    try:
        n_shards = packed.agg(
            F.countDistinct("shard").alias("n")
        ).collect()[0]["n"]
        packed.write.mode("overwrite").partitionBy("shard").parquet(path)
    finally:
        packed.unpersist()
    return int(n_shards)
