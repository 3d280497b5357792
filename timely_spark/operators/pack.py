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

    # totals from t, NOT from the windowed frame: groupBy partial-
    # aggregates map-side, so this branch shuffles one row per bucket.
    # Aggregating max(__local_end) off `local` looks like it would reuse
    # the window's exchange, but column pruning diverges the subtrees
    # (measured: no ReusedExchange) and the branch then re-shuffles the
    # FULL corpus through the window — the 2nd column-pruned scan here
    # is far cheaper than a 2nd corpus shuffle at 100 TB.
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


def global_shuffle(
    df: DataFrame,
    seed: str = "shuffle",
    docs_per_shard: int = 1024,
    id_col: str = "doc_id",
    bucket_hex: int = 2,
) -> DataFrame:
    """Deterministic global training shuffle: every doc gets a
    pseudo-random global position, shard id and in-shard position —
    the "shuffle the corpus once before training" step, reproducible
    across runs, engines and cluster layouts (no RNG: the order key is
    ``md5(seed:id)``, engine-exact in Spark and DuckDB).

    Scale shape: the global rank is NEVER a single global sort. The md5
    key's leading ``bucket_hex`` hex chars form ``16^bucket_hex``
    ORDER-ALIGNED buckets (a hash prefix is uniform, so buckets balance
    by construction — no skew mitigation needed); rank within bucket via
    a per-bucket window, bucket offsets via a prefix sum over the tiny
    bucket-count table (one row per bucket), broadcast back. Same
    two-phase scan as :func:`seq_pack`; raise ``bucket_hex`` to 3-4 at
    100 TB (4096-65536 buckets).

    Output: (id, pos, shard, pos_in_shard), pos dense in [0, n).
    """
    key = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    t = df.select(F.col(id_col), key.alias("__k")).withColumn(
        "__b", F.conv(F.substring("__k", 1, bucket_hex), 16, 10).cast("long")
    )
    w = Window.partitionBy("__b").orderBy("__k", id_col)
    local = t.withColumn("__r", F.row_number().over(w).cast("long"))
    # counts from t, not the windowed frame: the partial-agg branch
    # shuffles one row per bucket; a local-sourced max(__r) would
    # re-shuffle the corpus through the window (no exchange reuse —
    # column pruning diverges the subtrees; see seq_pack's note)
    counts = t.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    wb = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offs = counts.withColumn(
        "__start", F.sum("__n").over(wb) - F.col("__n")
    ).select("__b", "__start")
    pos = local.join(F.broadcast(offs), "__b").select(
        id_col, (F.col("__start") + F.col("__r") - 1).alias("pos")
    )
    # integer DIV/% — positions exceed 2^53 long before 100 TB
    return pos.select(
        id_col,
        "pos",
        F.expr(f"pos DIV {int(docs_per_shard)}").alias("shard"),
        F.expr(f"pos % {int(docs_per_shard)}").alias("pos_in_shard"),
    )


def global_shuffle_sql(
    seed: str = "shuffle",
    docs_per_shard: int = 1024,
    id_col: str = "doc_id",
) -> str:
    """DuckDB equivalent of :func:`global_shuffle` over ``documents``
    (plain single-window form — the semantics, not the scale shape)."""
    return f"""
WITH t AS (
  SELECT {id_col}, md5('{seed}:' || CAST({id_col} AS VARCHAR)) AS k
  FROM documents),
r AS (
  SELECT {id_col},
         row_number() OVER (ORDER BY k, {id_col}) - 1 AS pos
  FROM t)
SELECT {id_col}, pos, pos // {int(docs_per_shard)} AS shard,
       pos % {int(docs_per_shard)} AS pos_in_shard
FROM r"""
