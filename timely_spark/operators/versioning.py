"""Corpus snapshot diff — data versioning for incremental pipelines.

A 100 TB training corpus is not built once: crawls re-land, upstream
sources fix encodings, takedown requests remove documents. The diff
between two snapshot versions (added / removed / changed / unchanged
per document) is the primitive every incremental run needs before it
decides what to re-tokenize, re-deduplicate, or re-embed — the
corpus-level analogue of the reference's metric age-off bookkeeping
(server/.../store/MetricAgeOffIterator tracks what LEFT the store;
a training pipeline must also track what arrived or mutated).

Spark-first scale shape: both snapshots reduce to (id, md5(content))
BEFORE the full-outer join, so the shuffle carries ~48 bytes per
document and the text columns never leave their scan (column pruning
keeps them out of the exchange entirely). The join key is the
document id — unskewed by construction — and at cluster scale both
sides can be bucketed on id to make the diff exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """(id, status) for every id in either snapshot: ``added`` (new
    only), ``removed`` (old only), ``changed`` (both, content hash
    differs), ``unchanged``. Content equality is md5-based — byte
    equality up to hash collision, the same contract as exact_dedup.
    NULL content hashes to NULL; two NULLs compare as unchanged via
    the null-safe equality, matching a bytewise reading of 'content
    did not change'."""
    # presence is a flag, NOT hash-nullness: a row whose content is NULL
    # hashes to NULL but is still PRESENT in its snapshot
    o = old.select(
        F.col(id_col),
        F.md5(content_col).alias("__oh"),
        F.lit(True).alias("__op"),
    )
    n = new.select(
        F.col(id_col),
        F.md5(content_col).alias("__nh"),
        F.lit(True).alias("__np"),
    )
    # distinct-id contract: a snapshot holds one version per id
    j = o.join(n, [id_col], "full_outer")
    status = (
        F.when(F.col("__op").isNull(), F.lit("added"))
        .when(F.col("__np").isNull(), F.lit("removed"))
        .when(F.col("__oh").eqNullSafe(F.col("__nh")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col(id_col), status.alias("status"))


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Per-status (status, n_docs, min_id, max_id) rollup of
    :func:`snapshot_diff` — the one-line answer 'how much of the
    corpus moved between versions' that gates an incremental rebuild
    (n changed+added docs == the re-processing bill)."""
    d = snapshot_diff(old, new, id_col, content_col)
    return d.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(id_col).alias("min_id"),
        F.max(id_col).alias("max_id"),
    )
