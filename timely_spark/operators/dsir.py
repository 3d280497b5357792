"""DSIR — Data Selection via Importance Resampling (Xie et al., 2023).

Scores every raw-corpus document by how target-domain-like it is: fit
two bag-of-n-gram unigram models — ``p`` over an in-domain target
sample, ``q`` over the raw corpus — and weight each document by its
log importance ratio

    log w(doc) = sum over feature occurrences f of  log p_f - log q_f

with add-alpha smoothing over the shared feature space. High-weight
documents are the ones importance resampling keeps when curating raw
web data toward a target distribution (the published pipeline hashes
features into ~10^4 buckets so the feature table stays broadcastable
at any corpus size).

Reference analogue: none (the reference is a time-series store); this
is part of the training-data curation layer the brief asks for beyond
the reference surface.

Two feature modes, one plan shape:

- ``hash_buckets=B`` (production): features are ``xxhash64 % B``
  buckets. The feature-weight table has AT MOST B rows regardless of
  corpus size, so it always broadcasts and the per-doc scoring join is
  corpus-linear with no shuffle on the probe side — the 100 TB path.
- ``hash_buckets=None`` (oracle seam): features are the raw n-gram
  strings, SQL-expressible so a DuckDB oracle can verify the whole
  pipeline value-exactly; the feature table is corpus-vocab-sized and
  the scoring join shuffles. Both modes share every other operator.

Determinism: per-feature log ratios are doubles (ln is the one libm
call), but each is cast to DECIMAL(38,12) BEFORE the per-doc sum, so
accumulation order cannot move the rounded output; cross-engine libm
drift is bounded by ~1 ulp per feature, orders of magnitude below the
4-dp output rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _features(text_col: str, hash_buckets: int | None):
    """Unigram + bigram features (with multiplicity) as one array column.

    Tokenization is ``dedup._tokens``, which delegates to ``text.tokens``
    — the ONE Spark-side token contract (the DuckDB oracles mirror it via
    ``text.TOKENS_SQL``, apostrophes kept / underscores split); a private
    copy here would be a third dialect to keep in sync."""
    from .dedup import _tokens

    toks = _tokens(text_col)
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(toks, bigrams)
    if hash_buckets is not None:
        return F.transform(feats, lambda s: F.pmod(F.xxhash64(s), F.lit(hash_buckets)))
    return feats


def _feature_counts(df: DataFrame, text_col: str, hash_buckets: int | None) -> DataFrame:
    return (
        df.select(F.explode(_features(text_col, hash_buckets)).alias("f"))
        .groupBy("f")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_log_weights(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_buckets: int | None = 10_000,
    alpha: float = 1.0,
) -> DataFrame:
    """(id, n_feats, log_weight) for every doc in ``docs``.

    ``target`` is the in-domain sample defining ``p``; ``q`` comes from
    ``docs`` itself. The smoothed vocabulary is the raw corpus's
    feature space (every doc feature appears in ``q`` by construction;
    target-only features influence totals only through smoothing mass,
    matching hashed-bucket behavior where the space is fixed at B).

    Plan: two corpus-linear count aggregations build the feature table;
    three scalar driver seams (target total, raw total, vocab size)
    close the smoothing constants; then one explode + feature-table
    join + per-doc sum scores every document. In hashed mode the
    feature table is <= B rows and broadcasts explicitly.
    """
    # Pin both count aggregates (eager localCheckpoint) before the scalar
    # collects: each frame is consumed TWICE — once by the driver-seam
    # aggregate below and once by the feature-weight join — and without
    # the pin the corpus/target tokenize + bigram + explode pass re-ran
    # per consumer (r12; the same double-evaluation shape as the dedup
    # self-joins). The pinned relations are feature-table-sized: <= B
    # rows in hashed mode, vocab-sized in oracle mode — never corpus-
    # sized.
    q_counts = _feature_counts(docs, text_col, hash_buckets).localCheckpoint(
        eager=True
    )
    p_counts = _feature_counts(
        target, text_col, hash_buckets
    ).localCheckpoint(eager=True)

    # 3-scalar driver seam: smoothing denominators
    tot_q, vocab = q_counts.agg(
        F.sum("c").alias("t"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    tot_p = p_counts.agg(F.sum("c").alias("t")).collect()[0]["t"] or 0
    denom_p = float(tot_p) + alpha * float(vocab)
    denom_q = float(tot_q) + alpha * float(vocab)

    fw = (
        q_counts.join(p_counts.withColumnRenamed("c", "cp"), "f", "left")
        .select(
            "f",
            (
                F.log((F.coalesce(F.col("cp"), F.lit(0)) + alpha) / denom_p)
                - F.log((F.col("c") + alpha) / denom_q)
            ).alias("lw"),
        )
    )
    if hash_buckets is not None:
        fw = F.broadcast(fw)

    d = docs.select(
        F.col(id_col), F.explode(_features(text_col, hash_buckets)).alias("f")
    )
    scored = (
        d.join(fw, "f")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            # decimal cast BEFORE the sum: order-independent accumulation
            F.round(F.sum(F.col("lw").cast("decimal(38,12)")), 4)
            .cast("double")
            .alias("log_weight"),
        )
    )
    # empty docs (zero features) score 0 with n_feats 0
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_feats"), F.lit(0)).alias("n_feats"),
            F.coalesce(F.col("log_weight"), F.lit(0.0)).alias("log_weight"),
        )
    )


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    keep_n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_buckets: int | None = 10_000,
    alpha: float = 1.0,
) -> DataFrame:
    """Top-``keep_n`` docs by DSIR log weight (deterministic id
    tiebreak) — the resampling step as a plain global top-k, which AQE
    executes as per-partition local top-k + single small merge."""
    w = dsir_log_weights(docs, target, text_col, id_col, hash_buckets, alpha)
    return w.orderBy(F.desc("log_weight"), F.col(id_col)).limit(keep_n)
