"""CCNet-style n-gram language-model perplexity filter (Wenzek et al.,
2020). The canonical web-corpus quality signal: fit a bigram LM on an
in-domain reference sample (CCNet uses a Wikipedia KenLM; here a
Lidstone-smoothed conditional bigram model, which keeps the whole
pipeline SQL-expressible for the cross-engine oracle), score every
document by its per-token cross-entropy

    log_ppl(doc) = -(1/N) * sum over positions i of ln p(w_i | w_{i-1})
    p(w | v)     = (c2(v,w) + alpha) / (c1(v) + alpha * V)

and bucket the corpus into head / middle / tail quality tiers by fixed
log-perplexity cutoffs (CCNet publishes per-language constants; the
tiers drive downstream sampling rates).

Reference analogue: none (the reference is a time-series store); this is
part of the training-data curation layer the brief asks for beyond the
reference surface. Sibling operator to DSIR (`operators/dsir.py`) —
same dual feature mode, same determinism contract — but scoring a
CONDITIONAL model normalized per token, which is what makes it a
quality signal rather than a domain-match weight.

Two feature modes, one plan shape (the DSIR contract):

- ``hash_buckets=B`` (production): bigram and context keys are
  ``xxhash64 % B`` buckets, so BOTH model tables have at most B rows
  regardless of reference size and always broadcast — the corpus probe
  side never shuffles. The 100 TB path.
- ``hash_buckets=None`` (oracle seam): raw token strings, mirrored
  verbatim by the DuckDB oracle. Model tables are reference-vocab-sized
  (still a bounded SAMPLE, so they broadcast in practice too).

Determinism: each position's ln(...) is cast to DECIMAL(38,12) BEFORE
the per-doc sum so accumulation order cannot move the output; the
final per-token division happens in IEEE double on the decimal-exact
sum, identical across engines.

Scale notes (100 TB): the reference sample is bounded by construction
(hash_sample or a source filter), so both count aggregations are
sample-sized; scoring is one explode over the corpus + two broadcast
joins + one map-side-combinable groupBy(doc) — corpus-linear, no
corpus-keyed shuffle beyond the final per-doc aggregation, and the
bucket assignment is a pure column expression against literal cutoffs
(no global sort, no percentile pass over 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

# Fixed log-perplexity (nats/token) tier cutoffs. CCNet derives these
# per language from the scored distribution's terciles ONCE and then
# ships them as constants; deriving them in-query would put a global
# percentile pass (and a cross-engine interpolation hazard) on the 100
# TB path for no benefit. Tuned the same way: terciles of the synthetic
# documents corpus scored against the src0/src1 reference LM.
HEAD_MAX_LOG_PPL = 3.46
MIDDLE_MAX_LOG_PPL = 3.53


def _positions(text_col: str, hash_buckets: int | None):
    """Array of (context-key, bigram-key) scoring positions for one doc.

    The bigram key is a SINGLE value (the space-joined pair in string
    mode, its ``xxhash64 % B`` bucket in hashed mode) so the bigram
    count table is keyed one-dimensionally — in hashed mode that is
    what bounds it to B rows instead of B x B. Tokenization is
    ``text.tokens``, the one Spark-side contract the DuckDB oracles
    mirror via ``TOKENS_SQL``.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    if hash_buckets is None:
        key = lambda v, w: F.concat_ws(" ", v, w)  # noqa: E731
        ckey = lambda v: v  # noqa: E731
    else:
        b = F.lit(hash_buckets)
        key = lambda v, w: (  # noqa: E731
            F.pmod(F.xxhash64(F.concat_ws(" ", v, w)), b).cast("string")
        )
        ckey = lambda v: F.pmod(F.xxhash64(v), b).cast("string")  # noqa: E731
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda v, w: F.struct(ckey(v).alias("v"), key(v, w).alias("w")),
        ),
    ).otherwise(F.array().cast("array<struct<v:string,w:string>>"))


def bigram_lm_counts(
    reference: DataFrame,
    text_col: str = "text",
    hash_buckets: int | None = None,
) -> tuple[DataFrame, DataFrame, int]:
    """Fit the reference LM: (bigram counts, context counts, vocab size).

    Both tables are keyed by ONE column (bigram key / context key), so
    in hashed mode each is bounded by B rows — the broadcastability
    contract. ``V`` is the OBSERVED distinct unigram count of the
    reference's scoring positions in both modes (distinct token buckets
    in hashed mode, <= B): smoothing with the bucket-space size B
    instead would inflate every score by ~ln(B/vocab) and make the
    published-constant tier cutoffs mode-dependent. With B well above
    the true vocabulary the two modes score identically.
    """
    pos = reference.select(
        F.explode(_positions(text_col, hash_buckets)).alias("p")
    ).select(F.col("p.v").alias("v"), F.col("p.w").alias("w"))
    big = pos.groupBy("w").agg(F.count(F.lit(1)).alias("c2"))
    ctx = pos.groupBy("v").agg(F.count(F.lit(1)).alias("c1"))
    # vocab = distinct tokens across the reference's scoring positions:
    # every token of a >=2-token doc appears in one (1-token docs have
    # no positions, hence no vocabulary mass — mirrors the oracle's
    # union over refpos)
    toks = tokens(text_col)
    ref_toks = reference.filter(F.size(toks) >= 2).select(
        F.explode(toks).alias("t")
    )
    if hash_buckets is not None:
        ref_toks = ref_toks.select(
            F.pmod(F.xxhash64("t"), F.lit(hash_buckets)).alias("t")
        )
    vocab = ref_toks.agg(F.countDistinct("t").alias("n")).collect()[0]["n"]
    if not vocab:
        # no >=2-token reference doc: the smoothing denominator would be
        # zero and every score degenerates to ln(alpha/0) — fail loudly
        # instead of emitting infinities
        raise ValueError(
            "perplexity reference has no scoring positions "
            "(every reference doc has fewer than 2 tokens)"
        )
    return big, ctx, int(vocab)


def lm_log_ppl(
    docs: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    hash_buckets: int | None = None,
) -> DataFrame:
    """(id, n_pos, log_ppl, ppl_bucket) for every doc in ``docs``.

    ``log_ppl`` is the per-token cross-entropy in nats under the
    reference bigram LM (lower = more reference-like); docs with fewer
    than two tokens have no scoring positions and sit at 0.0 in the
    'head' tier (nothing to judge them on — CCNet likewise scores empty
    lines at 0).
    """
    big, ctx, vocab = bigram_lm_counts(reference, text_col, hash_buckets)
    # model tables are reference-/bucket-bounded: broadcast both so the
    # corpus probe side never shuffles on feature keys
    big = F.broadcast(big)
    ctx = F.broadcast(ctx)

    pos = docs.select(
        F.col(id_col), F.explode(_positions(text_col, hash_buckets)).alias("p")
    ).select(id_col, F.col("p.v").alias("v"), F.col("p.w").alias("w"))

    lp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(alpha))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha) * F.lit(vocab))
    )
    scored = (
        pos.join(big, "w", "left")
        .join(ctx, "v", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_pos"),
            # decimal cast BEFORE the sum: order-independent accumulation;
            # the per-token division is double-on-exact-sum, engine-stable
            F.round(
                -(F.sum(lp.cast("decimal(38,12)")).cast("double"))
                / F.count(F.lit(1)),
                4,
            ).alias("log_ppl"),
        )
    )
    out = (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_pos"), F.lit(0)).alias("n_pos"),
            F.coalesce(F.col("log_ppl"), F.lit(0.0)).alias("log_ppl"),
        )
    )
    return out.withColumn(
        "ppl_bucket",
        F.when(F.col("log_ppl") < HEAD_MAX_LOG_PPL, F.lit("head"))
        .when(F.col("log_ppl") < MIDDLE_MAX_LOG_PPL, F.lit("middle"))
        .otherwise(F.lit("tail")),
    )


def perplexity_filter(
    docs: DataFrame,
    reference: DataFrame,
    max_log_ppl: float = MIDDLE_MAX_LOG_PPL,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    hash_buckets: int | None = 10_000,
) -> DataFrame:
    """Keep docs at or below the log-perplexity cutoff (head+middle
    tiers by default) — the CCNet screening step, production hashed
    mode by default."""
    w = lm_log_ppl(docs, reference, text_col, id_col, alpha, hash_buckets)
    return docs.join(
        w.filter(F.col("log_ppl") <= max_log_ppl).select(id_col), id_col
    )
