"""Temperature-based domain mixture resampling.

Pretraining corpora are rebalanced across domains (web / code / books /
...) by sampling domain ``d`` with probability proportional to
``p_d^(1/T)`` instead of its natural share ``p_d`` — T=1 keeps the
natural mixture, T→∞ approaches uniform. Downsampling-only rates (no
domain is upsampled) have the closed form::

    r_d = (n_min / n_d) ^ (1 - 1/T)

where ``n_min`` is the rarest domain's count: the rarest domain keeps
everything, over-represented domains shrink toward the tempered share.

At T=2 the exponent is 1/2 and the rate is ``sqrt(n_min/n_d)`` — IEEE
sqrt is correctly rounded in both Spark and DuckDB, so the default
temperature is engine-exact (general T goes through ``pow``, which may
differ by an ulp across libm implementations).

Scale shape: one tiny groupBy(domain) count (broadcast back), then a
pure-Column deterministic accept test — the corpus is scanned once, and
the md5-prefix accept keeps identical decisions across runs, engines,
and cluster sizes (same property as ``text.hash_sample``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HASH_SPAN = 4294967296.0  # 16^8: accept granularity of the 8-hex-char prefix


def mixture_rates(
    df: DataFrame, domain_col: str = "source", temperature: float = 2.0
) -> DataFrame:
    """The tiny per-domain rate table: (domain, __rate) with
    rate = (n_min/n_d)^(1-1/T). One row per domain — broadcastable."""
    if temperature <= 1.0:
        raise ValueError("temperature must be > 1 (T=1 is the natural mix)")
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n_d"))
    counts = counts.withColumn(
        "__n_min", F.min("__n_d").over(Window.partitionBy())
    )
    ratio = F.col("__n_min") / F.col("__n_d").cast("double")
    exponent = 1.0 - 1.0 / temperature
    rate = F.sqrt(ratio) if temperature == 2.0 else F.pow(ratio, F.lit(exponent))
    return counts.select(domain_col, rate.alias("__rate"))


def mixture_kept_col(
    domain_col: str = "source",
    id_col: str = "doc_id",
    rate_col: str = "__rate",
):
    """The deterministic keep decision as a Column, given the joined
    rate: md5-prefix test against the rate's fixed-width hex threshold.
    Shared by ``domain_mixture`` and the curation pipeline so their
    decisions agree doc-for-doc by construction."""
    key = F.concat(F.col(domain_col), F.lit(":"), F.col(id_col).cast("string"))
    # fixed-width lowercase hex compare == numeric compare; rate >= 1
    # short-circuits so the 9-hex-digit threshold case never arises
    threshold = F.lpad(
        F.lower(F.hex(F.floor(F.col(rate_col) * F.lit(_HASH_SPAN)).cast("long"))),
        8,
        "0",
    )
    return F.when(F.col(rate_col) >= 1.0, F.lit(True)).otherwise(
        F.substring(F.md5(key), 1, 8) < threshold
    )


def domain_mixture(
    df: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    temperature: float = 2.0,
) -> DataFrame:
    """Per-doc sampling rate + deterministic keep decision for a
    temperature-``T`` domain mixture. Output: (id, domain, rate, kept).
    """
    rates = mixture_rates(df, domain_col, temperature)
    return (
        df.join(F.broadcast(rates), domain_col)
        .select(
            F.col(id_col),
            F.col(domain_col),
            F.round("__rate", 9).alias("rate"),
            mixture_kept_col(domain_col, id_col).alias("kept"),
        )
    )


def domain_mixture_sql(
    domain_col: str = "source", id_col: str = "doc_id"
) -> str:
    """DuckDB equivalent of :func:`domain_mixture` at T=2 over ``documents``."""
    return f"""
WITH cnt AS (SELECT {domain_col}, count(*) AS n_d FROM documents GROUP BY 1),
rates AS (
  SELECT {domain_col},
    sqrt((SELECT min(n_d) FROM cnt) / CAST(n_d AS DOUBLE)) AS rate
  FROM cnt)
SELECT d.{id_col}, d.{domain_col}, round(r.rate, 9) AS rate,
  CASE WHEN r.rate >= 1.0 THEN TRUE
       ELSE substr(md5(d.{domain_col} || ':' || CAST(d.{id_col} AS VARCHAR)), 1, 8)
            < printf('%08x', CAST(floor(r.rate * 4294967296.0) AS BIGINT))
  END AS kept
FROM documents d JOIN rates r USING ({domain_col})"""


def token_budget_subset(
    df: DataFrame,
    budget: int,
    score_col: str = "p_keep",
    tokens_col: str = "n_tokens",
    domain_col: str = "source",
    id_col: str = "doc_id",
    bands: int = 100,
) -> DataFrame:
    """Quality-ranked token-budget subset: per domain, keep the
    highest-scoring documents until ``budget`` tokens are reached — the
    data-mixing step where each source contributes a fixed token budget
    and only its best documents make the cut. A doc is kept iff the
    total tokens of all strictly-better docs in its domain is still
    under budget (greedy prefix; the boundary doc may overshoot).

    Ordering is fully deterministic and engine-exact: (score DESC,
    md5(id), id) — score ties break by hash, never by layout.

    Scale shape: the per-domain running total is NOT one window over the
    whole domain (a giant domain would sort in one task). Scores band
    into ``bands`` coarse buckets (band = monotone function of score, so
    band-DESC-then-within-band order IS the global score order); the
    cumsum runs per (domain, band), and band totals — ``bands`` rows per
    domain — get their own tiny prefix sum, broadcast back: seq_pack's
    two-phase scan keyed by quality instead of id. If a domain's score
    distribution concentrates into few bands, raise ``bands`` (the
    banding dial); band width never changes the result, only the
    parallelism.

    Output: (id, domain, n_tokens, cum_tokens_before, kept).
    """
    sc = F.col(score_col)
    t = df.select(
        F.col(id_col),
        F.col(domain_col),
        sc.alias("__s"),
        F.col(tokens_col).cast("long").alias("__n"),
        F.least(F.floor(sc * bands), F.lit(bands - 1)).cast("long").alias("__band"),
        F.md5(F.col(id_col).cast("string")).alias("__tb"),
    )
    w = (
        Window.partitionBy(domain_col, "__band")
        .orderBy(F.col("__s").desc(), "__tb", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = t.withColumn("__local_end", F.sum("__n").over(w))
    # band totals from t, not the windowed frame: partial aggregation
    # shuffles one row per (domain, band); a local-sourced variant would
    # re-shuffle the corpus through the window (no exchange reuse —
    # column pruning diverges the subtrees; see seq_pack's note). This
    # branch does re-run the upstream scoring expressions on the second
    # scan — if the caller's score column is expensive, persist the
    # input frame before calling.
    totals = t.groupBy(domain_col, "__band").agg(F.sum("__n").alias("__tot"))
    wb = (
        Window.partitionBy(domain_col)
        .orderBy(F.col("__band").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = totals.withColumn(
        "__start", F.sum("__tot").over(wb) - F.col("__tot")
    ).select(domain_col, "__band", "__start")
    j = local.join(F.broadcast(offs), [domain_col, "__band"])
    before = F.col("__start") + F.col("__local_end") - F.col("__n")
    return j.select(
        F.col(id_col),
        F.col(domain_col),
        F.col("__n").alias(tokens_col),
        before.alias("cum_tokens_before"),
        (before < F.lit(int(budget))).alias("kept"),
    )
