"""BM25 scoring — the retrieval primitive for corpus curation.

Retrieval-based curation is a standing need at 100 TB: score every
document against a probe query (a benchmark prompt, a quality exemplar,
a takedown text) and act on the ranked result — the lexical sibling of
the embedding-space ANN stack in ``operators/similarity.py``. The
reference has no retrieval tier (its lookups are key-structured,
server/.../store/MetaQuery-style); this follows the Robertson/Zaragoza
BM25 formulation with the Lucene (+1) idf.

Spark-first scale shape: ONE corpus-linear token explode filtered to
the query's terms BEFORE the aggregation (a handful of terms — the
filter prunes the explode output to near-nothing map-side), a per-doc
tf aggregation over those terms only, a per-term df aggregation whose
output is at most |query| rows (broadcast back), and per-doc length
from the same pass. No shuffle carries text; the big shuffle keys are
(doc, term-hash) integers. Corpus statistics (N, avgdl) are two
scalars from one aggregate.

Floats: scores are rounded to 4 dp with the repo's +1e-9 half-boundary
nudge on BOTH engine sides (the classifier_score / fir protocol) —
idf's ln() is the one term whose last-ulp behavior differs between the
JVM and libm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

BM25_K1 = 1.2
BM25_B = 0.75


def _query_terms(query: str) -> list[str]:
    """The ONE tokenizer contract applied to the probe query,
    deduplicated, order-preserving (BM25 sums over distinct terms)."""
    import re

    out: list[str] = []
    for t in re.findall(r"[a-z0-9']+", query.lower()):
        if t not in out:
            out.append(t)
    return out


def bm25_scores(
    docs: DataFrame,
    query: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(id, n_terms_hit, score) for every document matching >= 1 query
    term: score = sum over query terms of

        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    with idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)) — Lucene's
    shifted idf (always positive). dl is the doc's FULL token count and
    avgdl the corpus mean over ALL docs (zero-token docs included),
    both from one corpus-linear aggregate. Non-matching docs emit no
    row (at 100 TB the result is query-selective, not corpus-sized).
    ``score`` is rounded to 4 dp (+1e-9 nudge); ties in downstream
    top-k consumption must re-break on the id."""
    terms = _query_terms(query)
    if not terms:
        raise ValueError("query tokenizes to no terms")
    ex = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__t")
    )
    # per-doc length (all tokens) — also the corpus N/avgdl source;
    # LEFT join from docs so zero-token docs count toward N and avgdl
    dl = (
        docs.select(id_col)
        .join(
            ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl")),
            id_col,
            "left",
        )
        .select(id_col, F.coalesce("dl", F.lit(0)).alias("dl"))
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total")
    ).collect()[0]
    n_docs, total = int(stats["n"]), int(stats["total"] or 0)
    if n_docs == 0:
        raise ValueError("empty corpus")
    avgdl = total / n_docs
    hits = ex.filter(F.col("__t").isin(terms))
    tf = hits.groupBy(id_col, "__t").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    term_score = (
        idf
        * F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
        )
    )
    scored = (
        tf.join(F.broadcast(df_), "__t")
        .join(dl, id_col)
        .select(F.col(id_col), F.col("__t"), term_score.alias("__s"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.round(F.sum("__s") + F.lit(1e-9), 4).alias("score"),
    )


def bm25_scores_sql(
    query: str,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """DuckDB twin of :func:`bm25_scores` — same tokenizer contract
    (TOKENS_SQL), same Lucene idf, same rounding nudge."""
    from .text import TOKENS_SQL

    terms = _query_terms(query)
    if not terms:
        raise ValueError("query tokenizes to no terms")
    toks = TOKENS_SQL.format(c=text_col)
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH ex AS (SELECT {id_col}, unnest({toks}) AS t FROM {table}),
dl AS (SELECT d.{id_col}, coalesce(l.dl, 0) AS dl
       FROM {table} d LEFT JOIN (SELECT {id_col}, count(*) AS dl
                                 FROM ex GROUP BY 1) l USING ({id_col})),
stats AS (SELECT count(*) AS n, coalesce(sum(dl), 0) AS total FROM dl),
tf AS (SELECT {id_col}, t, count(*) AS tf FROM ex
       WHERE t IN ({term_list}) GROUP BY 1, 2),
df AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
s AS (SELECT tf.{id_col},
             ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * {k1 + 1.0}
             / (tf.tf + {k1} * ({1.0 - b} + {b} * dl.dl
                                / (CAST(stats.total AS DOUBLE) / stats.n)))
               AS ts
      FROM tf JOIN df USING (t) JOIN dl USING ({id_col})
      CROSS JOIN stats)
SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_terms_hit,
       round(sum(ts) + 1e-9, 4) AS score
FROM s GROUP BY 1"""
