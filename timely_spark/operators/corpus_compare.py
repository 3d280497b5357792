"""Corpus comparison & selection-integrity operators.

Three diagnostics every large-scale training-data pipeline runs between
corpus versions and before a training job, complementing the per-corpus
screens in ``operators/text.py`` and the dedup family in
``operators/dedup.py``:

- :func:`source_overlap_matrix` — which SOURCES share content (distinct
  word-8-gram overlap per source pair): the cross-feed diagnostic that
  decides whether two crawls/feeds are really independent before mixture
  weights are chosen.
- :func:`source_drift` — per-source unigram Jensen-Shannon divergence
  between two snapshot versions: the distribution-shift monitor an
  incremental pipeline checks before deciding to re-train on a refreshed
  corpus (the content-level companion of
  ``operators/versioning.snapshot_diff``'s membership-level view).
- :func:`split_leakage_guard` — deterministic hash train/val/test split
  with a duplicate-leakage repair: no two byte-identical documents may
  land in different splits (the classic eval-contamination bug), so
  every exact-duplicate group is reassigned to its keeper's split.

Reference analogue: none (the reference is a metrics engine; its
closest shape is the meta-table bookkeeping in
server/.../store/MetaAgeOffIterator.java). These are extension
operators for the 100 TB curation story.

Scale shapes (all three): text never shuffles — every exchange carries
integer hashes, source names (low-cardinality, dictionary-encoded), or
per-source scalar partials. Outputs are bounded by |sources|^2,
|sources|, and |docs| respectively; the gram/token aggregates partial
map-side.

Float contract: divergences/jaccards are rounded to 4 dp with the
repo's +1e-9 half-boundary nudge on BOTH engine sides (the
classifier_score / bm25 protocol).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import TOKENS_SQL, tokens


# odd prime => the per-position multiply-add fold is injective on 64-bit
# longs for fixed gram width (the dedup._shingle_hashes constant family)
_GRAM_P = 0x100000001B3


def _gram_pairs(text_col: str, n: int):
    """Distinct word-n-gram identities as (h1, h2) struct pairs — two
    multiply-add folds over INDEPENDENT per-token xxhash64 streams
    (xxhash64(tok) and xxhash64(tok, 1)), 128 bits of gram identity:
    the 64-bit-alone birthday bound of ~2^32 distinct grams sits inside
    a 100 TB corpus (the corpus_line_dedup lesson). Hash arithmetic
    instead of string materialization — concat_ws of a slice per
    position inside an interpreted lambda allocates an n-token string
    per gram and measured ~2.5x slower end-to-end at sf0.1 (the
    dedup._shingle_hashes lesson, relearned here). Docs with < n
    tokens contribute no grams (there is no n-gram to share)."""
    toks = tokens(text_col)
    # clamped: a < n-token doc yields m = 0 => every slice/zip below is
    # empty and the doc naturally emits no gram (negative slice lengths
    # throw in Spark 4)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    h1 = F.transform(F.slice(toks, 1, m), lambda t: F.xxhash64(t))
    h2 = F.transform(
        F.slice(toks, 1, m), lambda t: F.xxhash64(t, F.lit(1))
    )
    for j in range(1, n):
        h1 = F.zip_with(
            h1,
            F.slice(toks, j + 1, m),
            lambda acc, t: acc * F.lit(_GRAM_P) + F.xxhash64(t),
        )
        h2 = F.zip_with(
            h2,
            F.slice(toks, j + 1, m),
            lambda acc, t: acc * F.lit(_GRAM_P) + F.xxhash64(t, F.lit(1)),
        )
    pairs = F.zip_with(
        h1, h2, lambda a, b: F.struct(a.alias("h1"), b.alias("h2"))
    )
    return F.when(F.size(toks) >= n, F.array_distinct(pairs)).otherwise(
        F.slice(pairs, 1, 0)
    )


# DuckDB n-gram builder on the same tokenizer (t[i:i+n-1] is an
# inclusive n-wide slice); empty for < n tokens, matching _gram_pairs
_GRAMS_SQL = (
    "list_distinct(list_transform(range(1, greatest(len(t) - {nm1}, 0) + 1), "
    "i -> array_to_string(t[i:i+{nm1}], ' ')))"
)


def pair_emit(df: DataFrame, arr_col: str, a_name: str, b_name: str) -> DataFrame:
    """All unordered pairs ``(arr[i], arr[j>i])`` from a sorted-array
    column, WITHOUT materializing C(|arr|, 2) structs inside one row.

    The previous idiom — ``flatten(transform(arr, i -> transform(
    slice(arr, i+2, ...))))`` — built the ENTIRE pair set as one array
    value in one row before exploding: a universal boilerplate gram
    shared by 2 000 sources would allocate ~2M structs (~tens of MB)
    for a single cell, a skew/memory spike Generate can't stream
    around (VERDICT r10 hazard #1; the ×100 probe salted sources into
    disjoint token universes and so structurally couldn't see it).

    Two-level Generate instead: ``posexplode`` the array (one output
    row per LEFT element, streamed), then per row build only that
    element's tail slice and explode it. No intermediate array value
    ever exceeds ``|arr| - 1`` elements, and both Generates pipeline
    row-at-a-time — the C(|arr|, 2) pairs still exist (they are the
    true output) but as streamed rows feeding a map-side-combinable
    groupBy, never as one in-memory value. Verified by the planted
    universal-gram test at |sources| = 1 200
    (tests/test_corpus_compare.py) and the shared-gram ``x100_compare``
    probe leg (SCALE.md r11)."""
    return (
        df.select(
            F.posexplode(arr_col).alias("__i", a_name),
            F.col(arr_col).alias("__arr"),
        )
        .select(
            F.col(a_name),
            F.explode(
                F.slice(
                    F.col("__arr"),
                    F.col("__i") + 2,
                    F.greatest(
                        F.size("__arr") - F.col("__i") - 1, F.lit(0)
                    ),
                )
            ).alias(b_name),
        )
    )


def source_overlap_matrix(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(source_a, source_b, shared_grams, grams_a, grams_b, jaccard)
    for every unordered source pair sharing >= 1 distinct word-n-gram
    (source_a < source_b lexicographically; non-overlapping pairs emit
    no row — at scale the result is overlap-selective, not
    |sources|^2-sized). ``grams_a``/``grams_b`` are each source's
    distinct-gram counts, ``jaccard`` = shared / (a + b - shared)
    rounded to 4 dp.

    Plan: ONE corpus-sized shuffle. The explode feeds a single
    groupBy(gram-hash-pair) whose collect_set(source) both dedups
    (source, gram) occurrences and builds the per-gram source set
    (map-side partials bounded by |sources| per gram); per-source
    distinct-gram counts then come from exploding those sets — a
    |distinct grams|-row frame, already aggregated — instead of a
    second corpus-wide pass (a first cut shuffled the corpus-sized
    frame three times: distinct + two groupBys; measured 7.6 s vs
    ~3 s fused at sf0.1). Pair emission streams through
    :func:`pair_emit` (no self-join, no single-row C(|sources|,2)
    blowup); the shuffle keys are (h1, h2) ints."""
    g = df.select(
        F.col(source_col).alias("source"),
        F.explode(_gram_pairs(text_col, n)).alias("g"),
    ).select("source", F.col("g.h1").alias("h1"), F.col("g.h2").alias("h2"))
    # per-gram source list (sorted => pairs come out ordered a < b);
    # |sources| is bounded, so the array and its pair set stay tiny.
    # r12: pinned — the per-source counts and the pair emission both
    # consume this aggregate, and exchange reuse did not cover the two
    # branches (plan showed the corpus explode running more than once);
    # the pinned frame is |distinct grams| rows of (two longs, tiny
    # source array), far smaller than the corpus text it summarizes.
    srcs = g.groupBy("h1", "h2").agg(
        F.array_sort(F.collect_set("source")).alias("ss")
    ).localCheckpoint(eager=True)
    per_source = (
        srcs.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_grams"))
    )
    pairs = (
        pair_emit(
            srcs.filter(F.size("ss") >= 2), "ss", "source_a", "source_b"
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )
    a = per_source.select(
        F.col("source").alias("source_a"), F.col("n_grams").alias("grams_a")
    )
    b = per_source.select(
        F.col("source").alias("source_b"), F.col("n_grams").alias("grams_b")
    )
    return (
        pairs.join(F.broadcast(a), "source_a")
        .join(F.broadcast(b), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("shared_grams").cast("long").alias("shared_grams"),
            F.col("grams_a").cast("long").alias("grams_a"),
            F.col("grams_b").cast("long").alias("grams_b"),
            F.round(
                F.col("shared_grams")
                / (F.col("grams_a") + F.col("grams_b") - F.col("shared_grams"))
                + F.lit(1e-9),
                4,
            ).alias("jaccard"),
        )
    )


def source_overlap_matrix_sql(
    n: int = 8,
    table: str = "documents",
    text_col: str = "text",
    source_col: str = "source",
) -> str:
    """DuckDB twin of :func:`source_overlap_matrix` — gram TEXT instead
    of the 128-bit hash pair (identical counts up to hash collision,
    the documented tolerance), pairs via a self-join on the gram."""
    toks = TOKENS_SQL.format(c=text_col)
    grams = _GRAMS_SQL.format(nm1=n - 1)
    return f"""
WITH tk AS (SELECT {source_col} AS source, {toks} AS t FROM {table}),
g AS (SELECT DISTINCT source, unnest({grams}) AS gram FROM tk),
ps AS (SELECT source, count(*) AS n_grams FROM g GROUP BY 1),
pairs AS (SELECT a.source AS source_a, b.source AS source_b,
                 count(*) AS shared_grams
          FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
          GROUP BY 1, 2)
SELECT source_a, source_b,
       CAST(shared_grams AS BIGINT) AS shared_grams,
       CAST(pa.n_grams AS BIGINT) AS grams_a,
       CAST(pb.n_grams AS BIGINT) AS grams_b,
       round(CAST(shared_grams AS DOUBLE)
             / (pa.n_grams + pb.n_grams - shared_grams) + 1e-9, 4)
         AS jaccard
FROM pairs
JOIN ps pa ON pa.source = pairs.source_a
JOIN ps pb ON pb.source = pairs.source_b"""


def source_drift(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source distribution drift between two snapshot versions:
    (source, n_docs_old, n_docs_new, tokens_old, tokens_new, js_div).

    ``js_div`` is the Jensen-Shannon divergence (natural log; in
    [0, ln 2]) between the source's unigram distributions in the old
    and new snapshots, rounded to 4 dp. Two disjoint non-empty
    distributions score ln 2 ~ 0.6931; a source present in only ONE
    snapshot still emits a row and scores 0.5*ln 2 ~ 0.3466 under the
    empty-distribution convention (the missing side is all-zero mass,
    so only one KL half contributes) — appearing/vanishing sources are
    drift, not noise. A (0-token vs 0-token) source scores 0.0.

    Plan: ONE token explode per side (the tokenize-bearing pass);
    per-(source, token) counts meet in a full-outer join keyed by
    (source, 128-bit token hash pair) — ints only — then one
    per-source aggregate folds the JS terms. Per-source token totals
    come from the SAME counts frame (sum of per-token counts — exactly
    the occurrence total, no second tokenize; the r10 review caught a
    first cut re-running the corpus regex in a separate totals pass),
    and doc counts are a tokenize-free count(*). Token text never
    crosses an exchange; output is |sources| rows."""

    def counts(df, side):
        toks = tokens(text_col)
        return (
            df.select(
                F.col(source_col).alias("source"),
                F.explode(toks).alias("__t"),
            )
            .groupBy(
                "source",
                F.xxhash64("__t").alias("h1"),
                F.xxhash64("__t", F.lit(1)).alias("h2"),
            )
            .agg(F.count(F.lit(1)).alias(f"c_{side}"))
        )

    co_f, cn_f = counts(old, "old"), counts(new, "new")

    def doc_count(df, side):
        return df.groupBy(F.col(source_col).alias("source")).agg(
            F.count(F.lit(1)).alias(f"n_docs_{side}")
        )

    def tok_total(cf, side):
        # Catalyst reuses the (source, h1, h2) exchange between this
        # aggregate and the join below (the bm25 ReusedExchange shape)
        return cf.groupBy("source").agg(
            F.sum(f"c_{side}").cast("long").alias(f"tokens_{side}")
        )

    j = co_f.join(cn_f, ["source", "h1", "h2"], "full_outer")
    totals = (
        doc_count(old, "old")
        .join(doc_count(new, "new"), ["source"], "full_outer")
        .join(tok_total(co_f, "old"), ["source"], "left")
        .join(tok_total(cn_f, "new"), ["source"], "left")
    )
    co = F.coalesce(F.col("c_old"), F.lit(0)).cast("double")
    cn = F.coalesce(F.col("c_new"), F.lit(0)).cast("double")
    to = F.col("tokens_old").cast("double")
    tn = F.col("tokens_new").cast("double")
    p = F.when(to > 0, co / to).otherwise(F.lit(0.0))
    q = F.when(tn > 0, cn / tn).otherwise(F.lit(0.0))
    m = (p + q) / 2
    term = (
        F.when(p > 0, F.lit(0.5) * p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(q > 0, F.lit(0.5) * q * F.log(q / m)).otherwise(F.lit(0.0))
    )
    js = j.join(F.broadcast(totals.select("source", "tokens_old", "tokens_new")), "source").groupBy(
        "source"
    ).agg(F.sum(term).alias("__js"))
    return (
        totals.join(js, "source", "left")
        .select(
            "source",
            F.coalesce("n_docs_old", F.lit(0)).cast("long").alias("n_docs_old"),
            F.coalesce("n_docs_new", F.lit(0)).cast("long").alias("n_docs_new"),
            F.coalesce("tokens_old", F.lit(0)).cast("long").alias("tokens_old"),
            F.coalesce("tokens_new", F.lit(0)).cast("long").alias("tokens_new"),
            F.round(F.coalesce("__js", F.lit(0.0)) + F.lit(1e-9), 4).alias(
                "js_div"
            ),
        )
    )


def source_drift_sql(
    old_sql: str,
    new_sql: str,
    text_col: str = "text",
    source_col: str = "source",
) -> str:
    """DuckDB twin of :func:`source_drift`. ``old_sql``/``new_sql`` are
    subqueries producing the two snapshots (same columns as the
    DataFrames); token text replaces the hash pair (identical
    grouping up to hash collision)."""
    toks = TOKENS_SQL.format(c=text_col)
    return f"""
WITH old_s AS ({old_sql}), new_s AS ({new_sql}),
oc AS (SELECT {source_col} AS source, unnest({toks}) AS t FROM old_s),
nc AS (SELECT {source_col} AS source, unnest({toks}) AS t FROM new_s),
ocnt AS (SELECT source, t, count(*) AS c_old FROM oc GROUP BY 1, 2),
ncnt AS (SELECT source, t, count(*) AS c_new FROM nc GROUP BY 1, 2),
ot AS (SELECT {source_col} AS source, count(*) AS n_docs_old
       FROM old_s GROUP BY 1),
nt AS (SELECT {source_col} AS source, count(*) AS n_docs_new
       FROM new_s GROUP BY 1),
otok AS (SELECT source, sum(c_old) AS tokens_old FROM ocnt GROUP BY 1),
ntok AS (SELECT source, sum(c_new) AS tokens_new FROM ncnt GROUP BY 1),
tot AS (SELECT coalesce(ot.source, nt.source) AS source,
               coalesce(n_docs_old, 0) AS n_docs_old,
               coalesce(n_docs_new, 0) AS n_docs_new,
               coalesce(tokens_old, 0) AS tokens_old,
               coalesce(tokens_new, 0) AS tokens_new
        FROM ot FULL OUTER JOIN nt ON ot.source = nt.source
        LEFT JOIN otok ON otok.source = coalesce(ot.source, nt.source)
        LEFT JOIN ntok ON ntok.source = coalesce(ot.source, nt.source)),
j AS (SELECT coalesce(ocnt.source, ncnt.source) AS source,
             coalesce(c_old, 0) AS c_old, coalesce(c_new, 0) AS c_new
      FROM ocnt FULL OUTER JOIN ncnt
        ON ocnt.source = ncnt.source AND ocnt.t = ncnt.t),
js AS (SELECT j.source,
              sum(CASE WHEN p > 0
                       THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0 END
                  + CASE WHEN q > 0
                         THEN 0.5 * q * ln(q / ((p + q) / 2)) ELSE 0 END)
                AS jsv
       FROM (SELECT j.source,
                    CASE WHEN tokens_old > 0
                         THEN CAST(c_old AS DOUBLE) / tokens_old
                         ELSE 0.0 END AS p,
                    CASE WHEN tokens_new > 0
                         THEN CAST(c_new AS DOUBLE) / tokens_new
                         ELSE 0.0 END AS q
             FROM j JOIN tot ON j.source = tot.source) j
       GROUP BY 1)
SELECT tot.source,
       CAST(n_docs_old AS BIGINT) AS n_docs_old,
       CAST(n_docs_new AS BIGINT) AS n_docs_new,
       CAST(tokens_old AS BIGINT) AS tokens_old,
       CAST(tokens_new AS BIGINT) AS tokens_new,
       round(coalesce(jsv, 0.0) + 1e-9, 4) AS js_div
FROM tot LEFT JOIN js ON tot.source = js.source"""


def split_leakage_guard(
    df: DataFrame,
    weights: tuple[int, int, int] = (80, 10, 10),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment with exact-duplicate
    leakage repair: (id, split, moved).

    Raw assignment hashes the id — ``pmod(xxhash64(id), 100)`` against
    the cumulative ``weights`` — so membership is reproducible and
    join-free. The leakage guard then forces every group of
    byte-identical documents (md5 of text; NULL texts form their own
    group via a sentinel outside md5's hex alphabet — an equi-join on
    a raw NULL hash would silently DROP those docs) onto the split of
    the group's KEEPER (min id): a duplicated eval document leaking
    into train is the classic contamination bug this exists to stop.
    ``moved`` flags docs whose raw split was overridden.

    Plan: the only corpus-sized shuffle keys are (md5, min-id partial)
    — map-side partial min, text never exchanged. Unique-text docs
    (the overwhelming mass after dedup) take the broadcast-free hash
    path untouched."""
    def bucket(c):
        return F.pmod(F.xxhash64(c), F.lit(100))

    return _guard(df, bucket, weights, text_col, id_col)


def _guard(df, bucket, weights, text_col: str, id_col: str) -> DataFrame:
    """Shared guard body for the two bucket-hash variants (r10 review:
    a copy-pasted pair lets the 'semantics identical' claim silently
    diverge). ``bucket`` maps an id Column to a [0, 100) bucket."""
    if len(weights) != 3 or any(w < 0 for w in weights) or sum(weights) != 100:
        raise ValueError(f"weights must be 3 non-negatives summing to 100: {weights}")

    def split_of(c):
        b = bucket(c)
        return (
            F.when(b < weights[0], F.lit("train"))
            .when(b < weights[0] + weights[1], F.lit("val"))
            .otherwise(F.lit("test"))
        )

    base = df.select(
        F.col(id_col),
        F.coalesce(F.md5(text_col), F.lit("__null__")).alias("__h"),
    )
    keeper = base.groupBy("__h").agg(F.min(id_col).alias("__keep_id"))
    return (
        base.withColumn("__raw", split_of(F.col(id_col)))
        .join(
            keeper.withColumn("__ks", split_of(F.col("__keep_id"))), "__h"
        )
        .select(
            F.col(id_col),
            F.col("__ks").alias("split"),
            (F.col("__ks") != F.col("__raw")).alias("moved"),
        )
    )


def split_leakage_guard_md5(
    df: DataFrame,
    weights: tuple[int, int, int] = (80, 10, 10),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Oracle-matched variant of :func:`split_leakage_guard`: the
    bucket is ``conv(md5(id)[:8], 16, 10) % 100`` — the repo's
    dual-engine hash idiom — so DuckDB reproduces assignments exactly.
    Same guard body (``_guard``), same output schema. (The xxhash64
    variant is the production default: one less md5 over the id;
    semantics identical.)"""

    def bucket(c):
        return F.conv(
            F.substring(F.md5(c.cast("string")), 1, 8), 16, 10
        ).cast("long") % 100

    return _guard(df, bucket, weights, text_col, id_col)


def split_leakage_guard_md5_sql(
    weights: tuple[int, int, int] = (80, 10, 10),
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`split_leakage_guard_md5`."""
    t, v = weights[0], weights[0] + weights[1]

    def bucket(c):
        return (
            f"CAST(from_hex(substr(md5(CAST({c} AS VARCHAR)), 1, 8)) "
            f"AS BIT)::UINTEGER % 100"
        )

    def split_of(c):
        return (
            f"CASE WHEN {bucket(c)} < {t} THEN 'train' "
            f"WHEN {bucket(c)} < {v} THEN 'val' ELSE 'test' END"
        )

    return f"""
WITH base AS (SELECT {id_col}, coalesce(md5({text_col}), '__null__') AS h,
                     {split_of(id_col)} AS raw
              FROM {table}),
keeper AS (SELECT h, min({id_col}) AS keep_id FROM base GROUP BY 1),
ks AS (SELECT h, {split_of("keep_id")} AS ksplit FROM keeper)
SELECT base.{id_col}, ks.ksplit AS split,
       ks.ksplit <> base.raw AS moved
FROM base JOIN ks USING (h)"""
