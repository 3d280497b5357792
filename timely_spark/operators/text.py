"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All pure Column expressions (whole-stage codegen; no Python row path).
Each has an exactly-equivalent SQL rendering used for the DuckDB oracle —
keep the two in lock-step when editing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword-hit heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "por", "que"],
}


# THE tokenizer character class — the one contract every engine-side
# (tokens/TOKENS_SQL) and driver-side (retrieval query parsing,
# similarity query hashing) tokenizer must share: a drift here silently
# breaks the dual-engine score/embedding twins (ADVICE r11).
TOKEN_RE = "[a-z0-9']+"


def tokens(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    # NULL text tokenizes to an EMPTY array, not NULL: Spark's size(NULL)
    # is -1, which would leak as a token count; DuckDB's len(NULL) is
    # NULL — coalescing here keeps both engines at 0
    c = F.coalesce(c, F.lit(""))
    # extract-all of the token class == filter(split on its negation):
    # identical maximal-run semantics (TOKENS_SQL mirrors it), but ONE
    # regex pass and NO filter HOF. Measured 1.7x faster than the
    # split+filter form at sf0.1 — and since _tokens feeds shingle /
    # window HOF pipelines where Generate-adjacent expressions
    # re-evaluate per element, the tokenizer's cost multiplies: the r6
    # split+filter tokenizer re-baselined four bench gates 1.6-2x up
    # (mis-attributed to host drift; r7 same-session A/B pinned it)
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RE), 0)


def token_count(text_col: str | Column = "text") -> Column:
    """Whitespace-ish token count (BPE-approximating word splitter)."""
    return F.size(tokens(text_col)).cast("long")


# GPT-2-style pre-tokenizer classes, restricted to syntax Java regex and
# DuckDB's RE2 treat identically (no lookahead/backrefs): contractions,
# space-prefixed letter runs, digit runs, punctuation runs, whitespace runs.
BPE_SPLIT_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(text_col: str | Column = "text") -> Column:
    """Pre-tokenizer piece count — the usual fast proxy for 'how many BPE
    tokens will this doc cost' before a real tokenizer pass (each piece
    splits into >=1 merges, so this lower-bounds true BPE counts with a
    stable ratio on natural text)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_SPLIT_RE), F.lit(0))).cast("long")


BPE_TOKEN_COUNT_SQL = (
    "CAST(len(regexp_extract_all({c}, "
    "'''(?:s|t|re|ve|m|ll|d)| ?[\\p{{L}}]+| ?[\\p{{N}}]+| ?[^\\s\\p{{L}}\\p{{N}}]+|\\s+')) AS BIGINT)"
)


def _stopword_hits(text_col, words: list[str]) -> Column:
    toks = tokens(text_col)
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wl, t))).cast("double")


def lang_id(text_col: str | Column = "text") -> Column:
    """Heuristic language ID: argmax stopword-hit rate across languages.

    Deterministic tie-break: language name ascending; empty/zero-hit
    documents classify as 'unknown'.
    """
    scores = [(lang, _stopword_hits(text_col, ws)) for lang, ws in sorted(LANG_STOPWORDS.items())]
    # materialize each language's score ONCE in an array, then argmax by a
    # fold — the greatest()+per-language-equality formulation inlines every
    # score expression ~6x (each a full tokenize), ~5x slower end-to-end
    arr = F.array(
        *[F.struct(F.lit(lang).alias("lang"), s.alias("s")) for lang, s in scores]
    )
    init = F.struct(F.lit("unknown").alias("lang"), F.lit(0.0).alias("s"))
    # strict > keeps the FIRST (ascending) language at the max; scores must
    # beat 0.0 to displace 'unknown' — same tie-break as the reference impl
    best = F.aggregate(arr, init, lambda acc, x: F.when(x["s"] > acc["s"], x).otherwise(acc))
    return best["lang"]


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-signal columns: n_tokens, mean_token_len,
    punct_ratio, stopword_ratio, quality_score in [0,1].

    The score formula mirrors common pretraining heuristics (length in
    range, low punctuation noise, natural stopword density).
    """
    c = F.col(text_col)
    n_tok = token_count(text_col)
    n_chars = F.length(c).cast("double")
    alpha_chars = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double")
    punct_chars = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", "")).cast("double")
    sw = _stopword_hits(c, LANG_STOPWORDS["en"])
    mean_tok_len = F.when(n_tok > 0, alpha_chars / n_tok.cast("double")).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct_chars / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, sw / n_tok.cast("double")).otherwise(F.lit(0.0))
    length_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * length_ok
        + F.lit(0.3) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0)))
    )
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("mean_token_len", mean_tok_len)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("quality_score", score)
    )


def fingerprint(text_col: str | Column = "text") -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set — robust to shuffled word order / duplicated whitespace
    (the cheap cousin of a rolling-hash fingerprint; exact-dup detection
    after normalization).
    """
    norm = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text_col))))
    return F.md5(norm)


# ------------------------- DuckDB SQL renderings (oracle parity) ---------

TOKENS_SQL = (
    "list_filter(string_split_regex(lower(coalesce({c}, '')), '[^a-z0-9'']+'), "
    "t -> t <> '')"
)
TOKEN_COUNT_SQL = f"CAST(len({TOKENS_SQL}) AS BIGINT)"
FINGERPRINT_SQL = (
    "md5(array_to_string(list_sort(list_distinct(" + TOKENS_SQL + ")), ' '))"
)


def stopword_hits_sql(c: str, words: list[str]) -> str:
    wl = "[" + ",".join(f"'{w}'" for w in words) + "]"
    return (
        f"CAST(len(list_filter({TOKENS_SQL.format(c=c)}, t -> list_contains({wl}, t))) AS DOUBLE)"
    )


def lang_id_sql(c: str) -> str:
    langs = sorted(LANG_STOPWORDS.items())
    hits = {lang: stopword_hits_sql(c, ws) for lang, ws in langs}
    greatest = "greatest(" + ", ".join(hits[lang] for lang, _ in langs) + ")"
    expr = "'unknown'"
    for lang, _ in reversed(langs):
        expr = (
            f"CASE WHEN {greatest} > 0 AND {hits[lang]} = {greatest} "
            f"THEN '{lang}' ELSE {expr} END"
        )
    return expr


# ---------------------------------------------------------------- PII scrubbing

# Patterns restricted to syntax Java regex and DuckDB's RE2 treat
# identically (no lookaround/backrefs) — keep the SQL renderings below in
# lock-step.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}
# order matters: ipv4 before phone would not collide, but email first keeps
# host-like strings out of the ipv4/phone passes
_PII_ORDER = ["email", "ipv4", "phone"]


def pii_counts(text_col: str | Column = "text") -> list[Column]:
    """One ``n_<kind>`` count column per PII pattern (pure codegen)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return [
        F.size(F.regexp_extract_all(c, F.lit(p), F.lit(0))).cast("long").alias(f"n_{k}")
        for k, p in PII_PATTERNS.items()
    ]


def pii_scrub(text_col: str | Column = "text") -> Column:
    """Replace each PII match with a typed placeholder (<EMAIL>, <IPV4>,
    <PHONE>) — the standard pre-training scrub pass, as chained
    regexp_replace (JVM-side, no Python row path)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for k in _PII_ORDER:
        c = F.regexp_replace(c, PII_PATTERNS[k], f"<{k.upper()}>")
    return c


def pii_counts_sql(c: str) -> dict[str, str]:
    return {
        k: f"CAST(len(regexp_extract_all({c}, '{p}')) AS BIGINT)"
        for k, p in PII_PATTERNS.items()
    }


def pii_scrub_sql(c: str) -> str:
    expr = c
    for k in _PII_ORDER:
        expr = f"regexp_replace({expr}, '{PII_PATTERNS[k]}', '<{k.upper()}>', 'g')"
    return expr


# ---------------------------------------------------------------- repetition signals


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - ``dup_line_frac``: fraction of lines that are duplicates of an
      earlier line (1 - distinct/total) — pure Column expression.
    - ``top_2gram_frac``: share of all word 2-grams taken by the most
      frequent one — sort the per-doc gram array and take the longest
      run of equal adjacent elements with an ``aggregate`` fold, all in
      column expressions. ZERO shuffle at any corpus size (the earlier
      explode + two-level aggregation paid two corpus-linear Exchanges
      for the same numbers; per-doc cost is n log n on the doc's own
      gram count either way).

    High values on either signal mark boilerplate/spam for filtering.
    """
    c = F.col(text_col)
    lines = F.filter(F.split(c, "\n"), lambda l: l != "")
    dup_line_frac = F.when(
        F.size(lines) > 0,
        1.0 - F.size(F.array_distinct(lines)) / F.size(lines),
    ).otherwise(0.0)

    toks = tokens(text_col)
    m = F.size(toks) - 1
    grams = F.zip_with(
        F.slice(toks, 1, F.greatest(m, F.lit(0))),
        F.slice(toks, 2, F.greatest(m, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    # longest equal-run in the sorted gram array == max gram multiplicity
    folded = F.aggregate(
        F.sort_array(grams),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                a["best"],
                F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    top_frac = F.when(
        F.size(grams) > 0, folded["best"] / F.size(grams)
    ).otherwise(0.0)
    return df.select(
        F.col(id_col),
        F.round(dup_line_frac, 4).alias("dup_line_frac"),
        F.round(top_frac, 4).alias("top_2gram_frac"),
    )


def token_frequencies(
    df: DataFrame, text_col: str = "text", k: int = 50
) -> DataFrame:
    """Corpus-wide top-k token frequencies (vocabulary head / boilerplate
    audit): explode + count + deterministic top-k. Partial aggregation
    counts map-side, so the shuffle carries one row per distinct token per
    partition, not one per occurrence."""
    ex = df.select(F.explode(tokens(text_col)).alias("token"))
    counts = ex.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.desc("n"), F.col("token")).limit(k)


# ---------------------------------------------------------------- deterministic sampling


def hash_sample(
    df: DataFrame,
    fraction_hex: str = "0a",
    key_col: str = "text",
) -> DataFrame:
    """Deterministic content-hash Bernoulli sample: keep rows whose
    md5(key) starts below ``fraction_hex`` (two hex chars => rate =
    int(fraction_hex, 16)/256, e.g. "0a" ~ 3.9%).

    Content-keyed sampling is reproducible across runs/engines/cluster
    sizes (unlike ``df.sample``'s partition-seeded RNG) and keeps all
    copies of identical text together — the property training-data
    ablations need. Pure Column predicate: prunes at the scan when the
    hash column is materialized.
    """
    return df.filter(F.substring(F.md5(F.col(key_col)), 1, 2) < F.lit(fraction_hex))


def weighted_hash_sample_flag(
    df: DataFrame,
    weight_col: str | Column,
    target: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weight-proportional Bernoulli sample: row i is kept
    with probability min(1, target * w_i / sum(w)) — expected sample
    size ``target``, heavier rows proportionally likelier (the sampling
    step importance-resampling schemes like DSIR prescribe; pass any
    non-negative INTEGER weight — token counts, dedup cluster sizes).

    The keep decision is an INTEGER-EXACT predicate, zero float
    knife-edge and reproducible across engines/runs/cluster sizes:

        md5_32(id) * sum_w  <  target * w_i * 2^32

    (md5_32 = the id's 32-bit md5 prefix, a uniform draw from
    [0, 2^32)). All products run in decimal(38,0)/HUGEINT — at
    corpus scale sum_w ~ 1e12 keeps the left side ~4e21, far inside
    38 digits. sum(w) is one scalar aggregate; the flag itself is a
    pure Column predicate (prunes at the scan once hashes
    materialize). Output: df + ``sampled`` boolean."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    total = df.agg(
        F.sum(w.cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]
    if total is None or int(total) <= 0:
        return df.withColumn("sampled", F.lit(False))
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("decimal(38,0)")
    # total re-enters the plan as a STRING literal: F.lit(int) only
    # encodes 64-bit longs, and sum_w is legitimately > 2^63 at corpus
    # scale (the decimal(38) headroom this function advertises)
    lhs = h * F.lit(str(int(total))).cast("decimal(38,0)")
    rhs = (
        F.lit(int(target)).cast("decimal(38,0)")
        * w.cast("decimal(38,0)")
        * F.lit(2**32).cast("decimal(38,0)")
    )
    return df.withColumn("sampled", lhs < rhs)


def weighted_hash_sample_sql(
    weight_expr: str,
    target: int,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`weighted_hash_sample_flag` (HUGEINT
    arithmetic — the same exact integers, so the flags hash-match)."""
    h = (
        f"CAST(CAST(from_hex(substr(md5(CAST({id_col} AS VARCHAR)), 1, 8)) "
        "AS BIT)::UINTEGER AS HUGEINT)"
    )
    return f"""
WITH w AS (SELECT {id_col}, CAST({weight_expr} AS HUGEINT) AS wt FROM {table}),
tot AS (SELECT sum(wt) AS s FROM w)
SELECT w.{id_col}, CAST(w.wt AS BIGINT) AS weight,
       CASE WHEN tot.s IS NULL OR tot.s <= 0 THEN FALSE
            ELSE {h} * tot.s
                 < {target}::HUGEINT * w.wt * 4294967296::HUGEINT
       END AS sampled
FROM w CROSS JOIN tot"""


# ---------------------------------------------------------------- URL / domain ops

# Java-regex/RE2 common dialect (no lookaround). Captures scheme://host.
URL_RE = r"https?://([A-Za-z0-9.-]+)[^\s]*"


def extract_domains(text_col: str | Column = "text") -> Column:
    """All domains linked from a document (lowercased, distinct) — the
    per-document signal for domain-level filtering/weighting of a web
    corpus. Pure Column expression."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.array_distinct(
        F.transform(
            F.regexp_extract_all(c, F.lit(URL_RE), F.lit(1)), lambda d: F.lower(d)
        )
    )


def domain_blocklist_filter(
    df: DataFrame,
    blocked: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Drop documents linking to any blocked domain (exact match on the
    extracted host). The blocklist is a literal array (broadcast-free:
    baked into the plan); for million-entry blocklists use a broadcast
    join against ``explode(extract_domains(...))`` instead."""
    doms = extract_domains(text_col)
    bl = F.array(*[F.lit(b.lower()) for b in blocked])
    return df.filter(F.size(F.array_intersect(doms, bl)) == 0)


DOMAINS_SQL = (
    "list_distinct(list_transform("
    "regexp_extract_all({c}, 'https?://([A-Za-z0-9.-]+)[^\\s]*', 1), d -> lower(d)))"
)


def type_token_ratio(text_col: str | Column = "text") -> list[Column]:
    """Lexical-diversity quality signal: distinct-token / token ratio
    per doc (low TTR flags boilerplate/spam for corpus filtering). Pure
    column expressions over the scan — no shuffle at any corpus size.

    Returns [n_tokens, n_distinct, ttr] columns.
    """
    t = tokens(text_col)
    n = F.size(t).cast("long")
    d = F.size(F.array_distinct(t)).cast("long")
    ttr = F.round(d / F.nullif(n.cast("double"), F.lit(0.0)), 4)
    return [n.alias("n_tokens"), d.alias("n_distinct"), ttr.alias("ttr")]


def ttr_sql(c: str) -> str:
    """DuckDB equivalents of type_token_ratio (same aliases)."""
    toks = TOKENS_SQL.format(c=c)
    return (
        f"CAST(len({toks}) AS BIGINT) AS n_tokens, "
        f"CAST(len(list_distinct({toks})) AS BIGINT) AS n_distinct, "
        f"round(CAST(len(list_distinct({toks})) AS DOUBLE)"
        f" / nullif(CAST(len({toks}) AS DOUBLE), 0.0), 4) AS ttr"
    )


def tfidf_top_terms(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_n: int = 3,
    min_df: int = 1,
) -> DataFrame:
    """Per-group characteristic terms by tf-idf — the standard corpus
    characterization pass (what distinguishes each source/domain slice).

    tf = term count within the group; idf = ln(n_groups / group-df).
    Scale shape: one (group, term) aggregation with map-side combine
    (corpus-linear), then a tiny per-term df aggregate broadcast back;
    the final top-n window runs over n_groups x vocabulary rows, not the
    corpus. Ties break lexicographically so output is deterministic.
    """
    from pyspark.sql import Window

    tok = docs.select(
        F.col(group_col).alias("grp"), F.explode(tokens(text_col)).alias("term")
    )
    tf = tok.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_groups = docs.select(group_col).distinct().count()  # scalar seam
    # df = groups containing the term = rows per term in the (grp, term)
    # aggregate. A count window over that aggregate beats a groupBy +
    # broadcast-join back: one fewer Exchange AND the tf branch isn't
    # recomputed for a second scan (the window runs over vocab x groups
    # rows, never the corpus)
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .filter(F.col("df") >= min_df)
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.lit(float(n_groups)) / F.col("df")), 4),
        )
    )
    w = Window.partitionBy("grp").orderBy(F.desc("tfidf"), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_n)
        .select(
            F.col("grp").alias(group_col),
            "term",
            "tf",
            "df",
            "tfidf",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def bigram_novelty(
    docs: DataFrame,
    text_col: str = "text",
    rare_max_count: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-trained bigram rarity score — the boilerplate/novelty
    screen a training pipeline runs before sampling (CCNet-style LM
    filtering, with exact count ratios instead of float log-probs so the
    score is bit-deterministic at any cluster size).

    Per doc: the fraction of its word bigrams seen at most
    ``rare_max_count`` times in the WHOLE corpus. Low novelty =
    boilerplate (every bigram is common); high = unique or gibberish.

    Scale shape: rarity inverts Zipf — the COMMON set (count >
    ``rare_max_count``, the vocabulary head) is small, so it aggregates
    with map-side combine and broadcasts back; a doc's rare count is
    bigrams minus common-hits. No exploded row ever shuffles on the
    bigram key (a per-bigram window would funnel every "of the" in the
    corpus to one task), and both aggregations partial-combine. The
    final per-doc agg is integer-exact, so the single rounded division
    per output row is order-independent.
    """
    # materialize the token array ONCE per row — referencing tokens()
    # inside each transform element would re-run the regex split per
    # bigram (O(tokens^2) per doc)
    tk = docs.select(id_col, tokens(text_col).alias("t"))
    t = F.col("t")
    bg_arr = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i), F.element_at(t, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = tk.select(id_col, F.explode(bg_arr).alias("bigram"))
    common = (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > rare_max_count)
        .select("bigram", F.lit(1).alias("__is_common"))
    )
    # no broadcast HINT: a hint is mandatory (no fallback) and the common
    # set grows with the corpus; unhinted, AQE broadcasts it while small
    # and degrades to a skew-split shuffle join when it is not
    flagged = bg.join(common, "bigram", "left")
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(
                F.lit(1) - F.coalesce(F.col("__is_common"), F.lit(0))
            ).cast("bigint").alias("n_rare"),
        )
        .select(
            id_col,
            "n_bigrams",
            "n_rare",
            F.round(
                F.col("n_rare").cast("double") / F.col("n_bigrams"), 6
            ).alias("novelty"),
        )
    )


def bigram_novelty_sql(
    text_col: str = "text", rare_max_count: int = 2, id_col: str = "doc_id"
) -> str:
    """DuckDB equivalent of bigram_novelty over ``documents``."""
    toks = TOKENS_SQL.format(c=text_col)
    return f"""
WITH tok AS (SELECT {id_col}, {toks} AS t FROM documents),
bg AS (
  SELECT {id_col}, t[i] || ' ' || t[i + 1] AS bigram
  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
  WHERE len(t) >= 2),
model AS (SELECT bigram, count(*) AS c FROM bg GROUP BY 1)
SELECT bg.{id_col} AS {id_col},
       count(*) AS n_bigrams,
       CAST(sum(CASE WHEN c <= {rare_max_count} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rare,
       round(CAST(sum(CASE WHEN c <= {rare_max_count} THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS novelty
FROM bg JOIN model USING (bigram)
GROUP BY 1"""


def tfidf_top_terms_sql(
    group_col: str = "source", text_col: str = "text", top_n: int = 3
) -> str:
    """DuckDB equivalent of tfidf_top_terms over ``documents``."""
    toks = TOKENS_SQL.format(c=text_col)
    return f"""
WITH tok AS (
  SELECT {group_col} AS grp, unnest({toks}) AS term FROM documents),
tf AS (SELECT grp, term, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
ng AS (SELECT count(DISTINCT {group_col}) AS n FROM documents),
scored AS (
  SELECT grp, tf.term AS term, tf, df,
         round(tf * ln(CAST(ng.n AS DOUBLE) / df), 4) AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN ng),
ranked AS (
  SELECT grp, term, tf, df, tfidf,
         row_number() OVER (PARTITION BY grp ORDER BY tfidf DESC, term) AS rnk
  FROM scored)
SELECT grp AS {group_col}, term, tf, df, tfidf, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= {top_n}"""


# Required-stopword list from the Gopher rules (Rae et al. 2021, A1.1):
# a document must contain at least 2 of these to pass.
GOPHER_REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher quality-filter signals + pass flag (Rae et al. 2021, A1.1).

    Pure Column expressions over the scan — no shuffle at any corpus
    size. Complements ``quality_features`` (soft score) and
    ``repetition_signals`` (dup-line / top-2-gram): these are the hard
    document-level accept/reject rules a pretraining pipeline runs first:

    - word count in [50, 100000]
    - mean word length in [3, 10] (whitespace words, punctuation kept)
    - symbol-to-word ratio ('#' or '...') <= 0.1
    - <= 90% of lines starting with a bullet, <= 30% ending in ellipsis
    - >= 80% of words contain an alphabetic character
    - >= 2 of GOPHER_REQUIRED_STOPWORDS present
    """
    sig = gopher_signals(text_col)
    return df.select(
        F.col(id_col),
        sig["n_words"].cast("long").alias("n_words"),
        F.round(sig["mean_word_len"], 4).alias("mean_word_len"),
        F.round(sig["symbol_word_ratio"], 4).alias("symbol_word_ratio"),
        F.round(sig["bullet_line_frac"], 4).alias("bullet_line_frac"),
        F.round(sig["ellipsis_line_frac"], 4).alias("ellipsis_line_frac"),
        F.round(sig["alpha_word_frac"], 4).alias("alpha_word_frac"),
        sig["stop_hits"].cast("long").alias("stop_hits"),
        sig["gopher_pass"].alias("gopher_pass"),
    )


def gopher_signals(text_col: str | Column = "text") -> dict[str, Column]:
    """The raw (unrounded) Gopher signal/pass expressions, for composing
    into larger single-plan pipelines (see ``gopher_rules`` for the
    per-query projection)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    c = F.coalesce(c, F.lit(""))  # NULL text = empty doc, both engines
    words = F.filter(F.split(c, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    nw = n_words.cast("double")
    mean_len = F.when(
        n_words > 0, F.length(F.regexp_replace(c, r"\s", "")) / nw
    ).otherwise(F.lit(0.0))
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ellipsis = F.size(F.regexp_extract_all(c, F.lit(r"\.\.\.|…"), F.lit(0)))
    symbol_ratio = F.when(n_words > 0, (n_hash + n_ellipsis) / nw).otherwise(
        F.lit(0.0)
    )
    lines = F.filter(F.split(c, "\n"), lambda l: l != "")
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
        / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$")))
        / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / nw,
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(tokens(text_col)),
            F.array(*[F.lit(w) for w in GOPHER_REQUIRED_STOPWORDS]),
        )
    )
    gopher_pass = (
        (n_words >= 50)
        & (n_words <= 100_000)
        & (mean_len >= 3)
        & (mean_len <= 10)
        & (symbol_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
        & (alpha_frac >= 0.8)
        & (stop_hits >= 2)
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_len,
        "symbol_word_ratio": symbol_ratio,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "alpha_word_frac": alpha_frac,
        "stop_hits": stop_hits,
        "gopher_pass": gopher_pass,
    }


def gopher_rules_sql(c: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB equivalent of ``gopher_rules`` over ``documents``."""
    c = f"coalesce({c}, '')"  # NULL text = empty doc, like gopher_signals
    wl = "[" + ",".join(f"'{w}'" for w in GOPHER_REQUIRED_STOPWORDS) + "]"
    toks = TOKENS_SQL.format(c=c)
    return f"""
WITH feats AS (
  SELECT {id_col},
    len(list_filter(string_split_regex({c}, '\\s+'), w -> w <> '')) AS n_words,
    len(list_filter(string_split_regex({c}, '\\n'), l -> l <> '')) AS n_lines,
    length(regexp_replace({c}, '\\s', '', 'g')) AS n_nonspace,
    length({c}) - length(replace({c}, '#', '')) AS n_hash,
    len(regexp_extract_all({c}, '\\.\\.\\.|…')) AS n_ellipsis,
    len(list_filter(string_split_regex({c}, '\\n'),
        l -> l <> '' AND regexp_matches(l, '^\\s*[-*•]'))) AS n_bullet_lines,
    len(list_filter(string_split_regex({c}, '\\n'),
        l -> l <> '' AND regexp_matches(l, '(\\.\\.\\.|…)\\s*$'))) AS n_ellipsis_lines,
    len(list_filter(string_split_regex({c}, '\\s+'),
        w -> w <> '' AND regexp_matches(w, '[A-Za-z]'))) AS n_alpha_words,
    len(list_intersect(list_distinct({toks}), {wl})) AS stop_hits
  FROM documents),
ratios AS (
  SELECT {id_col}, n_words, stop_hits,
    CASE WHEN n_words > 0 THEN n_nonspace / CAST(n_words AS DOUBLE) ELSE 0.0 END AS mean_word_len,
    CASE WHEN n_words > 0 THEN (n_hash + n_ellipsis) / CAST(n_words AS DOUBLE) ELSE 0.0 END AS symbol_word_ratio,
    CASE WHEN n_lines > 0 THEN n_bullet_lines / CAST(n_lines AS DOUBLE) ELSE 0.0 END AS bullet_line_frac,
    CASE WHEN n_lines > 0 THEN n_ellipsis_lines / CAST(n_lines AS DOUBLE) ELSE 0.0 END AS ellipsis_line_frac,
    CASE WHEN n_words > 0 THEN n_alpha_words / CAST(n_words AS DOUBLE) ELSE 0.0 END AS alpha_word_frac
  FROM feats)
SELECT {id_col}, CAST(n_words AS BIGINT) AS n_words,
  round(mean_word_len, 4) AS mean_word_len,
  round(symbol_word_ratio, 4) AS symbol_word_ratio,
  round(bullet_line_frac, 4) AS bullet_line_frac,
  round(ellipsis_line_frac, 4) AS ellipsis_line_frac,
  round(alpha_word_frac, 4) AS alpha_word_frac,
  CAST(stop_hits AS BIGINT) AS stop_hits,
  (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3 AND 10)
    AND symbol_word_ratio <= 0.1 AND bullet_line_frac <= 0.9
    AND ellipsis_line_frac <= 0.3 AND alpha_word_frac >= 0.8
    AND stop_hits >= 2 AS gopher_pass
FROM ratios"""


def oov_rate(
    df: DataFrame,
    vocab_k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc out-of-vocabulary rate against the corpus top-``vocab_k``
    vocabulary — the tokenizer-fit audit (a doc full of tokens the
    tokenizer's vocabulary head never saw trains badly and costs more
    pieces per word).

    The vocabulary is one map-side-combined aggregate collapsed to
    ``vocab_k`` rows and inlined as an array literal (the k-means
    centroid seam) — the per-doc pass is then a pure column expression:
    no join, no second shuffle touching the corpus.
    """
    vocab_rows = token_frequencies(df, text_col=text_col, k=vocab_k).collect()
    vocab = F.array(*[F.lit(r["token"]) for r in vocab_rows])
    toks = tokens(text_col)
    n = F.size(toks)
    n_oov = F.size(F.filter(toks, lambda t: ~F.array_contains(vocab, t)))
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        n_oov.cast("long").alias("n_oov"),
        F.round(
            F.when(n > 0, n_oov / n.cast("double")).otherwise(F.lit(0.0)), 4
        ).alias("oov_rate"),
    )


def oov_rate_sql(
    vocab_k: int = 100, c: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB equivalent of :func:`oov_rate` over ``documents``."""
    toks = TOKENS_SQL.format(c=c)
    return f"""
WITH ex AS (SELECT unnest({toks}) AS token FROM documents),
freq AS (
  SELECT token, count(*) AS n FROM ex GROUP BY 1
  ORDER BY n DESC, token LIMIT {vocab_k}),
v AS (SELECT list(token) AS vl FROM freq),
per AS (
  SELECT {id_col}, {toks} AS ts FROM documents)
SELECT {id_col}, CAST(len(ts) AS BIGINT) AS n_tokens,
  CAST(len(list_filter(ts, t -> NOT list_contains(v.vl, t))) AS BIGINT) AS n_oov,
  round(CASE WHEN len(ts) > 0
    THEN len(list_filter(ts, t -> NOT list_contains(v.vl, t))) / CAST(len(ts) AS DOUBLE)
    ELSE 0.0 END, 4) AS oov_rate
FROM per CROSS JOIN v"""


# URL query params that identify tracking, not content (web-corpus dedup
# convention); kept as a regex alternation usable by both engines
_TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)="


def canonical_url(url_col: str | Column = "url") -> Column:
    """Canonicalize a URL for web-corpus dedup: lowercase scheme/host,
    strip ``www.`` and default ports, drop the fragment and tracking
    params (utm_*, gclid, fbclid, ref), sort remaining query params,
    normalize the trailing slash. Pure column expressions.

    Crawled corpora cite the same page under many spellings; URL-level
    dedup collapses them before any content pass runs (cheaper than
    hashing bodies, and catches pages whose body changed between crawls).
    """
    raw = F.col(url_col) if isinstance(url_col, str) else url_col
    u = F.regexp_replace(raw, "#.*$", "")  # fragment first: '#sec?x' is no query
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host0 = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host1 = F.regexp_replace(host0, r"^www\.", "")
    host = F.when(scheme == "http", F.regexp_replace(host1, r":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(host1, r":443$", "")).otherwise(host1)
    )
    path0 = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path1 = F.when(path0 == "", F.lit("/")).otherwise(path0)
    path = F.when(
        (path1 != "/") & path1.endswith("/"),
        F.regexp_replace(path1, r"/$", ""),
    ).otherwise(path1)
    q0 = F.regexp_extract(u, r"\?(.*)$", 1)
    q_parts = F.array_sort(
        F.filter(
            F.split(q0, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
        )
    )
    q = F.concat_ws("&", q_parts)
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    # Degenerate guard: relative / mailto / protocol-less URLs have no
    # '<scheme>://<host>' match, so scheme/host extract as '' and EVERY
    # such URL would collapse to the same '://'-prefixed canonical value
    # — fatal when this feeds a dedup key (unrelated docs merged and
    # dropped). Pass those through unchanged instead.
    return F.when(host0 == "", raw).otherwise(canon)


def canonical_url_sql(c: str = "url") -> str:
    """DuckDB rendering of :func:`canonical_url` (keep in lock-step)."""
    raw = c
    c = f"regexp_replace({c}, '#.*$', '')"  # fragment first, as in Spark
    scheme = f"lower(regexp_extract({c}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    host1 = (
        f"regexp_replace(lower(regexp_extract({c}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)), '^www\\.', '')"
    )
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({host1}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({host1}, ':443$', '') "
        f"ELSE {host1} END"
    )
    path1 = (
        f"CASE WHEN regexp_extract({c}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) = '' THEN '/' "
        f"ELSE regexp_extract({c}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) END"
    )
    path = (
        f"CASE WHEN {path1} <> '/' AND {path1} LIKE '%/' "
        f"THEN regexp_replace({path1}, '/$', '') ELSE {path1} END"
    )
    q = (
        f"array_to_string(list_sort(list_filter("
        f"string_split(regexp_extract({c}, '\\?(.*)$', 1), '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{_TRACKING_PARAM_RE}'))), '&')"
    )
    host0 = f"lower(regexp_extract({c}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))"
    # degenerate-URL passthrough: see canonical_url
    return (
        f"CASE WHEN {host0} = '' THEN {raw} ELSE "
        f"{scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {q} <> '' THEN '?' || {q} ELSE '' END END"
    )


# Unicode punctuation folded to ASCII before hashing/dedup — each pair is
# (regex class, replacement). Classes use real code points (via \u
# escapes) so Java regex and DuckDB RE2 read them identically; the
# control-char class uses \x escapes, which both engines support.
_NORMALIZE_STEPS: list[tuple[str, str]] = [
    ("[\u2018\u2019\u201a\u201b]", "'"),        # curly single quotes
    ("[\u201c\u201d\u201e\u201f]", '"'),        # curly double quotes
    ("[\u2010\u2011\u2012\u2013\u2014\u2015]", "-"),  # dashes
    ("\u2026", "..."),                             # ellipsis
    ("[\u00a0\u2000-\u200a\u202f\u205f\u3000]", " "),  # exotic spaces
    ("[\u200b\u200c\u200d\ufeff]", ""),         # zero-width
    ("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", ""),  # control (keep tab/lf/cr)
]


def normalize_text(text_col: str | Column = "text") -> Column:
    """Normalization pre-pass before hashing/dedup: fold curly quotes /
    dashes / ellipsis to ASCII, map exotic Unicode spaces to plain
    space, strip zero-width and control characters, collapse whitespace
    runs, trim. Chained regexp_replace — JVM-side, no Python. NULL text
    normalizes to '' (not NULL) so content hashes of NULL docs group
    consistently in both engines."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    c = F.coalesce(c, F.lit(""))
    for pat, rep in _NORMALIZE_STEPS:
        c = F.regexp_replace(c, pat, rep)
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def normalize_text_sql(c: str = "text") -> str:
    """DuckDB rendering of :func:`normalize_text` (keep in lock-step)."""
    expr = f"coalesce({c}, '')"
    for pat, rep in _NORMALIZE_STEPS:
        rep_sql = rep.replace("'", "''")
        pat_sql = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat_sql}', '{rep_sql}', 'g')"
    expr = f"regexp_replace({expr}, '\\s+', ' ', 'g')"
    return f"trim({expr})"


# ---------------------------------------------------------------- linear classifier scoring

_CLF_DIM = 1024  # hashed feature space (fasttext-bucket analogue)


def _clf_weights(dim: int = _CLF_DIM) -> list[float]:
    """Deterministic synthetic weight vector (Knuth-hash formula, rounded
    to 6dp so both engines inline the identical literals). A real
    pipeline loads trained weights; the Spark-side plumbing is the
    point here."""
    out = []
    for j in range(dim):
        h = (j * 2654435761) % (1 << 32)
        out.append(round(h / float(1 << 31) - 1.0, 6))
    return out


def clf_bucket(t: Column, dim: int = _CLF_DIM) -> Column:
    """md5-hex-prefix -> weight bucket — THE feature-hashing contract
    shared by the serving expression below, the SQL oracle rendering,
    and the MLlib training featurizer (operators/classifier.py). One
    definition; changing it retrains and re-serves together."""
    return F.pmod(
        F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"), F.lit(dim)
    )


def classifier_score(
    df: DataFrame,
    weights: list[float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Linear bag-of-hashed-words quality score (the fasttext-classifier
    filtering stage of GPT-3/LLaMA-style pipelines) as pure column
    expressions: each token indexes the weight vector via an md5-derived
    bucket, scores sum per doc, and a logistic squash yields p(keep).

    The weight vector inlines as an array literal (model broadcast by
    plan, not by join); scoring is corpus-linear with ZERO shuffles.
    md5-bucket hashing (not xxhash64) keeps the oracle engine-exact.
    """
    w = weights if weights is not None else _clf_weights()
    # r12: ONE rendered array literal (repr-shortest D-suffixed doubles,
    # bit-identical parse) instead of dim py4j F.lit nodes — the
    # retrieval wide-plan driver-time finding applied to the serving
    # expression (dim=256 default)
    warr = F.expr(
        "array(" + ", ".join(repr(float(x)) + "D" for x in w) + ")"
    )
    d = len(w)
    toks = tokens(text_col)
    # md5 hex prefix -> bucket: identical arithmetic in DuckDB
    idx = lambda t: clf_bucket(t, d)  # noqa: E731
    score = F.aggregate(
        F.transform(toks, lambda t: F.element_at(warr, (idx(t) + 1).cast("int"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    n = F.size(toks)
    mean_score = F.when(n > 0, score / n.cast("double")).otherwise(F.lit(0.0))
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-mean_score * 4))
    # stable_round on BOTH engines (model.ROUND_NUDGE rationale): the
    # fold-sum association, libm-vs-JVM exp(), and DuckDB's round() impl
    # each drift enough to flip a 6-decimal boundary at sf0.1 (r7 find)
    from ..model import stable_round

    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        stable_round(mean_score, 6).alias("mean_score"),
        stable_round(p, 6).alias("p_keep"),
    )


def classifier_score_sql(
    weights: list[float] | None = None, c: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB equivalent of :func:`classifier_score` over ``documents``."""
    w = weights if weights is not None else _clf_weights()
    wl = "[" + ",".join(repr(x) for x in w) + "]"
    d = len(w)
    toks = TOKENS_SQL.format(c=c)
    idx = (
        f"CAST(from_hex(substr(md5(t), 1, 8)) AS BIT)::UINTEGER % {d}"
    )
    return f"""
WITH per AS (
  SELECT {id_col}, {toks} AS ts, {wl}::DOUBLE[] AS w FROM documents),
scored AS (
  SELECT {id_col}, len(ts) AS n,
    list_sum(list_transform(ts, t -> w[({idx}) + 1])) AS s
  FROM per)
SELECT {id_col}, CAST(n AS BIGINT) AS n_tokens,
  round((CASE WHEN n > 0 THEN s / CAST(n AS DOUBLE) ELSE 0.0 END) + 1e-9, 6) AS mean_score,
  round(1.0 / (1.0 + exp(-(CASE WHEN n > 0 THEN s / CAST(n AS DOUBLE) ELSE 0.0 END) * 4)) + 1e-9, 6) AS p_keep
FROM scored"""


# ------------------------- intra-doc repeated-line removal ---------------

def dedup_lines(text_col: str | Column = "text") -> dict[str, Column]:
    """Remove REPEATED lines within each document, keeping the first
    occurrence in order — the RefinedWeb/FineWeb intra-doc cleaning step
    that strips per-page boilerplate (repeated nav/footer lines) without
    touching cross-document state.

    Pure column expressions, zero shuffles: ``array_distinct`` preserves
    first-occurrence order in Spark (mirrored in SQL by a min-index
    group + ordered string_agg). Returns {cleaned, n_lines, n_removed}.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    arr = F.split(F.coalesce(c, F.lit("")), "\n")
    kept = F.array_distinct(arr)
    return {
        "cleaned": F.concat_ws("\n", kept),
        "n_lines": F.size(arr).cast("long"),
        "n_removed": (F.size(arr) - F.size(kept)).cast("long"),
    }



# ------------------------- C4-style hard filters -------------------------

# Raffel et al. 2020 §2.2 (the C4 cleaning heuristics), restricted to the
# document-level rules (line-level retention is dedup_lines' job):
#   - keep only lines ending in terminal punctuation, then require >= 3
#     retained lines ("sentences")
#   - drop docs containing 'lorem ipsum' or the word 'javascript'
#     (boilerplate / script-warning pages)
#   - drop docs containing '{' (code leakage into prose corpora)
#   - retained-line floor of 5 words
_C4_TERMINAL = (".", "!", "?", '"', "'")


def c4_signals(text_col: str | Column = "text") -> dict[str, Column]:
    c = F.coalesce(
        F.col(text_col) if isinstance(text_col, str) else text_col, F.lit("")
    )
    lines = F.split(c, "\n")
    # rstrip ALL whitespace (CRLF corpora leave \r on every line; trim()
    # strips spaces only) before the terminal-punctuation check
    rstripped = lambda l: F.regexp_replace(l, r"\s+$", "")  # noqa: E731
    terminal = lambda l: (  # noqa: E731
        F.substring(rstripped(l), -1, 1).isin(*_C4_TERMINAL)
    )
    # empty tokens excluded: a leading tab would otherwise inflate the
    # count by one (the same w != '' guard gopher_signals uses)
    wordy = lambda l: (  # noqa: E731
        F.size(F.filter(F.split(F.trim(l), r"\s+"), lambda w: w != "")) >= 5
    )
    kept = F.filter(lines, lambda l: terminal(l) & wordy(l))
    lower = F.lower(c)
    sig = {
        "n_lines": F.size(lines),
        "n_sentence_lines": F.size(kept),
        "has_lorem": lower.contains("lorem ipsum"),
        "has_javascript": lower.rlike("(^|[^a-z])javascript([^a-z]|$)"),
        "has_brace": c.contains("{"),
    }
    sig["c4_pass"] = (
        (sig["n_sentence_lines"] >= 3)
        & ~sig["has_lorem"]
        & ~sig["has_javascript"]
        & ~sig["has_brace"]
    )
    return sig


def c4_rules(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4 hard accept/reject signals + pass flag (Raffel et al. 2020
    §2.2, document-level subset). Pure Column expressions — no shuffle
    at any corpus size; the natural sibling of :func:`gopher_rules`
    (C4 screens form, Gopher screens statistics)."""
    sig = c4_signals(text_col)
    return df.select(
        F.col(id_col),
        sig["n_lines"].cast("long").alias("n_lines"),
        sig["n_sentence_lines"].cast("long").alias("n_sentence_lines"),
        sig["has_lorem"].alias("has_lorem"),
        sig["has_javascript"].alias("has_javascript"),
        sig["has_brace"].alias("has_brace"),
        sig["c4_pass"].alias("c4_pass"),
    )


def c4_rules_sql(c: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB mirror of :func:`c4_rules` (kept in lockstep — the parity
    test runs both engines over the same rows)."""
    cc = f"coalesce({c}, '')"
    lines = f"string_split({cc}, chr(10))"
    kept = (
        f"list_filter({lines}, l -> "
        "list_contains(['.', '!', '?', '\"', ''''], "
        "right(regexp_replace(l, '\\s+$', ''), 1)) "
        "AND len(list_filter(regexp_split_to_array(trim(l), '\\s+'), "
        "w -> w <> '')) >= 5)"
    )
    return f"""
SELECT {id_col},
       CAST(len({lines}) AS BIGINT) AS n_lines,
       CAST(len({kept}) AS BIGINT) AS n_sentence_lines,
       contains(lower({cc}), 'lorem ipsum') AS has_lorem,
       regexp_matches(lower({cc}), '(^|[^a-z])javascript([^a-z]|$)') AS has_javascript,
       contains({cc}, '{{') AS has_brace,
       len({kept}) >= 3
         AND NOT contains(lower({cc}), 'lorem ipsum')
         AND NOT regexp_matches(lower({cc}), '(^|[^a-z])javascript([^a-z]|$)')
         AND NOT contains({cc}, '{{') AS c4_pass
FROM documents"""


def corpus_line_dedup(
    df: DataFrame,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet/RefinedWeb-style CORPUS-level line dedup: strip every line
    that appears in >= ``min_docs`` DISTINCT documents — the classic
    cross-document boilerplate remover (cookie banners, nav bars,
    license footers), complementing :func:`dedup_lines`' intra-doc
    pass. Empty lines are counted like any line (a blank line shared
    by the whole corpus is boilerplate too).

    Scale shape: one posexplode; the frequency aggregate shuffles a
    PAIR of independent xxhash64 ints (128 bits of line identity —
    a 64-bit key alone hits birthday collisions around 2^32 distinct
    lines, i.e. within a 100 TB corpus, and a collision falsely strips
    a unique line; at 128 bits the expected collision count stays
    << 1 out to ~2^64 distinct lines, far beyond any real corpus —
    that residual tolerance is the operator's contract), and its keep
    decisions come back keyed by (id, pos) — so line TEXT crosses two
    shuffles (the decision join and the doc-keyed rebuild), but both
    are keyed by well-spread (id, pos)/id, never by the line hash:
    joining decisions onto the text rows by hash directly would
    hot-key the textful exchange on exactly the corpus-wide
    boilerplate lines this operator exists to find. Rebuild is
    order-exact: array_sort on (pos, line) structs, then a newline
    join. Docs whose every line was stripped survive with empty text
    (LEFT join restore).

    Output: (id, text cleaned, n_kept, n_stripped)."""
    # r12: pinned — the frequency aggregate, the decision join's probe
    # side and the rebuild join each consumed this exploded relation,
    # re-running the split/posexplode corpus pass three times; one
    # eager checkpoint (line rows + their two hashes) runs it once.
    ln = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "__pos", "__line"
        ),
    ).withColumn("__h", F.xxhash64("__line")).withColumn(
        # second independent 64-bit hash (seeded by an extra column) —
        # together 128 bits of line identity, see scale-shape note
        "__h2",
        F.xxhash64("__line", F.lit(1)),
    ).localCheckpoint(eager=True)
    freq = ln.groupBy("__h", "__h2").agg(
        F.countDistinct(id_col).alias("__nd")
    )
    dec = (
        ln.select(id_col, "__pos", "__h", "__h2")
        .join(freq, ["__h", "__h2"])
        .select(id_col, "__pos", (F.col("__nd") < min_docs).alias("__keep"))
    )
    kept = (
        ln.join(dec, [id_col, "__pos"])
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__keep"),
                                F.struct(F.col("__pos"), F.col("__line")),
                            )
                        )
                    ),
                    lambda s: s.getField("__line"),
                ),
                "\n",
            ).alias("__text"),
            F.sum(F.when(F.col("__keep"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("__keep"), 0).otherwise(1)).alias(
                "n_stripped"
            ),
        )
    )
    return df.select(F.col(id_col)).join(kept, id_col, "left").select(
        F.col(id_col),
        F.coalesce("__text", F.lit("")).alias(text_col),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("n_stripped", F.lit(0)).cast("long").alias("n_stripped"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAG-prep chunking: split each document into fixed-token windows
    with overlap — (id, chunk_idx, chunk_text, n_tokens), chunk_idx
    0-based, window i covering tokens [i*stride, i*stride+chunk_tokens).
    ``stride < chunk_tokens`` overlaps consecutive chunks (the usual
    retrieval-context recipe); the last window may be shorter; the
    chunk count is 1 + ceil(max(n - chunk_tokens, 0) / stride), so
    every token is covered and a no-tail doc emits exactly one chunk.
    Zero-token docs emit no row (there is nothing to retrieve).

    Pure Column expressions — ONE tokenize, a sequence + transform to
    build windows, one posexplode. The shuffle-free per-doc shape stays
    in codegen; at 100 TB chunking is a map-only pass."""
    if not 1 <= stride <= chunk_tokens:
        raise ValueError(
            f"need 1 <= stride <= chunk_tokens, got {stride}/{chunk_tokens}"
        )
    toks = tokens(text_col)
    n = F.size(toks)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - F.lit(chunk_tokens), F.lit(0))
        / F.lit(float(stride))
    ).cast("int")
    windows = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(toks, i * stride + 1, chunk_tokens), " "
        ),
    )
    ex = df.filter(n > 0).select(
        F.col(id_col),
        F.posexplode(windows).alias("chunk_idx", "chunk_text"),
    )
    return ex.select(
        id_col,
        "chunk_idx",
        "chunk_text",
        F.size(F.split("chunk_text", " ")).cast("long").alias("n_tokens"),
    )


def vocab_coverage(
    df: DataFrame,
    vocab_sizes: list[int] = (256, 1024, 4096, 16384, 65536),
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer-budgeting primitive:
    for each candidate vocab size V, the fraction of ALL token
    occurrences covered by the top-V most frequent tokens (its
    complement is the OOV rate a V-entry vocabulary would pay).
    Output: (vocab_size, n_types, total_tokens, covered_frac), one row
    per requested V, covered_frac rounded to 4 dp.

    Scale shape: the only corpus-sized shuffle is the (token-hash ->
    count) aggregate (128-bit hash pair, ints, map-side combinable).
    Coverage then needs only the COUNT-OF-COUNTS frame — (frequency f,
    number of token types with frequency f), at most a few thousand
    rows at any corpus size — so the global ordering/cumsum that looks
    like a single-partition sort runs on a frame the size of the
    distinct-frequency set, never the vocabulary. Tie handling is
    exact by construction: types tied at the V boundary all carry the
    same frequency, so top-V occurrence mass is invariant to which of
    them a real tokenizer would pick. A V past the full vocabulary
    covers everything (covered_frac = 1.0)."""
    from pyspark.sql import Window

    sizes = sorted(set(int(v) for v in vocab_sizes))
    if not sizes or sizes[0] <= 0:
        raise ValueError(f"vocab_sizes must be positive: {vocab_sizes}")
    counts = (
        df.select(F.explode(tokens(text_col)).alias("__t"))
        .groupBy(
            F.xxhash64("__t").alias("__h1"),
            F.xxhash64("__t", F.lit(1)).alias("__h2"),
        )
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    cc = counts.groupBy("__cnt").agg(F.count(F.lit(1)).alias("__ntok"))
    w = (
        Window.orderBy(F.col("__cnt").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cc.select(
        "__cnt",
        "__ntok",
        F.sum("__ntok").over(w).alias("__cum_types"),
        F.sum(F.col("__ntok") * F.col("__cnt")).over(w).alias("__cum_occ"),
    )
    ladder = df.sparkSession.createDataFrame(
        [(v,) for v in sizes], "vocab_size int"
    )
    # boundary row per V: the first frequency tier whose cumulative
    # type count reaches V (none when V >= total types -> full cover)
    j = ladder.join(
        F.broadcast(cum),
        F.col("__cum_types") >= F.col("vocab_size"),
        "left",
    )
    per_v = j.groupBy("vocab_size").agg(
        F.min_by(
            F.struct("__cnt", "__ntok", "__cum_types", "__cum_occ"),
            F.col("__cum_types"),
        ).alias("b")
    )
    totals = cum.orderBy(F.col("__cum_types").desc()).limit(1).select(
        F.col("__cum_types").alias("__n_types"),
        F.col("__cum_occ").alias("__total"),
    )
    b = F.col("b")
    covered = F.when(b.isNull(), F.col("__total")).otherwise(
        b["__cum_occ"]
        - (b["__cum_types"] - F.col("vocab_size")) * b["__cnt"]
    )
    return (
        per_v.crossJoin(F.broadcast(totals))
        .select(
            F.col("vocab_size").cast("long").alias("vocab_size"),
            F.col("__n_types").cast("long").alias("n_types"),
            F.col("__total").cast("long").alias("total_tokens"),
            F.round(
                covered.cast("double") / F.col("__total") + F.lit(1e-9), 4
            ).alias("covered_frac"),
        )
    )


def vocab_coverage_sql(
    vocab_sizes: list[int] = (256, 1024, 4096, 16384, 65536),
    table: str = "documents",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`vocab_coverage` (token text instead of the
    128-bit hash pair — identical counts up to the documented collision
    tolerance)."""
    sizes = sorted(set(int(v) for v in vocab_sizes))
    toks = TOKENS_SQL.format(c=text_col)
    ladder = ", ".join(f"({v})" for v in sizes)
    return f"""
WITH occ AS (SELECT unnest({toks}) AS t FROM {table}),
counts AS (SELECT t, count(*) AS cnt FROM occ GROUP BY 1),
cc AS (SELECT cnt, count(*) AS ntok FROM counts GROUP BY 1),
cum AS (SELECT cnt, ntok,
               sum(ntok) OVER (ORDER BY cnt DESC) AS cum_types,
               sum(ntok * cnt) OVER (ORDER BY cnt DESC) AS cum_occ
        FROM cc),
tot AS (SELECT max(cum_types) AS n_types, max(cum_occ) AS total FROM cum),
ladder(vocab_size) AS (VALUES {ladder}),
b AS (SELECT vocab_size, min_by(cum, cum.cum_types) AS b
      FROM ladder LEFT JOIN cum ON cum.cum_types >= vocab_size
      GROUP BY 1)
SELECT CAST(vocab_size AS BIGINT) AS vocab_size,
       CAST(tot.n_types AS BIGINT) AS n_types,
       CAST(tot.total AS BIGINT) AS total_tokens,
       round(CAST(CASE WHEN b.b IS NULL THEN tot.total
                       ELSE b.b.cum_occ
                            - (b.b.cum_types - vocab_size) * b.b.cnt
                  END AS DOUBLE) / tot.total + 1e-9, 4) AS covered_frac
FROM b CROSS JOIN tot"""
