"""Deduplication operators for large-scale document corpora.

Beyond the reference's surface (BASELINE.json extension set): exact,
MinHash+LSH, SimHash, and n-gram-Jaccard dedup, each expressed as
DataFrame plans that shuffle on small derived keys (hashes, band buckets)
rather than document text — the property that keeps them viable at 100 TB.

Determinism: every hash is Spark's ``xxhash64``/``md5`` with fixed seeds
baked into column literals, so results are stable across runs/partitions.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------- exact


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id document per exact text hash.

    One shuffle on a 128-bit md5 — never on the text itself. min() not
    first() so the survivor is deterministic.
    """
    h = F.md5(F.col(text_col))
    return (
        df.withColumn("__h", h)
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("__h")
    )


def dup_groups_by_hash(
    df: DataFrame, hash_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Duplicate head set over a precomputed content-hash column:
    (hash_col, keep_id, dup_count) for groups with >1 member. The
    single source of min-id keeper selection — exact_dedup's groupBy,
    the curation pipeline, and the CLI all derive from it."""
    return (
        df.groupBy(hash_col)
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups with >1 member: (content_hash, keep_id, dup_count)."""
    hashed = df.withColumn("content_hash", F.md5(F.col(text_col)))
    return dup_groups_by_hash(hashed, "content_hash", id_col)


# ---------------------------------------------------------------- shingles / tokens


def _tokens(text_col: str):
    """THE one tokenizer contract, shared with text.tokens and mirrored
    by text.TOKENS_SQL (`[^a-z0-9']+` split: keeps apostrophes, splits
    underscores). An earlier private `\\W+` split diverged from every
    DuckDB oracle on text containing ' or _ (ADVICE r5: "don't" produced
    different shingles Spark-side vs oracle-side — green only because the
    synthetic corpus had neither character)."""
    from .text import tokens

    return tokens(text_col)


def _shingles(text_col: str, n: int):
    """word n-gram shingles as strings."""
    toks = _tokens(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.when(F.size(toks) >= n, F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )).otherwise(F.array(F.concat_ws(" ", toks)))


# odd multiplier => the per-position combine h*P + next is injective on
# 64-bit longs for fixed shingle width
_SHINGLE_P = 0x100000001B3  # FNV-ish odd prime


def _shingle_hashes(text_col: str, n: int):
    """Distinct word-n-gram shingle hashes as ``array<long>``.

    Hash arithmetic instead of string materialization: each token is
    xxhash64'd ONCE, and a shingle's hash folds the n token hashes with a
    multiply-add. The naive form (`concat_ws` of a `slice` per position,
    then xxhash64) allocates an n-token string per shingle inside an
    interpreted lambda — 3x slower end-to-end at sf0.1. Downstream ops
    (Jaccard, MinHash) only need an injective shingle->long mapping, not
    any particular string hash.

    Keeps ``_shingles``'s short-doc fallback: < n tokens => one shingle
    covering the whole doc.
    """
    toks = _tokens(text_col)
    m = F.size(toks) - (n - 1)  # shingle count
    # n aligned slices of the token array (string slices are pointer
    # copies), combined pairwise — each token is hashed once per zip pass,
    # never indexed via element_at (which would re-evaluate the whole
    # upstream array per element: O(L^2))
    sh = F.transform(F.slice(toks, 1, m), lambda t: F.xxhash64(t))
    for j in range(1, n):
        sh = F.zip_with(
            sh,
            F.slice(toks, j + 1, m),
            lambda acc, t: acc * F.lit(_SHINGLE_P) + F.xxhash64(t),
        )
    whole = F.aggregate(
        F.transform(toks, lambda t: F.xxhash64(t)),
        F.lit(0).cast("long"),
        lambda acc, v: acc * F.lit(_SHINGLE_P) + v,
    )
    return F.when(F.size(toks) >= n, F.array_distinct(sh)).otherwise(F.array(whole))


# ---------------------------------------------------------------- MinHash + LSH

# multiply-add constants for the i-th "permutation": h -> h*a_i + b_i
# (mod 2^64 via native long overflow). Odd multipliers => bijection, so
# taking the min under any fixed total order is a valid MinHash.
_MH_MULT = 0x9E3779B97F4A7C15  # golden-ratio mix
_MH_SALT = 0xC2B2AE3D27D4EB4F


def _perm_consts(i: int) -> tuple[int, int]:
    a = ((_MH_MULT * (i + 1)) | 1) & 0xFFFFFFFFFFFFFFFF
    b = (_MH_SALT * (i + 13)) & 0xFFFFFFFFFFFFFFFF

    def signed(x: int) -> int:
        return x - (1 << 64) if x >= (1 << 63) else x

    return signed(a), signed(b)


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, signature: array<bigint>) — one min-hash per permutation.

    Shape chosen for scale: hash each shingle ONCE (xxhash64), explode to
    (id, h) rows, then one hash-aggregate computing all ``num_hashes``
    mins as flat columns (pure codegen; partial aggregation makes the
    shuffle O(docs), not O(docs x shingles)). The naive
    nested-higher-order-function formulation falls out of whole-stage
    codegen and is ~100x slower.
    """
    sh = df.select(
        F.col(id_col), _shingle_hashes(text_col, shingle_n).alias("sh")
    )
    return minhash_signature_from_shingles(sh, id_col, num_hashes)


def minhash_signature_from_shingles(
    sh_df: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    sh_col: str = "sh",
) -> DataFrame:
    """:func:`minhash_signature` over a PRECOMPUTED (id, shingle-hash
    array) relation (r12): the signature is a pure function of the
    distinct shingle hashes, so a caller that already holds them — the
    persistent ``MinHashIndex``, whose shingles table is saved anyway
    for the verify join — derives the banding relation WITHOUT paying
    the tokenize/shingle pass a second time. Values are identical to
    the text-side entry point (the explode sees the same array)."""
    exploded = sh_df.select(F.col(id_col), F.explode(sh_col).alias("__h"))
    # r12: rendered SQL aggregates (one F.expr each) — the per-node
    # Column form costs driver construction time per call (the
    # retrieval wide-plan finding); L-suffixed BIGINT literals keep the
    # long*long wrap-around arithmetic identical
    aggs = []
    for i in range(num_hashes):
        a, b = _perm_consts(i)
        aggs.append(
            F.expr(f"min(__h * {a}L + {b}L)").alias(f"__s{i}")
        )
    wide = exploded.groupBy(id_col).agg(*aggs)
    return wide.select(
        F.col(id_col),
        F.expr(
            "array(" + ", ".join(f"__s{i}" for i in range(num_hashes)) + ")"
        ).alias("signature"),
    )


def minhash_bands(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """The LSH banding relation: (id, band, bucket) — one row per band,
    bucket = xxhash64 of that band's signature slice. This is THE
    banding contract: both the in-session candidate join
    (:func:`minhash_lsh_candidates`) and the persistent index
    (``ann_index.MinHashIndex``) build on this exact relation, so a
    saved bands table collides with a fresh batch's bands iff the
    one-session self-join would have — the restored-index identity is
    structural, not re-derived."""
    sigs = minhash_signature(df, text_col, id_col, num_hashes, shingle_n)
    return _bands_from_signature(sigs, id_col, num_hashes, bands)


def minhash_bands_from_shingles(
    sh_df: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    sh_col: str = "sh",
) -> DataFrame:
    """:func:`minhash_bands` over a precomputed shingle-hash relation
    (r12) — same (id, band, bucket) contract, one less corpus text
    pass for callers that persist their shingles anyway."""
    sigs = minhash_signature_from_shingles(sh_df, id_col, num_hashes, sh_col)
    return _bands_from_signature(sigs, id_col, num_hashes, bands)


def _bands_from_signature(
    sigs: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    rows = num_hashes // bands
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    return sigs.select(
        F.col(id_col),
        F.explode(
            F.transform(
                band_idx,
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.slice("signature", b * rows + 1, rows))
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidate pairs: docs sharing >=1 band bucket. Output
    (id_a, id_b) with id_a < id_b, distinct.

    Plan: signature -> explode to (band, band_hash) -> self-join on the
    bucket. The join key is (band, 64-bit hash): tiny rows, and the
    quadratic blow-up is bounded per-bucket (near-dup buckets stay small
    for reasonable thresholds). The banded relation is one shuffle output
    reused on both sides of the self-join (exchange reuse).
    """
    # r12: pin the banded relation — exchange reuse shared it between
    # the self-join's sides only when BOTH sides actually shuffle; under
    # AQE's broadcast conversion (any sub-threshold corpus slice) the
    # broadcast side re-ran the whole tokenize/shingle/sign pipeline.
    # The pinned rows are (id, band, 64-bit bucket) — ~24 B/row.
    banded = minhash_bands(
        df, text_col, id_col, num_hashes, bands, shingle_n
    ).localCheckpoint(eager=True)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-dup pairs with verified shingle-Jaccard >= threshold.

    LSH prunes the pair space; the verify step joins the (distinct)
    shingle sets back in only for surviving candidates.
    """
    cands = minhash_lsh_candidates(df, text_col, id_col, num_hashes, bands, shingle_n)
    # verify on hashed shingles: exact Jaccard modulo 64-bit collisions
    # (~0 at any realistic corpus), rows ~8x lighter through the join;
    # same _shingle_hashes mapping the signatures use. r12: pinned once
    # — the two verify joins (sh_a, sh_b) otherwise each re-ran the
    # tokenize/shingle pass; the pinned rows are hash arrays, ~8 B per
    # distinct shingle.
    sh = df.select(
        F.col(id_col), _shingle_hashes(text_col, shingle_n).alias("sh")
    ).localCheckpoint(eager=True)
    j = (
        cands.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        j.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------- SimHash


def simhash(df: DataFrame, text_col: str = "text", bits: int = 64) -> DataFrame:
    """Append ``simhash: bigint`` — sign-aggregated token-hash fingerprint.

    For each bit position, sum +1/-1 over token hashes and take the sign.
    Implemented as one ``aggregate`` over the token-hash array with an
    array<int> accumulator (no UDF; ~bits ops per token inside codegen).
    Hamming-close simhashes => near-duplicate texts.
    """
    tok_hashes = F.transform(F.array_distinct(_tokens(text_col)), lambda t: F.xxhash64(t))
    bit_idx = F.sequence(F.lit(0), F.lit(bits - 1))
    # the pyspark shiftright wrapper requires a literal int; the SQL
    # function accepts a column — go through call_function
    counts = F.aggregate(
        tok_hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            bit_idx,
            lambda c, i: c
            + F.when(
                F.call_function("shiftright", h, i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1),
        ),
    )
    # fold sign bits MSB-first: acc*2 + bit (avoids column-arg shiftleft)
    fingerprint = F.aggregate(
        F.reverse(F.transform(counts, lambda c: F.when(c > 0, 1).otherwise(0))),
        F.lit(0).cast("long"),
        lambda acc, b: acc * 2 + b,
    )
    return df.withColumn("simhash", fingerprint)


def hamming_near_dups(
    hashed: DataFrame,
    hash_col: str,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    chunks: int | None = None,
) -> DataFrame:
    """Near-dup pairs over ANY 64-bit perceptual/locality hash column by
    Hamming distance, blocked on equal-width bit chunks.

    Pigeonhole: distance <= max_hamming < chunks => at least one chunk
    equal, so join on each chunk and verify — never the all-pairs
    O(n^2) join, and EXACT recall (``chunks=None`` auto-picks the
    smallest 64-divisor > max_hamming; the earlier fixed-4-chunk form
    silently lost recall past distance 3). Works for text SimHash and
    image aHash alike. More chunks = shorter keys = bigger buckets:
    the usual banding recall/cost dial.
    """
    if chunks is None:
        chunks = next((c for c in (2, 4, 8, 16, 32, 64) if c > max_hamming), None)
    if chunks is None or max_hamming >= chunks or 64 % chunks:
        raise ValueError("need max_hamming < chunks <= 64 and chunks | 64")
    bits = 64 // chunks
    mask = (1 << bits) - 1
    # r12: pin the (id, hash) projection BEFORE the blocked self-join —
    # both join sides otherwise re-evaluate the full upstream lineage
    # (the interpreted-HOF simhash fold for text; the mapInPandas codec
    # decode + pHash stages for image/video), doubling the one genuinely
    # expensive pass. The pinned frame is 16 bytes/row, so the
    # checkpoint is hash-sized at any corpus scale while the saved pass
    # is corpus-sized (guide §2.4: two operations keyed the same way
    # share one evaluation). r13: skip the pin when the caller already
    # pinned the shared upstream pass (video_near_dups, caption dedup —
    # their keep/align joins read the same decoded features, so THEY
    # own the pin and this one would only copy pinned rows).
    from ..pins import pin_backed

    sh = hashed.select(F.col(id_col), F.col(hash_col).alias("__hh"))
    if not pin_backed(hashed):
        sh = sh.localCheckpoint(eager=True)
    chunk_idx = F.sequence(F.lit(0), F.lit(chunks - 1))
    blocked = sh.select(
        F.col(id_col),
        F.col("__hh"),
        F.explode(
            F.transform(
                chunk_idx,
                lambda i: F.struct(
                    i.alias("chunk"),
                    F.call_function("shiftright", F.col("__hh"), i * bits)
                    .bitwiseAND(F.lit(mask))
                    .alias("key"),
                ),
            )
        ).alias("c"),
    ).select(id_col, "__hh", "c.chunk", "c.key")
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(b, ["chunk", "key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.__hh").bitwiseXOR(F.col("b.__hh"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_near_dups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance, blocked on 16-bit
    chunks (see :func:`hamming_near_dups` for the pigeonhole argument)."""
    sh = simhash(df, text_col).select(id_col, "simhash")
    return hamming_near_dups(sh, "simhash", id_col, max_hamming)


# ---------------------------------------------------------------- embedding near-dup


def embedding_near_dups(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 0,
    n_blocks: int = 8,
    round_to: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold.

    ``planes=0``: **exact all-pairs via blocked matrix multiply** — vectors
    are hashed into ``n_blocks`` blocks, the B*(B+1)/2 block pairs fan out
    as rows, and each pair is one dense numpy GEMM inside ``mapInPandas``
    (Arrow-batched). This is the shape that scales: block pairs are
    embarrassingly parallel, each task streams two bounded vector sets,
    and the per-pair cost is a vectorized matmul instead of an interpreted
    per-element expression (25x faster than the naive cross join even at
    2k vectors). At 100 TB, size blocks to ~10-50k vectors so a block pair
    fits executor memory.

    ``planes>0``: random-hyperplane LSH blocking first (near-identical
    vectors share sign buckets with high probability) — trades recall for
    a 2^planes candidate reduction; use when even B^2 GEMMs is too much.

    ``round_to``: optionally round cosine to N decimals *before* the
    threshold test, so float-noise at the boundary is deterministic across
    engines (the oracle applies the same rounding).

    Output: (id_a, id_b, cosine) with id_a < id_b.
    """
    if planes > 0:
        from .similarity import (
            _hyperplane_sign_bits,
            cosine_similarity_col,
            hyperplane_weights,
        )

        dim = len(vectors.select(vec_col).first()[0])
        # r12: hoisted weight matrix (one tiny job) instead of per-row
        # per-element xxhash64 — see similarity.hyperplane_weights
        W = hyperplane_weights(vectors.sparkSession, dim, planes, 1)
        v = vectors.select(F.col(id_col), F.col(vec_col)).withColumn(
            "__bucket",
            _hyperplane_sign_bits(vec_col, dim, planes, weights=W[0]),
        )
        a, b = v.alias("a"), v.alias("b")
        j = a.join(b, ["__bucket"]).filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        sim = cosine_similarity_col(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
        if round_to is not None:
            sim = F.round(sim, round_to)
        return (
            j.withColumn("cosine", sim)
            .filter(F.col("cosine") >= threshold)
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                "cosine",
            )
        )

    import pandas as pd

    v = vectors.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("blk"),
    )
    blocks = v.groupBy("blk").agg(
        F.collect_list("id").alias("ids"), F.collect_list("vec").alias("vecs")
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    # tiny (n_blocks rows) -> broadcast the non-equi block-pair join
    pairs = a.join(F.broadcast(b), F.col("a.blk") <= F.col("b.blk")).select(
        F.col("a.blk").alias("blk_a"),
        F.col("a.ids").alias("ids_a"),
        F.col("a.vecs").alias("vecs_a"),
        F.col("b.blk").alias("blk_b"),
        F.col("b.ids").alias("ids_b"),
        F.col("b.vecs").alias("vecs_b"),
    ).repartition(n_blocks * (n_blocks + 1) // 2)

    thr, rnd = float(threshold), round_to

    def gemm(batches):
        import numpy as np

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                ids_a = np.asarray(row.ids_a, dtype=np.int64)
                ids_b = np.asarray(row.ids_b, dtype=np.int64)
                A = np.vstack(row.vecs_a)
                B = np.vstack(row.vecs_b)
                A /= np.linalg.norm(A, axis=1, keepdims=True)
                B /= np.linalg.norm(B, axis=1, keepdims=True)
                S = A @ B.T
                if rnd is not None:
                    S = np.round(S, rnd)
                if row.blk_a == row.blk_b:
                    # same block: keep strictly-upper pairs only
                    mask = (S >= thr) & (ids_a[:, None] < ids_b[None, :])
                    ia, ib = np.nonzero(mask)
                    lo, hi = ids_a[ia], ids_b[ib]
                else:
                    # cross block: every pair is unique; canonicalize id order
                    ia, ib = np.nonzero(S >= thr)
                    xa, xb = ids_a[ia], ids_b[ib]
                    lo, hi = np.minimum(xa, xb), np.maximum(xa, xb)
                yield pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": S[ia, ib]})

    return pairs.mapInPandas(gemm, "id_a long, id_b long, cosine double")


# ---------------------------------------------------------------- n-gram Jaccard (blocked exact)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = None,
    n: int = 3,
    threshold: float = 0.5,
    max_block_rows: int = 100_000,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs within a blocking key.

    ``block_col=None`` means all-pairs — only for small corpora; at scale
    pass a blocking column (source, length bucket, LSH bucket...).

    Set-join plan, not per-pair array intersect: shingles (as xxhash64
    longs) explode to (block, shingle, doc) rows, an equi-join on
    (block, shingle) + groupBy counts |A∩B| only for pairs that share at
    least one shingle, and |A∪B| = |A|+|B|-|A∩B| comes from per-doc
    shingle counts carried through the join. The shuffle is
    rows-per-shingle-occurrence (corpus-linear), and the join fan-out is
    bounded by docs-per-shingle within a block — no wide arrays ever
    cross a shuffle, no O(|A|+|B|) intersect per pair. (6x faster than
    the array-intersect join at sf0.1: 26s -> 4s for 622k pairs.)

    With ``threshold <= 0`` every in-block pair must be emitted, so a
    light ids-only pair skeleton (no arrays) left-joins the intersection
    counts and fills zeroes. That skeleton is QUADRATIC per block —
    inherent to "emit every pair" — so this path is guarded: the largest
    block is counted (one cheap ids-only job) and blocks beyond
    ``max_block_rows`` raise instead of silently launching an
    eat-the-cluster join. Raise the bound explicitly to opt in, or set a
    ``threshold > 0`` (the set-join path is corpus-linear and unguarded).
    """
    blk = block_col or "__blk"
    # r12: pin the shingled frame ONCE — it is consumed by both sides of
    # the set-join, the zero-pair skeleton's two sides, and the guard
    # count (up to five tokenize/shingle corpus passes before; one now).
    # The pinned rows carry hashes, not text: ~8 B per distinct shingle.
    docs = df.select(
        F.col(id_col),
        (F.col(block_col) if block_col else F.lit(1)).alias(blk),
        _shingle_hashes(text_col, n).alias("sh"),
    ).withColumn("nsh", F.size("sh")).localCheckpoint(eager=True)

    ex = docs.select(id_col, blk, "nsh", F.explode("sh").alias("h"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col(f"a.{blk}") == F.col(f"b.{blk}"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.nsh").alias("na"),
            F.col("b.nsh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("inter"))
    )

    if threshold > 0:
        pairs = inter
    else:
        top = (
            docs.groupBy(blk)  # r12: guard reads the pinned frame
            .count()
            .agg(F.max("count").alias("mx"))
            .collect()[0]["mx"]
        )
        if top and top > max_block_rows:
            raise ValueError(
                f"ngram_jaccard_pairs(threshold<=0) emits every in-block pair; "
                f"largest block has {top} rows (~{top * (top - 1) // 2:.2g} pairs) "
                f"> max_block_rows={max_block_rows}. Use a finer block_col, a "
                f"positive threshold, or raise max_block_rows to opt in."
            )
        ids = docs.select(id_col, blk, "nsh")
        pa, pb = ids.alias("a"), ids.alias("b")
        skeleton = pa.join(
            pb,
            (F.col(f"a.{blk}") == F.col(f"b.{blk}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.nsh").alias("na"),
            F.col("b.nsh").alias("nb"),
        )
        pairs = skeleton.join(
            inter.select("id_a", "id_b", "inter"), ["id_a", "id_b"], "left"
        ).withColumn("inter", F.coalesce(F.col("inter"), F.lit(0.0)))

    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------- decontamination


def ngram_decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination: count each training document's word
    n-grams that also appear in a benchmark/test set, the standard
    "n-gram overlap" contamination check run before training.

    Output: (id, ngram_hits, contaminated) — ``ngram_hits`` = number of
    DISTINCT doc n-grams present in the benchmark's n-gram set.

    Plan: both sides shingle to 64-bit hashes (injective fold — counts are
    identical to string n-grams); the benchmark's distinct hash set is
    tiny relative to the corpus and broadcasts, so the corpus-side
    explode+join+groupBy is corpus-linear with NO shuffle of text and no
    shuffle at all on the probe side beyond the final per-doc count (which
    partial-aggregates map-side). Set ``broadcast_bench=False`` when the
    benchmark set is too big for a broadcast (falls back to a hash join
    on the shingle hash).
    """
    d = docs.select(F.col(id_col), F.explode(_shingle_hashes(text_col, n)).alias("__h"))
    b = bench.select(F.explode(_shingle_hashes(text_col, n)).alias("__h")).distinct()
    if broadcast_bench:
        b = F.broadcast(b)
    hits = d.join(b, "__h").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("ngram_hits")
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .withColumn("ngram_hits", F.coalesce(F.col("ngram_hits"), F.lit(0)))
        .withColumn("contaminated", F.col("ngram_hits") > 0)
    )


def chunk_dedup_rewrite(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 16,
) -> DataFrame:
    """Exact-substring dedup as a TRANSFORM (Lee et al. 2021, at chunk
    granularity): rewrite every document keeping only the globally
    FIRST occurrence of each non-overlapping ``chunk_tokens``-token
    chunk — repeated boilerplate disappears from all later documents
    instead of merely being counted (:func:`chunk_dedup` is the
    detection sibling).

    Chunk identity is a POSITION-WEIGHTED commutative hash:
    sum over the chunk's tokens of xxhash64(token) * P^(pos within
    chunk). Commutativity makes it a plain map-side-combinable SUM
    aggregate over one (id, token-pos) explode — each token is hashed
    ONCE in whole-stage codegen. The first higher-order formulation
    (aggregate-over-slice of a transform'd hash array) re-evaluated the
    token-hash array per chunk inside interpreted lambdas and measured
    21 s at sf0.1; this shape measures ~3 s for the identical output.

    First occurrence = min (doc id, chunk position) per chunk hash —
    again a plain aggregate, no window over a possibly-viral chunk key.
    Shuffles carry only (hash, id, pos) ints; chunk STRINGS are built
    once, at the end, for KEPT positions only, and document tokens
    cross the wire exactly once (the doc-keyed rebuild join).

    Output: (id, n_chunks, n_kept, dedup_text) — empty-token docs keep
    an empty rewrite.

    Requires ``spark.sql.ansi.enabled=false`` (the engine-wide session
    contract, set by ``timely_spark.session.configure``): the hash
    relies on silent mod-2^64 long wrap-around, which ANSI mode turns
    into ARITHMETIC_OVERFLOW. Checked up front so a stock Spark 4
    session fails with a clear message, not mid-job.
    """
    from .text import tokens

    if df.sparkSession.conf.get("spark.sql.ansi.enabled", "false") == "true":
        raise ValueError(
            "chunk_dedup_rewrite needs spark.sql.ansi.enabled=false "
            "(run timely_spark.session.configure(spark))"
        )
    ct = chunk_tokens
    mask = (1 << 64) - 1

    def signed(x: int) -> int:
        return x - (1 << 64) if x >= (1 << 63) else x

    pows = [signed(pow(_SHINGLE_P, k, 1 << 64)) for k in range(ct)]
    pow_arr = F.array(*[F.lit(p).cast("long") for p in pows])
    toks = tokens(text_col)
    tok_rows = df.select(
        F.col(id_col), F.posexplode(toks).alias("tpos", "tok")
    )
    ch = (
        tok_rows.select(
            F.col(id_col),
            F.expr(f"tpos DIV {ct}").cast("int").alias("pos"),
            (
                F.xxhash64("tok")
                * F.element_at(pow_arr, (F.col("tpos") % ct) + 1)
            ).alias("contrib"),
        )
        .groupBy(id_col, "pos")
        .agg(F.sum("contrib").alias("__h"))
    )
    first = ch.groupBy("__h").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first")
    )
    kept_pos = (
        ch.join(first, "__h")
        .filter(
            (F.col(id_col) == F.col(f"first.{id_col}"))
            & (F.col("pos") == F.col("first.pos"))
        )
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list("pos")).alias("__kp"))
    )
    kp = F.coalesce(F.col("__kp"), F.array().cast("array<int>"))
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .join(kept_pos, id_col, "left")
        .select(
            F.col(id_col),
            F.ceil(F.size("__toks") / F.lit(float(ct)))
            .cast("long")
            .alias("n_chunks"),
            F.size(kp).cast("long").alias("n_kept"),
            F.array_join(
                F.transform(
                    kp,
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("__toks"), i * ct + 1, ct)
                    ),
                ),
                " ",
            ).alias("dedup_text"),
        )
    )


# ------------------------------------------------------- bloom decontamination


def bloom_bitset(
    bench: DataFrame,
    text_col: str = "text",
    n: int = 8,
    fpp: float = 0.01,
    max_k: int = 16,
    shingles: DataFrame | None = None,
) -> tuple[list[int], int, int]:
    """Build a Bloom bitset over the benchmark's DISTINCT shingle hashes.

    Returns ``(words, m_bits, k)`` — ``words`` is the bitset as signed
    64-bit longs (little-endian bit order within each word), sized for
    the requested false-positive rate.

    The build is distributed: each bench shingle explodes to its k bit
    positions, and the set bits aggregate map-side via
    ``groupBy(pos DIV 64).agg(bit_or(1 << pos%64))`` — the driver
    collects at most m/64 (word, bits) rows, i.e. exactly the broadcast
    payload, never the raw shingle set. At 100M bench n-grams / 1% fpp
    that is ~15M longs (~120 MB) — broadcastable where an exact-join
    hash table of the same keys (~10x with object overhead) is not;
    that regime is this operator's reason to exist.

    ``shingles``: optionally pass the pre-built distinct shingle-hash
    frame (one column ``__h``) to share it with the caller's confirm
    join. The count and bit-position jobs persist it so the bench set
    tokenizes/shuffles ONCE here, not once per job.
    """
    import math

    b = shingles
    if b is None:
        b = bench.select(
            F.explode(_shingle_hashes(text_col, n)).alias("__h")
        ).distinct()
    b = b.persist()
    cnt = b.count()  # 1-scalar driver seam
    eff = max(cnt, 1)
    m_bits = max(64, int(math.ceil(-eff * math.log(fpp) / (math.log(2) ** 2))))
    m_bits = ((m_bits + 63) // 64) * 64
    k = min(max_k, max(1, round(m_bits / eff * math.log(2))))
    pos = [
        F.pmod(F.xxhash64(F.col("__h"), F.lit(i)), F.lit(m_bits))
        for i in range(k)
    ]
    rows = (
        b.select(F.explode(F.array(*pos)).alias("pos"))
        .select(
            F.shiftright(F.col("pos"), 6).alias("w"),
            # SQL shiftleft takes a column shift; the F.shiftleft wrapper
            # is int-only
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    if shingles is None:  # caller-owned frames stay cached for the join
        # blocking: the release is deterministic, not racing the async
        # ContextCleaner (the r12 driver pytest flake was an absolute
        # persisted-RDD-count assertion catching exactly such a race)
        b.unpersist(blocking=True)
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["w"]] = r["bits"]
    return words, m_bits, k


def _bloom_filter_hashes(
    d: DataFrame,
    hash_col: str,
    words: list[int],
    m_bits: int,
    k: int,
    max_literal_words: int = 65536,
) -> DataFrame:
    """Keep rows whose ``hash_col`` might be in the Bloom set.

    Two physical paths sharing the SAME JVM-computed positions (so the
    probe always matches the build exactly):

    - bitset <= ``max_literal_words`` longs (default 512 KB): the bitset
      is one array literal bound ONCE as a column, and the k bit tests
      are whole-stage-codegen'd expressions — zero Python.
    - larger: the k positions are still computed JVM-side into an
      ``array<long>`` column; an Arrow pandas UDF closes over the numpy
      bitset and does only the vectorized bit lookups (same contract as
      the PQ codebook literal/closure dual path, similarity.py).
    """
    pos_cols = [
        F.pmod(F.xxhash64(F.col(hash_col), F.lit(i)), F.lit(m_bits))
        for i in range(k)
    ]
    if len(words) <= max_literal_words:
        d = d.withColumn("__bloom", F.lit(words))  # literal bound once
        d = d.withColumns({f"__p{i}": p for i, p in enumerate(pos_cols)})
        # SQL shiftright takes a column shift; the F.shiftright wrapper
        # is int-only
        test = " AND ".join(
            f"((shiftright(element_at(__bloom, "
            f"CAST(shiftright(__p{i}, 6) AS INT) + 1), "
            f"CAST(__p{i} % 64 AS INT)) & CAST(1 AS BIGINT)) != 0)"
            for i in range(k)
        )
        return d.filter(F.expr(test)).drop(
            "__bloom", *[f"__p{i}" for i in range(k)]
        )

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as _F

    np_words = np.array(words, dtype=np.int64).view(np.uint64)

    def _mc(pos):
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        mat = np.stack(pos.to_numpy()).astype(np.int64).view(np.uint64)
        w = np_words[(mat >> np.uint64(6)).astype(np.int64)]
        bits = (w >> (mat & np.uint64(63))) & np.uint64(1)
        return pd.Series(bits.all(axis=1))

    # live annotations: the module's `from __future__ import annotations`
    # would stringify inline hints beyond pandas_udf's resolver (pd is a
    # function-local import, not a module global)
    _mc.__annotations__ = {"pos": pd.Series, "return": pd.Series}
    might_contain = _F.pandas_udf(_mc, "boolean")

    return (
        d.withColumn("__pos", F.array(*pos_cols))
        .filter(might_contain(F.col("__pos")))
        .drop("__pos")
    )


def bloom_decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    fpp: float = 0.01,
    max_literal_words: int = 65536,
) -> DataFrame:
    """Benchmark decontamination for the LARGE-benchmark regime:
    Bloom-prefilter + exact confirm join.

    Output is IDENTICAL to ``ngram_decontaminate`` (same schema, same
    values): the Bloom filter has no false negatives, and the exact
    join removes its false positives — so the filter only prunes probe
    rows, never changes the answer, and the same SQL oracle verifies
    both operators.

    Scale rationale: ``ngram_decontaminate`` broadcasts the benchmark's
    distinct shingle set as a join hash table — fine to ~10M n-grams.
    Past that (full benchmark suites + their train splits), the exact
    set no longer broadcasts and the fallback shuffle join moves EVERY
    corpus shingle. Here the ~10x-smaller bitset broadcasts instead,
    the corpus side drops non-members map-side inside codegen (true
    hits + fpp of the corpus survive), and the confirm join — kept as a
    shuffle join on purpose, its probe side now being tiny — shuffles
    only the pruned remainder plus the bench set itself.
    """
    # ONE distinct-shingle frame, cached across the bitset build's two
    # eager jobs (count + bit-position collect), then RELEASED: the lazy
    # confirm join recomputes the bench shingles once when the caller
    # materializes. Holding the cache through the (lazily-consumed)
    # confirm join leaked the bench-shingle partitions for the rest of
    # the session (ADVICE r5); the recompute is bench-sized — one
    # tokenize+distinct of the benchmark set, never corpus work.
    b = bench.select(
        F.explode(_shingle_hashes(text_col, n)).alias("__h")
    ).distinct()
    words, m_bits, k = bloom_bitset(bench, text_col, n, fpp, shingles=b)
    b.unpersist(blocking=True)
    d = docs.select(
        F.col(id_col), F.explode(_shingle_hashes(text_col, n)).alias("__h")
    )
    d = _bloom_filter_hashes(d, "__h", words, m_bits, k, max_literal_words)
    hits = d.join(b, "__h").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("ngram_hits")
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .withColumn("ngram_hits", F.coalesce(F.col("ngram_hits"), F.lit(0)))
        .withColumn("contaminated", F.col("ngram_hits") > 0)
    )


# ---------------------------------------------------------------- dedup clusters


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster_id) over an undirected pair list — cluster_id = the
    smallest node id reachable from each node.

    Near-dup pair lists (MinHash/SimHash/Jaccard output) need this final
    step to turn pairwise matches into dedup groups with one canonical
    keeper. Boruvka-style label contraction: each round (1) relabels edges
    through the current labels and keeps only edges CROSSING labels, then
    (2) merges every label into its minimum adjacent label. Cross-edges
    shrink geometrically (each round contracts every label toward its
    component min), so convergence is O(log n) rounds with per-round work
    O(|edges|) — measured 8 rounds on a 20k-edge chain-structured graph,
    and each round's cost FALLS as the edge set contracts. (A plain
    min-label + pointer-jumping loop was abandoned: per-round wall time
    inflated ~2.5x/round on converged-label skew even at constant row
    counts.) Correctness: a label only ever merges into a label of the
    same component, and the component's min node keeps its own label, so
    at convergence every component is uniformly labeled with its min id.
    ``localCheckpoint`` truncates lineage each round; a driver-side loop
    over distributed steps, like every iterative algorithm on Spark.

    Pin lifecycle (r13, VERDICT r12 items 1/7): every superseded pin is
    unpersisted as soon as its successor is eagerly materialized —
    round N-1's labels pin dies when round N's lands, and the edge pin
    dies at convergence. The function returns holding exactly ONE pin
    (the final labels, which backs the lazily-returned frame); callers
    that loop release it after materializing via
    ``timely_spark.pins.release_pins(result)``.

    Round shape (r13, guide §2.4/§1.2 — measured per-round split): the
    ``pairs`` subtree is evaluated ONCE (explode to both orientations,
    not a union of two evaluations — the union form re-ran the caller's
    pair-generation join twice inside the edge pin), and each round is
    ONE pinned job instead of two: the symmetric cross-label relation
    is exploded from a single evaluation (so it needs no pin of its
    own), the merge map left-joins onto labels, and a ``__chg`` flag
    rides the pin so convergence is a cheap filter-isEmpty on pinned
    rows. merge is empty iff cross is empty (for any cross pair the
    larger label always gains a smaller min-adjacent), so the round
    count and every label are IDENTICAL to the two-job form.
    """
    from ..pins import pin, unpin

    orient = F.array(
        F.struct(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
        F.struct(F.col(id_b).alias("src"), F.col(id_a).alias("dst")),
    )
    edges = pin(
        pairs.select(F.explode(orient).alias("e"))
        .select("e.src", "e.dst")
        .distinct()
    )
    labels = pin(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )
    for _ in range(max_iter):
        ls = labels.select(F.col("node").alias("src"), F.col("lbl").alias("ls"))
        ld = labels.select(F.col("node").alias("dst"), F.col("lbl").alias("ld"))
        cross = (
            edges.join(ls, "src")
            .join(ld, "dst")
            .select("ls", "ld")
            .filter(F.col("ls") != F.col("ld"))
        )
        sym = F.array(
            F.struct(F.col("ls").alias("a"), F.col("ld").alias("b")),
            F.struct(F.col("ld").alias("a"), F.col("ls").alias("b")),
        )
        merge = (
            cross.select(F.explode(sym).alias("e"))
            .select("e.a", "e.b")
            .groupBy("a")
            .agg(F.min("b").alias("m"))
            .filter(F.col("m") < F.col("a"))
        )
        new_labels = pin(
            labels.join(merge.withColumnRenamed("a", "lbl"), "lbl", "left")
            .select(
                "node",
                F.coalesce("m", "lbl").alias("lbl"),
                F.col("m").isNotNull().alias("__chg"),
            )
        )
        # new_labels is materialized: round N-1's pin is dead weight
        unpin(labels)
        labels = new_labels
        if labels.filter("__chg").isEmpty():  # cheap: pinned rows
            break
    unpin(edges)
    return labels.select("node", F.col("lbl").alias("cluster_id"))


def dedup_cluster_assignment(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Every document's dedup cluster and keeper flag: docs in no pair are
    their own singleton cluster; the keeper is the cluster's min id."""
    cc = connected_components(pairs, id_a, id_b)
    return (
        docs.select(id_col)
        .join(cc.withColumnRenamed("node", id_col), id_col, "left")
        .withColumn("cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col)))
        .withColumn("is_keeper", F.col(id_col) == F.col("cluster_id"))
    )


# ---------------------------------------------------------------- chunk-level (shared spans)


def chunk_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 16,
) -> DataFrame:
    """Shared-span detection: per-doc fraction of non-overlapping
    ``chunk_tokens``-token chunks that also occur in another document.

    The sub-document analogue of :func:`exact_dedup` — catches documents
    stitched from boilerplate (headers, license blocks, templated spans)
    that whole-text or near-dup hashing misses. Chunking/hashing are
    per-row column expressions; the corpus-wide visibility count shuffles
    only 128-bit chunk hashes, never text, so the plan is corpus-linear:
    explode -> groupBy(hash) -> hash-join back -> groupBy(doc).

    Docs with zero tokens produce no chunks and are omitted.
    Output: (id_col, n_chunks, n_shared_chunks, shared_chunk_frac).
    """
    from .text import tokens

    toks = tokens(text_col)
    ct = chunk_tokens
    idx = F.sequence(
        F.lit(0), F.ceil(F.size(toks) / F.lit(float(ct))).cast("int") - 1
    )
    chunks = F.array_distinct(
        F.transform(
            idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i * ct + 1, ct)))
        )
    )
    exploded = (
        df.select(F.col(id_col), F.explode(F.when(F.size(toks) > 0, chunks)).alias("__h"))
    )
    # Skew-safe shape: the SHARED set ({hash: in >1 doc} — only
    # duplicated boilerplate, small in real corpora) aggregates with
    # map-side combine and joins back UNHINTED: AQE broadcasts it while
    # it is small and degrades to a skew-split shuffle join when a
    # boilerplate-heavy corpus grows it past the threshold (a forced
    # F.broadcast hint would have no fallback and OOM the driver). A
    # count window over the exploded frame would be one scan cheaper
    # locally but sends every occurrence of a hot chunk (exactly what
    # this operator hunts) to a single task — a straggler at scale.
    shared = (
        exploded.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__n_docs"))
        .filter(F.col("__n_docs") > 1)
        .select("__h", F.lit(1).alias("__is_shared"))
    )
    flagged = exploded.join(shared, "__h", "left")
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.coalesce(F.col("__is_shared"), F.lit(0))).alias(
                "n_shared_chunks"
            ),
        )
        .withColumn(
            "shared_chunk_frac",
            F.round(F.col("n_shared_chunks") / F.col("n_chunks").cast("double"), 4),
        )
    )


def chunk_dedup_sql(
    c: str = "text", id_col: str = "doc_id", chunk_tokens: int = 16
) -> str:
    """DuckDB equivalent of :func:`chunk_dedup` over ``documents``."""
    from .text import TOKENS_SQL

    toks = TOKENS_SQL.format(c=c)
    ct = chunk_tokens
    return f"""
WITH tok AS (SELECT {id_col}, {toks} AS ts FROM documents),
chunks AS (
  SELECT {id_col}, list_distinct(list_transform(
    range(0, CAST(ceil(len(ts) / {ct}.0) AS BIGINT)),
    i -> md5(array_to_string(ts[(i*{ct}+1):(i*{ct}+{ct})], ' ')))) AS hs
  FROM tok WHERE len(ts) > 0),
ex AS (SELECT {id_col}, unnest(hs) AS h FROM chunks),
cnt AS (SELECT h, count(*) AS n_docs FROM ex GROUP BY 1)
SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_chunks,
  CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_chunks,
  round(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4)
    AS shared_chunk_frac
FROM ex JOIN cnt USING (h) GROUP BY 1"""


# ---------------------------------------------------------- substring spans


def _window_hashes(text_col: str, window: int):
    """STRIDE-1 rolling token-window hashes as ``array<long>`` — the
    positional (non-distinct) sibling of :func:`_shingle_hashes`: entry
    ``i`` (0-based) is the injective fold of tokens ``i .. i+window-1``.
    Docs with fewer than ``window`` tokens yield an empty array (no
    whole-doc fallback here: a span shorter than the window is not a
    qualifying repeat)."""
    toks = _tokens(text_col)
    m = F.size(toks) - (window - 1)
    sh = F.transform(F.slice(toks, 1, m), lambda t: F.xxhash64(t))
    for j in range(1, window):
        sh = F.zip_with(
            sh,
            F.slice(toks, j + 1, m),
            lambda acc, t: acc * F.lit(_SHINGLE_P) + F.xxhash64(t),
        )
    return F.when(m >= 1, sh).otherwise(F.array().cast("array<long>"))


def window_occurrences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
) -> DataFrame:
    """The stride-1 detection's expensive pass in isolation: one row per
    rolling window hash occurrence, ``(id, __p, __h)``. Persist this to
    share one hashing of the corpus across several
    :func:`substring_spans` consumers (ints only — never text)."""
    return df.select(
        F.col(id_col),
        F.posexplode_outer(_window_hashes(text_col, window)).alias("__p", "__h"),
    ).filter(F.col("__h").isNotNull())


def substring_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
    with_keeper: bool = False,
    occ: DataFrame | None = None,
) -> DataFrame:
    """Shared stride-1 detection core: one row per MAXIMAL duplicated
    token span, ``(id, __s, __e[, __keep])`` with inclusive token
    indices. :func:`repeated_span_stats` (screen) and
    :func:`substring_dedup_rewrite` / :func:`excise_spans_original_text`
    (transforms) are consumers, so a pipeline wanting both runs ONE
    detection and persists this frame (tools/curate.py does).

    ``with_keeper`` adds the global-first-occurrence flag (``__keep``:
    1 where any member window of the span is the globally-first
    occurrence of its hash) — one extra hash-keyed aggregate + join the
    screen-only path does not pay.

    Scale shape: the only corpus-sized shuffle carries (hash, count) /
    (hash, pos) ints with map-side combine; the island merge windows
    over per-DOC position lists (bounded by doc length); span
    arithmetic is row-local.

    ``occ``: a precomputed :func:`window_occurrences` frame — the
    expensive window-hash explode — so a pipeline that detects over one
    corpus and re-detects over a filtered subset (curate's screen ->
    rewrite) hashes each document ONCE and re-runs only the int-only
    count/keeper aggregates. Duplicate counts and keeper flags are
    always computed over the rows of ``occ`` actually passed in, so a
    subset re-detection has honest subset semantics (a span whose other
    copies were all screened out is no longer a duplicate).
    """
    if occ is None:
        occ = window_occurrences(df, text_col, id_col, window)
    # Duplicate flagging + global-first as WINDOW functions over the hash
    # partition, not aggregate-and-join: the join form evaluated the
    # exploded window-hash relation once per join side — the interpreted
    # fold + Generate (the operator's dominant cost, SCALE.md round-6)
    # ran 2x (screen) / 4x (keeper) per call, measured in the committed
    # r12 before-plans (doc_substring_dedup: Generate nodes (5),(8);
    # doc_substring_rewrite: (5),(8),(20),(23)). One Window pass computes
    # the occurrence count AND the min-(doc,pos) struct over the same
    # hash partition, so the corpus explode runs ONCE; the trade is one
    # (id, pos, hash) int-only shuffle + sort, which the r12 A/B measured
    # well under one fold re-evaluation at sf0.1. Semantics identical:
    # the inner count join kept whole hash groups, so min over the full
    # partition equals min over the dup-filtered rows.
    wh = Window.partitionBy("__h")
    if with_keeper:
        first = F.min(
            F.struct(F.col(id_col).alias("d"), F.col("__p").alias("p"))
        ).over(wh)
        flagged = (
            occ.select(
                id_col,
                "__p",
                F.count(F.lit(1)).over(wh).alias("__c"),
                first.alias("__first"),
            )
            .filter(F.col("__c") > 1)
            .select(
                id_col,
                "__p",
                (
                    (F.col(id_col) == F.col("__first.d"))
                    & (F.col("__p") == F.col("__first.p"))
                ).alias("__isf"),
            )
        )
    else:
        flagged = (
            occ.select(
                id_col, "__p", F.count(F.lit(1)).over(wh).alias("__c")
            )
            .filter(F.col("__c") > 1)
            .select(id_col, "__p")
        )
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("__p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        F.col("__p") > F.max("__p").over(w_prev) + (window - 1) + 1, 1
    ).otherwise(0)
    isl = flagged.withColumn(
        "__isl",
        F.sum(brk).over(
            Window.partitionBy(id_col).orderBy("__p").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    aggs = [F.min("__p").alias("__s"), (F.max("__p") + (window - 1)).alias("__e")]
    if with_keeper:
        aggs.append(F.max(F.col("__isf").cast("int")).alias("__keep"))
    return isl.groupBy(id_col, "__isl").agg(*aggs).drop("__isl")


def repeated_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
    spans: DataFrame | None = None,
) -> DataFrame:
    """Exact substring dedup at STRIDE-1 granularity — the Lee et al.
    2022 ("Deduplicating Training Data Makes Language Models Better")
    semantics at token windows, the alignment-free upgrade over
    :func:`chunk_dedup`'s non-overlapping chunks: a duplicated passage
    is found wherever it starts, not only when it happens to land on a
    chunk boundary.

    Plan: every doc emits its rolling ``window``-token hashes with
    positions; a global count marks hashes occurring more than once
    ANYWHERE (cross-doc or within-doc repeats both qualify, as in the
    suffix-array formulation); flagged positions merge into MAXIMAL
    spans per doc by gaps-and-islands (windows overlapping or touching
    coalesce), and the row reports per-doc span count / duplicated
    token mass / fraction.

    Scale shape: the only corpus-sized shuffle carries (hash, count)
    ints — never text; the island merge windows over per-DOC position
    lists (bounded by doc length, the sessionize per-user precedent);
    the span arithmetic is row-local. A full suffix array would find
    repeats of EVERY length; fixing the window length is what turns the
    problem corpus-linear, and matches the fixed `min_length` cutoff
    the reference technique applies anyway.

    Output: (id, n_tokens, n_dup_spans, dup_tokens, dup_frac).
    ``spans``: a precomputed :func:`substring_spans` frame (any extra
    columns ignored) — pass it to share one detection across consumers.
    """
    if spans is None:
        spans = substring_spans(df, text_col, id_col, window)
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("__e") - F.col("__s") + 1).alias("dup_tokens"),
    )
    # denominator side: a fresh cheap scan (tokenize + size, no explode).
    # Deduplicating (id, __nt) out of the EXPLODED frame instead was
    # measured 2.3x slower end-to-end at sf0.1 — the distinct shuffles
    # one row per WINDOW, while this scan reads one row per DOC
    base = df.select(F.col(id_col), F.size(_tokens(text_col)).alias("n_tokens"))
    return (
        base.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest(F.col("n_tokens").cast("double"), F.lit(1.0)),
                4,
            ).alias("dup_frac"),
        )
    )


def substring_dedup_rewrite(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
    emit_text: bool = False,
    spans: DataFrame | None = None,
) -> DataFrame:
    """Stride-1 exact substring dedup as a TRANSFORM — the full Lee et
    al. 2022 semantics: every maximal duplicated span is REMOVED from
    every document except the one holding its globally-first occurrence
    (min (doc id, position) over the span's member windows' repeat
    groups). :func:`repeated_span_stats` is the detection sibling;
    :func:`chunk_dedup_rewrite` is the cheaper aligned-chunk variant
    this upgrades — a passage duplicated at an arbitrary offset is
    excised here, not just when it lands on a chunk boundary.

    Keeper rule: a merged span survives in the doc where ANY of its
    member windows is the global first occurrence of its hash;
    elsewhere its token range [start, end+window-1] is cut. Both the
    rule and the rebuild are deterministic, so the DuckDB oracle
    reproduces the rewritten text byte-exactly (md5-pinned).

    Scale shape: identical frames to repeated_span_stats (hash-only
    corpus shuffle, per-doc islands windows) plus one more hash-keyed
    aggregate (the global-first min) and a doc-keyed rebuild join where
    document tokens cross the wire exactly once; removed-range lists
    are per-doc tiny and the positional filter is a row-local
    higher-order expression.

    Output: (id, n_tokens, n_removed_tokens, dedup_md5); with
    ``emit_text=True`` the rebuilt token stream rides along as
    ``dedup_text`` (the curate CLI's transform mode — md5-only keeps
    the oracle row's shuffle free of text). ``spans``: a precomputed
    :func:`substring_spans` frame built ``with_keeper=True``.
    """
    toks = _tokens(text_col)
    if spans is None:
        spans = substring_spans(df, text_col, id_col, window, with_keeper=True)
    removed = (
        spans.filter(F.col("__keep") == 0)
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct(F.col("__s"), F.col("__e"))).alias("__cuts")
        )
    )
    cuts = F.coalesce(
        F.col("__cuts"),
        F.array().cast("array<struct<__s:int,__e:int>>"),
    )
    kept = F.filter(
        F.col("__toks"),
        lambda t, i: ~F.exists(
            cuts, lambda r: (i >= r["__s"]) & (i <= r["__e"])
        ),
    )
    cols = [
        F.col(id_col),
        F.size("__toks").cast("long").alias("n_tokens"),
        (F.size("__toks") - F.size(kept)).cast("long").alias(
            "n_removed_tokens"
        ),
        F.md5(F.array_join(kept, " ")).alias("dedup_md5"),
    ]
    if emit_text:
        cols.append(F.array_join(kept, " ").alias("dedup_text"))
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .join(removed, id_col, "left")
        .select(*cols)
    )


def excise_spans_original_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
    spans: DataFrame | None = None,
) -> DataFrame:
    """Cut duplicated token spans out of the ORIGINAL text, leaving the
    rest of the document verbatim — the Lee et al. 2022 transform as a
    corpus rewrite (duplicated character ranges excised, casing /
    punctuation / whitespace outside the spans untouched). This is what
    the curate CLI's ``--substring-rewrite`` ships downstream;
    :func:`substring_dedup_rewrite` is the md5-pinnable normalized-token
    sibling the oracle row keeps.

    Token index -> character offset mapping happens in an Arrow-batched
    ``mapInPandas`` pass (text must cross the wire for any rewrite, so
    the extra cost is one Python pass, the multimodal/WARC precedent);
    detection stays all-JVM via :func:`substring_spans`. The Python
    re-tokenization (``[a-z0-9']+`` over ``str.lower()``) matches the
    JVM tokenizer wherever lowercasing is length-preserving; a doc whose
    Python token count disagrees with the plan-side count (exotic
    Unicode case-folding) falls back to its original text, flagged in
    ``excised`` = NULL — distinct from false (= no duplicated spans to
    cut), so a pipeline can COUNT silent span retention instead of
    conflating it with clean docs (ADVICE r7).

    Output: (id, text, excised) with the same id/text column names.
    """
    import pandas as pd

    if spans is None:
        spans = substring_spans(df, text_col, id_col, window, with_keeper=True)
    removed = (
        spans.filter(F.col("__keep") == 0)
        .groupBy(id_col)
        .agg(F.collect_list(F.struct(F.col("__s"), F.col("__e"))).alias("__cuts"))
    )
    joined = df.select(
        F.col(id_col),
        F.col(text_col),
        F.size(_tokens(text_col)).alias("__nt"),
    ).join(removed, id_col, "left")

    id_type = dict(df.dtypes)[id_col]
    out_schema = f"{id_col} {id_type}, {text_col} string, excised boolean"

    def emit(batches):
        from .text import TOKEN_RE

        word = re.compile(TOKEN_RE)
        for pdf in batches:
            out_id, out_text, out_flag = [], [], []
            for rid, text, nt, cuts in zip(
                pdf[id_col], pdf[text_col], pdf["__nt"], pdf["__cuts"]
            ):
                out_id.append(rid)
                if cuts is None or len(cuts) == 0 or text is None:
                    out_text.append(text)
                    out_flag.append(False)
                    continue
                toks = list(word.finditer(text.lower()))
                if len(toks) != nt or len(text.lower()) != len(text):
                    out_text.append(text)  # tokenizer-offset mismatch
                    out_flag.append(None)  # fallback: spans RETAINED
                    continue
                # token ranges -> char ranges, merged right-to-left
                ranges = sorted(
                    (toks[c["__s"]].start(), toks[min(c["__e"], nt - 1)].end())
                    for c in cuts
                )
                pieces, prev = [], 0
                for s, e in ranges:
                    pieces.append(text[prev:s])
                    prev = max(prev, e)
                pieces.append(text[prev:])
                out_text.append("".join(pieces))
                out_flag.append(True)
            yield pd.DataFrame(
                {id_col: out_id, text_col: out_text, "excised": out_flag}
            )

    return joined.mapInPandas(emit, out_schema)
