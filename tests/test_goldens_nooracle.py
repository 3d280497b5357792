"""Golden tests pinning the math of the operators that have no DuckDB
oracle (MinHash/LSH banding, SimHash, hyperplane-LSH ANN, IVF ANN).

Strategy per VERDICT r1 #6: recompute signatures/buckets in pure Python on
a small corpus — sharing ONLY the primitive xxhash64 values with Spark
(collected once from a tiny fixture) — and assert exact signature/pair
equality; for the ANN paths, plant known near-neighbors and assert recall
against the exact kNN.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

M64 = (1 << 64) - 1


def _signed(x: int) -> int:
    x &= M64
    return x - (1 << 64) if x >= (1 << 63) else x


@pytest.fixture(scope="module")
def docs(spark):
    """~100 docs with seeded near-duplicate clusters."""
    base = [
        " ".join(f"w{(i * 7 + j) % 97}" for j in range(30)) for i in range(80)
    ]
    rows = [(i, t) for i, t in enumerate(base)]
    # 20 near-dups: copy doc i with one token changed
    for i in range(20):
        toks = base[i].split()
        toks[5] = f"alt{i}"
        rows.append((1000 + i, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def shingle_hashes(spark, docs):
    """Spark-computed shingle-hash arrays (the shared primitive)."""
    from timely_spark.operators.dedup import _shingle_hashes

    rows = docs.select("doc_id", _shingle_hashes("text", 3).alias("sh")).collect()
    return {r["doc_id"]: list(r["sh"]) for r in rows}


def _py_signature(hashes: list[int], num_hashes: int) -> list[int]:
    from timely_spark.operators.dedup import _perm_consts

    sig = []
    for i in range(num_hashes):
        a, b = _perm_consts(i)
        sig.append(min(_signed(h * a + b) for h in hashes))
    return sig


def test_minhash_signature_matches_python(spark, docs, shingle_hashes):
    """The wide-column min-agg signature == an independent per-doc fold."""
    from timely_spark.operators.dedup import minhash_signature

    got = {
        r["doc_id"]: list(r["signature"])
        for r in minhash_signature(docs, num_hashes=32).collect()
    }
    want = {d: _py_signature(hs, 32) for d, hs in shingle_hashes.items()}
    assert got == want


def test_minhash_lsh_candidates_match_python_banding(spark, docs, shingle_hashes):
    """Banded bucket-join pair set == pure-Python band-tuple equality
    (bucket hash equality == tuple equality modulo xxhash64 collisions)."""
    from timely_spark.operators.dedup import minhash_lsh_candidates

    num_hashes, bands = 32, 8
    rows = num_hashes // bands
    sigs = {d: _py_signature(hs, num_hashes) for d, hs in shingle_hashes.items()}
    buckets: dict[tuple, list[int]] = {}
    for d, sig in sigs.items():
        for b in range(bands):
            buckets.setdefault((b, tuple(sig[b * rows : (b + 1) * rows])), []).append(d)
    want = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                want.add((ms[i], ms[j]))
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(docs, num_hashes=num_hashes, bands=bands).collect()
    }
    assert got == want
    # the planted near-dups must all be candidates (identical in most bands)
    assert all((i, 1000 + i) in got for i in range(20))


@pytest.fixture(scope="module")
def token_hashes(spark, docs):
    from timely_spark.operators.dedup import _tokens

    rows = docs.select(
        "doc_id",
        F.transform(
            F.array_distinct(_tokens("text")), lambda t: F.xxhash64(t)
        ).alias("th"),
    ).collect()
    return {r["doc_id"]: list(r["th"]) for r in rows}


def test_simhash_matches_python(spark, docs, token_hashes):
    """The aggregate/zip_with simhash fold == an independent bit-count
    recompute (arithmetic shifts on signed longs match Python's >>)."""
    from timely_spark.operators.dedup import simhash

    got = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    want = {}
    for d, hs in token_hashes.items():
        counts = [0] * 64
        for h in hs:
            for i in range(64):
                counts[i] += 1 if (h >> i) & 1 else -1
        want[d] = _signed(sum((1 if c > 0 else 0) << i for i, c in enumerate(counts)))
    assert got == want


def test_simhash_near_dups_pigeonhole(spark, docs):
    """Blocked Hamming join finds exactly the all-pairs answer for
    distance <= 3 (pigeonhole over 4 x 16-bit chunks is lossless)."""
    from timely_spark.operators.dedup import simhash, simhash_near_dups

    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    ids = sorted(sh)
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            if bin((sh[a] ^ sh[b]) & M64).count("1") <= 3:
                want.add((a, b))
    got = {
        (r["id_a"], r["id_b"]) for r in simhash_near_dups(docs, max_hamming=3).collect()
    }
    assert got == want
    assert len(got) >= 15  # the planted one-token edits are Hamming-close


# ---------------------------------------------------------------- ANN recall


@pytest.fixture(scope="module")
def planted(spark):
    """200 deterministic pseudo-random 32-dim vectors + 5 queries, each
    query's true nearest neighbor planted at cosine ~0.99."""
    import math

    def vec(seed):
        # deterministic pseudo-uniform in [-1, 1): LCG per (seed, dim)
        out = []
        x = seed * 6364136223846793005 + 1442695040888963407
        for _ in range(32):
            x = (x * 6364136223846793005 + 1442695040888963407) & M64
            out.append((x >> 11) / float(1 << 53) * 2 - 1)
        n = math.sqrt(sum(v * v for v in out))
        return [v / n for v in out]

    rows = [(i, vec(i)) for i in range(200)]
    # plant: vector 1000+q = slightly perturbed copy of query q
    for qid in range(5):
        v = list(rows[qid][1])
        v[0] += 0.05
        n = math.sqrt(sum(x * x for x in v))
        rows.append((1000 + qid, [x / n for x in v]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return corpus, queries


def _pairs(df):
    return {(r["query_id"], r["vec_id"]) for r in df.collect()}


def test_lsh_topk_recall_floor(spark, planted):
    """Multi-table hyperplane LSH: >=80% of the exact top-5 recovered, and
    every planted ~0.99-cosine neighbor found (that's the LSH contract —
    close vectors share buckets with high probability)."""
    from timely_spark.operators.similarity import cosine_topk, lsh_topk

    corpus, queries = planted
    exact = _pairs(cosine_topk(corpus, queries, k=5))
    approx = _pairs(lsh_topk(corpus, queries, dim=32, k=5, planes=4, tables=12))
    assert len(approx & exact) / len(exact) >= 0.8
    assert all((q, 1000 + q) in approx for q in range(5))


def test_ivf_topk_recall_floor(spark, planted):
    from timely_spark.operators.similarity import cosine_topk, ivf_topk

    corpus, queries = planted
    exact = _pairs(cosine_topk(corpus, queries, k=5))
    approx = _pairs(ivf_topk(corpus, queries, k=5, ncells=8, nprobe=4))
    assert len(approx & exact) / len(exact) >= 0.6


def test_pq_topk_recall_floor(spark, planted):
    """PQ-ADC (m=8 sub-quantizers of 4 dims, 16 centroids each): >=60%
    of exact top-5 recovered on the planted corpus and every ~0.99-cosine
    planted neighbor found — code compression keeps coarse geometry."""
    from timely_spark.operators.similarity import cosine_topk, pq_topk

    corpus, queries = planted
    exact = _pairs(cosine_topk(corpus, queries, k=5))
    approx = _pairs(
        pq_topk(corpus, queries, dim=32, k=5, m=8, ksub=16, sample=205)
    )
    assert len(approx & exact) / len(exact) >= 0.6
    assert all((q, 1000 + q) in approx for q in range(5))
    # deterministic end to end (no RNG anywhere in train/encode/score)
    again = _pairs(pq_topk(corpus, queries, dim=32, k=5, m=8, ksub=16, sample=205))
    assert approx == again


def test_pq_encode_shapes(spark, planted):
    """Codes are m ints in [0, ksub); every corpus row is encoded."""
    from timely_spark.operators.similarity import pq_encode, pq_train_codebooks

    corpus, _ = planted
    books = pq_train_codebooks(corpus, dim=32, m=4, ksub=8, sample=205)
    assert books.shape == (4, 8, 8)
    codes = pq_encode(corpus, books).collect()
    assert len(codes) == corpus.count()
    for r in codes:
        assert len(r["codes"]) == 4
        assert all(0 <= c < 8 for c in r["codes"])


def test_ivfpq_topk_recall_floor(spark, planted):
    """IVF pruning + PQ codes composed: planted ~0.99 neighbors survive
    both the cell pruning and the code quantization; deterministic."""
    from timely_spark.operators.similarity import ivfpq_topk

    corpus, queries = planted
    approx = _pairs(
        ivfpq_topk(
            corpus, queries, dim=32, k=5, m=8, ksub=16,
            ncells=16, nprobe=8, sample=205,
        )
    )
    assert all((q, 1000 + q) in approx for q in range(5))
    again = _pairs(
        ivfpq_topk(
            corpus, queries, dim=32, k=5, m=8, ksub=16,
            ncells=16, nprobe=8, sample=205,
        )
    )
    assert approx == again


def test_pca_project_matches_numpy(spark, planted):
    """Components orthonormal, variance-ordered, sign-canonical; the
    Spark projection equals the numpy projection of the same basis."""
    import numpy as np

    from timely_spark.operators.similarity import pca_components, pca_project

    corpus, _ = planted
    mu, comps, evr = pca_components(corpus, dim=32, r=4, sample=205)
    assert comps.shape == (4, 32)
    g = comps @ comps.T
    assert np.allclose(g, np.eye(4), atol=1e-9)          # orthonormal
    assert all(evr[i] >= evr[i + 1] - 1e-12 for i in range(3))  # ordered
    for row in comps:                                     # sign convention
        assert row[np.abs(row).argmax()] > 0
    out = {r["vec_id"]: [r[f"pc{i}"] for i in range(4)]
           for r in pca_project(corpus, mu, comps).collect()}
    X = {r["vec_id"]: np.array(r["embedding"]) for r in corpus.collect()}
    for vid, vec in list(X.items())[:20]:
        want = (vec - mu) @ comps.T
        assert np.allclose(out[vid], np.round(want, 6), atol=1e-6), vid


# ------------------------------------------------------------------ BPE


def test_bpe_encode_matches_sequential_model(spark):
    """The operator's greedy lowest-rank merge loop == an independent
    sequential-merge model (apply each learned merge everywhere, in
    training order) — the two classic, provably-equivalent BPE apply
    formulations implemented separately; plus reconstruction: joining a
    word's tokens (minus the end marker) reproduces the word."""
    from timely_spark.operators.bpe import (
        _END,
        _words,
        bpe_encode,
        train_bpe_merges,
    )

    rows = [
        (0, "the lowest lower newest widest low low lower newest"),
        (1, "completely unrelated wording with apostrophe's too"),
        (2, "the the the lowest newest widest"),
        (3, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe_merges(docs, num_merges=40, sample_docs=10)
    assert merges and all(isinstance(a, str) and isinstance(b, str) for a, b in merges)

    def model_encode(word):
        syms = list(word) + [_END]
        for a, b in merges:  # sequential application, training order
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    import hashlib

    got = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    for doc_id, text in rows:
        toks = []
        for w in _words(text):
            enc = model_encode(w)
            assert "".join(enc).removesuffix(_END) == w  # reconstruction
            toks.extend(enc)
        want_md5 = hashlib.md5(" ".join(toks).encode()).hexdigest()
        assert got[doc_id]["bpe_md5"] == want_md5
        assert got[doc_id]["n_bpe_tokens"] == len(toks)
        assert got[doc_id]["n_words"] == len(_words(text))
    # merging strictly compresses the repeated-word doc
    assert got[2]["n_bpe_tokens"] < sum(len(w) + 1 for w in _words(rows[2][1]))


def test_bpe_training_deterministic(spark):
    """Same corpus -> identical merge table across runs (hash-ordered
    sample + lexicographic tiebreak)."""
    from timely_spark.operators.bpe import train_bpe_merges

    docs = spark.range(50).selectExpr(
        "id AS doc_id", "concat('alpha beta gamma tok', id % 11) AS text"
    )
    m1 = train_bpe_merges(docs, num_merges=30, sample_docs=20)
    m2 = train_bpe_merges(docs, num_merges=30, sample_docs=20)
    assert m1 == m2 and 0 < len(m1) <= 30  # small vocab may exhaust


def test_ivfpq_rerank_recall_and_exactness(spark, planted):
    """Exact refine over IVFADC candidates: (a) with full probing and a
    candidate pool covering the corpus, the refined output EQUALS exact
    brute-force top-k (scores included); (b) at index settings, refined
    recall >= plain IVFPQ recall vs the exact set."""
    from timely_spark.operators.similarity import (
        cosine_topk,
        ivfpq_rerank_topk,
        ivfpq_topk,
    )

    corpus, queries = planted
    exact = cosine_topk(corpus, queries, k=5)
    full = ivfpq_rerank_topk(
        corpus, queries, dim=32, k=5, rerank=50, m=8, ksub=16,
        ncells=8, nprobe=8, sample=205,
    )
    want = {(r["query_id"], r["vec_id"], r["rank"]) for r in exact.collect()}
    got = {(r["query_id"], r["vec_id"], r["rank"]) for r in full.collect()}
    assert got == want  # candidate pool == corpus -> exact, same order

    ex = _pairs(exact)
    plain = _pairs(ivfpq_topk(
        corpus, queries, dim=32, k=5, m=8, ksub=16,
        ncells=16, nprobe=8, sample=205))
    refined = _pairs(ivfpq_rerank_topk(
        corpus, queries, dim=32, k=5, rerank=4, m=8, ksub=16,
        ncells=16, nprobe=8, sample=205))
    assert len(refined & ex) >= len(plain & ex)
    assert all((q, 1000 + q) in refined for q in range(5))
