"""Dedup operator tests: exact, MinHash+LSH, SimHash, n-gram Jaccard."""

import pytest
from pyspark.sql import functions as F

from timely_spark.operators.dedup import (
    embedding_near_dups,
    exact_dedup,
    exact_dup_groups,
    minhash_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dups,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = BASE.replace("warm", "cold")  # one-token change => high jaccard
FAR = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution pipelines"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(0, BASE), (1, BASE), (2, NEAR), (3, FAR)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    kept = exact_dedup(docs).collect()
    assert len(kept) == 3  # 0/1 collapse
    groups = exact_dup_groups(docs).collect()
    assert len(groups) == 1 and groups[0]["keep_id"] == 0 and groups[0]["dup_count"] == 2


def test_minhash_finds_near_dup(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_dedup(docs, threshold=0.5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == pytest.approx(1.0)
    assert (0, 2) in pairs and 0.5 < pairs[(0, 2)] < 1.0
    assert not any(3 in p for p in pairs)  # FAR never pairs


def test_minhash_exact_dup_always_candidates(spark, docs):
    cands = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(docs).collect()}
    assert (0, 1) in cands  # identical signatures share every band


def test_simhash_properties(spark, docs):
    rows = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert rows[0] == rows[1]  # identical text => identical fingerprint

    def ham(a, b):  # mask: fingerprints are signed 64-bit longs
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert ham(rows[0], rows[2]) < ham(rows[0], rows[3])  # near-dup closer


def test_simhash_near_dups_blocked_join(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dups(docs, max_hamming=8).collect()
    }
    assert pairs[(0, 1)] == 0
    assert (0, 3) not in pairs


def test_embedding_near_dups_blocked_gemm(spark):
    """Exact all-pairs path: hand-computable cosines; n_blocks=3 forces
    cross-block pairs, exercising the id canonicalization."""
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [2.0, 0.0, 0.0]),   # cos(0,1)=1 (scale-invariant)
        (2, [1.0, 1.0, 0.0]),   # cos(0,2)=cos(1,2)=1/sqrt(2)
        (3, [0.0, 0.0, 5.0]),   # orthogonal to all above
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dups(vecs, threshold=0.5, n_blocks=3).collect()
    }
    assert pairs[(0, 1)] == pytest.approx(1.0)
    assert pairs[(0, 2)] == pytest.approx(0.7071, abs=1e-4)
    assert pairs[(1, 2)] == pytest.approx(0.7071, abs=1e-4)
    assert not any(3 in p for p in pairs)
    assert len(pairs) == 3


def test_embedding_near_dups_lsh_finds_identical(spark):
    """planes>0 path: identical-direction vectors share every sign bit."""
    rows = [(i, [float(i % 7 + 1), float(i % 3), 1.0]) for i in range(20)]
    rows.append((100, [2.0, 0.0, 2.0]))
    rows.append((101, [4.0, 0.0, 4.0]))  # same direction as 100
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dups(vecs, threshold=0.999, planes=4).collect()
    }
    assert pairs[(100, 101)] == pytest.approx(1.0)


def test_ngram_jaccard_exact_values(spark, docs):
    d = docs.withColumn("block", F.lit(1))
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(d, block_col="block", threshold=0.0).collect()
    }
    assert pairs[(0, 1)] == pytest.approx(1.0)
    # one token changed in a 23-token doc: 3 of 21 distinct trigrams differ
    assert 0.5 < pairs[(0, 2)] < 1.0
    assert pairs[(0, 3)] < 0.05


def test_ngram_jaccard_all_pairs_guard(spark):
    """threshold<=0 is quadratic per block: blocks beyond max_block_rows
    must raise instead of silently launching an all-pairs join."""
    import pytest

    from timely_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, "blk", f"tok{i} tok{i+1} tok{i+2} common words here") for i in range(6)],
        "doc_id long, source string, text string",
    )
    with pytest.raises(ValueError, match="max_block_rows"):
        ngram_jaccard_pairs(
            docs, block_col="source", threshold=0.0, max_block_rows=3
        )
    # under the bound (or any threshold > 0) it runs
    out = ngram_jaccard_pairs(
        docs, block_col="source", threshold=0.0, max_block_rows=100
    )
    assert out.count() == 15  # all 6*5/2 pairs emitted


def test_ngram_decontaminate(spark):
    """Planted benchmark overlap: only docs containing a benchmark 4-gram
    are flagged; hit counts are exact distinct-n-gram counts."""
    from timely_spark.operators.dedup import ngram_decontaminate

    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "totally unrelated text about spark plans and shuffles"),
            # contains 'quick brown fox jumps' and 'brown fox jumps over' (2 hits)
            (2, "i saw the quick brown fox jumps over stuff yesterday"),
            # contains the full tail => many 4-gram hits
            (3, "the quick brown fox jumps over the lazy dog indeed"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_decontaminate(docs, bench, n=4).collect()}
    assert not out[1]["contaminated"] and out[1]["ngram_hits"] == 0
    assert out[2]["contaminated"] and out[2]["ngram_hits"] == 3
    assert out[3]["contaminated"] and out[3]["ngram_hits"] == 6


def test_bloom_decontaminate_matches_exact(spark):
    """Bloom prefilter + confirm join returns EXACTLY the exact-join
    answer (no false negatives; confirm join kills false positives) on
    both physical paths — codegen literal bitset and the pandas-UDF
    closure path (forced via max_literal_words=0)."""
    from timely_spark.operators.dedup import (
        bloom_decontaminate,
        ngram_decontaminate,
    )

    bench = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            # ADVICE r5: apostrophe/underscore-bearing bench text pins the
            # unified tokenizer through the bloom shingle path
            (10, "don't count what you can't measure in snake_case land"),
        ],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "totally unrelated text about spark plans and shuffles"),
            (2, "i saw the quick brown fox jumps over stuff yesterday"),
            (3, "the quick brown fox jumps over the lazy dog indeed"),
            (4, "they don't count what you can't measure around here"),
        ],
        "doc_id long, text string",
    )
    want = sorted(
        map(tuple, ngram_decontaminate(docs, bench, n=4).collect())
    )
    got_lit = sorted(
        map(tuple, bloom_decontaminate(docs, bench, n=4).collect())
    )
    got_udf = sorted(
        map(
            tuple,
            bloom_decontaminate(
                docs, bench, n=4, max_literal_words=0
            ).collect(),
        )
    )
    assert got_lit == want
    assert got_udf == want
    assert want[1][2] and want[2][2] and not want[0][2]
    # doc 4 shares the 4-gram "don't count what you" etc. with bench 10:
    # contamination detected THROUGH apostrophe-bearing shingles
    assert want[3][0] == 4 and want[3][2] and want[3][1] > 0
    # ADVICE r5: the bench-shingle cache must not outlive the operator —
    # re-running the whole thing registers NO new persisted RDDs. The
    # assertion compares RDD-id SETS, not the session-global COUNT: the
    # async ContextCleaner may collect OTHER fixtures' pins between the
    # two snapshots (exactly the race that flaked the r12 driver run,
    # VERDICT r12 item 1), which shrinks the set but can never add to
    # it — only a leak by THIS operator can.
    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    bloom_decontaminate(docs, bench, n=4).collect()
    after = set(jsc.getPersistentRDDs().keySet().toArray())
    assert after - before == set(), (
        f"bloom_decontaminate leaked persisted RDDs: {sorted(after - before)}"
    )


def test_bloom_bitset_shape(spark):
    """Bitset sizing: m rounds to a 64-bit word multiple, k in [1,16],
    and every bench shingle tests positive (zero false negatives by
    construction)."""
    from timely_spark.operators.dedup import (
        _bloom_filter_hashes,
        _shingle_hashes,
        bloom_bitset,
    )

    bench = spark.createDataFrame(
        [(0, BASE), (1, FAR)], "doc_id long, text string"
    )
    words, m_bits, k = bloom_bitset(bench, n=4, fpp=0.01)
    assert m_bits % 64 == 0 and len(words) == m_bits // 64
    assert 1 <= k <= 16
    sh = bench.select(
        F.explode(_shingle_hashes("text", 4)).alias("__h")
    ).distinct()
    n_all = sh.count()
    for mlw in (65536, 0):  # both physical paths
        kept = _bloom_filter_hashes(sh, "__h", words, m_bits, k, mlw).count()
        assert kept == n_all


def test_connected_components_chain_and_singletons(spark):
    """Pointer-jumping min-label CC: a 10-node chain collapses to one
    cluster (within the O(log n) round budget), separate components keep
    separate labels, and unpaired docs become singleton keepers."""
    from timely_spark.operators.dedup import (
        connected_components,
        dedup_cluster_assignment,
    )

    # chain 0-1-2-...-9, plus component {20, 21}, plus isolated 30
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)] + [(20, 21)], "id_a long, id_b long"
    )
    cc = {r["node"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert all(cc[i] == 0 for i in range(10))
    assert cc[20] == cc[21] == 20
    docs = spark.createDataFrame([(i,) for i in list(range(10)) + [20, 21, 30]], "doc_id long")
    out = {r["doc_id"]: r for r in dedup_cluster_assignment(docs, pairs).collect()}
    assert out[30]["cluster_id"] == 30 and out[30]["is_keeper"]
    assert sum(1 for r in out.values() if r["is_keeper"]) == 3  # 0, 20, 30


def test_chunk_dedup_shared_spans(spark):
    """Sub-document boilerplate: a 16-token license block shared by two
    otherwise-different docs is flagged; unique docs report 0."""
    from timely_spark.operators.dedup import chunk_dedup

    block = " ".join(f"lic{i}" for i in range(16))
    docs = spark.createDataFrame(
        [
            (1, block + " " + " ".join(f"a{i}" for i in range(16))),
            (2, block + " " + " ".join(f"b{i}" for i in range(16))),
            (3, " ".join(f"c{i}" for i in range(32))),
            (4, ""),  # zero tokens -> omitted
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in chunk_dedup(docs).collect()}
    assert set(rows) == {1, 2, 3}
    for d in (1, 2):
        assert rows[d]["n_chunks"] == 2
        assert rows[d]["n_shared_chunks"] == 1
        assert rows[d]["shared_chunk_frac"] == 0.5
    assert rows[3]["n_shared_chunks"] == 0 and rows[3]["shared_chunk_frac"] == 0.0
    # identical docs share every chunk, including the short tail chunk
    dup = spark.createDataFrame(
        [(1, "x y z " * 7), (2, "x y z " * 7)], ["doc_id", "text"]
    )
    r = chunk_dedup(dup).collect()
    assert all(x["shared_chunk_frac"] == 1.0 and x["n_chunks"] == 2 for x in r)


def test_chunk_dedup_rewrite(spark):
    """Global first occurrence of each chunk survives; later copies are
    cut from the rewritten text; unique content is untouched."""
    from timely_spark.operators.dedup import chunk_dedup_rewrite

    boiler = " ".join(f"b{i}" for i in range(4))  # one 4-token chunk
    uniq = lambda k: " ".join(f"u{k}x{i}" for i in range(4))  # noqa: E731
    docs = spark.createDataFrame(
        [
            (1, boiler + " " + uniq(1)),          # first: keeps both chunks
            (2, boiler + " " + uniq(2)),          # later: boiler cut
            (3, uniq(3)),                          # untouched
            (4, boiler),                           # only the dup chunk: empty
            (5, ""),                               # empty doc
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           chunk_dedup_rewrite(docs, chunk_tokens=4).collect()}
    assert out[1]["dedup_text"] == boiler + " " + uniq(1)
    assert out[2]["dedup_text"] == uniq(2)
    assert out[2]["n_chunks"] == 2 and out[2]["n_kept"] == 1
    assert out[3]["dedup_text"] == uniq(3)
    assert out[4]["dedup_text"] == "" and out[4]["n_kept"] == 0
    assert out[5]["n_chunks"] == 0 and out[5]["dedup_text"] == ""


# ---------------------------------------------------- tokenizer contract


def test_tokenizer_contract_apostrophes_underscores(spark):
    """ADVICE r5 (medium): the Spark-side tokenizer and the DuckDB oracle
    dialect must agree on apostrophe/underscore text. dedup._tokens now
    delegates to text.tokens ([^a-z0-9']+: apostrophes kept inside
    tokens, underscores split) and TOKENS_SQL mirrors it — pinned here on
    text the synthetic corpus never contains."""
    import duckdb

    from timely_spark.operators.dedup import _tokens
    from timely_spark.operators.text import TOKENS_SQL, tokens

    rows = [
        (1, "don't stop believin'"),
        (2, "snake_case_name and __dunder__ too"),
        (3, "it's the CAT'S house; o'clock strikes 9"),
        (4, "mixed don't_stop cases"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spark_tokens = {
        r["doc_id"]: r["t"]
        for r in df.select("doc_id", tokens("text").alias("t")).collect()
    }
    dedup_tokens = {
        r["doc_id"]: r["t"]
        for r in df.select("doc_id", _tokens("text").alias("t")).collect()
    }
    assert dedup_tokens == spark_tokens  # ONE contract, not two dialects
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    duck = dict(
        con.execute(
            f"SELECT doc_id, {TOKENS_SQL.format(c='text')} FROM d"
        ).fetchall()
    )
    assert duck == spark_tokens
    # the fixture exercises both characters: apostrophes kept, _ split
    assert spark_tokens[1] == ["don't", "stop", "believin'"]
    assert spark_tokens[2] == ["snake", "case", "name", "and", "dunder", "too"]


def test_dsir_oracle_parity_on_apostrophe_text(spark):
    """ADVICE r5: DSIR feature extraction vs its DuckDB oracle on
    apostrophe/underscore-bearing docs — the exact divergence the old
    \\W+ tokenizer hid. Value-exact cross-engine compare of
    (n_feats, log_weight) per doc."""
    import duckdb

    from timely_spark.operators.dsir import dsir_log_weights
    from timely_spark.operators.text import TOKENS_SQL

    rows = [
        (1, "src0", "don't shuffle what you can't broadcast"),
        (2, "src0", "snake_case identifiers don't tokenize like words"),
        (3, "src2", "the quick brown fox can't jump the lazy_dog fence"),
        (4, "src2", "don't shuffle what you can't broadcast"),
        (5, "src2", ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    target = docs.filter(F.col("source") == "src0")
    got = {
        r["doc_id"]: (r["n_feats"], r["log_weight"])
        for r in dsir_log_weights(docs, target, hash_buckets=None).collect()
    }
    toks = TOKENS_SQL.format(c="text")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, source VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    want = {
        d: (n, w)
        for d, n, w in con.execute(f"""
WITH tk AS (SELECT doc_id, source, {toks} AS t FROM documents),
feats AS (
  SELECT doc_id, source, unnest(t) AS f FROM tk
  UNION ALL
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS f
  FROM tk),
qc AS (SELECT f, count(*) AS c FROM feats GROUP BY 1),
pc AS (SELECT f, count(*) AS cp FROM feats WHERE source = 'src0' GROUP BY 1),
tot AS (SELECT (SELECT sum(c) FROM qc) AS tq,
               (SELECT count(*) FROM qc) AS v,
               (SELECT coalesce(sum(cp), 0) FROM pc) AS tp),
fw AS (SELECT qc.f,
              ln((coalesce(pc.cp, 0) + 1.0) / (tot.tp + tot.v))
              - ln((qc.c + 1.0) / (tot.tq + tot.v)) AS lw
       FROM qc LEFT JOIN pc ON qc.f = pc.f CROSS JOIN tot),
scored AS (
  SELECT feats.doc_id, count(*) AS n_feats,
         CAST(round(sum(CAST(lw AS DECIMAL(38,12))), 4) AS DOUBLE) AS log_weight
  FROM feats JOIN fw ON feats.f = fw.f GROUP BY 1)
SELECT d.doc_id,
       CAST(coalesce(s.n_feats, 0) AS BIGINT) AS n_feats,
       coalesce(s.log_weight, 0.0) AS log_weight
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
""").fetchall()
    }
    assert got == want


def test_repeated_span_stats_stride1(spark):
    """Exact substring dedup at stride-1 (Lee et al. 2022 semantics):
    a shared passage is found at DIFFERENT offsets in different docs
    (the case non-overlapping chunk hashing misses), within-doc repeats
    qualify, overlapping windows merge into one maximal span, touching
    spans coalesce, and clean/short docs report zero."""
    from timely_spark.operators.dedup import repeated_span_stats

    shared = " ".join(f"tok{i}" for i in range(20))
    rows = [
        # 31-token prefix: NOT a multiple of the 10-token chunk size, so
        # the copy at offset 31 shares no aligned chunk with doc 2's
        (1, " ".join(f"alpha{i}" for i in range(31)) + " " + shared),
        (2, shared + " " + " ".join(f"beta{i}" for i in range(10))),
        (3, " ".join(f"gamma{i}" for i in range(40))),
        (4, "rep " * 40),
        (5, "short doc"),
        # two disjoint shared spans in one doc -> 2 spans
        (6, shared + " " + " ".join(f"mid{i}" for i in range(12)) + " " + shared),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repeated_span_stats(df, window=8).collect()}
    assert (got[1]["n_dup_spans"], got[1]["dup_tokens"]) == (1, 20)
    assert got[1]["n_tokens"] == 51
    assert (got[2]["n_dup_spans"], got[2]["dup_tokens"]) == (1, 20)
    assert got[2]["dup_frac"] == pytest.approx(20 / 30, abs=1e-4)
    assert (got[3]["n_dup_spans"], got[3]["dup_tokens"]) == (0, 0)
    assert (got[4]["n_dup_spans"], got[4]["dup_tokens"]) == (1, 40)  # self-repeat
    assert (got[5]["n_dup_spans"], got[5]["n_tokens"]) == (0, 2)
    assert got[6]["n_dup_spans"] == 2 and got[6]["dup_tokens"] == 40
    # chunk-alignment blindness check: with a 10-token chunker the doc-1
    # copy (offset 30) and doc-2 copy (offset 0) share NO aligned chunk,
    # but stride-1 finds both full spans
    from timely_spark.operators.dedup import chunk_dedup

    ch = {r["doc_id"]: r for r in chunk_dedup(
        df.filter(F.col("doc_id").isin(1, 2)), chunk_tokens=10
    ).collect()}
    assert ch[1]["n_shared_chunks"] == 0  # the aligned chunker misses it


def test_substring_dedup_rewrite_global_first(spark):
    """Stride-1 substring REWRITE (Lee et al. 2022 transform): every
    duplicated span is removed except its globally-first occurrence —
    doc 1 (earlier id) keeps the passage, doc 2 loses exactly those
    tokens; clean/short docs pass through; a DISTANT within-doc repeat
    loses its second occurrence while adjacent self-overlap (merged
    into the first span) survives."""
    import hashlib

    from timely_spark.operators.dedup import substring_dedup_rewrite

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    shared = " ".join(f"tok{i}" for i in range(20))
    ua = " ".join(f"alpha{i}" for i in range(31))
    ub = " ".join(f"beta{i}" for i in range(10))
    mid = " ".join(f"mid{i}" for i in range(12))
    rows = [
        (1, ua + " " + shared),
        (2, shared + " " + ub),
        (3, " ".join(f"gamma{i}" for i in range(40))),
        (4, shared + " " + mid + " " + shared),  # distant self-repeat
        (5, "short doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in substring_dedup_rewrite(df, window=8).collect()}
    assert out[1]["n_removed_tokens"] == 0
    assert out[1]["dedup_md5"] == md5(ua + " " + shared)
    assert out[2]["n_removed_tokens"] == 20
    assert out[2]["dedup_md5"] == md5(ub)
    assert out[3]["n_removed_tokens"] == 0
    assert out[5]["n_removed_tokens"] == 0
    # doc 4: shared already first-claimed by doc 1? No — doc 1 < 4 holds
    # tok windows first, so BOTH of doc 4's copies lose; mid survives
    assert out[4]["dedup_md5"] == md5(mid)
    assert out[4]["n_removed_tokens"] == 40
    # rerun with doc 4 alone (self-repeat only): first copy keeps, the
    # distant second copy is removed
    solo = {r["doc_id"]: r for r in substring_dedup_rewrite(
        df.filter(F.col("doc_id") == 4), window=8
    ).collect()}
    assert solo[4]["dedup_md5"] == md5(shared + " " + mid)
    assert solo[4]["n_removed_tokens"] == 20


def test_substring_spans_shared_detection(spark):
    """substring_spans is the single detection core: stats and rewrite
    consumers fed a precomputed (persisted) span frame return exactly
    what their self-detecting paths return."""
    from timely_spark.operators.dedup import (
        repeated_span_stats,
        substring_dedup_rewrite,
        substring_spans,
    )

    shared = " ".join(f"tok{i}" for i in range(20))
    rows = [
        (1, " ".join(f"alpha{i}" for i in range(31)) + " " + shared),
        (2, shared + " " + " ".join(f"beta{i}" for i in range(10))),
        (3, " ".join(f"gamma{i}" for i in range(40))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = substring_spans(df, window=8, with_keeper=True).persist()
    try:
        key = lambda rs: sorted(tuple(r) for r in rs)
        assert key(repeated_span_stats(df, window=8, spans=spans).collect()) == key(
            repeated_span_stats(df, window=8).collect()
        )
        assert key(
            substring_dedup_rewrite(df, window=8, spans=spans).collect()
        ) == key(substring_dedup_rewrite(df, window=8).collect())
        # keeper flag: doc 1 holds the global first occurrence
        flags = {
            r["doc_id"]: r["__keep"]
            for r in spans.filter("__keep is not null").collect()
        }
        assert flags[1] == 1 and flags[2] == 0
    finally:
        spans.unpersist()


def test_substring_detection_single_corpus_pass(spark):
    """r12 plan pin: duplicate flagging + global-first run as WINDOW
    functions over the hash partition, so the expensive window-hash
    fold + Generate appears ONCE in the plan — the aggregate-and-join
    form it replaced evaluated it once per join side (2x screen / 4x
    keeper, the committed r12 before-plans)."""
    from timely_spark.operators.dedup import (
        repeated_span_stats,
        substring_dedup_rewrite,
    )

    rows = [(i, " ".join(f"tok{j}" for j in range(20))) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for frame in (
        repeated_span_stats(df, window=8),
        substring_dedup_rewrite(df, window=8),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Generate") == 1, plan


def test_excise_spans_original_text_verbatim(spark):
    """The curate-facing transform cuts ONLY the duplicated spans'
    character ranges: casing, punctuation and whitespace outside the
    spans stay byte-verbatim (the Lee et al. 2022 excision, per the
    r6 ADVICE fix — NOT a normalized-token rejoin)."""
    from timely_spark.operators.dedup import excise_spans_original_text

    shared = " ".join(f"tok{i}" for i in range(20))
    head = "The QUICK brown-fox, (it JUMPED)!  Over the lazy dog; twice."
    tail = "Unique TAIL text, with CAPS & punctuation... kept as-is!"
    rows = [
        (1, f"{shared} trailer one"),  # global first: untouched
        (2, f"{head} {shared} {tail}"),  # later copy: span excised
        (3, "An Entirely Clean Document."),  # no spans: verbatim
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in excise_spans_original_text(df, window=8).collect()}
    assert out[1]["text"] == f"{shared} trailer one" and not out[1]["excised"]
    assert out[3]["text"] == "An Entirely Clean Document." and not out[3]["excised"]
    got = out[2]["text"]
    assert out[2]["excised"]
    # the duplicated range is gone; everything around it is verbatim
    assert "tok0" not in got and "tok19" not in got
    assert got.startswith(head)
    assert got.endswith(tail)
    # only the span's characters were removed (plus nothing else)
    assert got == f"{head}  {tail}" or got == f"{head} {tail}"


def test_excise_fallback_flag_is_null_not_false(spark):
    """Tri-state ``excised`` (ADVICE r7): a doc whose Python
    re-tokenization cannot be trusted (length-CHANGING lowercasing —
    Turkish dotted capital I lowercases to two code points) falls back
    to its original text with excised = NULL, DISTINCT from the
    clean-doc False, so pipelines can count silent span retention."""
    from pyspark.sql import functions as F

    from timely_spark.operators.dedup import excise_spans_original_text

    shared = " ".join(f"tok{i}" for i in range(20))
    tricky = "\u0130stanbul"  # 'İstanbul': len(lower()) != len()
    assert len(tricky.lower()) != len(tricky)
    rows = [
        (1, f"{shared} trailer one"),          # keeper: untouched
        (2, f"{tricky} {shared} suffix two"),  # dup span + exotic case
        (3, "a clean document entirely"),      # no spans at all
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in excise_spans_original_text(df, window=8).collect()
    }
    # fallback: text kept VERBATIM (span retained), flag NULL
    assert out[2]["text"] == f"{tricky} {shared} suffix two"
    assert out[2]["excised"] is None
    # clean docs and keepers stay False (not NULL)
    assert out[1]["excised"] is False and out[3]["excised"] is False
    # the count a pipeline reports:
    n_fb = (
        excise_spans_original_text(df, window=8)
        .filter(F.col("excised").isNull())
        .count()
    )
    assert n_fb == 1
