"""Text-analysis operator tests: tokens, language ID, quality, fingerprint."""

import pytest
from pyspark.sql import functions as F

from timely_spark.operators.text import fingerprint, lang_id, quality_features, token_count


def test_token_count(spark):
    df = spark.createDataFrame(
        [(0, "hello world foo"), (1, ""), (2, "  spaced   out  "), (3, "don't stop")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n"] for r in df.select("doc_id", token_count("text").alias("n")).collect()}
    assert got == {0: 3, 1: 0, 2: 2, 3: 2}


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and it is happy"),
            (1, "der hund ist nicht in das haus und die katze"),
            (2, "le chat est dans la maison pour les vacances"),
            (3, "el perro es un animal en la casa por que si"),
            (4, "xyzzy qwerty asdf"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang"] for r in df.select("doc_id", lang_id("text").alias("lang")).collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "es", 4: "unknown"}


def test_quality_features(spark):
    good = "the quick brown fox jumps over the lazy dog and it is a fine day for running in the park"
    junk = "$$$ !!! ### @@@ %%% ^^^ &&& *** ((( )))"
    df = spark.createDataFrame([(0, good), (1, junk)], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in quality_features(df).collect()}
    assert rows[0]["quality_score"] > 0.8
    assert rows[1]["quality_score"] < 0.3
    assert rows[1]["punct_ratio"] > 0.5
    assert rows[0]["stopword_ratio"] > 0.2


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma   alpha beta"), (2, "alpha beta delta")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["fp"] for r in df.select("doc_id", fingerprint("text").alias("fp")).collect()}
    assert got[0] == got[1]  # word order / whitespace invariant
    assert got[0] != got[2]


def test_bpe_token_count_pieces(spark):
    """GPT-2-style pre-tokenizer pieces: contractions split, digits and
    punctuation separate from letters, whitespace runs collapse."""
    from timely_spark.operators.text import bpe_token_count

    df = spark.createDataFrame(
        [(0, "It's a test, isn't it? 123 abc-def  end "), (1, ""), (2, "hello")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", bpe_token_count("text").alias("n")).collect()
    }
    # It|'s| a| test|,| isn|'t| it|?| 123| abc|-|def| |end| => 16 pieces
    assert got == {0: 16, 1: 0, 2: 1}


def test_pii_scrub_and_counts(spark):
    from timely_spark.operators.text import pii_counts, pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@foo-bar.org or x@y.io, call 555-123-4567"),
            (2, "server at 192.168.0.1 and 10.0.0.255, no mail"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id", *pii_counts("text"), pii_scrub("text").alias("s")
        ).collect()
    }
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (2, 1, 0)
    assert out[1]["s"] == "mail <EMAIL> or <EMAIL>, call <PHONE>"
    assert (out[2]["n_email"], out[2]["n_ipv4"]) == (0, 2)
    assert out[2]["s"] == "server at <IPV4> and <IPV4>, no mail"
    assert out[3]["s"] == "nothing sensitive here"


def test_repetition_signals(spark):
    from timely_spark.operators.text import repetition_signals

    docs = spark.createDataFrame(
        [
            (1, "a b\na b\nc d"),          # 1 dup line of 3; grams: 'a b'x2,'b a','b c','c d' of 6
            (2, "x y z w"),                 # no repetition
            (3, "spam spam spam spam"),     # 'spam spam' x3 of 3
            (4, "one"),                     # no 2-grams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert abs(out[1]["dup_line_frac"] - round(1 / 3, 4)) < 1e-9
    assert out[2]["dup_line_frac"] == 0.0 and out[2]["top_2gram_frac"] == round(1 / 3, 4)
    assert out[3]["top_2gram_frac"] == 1.0
    assert out[4]["top_2gram_frac"] == 0.0


def test_token_frequencies(spark):
    from timely_spark.operators.text import token_frequencies

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a c b")], "doc_id long, text string"
    )
    rows = [(r["token"], r["n"]) for r in token_frequencies(docs, k=2).collect()]
    assert rows == [("a", 3), ("b", 2)]


def test_hash_sample_deterministic(spark):
    from timely_spark.operators.text import hash_sample

    docs = spark.createDataFrame(
        [(i, f"document number {i}") for i in range(300)], "doc_id long, text string"
    )
    a = {r["doc_id"] for r in hash_sample(docs, "20").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, "20").collect()}
    assert a == b and 0 < len(a) < 300  # reproducible, rate ~12.5%
    # duplicates of the same text sample together (content-keyed)
    dup = spark.createDataFrame(
        [(1, "same text"), (2, "same text")], "doc_id long, text string"
    )
    kept = {r["doc_id"] for r in hash_sample(dup, "80").collect()}
    assert kept in (set(), {1, 2})


def test_extract_domains_and_blocklist(spark):
    from timely_spark.operators.text import domain_blocklist_filter, extract_domains

    docs = spark.createDataFrame(
        [
            (1, "see https://Foo.Example.com/a?b=c and http://bar.org/x plain text"),
            (2, "spam from https://evil.example.net/login"),
            (3, "no links at all"),
        ],
        "doc_id long, text string",
    )
    doms = {r["doc_id"]: sorted(r["d"]) for r in docs.select("doc_id", extract_domains("text").alias("d")).collect()}
    assert doms[1] == ["bar.org", "foo.example.com"]
    assert doms[2] == ["evil.example.net"] and doms[3] == []
    kept = {r["doc_id"] for r in domain_blocklist_filter(docs, ["EVIL.example.net"]).collect()}
    assert kept == {1, 3}


def test_bigram_novelty_screen(spark):
    """Boilerplate docs (bigrams repeated across the corpus) score near
    0; a one-off doc scores 1.0; exact integer ratios, no float drift."""
    from timely_spark.operators.text import bigram_novelty

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "the quick brown fox jumps over the lazy dog"),
            (4, "completely original sentence with unique words here"),
            (5, "one"),  # <2 tokens: no bigrams, no output row
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in bigram_novelty(docs, rare_max_count=2).collect()}
    assert set(rows) == {1, 2, 3, 4}
    # boilerplate: every bigram occurs 3x in the corpus (> rare_max_count)
    for d in (1, 2, 3):
        assert rows[d]["n_rare"] == 0 and rows[d]["novelty"] == 0.0
    # the unique doc: every bigram occurs exactly once
    assert rows[4]["novelty"] == 1.0
    assert rows[4]["n_bigrams"] == 6


def test_gopher_rules(spark):
    """Each Gopher rule (Rae et al. 2021 A1.1) exercised by a targeted doc."""
    from timely_spark.operators.text import gopher_rules

    filler = " ".join(
        ["the be to of and that have with"] + ["word"] * 52
    )  # 60 words, all stopword rules satisfied
    docs = spark.createDataFrame(
        [
            (1, filler),  # passes everything
            (2, "too short but the stopwords be of and here"),  # n_words < 50
            (3, " ".join(["###"] * 30 + ["the be word"] * 20)),  # symbol ratio
            (4, "\n".join(["- bullet line"] * 10) + "\nthe be"),  # bullets
            (5, " ".join(["123"] * 55) + " the be"),  # alpha fraction
            (6, " ".join(["word"] * 60)),  # no required stopwords
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    assert rows[1]["gopher_pass"] is True
    assert rows[1]["n_words"] == 60 and rows[1]["stop_hits"] == 8
    assert rows[2]["gopher_pass"] is False and rows[2]["n_words"] < 50
    assert rows[3]["symbol_word_ratio"] > 0.1 and not rows[3]["gopher_pass"]
    assert rows[4]["bullet_line_frac"] == round(10 / 11, 4)
    assert not rows[4]["gopher_pass"]  # bullet frac ok (<=0.9) but words < 50
    assert rows[5]["alpha_word_frac"] < 0.8 and not rows[5]["gopher_pass"]
    assert rows[6]["stop_hits"] == 0 and not rows[6]["gopher_pass"]
    # ellipsis-line rule: 2 of 4 lines end with ...
    docs2 = spark.createDataFrame(
        [(7, "read more...\nplain line\nand then…\nanother plain")],
        ["doc_id", "text"],
    )
    r7 = gopher_rules(docs2).collect()[0]
    assert r7["ellipsis_line_frac"] == 0.5 and not r7["gopher_pass"]


def test_seq_pack_concat_and_chop(spark):
    """Packing is a prefix sum: spans, offsets, and boundary splits are
    exact, and bucket boundaries don't perturb the stream."""
    from timely_spark.operators.pack import seq_pack

    # doc i has i+1 words -> i+2 units with EOS
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (i + 1))) for i in range(10)],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in seq_pack(docs, seq_len=8, bucket_docs=3).collect()}
    cum = 0
    for i in range(10):
        n = i + 2
        assert rows[i]["n_units"] == n
        assert rows[i]["pack_first"] == cum // 8
        assert rows[i]["pack_offset"] == cum % 8
        cum += n
        assert rows[i]["pack_last"] == (cum - 1) // 8
    # doc 0 (2 units) and doc 1 (3 units) share pack 0; doc 2 (4 units,
    # stream positions 5..9) crosses the pack-0/1 boundary
    assert rows[0]["pack_first"] == rows[1]["pack_first"] == 0
    assert rows[2]["pack_first"] == 0 and rows[2]["pack_last"] == 1
    # bucket size must not affect placement (two-phase scan correctness)
    alt = {r["doc_id"]: r for r in seq_pack(docs, seq_len=8, bucket_docs=1000).collect()}
    for i in range(10):
        assert tuple(alt[i]) == tuple(rows[i])


def test_domain_mixture_rates(spark):
    """T=2 closed form: rate_d = sqrt(n_min/n_d); rarest domain keeps
    all; realized keep fractions track the rates; decisions reproducible."""
    from timely_spark.operators.mixture import domain_mixture

    rows = [(i, "web") for i in range(400)]
    rows += [(1000 + i, "books") for i in range(100)]
    rows += [(2000 + i, "code") for i in range(25)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"]).withColumn(
        "text", F.lit("x")
    )
    out = domain_mixture(docs, temperature=2.0).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert {r["rate"] for r in by_src["code"]} == {1.0}
    assert all(r["kept"] for r in by_src["code"])
    assert {r["rate"] for r in by_src["books"]} == {0.5}
    assert {r["rate"] for r in by_src["web"]} == {0.25}
    kept_web = sum(r["kept"] for r in by_src["web"]) / 400
    kept_books = sum(r["kept"] for r in by_src["books"]) / 100
    assert abs(kept_web - 0.25) < 0.1 and abs(kept_books - 0.5) < 0.15
    # deterministic across invocations
    again = domain_mixture(docs, temperature=2.0).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    with pytest.raises(ValueError):
        domain_mixture(docs, temperature=1.0)


def test_oov_rate_against_vocab(spark):
    """Top-k vocab covers the frequent tokens; rare tokens count as OOV
    at occurrence level; empty docs rate 0."""
    from timely_spark.operators.text import oov_rate

    docs = spark.createDataFrame(
        [
            (1, "aa aa aa bb bb cc"),     # cc is rank 3
            (2, "aa bb zz qq"),           # zz qq are singletons
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    # vocab_k=2 -> vocab = {aa, bb}
    rows = {r["doc_id"]: r for r in oov_rate(docs, vocab_k=2).collect()}
    assert rows[1]["n_tokens"] == 6 and rows[1]["n_oov"] == 1
    assert rows[1]["oov_rate"] == round(1 / 6, 4)
    assert rows[2]["n_oov"] == 2 and rows[2]["oov_rate"] == 0.5
    assert rows[3]["n_tokens"] == 0 and rows[3]["oov_rate"] == 0.0


def test_canonical_url_variants(spark):
    """All spellings of the same page canonicalize identically; distinct
    pages stay distinct."""
    from timely_spark.operators.text import canonical_url

    urls = [
        (1, "https://WWW.Example.com/path/?utm_source=x&b=2&a=1"),
        (2, "https://example.com/path?a=1&b=2#frag"),
        (3, "https://example.com:443/path/?b=2&a=1&fbclid=zz"),
        (4, "http://example.com:80/"),
        (5, "http://example.com"),
        (6, "https://example.com/other"),
        (7, "https://example.com/path?a=2&b=2"),  # different param VALUE
    ]
    df = spark.createDataFrame(urls, ["doc_id", "url"])
    got = {
        r["doc_id"]: r["c"]
        for r in df.select("doc_id", canonical_url("url").alias("c")).collect()
    }
    assert got[1] == got[2] == got[3] == "https://example.com/path?a=1&b=2"
    assert got[4] == got[5] == "http://example.com/"
    assert got[6] == "https://example.com/other"
    assert got[7] != got[1]


def test_canonical_url_degenerate_passthrough(spark):
    """Scheme-less / relative / mailto URLs — where no '<scheme>://<host>'
    matches — pass through UNCHANGED instead of collapsing to a shared
    '://'-prefixed value (which would merge unrelated docs when used as a
    dedup key). Spark and DuckDB renderings agree."""
    import duckdb

    from timely_spark.operators.text import canonical_url, canonical_url_sql

    urls = [
        (1, "example.com/a"),
        (2, "other.org/b"),
        (3, "mailto:user@example.com"),
        (4, "/relative/path?x=1"),
        (5, "//proto-relative.example.com/x"),
        (6, ""),
        (7, "https://real.example.com/p/"),  # control: still canonicalizes
    ]
    df = spark.createDataFrame(urls, ["doc_id", "url"])
    got = {
        r["doc_id"]: r["c"]
        for r in df.select("doc_id", canonical_url("url").alias("c")).collect()
    }
    for i, u in urls[:6]:
        assert got[i] == u, (i, u, got[i])
    assert len({got[i] for i, _ in urls}) == len(urls)  # nothing merged
    assert got[7] == "https://real.example.com/p"
    con = duckdb.connect()
    con.execute("CREATE TABLE u(doc_id INT, url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?, ?)", urls)
    duck = dict(
        con.execute(
            f"SELECT doc_id, {canonical_url_sql('url')} FROM u"
        ).fetchall()
    )
    assert duck == got


def test_normalize_text_folds_unicode(spark):
    """Curly quotes/dashes/ellipsis fold to ASCII; exotic and zero-width
    spaces collapse; control chars strip; idempotent."""
    from timely_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [
            (1, "a’b “c”  x–y… e f​ g\x07h"),
            (2, "already plain text"),
            (3, "  nb sp 　ideo  "),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["n"] for r in df.select("doc_id", normalize_text("text").alias("n")).collect()}
    assert got[1] == "a'b \"c\" x-y... e f gh"
    assert got[2] == "already plain text"
    assert got[3] == "nb sp ideo"
    # idempotent: normalizing the normalized output is a no-op
    df2 = spark.createDataFrame([(k, v) for k, v in got.items()], ["doc_id", "text"])
    again = {r["doc_id"]: r["n"] for r in df2.select("doc_id", normalize_text("text").alias("n")).collect()}
    assert again == got


def test_curation_pipeline_composition(spark, tmp_path):
    """The one-plan curation rollup: unicode variants dedup together
    (normalize feeds the keeper hash), component counts bound survivors,
    and mixture decisions match doc_domain_mixture's md5 convention."""
    import __spark_entry__ as e

    filler = " ".join(["the be to of and that have with"] + ["word"] * 52)
    rows = [
        (1, "web", filler + " it’s fine"),    # curly apostrophe
        (2, "web", filler + " it's fine"),    # ASCII twin -> same nmd5
        (3, "web", "too short the be"),
        (4, "books", filler),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"]).withColumn(
        "lang", F.lit("en")
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r["source"]: r for r in e.q_doc_curation(spark, str(tmp_path)).collect()}
    web, books = out["web"], out["books"]
    assert web["n_docs"] == 3 and web["n_keepers"] == 2  # 1 and 2 merged
    assert web["n_gopher_pass"] == 2  # doc 3 too short
    assert books["n_docs"] == 1 and books["n_kept_mixture"] == 1  # rarest: rate 1
    for r in out.values():
        assert r["n_survivors"] <= min(
            r["n_gopher_pass"], r["n_keepers"], r["n_kept_mixture"]
        )


def test_classifier_score_hashed_features(spark):
    """Custom weights: docs full of the positive token score near 1,
    negative near 0, empty exactly 0.5; bucket arithmetic matches the
    Python md5 reference."""
    import hashlib

    from timely_spark.operators.text import classifier_score

    D = 64
    bucket = lambda t: int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % D
    w = [0.0] * D
    w[bucket("good")] = 1.0
    w[bucket("bad")] = -1.0
    assert bucket("good") != bucket("bad")
    docs = spark.createDataFrame(
        [(1, "good " * 20), (2, "bad " * 20), (3, ""), (4, "good bad")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in classifier_score(docs, weights=w).collect()}
    assert rows[1]["mean_score"] == 1.0 and rows[1]["p_keep"] > 0.9
    assert rows[2]["mean_score"] == -1.0 and rows[2]["p_keep"] < 0.1
    assert rows[3]["mean_score"] == 0.0 and rows[3]["p_keep"] == 0.5
    assert rows[4]["mean_score"] == 0.0


def test_write_packed_corpus_shards(spark, tmp_path):
    """Shard directories partition the pack space; read-back placement
    equals seq_pack's answer."""
    from timely_spark.operators.pack import seq_pack, write_packed_corpus

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 30)) for i in range(40)], ["doc_id", "text"]
    )
    out = str(tmp_path / "packed")
    n_shards = write_packed_corpus(
        docs, out, seq_len=64, packs_per_shard=4
    )
    # 40 docs x 31 units = 1240 units -> 20 packs of 64 -> 5 shards of 4
    assert n_shards == 5
    back = spark.read.parquet(out)
    want = {
        r["doc_id"]: (r["pack_first"], r["pack_offset"])
        for r in seq_pack(docs, seq_len=64).collect()
    }
    got = {
        r["doc_id"]: (r["pack_first"], r["pack_offset"]) for r in back.collect()
    }
    assert got == want
    # shard column consistent with pack_first
    for r in back.collect():
        assert r["shard"] == r["pack_first"] // 4


def test_curate_cli_pipeline(spark, tmp_path):
    """tools/curate.py end-to-end: planted exact dup collapses, stats
    stage counts are consistent, shards written and readable."""
    import sys

    sys.path.insert(0, "tools")
    from curate import curate

    filler = " ".join(["sample text words"] * 30)
    rows = [(i, "web", filler + f" unique{i}") for i in range(20)]
    rows.append((100, "web", filler + " unique3"))  # exact dup of doc 3
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = str(tmp_path / "packed")
    stats = curate(spark, str(tmp_path), out, seq_len=128, min_p_keep=0.0)
    assert stats["n_input"] == 21
    assert stats["stage_pass"]["dedup_keeper"] == 20  # dup lost its slot
    assert stats["n_survivors"] <= 20 and stats["n_survivors"] > 0
    assert stats["n_shards"] >= 1
    back = spark.read.parquet(out)
    assert back.count() == stats["n_survivors"]
    assert 100 not in {r["doc_id"] for r in back.collect()}


def test_curate_cli_uri_out_stage_cleanup(spark, tmp_path):
    """VERDICT r11 #5: stage cleanup goes through the Hadoop FileSystem
    API, so it works when ``out`` is a URI (file://, hdfs://, s3a://) —
    a driver-local shutil.rmtree would silently no-op on a URI path and
    retain a corpus copy per stage. Run with a file:// out dir and
    require the _stages sibling to be GONE after success."""
    import os
    import sys

    sys.path.insert(0, "tools")
    from curate import curate

    filler = " ".join(["sample text words"] * 30)
    rows = [(i, "web", filler + f" unique{i}") for i in range(20)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out_local = str(tmp_path / "packed_uri")
    out = "file://" + out_local
    stats = curate(spark, str(tmp_path), out, seq_len=128, min_p_keep=0.0)
    assert stats["n_shards"] >= 1
    assert spark.read.parquet(out).count() == stats["n_survivors"]
    # the URI-addressed stage dir was deleted through the Hadoop FS API
    assert not os.path.exists(out_local + "_stages"), (
        "stage dir survived a successful run with a URI out path"
    )


def test_curate_cli_budget_and_shuffle(spark, tmp_path):
    """--token-budget trims each source to its quality-ranked token
    budget; --shuffle-seed packs by deterministic shuffled position
    (dense pos ids, identical layout across runs with the same seed)."""
    import sys

    sys.path.insert(0, "tools")
    from curate import curate

    filler = " ".join(["sample text words"] * 30)
    rows = [
        (i, "web" if i % 2 == 0 else "books", filler + f" unique{i}")
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = str(tmp_path / "packed")
    stats = curate(
        spark, str(tmp_path), out, seq_len=128, min_p_keep=0.0,
        token_budget=300, shuffle_seed="s1",
    )
    assert stats["stage_pass"]["screen"] == 20
    assert 0 < stats["n_survivors"] < 20  # budget actually cut
    back = spark.read.parquet(out)
    assert back.count() == stats["n_survivors"]
    poss = sorted(r["pos"] for r in back.collect())
    assert poss == list(range(len(poss)))  # dense shuffled positions
    out2 = str(tmp_path / "packed2")
    curate(
        spark, str(tmp_path), out2, seq_len=128, min_p_keep=0.0,
        token_budget=300, shuffle_seed="s1",
    )
    layout = lambda p: sorted(  # noqa: E731
        (r["pos"], r["pack_first"], r["text"][:40])
        for r in spark.read.parquet(p).collect()
    )
    assert layout(out) == layout(out2)


def test_curate_cli_warc_input(spark, tmp_path):
    """The curation CLI runs off a raw WARC crawl end to end."""
    import sys

    sys.path.insert(0, "tools")
    from curate import curate

    from timely_spark.sources.corpus import make_warc

    body = ("<html><body>" + "sample words here " * 40 + "</body></html>").encode()
    warc = make_warc(
        [(f"https://site{i % 3}.example.com/p{i}", body + str(i).encode()) for i in range(9)],
        gzip_members=True,
    )
    (tmp_path / "crawl").mkdir()
    (tmp_path / "crawl" / "seg.warc.gz").write_bytes(warc)
    out = str(tmp_path / "packed")
    stats = curate(
        spark, str(tmp_path / "crawl"), out,
        seq_len=256, min_p_keep=0.0, fmt="warc",
    )
    assert stats["n_input"] == 9 and stats["n_survivors"] > 0
    back = spark.read.parquet(out)
    assert back.count() == stats["n_survivors"]


def test_canonical_url_fragment_with_question_mark(spark):
    """A '?' inside a fragment is NOT a query: fragment strips first."""
    from timely_spark.operators.text import canonical_url

    df = spark.createDataFrame(
        [(1, "https://example.com/p#sec?x=1"), (2, "https://example.com/p")],
        ["doc_id", "url"],
    )
    got = {r["doc_id"]: r["c"] for r in df.select("doc_id", canonical_url("url").alias("c")).collect()}
    assert got[1] == got[2] == "https://example.com/p"


def test_tokens_null_text_is_empty(spark):
    """NULL text counts as zero tokens (not Spark's size()=-1), and the
    Gopher screen treats it as an empty doc."""
    from timely_spark.operators.text import gopher_rules, token_count

    df = spark.createDataFrame([(1, None), (2, "a b")], "doc_id long, text string")
    got = {r["doc_id"]: r["n"] for r in df.select("doc_id", token_count("text").alias("n")).collect()}
    assert got == {1: 0, 2: 2}
    g = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert g[1]["n_words"] == 0 and g[1]["gopher_pass"] is False


def test_jsonl_duplicate_rows_get_unique_ids(spark, tmp_path):
    from timely_spark.sources.corpus import read_jsonl_documents

    p = tmp_path / "dup.jsonl"
    p.write_text('{"text": "same"}\n{"text": "same"}\n{"text": "same"}\n')
    rows = read_jsonl_documents(spark, str(p)).collect()
    assert len(rows) == 3
    assert len({r["doc_id"] for r in rows}) == 3  # unique despite identical text


def test_curate_cli_decontaminate_dsir_bpe(spark, tmp_path):
    """The r5 stages through the CLI: --bench drops docs overlapping the
    benchmark 8-grams; --dsir-target/--dsir-keep trims to the top-N
    target-like docs; --bpe-tokens budgets in real BPE token space."""
    import sys

    sys.path.insert(0, "tools")
    from curate import curate

    filler = " ".join(["sample text words"] * 30)
    rows = [
        (i, "web" if i % 2 == 0 else "wiki", filler + f" unique{i} " + f"tail{i} " * 10)
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    # bench shares doc 5's full text -> doc 5 (and only exact-overlap
    # docs) must be dropped; the shared filler prefix contaminates all,
    # so bench uses only doc 5's unique tail words
    bench = spark.createDataFrame(
        [(0, f"unique5 " + "tail5 " * 10)], ["doc_id", "text"]
    )
    bench.write.parquet(str(tmp_path / "bench.parquet"))
    out = str(tmp_path / "packed")
    stats = curate(
        spark, str(tmp_path), out, seq_len=128, min_p_keep=0.0,
        bench_path=str(tmp_path / "bench.parquet"),
        dsir_target="wiki", dsir_keep=8, bpe_tokens=True,
        token_budget=10_000,
    )
    assert stats["stage_pass"]["screen"] == 20
    assert stats["n_decontaminated"] == 19  # doc 5 dropped
    assert stats["n_dsir"] == 8
    back = spark.read.parquet(out)
    ids = {r["doc_id"] for r in back.collect()}
    assert 5 not in ids and len(ids) == stats["n_survivors"] <= 8


def test_boilerplate_main_text(spark):
    """jusText-lite extraction: prose blocks survive; link-dense nav /
    footer and short blocks drop; script/style/comment subtrees never
    leak; output whitespace is normalized."""
    from timely_spark.operators.boilerplate import main_text

    prose = ("this is a long enough paragraph of body prose with plenty "
             "of ordinary words to clear the word floor easily")
    html = (
        '<html><head><script>var x = "<p>not text</p>";</script>'
        "<style>p{color:red}</style></head><body>"
        '<div id="nav"><a href="/">Home</a> <a href="/a">About</a></div>'
        "<!-- hidden comment words one two three four five six seven eight nine ten -->"
        f"<p>{prose}</p>"
        '<ul><li><a href="/x">link one here</a></li></ul>'
        f"<div>second real paragraph {prose}</div>"
        '<div class="footer"><a href="/tos">Terms</a> (c) example</div>'
        "</body></html>"
    )
    df = spark.createDataFrame([(1, html), (2, "<p>short</p>"), (3, prose)],
                               "doc_id long, text string")
    out = {r["doc_id"]: r["main"] for r in
           df.select("doc_id", main_text("text").alias("main")).collect()}
    assert out[1] == f"{prose} second real paragraph {prose}"
    assert out[2] == ""          # below the word floor
    assert out[3] == prose       # tag-free input passes through whole


def test_boilerplate_sql_parity(spark):
    """main_text_sql (DuckDB) == main_text (Spark) value-exactly over a
    grid of tricky inputs — the oracle-dialect contract."""
    import duckdb

    from timely_spark.operators.boilerplate import main_text, main_text_sql

    prose = " ".join(f"word{i}" for i in range(15))
    cases = [
        (0, f"<p>{prose}</p>"),
        (1, f'<div><a href="/">{prose}</a></div>'),          # all-link: drop
        (2, f"<P>{prose.upper()}</P>"),                       # case-insensitive tags
        (3, f"text before<br>{prose}<br/>short tail"),
        (4, "<script>" + prose + "</script>"),               # script never leaks
        (5, f"<td>{prose}</td><tr>{prose} extra</tr>"),
        (6, ""),
        (7, f"<p>{prose} <a href=x>two words</a> {prose}</p>"),  # low density: keep
        # ADVICE r5: <abbr>/<address>/<audio> are NOT anchors — their
        # content must not count as link text (the old <a[^>]*> matched them)
        (8, f"<p><abbr>NASA</abbr> <address>HQ</address> {prose}</p>"),
        (9, f"<p><a >{prose}</a> tail words</p>"),               # space-attr anchor still drops
    ]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    got = {r["doc_id"]: r["main"] for r in
           df.select("doc_id", main_text("text").alias("main")).collect()}
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame(cases, columns=["doc_id", "text"]))
    want = dict(con.sql(
        f"SELECT doc_id, {main_text_sql('text')} AS m FROM t"
    ).fetchall())
    assert got == want
    # behavioral pins (parity alone can't catch a shared-regex bug):
    assert got[8] == f"NASA HQ {prose}"   # abbr/address content is prose
    assert got[9] == ""                   # real anchor with space-attr drops


def test_warc_reader_main_content(spark, tmp_path):
    """main_content=True strips nav/footer boilerplate the naive
    tag-strip keeps; doc ids are identical across both modes (ids hash
    the RAW body, not the extraction)."""
    from timely_spark.sources.corpus import make_warc, read_warc_documents

    prose = " ".join(f"body word{i}" for i in range(20))
    html = (
        '<html><body><div id="nav"><a href="/">Home</a> <a href="/a">About</a></div>'
        f"<p>{prose}</p>"
        '<div class="footer"><a href="/tos">Terms</a></div></body></html>'
    ).encode()
    warc = make_warc([("https://ex.example.com/p1", html)])
    (tmp_path / "c").mkdir()
    (tmp_path / "c" / "a.warc").write_bytes(warc)
    naive = read_warc_documents(spark, str(tmp_path / "c")).collect()
    main = read_warc_documents(
        spark, str(tmp_path / "c"), main_content=True
    ).collect()
    assert len(naive) == len(main) == 1
    assert {r["doc_id"] for r in naive} == {r["doc_id"] for r in main}
    assert "Home" in naive[0]["text"] and "Terms" in naive[0]["text"]
    assert main[0]["text"] == prose  # boilerplate gone, prose exact


def test_trained_classifier_learns_and_serves(spark):
    """Train-with-MLlib, serve-in-codegen: weights learned on a planted
    token signal separate the classes through the UNCHANGED serving
    expression, and the served probability matches MLlib's own
    predictProbability to float precision (the alignment contract)."""
    import pytest

    from timely_spark.operators.classifier import (
        hashed_mean_features,
        train_classifier_weights,
    )
    from timely_spark.operators.text import classifier_score

    filler = "common words shared by every document in the corpus"
    rows = []
    for i in range(60):
        pos = i % 2 == 0
        marker = " quality signal token" if pos else " junkmark noise blob"
        rows.append((i, filler + marker + f" tail{i % 5}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    label = F.col("doc_id") % 2 == 0
    w = train_classifier_weights(docs, label, dim=128)
    assert len(w) == 128
    scored = {r["doc_id"]: r["p_keep"] for r in
              classifier_score(docs, weights=w).collect()}
    pos_scores = [scored[i] for i in range(60) if i % 2 == 0]
    neg_scores = [scored[i] for i in range(60) if i % 2 == 1]
    assert min(pos_scores) > max(neg_scores)  # clean separation
    # serving parity vs MLlib's own probability
    from pyspark.ml.classification import LogisticRegression

    feats = hashed_mean_features(docs, label, dim=128)
    model = LogisticRegression(
        maxIter=30, regParam=0.001, fitIntercept=False, standardization=False
    ).fit(feats)
    probs = {r["doc_id"]: float(r["probability"][1])
             for r in model.transform(feats).collect()}
    for i in (0, 1, 30, 59):
        # serving rounds weights to 6dp and p_keep to 6dp
        assert scored[i] == pytest.approx(probs[i], abs=5e-3)


def test_trained_classifier_single_class_labels_fail_loud(spark):
    """Single-class weak labels must raise (r10: the curate x10
    rehearsal's Gopher labels passed 0 synthetic docs — a silent
    degenerate fit zeroed the whole corpus downstream; curate's
    fallback_static path catches this ValueError)."""
    import pytest

    from timely_spark.operators.classifier import train_classifier_weights

    docs = spark.createDataFrame(
        [(i, f"some text body {i}") for i in range(20)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="single-class"):
        train_classifier_weights(docs, F.lit(False), dim=64)
    with pytest.raises(ValueError, match="single-class"):
        train_classifier_weights(docs, F.lit(True), dim=64)


def test_curate_cli_learned_filter(spark, tmp_path):
    """--learned-filter trains weights on Gopher weak labels and still
    produces a coherent pipeline run (counts consistent, output
    readable)."""
    import sys

    sys.path.insert(0, "tools")
    from curate import curate

    filler = ("plenty of ordinary readable prose words that the gopher "
              "rules accept without any complaint at all in this row ")
    junk = "@@ ## !! %% zz "  # symbol-heavy: fails the Gopher rules
    rows = [
        (i, "web",
         junk * 40 if i % 4 == 0 else filler * 3 + f"unique{i}")
        for i in range(25)
    ]
    # both label classes must exist in the 1-in-5 (doc_id % 5 == 0)
    # training sample — junk lands on % 4 so the sample {0,5,10,15,20}
    # mixes junk (0, 20) with prose (5, 10, 15); single-class weak
    # labels now fail loudly into fallback_static (r10 guard)
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = str(tmp_path / "packed")
    stats = curate(spark, str(tmp_path), out, seq_len=128, min_p_keep=0.0,
                   learned_filter=True)
    assert stats["learned_filter"] is True
    assert stats["n_survivors"] > 0
    assert spark.read.parquet(out).count() == stats["n_survivors"]


def test_curate_cli_perplexity_screen(spark, tmp_path):
    """--ppl-ref/--max-log-ppl: the CCNet perplexity stage drops
    off-reference gibberish while reference-like prose survives."""
    import sys

    sys.path.insert(0, "tools")
    from curate import curate

    prose = " ".join(["clean simple words about spark partitions"] * 12)
    rows = [(i, "wiki", prose + f" unique{i}") for i in range(10)] + [
        (100 + i, "web", " ".join(f"zx{j}q{i} wq{j}z" for j in range(40)))
        for i in range(5)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = str(tmp_path / "packed")
    stats = curate(
        spark, str(tmp_path), out, seq_len=128, min_p_keep=0.0,
        ppl_ref="wiki", max_log_ppl=2.0,
    )
    # the T=2 mixture stage may thin the majority domain; the ppl screen
    # must then drop every surviving gibberish web doc and keep every
    # surviving wiki doc
    assert 0 < stats["n_ppl"] < stats["stage_pass"]["screen"]
    back = spark.read.parquet(out)
    ids = {r["doc_id"] for r in back.collect()}
    assert ids and all(i < 100 for i in ids)  # only wiki docs survive
    assert len(ids) == stats["n_ppl"] == stats["n_survivors"]


def test_curate_cli_minhash_dedup(spark, tmp_path):
    """--minhash-dedup: near-identical doc pairs collapse to the min-id
    keeper while distinct docs all survive."""
    import sys

    sys.path.insert(0, "tools")
    from curate import curate

    rows = []
    for i in range(6):
        # docs 2i and 2i+1 are near-identical twins (one token changed);
        # different i's share no 3-shingles (fully disjoint token streams)
        t = " ".join(f"w{i}x{j} v{i}y{j} u{i}z{j}" for j in range(12))
        rows.append((2 * i, "web", t))
        rows.append((2 * i + 1, "web", t.replace(f"u{i}z7", "changed")))
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = str(tmp_path / "packed")
    stats = curate(
        spark, str(tmp_path), out, seq_len=128, min_p_keep=0.0,
        minhash_threshold=0.5,
    )
    assert stats["n_minhash"] == 6  # one keeper per twin pair
    back = spark.read.parquet(out)
    assert {r["doc_id"] for r in back.collect()} == {0, 2, 4, 6, 8, 10}


def test_dedup_lines_first_occurrence_order(spark):
    """Intra-doc line dedup keeps first occurrences in order, counts
    removals, and leaves unique-line docs untouched."""
    from timely_spark.operators.text import dedup_lines

    docs = spark.createDataFrame(
        [
            (1, "nav\nbody one\nnav\nbody two\nfooter\nnav"),
            (2, "a\nb\nc"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    d = dedup_lines("text")
    out = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id", d["cleaned"].alias("c"), d["n_lines"].alias("n"),
            d["n_removed"].alias("rm"),
        ).collect()
    }
    assert out[1]["c"] == "nav\nbody one\nbody two\nfooter"
    assert out[1]["n"] == 6 and out[1]["rm"] == 2
    assert out[2]["c"] == "a\nb\nc" and out[2]["rm"] == 0
    assert out[3]["c"] == "" and out[3]["n"] == 1  # split('') -> ['']
    assert out[4]["c"] == "" and out[4]["rm"] == 0  # NULL coalesces


def test_curate_cli_line_dedup(spark, tmp_path):
    """--line-dedup strips repeated intra-doc lines BEFORE every other
    stage: the packed output text is the cleaned text, and two docs
    that become identical after line-dedup collapse to one keeper in
    the exact-dedup stage (proof the cleaning ran first)."""
    import sys

    sys.path.insert(0, "tools")
    from curate import curate

    body = "unique body line with several ordinary words"
    rows = [
        (1, "web", f"nav\n{body}\nnav\nnav"),        # repeated nav lines
        (2, "web", f"nav\n{body}"),                  # same after cleaning
        (3, "web", "another document entirely\nwith its own lines"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = str(tmp_path / "packed")
    stats = curate(
        spark, str(tmp_path), out, seq_len=64, min_p_keep=0.0,
        line_dedup=True,
    )
    assert stats["line_dedup"] is True
    # docs 1 and 2 are identical post-clean: exact dedup keeps doc 1 only
    back = spark.read.parquet(out)
    ids = {r["doc_id"] for r in back.collect()}
    assert 2 not in ids and 1 in ids and 3 in ids
    texts = {r["text"] for r in back.collect()}
    # downstream normalize folds the newline; the repeated navs are gone
    assert f"nav {body}" in texts


def test_curate_cli_semantic_dedup(spark, tmp_path):
    """--semantic-dedup: docs whose embeddings are near-identical in
    cosine collapse to the lower-id keeper; distinct embeddings all
    survive; docs dropped earlier in the screen never veto a keeper."""
    import sys

    sys.path.insert(0, "tools")
    from curate import curate

    docs = spark.createDataFrame(
        [(i, "web", f"document number {i} with plenty of ordinary words")
         for i in range(12)],
        ["doc_id", "source", "text"],
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    # embeddings: ids 10 and 11 duplicate ids 0 and 1; the rest are
    # one-hot-ish and mutually orthogonal
    def vec(i):
        v = [0.0] * 8
        v[i % 8] = 1.0
        v[(i + 3) % 8] = 0.5 if i < 10 else 0.0
        return v

    rows = [(i, vec(i)) for i in range(10)] + [(10, vec(0)), (11, vec(1))]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    out = str(tmp_path / "packed")
    stats = curate(
        spark, str(tmp_path), out, seq_len=64, min_p_keep=0.0,
        semantic_threshold=0.95,
    )
    back = spark.read.parquet(out)
    ids = {r["doc_id"] for r in back.collect()}
    assert stats["n_semantic"] == len(ids)
    assert 10 not in ids and 11 not in ids  # near-dups of 0/1 pruned
    assert {0, 1}.issubset(ids)             # keepers survive


def test_c4_rules_cross_engine(spark):
    """C4 hard filters: each rule exercised by a targeted doc, and the
    Spark expressions hash-match the DuckDB mirror value-for-value (the
    same oracle-grade parity the registry rows get, run in-test)."""
    import duckdb
    import pandas as pd

    from timely_spark.operators.text import c4_rules, c4_rules_sql

    good_line = "This is a perfectly ordinary sentence with many words."
    docs_rows = [
        (1, "\n".join([good_line] * 3)),                   # passes
        (2, "\n".join([good_line] * 2)),                   # < 3 sentences
        (3, "\n".join([good_line] * 3) + "\nLorem Ipsum dolor"),  # lorem
        (4, "\n".join([good_line] * 3) + "\nenable JavaScript now."),
        (5, "\n".join([good_line] * 3) + "\nif (x) { return; }"),
        (6, "short line.\nno terminal punct here\n" + good_line),  # 1 kept
        (7, ""),                                            # empty
        (8, None),                                          # NULL text
        # CRLF corpus: \r on every line must NOT defeat the terminal
        # check (review finding: trim() strips spaces only)
        (9, "\r\n".join([good_line] * 3)),
        # leading tab: the empty split token must not count as a word
        (10, "\n".join(["\tOnly four words here."] * 3)),
    ]
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in c4_rules(docs).collect()}
    assert got[1]["c4_pass"] is True
    assert got[2]["c4_pass"] is False and got[2]["n_sentence_lines"] == 2
    assert got[3]["has_lorem"] and not got[3]["c4_pass"]
    assert got[4]["has_javascript"] and not got[4]["c4_pass"]
    assert got[5]["has_brace"] and not got[5]["c4_pass"]
    assert got[6]["n_sentence_lines"] == 1 and not got[6]["c4_pass"]
    assert got[7]["c4_pass"] is False and got[8]["c4_pass"] is False
    assert got[9]["c4_pass"] is True      # CRLF lines still sentences
    assert got[10]["n_sentence_lines"] == 0  # 4 real words < 5-word floor

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(docs_rows, columns=["doc_id", "text"]),
    )
    oracle = {
        int(r["doc_id"]): {k: r[k] for k in got[1]}
        for _, r in con.execute(c4_rules_sql()).fetchdf().iterrows()
    }
    for did, row in got.items():
        for k, v in row.items():
            assert bool(oracle[did][k]) == bool(v) if isinstance(v, bool) \
                else oracle[did][k] == v, (did, k, v, oracle[did][k])


def test_curate_cli_c4_gate(spark, tmp_path):
    """--c4: docs failing the C4 form rules (code braces, too few
    terminal-punctuation sentences) drop; prose passes."""
    import sys

    sys.path.insert(0, "tools")
    from curate import curate

    prose = "\n".join(
        ["This line is a perfectly ordinary sentence with many words."] * 4
    )
    rows = [
        (1, "web", prose),
        (2, "web", prose + "\nfunction f() { return 1; }"),  # brace
        (3, "web", "no punctuation here at all"),            # 0 sentences
    ]
    spark.createDataFrame(rows, ["doc_id", "source", "text"]).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = str(tmp_path / "packed")
    stats = curate(spark, str(tmp_path), out, seq_len=64, min_p_keep=0.0,
                   c4=True)
    assert stats["stage_pass"]["c4"] == 1
    back = spark.read.parquet(out)
    assert {r["doc_id"] for r in back.collect()} == {1}
    # the provenance manifest lands next to the shards and round-trips
    import json
    import os

    m = json.load(open(os.path.join(out, "_curation_manifest.json")))
    assert m["n_survivors"] == stats["n_survivors"] == 1
    assert m["c4_gate"] is True


def test_curate_cli_substring_screen(spark, tmp_path):
    """--max-dup-frac: the stride-1 substring screen drops docs whose
    duplicated-token fraction (cross-doc OR within-doc repeats at any
    offset) exceeds the cutoff; clean docs survive."""
    import sys

    sys.path.insert(0, "tools")
    from curate import curate

    shared = " ".join(f"plag{i}" for i in range(25))
    rows = []
    for i in range(12):
        body = " ".join(f"doc{i}w{j}" for j in range(40))
        if i in (3, 7):  # two docs carry the plagiarized passage at
            body += " " + shared  # different offsets (doc lengths differ)
            body = body if i == 3 else shared + " " + body
        rows.append((i, "web", body))
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = str(tmp_path / "packed")
    stats = curate(
        spark, str(tmp_path), out, seq_len=128, min_p_keep=0.0,
        max_dup_frac=0.3,
    )
    assert stats["n_substring"] == 10  # docs 3 and 7 dropped
    back = spark.read.parquet(out)
    ids = {r["doc_id"] for r in back.collect()}
    assert 3 not in ids and 7 not in ids and len(ids) == 10


def test_curate_cli_substring_rewrite(spark, tmp_path):
    """--substring-rewrite: duplicated spans are EXCISED from survivor
    text (global-first keeper) instead of dropping docs — the later
    copy's packed output no longer contains the plagiarized passage."""
    import sys

    sys.path.insert(0, "tools")
    from curate import curate

    shared = " ".join(f"plag{i}" for i in range(25))
    rows = [(i, "web", " ".join(f"doc{i}w{j}" for j in range(40))) for i in range(10)]
    rows[3] = (3, "web", rows[3][2] + " " + shared)   # first occurrence
    rows[7] = (7, "web", shared + " " + rows[7][2])   # later copy: excised
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = str(tmp_path / "packed")
    stats = curate(
        spark, str(tmp_path), out, seq_len=2048, min_p_keep=0.0,
        substring_rewrite=True,
    )
    assert stats["substring_rewrite"] and stats["n_survivors"] == 10
    # ASCII corpus: Python/JVM tokenization agrees everywhere, so zero
    # silent-span-retention fallbacks — and the count is REPORTED, not
    # dropped (ADVICE r7)
    assert stats["n_excise_fallback"] == 0
    back = spark.read.parquet(out)
    texts = {r["doc_id"]: r["text"] for r in back.collect()}
    assert "plag0" in texts[3] and "plag0" not in texts[7]
    # r7 (ADVICE r6): the excision leaves the survivor's own text
    # VERBATIM — doc 7's body follows the cut span untouched, not a
    # normalized token rejoin
    assert "doc7w0" in texts[7] and "doc7w39" in texts[7]


def test_curate_cli_substring_screen_plus_rewrite_one_detection(spark, tmp_path):
    """--max-dup-frac AND --substring-rewrite together: ONE persisted
    substring_spans detection feeds both (VERDICT r6 #6). A doc over the
    dup-frac cutoff drops; a survivor carrying a smaller duplicated span
    keeps its doc but loses the span's characters; the keeper doc stays
    verbatim."""
    import sys

    sys.path.insert(0, "tools")
    from curate import curate

    shared = " ".join(f"plag{i}" for i in range(25))
    rows = [(i, "web", " ".join(f"doc{i}w{j}" for j in range(40)))
            for i in range(10)]
    rows[3] = (3, "web", rows[3][2] + " " + shared)   # global first: kept
    rows[7] = (7, "web", shared + " " + rows[7][2])   # later copy: excised
    # doc 9 is ALMOST ALL duplicated text (its body + the passage twice
    # over): dup_frac ~1 -> screened out entirely
    rows[9] = (9, "web", shared + " " + shared)
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = str(tmp_path / "packed")
    stats = curate(
        spark, str(tmp_path), out, seq_len=2048, min_p_keep=0.0,
        max_dup_frac=0.7, substring_rewrite=True,
    )
    assert stats["n_substring"] == 9  # doc 9 screened
    back = spark.read.parquet(out)
    texts = {r["doc_id"]: r["text"] for r in back.collect()}
    assert 9 not in texts
    assert "plag0" in texts[3] and "plag0" not in texts[7]
    assert "doc7w0" in texts[7]  # remainder verbatim


def test_curate_semantic_dedup_computed_embeddings(spark, tmp_path):
    """--semantic-dedup without an embeddings table: vectors compute
    from the survivor text itself (hashed_text_embedding), so a planted
    near-verbatim copy collapses to its lower-id keeper while docs on
    disjoint vocabularies all survive."""
    import sys

    sys.path.insert(0, "tools")
    from curate import curate

    # 24 docs so semantic_dedup's k=8 clusters hold several vectors
    # each (k vectors would all become their own singleton centroid)
    rows = [
        (i, "web", " ".join(f"d{i}tok{j}" for j in range(40)))
        for i in range(24)
    ]
    # doc 23 = doc 0 with two tokens swapped: ~0.9 cosine in the hashed
    # embedding space, far above any disjoint-vocab pair
    rows[23] = (23, "web", rows[0][2].rsplit(" ", 2)[0] + " zz1 zz2")
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    # NOTE: no embeddings.parquet written
    out = str(tmp_path / "packed")
    stats = curate(
        spark, str(tmp_path), out, seq_len=64, min_p_keep=0.0,
        semantic_threshold=0.8,
    )
    ids = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert stats["n_semantic"] == len(ids)
    assert 0 in ids and 23 not in ids  # near-copy pruned, keeper stays
    assert set(range(1, 23)).issubset(ids)


def test_curate_screen_plus_rewrite_keeper_among_survivors(spark, tmp_path):
    """The combined pass recomputes duplicate counts and keeper flags
    over the SURVIVOR corpus (r7 review finding): when the screen drops
    the doc holding a span's global-first occurrence, the surviving copy
    is the new keeper — the content must NOT vanish from the output.
    And a span whose every other copy was screened out is no longer a
    duplicate at all."""
    import sys

    sys.path.insert(0, "tools")
    from curate import curate

    shared = " ".join(f"plag{i}" for i in range(25))
    rows = [(i, "web", " ".join(f"doc{i}w{j}" for j in range(40)))
            for i in range(10)]
    # doc 1: almost all duplicated (holds the GLOBAL first occurrence of
    # the passage) -> screened out by dup_frac
    rows[1] = (1, "web", shared + " " + shared)
    # doc 7: the only SURVIVING copy of the passage -> keeper, kept
    rows[7] = (7, "web", rows[7][2] + " " + shared)
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = str(tmp_path / "packed")
    stats = curate(
        spark, str(tmp_path), out, seq_len=2048, min_p_keep=0.0,
        max_dup_frac=0.7, substring_rewrite=True,
    )
    assert stats["n_substring"] == 9  # doc 1 screened
    texts = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert 1 not in texts
    # doc 7 keeps the passage: among survivors it is unique content
    assert "plag0" in texts[7] and "plag24" in texts[7]


def test_curate_cli_semantic_decon_regimes(spark, tmp_path):
    """--semantic-decon screens paraphrased benchmark leakage through
    whichever regime the measured benchmark size selects: a planted
    token-reordered copy of a benchmark doc (invisible to the 8-gram
    --bench stage) is removed in BOTH the broadcast and the blocked
    regime, with identical survivor sets and the regime recorded in the
    provenance stats."""
    import sys

    sys.path.insert(0, "tools")
    from curate import curate

    filler = " ".join(["sample text words"] * 30)
    bench_text = " ".join(f"bench{i}" for i in range(40))
    para = " ".join(bench_text.split()[::-1][:-2] + ["extra", "words"])
    rows = [(i, "web", filler + f" unique{i}") for i in range(10)]
    rows.append((50, "web", para))  # paraphrased benchmark leak
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    spark.createDataFrame(
        [(1000, bench_text)], ["doc_id", "text"]
    ).write.parquet(str(tmp_path / "bench.parquet"))

    def run(name, blocked_over):
        out = str(tmp_path / name)
        stats = curate(
            spark, str(tmp_path), out, seq_len=128, min_p_keep=0.0,
            bench_path=str(tmp_path / "bench.parquet"),
            semantic_decon=0.9, semantic_blocked_over=blocked_over,
        )
        back = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        return stats, back

    s_b, ids_b = run("packed_broadcast", 100_000)  # 1 bench doc -> broadcast
    s_k, ids_k = run("packed_blocked", 0)          # force the cell probe
    assert s_b["semantic_decon_regime"] == "broadcast"
    assert s_k["semantic_decon_regime"] == "blocked"
    # the paraphrase is gone in both regimes; n-gram decon alone (the
    # --bench stage) did NOT catch it (it survived to the semantic stage)
    assert 50 not in ids_b and 50 not in ids_k
    assert s_b["n_decontaminated"] == s_k["n_decontaminated"]
    assert s_b["n_decontaminated"] > s_b["n_semantic_decon"]
    # dual-path identity at the pipeline level
    assert ids_b == ids_k
    assert s_b["n_semantic_decon"] == s_k["n_semantic_decon"]


def test_curate_baseline_snapshot_diff(spark, tmp_path):
    """--baseline-snapshot records the incremental re-processing bill:
    added/removed/changed/unchanged counts vs a previous corpus
    snapshot land in the stats and the provenance manifest."""
    import json
    import sys

    sys.path.insert(0, "tools")
    from curate import curate

    filler = " ".join(["sample text words"] * 30)
    old_rows = [(i, "web", filler + f" unique{i}") for i in range(20)]
    new_rows = [
        (i, "web", filler + f" unique{i}" + (" rev2" if i % 7 == 0 else ""))
        for i in range(20)
        if i != 5  # doc 5 removed
    ] + [(99, "web", filler + " brand new")]  # doc 99 added
    base = tmp_path / "v1"
    cur = tmp_path / "v2"
    base.mkdir()
    cur.mkdir()
    spark.createDataFrame(old_rows, ["doc_id", "source", "text"]).write.parquet(
        str(base / "documents.parquet")
    )
    spark.createDataFrame(new_rows, ["doc_id", "source", "text"]).write.parquet(
        str(cur / "documents.parquet")
    )
    out = str(tmp_path / "packed")
    stats = curate(
        spark, str(cur), out, seq_len=128, min_p_keep=0.0,
        baseline_snapshot=str(base),
    )
    # ids 0,7,14 changed; 5 removed; 99 added; the other 16 unchanged
    assert stats["snapshot_diff"] == {
        "added": 1, "removed": 1, "changed": 3, "unchanged": 16,
    }
    manifest = json.load(open(out + "/_curation_manifest.json"))
    assert manifest["snapshot_diff"] == stats["snapshot_diff"]
    # without the flag the field stays explicit-null (manifest schema
    # stable across modes)
    stats2 = curate(
        spark, str(cur), str(tmp_path / "packed2"), seq_len=128,
        min_p_keep=0.0,
    )
    assert stats2["snapshot_diff"] is None


def test_corpus_line_dedup_semantics(spark):
    """Planted matrix: a line in 3 docs strips everywhere (>= min_docs),
    a line in 2 docs survives, per-doc uniques survive in order, a doc
    whose EVERY line is boilerplate survives with empty text, and NULL
    text behaves as one empty line (stripped iff common)."""
    from timely_spark.operators.text import corpus_line_dedup

    rows = [
        (1, "unique one\ncommon3\ncommon2"),
        (2, "common3\nkeep me\ncommon2"),
        (3, "common3\nunique three"),
        (4, "common3"),          # all-boilerplate doc
        (5, None),               # NULL -> one empty line (unique here)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_kept"], r["n_stripped"])
        for r in corpus_line_dedup(df, min_docs=3).collect()
    }
    assert got[1] == ("unique one\ncommon2", 2, 1)
    assert got[2] == ("keep me\ncommon2", 2, 1)
    assert got[3] == ("unique three", 1, 1)
    assert got[4] == ("", 0, 1)
    assert got[5] == ("", 1, 0)  # the lone empty line is kept

    # the empty line strips too once it is corpus-common (per-doc
    # unique first/last lines so ONLY the blank line is common)
    df2 = spark.createDataFrame(
        [(i, f"keep{i}\n\ntail{i}") for i in range(3)] + [(9, "solo")],
        "doc_id long, text string",
    )
    got2 = {
        r["doc_id"]: (r["text"], r["n_stripped"])
        for r in corpus_line_dedup(df2, min_docs=3).collect()
    }
    assert got2[0] == ("keep0\ntail0", 1) and got2[9] == ("solo", 0)


def test_chunk_documents_window_semantics(spark):
    """Window arithmetic pinned against a hand model: exact coverage
    (every token in >= 1 chunk), overlap = chunk - stride, short tail,
    a doc shorter than one chunk emits exactly one chunk, zero-token
    docs emit nothing, and the stride guard rejects stride >
    chunk_tokens."""
    import pytest as _pytest

    from timely_spark.operators.text import chunk_documents

    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),  # 10 toks: 3 chunks
        (2, "a b c"),                               # < chunk: 1 chunk
        (3, ""),                                    # 0 toks: no rows
        (4, " ".join(f"u{i}" for i in range(4))),   # == chunk: 1 chunk
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=4, stride=3)
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_tokens"])
        for r in out.collect()
    }
    # doc 1: n=10 -> 1 + ceil(6/3) = 3 chunks at starts 0,3,6
    assert got[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert got[(1, 1)] == ("t3 t4 t5 t6", 4)
    assert got[(1, 2)] == ("t6 t7 t8 t9", 4)
    assert got[(2, 0)] == ("a b c", 3)
    assert got[(4, 0)] == ("u0 u1 u2 u3", 4)
    assert {k[0] for k in got} == {1, 2, 4}
    with _pytest.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_tokens=4, stride=5)


def test_vocab_coverage_planted(spark):
    """Hand-computed coverage curve: frequencies 10/5/5/1, ladder
    hitting a tie boundary (V=2: either 5-count token gives the same
    mass — the invariance the operator's contract states) and a V past
    the whole vocabulary (full cover)."""
    from timely_spark.operators.text import vocab_coverage

    text = " ".join(["alpha"] * 10 + ["beta"] * 5 + ["gamma"] * 5 + ["delta"])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = {
        r["vocab_size"]: r
        for r in vocab_coverage(df, vocab_sizes=[1, 2, 3, 10]).collect()
    }
    assert set(out) == {1, 2, 3, 10}
    for v, frac in ((1, 10 / 21), (2, 15 / 21), (3, 20 / 21), (10, 1.0)):
        assert out[v]["covered_frac"] == round(frac + 1e-9, 4), (v, out[v])
        assert out[v]["n_types"] == 4 and out[v]["total_tokens"] == 21


def test_vocab_coverage_sql_twin(spark):
    """DuckDB twin agreement over a multi-doc Zipf-ish corpus."""
    import duckdb
    import pandas as pd

    from timely_spark.operators.text import vocab_coverage, vocab_coverage_sql

    docs = [
        (i, " ".join(f"tok{j % (1 + j % 17)}" for j in range(i, i + 60)))
        for i in range(50)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(map(tuple, vocab_coverage(df, vocab_sizes=[4, 16, 64]).collect()))
    con = duckdb.connect()
    con.register("documents_in", pd.DataFrame(docs, columns=["doc_id", "text"]))
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_in")
    want = sorted(
        map(
            tuple,
            con.execute(vocab_coverage_sql(vocab_sizes=[4, 16, 64])).fetchall(),
        )
    )
    assert got == want


def test_curate_cli_retrieval_decon(spark, tmp_path):
    """--probes retrieval decontamination: the docs that RANK against a
    probe query (its top-k BM25 hits) are dropped — including docs that
    share no 8-gram with any benchmark text — and the stage count lands
    in the stats/manifest. --probe-topk without --probes fails loudly
    (the paired-flag rule)."""
    import sys

    import pytest as _pytest

    sys.path.insert(0, "tools")
    from curate import curate

    filler = " ".join(["sample text words"] * 30)
    rows = [(i, "web", filler + f" unique{i}") for i in range(20)]
    # two docs rich in the probe's terms but sharing no long n-gram
    # with anything: the ranked screen must catch exactly these
    rows.append((200, "web", "quantum flux capacitor " * 15))
    rows.append((201, "web", "flux capacitor quantum array " * 12))
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = str(tmp_path / "packed")
    stats = curate(
        spark,
        str(tmp_path),
        out,
        seq_len=128,
        min_p_keep=0.0,
        probe_queries={"probe_a": "quantum flux capacitor"},
        probe_topk=2,
    )
    assert stats["n_retrieval_decon"] is not None
    assert stats["probe_topk"] == 2
    back_ids = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert 200 not in back_ids and 201 not in back_ids
    assert len(back_ids) == stats["n_survivors"]
    assert "retrieval_decon" in stats["stage_wall_s"]
    with _pytest.raises(ValueError, match="--probe-topk requires"):
        curate(spark, str(tmp_path), str(tmp_path / "p2"), probe_topk=5)


def test_curate_cli_history_index(spark, tmp_path):
    """--history-index daily-loop accumulator (r12): run 1 bootstraps
    the persistent MinHash index from its shipped survivors; run 2
    screens a NEW batch against it — re-submitted copies (new doc_ids,
    same text) are dropped, genuinely new docs ship and are appended;
    run 3 then catches copies of run 2's docs, proving the append
    registered them. The index path is a file:// URI so the whole
    round trip exercises the shared-FS code path. A threshold
    mismatching an existing index errors loudly (never a quiet
    override)."""
    import sys

    import pytest as _pytest

    sys.path.insert(0, "tools")
    from curate import curate

    def _docs(ids_texts, day):
        df = spark.createDataFrame(
            [(i, "web", t) for i, t in ids_texts],
            ["doc_id", "source", "text"],
        )
        d = tmp_path / f"day{day}"
        d.mkdir()
        df.write.parquet(str(d / "documents.parquet"))
        return str(d)

    # fully distinct token sets per doc: cross-doc jaccard is 0 except
    # for the planted copies (jaccard 1.0)
    def _text(i):
        return " ".join(f"tok{i}x{k}" for k in range(40))

    idx_path = "file://" + str(tmp_path / "history_idx")
    day1 = _docs([(i, _text(i)) for i in range(10)], 1)
    s1 = curate(
        spark, day1, str(tmp_path / "out1"), seq_len=128, min_p_keep=0.0,
        history_index=idx_path,
    )
    assert s1["history_bootstrap"] is True
    assert s1["n_history_dedup"] is None  # nothing to screen against yet
    assert s1["n_history_appended"] == s1["n_survivors"] == 10

    # day 2: 3 re-submitted copies of day-1 docs (new ids) + 5 new docs
    day2 = _docs(
        [(200 + i, _text(i)) for i in range(3)]
        + [(300 + i, _text(100 + i)) for i in range(5)],
        2,
    )
    s2 = curate(
        spark, day2, str(tmp_path / "out2"), seq_len=128, min_p_keep=0.0,
        history_index=idx_path,
    )
    assert s2["history_bootstrap"] is False
    assert s2["n_history_dedup"] == 5  # the 3 copies dropped
    assert s2["n_survivors"] == 5
    assert s2["n_history_appended"] == 5
    back2 = {r["doc_id"] for r in
             spark.read.parquet(str(tmp_path / "out2")).collect()}
    assert back2 == {300 + i for i in range(5)}
    assert "history_dedup" in s2["stage_wall_s"]
    assert "history_append" in s2["stage_wall_s"]

    # day 3: a copy of a DAY-2 doc must now be caught (append worked)
    day3 = _docs([(400, _text(102)), (401, _text(999))], 3)
    s3 = curate(
        spark, day3, str(tmp_path / "out3"), seq_len=128, min_p_keep=0.0,
        history_index=idx_path,
    )
    assert s3["n_history_dedup"] == 1 and s3["n_survivors"] == 1
    back3 = {r["doc_id"] for r in
             spark.read.parquet(str(tmp_path / "out3")).collect()}
    assert back3 == {401}

    # day 4 with --history-compact: append then rewrite the index
    # tables into single right-sized files; the compacted index still
    # screens (a copy of the day-4 doc is caught by a direct screen)
    from pyspark.sql import functions as F

    from timely_spark.operators.ann_index import MinHashIndex

    day4 = _docs([(500, _text(500))], 4)
    s4 = curate(
        spark, day4, str(tmp_path / "out_c"), seq_len=128, min_p_keep=0.0,
        history_index=idx_path, history_compact=True,
    )
    assert "history_compact" in s4["stage_wall_s"]
    local_idx = str(tmp_path / "history_idx")
    for sub in ("bands", "shingles"):
        import os as _os

        files = [
            f for f in _os.listdir(_os.path.join(local_idx, sub))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (sub, files)
    probe = spark.createDataFrame(
        [(600, _text(500))], ["doc_id", "text"]
    ).withColumn("doc_id", F.col("doc_id").cast("long"))
    hits = MinHashIndex.load(spark, idx_path).screen(probe)
    assert {r.id_b for r in hits.collect()} == {600}

    # threshold mismatch on an existing index: loud error
    with _pytest.raises(ValueError, match="history-threshold"):
        curate(
            spark, day3, str(tmp_path / "out4"), seq_len=128,
            min_p_keep=0.0, history_index=idx_path, history_threshold=0.5,
        )
    # paired-flag rule: threshold/compact without index fail loudly
    with _pytest.raises(ValueError, match="requires --history-index"):
        curate(
            spark, day3, str(tmp_path / "out5"), seq_len=128,
            min_p_keep=0.0, history_threshold=0.5,
        )
    with _pytest.raises(ValueError, match="requires --history-index"):
        curate(
            spark, day3, str(tmp_path / "out6"), seq_len=128,
            min_p_keep=0.0, history_compact=True,
        )
