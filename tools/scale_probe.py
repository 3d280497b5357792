#!/usr/bin/env python3
"""10x scale probe for the Python-stage-heavy operators (VERDICT r7 #3).

Round 7 measured the five heaviest TEXT operators sub-linear on a
10x-salted corpus (SCALE.md "Round-7 scale probe"). This extends the
measurement to the rows the r7 verdict flagged as the remaining scale
risk — the ones whose plans carry Arrow/Python stages or streaming
state:

  doc_simhash            pigeonhole-blocked Hamming join
  emb_ivfpq_ann          Arrow encode pass + ADC scoring
  doc_trained_classifier MLlib fit + zero-shuffle serve + AUC agg
  media_video_near_dup   AVI parse + T.81 JPEG decode + Hamming join
  streaming_summarize    stateful event-time windows (state growth too)

Inputs scale 10x WITHOUT creating cross-replica near-duplicates (which
would quadratically inflate pair outputs and measure fixture artifacts,
not the operator): document replicas pass through a per-replica letter
ROTATION (translate a-z -> rot_r(a-z)) so each replica is a disjoint
token universe with the original length/shape distribution; embedding
replicas are CYCLIC SHIFTS of the vector (norm-preserving permutation,
fills different IVF cells); event replicas offset user_id (10x the
series key space — the state dimension that matters). Replica 0 is the
unmodified original. Inputs are MATERIALIZED to temp parquet before
timing, so the timed region reads parquet exactly like production.

Warm best-of-2 at x1 and x10 in ONE session (local[32]), same recipe
as the r7 probe. Appends nothing; prints one JSON line for SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import string
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = 10


def _rot(s: str, r: int) -> str:
    return s[r:] + s[:r]


def build_docs(spark, sf_dir: str, out: str) -> None:
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    parts = [base]
    # rotate BOTH cases and digits: the tokenizer lowercases first, so
    # a lowercase-only rotation would leave acronym/number tokens
    # identical across replicas and re-create the cross-replica
    # near-dups the probe design avoids (self-review r8)
    src = (
        string.ascii_lowercase
        + string.ascii_uppercase
        + string.digits
    )
    for r in range(1, REPLICAS):
        dst = (
            _rot(string.ascii_lowercase, r)
            + _rot(string.ascii_uppercase, r)
            + _rot(string.digits, r)
        )
        parts.append(
            base.select(
                (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
                F.translate("text", src, dst).alias("text"),
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(out)


def build_docs_perm(spark, sf_dir: str, out: str, replicas: int) -> None:
    """Permutation-salted xN documents (r9, VERDICT r8 #3 — the x100
    probe). Rotations repeat at 26 replicas, which beyond x26 would
    plant cross-replica EXACT token duplicates and quadratically
    inflate pair outputs (fixture artifact, not operator cost); per-
    replica SEEDED PERMUTATIONS of [a-z]/[A-Z]/[0-9] are distinct for
    every r, and a 16-token window colliding across two distinct
    permutations would need every character of every token to be a
    fixed point of the composed permutation — vanishing. Replica 0 is
    the unmodified original. ``source`` is salted per replica: a 100x
    corpus has MORE sources, not 100x-bigger blocks — the
    block-exhaustive pair contract (doc_ngram_jaccard) would otherwise
    measure a quadratic fixture artifact."""
    import random

    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    src = (
        string.ascii_lowercase + string.ascii_uppercase + string.digits
    )
    parts = [base]
    for r in range(1, replicas):
        rng = random.Random(r)
        lo = list(string.ascii_lowercase)
        up = list(string.ascii_uppercase)
        dg = list(string.digits)
        for chars in (lo, up, dg):
            rng.shuffle(chars)
        dst = "".join(lo + up + dg)
        parts.append(
            base.select(
                (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
                F.translate("text", src, dst).alias("text"),
                F.concat(F.col("source"), F.lit(f"#{r}")).alias("source"),
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(out)


def build_embeddings(spark, sf_dir: str, out: str) -> None:
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    parts = [base.select("vec_id", "embedding")]
    for r in range(1, REPLICAS):
        shifted = F.concat(
            F.slice("embedding", r + 1, 64 - r), F.slice("embedding", 1, r)
        )
        parts.append(
            base.select(
                (F.col("vec_id") + r * 1_000_000).alias("vec_id"),
                shifted.alias("embedding"),
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(out)


def build_embeddings_perm(
    spark, sf_dir: str, out: str, replicas: int
) -> None:
    """Permutation-salted xN embeddings (r9 second wave): cyclic shifts
    alone repeat at dim=64 replicas (x100 would plant exact duplicate
    vectors), so each replica r applies a SEEDED +/-1 sign mask and a
    cyclic shift by r % 64 — both norm-preserving, distinct per
    replica, and sign-flipped vectors are far from their originals
    (no cross-replica near-dup inflation)."""
    import random

    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    parts = [base]
    for r in range(1, replicas):
        rng = random.Random(10_000 + r)
        signs = [rng.choice((-1.0, 1.0)) for _ in range(64)]
        sh = r % 64
        shifted = F.concat(
            F.slice("embedding", sh + 1, 64 - sh),
            F.slice("embedding", 1, sh),
        )
        # keep the element type at FLOAT: the double sign literals widen
        # the product to array<double>, and unionByName then widens
        # replica 0 too — 2x the bytes/vector, which would inflate the
        # x10/x100 ratios with storage width instead of corpus growth
        signed = F.zip_with(
            shifted,
            F.array(*[F.lit(s) for s in signs]),
            lambda x, s: x * s,
        ).cast("array<float>")
        parts.append(
            base.select(
                (F.col("vec_id") + r * 1_000_000).alias("vec_id"),
                signed.alias("embedding"),
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(out)


def build_events(spark, sf_dir: str, out: str, replicas: int = REPLICAS) -> None:
    # ONE parquet file named exactly like the testdata layout (the
    # streaming bench symlinks `{sf_dir}/events.parquet` as a file into
    # its stream source dir — a Spark-written directory would sit as an
    # unlisted subdir and feed the stream zero rows). Replicas offset
    # user_id — the SERIES key space, the state dimension that matters —
    # streamed through a ParquetWriter so x100 stays memory-bounded.
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/events.parquet")
    os.makedirs(out, exist_ok=True)
    w = pq.ParquetWriter(os.path.join(out, "events.parquet"), t.schema)
    for r in range(replicas):
        w.write_table(
            t
            if r == 0
            else t.set_column(
                t.schema.get_field_index("user_id"),
                "user_id",
                pc.add(t.column("user_id"), r * 1_000_000),
            )
        )
    w.close()


def build_events_volume(
    spark, sf_dir: str, out: str, replicas: int
) -> None:
    """Volume-ONLY xN backlog: same user_ids (same series key space),
    each replica's timestamps jittered by +r milliseconds so rows stay
    inside the same event-time windows. Input grows xN while the
    stateful keys (series x window) stay ~x1 — the leg that separates
    'state grows with series' from 'state grows with volume'."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/events.parquet")
    os.makedirs(out, exist_ok=True)
    w = pq.ParquetWriter(os.path.join(out, "events.parquet"), t.schema)
    ts_i = t.schema.get_field_index("ts")
    unit = t.schema.field("ts").type.unit
    per_ms = {"s": 0, "ms": 1, "us": 1000, "ns": 1_000_000}[unit]
    for r in range(replicas):
        if r == 0 or per_ms == 0:
            w.write_table(t)
            continue
        shifted = pc.add(
            t.column("ts").cast(pa.int64()), r * per_ms
        ).cast(t.schema.field("ts").type)
        w.write_table(t.set_column(ts_i, "ts", shifted))
    w.close()


def build_events_scaled(
    spark, sf_dir: str, out: str, replicas: int, salt_metrics: bool = False
) -> None:
    """User-offset xN event backlog as a parquet DIRECTORY (batch reads
    — the store probe). ``salt_metrics`` additionally suffixes
    event_type per replica: an xN backlog with N-times MORE metric
    names, the dimension that multiplies the store's partition-dir
    count (metrics x days) rather than its per-partition volume."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    parts = [ev]
    for r in range(1, replicas):
        p = ev.withColumn(
            "user_id", F.col("user_id") + F.lit(r * 1_000_000)
        )
        if salt_metrics:
            p = p.withColumn(
                "event_type", F.concat("event_type", F.lit(f"#{r}"))
            )
        parts.append(p)
    df = parts[0]
    for q in parts[1:]:
        df = df.unionByName(q)
    df.write.mode("overwrite").parquet(out)


def best_of(fn, n: int = 2) -> float:
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best or 1e18, time.time() - t0)
    return best


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = set(sys.argv[1:])  # operator names; empty = all
    def want(name: str) -> bool:
        return not only or name in only

    from pyspark.sql import functions as F

    from timely_spark.session import get_spark

    spark = get_spark("timely-scale-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    tmp = tempfile.mkdtemp(prefix="timely_scale_probe_")
    docs10 = os.path.join(tmp, "docs10")
    emb10 = os.path.join(tmp, "emb10")
    ev10 = os.path.join(tmp, "ev10dir")
    results: dict[str, dict] = {}
    try:
        need_docs = want("doc_simhash") or want("doc_trained_classifier")
        if need_docs:
            build_docs(spark, sf_dir, docs10)
        if want("emb_ivfpq_ann"):
            build_embeddings(spark, sf_dir, emb10)
        if want("streaming_summarize"):
            build_events(spark, sf_dir, ev10)

        if need_docs:
            docs1 = spark.read.parquet(
                f"{sf_dir}/documents.parquet"
            ).select("doc_id", "text")
            d10 = spark.read.parquet(docs10)

        # --- doc_simhash ---------------------------------------------
        if want("doc_simhash"):
            from timely_spark.operators.dedup import simhash_near_dups

            def simhash(df):
                return lambda: simhash_near_dups(df, max_hamming=3).count()

            t1 = best_of(simhash(docs1))
            t10 = best_of(simhash(d10))
            results["doc_simhash"] = {
                "x1": round(t1, 2), "x10": round(t10, 2)
            }
            print(f"simhash {t1:.2f} -> {t10:.2f}", file=sys.stderr)

        # --- emb_ivfpq_ann -------------------------------------------
        if want("emb_ivfpq_ann"):
            from timely_spark.operators.similarity import ivfpq_topk

            e1 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            e10 = spark.read.parquet(emb10)

            def ivfpq(df):
                q = df.filter(F.col("vec_id") < 20).select(
                    F.col("vec_id").alias("query_id"), "embedding"
                )
                return lambda: ivfpq_topk(
                    df, q, dim=64, k=10, m=16, ksub=64, ncells=32,
                    nprobe=16,
                ).count()

            t1 = best_of(ivfpq(e1))
            t10 = best_of(ivfpq(e10))
            results["emb_ivfpq_ann"] = {
                "x1": round(t1, 2), "x10": round(t10, 2)
            }
            print(f"ivfpq {t1:.2f} -> {t10:.2f}", file=sys.stderr)

        # --- doc_trained_classifier ----------------------------------
        # full shape: fit on the 1-in-5 sample (training set grows 10x
        # too — the honest probe), serve corpus-wide, AUC agg
        if want("doc_trained_classifier"):
            from timely_spark.operators.classifier import (
                train_classifier_weights,
            )
            from timely_spark.operators.text import classifier_score

            def classifier(df):
                label = F.col("text").rlike("(^| )window( |$)")

                def run():
                    w = train_classifier_weights(
                        df.filter(F.col("doc_id") % 5 == 0),
                        label,
                        dim=256,
                        max_iter=10,
                    )
                    classifier_score(df, weights=w).agg(
                        F.sum("p_keep")
                    ).collect()

                return run

            t1 = best_of(classifier(docs1))
            t10 = best_of(classifier(d10))
            results["doc_trained_classifier"] = {
                "x1": round(t1, 2), "x10": round(t10, 2)
            }
            print(f"classifier {t1:.2f} -> {t10:.2f}", file=sys.stderr)

        # --- x100 decade probes (VERDICT r8 #3): the three heaviest
        # text rows, measured x1 -> x10 -> x100 on the permutation-
        # salted corpus. x1/x10 warm best-of-2; x100 a single timed run
        # (the warm-up is the x10 run of the same plan).
        X100 = ("doc_substring_dedup", "doc_substring_rewrite",
                "doc_ngram_jaccard")
        if any(want(n) for n in X100):
            from timely_spark.operators.dedup import (
                ngram_jaccard_pairs,
                repeated_span_stats,
                substring_dedup_rewrite,
            )

            d10p = os.path.join(tmp, "docs10p")
            d100p = os.path.join(tmp, "docs100p")
            build_docs_perm(spark, sf_dir, d10p, 10)
            build_docs_perm(spark, sf_dir, d100p, 100)
            frames = {
                "x1": spark.read.parquet(
                    f"{sf_dir}/documents.parquet"
                ).select("doc_id", "text", "source"),
                "x10": spark.read.parquet(d10p),
                "x100": spark.read.parquet(d100p),
            }
            # force FULL evaluation: a bare count() lets Catalyst prune
            # the span/rewrite computation down to a row count (first
            # x100 attempt measured 0.6 s for a 6.9 s operator) — fold
            # every output column into one checksum instead
            def checksum(df):
                return df.agg(
                    F.sum(F.xxhash64(*df.columns)).alias("c")
                ).collect()[0]["c"]

            runners = {
                "doc_substring_dedup": lambda df: checksum(
                    repeated_span_stats(df, window=16)
                ),
                "doc_substring_rewrite": lambda df: checksum(
                    substring_dedup_rewrite(df, window=16)
                ),
                "doc_ngram_jaccard": lambda df: checksum(
                    ngram_jaccard_pairs(
                        df, block_col="source", n=3, threshold=0.0
                    )
                ),
            }
            for name in X100:
                if not want(name):
                    continue
                run = runners[name]
                res = {}
                for scale, df in frames.items():
                    n = 1 if scale == "x100" else 2
                    res[scale] = round(
                        best_of(lambda: run(df), n=n), 2
                    )
                    print(f"{name} {scale}: {res[scale]}s",
                          file=sys.stderr)
                results[name] = res

        # --- x100 decade probes, dedup family (r9 second wave) -------
        # The three heaviest HASH-JOIN rows: banded MinHash LSH,
        # pigeonhole-blocked SimHash Hamming join, Bloom-bitset
        # decontamination. Same permutation-salted corpus as the text
        # decade (within-replica near-dup structure is preserved — a
        # character permutation is a bijection on tokens, so Jaccard /
        # Hamming geometry replicates linearly, no cross-replica pair
        # inflation). Bench side of the bloom row is doc_id % 20, which
        # the +r*1e6 id offset preserves per replica — the benchmark
        # suite scales WITH the corpus, the regime the bitset exists
        # for. Invoke as `scale_probe.py x100_dedup` (a group key, so
        # the rotation-corpus x10 simhash probe above doesn't also
        # trigger).
        if want("x100_dedup"):
            from timely_spark.operators.dedup import (
                bloom_decontaminate,
                minhash_dedup,
                simhash_near_dups,
            )

            d10p = os.path.join(tmp, "docs10p")
            d100p = os.path.join(tmp, "docs100p")
            if not os.path.exists(d10p):
                build_docs_perm(spark, sf_dir, d10p, 10)
            if not os.path.exists(d100p):
                build_docs_perm(spark, sf_dir, d100p, 100)
            dframes = {
                "x1": spark.read.parquet(
                    f"{sf_dir}/documents.parquet"
                ).select("doc_id", "text", "source"),
                "x10": spark.read.parquet(d10p),
                "x100": spark.read.parquet(d100p),
            }

            def dchecksum(df):
                return df.agg(
                    F.sum(F.xxhash64(*df.columns)).alias("c")
                ).collect()[0]["c"]

            drunners = {
                "doc_minhash_pairs": lambda df: dchecksum(
                    minhash_dedup(
                        df, threshold=0.5, num_hashes=64, bands=32
                    )
                ),
                "doc_simhash": lambda df: dchecksum(
                    simhash_near_dups(
                        df.select("doc_id", "text"), max_hamming=3
                    )
                ),
                "doc_bloom_decontaminate": lambda df: dchecksum(
                    bloom_decontaminate(
                        df, df.filter(F.col("doc_id") % 20 == 0), n=8
                    )
                ),
            }
            for name, run in drunners.items():
                res = {}
                for scale, df in dframes.items():
                    n = 1 if scale == "x100" else 2
                    res[scale] = round(best_of(lambda: run(df), n=n), 2)
                    print(f"{name} {scale}: {res[scale]}s",
                          file=sys.stderr)
                results[name] = res

        # --- x100 decade probes, ANN index family (r9 second wave) ---
        # emb_ivfpq_ann (encode + ADC scan, corpus-linear by design) and
        # emb_knn_lsh (banded multi-table index, output-bounded probe)
        # at x1/x10/x100 on the sign-mask+shift-salted embeddings.
        # Exhaustive emb_near_dup is EXCLUDED by contract: all-pairs
        # verification is quadratic on purpose; its scale path is
        # emb_semantic_dedup's cluster-then-prune, whose Sum|c|^2 bound
        # requires k to grow with the corpus (documented on the
        # operator) — probing it at fixed k measures a mis-deployment.
        if want("x100_emb"):
            from timely_spark.operators.similarity import (
                ivfpq_topk,
                lsh_topk,
            )

            e10p = os.path.join(tmp, "emb10p")
            e100p = os.path.join(tmp, "emb100p")
            build_embeddings_perm(spark, sf_dir, e10p, 10)
            build_embeddings_perm(spark, sf_dir, e100p, 100)
            eframes = {
                "x1": spark.read.parquet(
                    f"{sf_dir}/embeddings.parquet"
                ).select("vec_id", "embedding"),
                "x10": spark.read.parquet(e10p),
                "x100": spark.read.parquet(e100p),
            }

            def echecksum(df):
                return df.agg(
                    F.sum(F.xxhash64(*df.columns)).alias("c")
                ).collect()[0]["c"]

            def equeries(df):
                return df.filter(F.col("vec_id") < 20).select(
                    F.col("vec_id").alias("query_id"), "embedding"
                )

            erunners = {
                "emb_ivfpq_ann": lambda df: echecksum(
                    ivfpq_topk(
                        df, equeries(df), dim=64, k=10, m=16, ksub=64,
                        ncells=32, nprobe=16,
                    )
                ),
                "emb_knn_lsh": lambda df: echecksum(
                    lsh_topk(
                        df, equeries(df), dim=64, k=10, planes=4,
                        tables=16,
                    )
                ),
            }
            for name, run in erunners.items():
                res = {}
                for scale, df in eframes.items():
                    n = 1 if scale == "x100" else 2
                    res[scale] = round(best_of(lambda: run(df), n=n), 2)
                    print(f"{name} {scale}: {res[scale]}s",
                          file=sys.stderr)
                results[name] = res

        # --- x100 decade probe, ANN index LIFECYCLE (r12) -------------
        # The persistence story quantified: full build+save cost grows
        # with the corpus (one encode pass — unavoidable, paid once),
        # while APPEND of a fixed 1x-sized daily increment onto the
        # saved index must stay ~FLAT as the base corpus grows 10x/100x
        # (only new rows pass the encode stage; existing code files are
        # never rewritten), and the restored-index query pays load +
        # ADC scan only. This is the measured claim behind
        # ann_index.append's "daily-increment cost is new-rows-sized".
        if want("x100_ann_index"):
            from timely_spark.operators.ann_index import IvfPqIndex

            e10p = os.path.join(tmp, "emb10p")
            e100p = os.path.join(tmp, "emb100p")
            if not os.path.exists(e10p):
                build_embeddings_perm(spark, sf_dir, e10p, 10)
            if not os.path.exists(e100p):
                build_embeddings_perm(spark, sf_dir, e100p, 100)
            aframes = {
                "x1": spark.read.parquet(
                    f"{sf_dir}/embeddings.parquet"
                ).select("vec_id", "embedding"),
                "x10": spark.read.parquet(e10p),
                "x100": spark.read.parquet(e100p),
            }
            # the fixed-size daily increment: the x1 corpus, ids offset
            # past every replica so appended rows never collide
            increment = (
                spark.read.parquet(f"{sf_dir}/embeddings.parquet")
                .select(
                    (F.col("vec_id") + F.lit(100_000_000)).alias("vec_id"),
                    "embedding",
                )
            )

            def aquery(idx, df):
                q = df.filter(F.col("vec_id") < 20).select(
                    F.col("vec_id").alias("query_id"), "embedding"
                )
                top = idx.topk(q, k=10, nprobe=16)
                return top.agg(
                    F.sum(F.xxhash64(*top.columns)).alias("c")
                ).collect()[0]["c"]

            res = {}
            for scale, df in aframes.items():
                path = os.path.join(tmp, f"annidx_{scale}")
                t0 = time.time()
                IvfPqIndex.build(
                    df, dim=64, m=16, ksub=64, ncells=32
                ).save(path)
                t_build = time.time() - t0
                idx = IvfPqIndex.load(spark, path)
                t0 = time.time()
                idx = idx.append(increment, path=path)
                t_append = time.time() - t0
                t0 = time.time()
                aquery(IvfPqIndex.load(spark, path), df)
                t_query = time.time() - t0
                res[scale] = {
                    "build_save": round(t_build, 2),
                    "append_1x": round(t_append, 2),
                    "load_query": round(t_query, 2),
                }
                print(f"x100_ann_index {scale}: {res[scale]}",
                      file=sys.stderr)
            results["x100_ann_index"] = res

        if want("x100_minhash_index"):
            # lexical index lifecycle decade probe (r12, the MinHash
            # sibling of x100_ann_index): build+save scales with the
            # corpus (one sign pass), append of a FIXED 1x increment
            # must stay flat (new-rows-sized — the whole point of the
            # persisted index), and screen of a fixed batch grows only
            # with the bands-table scan (int rows), never re-signing
            # the corpus.
            from timely_spark.operators.ann_index import MinHashIndex

            d10p = os.path.join(tmp, "docs10p")
            d100p = os.path.join(tmp, "docs100p")
            if not os.path.exists(d10p):
                build_docs_perm(spark, sf_dir, d10p, 10)
            if not os.path.exists(d100p):
                build_docs_perm(spark, sf_dir, d100p, 100)
            base_docs = spark.read.parquet(
                f"{sf_dir}/documents.parquet"
            ).select("doc_id", "text")
            mframes = {
                "x1": base_docs,
                "x10": spark.read.parquet(d10p).select("doc_id", "text"),
                "x100": spark.read.parquet(d100p).select("doc_id", "text"),
            }
            # fixed-size daily increment: x1 docs under a permutation
            # seed outside every replica's (no cross near-dups), ids
            # offset past every replica
            import random as _random

            rng = _random.Random(10_000)
            lo = list(string.ascii_lowercase)
            up = list(string.ascii_uppercase)
            dg = list(string.digits)
            for chars in (lo, up, dg):
                rng.shuffle(chars)
            src = (
                string.ascii_lowercase + string.ascii_uppercase
                + string.digits
            )
            increment = base_docs.select(
                (F.col("doc_id") + F.lit(500_000_000)).alias("doc_id"),
                F.translate("text", src, "".join(lo + up + dg)).alias(
                    "text"
                ),
            )
            # fixed screen batch: copies of every 7th x1 doc — present
            # in every frame, so the hit work is scale-honest
            batch = base_docs.filter(F.col("doc_id") % 7 == 0).select(
                (F.col("doc_id") + F.lit(600_000_000)).alias("doc_id"),
                "text",
            )

            def mscreen(idx):
                out = idx.screen(batch)
                # checksum forces FULL evaluation (bare count() lets
                # Catalyst prune the verify join)
                return out.agg(
                    F.sum(F.xxhash64(*out.columns)).alias("c")
                ).collect()[0]["c"]

            res = {}
            for scale, df in mframes.items():
                path = os.path.join(tmp, f"mhidx_{scale}")
                t0 = time.time()
                MinHashIndex.build(
                    df, threshold=0.5, num_hashes=64, bands=32
                ).save(path)
                t_build = time.time() - t0
                idx = MinHashIndex.load(spark, path)
                t0 = time.time()
                idx = idx.append(increment, path=path)
                t_append = time.time() - t0
                t0 = time.time()
                mscreen(MinHashIndex.load(spark, path))
                t_screen = time.time() - t0
                res[scale] = {
                    "build_save": round(t_build, 2),
                    "append_1x": round(t_append, 2),
                    "load_screen": round(t_screen, 2),
                }
                print(f"x100_minhash_index {scale}: {res[scale]}",
                      file=sys.stderr)
            results["x100_minhash_index"] = res

        # --- SemDeDup deployed-recipe probe (r9 second wave) ----------
        # The cluster-then-prune bound Sum|c|^2 holds only when k GROWS
        # with the corpus (similarity.py documents the recipe; the ANN
        # decade probe deliberately excluded semantic_dedup because
        # fixed-k is a mis-deployment). This measures the recipe AS
        # DEPLOYED: k=8 at x1 -> k=80 at x10, so mean cluster size
        # stays ~constant and pair work should scale ~linearly.
        if want("x10_semdedup"):
            from timely_spark.operators.similarity import semantic_dedup

            e10p2 = os.path.join(tmp, "emb10p")
            if not os.path.exists(e10p2):
                build_embeddings_perm(spark, sf_dir, e10p2, 10)
            sframes = {
                ("x1", 8): spark.read.parquet(
                    f"{sf_dir}/embeddings.parquet"
                ).select("vec_id", "embedding"),
                ("x10", 80): spark.read.parquet(e10p2),
            }

            def schecksum(df):
                return df.agg(
                    F.sum(F.xxhash64(*df.columns)).alias("c")
                ).collect()[0]["c"]

            res = {}
            for (scale, k), df in sframes.items():
                res[scale] = round(
                    best_of(
                        lambda: schecksum(
                            semantic_dedup(df, k=k, threshold=0.4)
                        ),
                        n=2,
                    ),
                    2,
                )
                print(
                    f"emb_semantic_dedup {scale} (k={k}): {res[scale]}s",
                    file=sys.stderr,
                )
            results["emb_semantic_dedup"] = res

        # --- x100 decade probe, corpus-compare family (r10 debut) ----
        # source_overlap / source_drift / split_guard on the
        # permutation-salted corpus. The salting is the right shape
        # here too: each replica's `source` names are salted (#r), so
        # sources grow 100x but replicas share no grams (disjoint token
        # universes) — co-occurring pairs grow LINEARLY in replicas
        # (within-replica only), exactly like a real federation of
        # independent feeds; a naive |sources|^2 materialization would
        # instead explode 10^4x and this probe would catch it.
        if want("x100_compare"):
            from timely_spark.operators.corpus_compare import (
                source_drift,
                source_overlap_matrix,
                split_leakage_guard,
            )

            d10p = os.path.join(tmp, "docs10p")
            d100p = os.path.join(tmp, "docs100p")
            if not os.path.exists(d10p):
                build_docs_perm(spark, sf_dir, d10p, 10)
            if not os.path.exists(d100p):
                build_docs_perm(spark, sf_dir, d100p, 100)
            cframes = {
                "x1": spark.read.parquet(
                    f"{sf_dir}/documents.parquet"
                ).select("doc_id", "text", "source"),
                "x10": spark.read.parquet(d10p),
                "x100": spark.read.parquet(d100p),
            }

            def cchecksum(df):
                return df.agg(
                    F.sum(F.xxhash64(*df.columns)).alias("c")
                ).collect()[0]["c"]

            def drift_pair(df):
                old = df.filter(F.col("doc_id") % 11 != 7)
                new = df.filter(F.col("doc_id") % 13 != 5).withColumn(
                    "text",
                    F.when(
                        F.col("doc_id") % 17 == 0,
                        F.concat("text", F.lit(" rev2")),
                    ).otherwise(F.col("text")),
                )
                return old, new

            crunners = {
                "doc_source_overlap": lambda df: cchecksum(
                    source_overlap_matrix(df, n=8)
                ),
                "doc_source_drift": lambda df: cchecksum(
                    source_drift(*drift_pair(df))
                ),
                "doc_split_guarded": lambda df: cchecksum(
                    split_leakage_guard(df.select("doc_id", "text"))
                ),
            }
            for name, run in crunners.items():
                res = {}
                for scale, df in cframes.items():
                    n = 1 if scale == "x100" else 2
                    res[scale] = round(best_of(lambda: run(df), n=n), 2)
                    print(f"{name} {scale}: {res[scale]}s",
                          file=sys.stderr)
                results[name] = res

        # --- shared-gram pair-emission leg (r11, VERDICT r10 #4) ------
        # The disjoint-universe salting above grows co-occurring pairs
        # LINEARLY, so it structurally cannot exercise the quadratic-
        # OUTPUT regime: one universal boilerplate gram shared by ALL
        # sources makes the pair set C(|sources|, 2) — 100, 1 000 and
        # 4 000 sources give ~5.0k / ~500k / ~8.0M pairs (a ~100x then
        # ~16x output decade). The streamed pair_emit must track the
        # OUTPUT size; the old single-row flatten would instead build
        # the full pair array inside one value (at 4 000 sources, ~8M
        # structs in one cell) before any reduction could run.
        if want("x100_shared"):
            from timely_spark.operators.corpus_compare import (
                source_overlap_matrix,
            )

            boiler = " w1 w2 w3 w4 w5 w6 w7 w8"
            res = {}
            for label, S in (("s100", 100), ("s1000", 1000), ("s4000", 4000)):
                docs = spark.range(S * 5).select(
                    F.concat(
                        F.lit("src"), (F.col("id") % S).cast("string")
                    ).alias("source"),
                    F.concat(
                        F.lit("u"), F.col("id").cast("string"), F.lit(boiler)
                    ).alias("text"),
                )
                n_pairs = S * (S - 1) // 2

                def run_shared(d=docs, want_pairs=n_pairs):
                    m = source_overlap_matrix(d, n=8)
                    got = m.count()
                    assert got == want_pairs, (got, want_pairs)
                    return got

                res[label] = round(
                    best_of(lambda: run_shared(), n=1 if S >= 4000 else 2), 2
                )
                print(
                    f"doc_source_overlap shared-gram {label} "
                    f"({n_pairs} pairs): {res[label]}s",
                    file=sys.stderr,
                )
            results["doc_source_overlap_shared"] = res

        # --- retrieval decade probe (r11: bm25_topk / hybrid_topk) ----
        # The permutation-salted corpus rotates letters per replica, so
        # the probe terms only match replica 0 — which is the realistic
        # regime (probes match a tiny slice of a 100 TB corpus): the
        # corpus-linear parts (tokenize, dl/stats aggregate, embedding
        # sign sums) scale with the decade while the match-selective
        # unpivot/top-k stays x1-sized. A probe suite whose matches
        # ALSO scaled 100x would conflate the two growth terms.
        if want("x100_retrieval"):
            from timely_spark.operators.retrieval import (
                bm25_topk,
                hybrid_topk,
            )

            probes = {
                "q_join": "hash join spark window shuffle",
                "q_scan": "fast scan filter column batch",
                "q_sort": "sort merge join order key",
                "q_stream": "stream window state value",
                "q_dup": "dup data big table key",
            }
            d10p = os.path.join(tmp, "docs10p")
            d100p = os.path.join(tmp, "docs100p")
            if not os.path.exists(d10p):
                build_docs_perm(spark, sf_dir, d10p, 10)
            if not os.path.exists(d100p):
                build_docs_perm(spark, sf_dir, d100p, 100)
            rframes = {
                "x1": spark.read.parquet(
                    f"{sf_dir}/documents.parquet"
                ).select("doc_id", "text"),
                "x10": spark.read.parquet(d10p).select("doc_id", "text"),
                "x100": spark.read.parquet(d100p).select("doc_id", "text"),
            }

            def rchecksum(df):
                return df.agg(
                    F.sum(F.xxhash64(*df.columns)).alias("c")
                ).collect()[0]["c"]

            rrunners = {
                "doc_bm25_topk": lambda df: rchecksum(
                    bm25_topk(df, probes, k=10)
                ),
                "doc_hybrid_retrieval": lambda df: rchecksum(
                    hybrid_topk(df, probes, k=10)
                ),
            }
            for name, run in rrunners.items():
                res = {}
                for scale, df in rframes.items():
                    n = 1 if scale == "x100" else 2
                    res[scale] = round(best_of(lambda: run(df), n=n), 2)
                    print(f"{name} {scale}: {res[scale]}s", file=sys.stderr)
                results[name] = res

        # --- x100 store/ingest decade probe (r10, VERDICT r9 #1) -----
        # The core-engine path: salted line-protocol backlog ->
        # parse_lines_df -> write_points partitioned store at x1/x10/
        # x100, then the engine-query tiers over each store
        # (store_query_pruned = 6h dt-pruned slice, store_query_tag =
        # one promoted-tag series over the full range — both through
        # the FULL OpenTSDB request pipeline, bench's own runners).
        # Two scaling dimensions, probed separately:
        #   * SERIES (user-offset replicas): partition-dir count stays
        #     metrics x days; per-partition volume grows 100x — the
        #     regime the hour-partition row key (MetricAdapter.java:
        #     47-49) handles by seek, the Parquet layout by row-group
        #     stats inside bigger files.
        #   * METRICS (salted event_type at x100): dir count grows
        #     100x (15k dirs) — the small-file regime metric_bucket
        #     exists for; measured unbucketed vs bucket_metrics=64.
        if want("x100_store"):
            import bench

            from timely_spark.model import ts_epoch_ms
            from timely_spark.sources.lineprotocol import parse_lines_df
            from timely_spark.sources.store import write_points

            def put_lines(ev):
                return ev.select(
                    F.concat_ws(
                        " ",
                        F.lit("put"),
                        F.col("event_type"),
                        ts_epoch_ms(ev),
                        F.col("value").cast("string"),
                        F.concat(
                            F.lit("user="), F.col("user_id").cast("string")
                        ),
                    ).alias("value")
                )

            def store_stats(path):
                ndirs = nfiles = nbytes = 0
                for root, _dirs, files in os.walk(path):
                    pf = [f for f in files if f.endswith(".parquet")]
                    if pf:
                        ndirs += 1
                    nfiles += len(pf)
                    nbytes += sum(
                        os.path.getsize(os.path.join(root, f)) for f in pf
                    )
                return ndirs, nfiles, nbytes

            def probe_store(label, ev, bucket_metrics=None, nrun=2):
                lines = put_lines(ev)
                n = lines.count()
                store = os.path.join(tmp, f"store_{label}")
                best = None
                for _ in range(nrun):
                    t0 = time.time()
                    write_points(
                        parse_lines_df(lines),
                        store,
                        mode="overwrite",
                        bucket_metrics=bucket_metrics,
                        promote_tags=["user"],
                    )
                    best = min(best or 1e18, time.time() - t0)
                ndirs, nfiles, nbytes = store_stats(store)
                q6h = min(
                    bench.bench_store_query(spark, store)[0]
                    for _ in range(2)
                )
                qtag = min(
                    bench.bench_store_query_tag(spark, store)[0]
                    for _ in range(2)
                )
                r = {
                    "points": n,
                    "ingest_s": round(best, 2),
                    "points_per_s": int(n / best),
                    "partition_dirs": ndirs,
                    "files": nfiles,
                    "mb": round(nbytes / 1e6, 1),
                    "query_pruned_s": round(q6h, 2),
                    "query_tag_s": round(qtag, 2),
                }
                print(f"store {label}: {r}", file=sys.stderr)
                return r

            stres = {}
            for scale, reps in (("x1", 1), ("x10", 10), ("x100", 100)):
                if reps == 1:
                    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
                else:
                    evdir = os.path.join(tmp, f"sev_{scale}")
                    build_events_scaled(spark, sf_dir, evdir, reps)
                    ev = spark.read.parquet(evdir)
                stres[scale] = probe_store(
                    scale, ev, nrun=1 if reps == 100 else 2
                )
            evm = os.path.join(tmp, "sev_x100m")
            build_events_scaled(spark, sf_dir, evm, 100, salt_metrics=True)
            evmetrics = spark.read.parquet(evm)
            stres["x100_metrics_unbucketed"] = probe_store(
                "x100m_flat", evmetrics, nrun=1
            )
            stres["x100_metrics_bucket64"] = probe_store(
                "x100m_b64", evmetrics, bucket_metrics=64, nrun=1
            )
            results["store_ingest_decade"] = stres

        # --- x100 streaming-state decade probe (r10, VERDICT r9 #2) --
        # MetricScanner.run() (202-268) is a forever-loop — state
        # growth is the one thing that kills it at 100x backlog. Drain
        # the x1/x10/x100 user-offset backlog (100x the SERIES key
        # space) through three stateful shapes via availableNow and
        # record wall + state rows/bytes from stream progress:
        #   * summarize: state ~ open (metric, series, window) tuples
        #     -> expected to grow with the series dimension;
        #   * sessionize: state ~ OPEN sessions (users inside the
        #     watermark) -> grows with series, never with total volume;
        #   * CMS heavy hitters: state is the SKETCH (depth x width
        #     counters per open window) -> expected ~FLAT at x100 —
        #     the scale-safe design the r9 verdict called out.
        if want("x100_stream"):
            import bench

            from timely_spark.model import ts_epoch_ms
            from timely_spark.streaming.cms import cms_stream_query
            from timely_spark.streaming.sessionize import sessionize_stream

            # MEASURED r10: the default HDFSBackedStateStoreProvider
            # holds every open key's state in executor heap — the x100
            # summarize tier (9.9M open (series, window) keys, ~4.2 GB
            # of state) OOMs the 8 GiB local JVM outright. The
            # production lever past ~1M open keys/executor is the
            # RocksDB provider (off-heap + disk-backed, bounded block
            # cache); x100 tiers run under it, and an x10_rocksdb tier
            # measures its overhead apples-to-apples vs in-heap x10.
            _PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
            _ROCKSDB = (
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
            )

            def with_provider(provider, fn):
                old = None
                try:
                    old = spark.conf.get(_PROVIDER_KEY)
                except Exception:
                    pass
                if provider:
                    spark.conf.set(_PROVIDER_KEY, provider)
                try:
                    return fn()
                finally:
                    if provider:
                        if old:
                            spark.conf.set(_PROVIDER_KEY, old)
                        else:
                            spark.conf.unset(_PROVIDER_KEY)

            def drain(make_query, srcdir):
                ck = tempfile.mkdtemp(prefix="tsp_ck_", dir=tmp)
                outp = tempfile.mkdtemp(prefix="tsp_out_", dir=tmp)
                t0 = time.time()
                q = make_query(srcdir, ck, outp)
                q.awaitTermination()
                dt = time.time() - t0
                srows = sbytes = 0
                for p in q.recentProgress:
                    for so in p.get("stateOperators") or []:
                        srows = max(srows, so.get("numRowsTotal") or 0)
                        sbytes = max(
                            sbytes, so.get("memoryUsedBytes") or 0
                        )
                n_out = spark.read.parquet(outp).count()
                shutil.rmtree(ck, ignore_errors=True)
                shutil.rmtree(outp, ignore_errors=True)
                return round(dt, 2), n_out, srows, sbytes

            def stream_events(srcdir):
                schema = spark.read.parquet(
                    f"{sf_dir}/events.parquet"
                ).schema
                return spark.readStream.schema(schema).parquet(srcdir)

            def make_sessionize(srcdir, ck, outp):
                ev = stream_events(srcdir)
                ev = ev.withColumn("ts_ms", ts_epoch_ms(ev))
                return sessionize_stream(
                    ev, ck, outp, gap_minutes=30,
                    watermark_seconds=120, available_now=True,
                )

            def make_cms(srcdir, ck, outp):
                ev = stream_events(srcdir)
                ev = ev.withColumn("ts", ts_epoch_ms(ev))
                return cms_stream_query(
                    ev, "user_id", window_seconds=3600, checkpoint=ck,
                    out_path=outp, watermark_seconds=120,
                    available_now=True,
                )

            def run_tier(srcdir, provider=None):
                tier = {"provider": "rocksdb" if provider else "heap"}

                def _summ():
                    return bench.bench_streaming_summarize(spark, srcdir)

                dt, n_out, srows, sbytes = with_provider(provider, _summ)
                tier["summarize"] = {
                    "s": round(dt, 2), "out_rows": n_out,
                    "state_rows": srows, "state_bytes": sbytes,
                }
                dt, n_out, srows, sbytes = with_provider(
                    provider, lambda: drain(make_sessionize, srcdir)
                )
                tier["sessionize"] = {
                    "s": dt, "out_rows": n_out,
                    "state_rows": srows, "state_bytes": sbytes,
                }
                dt, n_out, srows, sbytes = with_provider(
                    provider, lambda: drain(make_cms, srcdir)
                )
                tier["cms"] = {
                    "s": dt, "out_rows": n_out,
                    "state_rows": srows, "state_bytes": sbytes,
                }
                return tier

            sres = {}
            srcdirs = {}
            for scale, reps in (("x1", 1), ("x10", 10), ("x100", 100)):
                if reps == 1:
                    srcdir = os.path.join(tmp, "stream_x1")
                    os.makedirs(srcdir, exist_ok=True)
                    dst = os.path.join(srcdir, "events.parquet")
                    if not os.path.exists(dst):
                        os.symlink(
                            os.path.abspath(f"{sf_dir}/events.parquet"),
                            dst,
                        )
                else:
                    srcdir = os.path.join(tmp, f"stream_{scale}")
                    if not os.path.exists(
                        os.path.join(srcdir, "events.parquet")
                    ):
                        build_events(spark, sf_dir, srcdir, replicas=reps)
                srcdirs[scale] = srcdir
                # x100 state (~10M open keys, ~4.2 GB) OOMs the in-heap
                # provider on this JVM — measured, recorded in SCALE.md;
                # the tier runs under RocksDB (the production choice)
                tier = run_tier(
                    srcdir, provider=_ROCKSDB if scale == "x100" else None
                )
                print(f"stream {scale}: {tier}", file=sys.stderr)
                sres[scale] = tier
            # RocksDB overhead at a size the heap provider also
            # handles: same backlog, both providers
            tier = run_tier(srcdirs["x10"], provider=_ROCKSDB)
            print(f"stream x10_rocksdb: {tier}", file=sys.stderr)
            sres["x10_rocksdb"] = tier
            # volume-ONLY x100: same series keys, input x100 — state
            # must stay ~x1 (the separating evidence: state follows
            # open keys, never raw volume)
            vdir = os.path.join(tmp, "stream_x100vol")
            if not os.path.exists(os.path.join(vdir, "events.parquet")):
                build_events_volume(spark, sf_dir, vdir, 100)
            # heap provider on purpose: state stays ~x1-sized, which is
            # exactly the claim this leg exists to prove
            tier = run_tier(vdir)
            print(f"stream x100_volume: {tier}", file=sys.stderr)
            sres["x100_volume"] = tier
            results["streaming_state_decade"] = sres

        # --- media_video_near_dup ------------------------------------
        # fixture BUILT OUTSIDE the timed region (driver-side AVI
        # synthesis is test scaffolding, not the operator)
        if want("media_video_near_dup"):
            from timely_spark.operators.multimodal import (
                MEDIA_SCHEMA,
                make_avi_mjpeg,
                video_near_dups,
            )

            def media_rows(n):
                rows = []
                for i in range(n):
                    rows.append(
                        (i, "video", "video/x-msvideo",
                         make_avi_mjpeg(4, width=48, height=32, fps=2.0,
                                        seed=100 + i * 7), None)
                    )
                    if i % 3 == 0:
                        rows.append(
                            (1000 + i, "video", "video/x-msvideo",
                             make_avi_mjpeg(4, width=48, height=32, fps=2.0,
                                            seed=100 + i * 7, luma_shift=6),
                             None)
                        )
                return spark.createDataFrame(rows, MEDIA_SCHEMA)

            m1, m10 = media_rows(8), media_rows(80)

            def video(df):
                return lambda: video_near_dups(
                    df, every_n_seconds=0.5, min_shared_frames=2
                ).count()

            t1 = best_of(video(m1))
            t10 = best_of(video(m10))
            results["media_video_near_dup"] = {
                "x1": round(t1, 2), "x10": round(t10, 2)
            }
            print(f"video {t1:.2f} -> {t10:.2f}", file=sys.stderr)

        # --- streaming_summarize (with state growth) -----------------
        if want("streaming_summarize"):
            import bench

            s1 = None
            for _ in range(2):
                dt, n_out, srows, sbytes = bench.bench_streaming_summarize(
                    spark, sf_dir
                )
                if s1 is None or dt < s1[0]:
                    s1 = (dt, n_out, srows, sbytes)
            s10 = None
            for _ in range(2):
                dt, n_out, srows, sbytes = bench.bench_streaming_summarize(
                    spark, ev10
                )
                if s10 is None or dt < s10[0]:
                    s10 = (dt, n_out, srows, sbytes)
            results["streaming_summarize"] = {
                "x1": round(s1[0], 2), "x10": round(s10[0], 2),
                "state_rows_x1": s1[2], "state_rows_x10": s10[2],
                "state_bytes_x1": s1[3], "state_bytes_x10": s10[3],
            }
            print(f"streaming {s1} -> {s10}", file=sys.stderr)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    for k, v in results.items():
        # the decade-probe groups nest per-tier dicts; plain-operator
        # entries carry flat x1/x10[/x100] floats to ratio over
        if not isinstance(v.get("x1"), (int, float)):
            continue
        v["ratio"] = round(v["x10"] / max(v["x1"], 1e-9), 1)
        if "x100" in v:
            v["ratio_x100_x10"] = round(
                v["x100"] / max(v["x10"], 1e-9), 1
            )
    print(json.dumps({"sf_dir": sf_dir, "replicas": REPLICAS,
                      "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
