#!/usr/bin/env python3
"""Measure ANN recall@k vs brute force on the full embeddings table.

VERDICT r5 item #6: the emb_* recall floors were pinned only on tiny
planted fixtures; this records recall@10 for every ANN variant
(LSH / IVF / PQ / IVFPQ / IVFPQ+rerank) against the exact cosine top-10
at a real scale factor, as a committed per-round artifact (RECALL.json)
so the accuracy/cost trade-off is visible round over round.

Usage:
    python3 tools/measure_recall.py                  # sf0.1 -> RECALL.json
    python3 tools/measure_recall.py /root/testdata/sf0.01
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 10
N_QUERIES = 20  # vec_id < 20: more queries than the registry rows' 5
                # for a tighter recall estimate


def _topk_sets(rows) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def measure(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from timely_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        ivfpq_rerank_topk,
        ivfpq_topk,
        lsh_topk,
        pq_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_corpus = emb.count()
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    truth = _topk_sets(cosine_topk(emb, q, k=K).collect())

    # same hyperparameters as the registry rows (__spark_entry__.py)
    variants = {
        # r8 defaults: the registry rows' operating points (VERDICT r7
        # #2 — lsh 4x16 / rerank nprobe=32 promoted from the sweeps)
        "lsh": lambda: lsh_topk(emb, q, dim=64, k=K, planes=4, tables=16),
        # r9 default from the nprobe sweep (VERDICT r8 #5)
        "ivf": lambda: ivf_topk(emb, q, k=K, ncells=16, nprobe=12),
        # r10 defaults: ksub 64 -> 256 promoted from the codebook sweep
        # (VERDICT r9 #4) — same ADC scan cost, +0.155/+0.085 recall
        "pq": lambda: pq_topk(emb, q, dim=64, k=K, m=16, ksub=256),
        "ivfpq": lambda: ivfpq_topk(
            emb, q, dim=64, k=K, m=16, ksub=256, ncells=32, nprobe=16
        ),
        "ivfpq_rerank": lambda: ivfpq_rerank_topk(
            emb, q, dim=64, k=K, rerank=8, ncells=32, nprobe=32
        ),
    }
    out = {
        "sf_dir": sf_dir,
        "n_corpus": n_corpus,
        "n_queries": N_QUERIES,
        "k": K,
        "recall": {},
        "sec": {},
    }
    def recall_of(df) -> float:
        got = _topk_sets(df.collect())
        hits = sum(len(got.get(qid, set()) & t) for qid, t in truth.items())
        return hits / sum(len(t) for t in truth.values())

    for name, run in variants.items():
        t0 = time.time()
        r = recall_of(run())
        out["sec"][name] = round(time.time() - t0, 3)
        out["recall"][name] = round(r, 4)

    # the recall-recovery knobs: on structureless (near-random) synthetic
    # embeddings quantization recall is inherently weak — what matters at
    # scale is that recall rises MONOTONICALLY with probe/rerank budget
    # (candidate-selection bound), which this sweep documents per round
    out["rerank_sweep"] = {
        f"nprobe={np_},rerank={rr}": round(
            recall_of(
                ivfpq_rerank_topk(
                    emb, q, dim=64, k=K, rerank=rr, ncells=32, nprobe=np_
                )
            ),
            4,
        )
        for np_, rr in ((8, 4), (8, 16), (16, 8), (32, 8))
    }
    # the (m, ksub) codebook sweep that set the r7 defaults (VERDICT r6
    # #4): recall@10 for PQ and IVFPQ across the FAISS-practice grid,
    # recorded per round so a testdata regeneration that shifts the
    # trade-off is visible
    out["codebook_sweep"] = {
        f"{kind} m={m},ksub={ks}": round(recall_of(fn(m, ks)), 4)
        for kind, fn in (
            ("pq", lambda m, ks: pq_topk(emb, q, dim=64, k=K, m=m, ksub=ks)),
            ("ivfpq", lambda m, ks: ivfpq_topk(
                emb, q, dim=64, k=K, m=m, ksub=ks, ncells=32, nprobe=16)),
        )
        for m, ks in ((8, 16), (8, 64), (16, 16), (16, 64), (16, 256))
    }
    # the IVF nprobe / LSH (planes, tables) sweep that set the r7
    # defaults for the full-precision variants
    out["knn_sweep"] = {
        **{
            f"ivf ncells={nc},nprobe={np_}": round(
                recall_of(ivf_topk(emb, q, k=K, ncells=nc, nprobe=np_)), 4
            )
            for nc, np_ in ((16, 6), (16, 8), (16, 10), (16, 12), (32, 12))
        },
        **{
            f"lsh planes={pl},tables={tb}": round(
                recall_of(lsh_topk(emb, q, dim=64, k=K, planes=pl, tables=tb)), 4
            )
            for pl, tb in ((5, 10), (4, 12), (4, 16))
        },
    }
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from timely_spark.session import configure, get_spark

    spark = configure(get_spark("measure-recall"))
    res = measure(spark, sf_dir)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "RECALL.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=2, sort_keys=True)
        f.write("\n")
    print(json.dumps(res, sort_keys=True))


if __name__ == "__main__":
    main()
