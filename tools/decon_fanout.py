#!/usr/bin/env python3
"""Measure the blocked decontamination regime's candidate fan-out.

The operator's scale claim is "candidate volume = sum over probed
cells of |cell| — bounded by geometry, degrading toward the cross join
only if every doc aims at every cell". This tool MEASURES that claim
instead of arguing it (the SCALE.md convention), on two benchmark
shapes at sf0.1:

  clustered    — what real benchmark suites look like: K topic
                 clusters, each a base doc plus light token-dropout
                 edits (near-dups in embedding space)
  unclustered  — the worst case: a spread of unrelated corpus docs

For each (shape, ncells, lloyd_iters) point it reports

  probes      (doc, cell) rows emitted by the probe stage
  candidates  pair rows entering the integer verdict
  cross       |docs| x |bench| — what the broadcast regime evaluates
  cand_frac   candidates / cross — the pruning factor

Usage: python3 tools/decon_fanout.py [sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLDS = (0.8, 0.95)  # 0.8 = the operator default, the WIDEST tau
                          # band (hardest pruning case); 0.95 = the
                          # registry row's operating point


def build_benchmarks(spark, docs):
    from pyspark.sql import functions as F

    # clustered: 25 base docs x 10 variants, each variant drops every
    # k-th token (k = 6..14 -> cosine to base ~ sqrt(1 - 1/k) = 0.91-
    # 0.96) — the near-dup-heavy shape real benchmark suites have
    base = docs.filter(F.col("doc_id") % 200 == 0).select("doc_id", "text")
    variants = [
        base.select((F.col("doc_id") * 100).alias("doc_id"), F.col("text"))
    ]
    for k in range(6, 15):
        toks = F.split(F.col("text"), " ")
        kept = F.filter(toks, lambda t, i: i % k != 0)
        variants.append(
            base.select(
                (F.col("doc_id") * 100 + k).alias("doc_id"),
                F.array_join(kept, " ").alias("text"),
            )
        )
    clustered = variants[0]
    for v in variants[1:]:
        clustered = clustered.unionByName(v)
    # unclustered: 250 unrelated docs
    unclustered = docs.filter(F.col("doc_id") % 20 == 0).select(
        "doc_id", "text"
    )
    return {"clustered": clustered, "unclustered": unclustered}


def measure(spark, docs, bench, ncells, lloyd_iters, threshold):
    from pyspark.sql import functions as F

    from timely_spark.operators.similarity import (
        _decon_cell_index,
        _decon_probes,
        _hashed_sums,
        _integer_hit,
        _tau_pq,
    )

    dim = 32
    p, q = _tau_pq(threshold)
    ds = _hashed_sums(docs, dim, "text", "doc_id")
    bs = _hashed_sums(bench, dim, "text", "doc_id").select(
        F.col("doc_id").alias("__bid"),
        *[F.col(f"__s{d}").alias(f"__b{d}") for d in range(dim)],
    )
    bs = bs.filter(
        F.greatest(*[F.abs(F.col(f"__b{d}")) for d in range(dim)]) > 0
    )
    b_assigned, cent, radii = _decon_cell_index(bs, dim, ncells, lloyd_iters)
    probes = _decon_probes(
        ds, cent, radii, math.acos(threshold), 1e-6, "doc_id"
    )
    n_probes = probes.count()
    cand = probes.join(b_assigned, "__cell")
    n_cand = cand.count()
    from timely_spark.operators.similarity import _bal_sum

    dot = _bal_sum(F.col(f"__s{d}") * F.col(f"__b{d}") for d in range(dim))
    n_hits = cand.filter(
        _integer_hit(dot, F.col("__n1"), F.col("__n2"), p, q)
    ).count()
    cross = docs.count() * b_assigned.count()
    b_assigned.unpersist()
    return {
        "probes": n_probes,
        "candidates": n_cand,
        "hits": n_hits,
        "cross": cross,
        "cand_frac": round(n_cand / cross, 3),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from timely_spark.session import get_spark

    spark = get_spark("timely-decon-fanout")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = {"sf_dir": sf_dir, "thresholds": THRESHOLDS, "points": {}}
    for shape, bench in build_benchmarks(spark, docs).items():
        for tau in THRESHOLDS:
            for ncells in (8, 16, 32):
                for ll in (0, 2):
                    key = f"{shape} tau={tau} ncells={ncells} lloyd={ll}"
                    out["points"][key] = measure(
                        spark, docs, bench, ncells, ll, tau
                    )
                    print(key, out["points"][key], file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
