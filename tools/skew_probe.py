#!/usr/bin/env python3
"""Skew probe: the heavy shuffle rows under deliberately HOT keys.

The scale story so far measures volume (x10/x100 decades) on corpora
whose keys stay well-spread. At 100 TB the other failure mode is SKEW —
one key owning a disproportionate share of a shuffle — so this probe
builds three hot-key variants of the sf0.1 inputs and measures the
operators that shuffle on the skewed key, comparing against the
well-spread baseline AND verifying output sanity (completion alone is
not evidence; a skew-killed plan usually dies, but a silently wrong
fallback would pass a bare timer):

  exact_dedup_hot     10% of the corpus is ONE byte-identical text —
                      a single md5 group owns a tenth of the groupBy
                      (the keeper head-set shape).
  minhash_hot         a 600-doc near-identical cluster — every band
                      bucket it touches goes hot, candidate pairs for
                      the cluster are ~m^2/2 = 180k (bucket-join skew).
  sessionize_hot      one user owns 20% of all events (per-user window
                      skew — the r4 head-set-broadcast rewrite's
                      regime, now measured rather than argued).

AQE (enabled in session.py: adaptive.enabled + skewJoin.enabled) is
the engine-side mitigation under test for the join shapes; the window
shapes ride on the operators' own head-set designs. Warm best-of-2,
one session, local[32]. Prints one JSON line for SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def checksum(df):
    """Force FULL evaluation (the scale_probe lesson: a bare count()
    lets Catalyst prune the window/agg arithmetic entirely)."""
    from pyspark.sql import functions as F

    return df.agg(F.sum(F.xxhash64(*df.columns)).alias("c")).collect()[0]["c"]


def best_of(fn, n: int = 2) -> float:
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best or 1e18, time.time() - t0)
    return best


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from timely_spark.session import get_spark

    spark = get_spark("timely-skew-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    tmp = tempfile.mkdtemp(prefix="timely_skew_probe_")
    results: dict[str, dict] = {}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )

    # ---- exact dedup: one md5 group owns 10% of the corpus ----------
    from timely_spark.operators.dedup import exact_dup_groups

    hot_docs = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 10 == 3, F.lit("the one hot document"))
        .otherwise(F.col("text")),
    )
    p_base = os.path.join(tmp, "docs_base")
    p_hot = os.path.join(tmp, "docs_hot")
    docs.write.mode("overwrite").parquet(p_base)
    hot_docs.write.mode("overwrite").parquet(p_hot)
    base_df = spark.read.parquet(p_base)
    hot_df = spark.read.parquet(p_hot)

    def dedup_count(df):
        return lambda: checksum(exact_dup_groups(df))

    t_b = best_of(dedup_count(base_df))
    t_h = best_of(dedup_count(hot_df))
    # sanity: the hot variant must report the giant group exactly
    hot_n = hot_df.filter(
        F.col("text") == "the one hot document"
    ).count()
    giant = (
        exact_dup_groups(hot_df)
        .filter(F.col("dup_count") >= hot_n)
        .collect()
    )
    assert len(giant) == 1 and giant[0]["dup_count"] == hot_n, giant
    results["exact_dedup_hot"] = {
        "base_s": round(t_b, 2), "hot_s": round(t_h, 2),
        "ratio": round(t_h / max(t_b, 1e-9), 1),
        "hot_group_rows": hot_n,
    }
    print(f"exact_dedup {t_b:.2f} -> hot {t_h:.2f}", file=sys.stderr)

    # ---- minhash: a 600-doc near-identical cluster ------------------
    from timely_spark.operators.dedup import minhash_dedup

    cluster = docs.limit(1).select(F.col("text").alias("__t"))
    seed_text = cluster.collect()[0]["__t"]
    m = 600
    hot_rows = spark.range(m).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        # vary one trailing token so the cluster is near- (not byte-)
        # identical: every pair still clears jaccard >= 0.5
        F.concat(
            F.lit(seed_text), F.lit(" v"), F.col("id").cast("string")
        ).alias("text"),
        F.lit("hot").alias("source"),
    )
    p_mh = os.path.join(tmp, "docs_mh")
    docs.unionByName(hot_rows).write.mode("overwrite").parquet(p_mh)
    mh_df = spark.read.parquet(p_mh)

    def mh_pairs(df):
        return lambda: checksum(
            minhash_dedup(df, threshold=0.5, num_hashes=64, bands=32)
        )

    t_b2 = best_of(mh_pairs(base_df))
    t_h2 = best_of(mh_pairs(mh_df))
    n_pairs_hot = minhash_dedup(
        mh_df, threshold=0.5, num_hashes=64, bands=32
    ).filter((F.col("id_a") >= 10_000_000) & (F.col("id_b") >= 10_000_000)).count()
    # the cluster's pair count must be exactly m*(m-1)/2 — the bucket
    # join surfaced EVERY intra-cluster pair despite the hot buckets
    want_pairs = m * (m - 1) // 2
    assert n_pairs_hot == want_pairs, (n_pairs_hot, want_pairs)
    results["minhash_hot"] = {
        "base_s": round(t_b2, 2), "hot_s": round(t_h2, 2),
        "ratio": round(t_h2 / max(t_b2, 1e-9), 1),
        "cluster_pairs": n_pairs_hot,
    }
    print(f"minhash {t_b2:.2f} -> hot {t_h2:.2f}", file=sys.stderr)

    # ---- sessionize: one user owns 20% of events --------------------
    from timely_spark.model import ts_epoch_ms
    from timely_spark.streaming.sessionize import sessionize_lag

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = ev.select(
        F.col("user_id"),
        ts_epoch_ms(ev).alias("ts_ms"),
        F.col("value"),
        F.col("event_id"),
    )
    hot_pts = pts.withColumn(
        "user_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(424242))
        .otherwise(F.col("user_id")),
    )
    p_ev_b = os.path.join(tmp, "ev_base")
    p_ev_h = os.path.join(tmp, "ev_hot")
    pts.write.mode("overwrite").parquet(p_ev_b)
    hot_pts.write.mode("overwrite").parquet(p_ev_h)
    evb = spark.read.parquet(p_ev_b)
    evh = spark.read.parquet(p_ev_h)

    def sess(df):
        return lambda: checksum(
            sessionize_lag(df, gap_minutes=30, order_cols=("event_id",))
        )

    t_b3 = best_of(sess(evb))
    t_h3 = best_of(sess(evh))
    n_ev = evh.count()
    hot_share = evh.filter(F.col("user_id") == 424242).count()
    assert hot_share * 5 >= n_ev - 5, (hot_share, n_ev)
    results["sessionize_hot"] = {
        "base_s": round(t_b3, 2), "hot_s": round(t_h3, 2),
        "ratio": round(t_h3 / max(t_b3, 1e-9), 1),
        "hot_user_events": hot_share,
    }
    print(f"sessionize {t_b3:.2f} -> hot {t_h3:.2f}", file=sys.stderr)

    print(json.dumps({"sf_dir": sf_dir, "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
