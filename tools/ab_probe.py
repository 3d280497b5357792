#!/usr/bin/env python3
"""Same-session A/B probe for bench-gate drift triage (BASELINE.md drift
protocol, r6/r7 precedent).

Runs a SMALL list of suspect bench entries isolated-warm best-of-2 against
an arbitrary repo root (HEAD or a git worktree of an older round's final
commit), plus ``host_calibration`` so host speed is measured inside the
same session. Two back-to-back invocations (new root, old root) give the
code-ruled-in/ruled-out verdict without waiting a full suite.

Usage:
    python tools/ab_probe.py --root /root/repo \
        --entries doc_line_dedup,ts_ageoff --ingest
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="repo root whose code to time")
    ap.add_argument(
        "--entries", default="", help="comma-separated registry query names"
    )
    ap.add_argument(
        "--ingest",
        action="store_true",
        help="also run ingest_lineprotocol + store_query_pruned from bench.py",
    )
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    root = os.path.abspath(args.root)
    sys.path.insert(0, root)
    os.chdir(root)

    from timely_spark.session import get_spark

    spark = get_spark("timely-ab-probe")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # identical warm-up to bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{args.sf_dir}/events.parquet").limit(1000).collect()

    from pyspark.sql import functions as F

    times: dict[str, float] = {}
    cal_best = None
    for _ in range(args.repeats):
        t0 = time.time()
        spark.range(0, 100_000_000, 1, 32).selectExpr(
            "id * 2654435761 % 1000003 AS k"
        ).groupBy((F.col("k") % 64).alias("b")).agg(
            F.sum("k").alias("s")
        ).collect()
        cal_best = min(cal_best or 1e9, time.time() - t0)
    times["host_calibration"] = round(cal_best, 3)

    for name in [e for e in args.entries.split(",") if e]:
        fn = qs[name]
        best = None
        for _ in range(args.repeats):
            t0 = time.time()
            fn(spark, args.sf_dir).collect()
            best = min(best or 1e9, time.time() - t0)
        times[name] = round(best, 3)
        print(f"  {name}: {times[name]}s", file=sys.stderr)

    if args.ingest:
        import bench

        ing_sec, _rows, store_path = bench.bench_ingest(spark, args.sf_dir)
        for _ in range(args.repeats - 1):
            s2, _r2, p2 = bench.bench_ingest(spark, args.sf_dir)
            if s2 < ing_sec:
                ing_sec, store_path, p2 = s2, p2, store_path
            shutil.rmtree(p2, ignore_errors=True)
        times["ingest_lineprotocol"] = round(ing_sec, 3)
        try:
            sq_best = None
            for _ in range(args.repeats):
                sq_sec, _dps = bench.bench_store_query(spark, store_path)
                sq_best = min(sq_best or 1e9, sq_sec)
            times["store_query_pruned"] = round(sq_best, 3)
        finally:
            shutil.rmtree(store_path, ignore_errors=True)

    print(json.dumps({"root": root, "sf_dir": args.sf_dir, "times": times}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
