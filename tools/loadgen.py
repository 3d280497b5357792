#!/usr/bin/env python3
"""Load generator mirroring the reference's TestIngestRunner
(server/.../application/testingest/TestIngestRunner.java +
LoadTestProperties.java:11-16 defaults: 8 write threads, 1 s sample
period, 60 min backlog).

Generates deterministic line-protocol put lines from a metric template
and drives them through the engine's batch ingest, reporting points/s.

Usage: python tools/loadgen.py [--minutes 60] [--series 200] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

METRIC_TEMPLATES = [
    ("sys.cpu.user", "uniform"),
    ("sys.cpu.idle", "uniform"),
    ("sys.eth0.rx", "ramp"),
    ("sys.eth0.tx", "ramp"),
    ("app.req.count", "counter"),
    ("app.req.latency", "lognormal"),
]


def generate_lines(minutes: int, series_per_metric: int, base_ms: int):
    import math
    import random

    rnd = random.Random(42)
    hosts = [f"h{i:03d}" for i in range(series_per_metric)]
    for metric, shape in METRIC_TEMPLATES:
        for h in hosts:
            counter = 0.0
            for s in range(minutes * 60):
                ts = base_ms + s * 1000
                if shape == "uniform":
                    v = rnd.uniform(0, 100)
                elif shape == "ramp":
                    v = float(s)
                elif shape == "counter":
                    counter = (counter + rnd.uniform(0, 10)) % 65535
                    v = counter
                else:
                    v = math.exp(rnd.gauss(3, 1))
                yield f"put {metric} {ts} {v:.4f} host={h} rack=r{int(h[1:]) % 2 + 1}"


def run_queries(spark, store_path: str, base_ms: int, minutes: int, n_queries: int) -> None:
    """Query-load leg mirroring TestQueryRunner
    (server/.../application/testquery/TestQueryRunner.java): random
    downsample/agg/rate queries over a random slice of the backlog,
    through the full OpenTSDB request path."""
    import random

    from timely_spark.api import TimelyEngine

    rnd = random.Random(7)
    eng = TimelyEngine(spark, store_path=store_path)
    aggs = ["avg", "sum", "min", "max", "count", "dev"]
    downs = ["1m-avg", "5m-max", "1m-sum", "10m-avg"]
    t0 = time.time()
    rows = 0
    for i in range(n_queries):
        metric = METRIC_TEMPLATES[rnd.randrange(len(METRIC_TEMPLATES))][0]
        start = base_ms + rnd.randrange(max(minutes * 60_000 // 2, 1))
        q = {
            "start": start,
            "end": start + 60 * 60_000,
            "msResolution": True,
            "queries": [
                {
                    "aggregator": rnd.choice(aggs),
                    "metric": metric,
                    "downsample": rnd.choice(downs),
                    "rate": rnd.random() < 0.25,
                    "tags": {"host": "h000"} if rnd.random() < 0.5 else {},
                }
            ],
        }
        out = eng.query(q)
        rows += sum(len(s["dps"]) for s in out)
    dt = time.time() - t0
    print(
        f"ran {n_queries} queries in {dt:.2f}s = {n_queries/dt:.1f} q/s "
        f"({rows} dps total)"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=int, default=10)
    ap.add_argument("--series", type=int, default=20)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--queries", type=int, default=0,
        help="after ingest, run N random queries against the store (TestQueryRunner leg)",
    )
    args = ap.parse_args()

    from timely_spark.session import get_spark
    from timely_spark.sources.lineprotocol import parse_lines_df
    from timely_spark.sources.store import write_points

    spark = get_spark("timely-loadgen")
    base_ms = 1_700_000_000_000
    lines = list(generate_lines(args.minutes, args.series, base_ms))
    out = args.out or tempfile.mkdtemp(prefix="timely_loadgen_")
    print(f"{len(lines)} lines -> {out}")

    t0 = time.time()
    df = spark.createDataFrame([(l,) for l in lines], ["value"])
    pts = parse_lines_df(df)
    write_points(pts, out, mode="overwrite")
    dt = time.time() - t0
    print(f"ingested {len(lines)} points in {dt:.2f}s = {len(lines)/dt:.0f} pts/s")
    if args.queries:
        run_queries(spark, out, base_ms, args.minutes, args.queries)
    if args.out is None:
        shutil.rmtree(out, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
