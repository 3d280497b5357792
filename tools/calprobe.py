#!/usr/bin/env python3
"""One-shot host-window probe: run bench.py's fixed calibration
synthetic N times in a tiny session and print the best/all readings.
Used to pick a clean window before committing to a 20-minute full
bench on the oscillating shared host (r12)."""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("calprobe")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    vals = []
    for _ in range(n):
        t0 = time.time()
        spark.range(0, 100_000_000, 1, 32).selectExpr(
            "id * 2654435761 % 1000003 AS k"
        ).groupBy((F.col("k") % 64).alias("b")).agg(
            F.sum("k").alias("s")
        ).collect()
        vals.append(round(time.time() - t0, 3))
    print(json.dumps({"cal": min(vals), "all": vals}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
