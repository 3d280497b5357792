#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` in DuckDB at
sf0.01 (or $SPARK_GRAFT_SF_DIR), comparing row count, column names/types,
and exact values after sorting columns by name and rows by value — the
same shape as CORRECTNESS_r{N}.json. Also reports max float deviation so
rounding adequacy is visible.

Usage: python tools/check_oracle.py [--json PATH] [query ...]

With ``--json PATH`` the full per-query result set is also written in
the CORRECTNESS_r{N}.json shape (rows/schema/hash matches + row counts).
The committed ``CORRECTNESS_LOCAL.json`` is the full-registry sweep —
the driver checks only the first 50 entries, so this artifact is the
per-round evidence for the tail (refresh it every round:
``python tools/check_oracle.py --json CORRECTNESS_LOCAL.json``).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows: list[tuple], cols: list[str]):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                elif v == 0.0:
                    v = 0.0  # normalize -0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [c for c in sorted(cols)], out


def _row(spark_rows: int | None = None, err: str | None = None) -> dict:
    return {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "spark_rows": spark_rows,
        "oracle_rows": None,
        "err": err,
    }


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from timely_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    only = set(argv)
    report: dict[str, dict] = {}

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            report[name] = _row(err=f"spark: {e}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            if len(srows) == 0:
                print(f"  WARN {name}: 0 rows")
            report[name] = _row(spark_rows=len(srows), err="no_oracle")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = [tuple(r) for r in res.fetchall()]
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            report[name] = _row(spark_rows=len(srows), err=f"oracle: {e}")
            continue
        sc, sr = normalize(srows, scols)
        oc, orr = normalize(orows, ocols)
        ok = True
        if sc != oc:
            print(f"FAIL  {name}: columns differ spark={sc} oracle={oc}")
            ok = False
        elif len(sr) != len(orr):
            print(f"FAIL  {name}: rowcount spark={len(sr)} oracle={len(orr)}")
            ok = False
        else:
            maxdev = 0.0
            nbad = 0
            for a, b in zip(sr, orr):
                if a != b:
                    # measure float deviation for diagnostics
                    dev = None
                    if len(a) == len(b):
                        devs = []
                        exact_mismatch = False
                        for x, y in zip(a, b):
                            if isinstance(x, float) and isinstance(y, float):
                                devs.append(abs(x - y))
                            elif x != y:
                                exact_mismatch = True
                        if not exact_mismatch and devs:
                            dev = max(devs)
                    if dev is None:
                        nbad += 1
                        if nbad <= 3:
                            print(f"  diff {name}: spark={a} oracle={b}")
                    else:
                        maxdev = max(maxdev, dev)
                        if dev > 0:
                            nbad += 1
                            if nbad <= 3:
                                print(f"  floatdiff {name}: {a} vs {b} dev={dev}")
            if nbad:
                print(f"FAIL  {name}: {nbad} mismatched rows, maxfloatdev={maxdev}")
                ok = False
        if ok:
            print(f"OK    {name}: {len(sr)} rows [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)
        report[name] = {
            "rows_match": len(sr) == len(orr),
            "schema_match": sc == oc,
            "hash_match": ok,
            "spark_rows": len(sr),
            "oracle_rows": len(orr),
            "err": None,
        }

    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_path} ({len(report)} queries)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all queries match the oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
