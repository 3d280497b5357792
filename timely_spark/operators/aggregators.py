"""The aggregator registry — Timely's six aggregators as Column expressions.

Reference: server/.../sample/Aggregator.java:9-59 and
server/.../sample/aggregators/{Avg,Sum,Min,Max,Count,Dev}.java; the
advertised set is ["avg","dev","max","min","sum","count","none"]
(AggregatorsResponse.java:53-62).

All are built-in Catalyst expressions — partial/final merge, spill and
codegen come for free, replacing the reference's hand-written
``Aggregation.merge`` partial-combine (Aggregation.java:85-96).

``dev`` quirk (Dev.java:8-19): Timely returns ``sqrt(Σx² / (n-1))`` with
NO mean subtraction — an RMS-like quantity, deliberately NOT
``stddev_samp``. We reproduce it exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dev(c: Column) -> Column:
    # Dev.java:8-19 — sqrt(sum(x^2) / (count-1)); count==1 -> division by
    # zero in Java yields Infinity; we emit NULL instead and document it.
    n = F.count(c)
    return F.when(n > 1, F.sqrt(F.sum(c * c) / (n - F.lit(1)))).otherwise(F.lit(None))


AGGREGATORS: dict[str, Callable[[Column], Column]] = {
    "avg": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "dev": _dev,
}

ADVERTISED = ["avg", "dev", "max", "min", "sum", "count", "none"]  # AggregatorsResponse.java:53-62


def agg_expr(name: str, col: Column | str = "value") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    try:
        fn = AGGREGATORS[name.lower()]
    except KeyError:
        raise ValueError(f"unknown aggregator {name!r}; known: {ADVERTISED}") from None
    return fn(c)


# DuckDB-SQL renderings of the same aggregators, for oracle generation.
ORACLE_AGG_SQL: dict[str, str] = {
    "avg": "avg({c})",
    "sum": "sum({c})",
    "min": "min({c})",
    "max": "max({c})",
    "count": "count({c})",
    "dev": "CASE WHEN count({c}) > 1 THEN sqrt(sum({c}*{c})/(count({c})-1)) END",
}
