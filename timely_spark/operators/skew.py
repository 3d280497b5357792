"""Skew relief: salted aggregation for hot keys.

AQE's skew-join splitting covers joins, but a groupBy with one massive
key still funnels that key's rows into a single reduce task. The classic
relief is two-phase salted aggregation: append a salt to the key, partial-
aggregate on (key, salt) — spreading the hot key over ``n_salts`` tasks —
then merge the partials per key. Only aggregates with a merge identity
(sum/count/min/max, and avg via sum+count) are eligible.

Spark's built-in partial/final hash aggregation already does exactly this
for a single shuffle — BUT the partial side combines within an *input*
partition only; when one key dominates the input everywhere, the post-
shuffle reduce task still receives all its partials. Salting inserts an
extra pre-shuffle spreading stage, bounding any reduce task at
|hot key| / n_salts. Use when a key exceeds ~1 task's worth of data
(e.g. one metric at 10% of a 100 TB day).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# merge rule per aggregator: how partials fold into the final value
_MERGEABLE = {
    "sum": F.sum,
    "count": F.sum,  # counts add
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    value_col: str = "value",
    agg: str = "sum",
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) -> groupBy(keys).

    ``agg``: sum | count | min | max | avg. Output column: ``<agg>_value``.
    """
    out_name = f"{agg}_value"
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    salted = df.withColumn("__salt", salt)

    if agg == "avg":
        partial = salted.groupBy(*keys, "__salt").agg(
            F.sum(value_col).alias("__s"), F.count(value_col).alias("__c")
        )
        return partial.groupBy(*keys).agg(
            (F.sum("__s") / F.sum("__c")).alias(out_name)
        )

    if agg not in _MERGEABLE:
        raise ValueError(f"aggregator {agg!r} has no salted merge rule")
    first = F.count(value_col) if agg == "count" else getattr(F, agg)(value_col)
    partial = salted.groupBy(*keys, "__salt").agg(first.alias("__p"))
    return partial.groupBy(*keys).agg(_MERGEABLE[agg](F.col("__p")).alias(out_name))
