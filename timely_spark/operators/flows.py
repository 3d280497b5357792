"""Event-flow analysis: per-user transition counts between event types.

The product-analytics path/Sankey primitive that complements the
sessionize/funnel/retention family: for each consecutive pair of events
a user emits (event-time order, deterministic event-id tiebreak), count
the (from_type, to_type) transition and derive the outgoing
probability per from_type.

Reference analogue: none (the reference is a time-series store); part
of the events-analytics extension family.

Scale shape: ONE shuffle on user_id for the lag window (the same
per-user partitioning sessionization pays — a hot user serializes only
their own partition), then a map-side-combinable groupBy over the tiny
(|types|^2)-key transition space; the probability join broadcasts the
per-from_type totals (at most |types| rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """(from_type, to_type, n, p) — transition counts over consecutive
    same-user events and the outgoing probability per from_type
    (p = n / sum of n over that from_type), rounded to 6.
    """
    order = [F.col(ts_col)]
    if tiebreak_col and tiebreak_col in events.columns:
        order.append(F.col(tiebreak_col))
    else:
        # no id column: fall back to the type name so same-timestamp
        # events still order deterministically (identical (ts, type)
        # rows are interchangeable — any order gives the same counts)
        order.append(F.col(type_col))
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        events.withColumn("__next", F.lead(type_col).over(w))
        .filter(F.col("__next").isNotNull())
        .groupBy(
            F.col(type_col).alias("from_type"),
            F.col("__next").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = F.broadcast(
        pairs.groupBy("from_type").agg(F.sum("n").alias("__tot"))
    )
    return (
        pairs.join(totals, "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n") / F.col("__tot"), 6).alias("p"),
        )
    )
