"""Temporal joins Spark lacks as built-ins: as-of join and range join.

The brief's canonical "custom operator" examples — both expressed as
compositions of existing DataFrame ops (option (a) of the custom-
operator ladder), no Python in the hot path.

- **As-of join**: each left row matches the most recent right row with
  ``right.ts <= left.ts`` per key (kdb's ``aj``, pandas
  ``merge_asof``, DuckDB ``ASOF JOIN``). Spark-first shape: UNION the
  two sides with a source tag, one window per key ordered by
  (ts, source) carrying ``last(right payload, ignorenulls=True)`` —
  ONE shuffle on the key, one sort, no self-join, no per-left-row
  probe. The window partitions by the join key: a pathologically hot
  key funnels to one task (same hazard class as any keyed window);
  for hot-key workloads pre-split the key range or bucket by
  (key, ts DIV coarse) and stitch — documented, not silently absorbed.
- **Range join**: events matched to intervals containing them
  (``start <= ts < end``). A naive inequality join is a nested-loop;
  the scale shape BUCKETIZES: intervals explode to the fixed-width
  time buckets they overlap, events compute their bucket with pure
  arithmetic, an EQUI-join on (key, bucket) prunes candidates, and
  the exact containment predicate filters the remainder. Work scales
  with true overlap density, not |events| x |intervals|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_ms: int | None = None,
) -> DataFrame:
    """Backward as-of join: left columns + right's non-key/ts columns
    (null when no right row at-or-before exists, or none within
    ``tolerance_ms``).

    Ties (``right.ts == left.ts``) MATCH, mirroring DuckDB ASOF JOIN's
    ``>=`` semantics. With several right rows sharing (key, ts) the
    last in (ts, input-order) wins — dedupe the right side first if
    that matters (the driver query does).
    """
    rcols = [c for c in right.columns if c not in (key, right_ts)]
    out_name = f"asof_{right_ts}"
    clash = (set(rcols) & set(left.columns)) | (
        {out_name} & (set(rcols) | set(left.columns))
    )
    if clash:
        raise ValueError(
            f"asof_join: output column names collide: {sorted(clash)} — "
            f"rename before joining"
        )
    # NULL right timestamps match NOTHING (DuckDB ASOF >= semantics);
    # unfiltered they sort first and become everyone's fallback match
    right = right.filter(F.col(right_ts).isNotNull())
    l_tag = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__src"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None)
        .cast(
            right.select(
                F.struct(
                    F.col(right_ts).alias("__rts"), *[F.col(c) for c in rcols]
                ).alias("s")
            ).schema["s"].dataType
        )
        .alias("__r"),
    )
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__src"),  # sorts BEFORE left at equal ts => >= match
        F.lit(None).cast(l_tag.schema["__l"].dataType).alias("__l"),
        F.struct(
            F.col(right_ts).alias("__rts"), *[F.col(c) for c in rcols]
        ).alias("__r"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__src")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        l_tag.unionByName(r_tag)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__src") == 1)
    )
    if tolerance_ms is not None:
        matched = matched.withColumn(
            "__m",
            F.when(
                F.col("__m.__rts") >= F.col("__ts") - F.lit(tolerance_ms),
                F.col("__m"),
            ),
        )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("__m.__rts").alias(out_name))
    out_cols += [F.col(f"__m.{c}").alias(c) for c in rcols]
    return matched.select(*out_cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    key: str | None = None,
    bucket_ms: int = 3_600_000,
) -> DataFrame:
    """Inner join of points to the intervals containing them
    (``start <= ts < end``), optionally also equi-keyed on ``key``.

    Bucketized: an interval spanning b buckets emits b rows (ints
    only), a point computes its single bucket arithmetically, and the
    equi-join on (key?, bucket) replaces the nested-loop inequality
    join. Pick ``bucket_ms`` near the typical interval length: shorter
    means more interval replication, longer means more post-filter
    discard.
    """
    iv = intervals.filter(F.col(start_col) < F.col(end_col)).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} DIV {bucket_ms}"),
                # end is exclusive: an interval ending exactly on a
                # bucket boundary does not reach into that bucket
                F.expr(f"({end_col} - 1) DIV {bucket_ms}"),
            )
        ),
    )
    pt = points.withColumn("__bucket", F.expr(f"{ts_col} DIV {bucket_ms}"))
    on = ["__bucket"] if key is None else [key, "__bucket"]
    return (
        pt.join(iv, on)
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop("__bucket")
    )
