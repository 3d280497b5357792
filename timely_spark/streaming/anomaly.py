"""Streaming anomaly screen — online per-metric z-score with running
moments carried across micro-batches.

The batch query (``events_anomaly``) computes global mean/std then flags
|z| > 3. A stream can't see the future, so the streaming screen is the
ONLINE variant: state = exact running moments (count, sum, sum-of-
squares) per metric; each micro-batch's points are scored against the
moments *including* that batch, then the state advances. After a full
backlog drain the final moments equal the batch moments exactly (sum
and sumsq are associative), which is what the parity test pins.

Scale notes: state is 3 numbers per metric, hash-partitioned by metric;
per-batch cost is one groupBy shuffle of the batch (not the backlog).
Float caveat: running sums accumulate in arrival order — the emitted
running mean/std agree with batch decimal-exact moments to float
precision, so the parity test compares with a 1e-9 relative tolerance
rather than hashing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

ANOMALY_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType(), False),
        T.StructField("n_seen", T.LongType(), False),
        T.StructField("mean", T.DoubleType(), True),
        T.StructField("std", T.DoubleType(), True),
        T.StructField("n_outliers_batch", T.LongType(), False),
        T.StructField("max_abs_z_batch", T.DoubleType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("sq", T.DoubleType()),
    ]
)


def streaming_zscore(points: DataFrame, threshold: float = 3.0) -> DataFrame:
    """(metric, value) stream -> one summary row per (metric,
    micro-batch): running count/mean/std plus the batch's outlier count
    and max |z| scored against the updated moments."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        (metric,) = key
        n, s, sq = state.get if state.exists else (0, 0.0, 0.0)
        vals = []
        for pdf in pdfs:
            vals.extend(float(v) for v in pdf["value"] if v is not None)
        if not vals:
            return
        for v in vals:
            n += 1
            s += v
            sq += v * v
        state.update((n, s, sq))
        mean = s / n
        var = (sq - s * s / n) / (n - 1) if n > 1 else None
        std = math.sqrt(var) if var is not None and var > 0 else None
        if std:
            zs = [abs((v - mean) / std) for v in vals]
            n_out = sum(1 for z in zs if z > threshold)
            max_z = max(zs)
        else:
            n_out, max_z = 0, None
        yield pd.DataFrame(
            [(metric, n, mean, std, n_out, max_z)],
            columns=[
                "metric",
                "n_seen",
                "mean",
                "std",
                "n_outliers_batch",
                "max_abs_z_batch",
            ],
        )

    return points.groupBy("metric").applyInPandasWithState(
        update,
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
