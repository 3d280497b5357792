"""Driver-side sidecar I/O through the Hadoop FileSystem API.

r12 optimization (guide §5: the driver should do almost no data work —
and symmetrically, Spark should do no DRIVER-SIZED work): every
persistent-index model sidecar and cache-archive metadata record is ONE
row of parameters, yet writing it as a one-row parquet table costs a
full Spark job (plan + schedule + commit protocol) and reading it back
costs another. Measured on the shared host: 1.5-7 s per one-row write
depending on load — pure fixed overhead multiplied across every
index save/load AND every streaming micro-batch (the history-dedup loop
re-read its model sidecar per batch).

Writing the sidecar as a JSON FILE via the Hadoop FileSystem API keeps
the exact property the Spark writer was chosen for — the bytes land on
whatever filesystem owns the path (file://, hdfs://, s3a://) with that
FS's semantics — while costing zero Spark jobs on either side.
``json.dumps`` emits shortest-round-trip reprs, so doubles (codebooks,
centroids, thresholds) survive byte-exactly.

Readers fall back to the pre-r12 one-row-parquet layout so an index
saved by older code still loads; writers drop a stale parquet sidecar
dir at the same path so the two layouts can never disagree.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p


def sidecar_write_json(spark: SparkSession, path: str, obj: dict) -> None:
    """Write ``obj`` as JSON at ``path`` (overwrite), via the Hadoop FS
    that owns the path. Zero Spark jobs."""
    fs, p = _fs_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps(obj).encode("utf-8")))
    finally:
        out.close()


def sidecar_read_json(spark: SparkSession, path: str) -> dict | None:
    """Read a JSON sidecar written by :func:`sidecar_write_json`;
    ``None`` when the file does not exist. Zero Spark jobs."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        data = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return json.loads(data)


def sidecar_delete(spark: SparkSession, path: str) -> None:
    """Recursively delete a stale sidecar path (used by writers to
    retire the pre-r12 one-row-parquet layout on overwrite)."""
    fs, p = _fs_path(spark, path)
    fs.delete(p, True)
