"""Line-protocol ingest: ``put <metric> <ts> <value> <k=v>...`` -> points.

Reference wire format: common/.../model/parse/MetricParser.java:17-30 (the
same lines arrive over TCP/UDP/WS, SURVEY.md §2.1 S1-S4). The parse is a
pure Column expression pipeline — no Python in the per-row path, so ingest
scales with executors and stays inside whole-stage codegen. Malformed
lines are dropped (the reference's fire-and-forget contract) or routed to
a side output with ``keep_corrupt=True``.

Works identically for ``spark.read.text`` (batch backfill) and
``spark.readStream`` (live ingest): the transformation is the same
DataFrame expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# first unescaped '=' splits key from value; escaped \= and \, are unescaped after
_KV_KEY_RE = r"^((?:[^=\\]|\\.)*?)=(.*)$"


def parse_lines_df(lines: DataFrame, value_col: str = "value", keep_corrupt: bool = False):
    """lines(value: string) -> points(metric, ts, value, tags, viz).

    Timestamps are normalized seconds->ms when < 10^12 (Value.java:40-46);
    the reserved ``viz`` tag is lifted out of the tag map
    (MetricAdapter.java:44,152-167).
    """
    # r12 (guide §4/§1.2: per-row work): the parse is built in TWO
    # projection stages so the token array and the parsed tag map are
    # each evaluated ONCE per row — the single-select form re-derived
    # the full regex-unescape entry chain for every consumer (tags map,
    # viz lift, AND a separate exists() validity pass: ~3 evaluations
    # per row; Catalyst's CollapseProject keeps the split because the
    # shared expressions are non-cheap). Each tag token also takes a
    # REGEX-FREE fast path when it contains no backslash (the
    # overwhelming case on real feeds): for an escape-free token the
    # lazy key regex is exactly "split at the first '='" and the
    # unescape is the identity, so first-'=' substring ops replace four
    # regex evaluations — the escaped path keeps the original
    # expressions verbatim, and the golden parse tests pin equality.
    arr = F.split(F.col(value_col), " ")

    def kv(t):
        esc = t.contains("\\")
        key_re = F.regexp_replace(
            F.regexp_extract(t, _KV_KEY_RE, 1), r"\\(.)", "$1"
        )
        val_re = F.regexp_replace(
            F.regexp_extract(t, _KV_KEY_RE, 2), r"\\(.)", "$1"
        )
        has_eq = t.contains("=")
        key_fast = F.when(has_eq, F.substring_index(t, "=", 1)).otherwise("")
        val_fast = F.when(
            has_eq, t.substr(F.instr(t, "=") + F.lit(1), F.length(t))
        ).otherwise("")
        return F.struct(
            F.when(esc, key_re).otherwise(key_fast).alias("key"),
            F.when(esc, val_re).otherwise(val_fast).alias("value"),
        )

    entries = F.transform(
        F.filter(
            F.slice(arr, 5, F.greatest(F.size(arr) - 4, F.lit(0))),
            lambda t: t != "",
        ),
        kv,
    )
    stage1 = lines.select(
        F.col(value_col).alias("__raw"),
        arr.alias("__arr"),
        F.map_from_entries(entries).alias("__all_tags"),
    )
    raw_ts = F.element_at(F.col("__arr"), 3).cast("long")
    ts = F.when(raw_ts < 1_000_000_000_000, raw_ts * 1000).otherwise(raw_ts)
    val = F.element_at(F.col("__arr"), 4).cast("double")
    parsed = stage1.select(
        F.element_at(F.col("__arr"), 2).alias("metric"),
        ts.alias("ts"),
        val.alias("value"),
        F.map_filter(F.col("__all_tags"), lambda k, _v: k != "viz").alias(
            "tags"
        ),
        F.element_at(F.col("__all_tags"), F.lit("viz")).alias("viz"),
        (
            (F.element_at(F.col("__arr"), 1) == "put")
            & (F.size(F.col("__arr")) >= 4)
            & raw_ts.isNotNull()
            & val.isNotNull()
            # a malformed token (no unescaped '=', or an empty key)
            # parses to key '' — exactly what the old per-token
            # regex-exists pass detected, now read off the already-
            # built map instead of re-running the regex chain
            & ~F.map_contains_key(F.col("__all_tags"), "")
        ).alias("__ok"),
        F.col("__raw"),
    )
    good = parsed.filter("__ok").drop("__ok", "__raw")
    if keep_corrupt:
        bad = parsed.filter(~F.col("__ok")).select(F.col("__raw").alias("line"))
        return good, bad
    return good


def read_put_file(spark, path: str) -> DataFrame:
    """Batch-ingest a file of put lines."""
    return parse_lines_df(spark.read.text(path))


def put_kafka_stream(
    spark, bootstrap_servers: str, topic: str, starting_offsets: str = "latest"
) -> DataFrame:
    """Production ingest path: Kafka topic of ``put`` lines -> points.

    Requires the spark-sql-kafka connector on the classpath (not bundled
    in this container — the call raises Spark's missing-data-source error
    until the package is added via ``--packages``). The transformation is
    the same all-JVM parse expression as every other ingest path.
    """
    lines = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .selectExpr("CAST(value AS STRING) AS value")
    )
    return parse_lines_df(lines)


def put_socket_stream(spark, host: str = "localhost", port: int = 4242) -> DataFrame:
    """Live TCP ``put`` ingest (S1, TcpPutHandler.java:1-43): socket source
    -> the same parse pipeline. Port 4242 is the reference's conventional
    tcp-port (server/conf/timely-loadtest.yml:5). The socket source is a
    demo/dev path — production streams arrive via files or Kafka, where the
    identical ``parse_lines_df`` expression applies."""
    lines = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return parse_lines_df(lines)
