"""Message-queue ingest leg: queue message bodies -> put lines -> points.

The reference fleet has TWO collectd write plugins. The direct one
(WriteTimelyPlugin) streams put lines over TCP — covered by the
line-protocol listener (``sources/lineprotocol.py`` + ``tcp_facade``).
The second (collectd/.../plugin/WriteNSQPlugin.java:56-64,110-120)
renders the SAME put lines with the SAME naming rules
(CollectDPluginParent.process), batches them into ONE opaque message
body per write callback, and POSTs it to a message queue's publish
endpoint (NSQ, topic ``metrics#ephemeral``,
WriteNSQPlugin.java:42,159). A fleet publishing through the queue needs
a consumer leg on the ingest side; the reference leaves that consumer
to the deployment, and so do we — what this module pins is the
CONTRACT: given the queue's messages, reconstruct exactly the points
the direct TCP path would have produced.

Spark-first shape: every Spark queue connector (Kafka, EventHubs,
Kinesis, Pulsar — and any NSQ->Kafka/spool bridge) delivers the same
DataFrame surface, a binary ``value`` column per message. So the
adapter is ONE stateless transformation over that surface:

    body(binary) -> decode utf-8 -> split '\\n' -> explode -> parse

It runs identically under ``spark.read`` (backfilling a message lake)
and ``spark.readStream`` (live consumption) because it contains no
state and no Python — pure Column expressions feeding
:func:`parse_lines_df`, so ingest throughput scales with executors
exactly like the TCP leg. Per-message line EXPLOSION keeps the shuffle
row count equal to the point count, not the message count, and
downstream partitioned writes see the same distribution as
line-protocol ingest.

For deployments without a connector (NSQ has no first-party Spark
source), :func:`queue_spool_stream` tails a file-spool directory where
a bridge dumps one file per message batch — the same file-source
pattern the subscription sink uses, checkpointable and exactly-once
into the durable store.

Relation to ``lineprotocol.put_kafka_stream``: that path assumes ONE
put line per Kafka record (the TCP-bridge layout). This adapter handles
the queue-native layout — one MULTI-LINE batch per message, which is
what WriteNSQPlugin actually publishes — and degrades to the one-line
case for free (splitting a single line yields itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timely_spark.sources.lineprotocol import parse_lines_df


def put_lines_from_messages(
    messages: DataFrame,
    body_col: str = "value",
    keep_corrupt: bool = False,
) -> "DataFrame | tuple[DataFrame, DataFrame]":
    """Queue messages (one binary/string body each) -> parsed points.

    ``messages`` is anything shaped like Spark's Kafka source output —
    a ``value`` column holding the message body (binary or string).
    Each body is a newline-joined batch of put lines exactly as
    WriteNSQPlugin's ``write(String, OutputStream)`` wrote them
    (DataOutputStream.writeBytes, WriteNSQPlugin.java:110-120). Blank
    lines (trailing newline, keep-alives) are dropped before parsing;
    malformed lines follow the line-protocol contract (dropped, or
    routed to the corrupt side output with ``keep_corrupt=True``, in
    which case a ``(good, bad)`` tuple returns — the
    :func:`parse_lines_df` contract this forwards).
    """
    body = F.col(body_col)
    if dict(messages.dtypes).get(body_col) == "binary":
        body = body.cast("string")  # queue bodies are UTF-8 put lines
    lines = (
        messages.select(
            F.explode(F.split(body, "\n")).alias("__line")
        )
        .filter(F.trim("__line") != "")
        .select(F.col("__line").alias("value"))
    )
    return parse_lines_df(lines, keep_corrupt=keep_corrupt)


def queue_spool_stream(
    spark,
    spool_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming message source over a file spool (one file = one queue
    message batch, the bridge layout for queues without a Spark
    connector). Returns a streaming DataFrame with the connector-shaped
    ``value: binary`` column so :func:`put_lines_from_messages`
    composes unchanged; the file source's checkpoint makes the leg
    resume-exactly-once like every other ingest path.
    """
    reader = spark.readStream.format("binaryFile").schema(
        "path string, modificationTime timestamp, length long, content binary"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(spool_dir)
    return files.select(F.col("content").alias("value"))
