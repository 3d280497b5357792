"""Message-queue ingest leg (VERDICT r7 missing #1): the WriteNSQPlugin
consumer-side contract — queue message bodies carrying batched put
lines reconstruct exactly the points the direct TCP plugin path yields.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from timely_spark.sources.lineprotocol import parse_lines_df
from timely_spark.sources.queue import (
    put_lines_from_messages,
    queue_spool_stream,
)

B = 1_447_767_913  # seconds — the parser normalizes to ms


def _key(r):
    return (r["metric"], r["ts"], r["value"], tuple(sorted(r["tags"].items())))


def test_queue_messages_match_direct_line_ingest(spark):
    """Parity with the direct leg: the SAME put lines, batched into
    multi-line message bodies (binary, trailing newline — the
    WriteNSQPlugin write() layout), parse to the identical point set
    parse_lines_df produces line-by-line."""
    lines = [
        f"put sys.cpu.user {B} 1.0 host=h1 rack=r1",
        f"put sys.cpu.user {B + 1} 2.5 host=h2 rack=r1",
        f"put statsd.nsq.topic.depth {B + 2} 17.0 host=h3 instance=metrics",
        f"put mem.free {B + 3} 4096.0 host=h1",
    ]
    # plugin batches: one body per write callback, several lines each
    bodies = [
        ("\n".join(lines[:2]) + "\n").encode(),
        ("\n".join(lines[2:]) + "\n").encode(),
    ]
    msgs = spark.createDataFrame([(b,) for b in bodies], "value binary")
    got = sorted(_key(r) for r in put_lines_from_messages(msgs).collect())

    direct = parse_lines_df(
        spark.createDataFrame([(l,) for l in lines], "value string")
    )
    want = sorted(_key(r) for r in direct.collect())
    assert got == want and len(got) == 4


def test_queue_body_string_and_corrupt_routing(spark):
    """String bodies work like binary ones; a malformed line inside a
    batch follows the line-protocol contract (dropped silently, or
    surfaced on the corrupt side output with keep_corrupt)."""
    body = f"put ok.m {B} 1.0 h=x\nthis is not a put line\n\n"
    msgs = spark.createDataFrame([(body,)], "value string")
    pts = put_lines_from_messages(msgs).collect()
    assert len(pts) == 1 and pts[0]["metric"] == "ok.m"

    good_df, bad_df = put_lines_from_messages(msgs, keep_corrupt=True)
    assert good_df.count() == 1
    assert [r["line"] for r in bad_df.collect()] == [
        "this is not a put line"
    ]


def test_queue_spool_stream_end_to_end(spark, tmp_path):
    """The no-connector transport: a bridge spools one file per queue
    message; the streaming leg drains it through the SAME adapter into
    the durable store, and an engine query over the store sees every
    point — checkpointed, so a second drain ingests nothing twice."""
    from timely_spark.api import TimelyEngine
    from timely_spark.sources.store import write_points

    spool = tmp_path / "spool"
    spool.mkdir()
    ck = str(tmp_path / "ck")
    store = str(tmp_path / "store")

    n_msgs, per_msg = 4, 5
    for m in range(n_msgs):
        body = "".join(
            f"put q.m {B + m * per_msg + j} {float(m * per_msg + j)} host=h{m}\n"
            for j in range(per_msg)
        )
        (spool / f"msg{m}.bin").write_bytes(body.encode())

    def drain():
        pts = put_lines_from_messages(queue_spool_stream(spark, str(spool)))

        def sink(batch_df, _bid):
            write_points(batch_df, store, mode="append")

        q = (
            pts.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    eng = TimelyEngine(spark, store_path=store)
    out = eng.query(
        {
            "start": B * 1000,
            "end": (B + 100) * 1000,
            "msResolution": True,
            "queries": [
                {"aggregator": "none", "metric": "q.m", "tags": {}}
            ],
        }
    )
    dps = {k: v for s in out for k, v in s["dps"].items()}
    assert len(dps) == n_msgs * per_msg
    assert dps[str((B + 7) * 1000)] == 7.0

    # exactly-once: re-draining the same spool adds nothing
    drain()
    assert (
        eng.points().filter(F.col("metric") == "q.m").count()
        == n_msgs * per_msg
    )


def test_queue_body_packing_property(spark):
    """Hypothesis: for ANY set of valid put lines and ANY packing of
    them into message bodies (random batch boundaries, with and
    without trailing newlines), the queue adapter yields exactly the
    point set parse_lines_df produces line-by-line — body framing can
    never add, drop, or alter a point."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    metric = st.from_regex(r"[a-zA-Z][a-zA-Z0-9_.]{0,12}", fullmatch=True)
    tagk = st.from_regex(r"[a-zA-Z][a-zA-Z0-9_]{0,6}", fullmatch=True)
    tagv = st.from_regex(r"[a-zA-Z0-9_.:-]{1,8}", fullmatch=True)
    point = st.tuples(
        metric,
        st.integers(min_value=1_400_000_000_000, max_value=1_999_999_999_999),
        st.floats(
            allow_nan=False, allow_infinity=False, width=64,
            min_value=-1e12, max_value=1e12,
        ),
        st.dictionaries(tagk, tagv, min_size=1, max_size=3),
    )

    @given(
        pts=st.lists(point, min_size=1, max_size=12),
        cuts=st.lists(st.integers(0, 11), max_size=4),
        trailing=st.booleans(),
    )
    @settings(
        max_examples=10, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(pts, cuts, trailing):
        lines = [
            f"put {m} {ts} {v!r} "
            + " ".join(f"{k}={tv}" for k, tv in sorted(tags.items()))
            for m, ts, v, tags in pts
        ]
        bounds = sorted({c for c in cuts if c < len(lines)} | {0, len(lines)})
        bodies = [
            "\n".join(lines[a:b]) + ("\n" if trailing else "")
            for a, b in zip(bounds, bounds[1:])
            if lines[a:b]
        ]
        msgs = spark.createDataFrame([(b.encode(),) for b in bodies],
                                     "value binary")
        got = sorted(_key(r) for r in put_lines_from_messages(msgs).collect())
        direct = parse_lines_df(
            spark.createDataFrame([(l,) for l in lines], "value string")
        )
        assert got == sorted(_key(r) for r in direct.collect())

    run()
