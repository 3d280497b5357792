"""Streaming tests: summarization goldens and streaming ingest
(availableNow micro-batch so tests stay fast and deterministic)."""

import pytest
from pyspark.sql import functions as F

from timely_spark.streaming.summarize import summarize_batch


def test_summarize_batch_golden(spark):
    """MetricHistogram.java:64-167 semantics: count/min/max/sum/avg + percentiles."""
    b = 1_447_767_913_000 - (1_447_767_913_000 % 60_000)  # window-aligned base
    rows = [("m", b + i * 1000, float(i), {}, None) for i in range(1, 60)]
    df = spark.createDataFrame(
        rows, "metric string, ts long, value double, tags map<string,string>, viz string"
    )
    out = summarize_batch(df, window_ms=60_000, exact=True).collect()
    assert len(out) == 1
    r = out[0]
    assert r["metric"] == "m_summarized"
    assert (r["n"], r["min_value"], r["max_value"], r["sum_value"]) == (59, 1.0, 59.0, sum(range(1, 60)))
    assert r["avg_value"] == pytest.approx(30.0)
    assert r["p50"] == pytest.approx(30.0)
    # nearest-rank, the reference's own rule (getPercentile:85-92):
    # index max(round(0.99 * 59), 1) = 58 -> value 58.0 (NOT the linear
    # interpolation 58.42 the r1-r6 implementation emitted)
    assert r["p99"] == pytest.approx(58.0)


def test_summarize_percentiles_match_metric_histogram_test(spark):
    """MetricHistogramTest.java:20-72 ported: 100 values 1..100 in one
    window -> min 1, max 100, avg 50.5, count 100, p50 50, p75 75,
    p90 90, p99 99 — the reference's nearest-rank indexing exactly."""
    b = 1_447_767_913_000 - (1_447_767_913_000 % 60_000)
    rows = [("m", b + i * 100, float(i), {}, None) for i in range(1, 101)]
    df = spark.createDataFrame(
        rows, "metric string, ts long, value double, tags map<string,string>, viz string"
    )
    r = summarize_batch(df, window_ms=60_000, exact=True).collect()[0]
    assert (r["n"], r["min_value"], r["max_value"]) == (100, 1.0, 100.0)
    assert r["avg_value"] == pytest.approx(50.5)
    assert (r["p50"], r["p75"], r["p90"], r["p99"]) == (50.0, 75.0, 90.0, 99.0)


def test_streaming_ingest_availablenow(spark, tmp_path):
    """Line-protocol stream -> partitioned store + meta upsert (S1+S6)."""
    from timely_spark.operators.meta import build_meta
    from timely_spark.sources.lineprotocol import parse_lines_df
    from timely_spark.sources.store import write_points

    src = tmp_path / "lines"
    src.mkdir()
    b = 1_447_767_913_000
    (src / "batch1.txt").write_text(
        "\n".join(f"put m {b + i * 1000} {float(i)} host=h1" for i in range(10)) + "\n"
    )
    store_path = str(tmp_path / "store")
    meta_path = str(tmp_path / "meta")

    lines = spark.readStream.text(str(src))
    pts = parse_lines_df(lines)

    def sink(batch_df, batch_id):
        write_points(batch_df, store_path)
        build_meta(batch_df).write.mode("append").parquet(meta_path)

    q = (
        pts.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stored = spark.read.parquet(store_path)
    assert stored.count() == 10
    meta = spark.read.parquet(meta_path)
    assert {(r["metric"], r["tag_key"], r["tag_value"]) for r in meta.collect()} == {
        ("m", "host", "h1")
    }


def test_subscription_backfill_then_tail(spark, tmp_path):
    """X1-X3 subscription lifecycle: create/add replays the existing store
    (backfill), a later write is picked up by the same stream (tail),
    remove/close stop the queries (MetricScanner.java:106-268)."""
    import time

    from timely_spark.sources.lineprotocol import parse_lines_df
    from timely_spark.sources.store import write_points
    from timely_spark.streaming.subscription import SubscriptionManager

    b = 1_447_767_913_000
    store = str(tmp_path / "store")

    def put(lines):
        df = spark.createDataFrame([(l,) for l in lines], ["value"])
        write_points(parse_lines_df(df), store)

    put([f"put m {b + i * 1000} {float(i)} host=h1" for i in range(5)]
        + [f"put m {b} 7.7 host=h9"]  # excluded by the tag filter below
        + [f"put other {b} 9.9 host=h1"])

    mgr = SubscriptionManager(spark, store, flush_seconds=1, sink="buffer")
    mgr.create("s1")
    q = mgr.add("s1", "m", tags={"host": "h1"})
    try:
        deadline = time.time() + 60
        while time.time() < deadline and len(mgr.buffers.get(("s1", "m"), [])) < 5:
            time.sleep(0.5)
        got = mgr.buffers[("s1", "m")]
        assert len(got) == 5  # backfill complete, 'other' filtered out
        assert {r["value"] for r in got} == {float(i) for i in range(5)}

        put([f"put m {b + 10_000} 42.0 host=h1"])  # tail-follow pickup
        deadline = time.time() + 60
        while time.time() < deadline and len(mgr.buffers[("s1", "m")]) < 6:
            time.sleep(0.5)
        assert len(mgr.buffers[("s1", "m")]) == 6
        assert any(r["value"] == 42.0 for r in mgr.buffers[("s1", "m")])
        assert q.isActive
    finally:
        mgr.close("s1")
    assert not q.isActive


def test_internal_metrics_listener(spark, tmp_path):
    """X6: streaming progress events become queryable timely.* points."""
    from timely_spark.streaming.internal_metrics import InternalMetricsListener

    listener = InternalMetricsListener()
    spark.streams.addListener(listener)
    try:
        src = tmp_path / "in"
        src.mkdir()
        (src / "a.txt").write_text("x\ny\n")
        q = (
            spark.readStream.text(str(src))
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        import time

        deadline = time.time() + 30  # listener events are delivered async
        while time.time() < deadline:
            pts = listener.drain(spark).collect()
            if any(r["metric"] == "timely.stream.inputRows" for r in pts):
                break
            time.sleep(0.5)
        else:
            raise AssertionError("no inputRows metric arrived")
        assert all(r["metric"].startswith("timely.") for r in pts)
    finally:
        spark.streams.removeListener(listener)


def test_summarization_streaming_query(spark, tmp_path):
    """A11 streaming summarization over a bounded stream (availableNow-like:
    run one trigger of the real writeStream query)."""
    from timely_spark.sources.lineprotocol import parse_lines_df
    from timely_spark.streaming.summarize import summarization_query

    src = tmp_path / "pts"
    src.mkdir()
    b = 1_447_767_913_000 - (1_447_767_913_000 % 60_000)
    (src / "batch1.txt").write_text(
        "\n".join(f"put m {b + i * 1000} {float(i)} host=h1" for i in range(1, 61)) + "\n"
    )
    lines = spark.readStream.text(str(src))
    pts = parse_lines_df(lines)
    q = summarization_query(
        pts,
        window_seconds=60,
        checkpoint=str(tmp_path / "ck"),
        out_path=str(tmp_path / "out"),
        watermark_seconds=1,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # append mode only emits closed windows; with a bounded input the last
    # window stays open -> assert the query ran and wrote the directory
    import os

    assert os.path.isdir(str(tmp_path / "out"))


def test_streaming_rate_state_across_microbatches(spark, tmp_path):
    """W1 as a custom stateful streaming operator: per-series last-point
    state carries across micro-batches (maxFilesPerTrigger=1 forces the
    batch boundary mid-series); output equals the batch rate operator."""
    from timely_spark.operators.rate import RateOptions, rate
    from timely_spark.sources.lineprotocol import parse_lines_df
    from timely_spark.streaming.stateful_rate import streaming_rate

    b = 1_447_767_913_000
    src = tmp_path / "pts"
    src.mkdir()
    # two series interleaved; split mid-series across two files
    f1 = [f"put m {b + i * 1000} {float(i * i)} host=h1" for i in range(5)] + [
        f"put m {b + i * 2000} {float(i)} host=h2" for i in range(3)
    ]
    f2 = [f"put m {b + i * 1000} {float(i * i)} host=h1" for i in range(5, 10)] + [
        f"put m {b + i * 2000} {float(i)} host=h2" for i in range(3, 6)
    ]
    (src / "f1.txt").write_text("\n".join(f1) + "\n")
    (src / "f2.txt").write_text("\n".join(f2) + "\n")

    lines = spark.readStream.option("maxFilesPerTrigger", 1).text(str(src))
    pts = parse_lines_df(lines)
    q = (
        streaming_rate(pts, RateOptions(interval_ms=1000))
        .writeStream.format("memory")
        .queryName("rates")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["series_key"], r["ts"]): r["value"]
        for r in spark.sql("select * from rates").collect()
    }

    batch_pts = parse_lines_df(
        spark.createDataFrame([(l,) for l in f1 + f2], ["value"])
    )
    from timely_spark.model import series_id

    expect = {
        (r["__series"], r["ts"]): r["value"]
        for r in rate(batch_pts, RateOptions(interval_ms=1000))
        .withColumn("__series", series_id())
        .collect()
    }
    assert len(got) == len(expect) == 8 + 8 - 2  # each series loses its first point
    for k, v in expect.items():
        assert got[k] == pytest.approx(v, rel=1e-12)


def test_streaming_rate_counter_late_and_equal_ts_semantics(spark, tmp_path):
    """Pin the r13 vectorized update's scalar semantics corner by
    corner: counter wrap (+counter_max on a negative delta), an
    equal-timestamp pair (rate 0.0), and the monotonic-state guard (a
    point OLDER than the carried state arriving in a LATER micro-batch
    is dropped, not emitted as a negative-dt rate)."""
    from timely_spark.operators.rate import RateOptions
    from timely_spark.sources.lineprotocol import parse_lines_df
    from timely_spark.streaming.stateful_rate import streaming_rate

    b = 1_447_767_913_000
    src = tmp_path / "pts"
    src.mkdir()
    # equal-ts values kept EQUAL so pandas' non-stable tie order cannot
    # change which value becomes the carried state
    f1 = [
        f"put m {b + 1000} 10.0 host=h1",
        f"put m {b + 2000} 4.0 host=h1",
        f"put m {b + 2000} 4.0 host=h1",
    ]
    f2 = [
        f"put m {b + 1500} 99.0 host=h1",  # older than state -> dropped
        f"put m {b + 3000} 1.0 host=h1",   # counter wrap: -3 + 100
        f"put m {b + 4000} 5.0 host=h1",
    ]
    (src / "f1.txt").write_text("\n".join(f1) + "\n")
    (src / "f2.txt").write_text("\n".join(f2) + "\n")
    import os
    import time as _t

    os.utime(src / "f1.txt", (_t.time() - 20, _t.time() - 20))

    lines = spark.readStream.option("maxFilesPerTrigger", 1).text(str(src))
    pts = parse_lines_df(lines)
    q = (
        streaming_rate(
            pts,
            RateOptions(interval_ms=1000, counter=True, counter_max=100),
        )
        .writeStream.format("memory")
        .queryName("rates_ctr")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r["ts"], r["value"])
        for r in spark.sql("select * from rates_ctr").collect()
    )
    want = [
        (b + 2000, 0.0),    # equal-timestamp pair
        (b + 2000, 94.0),   # (4-10) wraps to +94 over 1s
        (b + 3000, 97.0),   # (1-4) wraps to +97; the late 1500 point dropped
        (b + 4000, 4.0),    # plain delta
    ]
    assert got == want


def test_summarization_writeback_loop(spark, tmp_path):
    """A11 full loop: raw points -> summarize -> sample-tagged points ->
    store -> queryable via the same OpenTSDB API (the Flink job's
    put-line write-back, MetricHistogram.serialize:123-167)."""
    from timely_spark.api import TimelyEngine
    from timely_spark.streaming.summarize import summarize_batch, summary_to_points

    b = 1_447_767_913_000 - (1_447_767_913_000 % 60_000)
    eng = TimelyEngine(spark, store_path=str(tmp_path / "m"))
    eng.put_lines([f"put m {b + i * 1000} {float(i)} host=h1" for i in range(1, 60)])

    summary = summarize_batch(eng.points(), window_ms=60_000, exact=True)
    wb = summary_to_points(summary)
    n = eng._store(wb)
    assert n == 9  # one point per stat

    out = eng.query(
        {
            "start": b - 1000,
            "end": b + 120_000,
            "msResolution": True,
            "queries": [
                {
                    "aggregator": "none",
                    "metric": "m_summarized",
                    "tags": {"sample": "avg"},
                }
            ],
        }
    )
    assert len(out) == 1
    assert out[0]["tags"] == {"sample": "avg"}
    assert out[0]["dps"][str(b)] == pytest.approx(30.0)


def test_streaming_fir_state_across_microbatches(spark, tmp_path):
    """W2 as a custom stateful streaming operator: the per-series ring
    buffer of the last F-1 values carries across micro-batches; output
    equals the batch FIR operator."""
    from timely_spark.operators.fir import fir_filter
    from timely_spark.sources.lineprotocol import parse_lines_df
    from timely_spark.streaming.stateful_fir import streaming_fir

    b = 1_447_767_913_000
    src = tmp_path / "pts"
    src.mkdir()
    # two series interleaved; split mid-series so the 5-point window
    # straddles the micro-batch boundary
    f1 = [f"put m {b + i * 1000} {float(i * i)} host=h1" for i in range(6)] + [
        f"put m {b + i * 2000} {float(i)} host=h2" for i in range(4)
    ]
    f2 = [f"put m {b + i * 1000} {float(i * i)} host=h1" for i in range(6, 12)] + [
        f"put m {b + i * 2000} {float(i)} host=h2" for i in range(4, 8)
    ]
    (src / "f1.txt").write_text("\n".join(f1) + "\n")
    (src / "f2.txt").write_text("\n".join(f2) + "\n")

    weights = "0.2,0.2,0.2,0.2,0.2"
    lines = spark.readStream.option("maxFilesPerTrigger", 1).text(str(src))
    pts = parse_lines_df(lines)
    q = (
        streaming_fir(pts, weights)
        .writeStream.format("memory")
        .queryName("firs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["series_key"], r["ts"]): r["value"]
        for r in spark.sql("select * from firs").collect()
    }

    batch_pts = parse_lines_df(
        spark.createDataFrame([(l,) for l in f1 + f2], ["value"])
    )
    from timely_spark.model import series_id

    expect = {
        (r["__series"], r["ts"]): r["value"]
        for r in fir_filter(batch_pts, weights)
        .withColumn("__series", series_id())
        .collect()
    }
    # each series loses its first F-1=4 points
    assert len(got) == len(expect) == (12 - 4) + (8 - 4)
    for k, v in expect.items():
        assert got[k] == pytest.approx(v, rel=1e-12)


def test_subscription_finite_range_completes(spark, tmp_path):
    """X1/X2 end-of-range: a finite subscription drains the range and then
    emits the complete:true marker (MetricScanner.java:254-281); close()
    on an infinite subscription sends it too (close path :283-291)."""
    import time

    from timely_spark.sources.lineprotocol import parse_lines_df
    from timely_spark.sources.store import write_points
    from timely_spark.streaming.subscription import SubscriptionManager

    b = 1_447_767_913_000
    store = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(f"put m {b + i * 1000} {float(i)} host=h1",) for i in range(5)], ["value"]
    )
    write_points(parse_lines_df(df), store)

    mgr = SubscriptionManager(spark, store, flush_seconds=1, sink="buffer")
    mgr.create("s1")
    q = mgr.add("s1", "m", start_time_ms=b, end_time_ms=b + 2500)
    deadline = time.time() + 60
    while time.time() < deadline and not any(
        isinstance(r, dict) and r.get("complete")
        for r in mgr.buffers.get(("s1", "m"), [])
    ):
        time.sleep(0.5)
    buf = mgr.buffers[("s1", "m")]
    rows = [r for r in buf if not isinstance(r, dict)]
    assert {r["value"] for r in rows} == {0.0, 1.0, 2.0}  # ts <= b+2500
    assert buf[-1] == {"metric": "m", "subscriptionId": "s1", "complete": True}
    assert not q.isActive
    # close() is idempotent on the marker: only one complete response
    mgr.close("s1")
    assert sum(1 for r in mgr.buffers[("s1", "m")] if isinstance(r, dict)) == 1


def test_streaming_exact_dedup_across_microbatches(spark, tmp_path):
    """State-store dedup: a duplicate document arriving in a LATER
    micro-batch is dropped (file source processes one file per trigger)."""
    import json

    from timely_spark.streaming.dedup import streaming_exact_dedup

    src = tmp_path / "docs"
    src.mkdir()
    b = 1_447_767_913_000

    def write_batch(name, rows):
        (src / name).write_text(
            "\n".join(json.dumps(r) for r in rows) + "\n"
        )

    write_batch(
        "b1.json",
        [
            {"doc_id": 1, "ts": b, "text": "alpha beta"},
            {"doc_id": 2, "ts": b + 1, "text": "gamma delta"},
            {"doc_id": 3, "ts": b + 2, "text": "alpha beta"},  # in-batch dup
        ],
    )
    write_batch(
        "b2.json",
        [
            {"doc_id": 4, "ts": b + 60_000, "text": "alpha beta"},  # cross-batch dup
            {"doc_id": 5, "ts": b + 60_001, "text": "epsilon"},
        ],
    )
    stream = (
        spark.readStream.schema("doc_id long, ts long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = streaming_exact_dedup(stream, ts_col="ts", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id, text FROM dedup_out").collect()
    kept_texts = sorted(r["text"] for r in rows)
    assert kept_texts == ["alpha beta", "epsilon", "gamma delta"]
    kept_ids = {r["doc_id"] for r in rows}
    assert 4 not in kept_ids and 3 not in kept_ids


def test_streaming_summarization_parity_with_batch(spark, tmp_path):
    """A11 end-to-end (VERDICT r2 item #6): summarization_query drains a
    WRITTEN STORE via availableNow and its *_summarized rows equal the
    batch summarize_batch result for every closed window
    (SummarizationJob.java:40-105 / MetricHistogram.java:64-167)."""
    from timely_spark.sources.lineprotocol import parse_lines_df
    from timely_spark.sources.store import read_points, write_points
    from timely_spark.streaming.summarize import (
        summarization_query,
        summarize_batch,
    )

    b = 1_447_767_913_000 - (1_447_767_913_000 % 60_000)
    # 2 series x 2 one-minute windows
    lines = [
        f"put m {b + i * 1000} {float(i * (1 + i % 2))} host=h{i % 2}"
        for i in range(120)
    ]
    # sentinel far in the future: advances the watermark past every real
    # window so append mode emits them; its own open window never emits
    sentinel_ts = b + 10 * 60_000
    sentinel = f"put m {sentinel_ts} 0.0 host=h0"
    pts = parse_lines_df(
        spark.createDataFrame([(l,) for l in lines + [sentinel]], ["value"])
    )
    store = str(tmp_path / "store")
    write_points(pts, store, mode="overwrite")

    stream = spark.readStream.schema(
        "ts long, value double, tags map<string,string>, viz string, "
        "metric string, dt long"
    ).parquet(store)
    q = summarization_query(
        stream.select("metric", "ts", "value", "tags", "viz"),
        window_seconds=60,
        checkpoint=str(tmp_path / "ck"),
        out_path=str(tmp_path / "out"),
        watermark_seconds=1,
        exact=True,
        available_now=True,
    )
    assert q.awaitTermination(180)

    def rows_to_set(rows):
        return {
            (
                r["metric"],
                tuple(sorted((r["tags"] or {}).items())),
                r["bucket_ts"],
                r["n"],
                r["min_value"],
                r["max_value"],
                r["sum_value"],
                r["avg_value"],
                r["p50"],
                r["p75"],
                r["p90"],
                r["p99"],
            )
            for r in rows
        }

    got = rows_to_set(spark.read.parquet(str(tmp_path / "out")).collect())
    want = rows_to_set(
        summarize_batch(
            read_points(spark, store).filter(F.col("ts") < sentinel_ts),
            window_ms=60_000,
            exact=True,
        ).collect()
    )
    assert len(want) == 4  # 2 series x 2 windows
    assert got == want


def test_subscription_file_sink_lifecycle(spark, tmp_path):
    """Default (non-collect) sink: responses spool to per-(sub, metric)
    JSON-lines directories via distributed writes — no driver collect —
    and a finite-range add() drains, terminates, and drops the
    complete:true marker into the spool (VERDICT r2 item #7;
    MetricScanner.java:254-281)."""
    import os
    import time

    from timely_spark.sources.lineprotocol import parse_lines_df
    from timely_spark.sources.store import write_points
    from timely_spark.streaming.subscription import SubscriptionManager

    b = 1_447_767_913_000
    store = str(tmp_path / "store")
    lines = [f"put m {b + i * 1000} {float(i)} host=h1" for i in range(8)]
    write_points(
        parse_lines_df(spark.createDataFrame([(l,) for l in lines], ["value"])),
        store,
    )

    mgr = SubscriptionManager(
        spark, store, flush_seconds=1, out_root=str(tmp_path / "spool")
    )
    assert mgr._kind == "files"
    mgr.create("s1")
    # finite range: availableNow drain then completion marker
    mgr.add("s1", "m", tags={"host": "h1"}, end_time_ms=b + 60_000)
    try:
        deadline = time.time() + 120
        marker = os.path.join(mgr.results_path("s1", "m"), "complete.marker.json")
        while time.time() < deadline and not os.path.exists(marker):
            time.sleep(0.5)
        assert os.path.exists(marker)

        res = mgr.read_results("s1", "m")
        data = res.filter("complete IS NULL" if "complete" in res.columns else "1=1")
        vals = {r["value"] for r in data.collect() if r["value"] is not None}
        assert vals == {float(i) for i in range(8)}
        done = res.filter("complete = true").collect() if "complete" in res.columns else []
        assert len(done) == 1 and done[0]["subscriptionId"] == "s1"
        # nothing accumulated driver-side
        assert mgr.buffers.get(("s1", "m"), []) == [
            {"metric": "m", "subscriptionId": "s1", "complete": True}
        ]
    finally:
        mgr.close("s1")


def test_streaming_sessionize_parity_with_batch(spark, tmp_path):
    """Native session_window sessionization: the streaming variant
    (availableNow over parquet) emits exactly the batch sessionize rows
    for every watermark-closed session, and the session partition agrees
    with the lag-based events_sessionize formulation on gap-free-boundary
    data."""
    from timely_spark.streaming.sessionize import sessionize, sessionize_stream

    b = 1_447_767_913_000
    gap = 30 * 60_000
    rows = []
    # 3 users x 3 sessions each; intra-session steps 1-5 min, session
    # breaks at gap + 7 min (clear of the >= vs > boundary)
    for u in range(3):
        t = b + u * 1000
        for s in range(3):
            for i in range(4):
                rows.append((u, t, float(u + s + i)))
                t += 60_000 * (1 + (u + i) % 5)
            t += gap + 7 * 60_000
    # sentinel far ahead so the watermark closes every real session
    sentinel_ts = b + 10 * 86_400_000
    rows.append((99, sentinel_ts, 0.0))

    src = tmp_path / "events_pq"
    spark.createDataFrame(rows, "user_id long, ts_ms long, value double").coalesce(
        2
    ).write.parquet(str(src))

    stream = spark.readStream.schema("user_id long, ts_ms long, value double").parquet(
        str(src)
    )
    q = sessionize_stream(
        stream,
        checkpoint=str(tmp_path / "ck"),
        out_path=str(tmp_path / "out"),
        watermark_seconds=1,
        available_now=True,
    )
    assert q.awaitTermination(180)

    def key(r):
        return (
            r["user_id"],
            r["session_start_ms"],
            r["n_events"],
            r["duration_ms"],
            r["sum_value"],
        )

    got = {key(r) for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    batch = sessionize(
        spark.createDataFrame(
            [r for r in rows if r[0] != 99],
            "user_id long, ts_ms long, value double",
        )
    )
    want = {key(r) for r in batch.collect()}
    assert len(want) == 9  # 3 users x 3 sessions
    assert got == want

    # the native operator partitions events identically to the lag-based
    # driver formulation on this fixture: same (user, n_events) multiset
    import __spark_entry__  # noqa: F401 (sessionize semantics reference)

    sessions_per_user = {}
    for r in want:
        sessions_per_user.setdefault(r[0], []).append(r[2])
    assert all(sorted(v) == [4, 4, 4] for v in sessions_per_user.values())


def test_streaming_zscore_parity_with_batch_moments(spark, tmp_path):
    """Online z-score screen: running moments carry across micro-batches
    (maxFilesPerTrigger=1 forces the boundary) and after the full drain
    equal the batch exact-decimal moments; n_seen accumulates
    monotonically per metric."""
    import math

    from timely_spark.streaming.anomaly import streaming_zscore

    rows = [("m1", float(i % 17) + (50.0 if i == 37 else 0.0)) for i in range(60)] + [
        ("m2", float(i % 5)) for i in range(40)
    ]
    src = tmp_path / "vals"
    src.mkdir()
    import pandas as pd

    # two files -> two micro-batches
    pd.DataFrame(rows[:50], columns=["metric", "value"]).to_parquet(src / "a.parquet")
    pd.DataFrame(rows[50:], columns=["metric", "value"]).to_parquet(src / "b.parquet")

    stream = (
        spark.readStream.schema("metric string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = streaming_zscore(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)

    got = spark.read.parquet(str(tmp_path / "out")).collect()
    by_metric = {}
    for r in got:
        by_metric.setdefault(r["metric"], []).append(r)
    # multiple batches per metric, n_seen monotone
    assert len(by_metric["m1"]) >= 2
    for rs in by_metric.values():
        ns = sorted(r["n_seen"] for r in rs)
        assert ns == [r["n_seen"] for r in sorted(rs, key=lambda x: x["n_seen"])]

    # final moments == batch moments
    for metric, vals in (
        ("m1", [v for m, v in rows if m == "m1"]),
        ("m2", [v for m, v in rows if m == "m2"]),
    ):
        final = max(by_metric[metric], key=lambda r: r["n_seen"])
        n = len(vals)
        mean = sum(vals) / n
        std = math.sqrt((sum(v * v for v in vals) - sum(vals) ** 2 / n) / (n - 1))
        assert final["n_seen"] == n
        assert abs(final["mean"] - mean) < 1e-9 * max(1.0, abs(mean))
        assert abs(final["std"] - std) < 1e-9 * max(1.0, std)
    # the planted spike is an outlier in its batch
    assert any(r["n_outliers_batch"] >= 1 for r in by_metric["m1"])


def test_sessionize_exact_gap_boundary(spark):
    """VERDICT r3 item #6 — pin the exact-gap boundary instead of
    steering around it. Empirical finding (this test is the proof): the
    two formulations AGREE — Spark's session-window merge is INCLUSIVE
    (an event at exactly t+gap extends the session), matching the lag
    formulation's strict diff > gap split. An earlier revision documented
    a >= divergence; both variants and both DuckDB oracles now share the
    strict-> semantics. One millisecond PAST the gap both variants
    split."""
    import duckdb

    from timely_spark.streaming.sessionize import sessionize, sessionize_lag

    gap_min = 30
    gap = gap_min * 60_000
    b = 1_447_767_900_000
    # u1: three events exactly gap-separated (boundary case);
    # u2: gap+1 ms apart (both variants must split);
    # u3: gap-1 ms apart (both variants must merge)
    rows = (
        [("u1", b + i * gap, 1.0) for i in range(3)]
        + [("u2", b + i * (gap + 1), 1.0) for i in range(3)]
        + [("u3", b + i * (gap - 1), 1.0) for i in range(3)]
    )
    ev = spark.createDataFrame(rows, ["user_id", "ts_ms", "value"])

    def key(df):
        return {
            (r["user_id"], r["session_start_ms"]): (r["n_events"], r["duration_ms"])
            for r in df.collect()
        }

    lag_out = key(sessionize_lag(ev, gap_minutes=gap_min))
    native_out = key(sessionize(ev, gap_minutes=gap_min))

    # exact gap: ONE session under BOTH variants (inclusive merge)
    assert lag_out[("u1", b)] == (3, 2 * gap)
    assert native_out[("u1", b)] == (3, 2 * gap)
    # one ms past the gap: THREE sessions under both
    for out in (lag_out, native_out):
        assert [k for k in sorted(out) if k[0] == "u2"] == [
            ("u2", b + i * (gap + 1)) for i in range(3)
        ]
    # safely inside the gap: one session under both
    assert lag_out[("u3", b)] == (3, 2 * (gap - 1))
    assert native_out[("u3", b)] == (3, 2 * (gap - 1))
    assert lag_out == native_out

    # and the shared strict-> oracle agrees on the fixture
    want = duckdb.sql(
        f"""
        WITH ev(user_id, ts_ms) AS (
          VALUES {','.join(f"('{u}', {t})" for (u, t, _v) in rows)}),
        flagged AS (
          SELECT user_id, ts_ms,
                 CASE WHEN ts_ms - lag(ts_ms) OVER w > {gap} THEN 1 ELSE 0 END AS ns
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms)),
        sess AS (
          SELECT user_id, ts_ms,
                 sum(ns) OVER (PARTITION BY user_id ORDER BY ts_ms
                               ROWS UNBOUNDED PRECEDING) AS sess_no
          FROM flagged)
        SELECT user_id, min(ts_ms) AS s, count(*) AS n, max(ts_ms) - min(ts_ms) AS d
        FROM sess GROUP BY user_id, sess_no
        """
    ).fetchall()
    assert {(u, s): (n, d) for u, s, n, d in want} == lag_out


def test_streaming_quality_screen_batch_parity(spark, tmp_path):
    """The stateless document screens (Gopher rules + quality features)
    compose into a stream unchanged: streaming availableNow output ==
    the batch operator over the union of all micro-batch files."""
    import json

    from timely_spark.operators.text import gopher_rules

    src = tmp_path / "docs"
    src.mkdir()
    filler = " ".join(["the be to of and that have with"] + ["word"] * 52)
    batches = [
        [
            {"doc_id": 1, "text": filler},
            {"doc_id": 2, "text": "too short the be"},
        ],
        [
            {"doc_id": 3, "text": " ".join(["###"] * 30 + ["the be word"] * 20)},
            {"doc_id": 4, "text": filler + " extra"},
        ],
    ]
    for i, rows in enumerate(batches):
        (src / f"b{i}.json").write_text(
            "\n".join(json.dumps(r) for r in rows) + "\n"
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        gopher_rules(stream)
        .writeStream.format("memory")
        .queryName("screen_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: tuple(r)
        for r in spark.sql("select * from screen_out").collect()
    }
    batch_df = spark.read.schema("doc_id long, text string").json(str(src))
    want = {r["doc_id"]: tuple(r) for r in gopher_rules(batch_df).collect()}
    assert got == want and set(got) == {1, 2, 3, 4}
    assert spark.sql(
        "select doc_id from screen_out where gopher_pass"
    ).count() == 2


def test_streaming_ddsketch_state_across_microbatches(spark, tmp_path):
    """Bounded-state streaming percentiles: two micro-batches (the
    second carrying LATE in-watermark points for an earlier window)
    fold into sketch partials that match the batch sketch over the
    union exactly, and the derived quantiles match the batch walk."""
    from timely_spark.operators.rollup import (
        ddsketch_partials,
        ddsketch_quantile,
    )
    from timely_spark.streaming.ddsketch import ddsketch_stream_query

    b = 1_447_767_913_000 - (1_447_767_913_000 % 60_000)
    src = tmp_path / "src"
    src.mkdir()
    schema = "metric string, ts long, value double"

    def run():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = ddsketch_stream_query(
            stream, window_seconds=60, checkpoint=str(tmp_path / "ck"),
            out_path=str(tmp_path / "out"), watermark_seconds=300,
            available_now=True,
        )
        assert q.awaitTermination(180)

    batch1 = [("m", b + i * 1000, float(1 + i % 7)) for i in range(100)]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run()
    # late points for window 0, still inside the 300 s watermark, plus a
    # sentinel far enough ahead to close every real window
    batch2 = [("m", b + i, 50.0 + i) for i in range(3)] + [
        ("m", b + 20 * 60_000, 0.0)
    ]
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run()

    sink = spark.read.parquet(str(tmp_path / "out"))
    # the sentinel's own window may or may not have closed; compare the
    # real windows only
    real = sink.filter(F.col("bucket_ts") < b + 10 * 60_000)
    all_pts = spark.createDataFrame(batch1 + batch2, schema).filter(
        F.col("ts") < b + 10 * 60_000
    )
    want_partials = sorted(map(tuple, ddsketch_partials(all_pts, 60_000)
        .select("metric", "bucket_ts", "dd_sign", "dd_idx", "cnt").collect()))
    # append sink may emit a window's partials across runs: re-merge
    got_partials = sorted(map(tuple,
        real.groupBy("metric", "bucket_ts", "dd_sign", "dd_idx")
        .agg(F.sum("cnt").alias("cnt")).collect()))
    assert got_partials == want_partials
    got_q = sorted(map(tuple, ddsketch_quantile(real, 60_000, 60_000).collect()))
    want_q = sorted(map(tuple,
        ddsketch_quantile(ddsketch_partials(all_pts, 60_000), 60_000, 60_000)
        .collect()))
    assert got_q == want_q


def test_subscription_sourced_summarization(spark, tmp_path):
    """VERDICT r5 item #5: the Flink job's FULL topology
    (SummarizationJob.java:40-105) end-to-end — a live WS subscription is
    the SOURCE (SubscriptionSource.java), points ingested MID-STREAM flow
    through it, the watermarked streaming summarization runs over the
    subscription feed, and the summary returns to the store as
    sample-tagged put lines over a REAL TCP connection (the
    SocketClientSink analogue), queryable via the same API."""
    import time

    from timely_spark.api import TimelyEngine
    from timely_spark.streaming.analytics import SubscriptionSummarizationJob
    from timely_spark.streaming.summarize import summarize_batch
    from timely_spark.tcp_facade import TimelyTcpServer
    from timely_spark.ws_facade import TimelyWebSocketServer

    b = 1_447_767_913_000 - (1_447_767_913_000 % 60_000)
    store = str(tmp_path / "store")
    eng = TimelyEngine(spark, store_path=store)
    # backfill: minutes 0-2
    batch1 = [f"put m {b + i * 1000} {float(i)} host=h1" for i in range(0, 180, 5)]
    eng.put_lines(batch1)

    ws = TimelyWebSocketServer(spark, store, flush_seconds=1).start()
    tcp = TimelyTcpServer(eng, flush_lines=9, flush_seconds=60).start()
    job = SubscriptionSummarizationJob(
        spark,
        ws.host, ws.port,
        tcp.host, tcp.port,
        metrics=["m"],
        window_seconds=60,
        work_dir=str(tmp_path / "job"),
        watermark_seconds=1,
    )
    try:
        # live tail subscription (endTime=0), then ingest MID-STREAM:
        # minutes 3-5 + a late sentinel that closes every real window
        job.subscribe(start_ms=b)
        assert job.spool.await_rows(len(batch1), timeout=120)
        batch2 = [
            f"put m {b + i * 1000} {float(i)} host=h1" for i in range(180, 360, 5)
        ] + [f"put m {b + 420_000} 0.0 host=h1"]
        eng.put_lines(batch2)
        assert job.spool.await_rows(len(batch1) + len(batch2), timeout=120)

        # end the subscription (complete markers), then drain the spool
        # through the summarization plan and TCP-sink the put lines
        job.stop_subscription()
        assert job.spool.await_complete(timeout=120)
        n_lines = job.run_backlog(exact=True)
        assert n_lines >= 6 * 9  # minutes 0-5 closed x 9 stats each
        tcp.buffer.flush()

        # summarized series are now queryable through the engine API;
        # the TCP handler drains the socket asynchronously, so poll until
        # every closed window's write-back landed (6 windows expected)
        deadline = time.time() + 120
        out = []
        n_windows = n_lines // 9
        while time.time() < deadline:
            tcp.buffer.flush()
            try:
                out = eng.query(
                    {
                        "start": b - 1000,
                        "end": b + 420_000,
                        "msResolution": True,
                        "queries": [
                            {"aggregator": "none", "metric": "m_summarized",
                             "tags": {"sample": "avg"}}
                        ],
                    }
                )
            except Exception:
                out = []
            if out and len(out[0]["dps"]) >= n_windows:
                break
            time.sleep(1)
        assert out and out[0]["tags"].get("sample") == "avg"
        got = {int(k): v for k, v in out[0]["dps"].items()}

        # parity: every closed window's avg equals the batch plan over
        # the SAME raw points (both batches flowed through the WS source)
        raw = eng.points().filter(F.col("metric") == "m")
        expect = {
            r["bucket_ts"]: r["avg_value"]
            for r in summarize_batch(raw, window_ms=60_000, exact=True).collect()
        }
        assert len(got) >= 6
        for ts, v in got.items():
            assert v == pytest.approx(expect[ts], rel=1e-9), ts
    finally:
        job.close()
        tcp.stop()
        ws.stop()


def test_streaming_cms_state_across_microbatches(spark, tmp_path):
    """Bounded-state streaming heavy hitters: two micro-batches (the
    second carrying LATE in-watermark items for an earlier window) fold
    into CMS partials that match the batch sketch (cms_partials) built
    over each closed window's items exactly — counter addition across
    micro-batch state, same contract as the DDSketch sibling."""
    from timely_spark.operators.rollup import cms_partials
    from timely_spark.streaming.cms import cms_stream_query

    b = 1_447_767_913_000 - (1_447_767_913_000 % 60_000)
    src = tmp_path / "src"
    src.mkdir()
    schema = "ts long, item string"

    def run():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = cms_stream_query(
            stream, "item", window_seconds=60,
            checkpoint=str(tmp_path / "ck"),
            out_path=str(tmp_path / "out"), watermark_seconds=300,
            available_now=True,
        )
        assert q.awaitTermination(180)

    batch1 = [(b + i * 1000, f"u{i % 9}") for i in range(100)]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run()
    # late items for window 0, inside the 300 s watermark, plus a
    # sentinel far ahead to close every real window; one NULL item that
    # must be dropped, not hashed
    batch2 = [(b + i, "u0") for i in range(3)] + [
        (b + 20 * 60_000, "zz"),
        (b + 1, None),
    ]
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run()

    sink = spark.read.parquet(str(tmp_path / "out"))
    real = sink.filter(F.col("bucket_ts") < b + 10 * 60_000)
    all_pts = spark.createDataFrame(batch1 + batch2, schema).filter(
        F.col("ts") < b + 10 * 60_000
    )
    # append sink may emit a window's partials across runs: re-merge
    got = {}
    for r in (
        real.groupBy("bucket_ts", "d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    ):
        got.setdefault(r["bucket_ts"], set()).add(
            (r["d"], r["bucket"], r["cnt"])
        )
    windows = sorted(got)
    assert len(windows) >= 2
    for w in windows:
        items = all_pts.filter(
            (F.col("ts") - F.col("ts") % 60_000) == w
        )
        want = {
            tuple(r) for r in cms_partials(items, "item").collect()
        }
        assert got[w] == want, f"window {w} partials diverge"


def test_state_store_provider_resolution():
    """The state_store knob maps to provider classes per the MEASURED
    sizing rule (SCALE.md r10: heap OOMs ~1M open keys/GiB; RocksDB
    drains 10M cleanly): auto stays on heap below the threshold or when
    the key count is unknown, flips to RocksDB above it."""
    import pytest

    from timely_spark.streaming.state import (
        HEAP_KEYS_MAX,
        HEAP_PROVIDER,
        ROCKSDB_PROVIDER,
        resolve_provider,
    )

    assert resolve_provider("heap") == HEAP_PROVIDER
    assert resolve_provider("rocksdb") == ROCKSDB_PROVIDER
    assert resolve_provider("auto") == HEAP_PROVIDER
    assert resolve_provider("auto", HEAP_KEYS_MAX) == HEAP_PROVIDER
    assert resolve_provider("auto", HEAP_KEYS_MAX + 1) == ROCKSDB_PROVIDER
    with pytest.raises(ValueError, match="state_store"):
        resolve_provider("mapdb")


def test_state_store_knob_lands_in_checkpoint(spark, tmp_path):
    """state_store='rocksdb' on a query constructor must be captured by
    the query's checkpoint at start (Spark pins the provider class into
    OffsetSeqMetadata and enforces it on restart) AND must not leak
    into the session conf afterwards."""
    import json

    from timely_spark.sources.lineprotocol import parse_lines_df
    from timely_spark.streaming.state import _PROVIDER_KEY, ROCKSDB_PROVIDER
    from timely_spark.streaming.summarize import summarization_query

    src = tmp_path / "pts"
    src.mkdir()
    b = 1_447_767_913_000 - (1_447_767_913_000 % 60_000)
    (src / "batch1.txt").write_text(
        "\n".join(
            f"put m {b + i * 1000} {float(i)} host=h1" for i in range(1, 61)
        )
        + "\n"
    )
    lines = spark.readStream.text(str(src))
    pts = parse_lines_df(lines)
    before = spark.conf.get(_PROVIDER_KEY, None)
    q = summarization_query(
        pts,
        window_seconds=60,
        checkpoint=str(tmp_path / "ck"),
        out_path=str(tmp_path / "out"),
        watermark_seconds=1,
        available_now=True,
        state_store="rocksdb",
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    # the provider was captured by the checkpoint, not the session
    assert spark.conf.get(_PROVIDER_KEY, None) == before
    off = tmp_path / "ck" / "offsets" / "0"
    meta = None
    for line in off.read_text().splitlines():
        if line.startswith("{") and "stateStore" in line:
            meta = json.loads(line)
            break
    assert meta is not None, "offsets/0 carries no OffsetSeqMetadata"
    assert (
        meta["conf"][_PROVIDER_KEY] == ROCKSDB_PROVIDER
    ), meta["conf"]


def test_streaming_history_dedup_incremental_index(spark, tmp_path):
    """Incremental NEAR-dup ingest loop (r12): each micro-batch screens
    against the persisted MinHash index and registers its survivors —
    a later batch's re-submission of an accepted text (new doc_id) is
    dropped; the index the stream maintains is readable by the batch
    tooling (MinHashIndex.load/screen); a crash-replay of the last
    batch is byte-idempotent (partitioned dynamic overwrite, no marker
    files); fold-compaction collapses committed partitions without
    changing answers or breaking later batches; mismatched restart
    params fail loudly."""
    import json
    import os

    import pytest as _pytest

    from timely_spark.operators.ann_index import MinHashIndex
    from timely_spark.streaming.dedup import (
        compact_history_index,
        register_screen_batch,
        streaming_history_dedup_query,
    )

    def text(i):
        return " ".join(f"w{i}q{k}" for k in range(30))

    src = tmp_path / "docs"
    src.mkdir()
    batches = [
        [{"doc_id": i, "text": text(i)} for i in range(1, 6)],
        [{"doc_id": 10 + i, "text": text(100 + i)} for i in range(3)]
        + [{"doc_id": 21, "text": text(2)}],      # re-submission of doc 2
        [{"doc_id": 31, "text": text(101)},       # re-submission of doc 11
         {"doc_id": 32, "text": text(200)}],
    ]
    for n, rows in enumerate(batches):
        p = src / f"b{n}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        os.utime(p, (1_700_000_000 + n, 1_700_000_000 + n))

    idx = str(tmp_path / "hist_idx")
    out = str(tmp_path / "accepted")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = streaming_history_dedup_query(
        stream, idx, out, str(tmp_path / "ckpt"), threshold=0.5,
        num_hashes=64, bands=32,
    )
    q.awaitTermination(180)
    shipped = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert shipped == {1, 2, 3, 4, 5, 10, 11, 12, 32}
    # batch tooling reads the stream-maintained index: a probe copying
    # an accepted doc hits it
    probe = spark.createDataFrame(
        [(900, text(200)), (901, text(999))], "doc_id long, text string"
    )
    hits = MinHashIndex.load(spark, idx).screen(probe)
    assert {r.id_b for r in hits.collect()} == {900}

    def _counts():
        return (
            spark.read.parquet(out).count(),
            spark.read.parquet(idx + "/bands").count(),
            spark.read.parquet(idx + "/shingles").count(),
        )

    # crash-replay of the LAST batch: foreachBatch re-delivers batch 2
    before = _counts()
    replay = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in batches[2]],
        "doc_id long, text string",
    )
    register_screen_batch(
        replay, 2, index_path=idx, out_path=out, threshold=0.5,
        num_hashes=64, bands=32,
    )
    assert _counts() == before
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == shipped

    # fold-compaction: committed partitions collapse into __batch=-1,
    # the newest (replayable) partition survives, answers unchanged
    pre = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 6))
        for r in MinHashIndex.load(spark, idx).screen(probe).collect()
    )
    compact_history_index(spark, idx)
    parts = {
        d for d in os.listdir(idx + "/bands") if d.startswith("__batch=")
    }
    assert parts == {"__batch=-1", "__batch=2"}
    post = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 6))
        for r in MinHashIndex.load(spark, idx).screen(probe).collect()
    )
    assert post == pre
    # the stream resumes cleanly on the folded layout: a new batch with
    # one re-submission and one new doc
    nxt = spark.createDataFrame(
        [(41, text(3)), (42, text(300))], "doc_id long, text string"
    )
    register_screen_batch(
        nxt, 3, index_path=idx, out_path=out, threshold=0.5,
        num_hashes=64, bands=32,
    )
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == (
        shipped | {42}
    )
    # restart with different params: loud error, never a quiet override
    with _pytest.raises(ValueError, match="index params"):
        register_screen_batch(
            nxt, 4, index_path=idx, out_path=out, threshold=0.9,
            num_hashes=64, bands=32,
        )
