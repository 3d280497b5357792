"""Live multi-trigger streaming soak (VERDICT r8 #2).

Every streaming oracle row drains via availableNow and the recovery
tests prove checkpoint state survives restarts — but none of that runs
the engine the way the reference runs it: MetricScanner.run()
(server/.../MetricScanner.java:202-268) is a FOREVER loop consuming
data as it arrives, not a bounded drain. This test runs the real
summarization query under a processing-time trigger for N >= 5
micro-batches with files landing BETWEEN triggers (explicit increasing
mtimes — the r8 X5 lesson: FileStreamSource orders by modification
time, and a late mtime racing ahead drops other files' rows as "late"
data), then asserts

  1. at least 5 distinct data-carrying micro-batches actually ran
     (this was live consumption, not one big drain),
  2. the final sink equals the batch oracle over every closed window
     (no loss, no duplicates, no late-drop across trigger boundaries),
  3. the windowed-aggregation state stayed bounded by the open
     (series, window) pairs throughout — the state-eviction claim
     measured under live triggers, not asserted.
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

B = 1_447_767_913_000
BA = B - (B % 60_000)  # 60s-window-aligned epoch base

N_FILES = 5
SERIES = ("h1", "h2")


def _pt(ts, value, host):
    return {"metric": "m", "ts": ts, "value": float(value),
            "tags": {"host": host}}


def _rows_consumed(q):
    return sum((p.numInputRows or 0) for p in q.recentProgress)



def _land_file(src, idx, rows, mtime_s, all_rows):
    """Write one JSON-lines source file with an EXPLICIT mtime and
    record its rows. The mtime discipline is the r8 X5 lesson in ONE
    place: FileStreamSource orders files by modification time, and a
    late-mtime file racing ahead drops other files' rows as late data
    — every soak must land files with strictly increasing mtimes."""
    p = src / f"f{idx}.json"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    os.utime(p, (mtime_s, mtime_s))
    all_rows.extend(rows)


def _wait(pred, timeout=90, interval=0.25, msg="condition"):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return
        time.sleep(interval)
    raise AssertionError(f"soak timed out waiting for {msg}")


def test_summarize_soak_live_triggers(spark, tmp_path):
    from timely_spark.streaming.summarize import (
        summarization_query,
        summarize_batch,
    )

    src = tmp_path / "pts"
    src.mkdir()
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    schema = "metric string, ts long, value double, tags map<string,string>"

    # file i fills window Wi for both series AND (for i > 0) its max
    # event time pushes the watermark past W(i-1)'s end, closing it:
    # the per-trigger cadence closes exactly one more window per file
    def file_rows(i):
        rows = []
        for j, host in enumerate(SERIES):
            base = BA + i * 60_000
            rows += [
                _pt(base, 10 * i + j, host),
                _pt(base + 20_000, 10 * i + j + 1, host),
                _pt(base + 50_000, 10 * i + j + 2, host),
            ]
        return rows

    all_rows = []

    def write_file(idx, rows, mtime_s):
        _land_file(src, idx, rows, mtime_s, all_rows)

    t0 = time.time()
    write_file(0, file_rows(0), t0)

    q = summarization_query(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src)),
        window_seconds=60,
        checkpoint=ck,
        out_path=out,
        watermark_seconds=10,
        exact=True,
        processing_time="500 milliseconds",
    )
    try:
        # land each subsequent file only after the stream has CONSUMED
        # everything written so far — every file is then processed by a
        # LATER trigger than its predecessor (genuine multi-trigger
        # consumption, not one backlog drain)
        for i in range(1, N_FILES):
            expect = len(all_rows)
            _wait(
                lambda: _rows_consumed(q) >= expect,
                msg=f"consumption of file {i - 1}",
            )
            write_file(i, file_rows(i), t0 + i)

        # sentinel far ahead: closes W(N-1)
        _wait(lambda: _rows_consumed(q) >= len(all_rows), msg="last file")
        write_file(
            N_FILES,
            [_pt(BA + (N_FILES + 10) * 60_000, 0.0, "h1")],
            t0 + N_FILES,
        )

        # all N_FILES windows closed for both series -> 2 * N_FILES rows
        def sink_complete():
            try:
                return (
                    spark.read.parquet(out)
                    .filter(F.col("bucket_ts") < BA + N_FILES * 60_000)
                    .count()
                    == 2 * N_FILES
                )
            except Exception:
                return False

        _wait(sink_complete, msg="all windows closed in the sink")

        progresses = list(q.recentProgress)
    finally:
        q.stop()

    # 1. live multi-trigger consumption: >= N_FILES distinct batches
    #    carried input rows (each file landed after the previous one was
    #    consumed, so no two files share a batch)
    data_batches = [p for p in progresses if (p.numInputRows or 0) > 0]
    assert len(data_batches) >= N_FILES, (
        f"expected >= {N_FILES} data-carrying triggers, saw "
        f"{len(data_batches)}"
    )
    assert len({p.batchId for p in data_batches}) >= N_FILES

    # 2. sink == batch oracle over closed windows (loss/dup/late-drop)
    got = (
        spark.read.parquet(out)
        .filter(F.col("bucket_ts") < BA + N_FILES * 60_000)
        .collect()
    )
    keys = [(r["tags"]["host"], r["bucket_ts"]) for r in got]
    assert len(keys) == len(set(keys)), "duplicate (series, window) rows"
    allpts = spark.createDataFrame(
        [(r["metric"], r["ts"], r["value"], r["tags"]) for r in all_rows],
        schema,
    )
    expect = {
        (r["tags"]["host"], r["bucket_ts"]): (r["n"], r["sum_value"])
        for r in summarize_batch(allpts, window_ms=60_000, exact=True)
        .filter(F.col("bucket_ts") < BA + N_FILES * 60_000)
        .collect()
    }
    got_m = {
        (r["tags"]["host"], r["bucket_ts"]): (r["n"], r["sum_value"])
        for r in got
    }
    assert got_m == expect

    # 3. state bounded by open (series, window) pairs at every trigger:
    #    at most one in-fill window per series plus the not-yet-evicted
    #    just-closed one, plus the sentinel's — never the whole history
    max_state = max(
        (
            op.numRowsTotal
            for p in progresses
            for op in p.stateOperators
            if op.numRowsTotal is not None
        ),
        default=0,
    )
    bound = len(SERIES) * 2 + 1  # 2 live windows/series + sentinel
    assert 0 < max_state <= bound, (
        f"state rows peaked at {max_state}, bound {bound} — windowed "
        "state is not being evicted under live triggers"
    )


def test_sessionize_soak_live_triggers(spark, tmp_path):
    """Sessionize sibling of the summarize soak: session_window's
    MERGING state (not a tumbling window) under a live processing-time
    trigger — sessions opened in one trigger close in a later one when
    the watermark passes (last event + gap), the sink matches the batch
    oracle over closed sessions, and open-session state stays bounded."""
    from timely_spark.streaming.sessionize import (
        sessionize,
        sessionize_stream,
    )

    src = tmp_path / "ev"
    src.mkdir()
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    schema = "user_id long, ts_ms long, value double"
    gap_min = 1
    users = (1, 2)

    # file i: a 30s burst per user at BA + i*10min — bursts are 10min
    # apart (>> the 1min gap), so each file opens a NEW session per user
    # and its events close the PREVIOUS file's sessions via watermark
    def file_rows(i):
        base = BA + i * 600_000
        return [
            (u, base + j * 15_000, float(10 * i + u + j))
            for u in users
            for j in range(3)
        ]

    all_rows = []

    def write_file(idx, rows, mtime_s):
        _land_file(
            src,
            idx,
            [
                {"user_id": r[0], "ts_ms": r[1], "value": r[2]}
                for r in rows
            ],
            mtime_s,
            [],  # recorded below as tuples, not serialized dicts
        )
        all_rows.extend(rows)

    t0 = time.time()
    write_file(0, file_rows(0), t0)
    q = sessionize_stream(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src)),
        checkpoint=ck,
        out_path=out,
        gap_minutes=gap_min,
        watermark_seconds=10,
        processing_time="500 milliseconds",
    )
    sentinel_base = BA + (N_FILES + 10) * 600_000
    try:
        for i in range(1, N_FILES):
            expect = len(all_rows)
            _wait(
                lambda: _rows_consumed(q) >= expect,
                msg=f"consumption of file {i - 1}",
            )
            write_file(i, file_rows(i), t0 + i)
        _wait(lambda: _rows_consumed(q) >= len(all_rows), msg="last file")
        write_file(N_FILES, [(1, sentinel_base, 0.0)], t0 + N_FILES)

        def sink_complete():
            try:
                return (
                    spark.read.parquet(out)
                    .filter(F.col("session_start_ms") < sentinel_base)
                    .count()
                    == len(users) * N_FILES
                )
            except Exception:
                return False

        _wait(sink_complete, msg="all sessions closed in the sink")
        progresses = list(q.recentProgress)
    finally:
        q.stop()

    data_batches = [p for p in progresses if (p.numInputRows or 0) > 0]
    assert len(data_batches) >= N_FILES
    assert len({p.batchId for p in data_batches}) >= N_FILES

    got = (
        spark.read.parquet(out)
        .filter(F.col("session_start_ms") < sentinel_base)
        .collect()
    )
    keys = [(r["user_id"], r["session_start_ms"]) for r in got]
    assert len(keys) == len(set(keys)), "duplicate session emission"
    batch = sessionize(
        spark.createDataFrame(all_rows, schema), gap_minutes=gap_min
    )
    expect = {
        (r["user_id"], r["session_start_ms"]): (
            r["n_events"], r["duration_ms"], r["sum_value"]
        )
        for r in batch.filter(
            F.col("session_start_ms") < sentinel_base
        ).collect()
    }
    got_m = {
        (r["user_id"], r["session_start_ms"]): (
            r["n_events"], r["duration_ms"], r["sum_value"]
        )
        for r in got
    }
    assert got_m == expect

    max_state = max(
        (
            op.numRowsTotal
            for p in progresses
            for op in p.stateOperators
            if op.numRowsTotal is not None
        ),
        default=0,
    )
    bound = len(users) * 2 + 1  # open + not-yet-evicted per user + sentinel
    assert 0 < max_state <= bound, (
        f"session state peaked at {max_state}, bound {bound}"
    )


def test_stateful_rate_soak_live_triggers(spark, tmp_path):
    """Custom-state sibling (applyInPandasWithState): per-series rate
    state must chain ACROSS live triggers — the first point of each
    newly-landed file rates against the last point of the previous
    file through the state store, output equals the batch run over all
    input, and state stays at exactly one row per series."""
    from timely_spark.operators.rate import RateOptions
    from timely_spark.streaming.stateful_rate import streaming_rate

    src = tmp_path / "pts"
    src.mkdir()
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    schema = "metric string, ts long, value double, tags map<string,string>"

    def file_rows(i):
        # 3 points per series per file, ts strictly increasing ACROSS
        # files: the cross-file deltas only exist if state chains
        return [
            _pt(B + (i * 3 + j) * 10_000, (i * 3 + j) ** 2 + k, host)
            for j in range(3)
            for k, host in enumerate(SERIES)
        ]

    all_rows = []

    def write_file(idx, rows, mtime_s):
        _land_file(src, idx, rows, mtime_s, all_rows)

    t0 = time.time()
    write_file(0, file_rows(0), t0)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        streaming_rate(stream, RateOptions(interval_ms=1000))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        for i in range(1, N_FILES):
            expect = len(all_rows)
            _wait(
                lambda: _rows_consumed(q) >= expect,
                msg=f"consumption of file {i - 1}",
            )
            write_file(i, file_rows(i), t0 + i)

        # every point except each series' first produces a rate row
        n_expected = N_FILES * 3 * len(SERIES) - len(SERIES)

        def sink_complete():
            try:
                return spark.read.parquet(out).count() == n_expected
            except Exception:
                return False

        _wait(sink_complete, msg="all rate rows in the sink")
        progresses = list(q.recentProgress)
    finally:
        q.stop()

    data_batches = [p for p in progresses if (p.numInputRows or 0) > 0]
    assert len(data_batches) >= N_FILES
    assert len({p.batchId for p in data_batches}) >= N_FILES

    got = {
        (r["series_key"], r["ts"]): r["value"]
        for r in spark.read.parquet(out).collect()
    }
    assert len(got) == n_expected
    # batch parity vs the BATCH rate operator (the W1 reference shape)
    # — in particular the cross-FILE deltas must match, which only
    # happens if streaming state chained across triggers
    from timely_spark.model import series_id
    from timely_spark.operators.rate import rate

    batch_pts = spark.createDataFrame(
        [(r["metric"], r["ts"], r["value"], r["tags"]) for r in all_rows],
        schema,
    )
    expect = {
        (r["__series"], r["ts"]): r["value"]
        for r in rate(batch_pts, RateOptions(interval_ms=1000))
        .withColumn("__series", series_id())
        .collect()
    }
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert got[k] == pytest.approx(v, rel=1e-12)

    # custom state: exactly one state row per live series, at every
    # trigger that reported state
    state_counts = {
        op.numRowsTotal
        for p in progresses
        for op in p.stateOperators
        if op.numRowsTotal
    }
    assert state_counts and max(state_counts) == len(SERIES), state_counts


def test_cms_soak_live_triggers_state_sublinear(spark, tmp_path):
    """The CMS stream under live processing-time triggers, with the
    claim that matters measured: per-window streaming state is bounded
    by the SKETCH (depth x width counters), not by per-window item
    cardinality. Each file lands 50 DISTINCT users into its window; at
    depth=2 x width=8 the sketch caps a window's state at 16 rows, so
    item-linear state (>= 50/window) is cleanly distinguishable from
    sketch-bounded state. Also: >= N live data batches, and the final
    sink equals batch cms_partials per closed window (no loss/dup/
    late-drop across trigger boundaries)."""
    from timely_spark.operators.rollup import cms_partials
    from timely_spark.streaming.cms import cms_stream_query

    src = tmp_path / "items"
    src.mkdir()
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    schema = "ts long, item string"
    DEPTH, WIDTH = 2, 8
    N_USERS = 50

    def file_rows(i):
        base = BA + i * 60_000
        rows = []
        for u in range(N_USERS):
            for rep in range(1 + (u + i) % 3):
                rows.append(
                    {"ts": base + (u * 997 + rep * 13) % 59_000,
                     "item": f"user{i}_{u}"}
                )
        return rows

    all_rows = []

    def write_file(idx, rows, mtime_s):
        _land_file(src, idx, rows, mtime_s, all_rows)

    t0 = time.time()
    write_file(0, file_rows(0), t0)

    q = cms_stream_query(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src)),
        "item",
        window_seconds=60,
        checkpoint=ck,
        out_path=out,
        watermark_seconds=10,
        depth=DEPTH,
        width=WIDTH,
        processing_time="500 milliseconds",
    )
    try:
        for i in range(1, N_FILES):
            expect = len(all_rows)
            _wait(
                lambda: _rows_consumed(q) >= expect,
                msg=f"consumption of file {i - 1}",
            )
            write_file(i, file_rows(i), t0 + i)

        _wait(lambda: _rows_consumed(q) >= len(all_rows), msg="last file")
        write_file(
            N_FILES,
            [{"ts": BA + (N_FILES + 10) * 60_000, "item": "sentinel"}],
            t0 + N_FILES,
        )

        def sink_complete():
            try:
                return (
                    spark.read.parquet(out)
                    .filter(F.col("bucket_ts") < BA + N_FILES * 60_000)
                    .select("bucket_ts")
                    .distinct()
                    .count()
                    == N_FILES
                )
            except Exception:
                return False

        _wait(sink_complete, msg="all windows closed in the sink")
        progresses = list(q.recentProgress)
    finally:
        q.stop()

    # 1. live multi-trigger consumption
    data_batches = [p for p in progresses if (p.numInputRows or 0) > 0]
    assert len(data_batches) >= N_FILES
    assert len({p.batchId for p in data_batches}) >= N_FILES

    # 2. sink == batch sketch per closed window (counter addition across
    #    micro-batch state folds exactly)
    sink = (
        spark.read.parquet(out)
        .filter(F.col("bucket_ts") < BA + N_FILES * 60_000)
        .groupBy("bucket_ts", "d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    got = {}
    for r in sink:
        got.setdefault(r["bucket_ts"], set()).add(
            (r["d"], r["bucket"], r["cnt"])
        )
    assert len(got) == N_FILES
    allpts = spark.createDataFrame(
        [(r["ts"], r["item"]) for r in all_rows], schema
    )
    for w, rows in got.items():
        items = allpts.filter((F.col("ts") - F.col("ts") % 60_000) == w)
        want = {
            tuple(r)
            for r in cms_partials(items, "item", DEPTH, WIDTH).collect()
        }
        assert rows == want, f"window {w} sketch diverges"

    # 3. the point of the operator: state stays sketch-bounded while
    #    per-window item cardinality (50) is far above the cap (16)
    max_state = max(
        (
            op.numRowsTotal
            for p in progresses
            for op in p.stateOperators
            if op.numRowsTotal is not None
        ),
        default=0,
    )
    open_windows_bound = 3  # in-fill + not-yet-evicted + sentinel
    cap = open_windows_bound * DEPTH * WIDTH
    assert 0 < max_state <= cap, (
        f"state rows peaked at {max_state}, sketch cap {cap}"
    )
    assert max_state < N_USERS, (
        f"state ({max_state}) reached item-linear scale — the sketch "
        "bound is not holding"
    )
