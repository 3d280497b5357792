"""Pin lifecycle (VERDICT r12 item 1): eager localCheckpoint pins are
releasable deterministically, iterative operators unpersist superseded
pins in-loop, and re-running a pinned operator (plus releasing its
result) leaves ZERO new persisted RDDs."""

from __future__ import annotations

from pyspark.sql import functions as F

from timely_spark.pins import pin, release_pins, unpin


def _persisted_ids(spark) -> set[int]:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def test_pin_unpin_roundtrip(spark):
    """pin() registers exactly one persisted RDD; unpin() releases
    exactly it (synchronously when blocking)."""
    before = _persisted_ids(spark)
    df = pin(spark.range(100).selectExpr("id", "id * 2 AS y"))
    mid = _persisted_ids(spark)
    assert len(mid - before) == 1
    assert df.count() == 100  # readable while pinned
    assert unpin(df, blocking=True)
    assert _persisted_ids(spark) - before == set()
    # unpin on a non-pin frame is a harmless no-op
    assert not unpin(spark.range(3))


def test_release_pins_walks_derived_frames(spark):
    """release_pins() finds every LogicalRDD leaf under a derived frame
    — the caller-facing verb for operators returning lazy frames backed
    by internal pins."""
    before = _persisted_ids(spark)
    a = pin(spark.range(50).selectExpr("id", "id % 5 AS k"))
    b = pin(spark.range(50).selectExpr("id", "id % 3 AS j"))
    out = a.join(b, "id").groupBy("k").agg(F.sum("j").alias("s"))
    out.collect()  # consumer materializes first (the safety rule)
    assert release_pins(out, blocking=True) == 2
    assert _persisted_ids(spark) - before == set()


def test_connected_components_releases_superseded_pins(spark):
    """The iterative CC loop unpersists round N-1's pins after round N
    is pinned: a multi-round run holds at most ONE pin (the final
    labels) at return — not 2 + 2*rounds (VERDICT r12 items 1/7)."""
    from timely_spark.operators.dedup import connected_components

    # chain 0-1-2-...-9 forces several contraction rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long"
    )
    before = _persisted_ids(spark)
    cc = connected_components(pairs)
    held = _persisted_ids(spark) - before
    assert len(held) <= 1, (
        f"CC left {len(held)} pins — superseded per-round pins must be "
        "unpersisted in-loop"
    )
    rows = {(r["node"], r["cluster_id"]) for r in cc.collect()}
    assert rows == {(i, 0) for i in range(10)}
    release_pins(cc, blocking=True)
    assert _persisted_ids(spark) - before == set()


def test_rerun_pinned_operator_leaves_zero_new_rdds(spark):
    """VERDICT r12 item 1 'done' criterion: re-running a pinned operator
    twice, releasing each materialized result, leaves zero NEW persisted
    RDDs relative to the pre-run session state."""
    from timely_spark.operators.dedup import dedup_cluster_assignment

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(12)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a long, id_b long"
    )
    before = _persisted_ids(spark)
    for _ in range(2):
        out = dedup_cluster_assignment(docs, pairs)
        assert out.count() == 12
        release_pins(out, blocking=True)
    assert _persisted_ids(spark) - before == set()


def test_hamming_skips_redundant_pin_on_pin_backed_input(spark):
    """r13: when the caller already pinned the hashed projection (the
    video/caption operators share it across several joins),
    ``hamming_near_dups`` must NOT add a second pin — and the returned
    plan must contain zero Python stages (the decode pass ran exactly
    once, inside the caller's pin)."""
    from timely_spark.operators.dedup import hamming_near_dups
    from timely_spark.pins import pin, pin_backed, release_pins

    raw = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 1 << 40)], "doc_id long, h long"
    )
    # a parallelized local collection ALSO analyzes to a LogicalRDD
    # leaf but is NOT persisted — it must not count as pin-backed, or
    # operators skip the pin and re-run expensive lineage per consumer
    # (the media_near_dup plan-audit regression)
    assert not pin_backed(raw)
    hashed = pin(raw)
    assert pin_backed(hashed)
    before = _persisted_ids(spark)
    out = hamming_near_dups(hashed, "h", max_hamming=3)
    assert _persisted_ids(spark) - before == set(), (
        "hamming_near_dups re-pinned an already pin-backed input"
    )
    rows = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert rows == {(1, 2)}
    release_pins(hashed, blocking=True)


def test_video_near_dups_single_decode_evaluation(spark):
    """r13: video_near_dups' returned plan reads only the pinned frame
    hashes — zero MapInPandas/ArrowEval nodes, so the container-parse +
    JPEG-decode pipeline runs once per call instead of once per join."""
    from timely_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        make_avi_mjpeg,
        video_near_dups,
    )

    rows = [
        (0, "video", "video/x-msvideo",
         make_avi_mjpeg(3, width=32, height=24, fps=2.0, seed=5), None),
        (1000, "video", "video/x-msvideo",
         make_avi_mjpeg(3, width=32, height=24, fps=2.0, seed=5,
                        luma_shift=6), None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = video_near_dups(media, every_n_seconds=0.5, min_shared_frames=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "EvalPython" not in plan, plan
    assert {(r["id_a"], r["id_b"]) for r in out.collect()} == {(0, 1000)}
    release_pins(out, blocking=True)


def test_minhash_screen_single_batch_pass_and_releasable(spark):
    """r13: MinHashIndex.screen runs the batch tokenize/shingle/sign
    pass ONCE (both the banding and verify sides read the internal
    pin — no tokenizer expression left in the returned plan) and the
    pin is releasable via release_pins after the output materializes."""
    from timely_spark.operators.ann_index import MinHashIndex

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{k}" for k in range(20))) for i in range(8)],
        "doc_id long, text string",
    )
    idx = MinHashIndex.build(
        docs, threshold=0.5, num_hashes=64, bands=32
    ).materialize()
    batch = docs.withColumn("doc_id", F.col("doc_id") + 100)
    before = _persisted_ids(spark)
    out = idx.screen(batch)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "regexp_extract_all" not in plan, (
        "screen's returned plan re-runs the tokenize pass:\n" + plan
    )
    assert {(r["id_a"], r["id_b"]) for r in out.collect()} == {
        (i, i + 100) for i in range(8)
    }
    release_pins(out, blocking=True)
    assert _persisted_ids(spark) - before == set()
    idx.release()


def test_register_screen_batch_leaves_zero_pins(spark, tmp_path):
    """r13: each streaming history-dedup micro-batch computes its
    shingle pass once into a pin and releases EVERY pin before
    returning (VERDICT r12 item 1 'done' criterion for the loop)."""
    from timely_spark.streaming.dedup import register_screen_batch

    def rows(ids):
        return [(i, " ".join(f"t{i}z{k}" for k in range(25))) for i in ids]

    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    before = _persisted_ids(spark)
    for bid, ids in enumerate([range(5), range(10, 14)]):
        b = spark.createDataFrame(rows(ids), "doc_id long, text string")
        register_screen_batch(
            b, bid, index_path=idx, out_path=out, threshold=0.5,
            num_hashes=64, bands=32,
        )
        assert _persisted_ids(spark) - before == set(), (
            f"batch {bid} leaked pins"
        )
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == set(range(5)) | set(range(10, 14))
