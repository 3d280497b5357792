"""Multimodal plumbing tests: schema, Arrow batching, per-kind routing,
and the clearly-marked codec stubs (real decode libs absent here)."""

import pytest

from timely_spark.operators.multimodal import (
    extract_audio_features,
    extract_image_features,
    sample_video_frames,
    synthetic_media,
)


def test_image_features_schema_and_determinism(spark):
    media = synthetic_media(spark, n=12)
    feats = extract_image_features(media, fake=True)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 12
    r0 = rows[0]
    assert 64 <= r0["width"] <= 255 and 64 <= r0["height"] <= 255
    assert r0["channels"] == 3 and 0.0 <= r0["mean_luma"] <= 1.0
    # deterministic: same payload bytes -> same features
    again = {r["media_id"]: r for r in extract_image_features(media, fake=True).collect()}
    assert again == rows


def test_audio_features_routed_by_kind(spark):
    media = synthetic_media(spark, n=12)  # kinds cycle image/audio/video
    feats = extract_audio_features(media, fake=True).collect()
    audio_ids = {r["media_id"] for r in feats}
    assert audio_ids == {i for i in range(12) if i % 3 == 1}
    for r in feats:
        assert r["sample_rate"] in (8000, 16000, 44100, 48000)
        assert r["channels"] in (1, 2)
        assert 0.0 <= r["rms"] <= 1.0


def test_video_frame_sampling(spark):
    media = synthetic_media(spark, n=12)
    frames = sample_video_frames(media, every_n_seconds=1.0, fake=True).collect()
    by_id = {}
    for f in frames:
        by_id.setdefault(f["media_id"], []).append(f)
    assert set(by_id) == {i for i in range(12) if i % 3 == 2}
    for mid, fs in by_id.items():
        idxs = sorted(f["frame_idx"] for f in fs)
        assert idxs == list(range(len(fs)))  # dense frame indices
        assert all(f["ts_s"] == f["frame_idx"] * 1.0 for f in fs)


def test_real_decode_is_explicitly_stubbed(spark):
    media = synthetic_media(spark, n=3)
    with pytest.raises(Exception) as ei:
        extract_image_features(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
