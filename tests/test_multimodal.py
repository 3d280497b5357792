"""Multimodal plumbing tests: schema, Arrow batching, per-kind routing,
the REAL in-container codecs (BMP, PNG, baseline JPEG, PCM WAV, MP3
frame headers, MP4 boxes), and the remaining clearly-marked stubs
(audio/video codec-payload decode)."""

import pytest

from timely_spark.operators.multimodal import (
    _decode_bmp,
    _decode_wav,
    extract_audio_features,
    extract_image_features,
    make_bmp,
    make_wav,
    sample_video_frames,
    synthetic_media,
)


def test_bmp_decode_roundtrip():
    """Real codec: dimensions/channels from the header, luma/aHash from
    the pixel array."""
    w, h, ch, luma, phash, _dct = _decode_bmp(make_bmp(37, 21, seed=7))
    assert (w, h, ch) == (37, 21, 3)
    assert 0.0 <= luma <= 1.0
    # deterministic + discriminating
    assert _decode_bmp(make_bmp(37, 21, seed=7))[4] == phash
    assert _decode_bmp(make_bmp(37, 21, seed=8))[4] != phash


def test_wav_decode_roundtrip():
    """Real codec: header fields + PCM RMS (0.5-amplitude sine ->
    RMS = 0.5/sqrt(2))."""
    dur, rate, ch, rms = _decode_wav(make_wav(0.5, sample_rate=16_000, freq=440.0))
    assert rate == 16_000 and ch == 1
    assert abs(dur - 0.5) < 1e-6
    assert abs(rms - 0.5 / 2**0.5) < 0.01


def test_image_features_real_decode(spark):
    """media_features real path: BMP payloads decode distributed via
    mapInPandas with no stub in the loop (VERDICT r2 item #8)."""
    media = synthetic_media(spark, n=12)  # kinds cycle image/audio/video
    rows = {r["media_id"]: r for r in extract_image_features(media).collect()}
    assert set(rows) == {i for i in range(12) if i % 3 == 0}
    for i, r in rows.items():
        assert r["width"] == 16 + i % 48 and r["height"] == 16 + (i * 3) % 48
        assert r["channels"] == 3 and 0.0 <= r["mean_luma"] <= 1.0
    # deterministic: same payload bytes -> same features
    again = {r["media_id"]: r for r in extract_image_features(media).collect()}
    assert again == rows


def test_audio_features_real_decode(spark):
    """Audio rows alternate PCM WAV (full decode incl. RMS) and MPEG
    Layer III (real frame-header walk: duration/rate/channels; RMS null
    — sample decode is the labeled stub)."""
    media = synthetic_media(spark, n=12)
    feats = extract_audio_features(media).collect()
    audio_ids = {r["media_id"] for r in feats}
    assert audio_ids == {i for i in range(12) if i % 3 == 1}
    for r in feats:
        i = r["media_id"]
        if (i // 3) % 2 == 1:  # MP3 rows
            assert r["sample_rate"] == (44100, 48000, 32000)[i % 3]
            assert r["channels"] == 2
            target = 0.2 + (i % 5) / 10.0
            # duration quantizes to whole 1152-sample frames
            assert abs(r["duration_s"] - target) < 1152 / r["sample_rate"]
            assert r["rms"] is None  # NaN -> Arrow null on the pandas boundary
        else:  # WAV rows
            assert r["sample_rate"] == 8000 + 1000 * (i % 3)
            assert r["channels"] == 1
            expected_dur = (
                int((0.05 + (i % 10) / 100.0) * r["sample_rate"]) / r["sample_rate"]
            )
            assert abs(r["duration_s"] - expected_dur) < 1e-9
            assert abs(r["rms"] - 0.5 / 2**0.5) < 0.02


def test_mp3_parser_shapes():
    """Frame-accurate duration, resync past garbage, ID3 skip
    (public MPEG framing rules)."""
    from timely_spark.operators.multimodal import _decode_mp3, make_mp3

    dur, rate, ch, rms = _decode_mp3(make_mp3(3.0))
    assert rate == 44100 and ch == 2
    assert abs(dur - 3.0) < 1152 / 44100
    # mono, MPEG1 32 kHz, no ID3, junk prefix: parser must resync
    raw = b"\x01\x02junk" + make_mp3(1.0, sample_rate=32000,
                                     bitrate_kbps=64, channels=1, id3=False)
    dur, rate, ch, _ = _decode_mp3(raw)
    assert rate == 32000 and ch == 1 and abs(dur - 1.0) < 1152 / 32000
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        _decode_mp3(b"\x00" * 64)


def test_mp4_parser_and_real_frame_sampling(spark):
    """MP4 metadata comes from the true moov boxes; sample_video_frames
    derives the frame timeline from the real container duration with a
    null (stubbed) pixel payload."""
    from timely_spark.operators.multimodal import _decode_mp4_meta, make_mp4

    meta = _decode_mp4_meta(make_mp4(12.5, width=1280, height=720,
                                     codec=b"hvc1", n_samples=300))
    assert meta["duration_s"] == 12.5
    assert (meta["width"], meta["height"]) == (1280, 720)
    assert meta["codecs"] == ["hvc1"] and meta["n_samples"] == 300

    media = synthetic_media(spark, n=12)
    frames = sample_video_frames(media, every_n_seconds=1.0).collect()
    by_id = {}
    for f in frames:
        by_id.setdefault(f["media_id"], []).append(f)
    for i in (2, 8):  # MP4 rows: duration 1 + i % 7 s, stubbed pixels
        assert all(f["frame_payload"] is None for f in by_id[i])
        assert len(by_id[i]) == 1 + i % 7
        assert [f["ts_s"] for f in sorted(by_id[i], key=lambda x: x["frame_idx"])] == [
            float(j) for j in range(1 + i % 7)
        ]
    for i in (5, 11):  # AVI/MJPEG rows: REAL frame payloads
        n_frames = 4 + i % 5
        assert len(by_id[i]) == -(-n_frames // 4)  # 4 fps sampled at 1 s
        assert all(f["frame_payload"][:2] == b"\xff\xd8" for f in by_id[i])


def test_fake_decode_still_available(spark):
    """fake=True keeps exercising the plumbing for formats without an
    in-container codec."""
    media = synthetic_media(spark, n=12, real=False)
    rows = {r["media_id"]: r for r in extract_image_features(media, fake=True).collect()}
    assert set(rows) == {i for i in range(12) if i % 3 == 0}
    r0 = rows[0]
    assert 64 <= r0["width"] <= 255 and 64 <= r0["height"] <= 255
    assert r0["channels"] == 3 and 0.0 <= r0["mean_luma"] <= 1.0


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


def test_compressed_decode_is_explicitly_stubbed(spark):
    """Non-BMP image payloads still fail loudly without fake=True."""
    media = synthetic_media(spark, n=3, real=False)
    with pytest.raises(Exception) as ei:
        extract_image_features(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_png_decode_roundtrip():
    """Real PNG decode (stdlib zlib + filter reversal): exact dimensions
    and channels per color type; luma matches the seeded ground-truth
    pixels bit-exactly (the codec path is lossless); every filter type
    0-4 is exercised (make_png cycles them per scanline)."""
    import numpy as np

    from timely_spark.operators.multimodal import _decode_png, make_png

    for color_type, n_ch in [(0, 1), (2, 3), (6, 4)]:
        w, h, ch, luma, phash, _dct = _decode_png(
            make_png(23, 17, seed=11, color_type=color_type)
        )
        assert (w, h, ch) == (23, 17, n_ch)
        # ground truth straight from the generator's rng
        px = np.random.default_rng(11).integers(
            0, 256, size=(17, 23, n_ch), dtype=np.uint8
        ).astype("float64")
        if n_ch == 1:
            want = px[..., 0]
        else:
            want = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
        assert abs(luma - float(want.mean()) / 255.0) < 1e-12
    # deterministic + discriminating fingerprint
    assert (
        _decode_png(make_png(23, 17, seed=11))[4]
        == _decode_png(make_png(23, 17, seed=11))[4]
    )
    assert (
        _decode_png(make_png(23, 17, seed=11))[4]
        != _decode_png(make_png(23, 17, seed=12))[4]
    )
    # unfiltered and filtered encodings of the SAME pixels decode equal
    assert _decode_png(make_png(23, 17, seed=11, filters=False)) == _decode_png(
        make_png(23, 17, seed=11, filters=True)
    )


def test_png_unsupported_variants_are_loud():
    import struct
    import zlib

    import pytest

    from timely_spark.operators.multimodal import _PNG_SIG, _decode_png

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    # 16-bit depth
    ihdr16 = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    p = _PNG_SIG + chunk(b"IHDR", ihdr16) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="depth=16"):
        _decode_png(p)
    # palette color type
    ihdr_pal = struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)
    p = _PNG_SIG + chunk(b"IHDR", ihdr_pal) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="color_type=3"):
        _decode_png(p)


def test_image_features_mixed_bmp_png_jpeg(spark):
    """synthetic_media cycles BMP / PNG / baseline-JPEG / GIF image rows;
    the feature extractor dispatches per payload and decodes ALL for
    real."""
    from timely_spark.operators.multimodal import (
        extract_image_features,
        synthetic_media,
    )

    media = synthetic_media(spark, n=30)
    mimes = {
        r["media_id"]: r["mime"]
        for r in media.filter("kind = 'image'").select("media_id", "mime").collect()
    }
    assert set(mimes.values()) == {
        "image/bmp", "image/png", "image/jpeg", "image/gif"
    }
    rows = extract_image_features(media).collect()
    assert len(rows) == len(mimes)
    for r in rows:
        i = r["media_id"]
        assert (r["width"], r["height"]) == (16 + i % 48, 16 + (i * 3) % 48)
        assert 0.0 <= r["mean_luma"] <= 1.0


def test_jpeg_codec_roundtrip_and_real_world_variants():
    """The baseline JPEG decoder reconstructs the luma plane to within
    quantization error across gray / 4:4:4 / 4:2:0 and restart-marker
    streams, and rejects progressive scans loudly. Encoder and decoder
    share only constant tables, so the roundtrip crosses two independent
    T.81 implementations."""
    import numpy as np
    import pytest

    from timely_spark.operators.jpeg import decode_jpeg_luma, encode_jpeg

    yy, xx = np.mgrid[0:41, 0:57].astype(np.float64)
    img = (128 + 80 * np.sin(xx / 9.0) + 40 * np.cos(yy / 7.0)).clip(0, 255)
    rgb = np.stack([img, img * 0.8, img * 0.5], axis=-1).astype(np.uint8)
    src = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    for sub in ("444", "420"):
        for ri in (0, 3):
            w, h, nc, luma = decode_jpeg_luma(
                encode_jpeg(rgb, subsampling=sub, restart_interval=ri)
            )
            assert (w, h, nc) == (57, 41, 3)
            assert float(np.abs(luma - src).mean()) < 3.0
    w, h, nc, luma = decode_jpeg_luma(
        encode_jpeg(img.astype(np.uint8), subsampling="gray")
    )
    assert (w, h, nc) == (57, 41, 1)
    assert float(np.abs(luma - img).mean()) < 3.0
    # progressive (SOF2) is the labeled out-of-scope variant
    data = bytearray(encode_jpeg(rgb))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg_luma(bytes(data))


def test_jpeg_codec_property_random_images():
    """Property test: arbitrary dimensions (1..25), content, and
    subsampling modes roundtrip with dims exact and mean luma within
    aggressive-quantization tolerance."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from timely_spark.operators.jpeg import decode_jpeg_luma, encode_jpeg

    @settings(max_examples=15, deadline=None)
    @given(
        w=st.integers(1, 25),
        h=st.integers(1, 25),
        seed=st.integers(0, 2**31 - 1),
        sub=st.sampled_from(["gray", "444", "420"]),
        smooth=st.booleans(),
    )
    def check(w, h, seed, sub, smooth):
        rng = np.random.default_rng(seed)
        if smooth:
            yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
            img = (128 + 70 * np.sin(xx / 9.0 + seed % 7)
                   + 40 * np.cos(yy / 6.0)).clip(0, 255)
        else:
            img = rng.integers(0, 256, (h, w)).astype(np.float64)
        if sub == "gray":
            arr = img.astype(np.uint8)
            src = img
        else:
            rgb = np.stack([img, img * 0.7 + 20, img * 0.5 + 40], -1)
            arr = rgb.clip(0, 255).astype(np.uint8)
            src = (0.299 * arr[..., 0] + 0.587 * arr[..., 1]
                   + 0.114 * arr[..., 2])
        W, H, nc, luma = decode_jpeg_luma(encode_jpeg(arr, subsampling=sub))
        assert (W, H) == (w, h)
        assert nc == (1 if sub == "gray" else 3)
        # mean luma survives quantization — statistically: per-pixel
        # quantization error ~N(0, sigma), so the MEAN error shrinks as
        # 1/sqrt(n_px); tiny images keep a proportionally wider band
        assert abs(float(luma.mean()) - float(src.mean())) < 3.0 + 12.0 / (w * h) ** 0.5
        tol = 6.0 if smooth else 40.0  # random noise loses high freq
        assert float(np.abs(luma - src).mean()) < tol

    check()


def test_media_near_dup_pairs_planted(spark):
    """aHash Hamming blocking over real BMP decodes: each perturbed copy
    pairs with exactly its original; distinct images don't pair."""
    import __spark_entry__ as e

    pairs = {(r["id_a"], r["id_b"]) for r in
             e.q_media_near_dup(spark, "/root/testdata/sf0.001").collect()}
    assert pairs == {(i, 1000 + i) for i in range(24) if i % 4 == 0}


def test_media_caption_dedup_composition(spark):
    """Media->documents composition: the near-dup loser of each planted
    image pair (2k, 2k+1) kills its caption doc; survivors are exactly
    the even doc_ids < 48, rolled up per source."""
    import duckdb

    import __spark_entry__ as e

    got = {
        (r["source"], r["n_kept_docs"], r["first_kept_id"])
        for r in e.q_media_caption_dedup(spark, "/root/testdata/sf0.01").collect()
    }
    want = {
        tuple(r)
        for r in duckdb.sql(
            "SELECT source, count(*) AS n, min(doc_id) AS f "
            "FROM '/root/testdata/sf0.01/documents.parquet' "
            "WHERE doc_id < 48 AND doc_id % 2 = 0 GROUP BY source"
        ).fetchall()
    }
    assert got == want and got


def test_avi_mjpeg_container_roundtrip():
    """make_avi_mjpeg -> _decode_avi: dims, fps, frame count and
    handler survive; every frame payload is a decodable baseline JPEG
    of the advertised dimensions."""
    from timely_spark.operators.multimodal import (
        _decode_avi,
        _decode_jpeg,
        make_avi_mjpeg,
    )

    payload = make_avi_mjpeg(n_frames=6, width=48, height=32, fps=4.0, seed=3)
    meta = _decode_avi(payload)
    assert meta["width"] == 48 and meta["height"] == 32
    assert meta["n_frames"] == 6 and len(meta["frames"]) == 6
    assert abs(meta["fps"] - 4.0) < 1e-6
    assert abs(meta["duration_s"] - 1.5) < 1e-6
    assert meta["handler"] == "MJPG"
    for f in meta["frames"]:
        w, h, _c, luma, _p, _d = _decode_jpeg(f)
        assert (w, h) == (48, 32) and 0.0 < luma < 1.0


def test_avi_real_frame_sampling_and_hashes(spark):
    """sample_video_frames returns REAL JPEG payloads for AVI rows
    (unlike MP4's labeled null stub); video_frame_hashes aHashes them
    through the real decoder."""
    from timely_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        make_avi_mjpeg,
        make_mp4,
        sample_video_frames,
        video_frame_hashes,
    )

    rows = [
        (0, "video", "video/x-msvideo", make_avi_mjpeg(8, fps=4.0, seed=1), None),
        (1, "video", "video/mp4", make_mp4(2.0), None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    frames = sample_video_frames(media, every_n_seconds=0.5).collect()
    avi = [r for r in frames if r["media_id"] == 0]
    mp4 = [r for r in frames if r["media_id"] == 1]
    assert len(avi) == 4  # 8 frames at 4 fps, every 0.5 s => step 2
    assert all(r["frame_payload"] is not None for r in avi)
    assert mp4 and all(r["frame_payload"] is None for r in mp4)
    hashes = video_frame_hashes(media, every_n_seconds=0.5).collect()
    assert {r["media_id"] for r in hashes} == {0}  # stub rows dropped
    assert len(hashes) == 4 and all(isinstance(r["phash"], int) for r in hashes)


def test_video_near_dups_planted(spark):
    """A brightness-shifted re-encode pairs with its original on >= 2
    shared sampled frames; unrelated videos never pair."""
    from timely_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        make_avi_mjpeg,
        video_near_dups,
    )

    rows = [
        (0, "video", "video/x-msvideo", make_avi_mjpeg(6, fps=2.0, seed=5), None),
        # near-dup: same frames, +6 luma re-encode
        (1, "video", "video/x-msvideo",
         make_avi_mjpeg(6, fps=2.0, seed=5, luma_shift=6), None),
        # unrelated content
        (2, "video", "video/x-msvideo", make_avi_mjpeg(6, fps=2.0, seed=91), None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = {
        (r["id_a"], r["id_b"]): r["shared_frames"]
        for r in video_near_dups(media, every_n_seconds=0.5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2
    assert all(2 not in p for p in pairs)


def test_dct_phash_robustness():
    """The DCT perceptual hash contract: bit-identical under brightness
    shift and contrast scaling (exactly, and under the clipping a real
    brightened/crunched copy suffers), near-identical under per-pixel
    noise, and far apart for genuinely different images."""
    import numpy as np

    from timely_spark.operators.multimodal import _dct_phash, _luma_stats

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    yy, xx = np.indices((64, 64)).astype(float)
    tex = 60 * np.sin(xx / 6.0) * np.cos(yy / 9.0) + 25 * np.sin((xx + yy) / 4.0)
    luma = np.clip(128 + tex, 0, 255)
    base = _dct_phash(luma)

    assert _dct_phash(luma + 17.0) == base              # brightness shift
    assert _dct_phash(luma * 1.2) == base               # contrast scale
    assert _dct_phash(np.clip(luma + 45.0, 0, 255)) == base   # clipped lift
    assert _dct_phash(np.clip((luma - 128) * 1.6 + 128, 0, 255)) == base

    # deterministic +-8 per-pixel noise: broadband, low-freq corner safe
    pix = (yy * 64 + xx).astype(np.int64)
    lcg = (pix * 6364136223846793005 + 1442695040888963407) % (1 << 63)
    noise = (lcg % 17).astype(float) - 8.0
    _, _a, d1 = _luma_stats(np.clip(luma + noise, 0, 255))
    assert ham(base, d1) <= 2

    other = np.clip(128 + 60 * np.cos(xx / 4.0) * np.sin(yy / 5.0), 0, 255)
    assert ham(base, _dct_phash(other)) > 16  # distinct content separates


def test_dct_phash_catches_brightened_copy(spark):
    """End-to-end: a brightness-lifted (clipping) BMP copy pairs with
    its original through hamming_near_dups on dct_phash at a threshold
    where the aHash column misses it — the complementary-hash payoff."""
    import struct

    from timely_spark.operators.dedup import hamming_near_dups
    from timely_spark.operators.multimodal import make_bmp

    def brighten(b, d):
        pix_off = struct.unpack_from("<I", b, 10)[0]
        arr = bytearray(b)
        for i in range(pix_off, len(b)):
            arr[i] = min(255, arr[i] + d)
        return bytes(arr)

    from timely_spark.operators.multimodal import extract_image_features

    orig = make_bmp(48, 32, seed=3)
    rows = [
        (1, "image", "image/bmp", orig, None),
        (2, "image", "image/bmp", brighten(orig, 30), None),
        (3, "image", "image/bmp", make_bmp(48, 32, seed=9), None),
    ]
    from timely_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_image_features(media)
    via_dct = {
        (r["id_a"], r["id_b"])
        for r in hamming_near_dups(
            feats.select("media_id", "dct_phash"), "dct_phash",
            id_col="media_id", max_hamming=3,
        ).collect()
    }
    via_ahash = {
        (r["id_a"], r["id_b"])
        for r in hamming_near_dups(
            feats.select("media_id", "phash"), "phash",
            id_col="media_id", max_hamming=3,
        ).collect()
    }
    assert via_dct == {(1, 2)}      # brightened copy caught, stranger not
    assert (1, 2) not in via_ahash  # aHash drifts past the threshold


def test_container_parser_corruption_tolerance():
    """MP4 and AVI container parsers terminate cleanly on truncated or
    bit-flipped inputs — only the documented error types escape, and
    truncated RIFF frame chunks are dropped (complete chunks only),
    never surfaced as half payloads."""
    import random

    from timely_spark.operators.multimodal import (
        _decode_avi,
        _decode_mp4_meta,
        make_avi_mjpeg,
        make_mp4,
    )

    mp4 = make_mp4(5.0)
    avi = make_avi_mjpeg(n_frames=4)
    for payload, decode in ((mp4, _decode_mp4_meta), (avi, _decode_avi)):
        for cut in (0, 4, 8, 20, len(payload) // 3, len(payload) // 2,
                    len(payload) - 3):
            try:
                meta = decode(payload[:cut])
            except (NotImplementedError, ValueError):
                continue  # documented rejection paths
            # if it parses, every surfaced frame must be COMPLETE bytes
            for f in meta.get("frames", []):
                assert f[:2] == b"\xff\xd8" and f[-2:] == b"\xff\xd9"
    rnd = random.Random(11)
    for payload, decode in ((mp4, _decode_mp4_meta), (avi, _decode_avi)):
        for _ in range(150):
            b = bytearray(payload)
            for _ in range(3):
                b[rnd.randrange(len(b))] = rnd.randrange(256)
            try:
                decode(bytes(b))
            except (NotImplementedError, ValueError):
                pass  # clean rejection; anything else propagates = fail

    # crafted adversarial boxes the random flips can't reach: bodies
    # shorter than the fields their TYPE promises (outer size checks
    # pass, inner fixed-offset reads would run off the payload)
    import struct as _st

    ftyp = _st.pack(">I", 16) + b"ftypisom" + b"\x00" * 4
    crafted_mp4 = [
        ftyp + _st.pack(">I", 16) + b"mvhd" + b"\x00" * 8,  # short mvhd body
        ftyp + _st.pack(">I", 1) + b"moov",  # size==1, largesize truncated
        ftyp + _st.pack(">I", 16) + b"moov" + _st.pack(">I", 16) + b"stsz",
    ]
    for b in crafted_mp4:
        with pytest.raises((NotImplementedError, ValueError)):
            _decode_mp4_meta(b)
    avih_short = (b"RIFF" + _st.pack("<I", 24) + b"AVI "
                  + b"avih" + _st.pack("<I", 8) + b"\x00" * 8)
    with pytest.raises((NotImplementedError, ValueError)):
        _decode_avi(avih_short)


def _melody_wav(freqs, amp=0.6, rate=16000, note_s=0.25, trim_s=0.0):
    import io
    import wave

    import numpy as np

    x = np.concatenate(
        [amp * np.sin(2 * np.pi * f * np.arange(int(note_s * rate)) / rate)
         for f in freqs]
    )
    if trim_s:
        x = x[int(trim_s * rate):]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((x * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def test_audio_near_dups_planted(spark):
    """Spectral-landmark audio near-dup: an amplitude-scaled copy and a
    front-trimmed copy both align with the original (offset consensus
    absorbs the trim), while a different melody never pairs."""
    from timely_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_near_dups,
    )

    m1 = [440, 523, 659, 784, 659, 523, 440, 880]
    m2 = [330, 392, 494, 587, 494, 392, 330, 660]
    rows = [
        (1, "audio", "audio/wav", _melody_wav(m1), None),
        (2, "audio", "audio/wav", _melody_wav(m1, amp=0.2), None),   # scaled
        (3, "audio", "audio/wav", _melody_wav(m1, trim_s=0.1), None),  # trimmed
        (4, "audio", "audio/wav", _melody_wav(m2), None),            # different
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        (r["id_a"], r["id_b"]): r
        for r in audio_near_dups(media, min_matches=8).collect()
    }
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    assert got[(1, 2)]["offset_frames"] == 0   # same timeline
    assert got[(1, 3)]["offset_frames"] > 0    # trimmed copy lags
    # deterministic end to end
    again = {
        (r["id_a"], r["id_b"])
        for r in audio_near_dups(media, min_matches=8).collect()
    }
    assert again == set(got)
    # fake mode (compressed-audio pipeline stub): byte-identical payloads
    # DO pair at the default threshold; distinct payloads don't
    fm = spark.createDataFrame(
        [(1, "audio", "x", b"same-bytes", None),
         (2, "audio", "x", b"same-bytes", None),
         (3, "audio", "x", b"other-bytes", None)],
        MEDIA_SCHEMA,
    )
    fpairs = {(r["id_a"], r["id_b"])
              for r in audio_near_dups(fm, fake=True).collect()}
    assert fpairs == {(1, 2)}


def test_audio_fingerprints_mixed_wav_mp3_corpus(spark):
    """VERDICT r5 item #9: the fingerprint path consumes a MIXED WAV/MP3
    corpus in one pass — WAV rows carry real spectral tokens, MP3 rows
    carry their REAL duration-aligned frame grid (header-walk duration x
    true sample rate, same 1024/512 landmark grid) with NULL tokens (the
    filterbank payload decode is permanent-scope stub, COVERAGE.md), and
    near-dup matching still pairs the WAV copies while never crashing on
    or falsely matching the MP3 rows."""
    from timely_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_fingerprints,
        audio_near_dups,
        make_mp3,
    )

    m1 = [440, 523, 659, 784, 659, 523, 440, 880]
    mp3 = make_mp3(2.0, sample_rate=44100)
    rows = [
        (1, "audio", "audio/wav", _melody_wav(m1), None),
        (2, "audio", "audio/wav", _melody_wav(m1, amp=0.5), None),
        (3, "audio", "audio/mpeg", mp3, None),
        (4, "audio", "audio/mpeg", make_mp3(1.0, id3=False), None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    fp = audio_fingerprints(media).collect()
    by_id = {}
    for r in fp:
        by_id.setdefault(r["media_id"], []).append(r)
    # WAV rows: real non-null tokens
    assert all(r["fp_hash"] is not None for r in by_id[1] + by_id[2])
    # MP3 rows: null tokens on the real frame grid — pair tokens at
    # consecutive-frame boundaries of duration_s * rate samples
    from timely_spark.operators.multimodal import _decode_mp3

    for mid, payload in ((3, rows[2][3]), (4, rows[3][3])):
        # grid derives from the PARSED duration (MPEG frames round the
        # requested duration up to a whole 1152-sample frame)
        dur, rate, _ch, _rms = _decode_mp3(payload)
        n_frames = (int(dur * rate) - 1024) // 512 + 1
        assert len(by_id[mid]) == n_frames - 1, mid
        assert all(r["fp_hash"] is None for r in by_id[mid])
        assert [r["frame_idx"] for r in sorted(by_id[mid], key=lambda r: r["frame_idx"])] \
            == list(range(n_frames - 1))
    # near-dup over the mixed corpus: the WAV pair matches; MP3 rows
    # appear in no pair (null tokens join nothing)
    pairs = {(r["id_a"], r["id_b"])
             for r in audio_near_dups(media, min_matches=8).collect()}
    assert pairs == {(1, 2)}


def test_gif_decode_roundtrip():
    """From-scratch GIF87a/89a decode: pinned palette+indices decode to
    EXACT pixel values (independent LZW encoder vs decoder); seeded
    fixtures round-trip across shapes spanning every LZW code width;
    interlaced frames stay the labeled stub."""
    from timely_spark.operators.multimodal import _decode_gif, make_gif

    # pixel-exact: black/white checker, 4x2, known mean luma
    # 4-entry table (the spec's 2-bit LZW floor); colors 2-3 unused
    pal = bytes([0, 0, 0, 255, 255, 255, 0, 0, 0, 0, 0, 0])
    idx = [0, 1, 1, 0, 1, 0, 0, 1]
    w, h, ch, ml, _p, _d = _decode_gif(
        make_gif(4, 2, n_colors=2, palette=pal, indices=idx)
    )
    assert (w, h, ch) == (4, 2, 3)
    assert ml == pytest.approx(0.5)  # half the pixels white

    for seed in range(3):
        for shape in ((1, 1), (7, 5), (64, 64), (120, 90)):
            out = _decode_gif(make_gif(*shape, seed=seed))
            assert (out[0], out[1]) == shape
    # deterministic; different seeds diverge
    a = _decode_gif(make_gif(32, 32, seed=1))
    assert a == _decode_gif(make_gif(32, 32, seed=1))
    assert a[4] != _decode_gif(make_gif(32, 32, seed=2))[4]

    # interlace flag: labeled NotImplementedError
    g = bytearray(make_gif(8, 8, seed=0))
    desc = g.index(0x2C, 13)
    g[desc + 9] |= 0x40
    with pytest.raises(NotImplementedError, match="interlaced"):
        _decode_gif(bytes(g))

    # truncated pixel data: clean rejection
    full = make_gif(32, 32, seed=3)
    with pytest.raises(ValueError):
        _decode_gif(full[: len(full) // 2])

    # out-of-range color-table reference: rejected, never wrapped
    # (ADVICE r5: the old `% len(ct)` silently accepted corrupt indices).
    # Build an 8-color GIF whose pixels use indices 4..7, then shrink the
    # declared GCT to 4 entries and splice out the now-unclaimed palette
    # bytes so parsing stays aligned — the LZW stream still decodes
    # (min_code=3 roots cover 0..7) but indices 4..7 exceed the table.
    g8 = bytearray(make_gif(8, 1, n_colors=8,
                            indices=[0, 1, 2, 3, 4, 5, 6, 7]))
    assert g8[10] & 0x07 == 2  # 2^(2+1) = 8-entry GCT
    g8[10] = (g8[10] & ~0x07) | 0x01  # declare 4 entries instead
    del g8[13 + 4 * 3 : 13 + 8 * 3]  # drop palette entries 4..7
    with pytest.raises(ValueError, match="out of range"):
        _decode_gif(bytes(g8))


def test_gif_through_image_features(spark):
    """GIF payloads flow through extract_image_features next to
    BMP/PNG/JPEG — same schema, real decode."""
    from timely_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_image_features,
        make_gif,
    )

    media = spark.createDataFrame(
        [(1, "image", "image/gif", make_gif(24, 16, seed=5), None)],
        MEDIA_SCHEMA,
    )
    r = extract_image_features(media).collect()[0]
    assert (r["width"], r["height"], r["channels"]) == (24, 16, 3)
    assert r["phash"] is not None and r["dct_phash"] is not None
