"""Multimodal (image/audio/video) column plumbing.

Design: media payloads are opaque ``binary`` columns traveling with typed
metadata structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas`` so the Python cost is
amortized per batch, never per row. Partitioning: media rows are fat —
callers should ``repartition`` by a size-aware key so one task doesn't
inhale a skewed shard of large blobs.

Codecs: uncompressed BMP (24/32-bit BI_RGB), non-interlaced 8-bit
gray/RGB/RGBA PNG (stdlib zlib inflate + full filter reversal), baseline
JPEG (full T.81 Huffman entropy decode + inverse DCT of the luma plane,
see :mod:`.jpeg`), and PCM WAV all decode for REAL — numpy + stdlib, no
third-party codec library — including a real 8x8 average-hash perceptual
hash and PCM RMS. MPEG audio (MP3) and ISO BMFF (MP4) containers also
parse for REAL (frame-header walk / box walk: duration, rates,
dimensions, codec fourccs, sample counts); only audio/video codec
PAYLOAD decode (MP3 filterbank, H.264) and exotic image variants
(progressive JPEG, interlaced PNG) stay STUBBED behind
NotImplementedError unless ``fake=True``; the Spark-side plumbing is
identical either way.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("dct_phash", T.LongType(), True),
    ]
)


def _block_means(luma, n: int):
    """n x n block-mean downsample of a 2-D luma array (any size).

    Separable: reduce rows to (n, w) then columns to (n, n) — 2n slice
    means instead of n^2 (the 32x32 pHash grid would otherwise cost
    1024 Python-level slice ops per image)."""
    import numpy as np

    h, w = luma.shape
    ys = np.linspace(0, h, n + 1, dtype=int)
    xs = np.linspace(0, w, n + 1, dtype=int)
    rows = np.array(
        [luma[ys[i]:max(ys[i + 1], ys[i] + 1)].mean(axis=0) for i in range(n)]
    )
    return np.array(
        [rows[:, xs[j]:max(xs[j + 1], xs[j] + 1)].mean(axis=1) for j in range(n)]
    ).T


def _bits_to_i64(bits) -> int:
    """MSB-first bit vector -> signed 64-bit int (Spark LongType)."""
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


_DCT_MATRICES: dict[int, "object"] = {}


def _dct_matrix(n: int):
    """Orthonormal DCT-II matrix, cached per size (constant per call)."""
    import numpy as np

    D = _DCT_MATRICES.get(n)
    if D is None:
        k = np.arange(n)
        D = np.sqrt(2.0 / n) * np.cos(
            np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n)
        )
        D[0] = np.sqrt(1.0 / n)
        _DCT_MATRICES[n] = D
    return D


def _dct_phash(luma) -> int:
    """DCT perceptual hash: 32x32 block-mean downsample -> orthonormal
    2-D DCT-II -> low-frequency 8x8 corner minus the DC term -> each
    coefficient vs the block's MEDIAN -> 63 bits (top bit zero).

    Brightness shifts move only the DC term and contrast scaling
    multiplies coefficients AND their median uniformly, so the hash is
    invariant to both (and stays stable under the moderate highlight
    clipping a real brightened copy suffers); per-pixel noise spreads
    across the full spectrum, leaving the kept low-frequency corner
    nearly untouched. The standard complement to aHash in image-dedup
    toolchains — spectral shape instead of spatial block means."""
    import numpy as np

    n = 32
    blocks = _block_means(luma, n)
    D = _dct_matrix(n)
    C = D @ blocks @ D.T
    ac = C[:8, :8].flatten()[1:]  # 63 low-freq coefficients, DC dropped
    return _bits_to_i64(np.concatenate(([False], ac > np.median(ac))))


def _luma_stats(luma) -> tuple[float, int, int]:
    """Shared tail of every real image decode: normalized mean luma,
    the 8x8 average-hash (aHash) fingerprint, and the DCT perceptual
    hash, over a 2-D luma array in [0, 255]."""
    blocks = _block_means(luma, 8)
    mean_luma = float(luma.mean()) / 255.0
    bits = (blocks >= blocks.mean()).flatten()
    return mean_luma, _bits_to_i64(bits), _dct_phash(luma)


def _decode_bmp(payload: bytes) -> tuple[int, int, int, float, int, int]:
    """Real decode of an uncompressed BI_RGB BMP: dimensions from the
    BITMAPINFOHEADER, mean luma over the BGR(A) pixel array, and a real
    8x8 average-hash (aHash) perceptual fingerprint — stdlib + numpy
    only."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP variant bpp={bpp} compression={compression}")
    channels = bpp // 8
    # rows are bottom-up unless height is negative, padded to 4 bytes
    abs_h = abs(height)
    stride = (width * channels + 3) & ~3
    px = np.frombuffer(payload, dtype=np.uint8, count=stride * abs_h, offset=pix_off)
    px = px.reshape(abs_h, stride)[:, : width * channels].reshape(abs_h, width, channels)
    if height > 0:
        px = px[::-1]
    b, g, r = px[..., 0].astype(np.float64), px[..., 1].astype(np.float64), px[..., 2].astype(np.float64)
    luma = 0.114 * b + 0.587 * g + 0.299 * r
    mean_luma, phash, dct = _luma_stats(luma)
    return width, abs_h, channels, mean_luma, phash, dct


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, width: int, height: int, channels: int):
    """Reverse PNG per-scanline filtering (RFC 2083 §6): each row is a
    filter-type byte then width*channels filtered bytes. Types 0-4
    (None/Sub/Up/Average/Paeth) all supported."""
    import numpy as np

    rowbytes = width * channels
    if len(raw) < height * (rowbytes + 1):
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((height, rowbytes), dtype=np.uint8)
    prev = np.zeros(rowbytes, dtype=np.int32)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=rowbytes, offset=pos + 1).astype(np.int32)
        pos += rowbytes + 1
        if ftype == 0:  # None
            cur = row
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: horizontal recurrence
            cur = np.zeros(rowbytes, dtype=np.int32)
            for x in range(rowbytes):
                a = cur[x - channels] if x >= channels else 0  # left
                b = prev[x]  # up
                if ftype == 1:
                    cur[x] = (row[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (row[x] + ((a + b) >> 1)) & 0xFF
                else:  # Paeth predictor
                    c = prev[x - channels] if x >= channels else 0  # up-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (row[x] + pred) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(height, width, channels)


def _decode_png(payload: bytes) -> tuple[int, int, int, float, int, int]:
    """Real decode of a non-interlaced 8-bit gray/RGB/RGBA PNG using only
    stdlib zlib/struct + numpy: walk the chunk stream, inflate the
    concatenated IDAT data, reverse the per-scanline filters, then the
    same luma/aHash tail as BMP. Palette, 16-bit, and interlaced variants
    stay NotImplementedError (RFC 2083; no codec library needed)."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, b""
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack_from(">I", payload, pos), payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color_type, _comp, _filt, interlace = ihdr
    n_ch = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if depth != 8 or n_ch is None or interlace != 0:
        raise NotImplementedError(
            f"PNG variant depth={depth} color_type={color_type} "
            f"interlace={interlace} (only non-interlaced 8-bit gray/RGB/RGBA)"
        )
    px = _png_unfilter(zlib.decompress(idat), width, height, n_ch).astype("float64")
    if color_type in (0, 4):  # gray / gray+alpha
        luma = px[..., 0]
    else:  # RGB / RGBA (alpha ignored for luma, like the BMP path)
        luma = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    mean_luma, phash, dct = _luma_stats(luma)
    return width, height, n_ch, mean_luma, phash, dct


_GIF_SIGS = (b"GIF87a", b"GIF89a")


def _gif_lzw_decode(data: bytes, min_code_size: int, expect: int):
    """GIF-variant LZW decode (GIF89a spec appendix F): variable code
    width starting at min_code_size+1, clear/EOI codes, dictionary grows
    to 4096 entries. Returns exactly ``expect`` palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    # bit reader: LSB-first across the byte stream
    bitpos = 0
    total_bits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return eoi  # truncated stream: stop cleanly
        v = 0
        for i in range(width):
            byte = data[(bitpos + i) >> 3]
            v |= ((byte >> ((bitpos + i) & 7)) & 1) << i
        bitpos += width
        return v

    def reset():
        return {i: (i,) for i in range(clear)}, min_code_size + 1

    table, width = reset()
    prev: tuple[int, ...] | None = None
    next_code = eoi + 1
    while len(out) < expect:
        code = read_code(width)
        if code == clear:
            table, width = reset()
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif prev is not None and code == next_code:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF LZW stream: code {code}")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < expect:
        raise ValueError("truncated GIF pixel data")
    return out[:expect]


def _decode_gif(payload: bytes) -> tuple[int, int, int, float, int, int]:
    """Real decode of a non-interlaced GIF87a/89a first frame: logical
    screen descriptor, global/local color table, from-scratch LZW
    (variable code width, clear/EOI, KwKwK) — stdlib + numpy only, the
    same feature tail as BMP/PNG/JPEG. Interlaced frames stay a labeled
    NotImplementedError."""
    import struct

    import numpy as np

    if payload[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension block: skip sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos]:
                pos += payload[pos] + 1
            pos += 1
        elif b == 0x2C:  # image descriptor
            _l, _t, w, h, ip = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            ct = gct
            if ip & 0x80:  # local color table
                n = 2 << (ip & 0x07)
                ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ip & 0x40:
                raise NotImplementedError("interlaced GIF frames")
            if ct is None:
                raise ValueError("GIF frame without a color table")
            min_code = payload[pos]
            pos += 1
            chunks = []
            while pos < len(payload) and payload[pos]:
                ln = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + ln])
                pos += ln + 1
            idx = _gif_lzw_decode(b"".join(chunks), min_code, w * h)
            idx_arr = np.asarray(idx, dtype=np.int32)
            if idx_arr.size and int(idx_arr.max()) >= len(ct):
                # reject corrupt color-table references loudly (the old
                # `% len(ct)` wrap accepted them and produced arbitrary
                # luma/hashes — ADVICE r5), matching the BMP/PNG/MP4/AVI
                # corruption contract
                raise ValueError(
                    f"GIF pixel index {int(idx_arr.max())} out of range "
                    f"for {len(ct)}-entry color table"
                )
            px = ct[idx_arr].astype(np.float64)
            luma = (
                0.299 * px[:, 0] + 0.587 * px[:, 1] + 0.114 * px[:, 2]
            ).reshape(h, w)
            mean_luma, phash, dct = _luma_stats(luma)
            return int(w), int(h), 3, mean_luma, phash, dct
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("GIF without an image descriptor")


def _decode_jpeg(payload: bytes) -> tuple[int, int, int, float, int, int]:
    """Real decode of a baseline JPEG via :mod:`.jpeg` (pure numpy T.81
    Huffman + inverse DCT); features come off the reconstructed luma
    plane like the BMP/PNG paths."""
    from .jpeg import decode_jpeg_luma

    width, height, n_ch, luma = decode_jpeg_luma(payload)
    mean_luma, phash, dct = _luma_stats(luma)
    return width, height, n_ch, mean_luma, phash, dct


def _decode_wav(payload: bytes) -> tuple[float, int, int, float]:
    """Real decode of a PCM WAV: header via the stdlib ``wave`` module,
    RMS (normalized to [0, 1]) over the samples via numpy."""
    import io
    import wave

    import numpy as np

    x, rate, channels = _wav_samples(payload)
    duration = (len(x) // max(channels, 1)) / float(rate)
    rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
    return duration, rate, channels, rms


_MP3_BITRATES_V1 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_BITRATES_V2 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def _decode_mp3(payload: bytes) -> tuple[float, int, int, float]:
    """Real MPEG audio (Layer III) container parse — stdlib only.

    Walks the frame headers (11-bit sync, version/layer/bitrate/
    samplerate fields, per-frame length from the public MPEG framing
    formula), skipping a leading ID3v2 tag, and sums frames ×
    samples-per-frame / samplerate into the duration. Sample DECODE
    (hybrid filterbank) would need a codec library, so RMS is NaN
    (null after the Arrow boundary) — metadata is real, waveform
    analysis is the labeled stub."""
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        # synchsafe 28-bit tag size
        size = (
            (payload[6] & 0x7F) << 21
            | (payload[7] & 0x7F) << 14
            | (payload[8] & 0x7F) << 7
            | (payload[9] & 0x7F)
        )
        pos = 10 + size
    frames = 0
    duration = 0.0
    rate = 0
    channels = 0
    n = len(payload)
    while pos + 4 <= n:
        b0, b1, b2, b3 = payload[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            pos += 1  # resync (garbage between frames)
            continue
        version = (b1 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (b1 >> 1) & 0x3  # 1 = Layer III
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        if version == 1 or layer != 1 or br_idx in (0, 15) or sr_idx == 3:
            pos += 1
            continue
        padding = (b2 >> 1) & 0x1
        mode = (b3 >> 6) & 0x3
        rate = _MP3_RATES[version][sr_idx]
        channels = 1 if mode == 3 else 2
        if version == 3:
            bitrate = _MP3_BITRATES_V1[br_idx] * 1000
            samples, coeff = 1152, 144
        else:
            bitrate = _MP3_BITRATES_V2[br_idx] * 1000
            samples, coeff = 576, 72
        frame_len = coeff * bitrate // rate + padding
        if frame_len <= 4:
            pos += 1
            continue
        frames += 1
        duration += samples / rate
        pos += frame_len
    if frames == 0:
        raise NotImplementedError("no MPEG audio frames found")
    return duration, rate, channels, float("nan")


def _mp4_boxes(data: bytes, start: int, end: int):
    """Iterate (type, body_start, body_end) over ISO BMFF boxes."""
    import struct

    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return  # truncated largesize header
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            body = pos + 16
        elif size == 0:  # to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            return
        yield btype, body, pos + size
        pos += size


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _decode_mp4_meta(payload: bytes) -> dict:
    """Real MP4/ISO-BMFF container parse — stdlib struct only.

    Walks ftyp/moov boxes for duration (mvhd timescale+duration),
    presentation width/height (tkhd 16.16 fixed point), per-track
    sample-entry codec fourccs (stsd), and sample count (stsz). Pixel
    DECODE of the codec payload (H.264 etc.) stays the labeled stub."""
    import struct

    out: dict = {"codecs": []}
    if payload[4:8] != b"ftyp":
        raise NotImplementedError("not an ISO BMFF (MP4) file")

    def walk(start: int, end: int) -> None:
        for btype, body, bend in _mp4_boxes(payload, start, end):
            if btype in _MP4_CONTAINERS:
                walk(body, bend)
            elif btype == b"mvhd":
                version = payload[body]
                if version == 1:
                    timescale = struct.unpack_from(">I", payload, body + 20)[0]
                    duration = struct.unpack_from(">Q", payload, body + 24)[0]
                else:
                    timescale = struct.unpack_from(">I", payload, body + 12)[0]
                    duration = struct.unpack_from(">I", payload, body + 16)[0]
                out["duration_s"] = duration / timescale if timescale else 0.0
            elif btype == b"tkhd":
                version = payload[body]
                off = body + (88 if version == 1 else 76)
                w = struct.unpack_from(">I", payload, off)[0] / 65536.0
                h = struct.unpack_from(">I", payload, off + 4)[0] / 65536.0
                if w and h:
                    out.setdefault("width", int(w))
                    out.setdefault("height", int(h))
            elif btype == b"stsd":
                for fmt, b2, _ in _mp4_boxes(payload, body + 8, bend):
                    out["codecs"].append(fmt.decode("latin-1"))
            elif btype == b"stsz":
                count = struct.unpack_from(">I", payload, body + 8)[0]
                out["n_samples"] = out.get("n_samples", 0) + count

    try:
        walk(0, len(payload))
    except (struct.error, IndexError) as e:
        # a box passed the outer size check but its BODY is too short
        # for the fields its type promises (corrupt/truncated file) —
        # surface the documented rejection type, never a task-killing
        # struct.error inside mapInPandas
        raise ValueError(f"corrupt ISO BMFF box: {e}") from e
    if "duration_s" not in out:
        raise NotImplementedError("MP4 without a moov/mvhd box")
    return out


def _riff_chunks(data: bytes, start: int, end: int):
    """Iterate (fourcc, body_start, body_end) over RIFF chunks;
    LIST/RIFF bodies start AFTER their 4-byte list type."""
    import struct

    pos = start
    while pos + 8 <= end:
        fcc = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if body + size > end:
            return
        yield fcc, body, body + size
        pos = body + size + (size & 1)  # chunks are word-aligned


def _decode_avi(payload: bytes) -> dict:
    """Real decode of a RIFF/AVI container — stdlib struct only.

    Walks hdrl for the main header (frame interval, frame count,
    dimensions) and the video stream's handler fourcc, then pulls every
    '##dc'/'##db' frame payload out of the movi list. With an MJPG
    handler each frame is a complete baseline JPEG, which the
    from-scratch :mod:`.jpeg` decoder turns into pixels — so AVI/MJPEG
    is the fully-real video path (container AND codec), unlike
    MP4/H.264 where pixel decode stays the labeled stub."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    out: dict = {"handler": None, "frames": []}

    def walk(start: int, end: int) -> None:
        for fcc, body, bend in _riff_chunks(payload, start, end):
            if fcc in (b"RIFF", b"LIST"):
                walk(body + 4, bend)  # skip the list type fourcc
            elif fcc == b"avih":
                (us_per_frame, _, _, _, total, _, _, _, w, h) = struct.unpack_from(
                    "<10I", payload, body
                )
                out.update(
                    us_per_frame=us_per_frame,
                    n_frames=total,
                    width=w,
                    height=h,
                    fps=1e6 / us_per_frame if us_per_frame else 0.0,
                )
            elif fcc == b"strh" and payload[body : body + 4] == b"vids":
                out["handler"] = payload[body + 4 : body + 8].decode(
                    "ascii", "replace"
                )
            elif len(fcc) == 4 and fcc[2:4] in (b"dc", b"db"):
                out["frames"].append(payload[body:bend])

    try:
        walk(12, len(payload))
    except (struct.error, IndexError) as e:
        # chunk passed the outer size check but its body is too short
        # for its type's fields — documented rejection type, never a
        # task-killing struct.error inside mapInPandas
        raise ValueError(f"corrupt RIFF chunk: {e}") from e
    if "n_frames" not in out:
        raise NotImplementedError("AVI without an avih main header")
    out["duration_s"] = out["n_frames"] * out["us_per_frame"] / 1e6
    return out


def make_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic 24-bit uncompressed BMP fixture (test/bench data)."""
    import struct

    import numpy as np

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
    stride = (width * 3 + 3) & ~3
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : width * 3] = px.reshape(height, width * 3)
    body = rows[::-1].tobytes()  # bottom-up
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


def make_png(width: int, height: int, seed: int = 0, color_type: int = 2,
             filters: bool = True) -> bytes:
    """Deterministic PNG fixture (8-bit gray/RGB/RGBA) built with stdlib
    zlib/struct — exercises the real decoder, including non-trivial
    scanline filters when ``filters=True`` (cycles None/Sub/Up/Average/
    Paeth so every de-filter branch runs)."""
    import struct
    import zlib

    import numpy as np

    n_ch = {0: 1, 2: 3, 6: 4}[color_type]
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(height, width, n_ch), dtype=np.uint8)

    def paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    rowbytes = width * n_ch
    prev = bytes(rowbytes)
    for y in range(height):
        cur = px[y].tobytes()
        ftype = (y % 5) if filters else 0
        raw.append(ftype)
        if ftype == 0:
            raw += cur
        else:
            for x in range(rowbytes):
                a = cur[x - n_ch] if x >= n_ch else 0
                b = prev[x]
                c = prev[x - n_ch] if x >= n_ch else 0
                pred = {1: a, 2: b, 3: (a + b) >> 1, 4: paeth(a, b, c)}[ftype]
                raw.append((cur[x] - pred) & 0xFF)
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def make_wav(duration_s: float, sample_rate: int = 16_000, freq: float = 440.0,
             channels: int = 1) -> bytes:
    """Deterministic PCM16 sine-wave WAV fixture."""
    import io
    import wave

    import numpy as np

    n = int(duration_s * sample_rate)
    t = np.arange(n) / sample_rate
    x = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    if channels > 1:
        x = np.repeat(x, channels)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def make_jpeg(width: int, height: int, seed: int = 0,
              subsampling: str = "444") -> bytes:
    """Deterministic baseline-JPEG fixture: a smooth seeded sine/gradient
    field (JPEG-friendly, so luma survives quantization) encoded by the
    independent :func:`.jpeg.encode_jpeg` path."""
    import numpy as np

    from .jpeg import encode_jpeg

    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)
    base = 128 + 70 * np.sin((xx + seed * 3) / 9.0) + 45 * np.cos((yy - seed) / 7.0)
    if subsampling == "gray":
        return encode_jpeg(base.clip(0, 255).astype(np.uint8), subsampling="gray")
    rgb = np.stack(
        [base, base * 0.8 + seed % 40, base * 0.6 + (2 * seed) % 40], axis=-1
    ).clip(0, 255).astype(np.uint8)
    return encode_jpeg(rgb, subsampling=subsampling)


def make_mp3(duration_s: float, sample_rate: int = 44100, bitrate_kbps: int = 128,
             channels: int = 2, id3: bool = True) -> bytes:
    """Valid MPEG-1 Layer III framing (headers + zeroed main data) for a
    target duration — exercises the real container parser without an
    encoder. Optionally prefixed with an empty ID3v2 tag."""
    rate_idx = {44100: 0, 48000: 1, 32000: 2}[sample_rate]
    br_idx = _MP3_BITRATES_V1.index(bitrate_kbps)
    hdr = bytes(
        [
            0xFF,
            0xFB,  # MPEG1 Layer III, no CRC
            (br_idx << 4) | (rate_idx << 2),
            0xC0 if channels == 1 else 0x00,
        ]
    )
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    frame = hdr + b"\x00" * (frame_len - 4)
    n_frames = max(1, round(duration_s * sample_rate / 1152))
    tag = b"ID3\x04\x00\x00\x00\x00\x00\x00" if id3 else b""
    return tag + frame * n_frames


def make_mp4(duration_s: float, width: int = 640, height: int = 360,
             timescale: int = 1000, codec: bytes = b"avc1",
             n_samples: int = 0) -> bytes:
    """Minimal valid ISO BMFF: ftyp + moov(mvhd, trak(tkhd,
    mdia(mdhd, minf(stbl(stsd+stsz))))) with zero media payload —
    exercises the real box parser without an encoder."""
    import struct

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    dur = int(duration_s * timescale)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2avc1mp41")
    mvhd = box(
        b"mvhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">IHH2I", 0x00010000, 0x0100, 0, 0, 0)
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIIII", 0, 0, 1, 0, dur)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = box(
        b"mdhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">HH", 0x55C4, 0),
    )
    sample_entry = box(codec, b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70)
    stsd = box(b"stsd", struct.pack(">B3xI", 0, 1) + sample_entry)
    stsz = box(b"stsz", struct.pack(">B3xII", 0, 0, n_samples)
               + struct.pack(">I", 0) * n_samples)
    stbl = box(b"stbl", stsd + stsz)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + moov


def make_gif(width: int, height: int, seed: int = 0,
             n_colors: int = 16, palette: bytes | None = None,
             indices: list[int] | None = None) -> bytes:
    """Deterministic GIF89a fixture: a seeded palette + pixel pattern
    (or caller-pinned ``palette``/``indices`` for pixel-exact tests),
    REAL LZW compression (variable code width, clear/EOI) so the
    decoder's full code path executes."""
    import struct

    # palette + pixel indices, seeded LCG
    M = (1 << 64) - 1
    x = (seed * 6364136223846793005 + 1442695040888963407) & M

    def rnd(mod):
        nonlocal x
        x = (x * 6364136223846793005 + 1442695040888963407) & M
        return (x >> 33) % mod

    # spec floor: LZW min code size is >= 2 (GIF89a appendix F) — a
    # 1-bit code space makes clear/EOI collide with the first dynamic
    # code's width window
    bits = max(2, (n_colors - 1).bit_length())
    size = 1 << bits
    pal = palette if palette is not None else bytes(
        rnd(256) for _ in range(size * 3)
    )
    assert len(pal) == size * 3, "palette must cover the color-table size"
    idx = (
        list(indices)
        if indices is not None
        else [rnd(n_colors) for _ in range(width * height)]
    )
    assert len(idx) == width * height

    # GIF-variant LZW encode
    clear = 1 << bits
    eoi = clear + 1
    codewidth = bits + 1
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    out_bits: list[int] = []

    def emit(code, w):
        for i in range(w):
            out_bits.append((code >> i) & 1)

    emit(clear, codewidth)
    buf: tuple[int, ...] = ()
    for p in idx:
        cand = buf + (p,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], codewidth)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # the decoder's dictionary lags ours by ONE entry (it adds
            # entry k only after reading code k+1), so widen one code
            # later than the table size alone would suggest
            if next_code == (1 << codewidth) + 1 and codewidth < 12:
                codewidth += 1
        buf = (p,)
    if buf:
        emit(table[buf], codewidth)
    emit(eoi, codewidth)
    by = bytearray()
    for i in range(0, len(out_bits), 8):
        v = 0
        for j, bit in enumerate(out_bits[i : i + 8]):
            v |= bit << j
        by.append(v)

    head = b"GIF89a" + struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    sub = bytearray([bits])
    for i in range(0, len(by), 255):
        chunk = by[i : i + 255]
        sub += bytes([len(chunk)]) + chunk
    sub += b"\x00"
    return head + pal + desc + bytes(sub) + b"\x3b"


def make_avi_mjpeg(
    n_frames: int,
    width: int = 64,
    height: int = 48,
    fps: float = 8.0,
    seed: int = 0,
    luma_shift: int = 0,
) -> bytes:
    """Deterministic RIFF/AVI fixture whose '00dc' frames are REAL
    baseline JPEGs (``make_jpeg``'s smooth field, seed varied per
    frame) — the fully-decodable video path. ``luma_shift`` nudges
    every frame's brightness: a near-duplicate re-encode whose per-frame
    aHashes stay within a small Hamming distance of the original."""
    import struct

    import numpy as np

    from .jpeg import encode_jpeg

    frames = []
    for i in range(n_frames):
        yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)
        base = (
            128
            + luma_shift
            + 70 * np.sin((xx + seed * 3 + i * 5) / 9.0)
            + 45 * np.cos((yy - seed + i * 2) / 7.0)
        )
        frames.append(encode_jpeg(base.clip(0, 255).astype(np.uint8), subsampling="gray"))

    def chunk(fcc: bytes, body: bytes) -> bytes:
        return fcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    us_per_frame = int(round(1e6 / fps))
    avih = chunk(
        b"avih",
        struct.pack(
            "<14I", us_per_frame, 0, 0, 0x10, n_frames, 0, 1, 0, width, height, 0, 0, 0, 0
        ),
    )
    strh = chunk(
        b"strh",
        b"vids" + b"MJPG"
        # flags, prio, lang, initFrames, scale, rate, start, length,
        # sugBufSize, quality, sampleSize
        + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1, int(round(fps)), 0, n_frames, 0, -1, 0)
        + struct.pack("<4h", 0, 0, width, height),
    )
    strf = chunk(
        b"strf",
        struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0x47504A4D, width * height * 3, 0, 0, 0, 0),
    )
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _fake_decode(payload: bytes) -> tuple[int, int, int, float, int, int]:
    """Deterministic fake 'decode' derived from the payload bytes alone.

    Stands in for a real image codec (PIL/OpenCV are not installed —
    STUB, clearly marked). Replace the body with a real decode when the
    runtime has the libs; the Spark plumbing stays identical.
    """
    import hashlib

    h = hashlib.sha256(payload or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 3
    mean_luma = h[2] / 255.0
    phash = int.from_bytes(h[3:11], "big", signed=True)
    dct = int.from_bytes(h[11:19], "big", signed=True)
    return width, height, channels, mean_luma, phash, dct


def extract_image_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """media (MEDIA_SCHEMA) -> IMAGE_FEATURES_SCHEMA via mapInPandas.

    Arrow batches flow in/out; per-batch Python overhead only. BMP, PNG
    and baseline JPEG payloads decode for REAL (dimensions, mean luma,
    aHash). Other formats raise NotImplementedError unless ``fake=True``.
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if fake:
                    rows.append((int(mid), *_fake_decode(payload)))
                elif payload is not None and bytes(payload[:2]) == b"BM":
                    rows.append((int(mid), *_decode_bmp(bytes(payload))))
                elif payload is not None and bytes(payload[:8]) == _PNG_SIG:
                    rows.append((int(mid), *_decode_png(bytes(payload))))
                elif payload is not None and bytes(payload[:2]) == b"\xff\xd8":
                    rows.append((int(mid), *_decode_jpeg(bytes(payload))))
                elif payload is not None and bytes(payload[:6]) in _GIF_SIGS:
                    rows.append((int(mid), *_decode_gif(bytes(payload))))
                else:
                    raise NotImplementedError(
                        "only BMP, non-interlaced 8-bit PNG, baseline JPEG, and "
                        "non-interlaced GIF "
                        "decode in-container (run with fake=True to exercise "
                        "the pipeline for other formats)"
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "channels", "mean_luma", "phash", "dct_phash"]
            )

    if "kind" in media.columns:
        media = media.filter(F.col("kind") == "image")
    return media.select("media_id", "payload").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def extract_audio_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """audio rows -> AUDIO_FEATURES_SCHEMA via mapInPandas. PCM WAV
    payloads decode for REAL (``_decode_wav``: duration, sample rate,
    channels, RMS); MPEG audio parses its real frame headers
    (``_decode_mp3``: duration/rate/channels, RMS = NaN — the hybrid
    filterbank needs a codec library); other formats stay stubbed
    behind ``fake``."""

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                head = bytes(payload[:4]) if payload is not None else b""
                if not fake and head == b"RIFF":
                    rows.append((int(mid), *_decode_wav(bytes(payload))))
                elif not fake and (
                    head[:3] == b"ID3"
                    or (len(head) >= 2 and head[0] == 0xFF and head[1] & 0xE0 == 0xE0)
                ):
                    rows.append((int(mid), *_decode_mp3(bytes(payload))))
                elif not fake:
                    raise NotImplementedError(
                        "only PCM WAV and MPEG-audio containers parse "
                        "in-container; other compressed audio needs a codec "
                        "library (run with fake=True to exercise the pipeline)"
                    )
                else:
                    h = hashlib.sha256(payload or b"").digest()
                    rows.append(
                        (
                            int(mid),
                            1.0 + h[0] % 30,
                            [8000, 16000, 44100, 48000][h[1] % 4],
                            1 + h[2] % 2,
                            h[3] / 255.0,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "duration_s", "sample_rate", "channels", "rms"],
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(batches, schema=AUDIO_FEATURES_SCHEMA)
    )


def sample_video_frames(
    media: DataFrame, every_n_seconds: float = 1.0, fake: bool = False
) -> DataFrame:
    """video rows -> one row per sampled frame (media_id, frame_idx, ts_s,
    frame_payload).

    MP4 containers parse for REAL (``_decode_mp4_meta``): the frame
    timeline comes from the true mvhd duration, so frame_idx/ts_s are
    real container timing; frame_payload is null because decoding codec
    payload (H.264 etc.) needs a codec library — that single step is the
    labeled stub. ``fake=True`` keeps the old fully-synthetic path for
    non-ISO-BMFF inputs."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("ts_s", T.DoubleType(), False),
            T.StructField("frame_payload", T.BinaryType(), True),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if not fake:
                    raw = bytes(payload) if payload is not None else b""
                    if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
                        # AVI/MJPEG: REAL frame payloads — each sampled
                        # frame is a complete baseline JPEG
                        meta = _decode_avi(raw)
                        fps = meta["fps"]
                        # dwMicroSecPerFrame=0 is legal (timing lives in
                        # strh scale/rate); fall back to index spacing
                        # instead of dividing by zero
                        step = max(1, int(round(every_n_seconds * fps))) if fps > 0 else 1
                        for k, j in enumerate(range(0, len(meta["frames"]), step)):
                            ts = j / fps if fps > 0 else float(k)
                            out.append((int(mid), k, ts, meta["frames"][j]))
                        continue
                    if raw[4:8] != b"ftyp":
                        raise NotImplementedError(
                            "only ISO BMFF (MP4) and RIFF/AVI containers parse "
                            "in-container; run with fake=True for other formats"
                        )
                    meta = _decode_mp4_meta(raw)
                    n = int(meta["duration_s"] / every_n_seconds)
                    for i in range(n):
                        # real container timing; H.264 pixel decode is the stub
                        out.append((int(mid), i, i * every_n_seconds, None))
                    continue
                # fake: derive a deterministic duration & frames from bytes
                h = hashlib.sha256(payload or b"").digest()
                duration = 1 + h[0] % 10
                n = int(duration / every_n_seconds)
                for i in range(n):
                    out.append(
                        (int(mid), i, i * every_n_seconds, h[: 16])
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "ts_s", "frame_payload"]
            )

    return media.filter(F.col("kind") == "video").select("media_id", "payload").mapInPandas(
        batches, schema=schema
    )


def video_frame_hashes(
    media: DataFrame, every_n_seconds: float = 1.0
) -> DataFrame:
    """video rows -> (media_id, frame_idx, ts_s, phash): sample frames
    from fully-decodable containers (AVI/MJPEG) and aHash each through
    the real JPEG decoder. One mapInPandas pass per stage, both
    corpus-linear; frames whose payload is null (codec-stub containers
    like MP4/H.264) are dropped, loudly visible as missing rows."""
    frames = sample_video_frames(media, every_n_seconds).filter(
        F.col("frame_payload").isNotNull()
    )
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("ts_s", T.DoubleType(), False),
            T.StructField("phash", T.LongType(), False),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        from .jpeg import decode_jpeg_luma

        for pdf in it:
            out = []
            for mid, idx, ts, payload in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["ts_s"], pdf["frame_payload"]
            ):
                # aHash only: frame alignment never consults the DCT
                # hash, so skip its 32x32 downsample + transform here
                _w2, _h2, _c2, luma = decode_jpeg_luma(bytes(payload))
                blocks = _block_means(luma, 8)
                out.append((int(mid), int(idx), float(ts),
                            _bits_to_i64((blocks >= blocks.mean()).flatten())))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "ts_s", "phash"]
            )

    return frames.mapInPandas(batches, schema=schema)


def video_near_dups(
    media: DataFrame,
    every_n_seconds: float = 1.0,
    max_hamming: int = 3,
    min_shared_frames: int = 2,
) -> DataFrame:
    """Video near-duplicate pairs: sample + aHash frames, find near-dup
    FRAME pairs with the generalized pigeonhole Hamming join, then keep
    video pairs sharing >= ``min_shared_frames`` matching sampled
    frames (same frame index — re-encodes/brightness shifts align 1:1).

    Output: (id_a, id_b, shared_frames), id_a < id_b.

    Scale: the frame table is corpus-linear (one row per sampled
    frame); the Hamming join blocks on hash chunks exactly like image
    near-dup; the final pair count is a groupBy over candidate pairs
    only. No stage touches raw video bytes after the hash pass."""
    from ..pins import pin
    from .dedup import hamming_near_dups

    # surrogate frame id = xxhash64(media_id, frame_idx): safe for ANY
    # id domain (hash-derived/negative 64-bit media ids included, where
    # an arithmetic composite would mis-decompose); identity is
    # recovered by joining back to the frame table, never by arithmetic
    # r13: ONE pin of the hashed-frame projection (28 B/row) feeds the
    # Hamming join AND both identity-recovery joins — the container
    # parse + JPEG decode + aHash mapInPandas pipeline otherwise ran
    # once per consumer (3x per call; guide §2.4)
    fh = pin(
        video_frame_hashes(media, every_n_seconds).select(
            F.xxhash64("media_id", "frame_idx").alias("fid"),
            "media_id",
            "frame_idx",
            "phash",
        )
    )
    pairs = hamming_near_dups(fh, "phash", id_col="fid", max_hamming=max_hamming)
    key = fh.select("fid", "media_id", "frame_idx")
    vids = (
        pairs.join(
            key.select(
                F.col("fid").alias("id_a"),
                F.col("media_id").alias("va"),
                F.col("frame_idx").alias("fa"),
            ),
            "id_a",
        )
        .join(
            key.select(
                F.col("fid").alias("id_b"),
                F.col("media_id").alias("vb"),
                F.col("frame_idx").alias("fb"),
            ),
            "id_b",
        )
        .filter((F.col("va") != F.col("vb")) & (F.col("fa") == F.col("fb")))
        .groupBy(
            F.least("va", "vb").alias("id_a"), F.greatest("va", "vb").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_frames"))
        .filter(F.col("shared_frames") >= min_shared_frames)
    )
    return vids


def _wav_samples(payload: bytes):
    """PCM WAV -> (interleaved float64 samples in [-1, 1], rate,
    channels) — the ONE sample loader ``_decode_wav`` and the
    fingerprint path share (a new sample width lands in one place)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if sampwidth == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sampwidth == 1:
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"WAV sample width {sampwidth}")
    return x, rate, channels


def _wav_mono(payload: bytes):
    """PCM WAV -> (mono float64 samples in [-1, 1], sample rate)."""
    x, rate, channels = _wav_samples(payload)
    if channels > 1:
        x = x[: len(x) - len(x) % channels].reshape(-1, channels).mean(axis=1)
    return x, rate


_FP_BANDS = ((1, 8), (8, 16), (16, 32), (32, 64), (64, 128), (128, 256))


def _spectral_fingerprints(x, frame: int = 1024, hop: int = 512):
    """Peak-constellation fingerprint of a mono sample stream (the
    Shazam-style landmark scheme, simplified): Hann-windowed rfft per
    frame, the peak bin in each of six log-spaced bands, each
    consecutive frame PAIR packed into one 64-bit token. Amplitude
    scaling cancels in the per-band argmax; trimming only shifts frame
    indices, which the offset-consensus matcher absorbs."""
    import numpy as np

    n = (len(x) - frame) // hop + 1 if len(x) >= frame else 0
    if n <= 1:
        return []
    w = np.hanning(frame)
    toks = []
    prev = None
    for i in range(n):
        seg = x[i * hop : i * hop + frame] * w
        mag = np.abs(np.fft.rfft(seg))
        # floor from the BANDED region only: DC (Hann-amplified offsets)
        # and out-of-band energy above the last band must not mask every
        # in-band peak; relative, so amplitude-invariant
        floor = 0.1 * float(mag[_FP_BANDS[0][0] : _FP_BANDS[-1][1]].max())
        peaks = []
        for lo, hi in _FP_BANDS:
            p = lo + int(np.argmax(mag[lo:hi]))
            # bands holding only noise would contribute arbitrary
            # quantization-dependent bins — zero them so tokens depend
            # on actual spectral content, not the noise floor
            peaks.append(p if mag[p] > floor else 0)
        cur = 0
        for p in peaks:
            cur = (cur << 8) | (p & 0xFF)
        # silence emits NO landmark: the all-zero token would otherwise
        # (a) pair unrelated recordings through shared quiet stretches
        # and (b) make the self-join's token-0 bucket all-pairs — the
        # exact hot-key blowup the blocking design exists to avoid
        if prev is not None and prev != 0 and cur != 0:
            h = (prev << 16) ^ cur  # pair token: 48 bits prev + mixed cur
            h &= (1 << 63) - 1
            toks.append((i - 1, int(h)))
        prev = cur
    return toks


def audio_fingerprints(media: DataFrame, fake: bool = False) -> DataFrame:
    """audio rows -> (media_id, frame_idx, fp_hash): spectral landmark
    tokens per PCM WAV payload, one Arrow pass.

    Mixed WAV/MP3 corpora are first-class (VERDICT r5 item #9): MPEG
    audio parses its REAL frame grid (``_decode_mp3`` header walk —
    true duration and sample rate) and emits one row per landmark-frame
    position on the SAME hop grid as the WAV path, duration-aligned,
    with ``fp_hash`` NULL — the payload (hybrid filterbank) decode is
    the labeled permanent-scope stub (COVERAGE.md). NULL tokens never
    join, so near-dup matching over a mixed corpus degrades gracefully
    (MP3 rows visible but unmatchable) instead of crashing the pass.
    Other formats raise unless ``fake=True`` (deterministic
    byte-derived tokens keep the pipeline exercisable)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("fp_hash", T.LongType(), True),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                head = bytes(payload[:12]) if payload is not None else b""
                # RIFF alone is not enough: AVI is RIFF too — require the
                # WAVE form type so a misrouted video payload raises the
                # documented NotImplementedError, not a raw wave.Error
                if not fake and head[:4] == b"RIFF" and head[8:12] == b"WAVE":
                    x, _rate = _wav_mono(bytes(payload))
                    for idx, h in _spectral_fingerprints(x):
                        out.append((int(mid), idx, h))
                elif not fake and (
                    head[:3] == b"ID3"
                    or (len(head) >= 2 and head[0] == 0xFF and head[1] & 0xE0 == 0xE0)
                ):
                    # MP3: real frame grid, null tokens (see docstring).
                    # Same (frame=1024, hop=512) landmark grid as
                    # _spectral_fingerprints, cut to the container's true
                    # duration at its true rate; a pair token sits at
                    # each consecutive-frame boundary => n_frames - 1
                    duration_s, rate, _ch, _rms = _decode_mp3(bytes(payload))
                    n_samples = int(duration_s * rate)
                    n = (n_samples - 1024) // 512 + 1 if n_samples >= 1024 else 0
                    for idx in range(max(0, n - 1)):
                        out.append((int(mid), idx, None))
                elif fake:
                    # 12 chained tokens: comfortably above the default
                    # min_matches so byte-identical payloads DO pair in
                    # fake mode (4 tokens would silently never match)
                    d = hashlib.sha256(bytes(payload or b"")).digest()
                    for idx in range(12):
                        if idx % 4 == 0 and idx:
                            d = hashlib.sha256(d).digest()
                        o = (idx % 4) * 8
                        out.append((int(mid), idx,
                                    int.from_bytes(d[o : o + 8], "big") >> 1))
                else:
                    raise NotImplementedError(
                        "audio fingerprints need PCM samples: only WAV "
                        "decodes in-container (fake=True to exercise the "
                        "pipeline for compressed audio)"
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "fp_hash"]
            )

    if "kind" in media.columns:
        media = media.filter(F.col("kind") == "audio")
    return media.select("media_id", "payload").mapInPandas(batches, schema)


def audio_near_dups(
    media: DataFrame, min_matches: int = 8, fake: bool = False
) -> DataFrame:
    """Audio near-duplicate pairs via fingerprint-token blocking + time
    OFFSET CONSENSUS: tokens join only where hashes collide (the same
    blocking economics as the image Hamming join — no all-pairs stage),
    then matches per (pair, frame offset) are counted and a pair
    qualifies when its best single alignment has >= ``min_matches``
    aligned tokens — amplitude-scaled or trimmed copies align, unrelated
    audio's chance collisions scatter across offsets.

    Returns (id_a, id_b, n_aligned, offset_frames), id_a < id_b.
    """
    # materialize ONCE: the self-join would otherwise re-decode and
    # re-FFT every WAV on both sides (unlike the image path, where the
    # re-executed side is a cheap scan of precomputed hashes)
    fp = audio_fingerprints(media, fake=fake).localCheckpoint(eager=True)
    # null tokens (MP3 rows: real frame grid, stubbed payload decode)
    # can never match — drop them BEFORE the shuffle, not inside it
    fp = fp.filter(F.col("fp_hash").isNotNull())
    a = fp.select(
        F.col("media_id").alias("id_a"),
        F.col("frame_idx").alias("ia"),
        "fp_hash",
    )
    b = fp.select(
        F.col("media_id").alias("id_b"),
        F.col("frame_idx").alias("ib"),
        "fp_hash",
    )
    pairs = (
        a.join(b, "fp_hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", (F.col("ia") - F.col("ib")).alias("offset_frames"))
        .agg(F.count(F.lit(1)).alias("n_aligned"))
    )
    from pyspark.sql import Window

    # best-alignment selection: the window frames are per-PAIR offset
    # histograms (tiny — one row per distinct offset with any match)
    best = pairs.withColumn(
        "__r",
        F.row_number().over(
            Window.partitionBy("id_a", "id_b").orderBy(
                F.desc("n_aligned"), F.col("offset_frames")
            )
        ),
    )
    return (
        best.filter((F.col("__r") == 1) & (F.col("n_aligned") >= min_matches))
        .select("id_a", "id_b", "n_aligned", "offset_frames")
    )


def synthetic_media(spark, n: int = 64, real: bool = True) -> DataFrame:
    """Deterministic media table for tests/bench. ``real=True`` gives
    image rows actual BMP/PNG payloads, audio rows alternating PCM WAV /
    MPEG-framed MP3, and video rows real ISO BMFF (MP4) containers — all
    parseable in-container; codec-payload pixel/sample decode is the
    remaining labeled stub."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if real and kind == "image" and (i // 3) % 4 == 1:
            # image rows cycle BMP / PNG / baseline-JPEG / GIF payloads
            payload = make_png(16 + i % 48, 16 + (i * 3) % 48, seed=i)
            mime = "image/png"
        elif real and kind == "image" and (i // 3) % 4 == 2:
            payload = make_jpeg(16 + i % 48, 16 + (i * 3) % 48, seed=i,
                                subsampling=("444", "420", "gray")[(i // 9) % 3])
            mime = "image/jpeg"
        elif real and kind == "image" and (i // 3) % 4 == 3:
            payload = make_gif(16 + i % 48, 16 + (i * 3) % 48, seed=i)
            mime = "image/gif"
        elif real and kind == "image":
            payload = make_bmp(16 + i % 48, 16 + (i * 3) % 48, seed=i)
            mime = "image/bmp"
        elif real and kind == "audio" and (i // 3) % 2 == 1:
            payload = make_mp3(0.2 + (i % 5) / 10.0, sample_rate=(44100, 48000, 32000)[i % 3])
            mime = "audio/mpeg"
        elif real and kind == "audio":
            payload = make_wav(0.05 + (i % 10) / 100.0, 8000 + 1000 * (i % 3), freq=200.0 + i)
            mime = "audio/wav"
        elif real and kind == "video" and (i // 3) % 2 == 1:
            # AVI/MJPEG: the fully-decodable container (real frames)
            payload = make_avi_mjpeg(4 + i % 5, width=48 + 8 * (i % 3),
                                     height=32 + 8 * (i % 2), fps=4.0, seed=i)
            mime = "video/x-msvideo"
        elif real and kind == "video":
            payload = make_mp4(1.0 + i % 7, width=320 + 16 * (i % 4),
                               height=240 + 16 * (i % 3), n_samples=24 * (1 + i % 7))
            mime = "video/mp4"
        else:
            payload = bytes([(i * 7 + j) % 256 for j in range(128)])
            mime = {"image": "image/png", "audio": "audio/mpeg", "video": "video/mp4"}[kind]
        rows.append((i, kind, mime, payload, {"source": f"src{i % 4}"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
