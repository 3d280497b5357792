"""FlatBuffers binary batch ingest (the S1 TCP variant).

The reference's TCP port accepts, besides line protocol, FlatBuffers
``Metrics`` batches detected by the file identifier "TMFB"
(common/.../netty/tcp/MetricsBufferDecoder.java:21-60). Schema, from the
generated classes (common/src/main/generated-java/timely/api/flatbuffer/):

    Metrics { metrics: [Metric] }          // slot 4; file id "TMFB"
    Metric  { name: string,                // slot 4
              timestamp: long,             // slot 6
              value: double,               // slot 8
              tags: [Tag] }                // slot 10
    Tag     { key: string, value: string } // slots 4, 6

The decoder below is a dependency-free implementation of the (public)
FlatBuffers wire format for exactly this schema — little-endian, root
uoffset at byte 0, vtables of u16 in-table offsets reached via the
table's leading i32 soffset. NOTE: the ``flatbuffers`` runtime is not in
this container, so wire-parity is validated by spec-faithful encode/
decode roundtrip tests (tests/test_flatbuf.py), not against the Java
encoder.

Spark integration: ``parse_flatbuffers_df`` decodes payload batches via
``mapInPandas`` (binary blobs never enter a shuffle; per-batch Python
cost like the multimodal decoders) and emits the standard point schema
with the same s->ms normalization and viz-lift as every other ingest
path (Value.java:40-46, MetricAdapter.java:44).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

IDENTIFIER = b"TMFB"


def _u16(b: bytes, p: int) -> int:
    return struct.unpack_from("<H", b, p)[0]


def _i32(b: bytes, p: int) -> int:
    return struct.unpack_from("<i", b, p)[0]


def _u32(b: bytes, p: int) -> int:
    return struct.unpack_from("<I", b, p)[0]


def _field(b: bytes, table: int, slot: int) -> int:
    """In-table byte offset of a field, or 0 when absent. ``slot`` is the
    vtable byte offset (first field = 4), as in Table.__offset."""
    vtable = table - _i32(b, table)
    if slot >= _u16(b, vtable):
        return 0
    return _u16(b, vtable + slot)


def _indirect(b: bytes, p: int) -> int:
    return p + _u32(b, p)


def _string(b: bytes, p: int) -> str:
    n = _u32(b, p)
    return b[p + 4 : p + 4 + n].decode("utf-8")


def has_identifier(buf: bytes) -> bool:
    """MetricsBufferHasIdentifier analogue (file id at bytes 4..8)."""
    return len(buf) >= 8 and buf[4:8] == IDENTIFIER


def decode_metrics(buf: bytes) -> list[tuple[str | None, int, float, dict]]:
    """Metrics buffer -> [(name, timestamp, value, {tag: value})]."""
    root = _u32(buf, 0)
    out: list[tuple[str | None, int, float, dict]] = []
    vec_field = _field(buf, root, 4)
    if not vec_field:
        return out
    vec = _indirect(buf, root + vec_field)
    count = _u32(buf, vec)
    for i in range(count):
        m = _indirect(buf, vec + 4 + i * 4)
        name_f = _field(buf, m, 4)
        name = _string(buf, _indirect(buf, m + name_f)) if name_f else None
        ts_f = _field(buf, m, 6)
        ts = struct.unpack_from("<q", buf, m + ts_f)[0] if ts_f else 0
        v_f = _field(buf, m, 8)
        value = struct.unpack_from("<d", buf, m + v_f)[0] if v_f else 0.0
        tags: dict = {}
        t_f = _field(buf, m, 10)
        if t_f:
            tvec = _indirect(buf, m + t_f)
            for j in range(_u32(buf, tvec)):
                t = _indirect(buf, tvec + 4 + j * 4)
                k_f = _field(buf, t, 4)
                v2_f = _field(buf, t, 6)
                k = _string(buf, _indirect(buf, t + k_f)) if k_f else None
                v2 = _string(buf, _indirect(buf, t + v2_f)) if v2_f else None
                tags[k] = v2
        out.append((name, ts, value, tags))
    return out


def parse_flatbuffers_df(frames, payload_col: str = "payload"):
    """frames(payload: binary) -> points(metric, ts, value, tags, viz).

    Each row is one Metrics batch (one TCP frame). Malformed buffers are
    dropped, mirroring the decoder's catch-and-skip
    (MetricsBufferDecoder.java:53-56).
    """
    import pandas as pd

    from ..model import METRIC_SCHEMA

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            rows = []
            for payload in pdf[payload_col]:
                buf = bytes(payload)
                if not has_identifier(buf):
                    continue
                try:
                    decoded = decode_metrics(buf)
                except Exception:
                    continue  # fire-and-forget on bad frames
                for name, ts, value, tags in decoded:
                    if name is None:
                        continue
                    if 0 < ts < 1_000_000_000_000:  # s -> ms (Value.java:40-46)
                        ts *= 1000
                    viz = tags.pop("viz", None)
                    rows.append((name, ts, float(value), tags, viz))
            yield pd.DataFrame(
                rows, columns=["metric", "ts", "value", "tags", "viz"]
            )

    return frames.mapInPandas(batches, schema=METRIC_SCHEMA)


# --------------------------------------------------------------- test encoder
#
# Minimal bottom-up builder for THIS schema only — used by the tests to
# produce structurally valid buffers (prepend-built, offsets measured as
# distance-from-buffer-end, exactly the spec's construction).


class _Builder:
    def __init__(self) -> None:
        self.buf = bytearray()

    def _prepend(self, data: bytes) -> None:
        self.buf[:0] = data

    def _align(self, n: int) -> None:
        while len(self.buf) % n:
            self._prepend(b"\x00")

    def offset(self) -> int:
        return len(self.buf)

    def string(self, s: str) -> int:
        data = s.encode("utf-8")
        # pad on the buffer-end side so the u32 length lands 4-aligned and
        # the data follows it contiguously
        pad = (-(len(self.buf) + len(data) + 1)) % 4
        self._prepend(b"\x00" * pad)
        self._prepend(b"\x00")  # null terminator (uncounted)
        self._prepend(data)
        self._prepend(struct.pack("<I", len(data)))
        return self.offset()

    def vector_of_offsets(self, offsets: list[int]) -> int:
        self._align(4)
        for o in reversed(offsets):
            rel = (len(self.buf) + 4) - o
            self._prepend(struct.pack("<I", rel))
        self._prepend(struct.pack("<I", len(offsets)))
        return self.offset()

    def table(self, fields: list[tuple[int, str, object]]) -> int:
        """fields: (vtable slot, kind 'ref'|'i64'|'f64', value). Builds the
        table then its vtable; returns the table offset."""
        # lay out table body after the leading soffset, 8-byte aligning
        # scalars; refs are u32
        layout: list[tuple[int, int, bytes | int, str]] = []  # (slot, off, payload, kind)
        pos = 4  # after soffset
        for slot, kind, val in fields:
            if kind in ("i64", "f64"):
                pad = (-pos) % 8
                pos += pad
                payload = struct.pack("<q" if kind == "i64" else "<d", val)
                layout.append((slot, pos, payload, kind))
                pos += 8
            else:
                pad = (-pos) % 4
                pos += pad
                layout.append((slot, pos, int(val), kind))
                pos += 4
        table_size = pos
        self._align(8)
        body = bytearray(table_size)
        # soffset patched below; D_table = end-distance of table start
        D_table = len(self.buf) + table_size
        for slot, off, payload, kind in layout:
            if kind == "ref":
                field_end_dist = D_table - off
                rel = field_end_dist - int(payload)
                body[off : off + 4] = struct.pack("<I", rel)
            else:
                body[off : off + 8] = payload  # type: ignore[assignment]
        self._prepend(bytes(body))
        table_off = self.offset()
        # vtable: u16 vt_size, u16 table_size, u16 per slot
        max_slot = max((s for s, _, _, _ in layout), default=2)
        nslots = (max_slot - 4) // 2 + 1 if layout else 0
        vt_size = 4 + 2 * nslots
        vt = bytearray(struct.pack("<HH", vt_size, table_size))
        slots = {s: o for s, o, _, _ in layout}
        for i in range(nslots):
            vt += struct.pack("<H", slots.get(4 + 2 * i, 0))
        self._align(2)
        self._prepend(bytes(vt))
        vtable_off = self.offset()
        # patch the table's soffset: vtable_pos = table_pos - soffset
        # (distances from end: soffset = D_vtable - D_table)
        soffset = vtable_off - table_off
        abs_table = len(self.buf) - table_off
        self.buf[abs_table : abs_table + 4] = struct.pack("<i", soffset)
        return table_off

    def finish(self, root: int, identifier: bytes) -> bytes:
        self._align(4)
        self._prepend(identifier)
        rel = (len(self.buf) + 4) - root
        self._prepend(struct.pack("<I", rel))
        return bytes(self.buf)


def encode_metrics(metrics: list[tuple[str, int, float, dict]]) -> bytes:
    """TEST-ONLY encoder: [(name, ts, value, {tags})] -> Metrics buffer."""
    b = _Builder()
    metric_offs = []
    for name, ts, value, tags in metrics:
        tag_offs = []
        for k, v in tags.items():
            ko = b.string(k)
            vo = b.string(v)
            tag_offs.append(b.table([(4, "ref", ko), (6, "ref", vo)]))
        tvec = b.vector_of_offsets(tag_offs) if tag_offs else None
        no = b.string(name)
        fields: list[tuple[int, str, object]] = [
            (4, "ref", no),
            (6, "i64", ts),
            (8, "f64", value),
        ]
        if tvec is not None:
            fields.append((10, "ref", tvec))
        metric_offs.append(b.table(fields))
    mvec = b.vector_of_offsets(metric_offs)
    root = b.table([(4, "ref", mvec)])
    return b.finish(root, IDENTIFIER)
