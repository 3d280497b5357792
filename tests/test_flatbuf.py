"""FlatBuffers Metrics-batch ingest tests (S1 binary variant).

The decoder implements the public FlatBuffers wire format for the
reference's generated schema; validated by roundtrip against the
spec-faithful test encoder (the Java encoder isn't runnable here).
"""

import struct

from timely_spark.sources.flatbuf import (
    IDENTIFIER,
    decode_metrics,
    encode_metrics,
    has_identifier,
    parse_flatbuffers_df,
)

B = 1_447_767_913_000

SAMPLE = [
    ("sys.cpu.user", B, 1.0, {"tag1": "value1", "tag2": "value2"}),
    ("sys.cpu.idle", B + 1000, -2.5, {"host": "h1"}),
    ("no.tags", B + 2000, 0.0, {}),
]


def test_roundtrip():
    buf = encode_metrics(SAMPLE)
    assert has_identifier(buf)
    assert buf[4:8] == IDENTIFIER
    assert decode_metrics(buf) == SAMPLE


def test_identifier_gate():
    assert not has_identifier(b"put sys.cpu.user 1 1.0 a=b")
    assert not has_identifier(b"\x00\x00\x00")


def test_default_fields_absent():
    """A table omitting fields yields FlatBuffers defaults (0 / absent)."""
    buf = encode_metrics([("m", 0, 0.0, {})])
    # re-encode drops nothing here, but decode of present-but-zero works
    assert decode_metrics(buf) == [("m", 0, 0.0, {})]


def test_parse_flatbuffers_df(spark):
    """mapInPandas decode -> standard point schema with s->ms + viz lift."""
    frames = [
        (bytearray(encode_metrics(SAMPLE)),),
        (bytearray(encode_metrics([("m2", B // 1000, 7.0, {"viz": "X", "a": "b"})])),),
        (b"garbage-not-a-flatbuffer",),
        (bytearray(struct.pack("<I", 99) + IDENTIFIER + b"\xff" * 4),),  # truncated
    ]
    df = spark.createDataFrame(frames, "payload binary")
    pts = {r["metric"]: r for r in parse_flatbuffers_df(df).collect()}
    assert set(pts) == {"sys.cpu.user", "sys.cpu.idle", "no.tags", "m2"}
    assert pts["sys.cpu.user"]["tags"] == {"tag1": "value1", "tag2": "value2"}
    assert pts["sys.cpu.idle"]["value"] == -2.5
    assert pts["m2"]["ts"] == B // 1000 * 1000  # s -> ms normalized
    assert pts["m2"]["viz"] == "X" and pts["m2"]["tags"] == {"a": "b"}


def test_engine_put_flatbuffers(spark, tmp_path_factory):
    """Binary batches flow through the same store/meta/query pipeline."""
    from timely_spark.api import TimelyEngine

    root = tmp_path_factory.mktemp("engine_fb")
    eng = TimelyEngine(spark, store_path=str(root / "m"))
    n = eng.put_flatbuffers([encode_metrics(SAMPLE), b"not-a-buffer"])
    assert n == 3  # bad frame dropped, fire-and-forget
    out = eng.query(
        {
            "start": B - 1000,
            "end": B + 60_000,
            "msResolution": True,
            "queries": [
                {"aggregator": "none", "metric": "sys.cpu.user", "tags": {}}
            ],
        }
    )
    assert out[0]["dps"][str(B)] == 1.0
