"""TCP/UDP put transport tests — TimelyTcpIT / TimelyUdpIT analogues:
raw sockets write version + put lines, the buffered batch flushes into
the engine, and a query returns the exact points
(server/src/test/java/timely/server/integration/TimelyTcpIT.java:74-230,
TimelyUdpIT.java)."""

import socket

from timely_spark.api import TimelyEngine
from timely_spark.tcp_facade import TimelyTcpServer, TimelyUdpServer

B = 1_447_767_913_000


def _query_points(eng, metric):
    from pyspark.errors import AnalysisException

    try:
        out = eng.query(
        {
            "start": B - 1000,
            "end": B + 60_000,
            "msResolution": True,
            "queries": [
                {
                    "aggregator": "max",
                    "metric": metric,
                    "downsample": "1s-max",
                    "tags": {},
                }
            ],
        }
    )
    except AnalysisException:
        return {}  # store not written yet (nothing flushed)
    return {} if not out else out[0]["dps"]


def test_tcp_version_and_put(spark, tmp_path):
    """TimelyTcpIT.testVersion:74-88 + testPutMultiple:116-166."""
    eng = TimelyEngine(spark, store_path=str(tmp_path / "m"))
    srv = TimelyTcpServer(eng, flush_seconds=60).start()  # manual flush
    try:
        with socket.create_connection((srv.host, srv.port), timeout=30) as sock:
            f = sock.makefile("rwb")
            f.write(b"version\n")
            f.flush()
            assert f.readline().decode() == TimelyEngine.version() + "\n"
            f.write(
                f"put sys.cpu.user {B} 1.0 tag1=value1 tag2=value2\n"
                f"put sys.cpu.idle {B + 1000} 3.0 tag3=value3 tag4=value4\n".encode()
            )
            f.flush()
            f.write(b"not-a-real-op\n")  # dropped, connection survives
            f.flush()
            f.write(f"put sys.cpu.user {B + 2000} 2.0 tag1=value1\n".encode())
            f.flush()
        import time

        total, deadline = 0, time.time() + 30
        while total < 3 and time.time() < deadline:
            total += srv.flush()
            if total < 3:
                time.sleep(0.2)
        assert total == 3
        assert _query_points(eng, "sys.cpu.user") == {
            str(B): 1.0,
            str(B + 2000): 2.0,
        }
        assert _query_points(eng, "sys.cpu.idle") == {str(B + 1000): 3.0}
    finally:
        srv.stop()


def test_tcp_size_triggered_flush(spark, tmp_path):
    """The BatchWriter size leg: crossing flush_lines drains without an
    explicit flush call."""
    import time

    eng = TimelyEngine(spark, store_path=str(tmp_path / "m"))
    srv = TimelyTcpServer(eng, flush_lines=5, flush_seconds=60).start()
    try:
        with socket.create_connection((srv.host, srv.port), timeout=30) as sock:
            payload = "".join(
                f"put flood {B + i * 1000} {float(i)} h=h1\n" for i in range(5)
            )
            sock.sendall(payload.encode())
        deadline = time.time() + 60
        while time.time() < deadline and not _query_points(eng, "flood"):
            time.sleep(0.5)
        assert len(_query_points(eng, "flood")) == 5
    finally:
        srv.stop()


def test_tcp_segmented_line_and_frame(spark, tmp_path):
    """TcpDecoderTest/MetricsBufferDecoderTest's buffering concern at
    the socket level: a put line split mid-token across TCP sends still
    parses as ONE line, and a FlatBuffers frame dribbled in 7-byte
    chunks (the first segment shorter than the 8-byte TMFB sniff) still
    auto-detects and decodes."""
    import time

    from timely_spark.sources.flatbuf import encode_metrics

    eng = TimelyEngine(spark, store_path=str(tmp_path / "m"))
    srv = TimelyTcpServer(eng, flush_seconds=60).start()
    try:
        with socket.create_connection((srv.host, srv.port), timeout=30) as sock:
            half1 = f"put sys.seg.line {B} 1.0 ta".encode()
            half2 = b"g1=value1\n"
            sock.sendall(half1)
            time.sleep(0.2)  # force separate segments
            sock.sendall(half2)
        frame = encode_metrics([("sys.seg.frame", B, 2.0, {"t": "v"})])
        with socket.create_connection((srv.host, srv.port), timeout=30) as sock:
            for i in range(0, len(frame), 7):
                sock.sendall(frame[i : i + 7])
                time.sleep(0.01)
            sock.shutdown(socket.SHUT_WR)
            sock.recv(1)  # wait for server-side close (frame processed)
        # the line rides the flush buffer; the frame writes directly
        deadline = time.time() + 30
        total = 0
        while time.time() < deadline and total < 1:
            total += srv.flush()
            if total < 1:
                time.sleep(0.2)
        assert total == 1
        rows = {}
        while time.time() < deadline and len(rows) < 2:
            rows = {r.metric: r for r in eng.points(now_ms=B).collect()}
            if len(rows) < 2:
                time.sleep(0.5)
        assert rows["sys.seg.line"].value == 1.0
        assert rows["sys.seg.line"].tags["tag1"] == "value1"
        assert rows["sys.seg.frame"].value == 2.0
    finally:
        srv.stop()


def test_udp_put_datagrams(spark, tmp_path):
    """TimelyUdpIT: single- and multi-line datagrams."""
    eng = TimelyEngine(spark, store_path=str(tmp_path / "m"))
    srv = TimelyUdpServer(eng, flush_seconds=60).start()
    try:
        with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as sock:
            sock.sendto(
                f"put sys.cpu.user {B} 1.0 tag1=value1\n".encode(),
                (srv.host, srv.port),
            )
            sock.sendto(
                (
                    f"put sys.cpu.user {B + 1000} 2.0 tag1=value1\n"
                    f"put sys.cpu.user {B + 2000} 3.0 tag1=value1\n"
                ).encode(),
                (srv.host, srv.port),
            )
        import time

        deadline = time.time() + 30
        while time.time() < deadline and srv.flush() < 3:
            time.sleep(0.2)
        assert _query_points(eng, "sys.cpu.user") == {
            str(B): 1.0,
            str(B + 1000): 2.0,
            str(B + 2000): 3.0,
        }
    finally:
        srv.stop()


def test_tcp_flatbuffers_frame(spark, tmp_path):
    """TimelyTcpIT.testPutMultipleBinary:168-230 — a binary FlatBuffers
    Metrics frame on the same TCP port, auto-detected by the TMFB
    identifier, decodes into the same points the line protocol would."""
    from timely_spark.sources.flatbuf import encode_metrics

    eng = TimelyEngine(spark, store_path=str(tmp_path / "m"))
    srv = TimelyTcpServer(eng, flush_seconds=60).start()
    try:
        frame = encode_metrics(
            [
                ("sys.cpu.user", B, 1.0, {"tag1": "value1", "tag2": "value2"}),
                ("sys.cpu.idle", B + 1000, 3.0, {"tag3": "value3", "tag4": "value4"}),
            ]
        )
        with socket.create_connection((srv.host, srv.port), timeout=30) as sock:
            sock.sendall(frame)
            sock.shutdown(socket.SHUT_WR)
            sock.recv(1)  # wait for server-side close (frame processed)
        import time

        deadline = time.time() + 60
        while time.time() < deadline and not _query_points(eng, "sys.cpu.user"):
            time.sleep(0.5)
        assert _query_points(eng, "sys.cpu.user") == {str(B): 1.0}
        assert _query_points(eng, "sys.cpu.idle") == {str(B + 1000): 3.0}
    finally:
        srv.stop()


def test_tcp_flatbuffers_frame_segmented(spark, tmp_path):
    """A FlatBuffers frame whose first TCP segment carries fewer than 8
    bytes must still be classified as binary: _read_head loops across
    segments instead of trusting one recv (which sees only the first
    segment and would silently drop the frame as garbage line
    protocol)."""
    import time

    from timely_spark.sources.flatbuf import encode_metrics

    eng = TimelyEngine(spark, store_path=str(tmp_path / "m"))
    srv = TimelyTcpServer(eng, flush_seconds=60).start()
    try:
        frame = encode_metrics([("sys.seg.test", B, 7.0, {"t": "v"})])
        with socket.create_connection((srv.host, srv.port), timeout=30) as sock:
            sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            sock.sendall(frame[:3])  # short first segment
            time.sleep(0.2)  # let the server peek before the rest lands
            sock.sendall(frame[3:])
            sock.shutdown(socket.SHUT_WR)
            sock.recv(1)
        deadline = time.time() + 60
        while time.time() < deadline and not _query_points(eng, "sys.seg.test"):
            time.sleep(0.5)
        assert _query_points(eng, "sys.seg.test") == {str(B): 7.0}
    finally:
        srv.stop()
