"""Client library tests — the Python counterparts of the reference's
client/ module, exercised end-to-end against the real facades.

Reference analogues: TcpClient.java (buffered writes, latency flush,
reconnect backoff), UdpClient.java, HttpClient.java + the login flow of
WebSocketClient.open (cookie jar), WebSocketSubscriptionClient.java
(create on open, add/remove, handler callback, close).
"""

import json
import threading
import time

import pytest

from timely_spark.api import TimelyEngine
from timely_spark.client import (
    TimelyHttpClient,
    TimelySubscriptionClient,
    TimelyTcpClient,
    TimelyUdpClient,
)

TEST_TIME = 1_447_767_900_000 - (1_447_767_900_000 % 3_600_000)


def _wait_for(cond, timeout=60.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if cond():
            return True
        time.sleep(0.25)
    return False


def _values(eng, metric):
    """Flushed values for a metric; [] while the store doesn't exist yet
    (the listener thread may not have drained the socket)."""
    try:
        return sorted(
            r["value"] for r in eng.points().filter(f"metric = '{metric}'").collect()
        )
    except Exception:
        return []


def test_tcp_client_buffered_put(spark, tmp_path):
    from timely_spark.tcp_facade import TimelyTcpServer

    eng = TimelyEngine(spark, store_path=str(tmp_path / "m"))
    srv = TimelyTcpServer(eng, flush_seconds=60).start()
    try:
        with TimelyTcpClient(srv.host, srv.port, buffer_size=3) as cli:
            for i in range(1, 4):
                cli.write(f"put sys.cli.tcp {TEST_TIME + 1000 * i} {float(i)} host=h1\n")
            # buffer_size=3 reached -> flushed without an explicit call
            cli.write(f"put sys.cli.tcp {TEST_TIME + 4000} 4.0 host=h1\n")
            cli.flush()

        def landed():
            srv.flush()
            return _values(eng, "sys.cli.tcp") == [1.0, 2.0, 3.0, 4.0]

        assert _wait_for(landed, 30)
    finally:
        srv.stop()


def test_tcp_client_backoff_on_dead_server():
    """TcpClient.connect: after a failed dial, re-dials are refused until
    the backoff window elapses (starts at 1 s, doubles)."""
    cli = TimelyTcpClient("127.0.0.1", 1)  # port 1: nothing listening
    with pytest.raises(OSError):
        cli.write("put a 1 1 t=v\n")
    t0 = time.monotonic()
    with pytest.raises(OSError):
        cli.write("put a 1 1 t=v\n")
    # the second failure is immediate — the backoff window refused the
    # dial rather than re-attempting a connect
    assert time.monotonic() - t0 < 0.5
    assert cli._backoff >= 2.0
    cli.close()


def test_udp_client_put(spark, tmp_path):
    from timely_spark.tcp_facade import TimelyUdpServer

    eng = TimelyEngine(spark, store_path=str(tmp_path / "m"))
    srv = TimelyUdpServer(eng, flush_seconds=60).start()
    try:
        with TimelyUdpClient(srv.host, srv.port) as cli:
            cli.write(f"put sys.cli.udp {TEST_TIME + 1000} 5.0 host=h1\n")

        def landed():
            srv.flush()
            return _values(eng, "sys.cli.udp") == [5.0]

        assert _wait_for(landed, 30)  # datagram delivery is async
    finally:
        srv.stop()


def test_udp_client_requires_open():
    cli = TimelyUdpClient("127.0.0.1", 9)
    with pytest.raises(RuntimeError, match="open first"):
        cli.write("put a 1 1 t=v\n")


def test_http_client_api_surface(spark, tmp_path):
    from timely_spark.http_facade import TimelyHttpServer

    eng = TimelyEngine(spark, store_path=str(tmp_path / "m"))
    srv = TimelyHttpServer(eng, auths={"A"}).start()
    try:
        cli = TimelyHttpClient(srv.host, srv.port)
        cli.put(
            [
                {"metric": "sys.cli.http", "timestamp": TEST_TIME + 1000,
                 "value": 1.5, "tags": {"host": "h1"}},
                {"metric": "sys.cli.http", "timestamp": TEST_TIME + 2000,
                 "value": 2.5, "tags": {"host": "h1"}},
            ]
        )
        out = cli.query(
            {"start": TEST_TIME, "end": TEST_TIME + 10_000,
             "queries": [{"aggregator": "none", "metric": "sys.cli.http"}]}
        )
        assert sorted(float(v) for v in out[0]["dps"].values()) == [1.5, 2.5]
        assert cli.suggest("sys.cli") == ["sys.cli.http"]
        assert cli.lookup("sys.cli.http")["totalResults"] >= 1
        assert "avg" in cli.aggregators()
        assert cli.version()
        assert cli.metrics()["metrics"][0]["metric"] == "sys.cli.http"
    finally:
        srv.stop()


def test_http_client_certificate_login_cookie_jar(spark, tmp_path, certs):
    """HttpClient + cookie store: certificate /login stores TSESSIONID in
    the jar and subsequent API calls ride the session automatically."""
    from tests.test_tls import ALICE_DN, CA_DN
    from timely_spark.auth import AuthenticationService, TimelyUser
    from timely_spark.http_facade import TimelyHttpServer
    from timely_spark.tls import client_context, server_context

    eng = TimelyEngine(spark, store_path=str(tmp_path / "m"))
    eng.put_lines(
        [
            f"put sys.cli.tls {TEST_TIME + 1000} 1.0 host=h1 viz=A",
            f"put sys.cli.tls {TEST_TIME + 2000} 2.0 host=h1 viz=B",
        ]
    )
    svc = AuthenticationService(
        [TimelyUser(subject_dn=ALICE_DN, issuer_dn=CA_DN, auths=frozenset({"A"}))]
    )
    srv = TimelyHttpServer(
        eng, auth_service=svc,
        ssl_context=server_context(
            certs["server"], certs["server.key"],
            ca_certs=certs["ca"], require_client_cert=True,
        ),
    ).start()
    try:
        cli = TimelyHttpClient(
            "localhost", srv.port,
            ssl_context=client_context(certs["ca"], certs["alice"], certs["alice.key"]),
        )
        session_id = cli.login()
        assert session_id and cli.session_cookie() == session_id
        out = cli.query(
            {"start": TEST_TIME, "end": TEST_TIME + 10_000,
             "queries": [{"aggregator": "none", "metric": "sys.cli.tls"}]}
        )
        vals = sorted(float(v) for sub in out for v in sub["dps"].values())
        assert vals == [1.0]  # alice's session: viz=A only
    finally:
        srv.stop()


def test_subscription_client_end_to_end(spark, tmp_path):
    """WebSocketSubscriptionClient flow: open (create), add a finite
    range, receive MetricResponses frames through the handler, then the
    complete:true marker; version op round-trips on the same channel."""
    from timely_spark.ws_facade import TimelyWebSocketServer

    store = str(tmp_path / "m")
    eng = TimelyEngine(spark, store_path=store)
    eng.put_lines(
        [
            f"put sys.cli.ws {TEST_TIME + 1000 * i} {float(i)} host=h1"
            for i in range(1, 6)
        ]
    )
    srv = TimelyWebSocketServer(spark, store, engine=eng, flush_seconds=2).start()
    got: list[dict] = []
    done = threading.Event()

    def handler(msg: dict) -> None:
        got.append(msg)
        for r in msg.get("responses", []):
            if r.get("complete"):
                done.set()

    cli = TimelySubscriptionClient("127.0.0.1", srv.port)
    try:
        cli.open(handler)
        cli.request_version()
        cli.add_subscription(
            "sys.cli.ws", start_time_ms=TEST_TIME,
            end_time_ms=TEST_TIME + 10_000, delay_time_ms=1000,
        )
        assert done.wait(120), f"no complete marker; got {got[:3]}"
        values = sorted(
            r["value"]
            for m in got
            for r in m.get("responses", [])
            if not r.get("complete")
        )
        assert values == [1.0, 2.0, 3.0, 4.0, 5.0]
        assert any("version" in m for m in got)
    finally:
        cli.close()
        srv.stop()
