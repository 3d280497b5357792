"""TLS transport tests — one-way and two-way SSL over the HTTP, TCP and
WS facades, with the client certificate as the login identity.

Reference analogues: OneWaySSLBase.java / OneWaySSLAnonAccessIT.java
(server cert only, anonymous queries allowed), TwoWaySSLBase.java /
TwoWaySSLIT.java (client cert drives /login -> TSESSIONID ->
viz-filtered queries), TwoWaySSLFailureIT.java (certless client is
rejected at the handshake). Certificates are generated per-session with
the openssl CLI (the reference's use-generated-keypair test mode,
server/src/test/resources/config/application.yml).
"""

import json
import socket
import ssl
import time
import urllib.error
import urllib.request

import pytest

from timely_spark.auth import AuthenticationService, TimelyUser
from timely_spark.tls import client_context, peer_dn_pair, server_context

TEST_TIME = 1_447_767_900_000 - (1_447_767_900_000 % 3_600_000)

ALICE_SUBJ = "/C=US/O=Example Corp/OU=Example Developers/CN=Alice User"
BOB_SUBJ = "/C=US/O=Example Corp/OU=Example Developers/CN=Bob User"
# peer_dn_pair renders RFC 2253 order (most-specific first), the shape
# Java's getSubjectDN().getName() gives the authorized-users config
ALICE_DN = "CN=Alice User, OU=Example Developers, O=Example Corp, C=US"
BOB_DN = "CN=Bob User, OU=Example Developers, O=Example Corp, C=US"
CA_DN = "CN=Example Corp CA, O=Example Corp, C=US"


def _https_get(url, ctx, headers=None):
    req = urllib.request.Request(url)
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    with urllib.request.urlopen(req, timeout=60, context=ctx) as r:
        return r.status, r.read().decode("utf-8"), dict(r.headers)


def _https_post(url, payload, ctx):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=60, context=ctx) as r:
        return r.status, r.read().decode("utf-8")


def _put_metrics(base_url, ctx, lines):
    metrics = []
    for line in lines:
        parts = line.split(" ")
        tags = dict(p.split("=", 1) for p in parts[3:])
        metrics.append(
            {"metric": parts[0], "timestamp": int(parts[1]),
             "value": float(parts[2]), "tags": tags}
        )
    _https_post(f"{base_url}/api/put", metrics, ctx)


def test_one_way_ssl_anonymous_access(spark, tmp_path, certs):
    """OneWaySSLAnonAccessIT: server cert only; anonymous client puts and
    queries over HTTPS (unlabeled data visible to the empty auth set)."""
    from timely_spark.api import TimelyEngine
    from timely_spark.http_facade import TimelyHttpServer

    eng = TimelyEngine(spark, store_path=str(tmp_path / "metrics"))
    srv = TimelyHttpServer(
        eng,
        auth_service=AuthenticationService([], allow_anonymous_http=True),
        ssl_context=server_context(certs["server"], certs["server.key"]),
    ).start()
    try:
        assert srv.base_url.startswith("https://")
        ctx = client_context(certs["ca"])
        status, body, _ = _https_get(f"{srv.base_url}/version", ctx)
        assert status == 200 and body.strip()
        _put_metrics(srv.base_url, ctx, [
            f"sys.ssl.one {TEST_TIME + 1000} 1.0 host=h1",
            f"sys.ssl.one {TEST_TIME + 2000} 2.0 host=h1",
        ])
        status, body = _https_post(
            f"{srv.base_url}/api/query",
            {"start": TEST_TIME, "end": TEST_TIME + 10_000,
             "queries": [{"aggregator": "none", "metric": "sys.ssl.one"}]},
            ctx,
        )
        dps = json.loads(body)[0]["dps"]
        assert sorted(float(v) for v in dps.values()) == [1.0, 2.0]
    finally:
        srv.stop()


def test_two_way_ssl_login_session_and_viz(spark, tmp_path, certs):
    """TwoWaySSLIT: the client certificate is the identity. /login mints
    a TSESSIONID session; queries under either the cookie or the cert
    itself are visibility-filtered to that user's auths."""
    from timely_spark.api import TimelyEngine
    from timely_spark.http_facade import TimelyHttpServer

    eng = TimelyEngine(spark, store_path=str(tmp_path / "metrics"))
    eng.put_lines([
        f"put sys.ssl.two {TEST_TIME + 1000} 1.0 host=h1 viz=A",
        f"put sys.ssl.two {TEST_TIME + 2000} 2.0 host=h1 viz=(A&B)",
        f"put sys.ssl.two {TEST_TIME + 3000} 3.0 host=h1",
    ])
    svc = AuthenticationService([
        TimelyUser(subject_dn=ALICE_DN, issuer_dn=CA_DN, auths=frozenset({"A"})),
        TimelyUser(subject_dn=BOB_DN, issuer_dn=CA_DN, auths=frozenset({"A", "B"})),
    ])
    srv = TimelyHttpServer(
        eng,
        auth_service=svc,
        ssl_context=server_context(
            certs["server"], certs["server.key"],
            ca_certs=certs["ca"], require_client_cert=True,
        ),
    ).start()
    try:
        query = (
            f"{srv.base_url}/api/query?start={TEST_TIME}&end={TEST_TIME + 10_000}"
            "&m=none:sys.ssl.two"
        )

        def visible(name):
            ctx = client_context(certs["ca"], certs[name], certs[f"{name}.key"])
            # direct cert auth (HttpRequestDecoder cert branch)
            _, body, _ = _https_get(query, ctx)
            direct = sorted(
                float(v) for sub in json.loads(body) for v in sub["dps"].values()
            )
            # login -> session cookie (X509LoginRequestHandler path)
            _, _, headers = _https_get(f"{srv.base_url}/login", ctx)
            cookie = headers["Set-Cookie"].split(";")[0]
            assert cookie.startswith("TSESSIONID=")
            _, body, _ = _https_get(query, ctx, {"Cookie": cookie})
            via_session = sorted(
                float(v) for sub in json.loads(body) for v in sub["dps"].values()
            )
            assert via_session == direct
            return direct

        assert visible("alice") == [1.0, 3.0]       # A + unlabeled
        assert visible("bob") == [1.0, 2.0, 3.0]    # (A&B) too
    finally:
        srv.stop()


def test_two_way_ssl_rejects_certless_client(spark, tmp_path, certs):
    """TwoWaySSLFailureIT: no client certificate -> handshake failure,
    and the listener survives to serve the next (proper) client."""
    from timely_spark.api import TimelyEngine
    from timely_spark.http_facade import TimelyHttpServer

    eng = TimelyEngine(spark, store_path=str(tmp_path / "metrics"))
    srv = TimelyHttpServer(
        eng,
        auth_service=AuthenticationService(
            [TimelyUser(subject_dn=ALICE_DN, issuer_dn=CA_DN, auths=frozenset({"A"}))]
        ),
        ssl_context=server_context(
            certs["server"], certs["server.key"],
            ca_certs=certs["ca"], require_client_cert=True,
        ),
    ).start()
    try:
        # TLS 1.3 delivers the certificate-required alert on the first
        # read after a client-side "successful" handshake, so the error
        # may surface as a bare SSLError rather than a URLError
        with pytest.raises((urllib.error.URLError, ssl.SSLError, ConnectionError)):
            _https_get(f"{srv.base_url}/version", client_context(certs["ca"]))
        # the failed handshake must not kill the accept loop
        ctx = client_context(certs["ca"], certs["alice"], certs["alice.key"])
        status, body, _ = _https_get(f"{srv.base_url}/version", ctx)
        assert status == 200 and body.strip()
    finally:
        srv.stop()


def test_login_without_cert_is_401(spark, tmp_path):
    """Plain-HTTP /login has no client certificate: 401 'No client
    certificate found' (X509LoginRequestHandler.java:36)."""
    from timely_spark.api import TimelyEngine
    from timely_spark.http_facade import TimelyHttpServer

    eng = TimelyEngine(spark, store_path=str(tmp_path / "metrics"))
    srv = TimelyHttpServer(
        eng, auth_service=AuthenticationService([], allow_anonymous_http=True)
    ).start()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{srv.base_url}/login", timeout=60)
        assert e.value.code == 401
        assert "No client certificate" in json.loads(e.value.read())["message"]
    finally:
        srv.stop()


def test_tcp_put_over_tls(spark, tmp_path, certs):
    """The TCP ingest socket under one-way TLS: line puts arrive intact
    (the reference ships SSL variants of every listener)."""
    from timely_spark.api import TimelyEngine
    from timely_spark.tcp_facade import TimelyTcpServer

    eng = TimelyEngine(spark, store_path=str(tmp_path / "metrics"))
    srv = TimelyTcpServer(
        eng, ssl_context=server_context(certs["server"], certs["server.key"])
    ).start()
    try:
        ctx = client_context(certs["ca"])
        with socket.create_connection((srv.host, srv.port), timeout=10) as raw:
            with ctx.wrap_socket(raw, server_hostname="localhost") as conn:
                # short first segment: branch decision must wait for it
                conn.sendall(b"put ")
                time.sleep(0.05)
                conn.sendall(
                    f"sys.ssl.tcp {TEST_TIME + 1000} 7.0 host=h1\n".encode()
                )
                conn.sendall(b"version\n")
                assert conn.recv(64).strip()  # version reply over TLS
        srv.flush()
        rows = (
            eng.points().filter("metric = 'sys.ssl.tcp'").select("value").collect()
        )
        assert [r["value"] for r in rows] == [7.0]
    finally:
        srv.stop()


def test_ws_tls_and_auth_gate(spark, tmp_path, certs):
    """WS over TLS with two-way auth: an authorized client cert
    upgrades and queries viz-filtered; the ws anonymous flag is enforced
    on the upgrade (allow-anonymous-ws-access)."""
    from timely_spark.api import TimelyEngine
    from timely_spark.ws_facade import TimelyWebSocketServer, make_frame, read_frame

    store = str(tmp_path / "metrics")
    eng = TimelyEngine(spark, store_path=store)
    eng.put_lines([
        f"put sys.ssl.ws {TEST_TIME + 1000} 1.0 host=h1 viz=A",
        f"put sys.ssl.ws {TEST_TIME + 2000} 2.0 host=h1 viz=B",
    ])
    svc = AuthenticationService(
        [TimelyUser(subject_dn=ALICE_DN, issuer_dn=CA_DN, auths=frozenset({"A"}))]
    )
    srv = TimelyWebSocketServer(
        spark, store, engine=eng, auth_service=svc,
        ssl_context=server_context(
            certs["server"], certs["server.key"],
            ca_certs=certs["ca"], require_client_cert=True,
        ),
    ).start()
    try:
        ctx = client_context(certs["ca"], certs["alice"], certs["alice.key"])
        with socket.create_connection((srv.host, srv.port), timeout=10) as raw:
            with ctx.wrap_socket(raw, server_hostname="localhost") as conn:
                conn.sendall(
                    b"GET / HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
                    b"Connection: Upgrade\r\nSec-WebSocket-Key: dGVzdA==\r\n\r\n"
                )
                resp = conn.recv(4096)
                assert b"101" in resp.split(b"\r\n")[0]
                conn.sendall(make_frame(json.dumps({
                    "operation": "query", "start": TEST_TIME,
                    "end": TEST_TIME + 10_000,
                    "queries": [{"aggregator": "none", "metric": "sys.ssl.ws"}],
                }).encode()))
                _, payload = read_frame(conn)
                out = json.loads(payload)["responses"]
                values = sorted(float(v) for sub in out for v in sub["dps"].values())
                assert values == [1.0]  # alice never sees viz=B
    finally:
        srv.stop()


def test_peer_dn_pair_rfc2253_order(certs):
    """The DN string matches Java's getSubjectDN().getName() ordering."""
    srv_ctx = server_context(
        certs["server"], certs["server.key"],
        ca_certs=certs["ca"], require_client_cert=True,
    )
    cli_ctx = client_context(certs["ca"], certs["alice"], certs["alice.key"])
    listener = socket.socket()
    listener.bind(("127.0.0.1", 0))
    listener.listen(1)
    host, port = listener.getsockname()
    wrapped = srv_ctx.wrap_socket(listener, server_side=True)
    result = {}

    import threading

    def serve():
        conn, _ = wrapped.accept()
        result["dn"] = peer_dn_pair(conn)
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    with socket.create_connection((host, port), timeout=10) as raw:
        with cli_ctx.wrap_socket(raw, server_hostname="localhost"):
            pass
    t.join(timeout=10)
    wrapped.close()
    assert result["dn"] == (ALICE_DN, CA_DN)


def test_proxied_entity_chain_over_https(spark, tmp_path, certs):
    """A GUI server (its own client cert) forwards the end user via
    X-ProxiedEntitiesChain/X-ProxiedIssuersChain; results are filtered
    to the CHAIN intersection of auths (TimelyAuthenticationToken +
    AuthenticationService.enforceAccess proxied-user authentication)."""
    from timely_spark.api import TimelyEngine
    from timely_spark.auth import TimelyUser as TU
    from timely_spark.http_facade import TimelyHttpServer

    eng = TimelyEngine(spark, store_path=str(tmp_path / "metrics"))
    eng.put_lines([
        f"put sys.ssl.proxy {TEST_TIME + 1000} 1.0 host=h1 viz=A",
        f"put sys.ssl.proxy {TEST_TIME + 2000} 2.0 host=h1 viz=B",
        f"put sys.ssl.proxy {TEST_TIME + 3000} 3.0 host=h1",
    ])
    # bob's cert plays the GUI server (SERVER-type via OU config is
    # covered in unit tests; here the directory marks it directly)
    svc = AuthenticationService([
        TimelyUser(subject_dn=BOB_DN, issuer_dn=CA_DN,
                   auths=frozenset({"A", "B"}), user_type="SERVER"),
        TU(subject_dn="CN=end user, O=Example Corp", issuer_dn=CA_DN,
           auths=frozenset({"A"})),
    ])
    srv = TimelyHttpServer(
        eng, auth_service=svc,
        ssl_context=server_context(
            certs["server"], certs["server.key"],
            ca_certs=certs["ca"], require_client_cert=True,
        ),
    ).start()
    try:
        ctx = client_context(certs["ca"], certs["bob"], certs["bob.key"])
        query = (
            f"{srv.base_url}/api/query?start={TEST_TIME}&end={TEST_TIME + 10_000}"
            "&m=none:sys.ssl.proxy"
        )
        _, body, _ = _https_get(query, ctx, {
            "X-ProxiedEntitiesChain": "<CN=end user, O=Example Corp>",
            "X-ProxiedIssuersChain": f"<{CA_DN}>",
        })
        vals = sorted(float(v) for sub in json.loads(body) for v in sub["dps"].values())
        # chain intersection {A,B} & {A} = {A}: end user's clearance caps
        assert vals == [1.0, 3.0]
        # without the chain, the server's own auths apply
        _, body, _ = _https_get(query, ctx)
        vals = sorted(float(v) for sub in json.loads(body) for v in sub["dps"].values())
        assert vals == [1.0, 2.0, 3.0]
    finally:
        srv.stop()
