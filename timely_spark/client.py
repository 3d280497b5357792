"""Client library — the Python counterpart of the reference's
``client/`` module, so a reference user's emitters and subscribers can
switch without changing their call patterns.

Reference parity (all public source, client/src/main/java/timely/client):

* ``tcp/TcpClient.java`` — buffered line writer with exponential
  reconnect backoff (1 s doubling to 60 s), size- and latency-triggered
  flush.
* ``udp/UdpClient.java`` — one datagram per write.
* ``http/HttpClient.java`` — TLS context + cookie-jar HTTP access; the
  login flow stores the TSESSIONID session cookie.
* ``websocket/WebSocketClient.java`` +
  ``subscription/WebSocketSubscriptionClient.java`` — optional
  certificate login over HTTPS first (cookie carried onto the WS
  upgrade), ``create`` sent on open, ``add``/``remove`` subscription
  ops, a handler callback per server push, ``close`` on shutdown.

Transport only — servers are the facades in this package; payload
shapes are the same JSON the reference serializes.
"""

from __future__ import annotations

import json
import os
import socket
import ssl as _ssl
import struct
import threading
import time
import urllib.request
import uuid
from http.cookiejar import CookieJar
from typing import Callable

from .ws_facade import read_frame

__all__ = [
    "TimelyHttpClient",
    "TimelySubscriptionClient",
    "TimelyTcpClient",
    "TimelyUdpClient",
]

_INIT_BACKOFF = 1.0  # TcpClient.java:21-22
_MAX_BACKOFF = 60.0


class TimelyTcpClient:
    """Line-protocol writer with reconnect backoff (TcpClient.java)."""

    def __init__(self, host: str, port: int, buffer_size: int = -1,
                 latency_s: float = -1.0, ssl_context=None):
        self.host, self.port = host, port
        self.buffer_size = buffer_size
        self.latency_s = latency_s
        self.ssl_context = ssl_context
        self._sock: socket.socket | None = None
        self._buf: list[bytes] = []
        self._writes_since_flush = 0
        self._last_flush = time.monotonic()
        self._connect_time = 0.0
        self._backoff = _INIT_BACKOFF
        self._lock = threading.Lock()

    def open(self) -> "TimelyTcpClient":
        if self._connect() != 0:
            raise OSError(f"cannot connect to {self.host}:{self.port}")
        return self

    def write(self, metric: str) -> None:
        """``metric``: newline-terminated put line (TcpClient.write)."""
        with self._lock:
            if self._connect() != 0:
                raise OSError(f"cannot connect to {self.host}:{self.port}")
            self._buf.append(metric.encode("utf-8"))
            self._writes_since_flush += 1
            if self.buffer_size > 0 and self._writes_since_flush >= self.buffer_size:
                self._flush_locked()
            elif self.latency_s > 0 and (
                time.monotonic() - self._last_flush
            ) >= self.latency_s:
                self._flush_locked()
            elif self.buffer_size <= 0:
                self._flush_locked()  # unbuffered mode writes through

    def flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def _flush_locked(self) -> None:
        if not self._buf or self._sock is None:
            self._last_flush = time.monotonic()
            return
        data = b"".join(self._buf)
        try:
            self._sock.sendall(data)
        except OSError:
            self._reset()
            raise
        self._buf.clear()
        self._writes_since_flush = 0
        self._last_flush = time.monotonic()

    def _connect(self) -> int:
        if self._sock is not None:
            return 0
        # backoff window: refuse to re-dial before it elapses
        # (TcpClient.connect, doubling to the 60 s cap)
        now = time.monotonic()
        if now <= self._connect_time + self._backoff and self._connect_time > 0:
            return -1
        try:
            self._connect_time = now
            raw = socket.create_connection((self.host, self.port), timeout=10)
            if self.ssl_context is not None:
                raw = self.ssl_context.wrap_socket(raw, server_hostname=self.host)
            self._sock = raw
            self._backoff = _INIT_BACKOFF
            return 0
        except OSError:
            self._backoff = min(self._backoff * 2, _MAX_BACKOFF)
            return -1

    def _reset(self) -> None:
        try:
            if self._sock is not None:
                self._sock.close()
        except OSError:
            pass
        self._sock = None
        self._backoff = _INIT_BACKOFF
        self._writes_since_flush = 0
        self._last_flush = time.monotonic()

    def close(self) -> None:
        with self._lock:
            if self._sock is not None:
                try:
                    self._flush_locked()
                except OSError:
                    pass
                try:
                    self._sock.close()
                finally:
                    self._sock = None

    def __enter__(self):
        return self.open()

    def __exit__(self, *exc):
        self.close()


class TimelyUdpClient:
    """One datagram per write (UdpClient.java)."""

    def __init__(self, host: str, port: int):
        self.addr = (host, port)
        self._sock: socket.socket | None = None

    def open(self) -> "TimelyUdpClient":
        if self._sock is None:
            self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        return self

    def write(self, metric: str) -> None:
        if self._sock is None:
            raise RuntimeError("Must call open first")  # UdpClient.java:38
        self._sock.sendto(metric.encode("utf-8"), self.addr)

    def flush(self) -> None:  # parity no-op (UdpClient.java:46)
        pass

    def close(self) -> None:
        if self._sock is not None:
            self._sock.close()
            self._sock = None

    def __enter__(self):
        return self.open()

    def __exit__(self, *exc):
        self.close()


class TimelyHttpClient:
    """Cookie-aware HTTP API client (HttpClient.java + the login flow of
    WebSocketClient.open). ``ssl_context`` from
    :func:`timely_spark.tls.client_context` engages HTTPS and, with a
    client cert loaded, certificate login."""

    def __init__(self, host: str, port: int, ssl_context=None,
                 jwt_token: str | None = None):
        self.host, self.port = host, port
        self.ssl_context = ssl_context
        self.jwt_token = jwt_token
        scheme = "https" if ssl_context is not None else "http"
        self.base_url = f"{scheme}://{host}:{port}"
        self.cookies = CookieJar()
        handlers = [urllib.request.HTTPCookieProcessor(self.cookies)]
        if ssl_context is not None:
            handlers.append(urllib.request.HTTPSHandler(context=ssl_context))
        self._opener = urllib.request.build_opener(*handlers)

    def _request(self, path: str, body=None):
        req = urllib.request.Request(
            self.base_url + path,
            data=None if body is None else json.dumps(body).encode("utf-8"),
            method="GET" if body is None else "POST",
        )
        if body is not None:
            req.add_header("Content-Type", "application/json")
        if self.jwt_token:
            req.add_header("Authorization", f"Bearer {self.jwt_token}")
        with self._opener.open(req, timeout=60) as r:
            raw = r.read()
        return json.loads(raw) if raw and raw.strip().startswith((b"{", b"[")) else raw.decode("utf-8")

    def login(self) -> str:
        """GET /login; the TSESSIONID cookie lands in the jar and rides
        every later call. Returns the session id."""
        self._request("/login")
        for c in self.cookies:
            if c.name == "TSESSIONID":
                return c.value
        raise RuntimeError("login did not set a TSESSIONID cookie")

    def session_cookie(self) -> str | None:
        for c in self.cookies:
            if c.name == "TSESSIONID":
                return c.value
        return None

    def put(self, metrics: list[dict]) -> None:
        self._request("/api/put", metrics)

    def query(self, request: dict) -> list:
        return self._request("/api/query", request)

    def suggest(self, q: str, kind: str = "metrics", max_results: int = 25,
                tag: str | None = None) -> list:
        t = f"&t={urllib.request.quote(tag)}" if tag else ""
        return self._request(
            f"/api/suggest?type={kind}&m={urllib.request.quote(q)}&max={max_results}{t}"
        )

    def lookup(self, m: str, limit: int = 25) -> dict:
        return self._request(
            f"/api/search/lookup?m={urllib.request.quote(m)}&limit={limit}"
        )

    def metrics(self) -> dict:
        req = urllib.request.Request(self.base_url + "/api/metrics")
        req.add_header("Accept", "application/json")
        with self._opener.open(req, timeout=60) as r:
            return json.loads(r.read())

    def aggregators(self) -> list:
        return self._request("/api/aggregators")

    def version(self) -> str:
        return self._request("/version").strip()


def _client_frame(payload: bytes, opcode: int = 0x1) -> bytes:
    """Client frames MUST be masked (RFC 6455 §5.3)."""
    head = bytes([0x80 | opcode])
    ln = len(payload)
    if ln < 126:
        head += bytes([0x80 | ln])
    elif ln < 1 << 16:
        head += bytes([0x80 | 126]) + struct.pack(">H", ln)
    else:
        head += bytes([0x80 | 127]) + struct.pack(">Q", ln)
    mask = os.urandom(4)
    return head + mask + bytes(c ^ mask[i % 4] for i, c in enumerate(payload))


class TimelySubscriptionClient:
    """WebSocketSubscriptionClient.java: connect (optionally after a
    certificate login over HTTPS whose session cookie rides the WS
    upgrade), send ``create`` on open, stream server pushes to a
    handler callback, ``close`` the subscription on shutdown."""

    def __init__(
        self,
        host: str,
        ws_port: int,
        https_port: int | None = None,
        ssl_context=None,
        do_login: bool = False,
        subscription_id: str | None = None,
    ):
        self.host = host
        self.ws_port = ws_port
        self.https_port = https_port
        self.ssl_context = ssl_context
        self.do_login = do_login
        self.subscription_id = subscription_id or str(uuid.uuid4())
        self._sock: socket.socket | None = None
        self._reader: threading.Thread | None = None
        self._wlock = threading.Lock()
        self.closed = True

    def open(self, handler: Callable[[dict], None]) -> "TimelySubscriptionClient":
        cookie = None
        if self.do_login:
            http = TimelyHttpClient(
                self.host, self.https_port, ssl_context=self.ssl_context
            )
            session_id = http.login()
            cookie = f"TSESSIONID={session_id}"
        raw = socket.create_connection((self.host, self.ws_port), timeout=30)
        if self.ssl_context is not None:
            raw = self.ssl_context.wrap_socket(raw, server_hostname=self.host)
        key = "dGhlIHNhbXBsZSBub25jZQ=="
        upgrade = (
            f"GET /websocket HTTP/1.1\r\nHost: {self.host}\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n"
        )
        if cookie:
            upgrade += f"Cookie: {cookie}\r\n"
        raw.sendall((upgrade + "\r\n").encode("ascii"))
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = raw.recv(4096)
            if not chunk:
                raise ConnectionError("WS upgrade refused")
            resp += chunk
        status = resp.split(b"\r\n", 1)[0]
        if b"101" not in status:
            raise ConnectionError(f"WS upgrade failed: {status.decode('latin-1')}")
        self._sock = raw
        self.closed = False
        self._send({"operation": "create", "subscriptionId": self.subscription_id})
        self._reader = threading.Thread(
            target=self._read_loop, args=(handler,), daemon=True
        )
        self._reader.start()
        return self

    def _send(self, obj: dict) -> None:
        if self._sock is None:
            raise RuntimeError("Must call open first")
        with self._wlock:
            self._sock.sendall(
                _client_frame(json.dumps(obj, separators=(",", ":")).encode("utf-8"))
            )

    def _read_loop(self, handler: Callable[[dict], None]) -> None:
        try:
            while not self.closed:
                opcode, payload = read_frame(self._sock)
                if opcode == 0x8:
                    return
                if opcode == 0x9:
                    with self._wlock:
                        self._sock.sendall(_client_frame(payload, opcode=0xA))
                    continue
                if opcode == 0x1 and payload:
                    handler(json.loads(payload))
        except (OSError, ValueError, _ssl.SSLError):
            pass  # connection torn down

    def add_subscription(self, metric: str, tags: dict[str, str] | None = None,
                         start_time_ms: int = 0, end_time_ms: int = 0,
                         delay_time_ms: int = 0) -> None:
        msg = {
            "operation": "add",
            "subscriptionId": self.subscription_id,
            "metric": metric,
            "startTime": start_time_ms,
            "endTime": end_time_ms,
        }
        if tags:
            msg["tags"] = tags
        if delay_time_ms:
            msg["delayTime"] = delay_time_ms
        self._send(msg)

    def remove_subscription(self, metric: str) -> None:
        self._send(
            {
                "operation": "remove",
                "subscriptionId": self.subscription_id,
                "metric": metric,
            }
        )

    def request_version(self) -> None:
        self._send({"operation": "version"})

    def close(self) -> None:
        if self._sock is not None and not self.closed:
            try:
                self._send(
                    {"operation": "close", "subscriptionId": self.subscription_id}
                )
                with self._wlock:
                    self._sock.sendall(_client_frame(b"", opcode=0x8))
            except OSError:
                pass
        self.closed = True
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None
