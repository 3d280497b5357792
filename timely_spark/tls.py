"""TLS for the transport facades — one-way and two-way (mutual) SSL.

Reference surface: every reference listener ships SSL variants —
``server/src/main/java/timely/netty`` builds its Netty channel pipelines
over an ``SslContext`` configured by ``server-ssl`` properties
(common/src/main/java/timely/common/configuration/SslServerProperties.java),
and the integration tests exercise both modes
(server/src/test/java/timely/server/integration/OneWaySSLBase.java,
TwoWaySSLBase.java, TwoWaySSLFailureIT.java). Two-way SSL is also an
auth source: the client certificate's subject/issuer DN feeds login
(X509LoginRequestHandler.java:34-47).

Spark mapping: the facades are stdlib socket servers, so TLS is stdlib
``ssl`` — wrap the listening socket; mutual auth sets
``ssl.CERT_REQUIRED`` with a trust store, and :func:`peer_dn_pair`
recovers the (subject, issuer) DN strings a Java
``cert.getSubjectDN().getName()`` would produce (RFC 2253 order,
most-specific RDN first).
"""

from __future__ import annotations

import ssl

__all__ = ["client_context", "peer_dn_pair", "server_context"]


def server_context(
    certfile: str,
    keyfile: str,
    ca_certs: str | None = None,
    require_client_cert: bool = False,
) -> ssl.SSLContext:
    """One-way SSL by default; ``require_client_cert=True`` is the
    reference's two-way mode (SslServerProperties trustStore +
    clientAuth), rejecting bare clients at the handshake like
    TwoWaySSLFailureIT expects."""
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(certfile, keyfile)
    if ca_certs:
        ctx.load_verify_locations(ca_certs)
    if require_client_cert:
        ctx.verify_mode = ssl.CERT_REQUIRED
    return ctx


def client_context(
    ca_certs: str | None = None,
    certfile: str | None = None,
    keyfile: str | None = None,
) -> ssl.SSLContext:
    """Client side: trust the given CA (or disable verification for
    generated-keypair tests, mirroring ignore-ssl-handshake-errors in the
    reference's test application.yml); cert+key engage two-way SSL."""
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    if ca_certs:
        ctx.load_verify_locations(ca_certs)
        ctx.check_hostname = False
    else:
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
    if certfile:
        ctx.load_cert_chain(certfile, keyfile)
    return ctx


_OID_NAMES = {
    "commonName": "CN",
    "organizationalUnitName": "OU",
    "organizationName": "O",
    "localityName": "L",
    "stateOrProvinceName": "ST",
    "countryName": "C",
    "emailAddress": "EMAILADDRESS",
    "domainComponent": "DC",
}


def _dn_string(rdns: tuple) -> str:
    """getpeercert() subject/issuer tuples -> an RFC 2253 DN string.

    Python yields RDNs in certificate (encoding) order, least-specific
    first; Java's ``X500Principal.getName()`` emits most-specific first
    ("CN=..., OU=..., O=..."), which is the shape the reference's
    authorized-users config matches on — so reverse."""
    parts = []
    for rdn in reversed(rdns):
        for key, value in rdn:
            parts.append(f"{_OID_NAMES.get(key, key)}={value}")
    return ", ".join(parts)


def peer_dn_pair(sslsock: ssl.SSLSocket) -> tuple[str, str] | None:
    """(subjectDN, issuerDN) of the verified peer certificate, or None
    when the handshake carried no client cert (one-way SSL)."""
    cert = sslsock.getpeercert()
    if not cert or "subject" not in cert:
        return None
    return _dn_string(cert["subject"]), _dn_string(cert["issuer"])
