"""Auth subsystem unit tests — JWT, principals, sessions, required
roles/auths — plus the JWT-over-HTTP integration path.

Reference shapes: JWTTokenHandler.java (principals claim, auth
downgrade), TimelyPrincipal.java (primary user, proxy chain),
AuthenticationService.java:108-216 (enforceAccess decision tree,
checkAllowedAccess messages), FileUserDetailsService.java (authorized
users), TimelyLoginRequestHandler.java (session cookie lifecycle).
"""

import json
import time
import urllib.error
import urllib.request

import pytest

from timely_spark.auth import (
    AuthenticationService,
    JWTTokenHandler,
    TimelyPrincipal,
    TimelyUser,
    UnauthorizedError,
    dn_pair_name,
)

ALICE = TimelyUser(
    subject_dn="CN=alice, OU=dev, O=example",
    issuer_dn="CN=example ca",
    auths=frozenset({"A"}),
    roles=frozenset({"G", "H"}),
)
BOB = TimelyUser(
    subject_dn="CN=bob, OU=dev, O=example",
    issuer_dn="CN=example ca",
    auths=frozenset({"A", "B"}),
    roles=frozenset({"G"}),
)


# --------------------------------------------------------------- dn pairs


def test_dn_pair_name_escapes_angle_brackets():
    # ProxiedEntityUtils.buildProxiedDN escapes unescaped < and >
    assert dn_pair_name("cn=a<b>c", "cn=ca") == "cn=a\\<b\\>c<cn=ca>"
    assert dn_pair_name("cn=x", None) == "cn=x<>"


def test_principal_primary_user_and_intersection():
    server = TimelyUser(
        subject_dn="CN=gui server", user_type="SERVER", auths=frozenset({"A", "B"})
    )
    # server first in the chain (the caller), end user behind it —
    # primary is the first USER-type entry (TimelyPrincipal.java:85-100)
    p = TimelyPrincipal.of(server, BOB)
    assert p.primary_user is BOB
    # every chain link must hold an auth for it to survive
    assert p.effective_auths == frozenset({"A", "B"})
    p2 = TimelyPrincipal.of(server, ALICE)
    assert p2.effective_auths == frozenset({"A"})
    assert p2.name.startswith(ALICE.name)  # primary leads the name


# -------------------------------------------------------------------- JWT


@pytest.fixture()
def jwt():
    return JWTTokenHandler(key=b"test-secret", root_auths={"A", "B", "C"})


def test_jwt_roundtrip_downgrades_to_root_auths(jwt):
    u = TimelyUser(
        subject_dn="CN=alice", auths=frozenset({"A", "B", "Z"}), roles=frozenset({"G"})
    )
    token = jwt.create_token([u], subject="alice", expires_in=300)
    users = jwt.create_users_from_token(token)
    assert len(users) == 1
    # Z is not held by the store user: downgraded (JWTTokenHandler.java:88-97)
    assert users[0].auths == frozenset({"A", "B"})
    assert users[0].roles == frozenset({"G"})


def test_jwt_rejects_tampered_and_expired(jwt):
    u = TimelyUser(subject_dn="CN=alice", auths=frozenset({"A"}))
    token = jwt.create_token([u], expires_in=300)
    with pytest.raises(UnauthorizedError):
        jwt.decode(token[:-4] + "AAAA")
    expired = jwt.create_token([u], expires_in=-1)
    with pytest.raises(UnauthorizedError, match="expired"):
        jwt.decode(expired)
    with pytest.raises(UnauthorizedError, match="Malformed"):
        jwt.decode("not-a-jwt")


def test_jwt_empty_principals_claim_rejected(jwt):
    token = jwt.create_token([], subject="nobody")
    with pytest.raises(UnauthorizedError, match="does not contain any proxied"):
        jwt.create_users_from_token(token)


# ------------------------------------------------------------- RS256


def _rs256_token(key_path, claims: dict, tmp_path, alg: str = "RS256") -> str:
    """Build an RS256 JWT signed with the openssl CLI (the independent
    implementation the stdlib verifier is checked against)."""
    import base64
    import json
    import subprocess

    b64 = lambda b: base64.urlsafe_b64encode(b).rstrip(b"=").decode()
    signing = (
        b64(json.dumps({"alg": alg, "typ": "JWT"}).encode())
        + "."
        + b64(json.dumps(claims).encode())
    )
    inp = tmp_path / "signing_input"
    inp.write_bytes(signing.encode())
    sig = subprocess.run(
        ["openssl", "dgst", "-sha256", "-sign", str(key_path), str(inp)],
        check=True, capture_output=True,
    ).stdout
    return signing + "." + b64(sig)


@pytest.fixture(scope="module")
def rsa_keypair(tmp_path_factory):
    import subprocess

    d = tmp_path_factory.mktemp("rsa")
    key, pub = d / "key.pem", d / "pub.pem"
    subprocess.run(["openssl", "genrsa", "-out", str(key), "2048"],
                   check=True, capture_output=True)
    subprocess.run(
        ["openssl", "rsa", "-in", str(key), "-pubout", "-out", str(pub)],
        check=True, capture_output=True,
    )
    return key, pub


def test_rs256_verify_openssl_signed_token(rsa_keypair, tmp_path):
    """VERDICT r5 item #4: RS256 (RFC 8017 RSASSA-PKCS1-v1_5, stdlib
    implementation) verifies a token signed by an INDEPENDENT
    implementation (openssl CLI), mirroring the keystore public key of
    JWTTokenHandler.init (JWTTokenHandler.java:43-79). Good token
    accepted; tampered claims and truncated/corrupted signatures
    rejected; HS256 path unchanged."""
    key, pub = rsa_keypair
    h = JWTTokenHandler(
        key=b"", root_auths={"A", "B"}, public_key=pub.read_bytes()
    )
    u = TimelyUser(subject_dn="CN=alice", auths=frozenset({"A", "Z"}))
    claims = {"principals": [u.to_json()], "sub": "alice"}
    token = _rs256_token(key, claims, tmp_path)
    users = h.create_users_from_token(token)
    assert users[0].subject_dn == "CN=alice"
    assert users[0].auths == frozenset({"A"})  # downgraded to root auths

    # tampered payload: same signature, different claims
    head, _payload, sig = token.split(".")
    import base64 as b64mod
    import json as jsonmod

    evil = (
        b64mod.urlsafe_b64encode(
            jsonmod.dumps({"principals": [u.to_json()], "sub": "mallory"}).encode()
        ).rstrip(b"=").decode()
    )
    with pytest.raises(UnauthorizedError, match="signature"):
        h.decode(f"{head}.{evil}.{sig}")
    # corrupted signature bytes
    bad_sig = ("A" if sig[0] != "A" else "B") + sig[1:]
    with pytest.raises(UnauthorizedError, match="signature"):
        h.decode(f"{head}.{_payload}.{bad_sig}")
    # truncated signature (wrong length k)
    with pytest.raises(UnauthorizedError, match="signature"):
        h.decode(f"{head}.{_payload}.{sig[:-8]}")
    # an HS256 token must NOT pass an RS256-configured handler
    hs = JWTTokenHandler(key=b"test-secret")
    hs_token = hs.create_token([u], subject="alice")
    with pytest.raises(UnauthorizedError, match="alg"):
        h.decode(hs_token)
    # and the plain HS256 handler still round-trips (path unchanged)
    assert hs.create_users_from_token(hs_token)[0].subject_dn == "CN=alice"


def test_rsa_public_key_parse_forms(rsa_keypair):
    """The parser accepts SPKI PEM (BEGIN PUBLIC KEY), PKCS#1 PEM
    (BEGIN RSA PUBLIC KEY) and raw DER, all yielding the same (n, e);
    garbage is rejected loudly."""
    import base64
    import subprocess

    from timely_spark.auth import parse_rsa_public_key

    key, pub = rsa_keypair
    spki_pem = pub.read_bytes()
    n1, e1 = parse_rsa_public_key(spki_pem)
    pkcs1_pem = subprocess.run(
        ["openssl", "rsa", "-in", str(key), "-pubout", "-RSAPublicKey_out"],
        check=True, capture_output=True,
    ).stdout
    assert parse_rsa_public_key(pkcs1_pem) == (n1, e1)
    body = b"".join(
        l.strip() for l in spki_pem.splitlines() if not l.startswith(b"-----")
    )
    assert parse_rsa_public_key(base64.b64decode(body)) == (n1, e1)
    assert e1 == 65537 and n1.bit_length() == 2048
    with pytest.raises(ValueError):
        parse_rsa_public_key(b"not a key at all")


# --------------------------------------------------------------- sessions


def test_login_and_session_resolution():
    svc = AuthenticationService([ALICE, BOB])
    sid, principal = svc.login(ALICE.subject_dn, ALICE.issuer_dn)
    assert principal.primary_user == ALICE
    assert svc.authenticate_request(session_id=sid).effective_auths == frozenset({"A"})
    svc.logout(sid)
    with pytest.raises(UnauthorizedError, match="Unknown session id"):
        svc.authenticate_request(session_id=sid)


def test_login_unknown_dn_rejected():
    svc = AuthenticationService([ALICE])
    with pytest.raises(UnauthorizedError, match="not configured"):
        svc.login("CN=mallory")


def test_session_expiry():
    svc = AuthenticationService([ALICE], session_max_age=0)
    sid, _ = svc.login(ALICE.subject_dn, ALICE.issuer_dn)
    time.sleep(0.01)
    with pytest.raises(UnauthorizedError, match="Unknown session id"):
        svc.authenticate_request(session_id=sid)


def test_enforce_access_decision_tree():
    svc = AuthenticationService([ALICE])
    # nothing at all -> the exact 401 (AuthenticationService.java:113-115)
    with pytest.raises(UnauthorizedError, match="must authenticate"):
        svc.authenticate_request()
    # anonymous downgrade when allowed (HttpRequestDecoder.java:149-157)
    anon_ok = AuthenticationService([ALICE], allow_anonymous_http=True)
    p = anon_ok.enforce_access()
    assert p.is_anonymous and p.effective_auths == frozenset()
    # ws flag is independent of http flag
    with pytest.raises(UnauthorizedError):
        anon_ok.enforce_access(transport="ws")


def test_client_cert_dn_resolution():
    svc = AuthenticationService([ALICE])
    p = svc.authenticate_request(
        client_cert_dn=(ALICE.subject_dn, ALICE.issuer_dn)
    )
    assert p.primary_user == ALICE
    with pytest.raises(UnauthorizedError, match="not configured"):
        svc.authenticate_request(client_cert_dn=("CN=mallory", "CN=example ca"))


def test_required_roles_and_auths_messages():
    # AuthenticationService.checkAllowedAccess message shapes (:188-216)
    svc = AuthenticationService(
        [ALICE, BOB], required_roles={"G", "H"}, required_auths={"A"}
    )
    assert svc.authenticate_request(
        client_cert_dn=(ALICE.subject_dn, ALICE.issuer_dn)
    ).primary_user == ALICE
    with pytest.raises(UnauthorizedError, match=r"missing role\(s\):\['H'\]"):
        svc.authenticate_request(client_cert_dn=(BOB.subject_dn, BOB.issuer_dn))
    svc2 = AuthenticationService([ALICE], required_auths={"A", "B", "C"})
    with pytest.raises(UnauthorizedError, match=r"missing auths\(s\):\['B', 'C'\]"):
        svc2.authenticate_request(client_cert_dn=(ALICE.subject_dn, ALICE.issuer_dn))


def test_jwt_request_respects_required_gates(jwt):
    svc = AuthenticationService([], jwt=jwt, required_roles={"ADMIN"})
    u = TimelyUser(subject_dn="CN=alice", auths=frozenset({"A"}), roles=frozenset({"G"}))
    token = jwt.create_token([u], expires_in=300)
    with pytest.raises(UnauthorizedError, match="missing role"):
        svc.authenticate_request(auth_header=f"Bearer {token}")


# -------------------------------------------------- JWT over the HTTP wire

TEST_TIME = 1_447_767_900_000 - (1_447_767_900_000 % 3_600_000)


def _get_json(url, headers=None):
    req = urllib.request.Request(url)
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read().decode("utf-8"))


def test_http_jwt_bearer_viz(spark, tmp_path):
    """Authorization: Bearer <jwt> resolves per-request and the token's
    auths visibility-filter the query (HttpRequestDecoder.java:117-119 ->
    JWTTokenHandler -> viz scan)."""
    from timely_spark.api import TimelyEngine
    from timely_spark.http_facade import TimelyHttpServer

    eng = TimelyEngine(spark, store_path=str(tmp_path / "metrics"))
    eng.put_lines(
        [
            f"put sys.jwt.test {TEST_TIME + 1000} 1.0 host=h1 viz=A",
            f"put sys.jwt.test {TEST_TIME + 2000} 2.0 host=h1 viz=B",
            f"put sys.jwt.test {TEST_TIME + 3000} 3.0 host=h1",
        ]
    )
    jwt = JWTTokenHandler(key=b"wire-secret", root_auths={"A", "B"})
    svc = AuthenticationService([], jwt=jwt)
    srv = TimelyHttpServer(eng, auth_service=svc).start()
    try:
        query = (
            f"{srv.base_url}/api/query?start={TEST_TIME}&end={TEST_TIME + 10_000}"
            "&m=none:sys.jwt.test"
        )
        alice = jwt.create_token(
            [TimelyUser(subject_dn="CN=alice", auths=frozenset({"A"}))],
            expires_in=300,
        )
        status, out = _get_json(query, {"Authorization": f"Bearer {alice}"})
        values = sorted(
            float(v) for sub in out for v in sub["dps"].values()
        )
        assert values == [1.0, 3.0]  # A-labeled + unlabeled, never B

        # no token at all: anonymous disallowed -> 401
        with pytest.raises(urllib.error.HTTPError) as e:
            _get_json(query)
        assert e.value.code == 401

        # garbage token -> 401
        with pytest.raises(urllib.error.HTTPError) as e:
            _get_json(query, {"Authorization": "Bearer junk.junk.junk"})
        assert e.value.code == 401
    finally:
        srv.stop()


# --------------------------------------------- proxied entity chains


def test_split_proxied_dns():
    from timely_spark.auth import split_proxied_dns

    assert split_proxied_dns("cn=a") == ["cn=a"]
    assert split_proxied_dns("<cn=a><cn=b>") == ["cn=a", "cn=b"]
    # escaped brackets stay inside the DN (ProxiedEntityUtils escaping)
    assert split_proxied_dns("<cn=a\\<x\\>><cn=b>") == ["cn=a<x>", "cn=b"]


def test_proxied_chain_intersection_and_primary():
    """X-ProxiedEntitiesChain: the TLS peer (GUI server) heads the
    chain, the forwarded end user is primary, and effective auths are
    the chain intersection (TimelyAuthenticationToken.java:35-69)."""
    from timely_spark.auth import PROXIED_ENTITIES_HEADER

    gui = TimelyUser(
        subject_dn="CN=gui, OU=servers, O=example", issuer_dn="CN=example ca",
        auths=frozenset({"A", "B"}), user_type="SERVER",
    )
    svc = AuthenticationService([gui, ALICE, BOB], server_ous={"servers"})
    p = svc.authenticate_request(
        client_cert_dn=(gui.subject_dn, gui.issuer_dn),
        proxied_entities=f"<{BOB.subject_dn}>",
        proxied_issuers=f"<{BOB.issuer_dn}>",
    )
    assert p.primary_user.subject_dn == BOB.subject_dn
    # bob holds {A,B}, gui holds {A,B} -> intersection {A,B}
    assert p.effective_auths == frozenset({"A", "B"})
    # alice holds only {A}: the chain drops B
    p2 = svc.authenticate_request(
        client_cert_dn=(gui.subject_dn, gui.issuer_dn),
        proxied_entities=f"<{ALICE.subject_dn}>",
        proxied_issuers=f"<{ALICE.issuer_dn}>",
    )
    assert p2.effective_auths == frozenset({"A"})
    # entities without issuers -> the reference's exact failure
    with pytest.raises(UnauthorizedError, match="missing"):
        svc.authenticate_request(
            client_cert_dn=(gui.subject_dn, gui.issuer_dn),
            proxied_entities=f"<{ALICE.subject_dn}>",
        )
    # unknown forwarded entity -> 401
    with pytest.raises(UnauthorizedError, match="not configured"):
        svc.authenticate_request(
            client_cert_dn=(gui.subject_dn, gui.issuer_dn),
            proxied_entities="<CN=mallory>",
            proxied_issuers="<CN=example ca>",
        )
    assert PROXIED_ENTITIES_HEADER == "X-ProxiedEntitiesChain"


def test_server_ou_retyping_picks_end_user_as_primary():
    """A directory entry not marked SERVER still heads the chain as a
    server when its OU is in the configured npe list (DnUtils.isServerDN)."""
    gui = TimelyUser(
        subject_dn="CN=gui, OU=ingest servers, O=example",
        issuer_dn="CN=example ca", auths=frozenset({"A"}),
    )
    svc = AuthenticationService([gui, ALICE], server_ous={"ingest servers"})
    p = svc.authenticate_request(
        client_cert_dn=(gui.subject_dn, gui.issuer_dn),
        proxied_entities=f"<{ALICE.subject_dn}>",
        proxied_issuers=f"<{ALICE.issuer_dn}>",
    )
    assert p.primary_user.subject_dn == ALICE.subject_dn


def test_authenticated_routes_401_without_session(spark, tmp_path):
    """Every AuthenticatedRequest route (suggest, lookup, metrics,
    aggregators, cache — AggregatorsRequest.java:14 et al.) answers 401
    without credentials when anonymous access is off; /version stays
    open (VersionRequest is not authenticated)."""
    from timely_spark.api import TimelyEngine
    from timely_spark.http_facade import TimelyHttpServer

    eng = TimelyEngine(spark, store_path=str(tmp_path / "metrics"))
    srv = TimelyHttpServer(eng, auth_service=AuthenticationService([])).start()
    try:
        for path in (
            "/api/suggest?m=x",
            "/api/search/lookup?m=x",
            "/api/metrics",
            "/api/aggregators",
            "/api/cache",
        ):
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(srv.base_url + path, timeout=60)
            assert e.value.code == 401, path
        with urllib.request.urlopen(srv.base_url + "/version", timeout=60) as r:
            assert r.status == 200
    finally:
        srv.stop()
