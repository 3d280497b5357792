"""Session authentication for the transport facades — login sessions,
JSON Web Tokens, X509 subject DNs, and required-role/auth gating.

Reference surface (all public source):

* ``common/src/main/java/timely/auth/TimelyUser.java`` — the user record
  (dn pair, userType, auths, roles, creation/expiration times).
* ``common/src/main/java/timely/auth/TimelyPrincipal.java`` — a proxy
  chain of users; the primary user is the first USER-type entry
  (TimelyPrincipal.java:85-100).
* ``common/src/main/java/timely/auth/FileUserDetailsService.java`` — the
  file-configured dn -> TimelyUser map consulted at login.
* ``common/src/main/java/timely/auth/JWTTokenHandler.java`` — converts a
  signed JWT's ``principals`` claim into TimelyUsers, downgrading each
  user's auths to the intersection with the store user's auths
  (JWTTokenHandler.java:88-97).
* ``common/src/main/java/timely/common/component/AuthenticationService.java``
  — session cache keyed by session id / entity name, ``enforceAccess``
  (401 decision tree, :108-121) and ``checkAllowedAccess`` (required
  roles/auths, :188-216).
* ``common/src/main/java/timely/netty/http/auth/TimelyLoginRequestHandler.java``
  — login issues a UUID session id delivered as the ``TSESSIONID``
  cookie (netty/Constants.java:10).

Like the reference (JWTTokenHandler.init reads an RSA public key from a
keystore, JWTTokenHandler.java:43-79), asymmetric verification is
supported natively: RS256 (RSASSA-PKCS1-v1_5 with SHA-256, RFC 8017
§8.2.2) implemented from the public spec with stdlib only — PEM/DER
public-key parse, modular exponentiation, EMSA-PKCS1-v1_5 padding
check. HS256 (HMAC-SHA256, RFC 7518 §3.2) remains the symmetric path;
other schemes (ES256 &c.) plug in through the ``verifier`` callable on
:class:`JWTTokenHandler`.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time
import uuid
from dataclasses import dataclass, field

__all__ = [
    "AuthenticationService",
    "JWTTokenHandler",
    "TimelyPrincipal",
    "TimelyUser",
    "UnauthorizedError",
    "dn_pair_name",
    "parse_rsa_public_key",
    "rs256_verifier",
    "split_proxied_dns",
]

PROXIED_ENTITIES_HEADER = "X-ProxiedEntitiesChain"  # TimelyAuthenticationToken.java:21
PROXIED_ISSUERS_HEADER = "X-ProxiedIssuersChain"


def split_proxied_dns(proxied: str) -> list[str]:
    """``<dn1><dn2>`` -> [dn1, dn2], splitting on unescaped angle
    brackets and unescaping (ProxiedEntityUtils.splitProxiedDNs)."""
    if "<" not in proxied:
        return [proxied]
    out: list[str] = []
    cur: list[str] = []
    prev = ""
    for ch in proxied:
        if ch in "<>" and prev != "\\":
            piece = "".join(cur).strip()
            if piece:
                out.append(piece.replace("\\<", "<").replace("\\>", ">"))
            cur = []
        else:
            cur.append(ch)
        prev = ch
    piece = "".join(cur).strip()
    if piece:
        out.append(piece.replace("\\<", "<").replace("\\>", ">"))
    return out


class UnauthorizedError(Exception):
    """401 — TimelyException(HttpResponseStatus.UNAUTHORIZED, ...)."""

    status = 401


def dn_pair_name(subject_dn: str, issuer_dn: str | None) -> str:
    """``subjectDn<issuerDn>`` with ``<``/``>`` escaped inside each DN —
    SubjectIssuerDNPair.toString -> ProxiedEntityUtils.buildProxiedDN
    (ProxiedEntityUtils.java:76-86); a missing issuer renders ``dn<>``."""

    def esc(dn: str) -> str:
        out, prev = [], ""
        for ch in dn:
            if ch in "<>" and prev != "\\":
                out.append("\\")
            out.append(ch)
            prev = ch
        return "".join(out)

    if issuer_dn is None:
        return esc(subject_dn) + "<>"
    return f"{esc(subject_dn)}<{esc(issuer_dn)}>"


@dataclass(frozen=True)
class TimelyUser:
    """TimelyUser.java:80-98 (JSON field names match the @JsonProperty
    contract: dn/userType/auths/roles/creationTime/expirationTime)."""

    subject_dn: str
    issuer_dn: str | None = None
    auths: frozenset[str] = frozenset()
    roles: frozenset[str] = frozenset()
    user_type: str = "USER"  # UserType.USER | SERVER
    creation_time: int = -1
    expiration_time: int = -1

    @property
    def name(self) -> str:
        return dn_pair_name(self.subject_dn, self.issuer_dn)

    def to_json(self) -> dict:
        return {
            "dn": {"subjectDN": self.subject_dn, "issuerDN": self.issuer_dn},
            "userType": self.user_type,
            "auths": sorted(self.auths),
            "roles": sorted(self.roles),
            "creationTime": self.creation_time,
            "expirationTime": self.expiration_time,
        }

    @classmethod
    def from_json(cls, obj: dict) -> "TimelyUser":
        dn = obj["dn"]
        return cls(
            subject_dn=dn["subjectDN"],
            issuer_dn=dn.get("issuerDN"),
            auths=frozenset(obj.get("auths") or ()),
            roles=frozenset(obj.get("roles") or ()),
            user_type=obj.get("userType", "USER"),
            creation_time=int(obj.get("creationTime", -1)),
            expiration_time=int(obj.get("expirationTime", -1)),
        )


ANONYMOUS_USER = TimelyUser(subject_dn="ANONYMOUS")  # TimelyUser.java:29


@dataclass(frozen=True)
class TimelyPrincipal:
    """A proxy chain of users (GUI server acting for an end user).

    ``primary_user``: first USER-type entry, else the chain head
    (TimelyPrincipal.findPrimaryUser, TimelyPrincipal.java:85-100).
    ``effective_auths``: the intersection across the chain — every link
    must be cleared for a label to survive, the minimizing semantics of
    AuthorizationsMinimizer.java.
    """

    proxied_users: tuple[TimelyUser, ...]
    creation_time: int = field(default=-1)

    @classmethod
    def of(cls, *users: TimelyUser, creation_time: int | None = None) -> "TimelyPrincipal":
        if creation_time is None:
            creation_time = int(time.time() * 1000)
        return cls(proxied_users=tuple(users), creation_time=creation_time)

    @classmethod
    def anonymous(cls) -> "TimelyPrincipal":
        return cls.of(ANONYMOUS_USER, creation_time=-1)

    @property
    def primary_user(self) -> TimelyUser:
        for u in self.proxied_users:
            if u.user_type == "USER":
                return u
        return self.proxied_users[0]

    @property
    def name(self) -> str:
        primary = self.primary_user
        rest = [u for u in self.proxied_users if u is not primary]
        return " -> ".join(u.name for u in [primary, *rest])

    @property
    def effective_auths(self) -> frozenset[str]:
        auths = self.primary_user.auths
        for u in self.proxied_users:
            auths = auths & u.auths
        return auths

    @property
    def is_anonymous(self) -> bool:
        return all(u.subject_dn == "ANONYMOUS" for u in self.proxied_users)


# --------------------------------------------------------------------- JWT


def _b64url(raw: bytes) -> str:
    return base64.urlsafe_b64encode(raw).rstrip(b"=").decode("ascii")


def _b64url_decode(data: str) -> bytes:
    pad = -len(data) % 4
    return base64.urlsafe_b64decode(data + "=" * pad)


# ------------------------------------------------- RS256 (RFC 8017, stdlib)


def _der_read_tlv(buf: bytes, pos: int) -> tuple[int, bytes, int]:
    """One DER TLV: returns (tag, value, next_pos). Definite lengths only
    (DER forbids indefinite), rejects truncation."""
    if pos + 2 > len(buf):
        raise ValueError("truncated DER")
    tag = buf[pos]
    ln = buf[pos + 1]
    pos += 2
    if ln & 0x80:
        n = ln & 0x7F
        if n == 0 or n > 8 or pos + n > len(buf):
            raise ValueError("bad DER length")
        ln = int.from_bytes(buf[pos : pos + n], "big")
        pos += n
    if pos + ln > len(buf):
        raise ValueError("truncated DER value")
    return tag, buf[pos : pos + ln], pos + ln


def _der_int(buf: bytes, pos: int) -> tuple[int, int]:
    tag, val, nxt = _der_read_tlv(buf, pos)
    if tag != 0x02:
        raise ValueError(f"expected DER INTEGER, got tag 0x{tag:02x}")
    return int.from_bytes(val, "big"), nxt


_RSA_OID = bytes.fromhex("2a864886f70d010101")  # 1.2.840.113549.1.1.1


def parse_rsa_public_key(pem_or_der: bytes | str) -> tuple[int, int]:
    """(n, e) from an RSA public key — PEM or DER, SubjectPublicKeyInfo
    (``BEGIN PUBLIC KEY``, RFC 5280) or PKCS#1 (``BEGIN RSA PUBLIC
    KEY``, RFC 8017 A.1.1). Mirrors the key material JWTTokenHandler.init
    loads from its keystore (JWTTokenHandler.java:43-79); stdlib only."""
    data = pem_or_der.encode() if isinstance(pem_or_der, str) else pem_or_der
    if b"-----BEGIN" in data:
        lines = [
            l.strip()
            for l in data.splitlines()
            if l.strip() and not l.startswith(b"-----")
        ]
        data = base64.b64decode(b"".join(lines))
    tag, body, _ = _der_read_tlv(data, 0)
    if tag != 0x30:
        raise ValueError("RSA key: outer SEQUENCE missing")
    # SPKI: SEQUENCE { SEQUENCE { OID rsaEncryption, NULL }, BIT STRING { PKCS#1 } }
    inner_tag, inner, nxt = _der_read_tlv(body, 0)
    if inner_tag == 0x30 and _RSA_OID in inner:
        bs_tag, bs, _ = _der_read_tlv(body, nxt)
        if bs_tag != 0x03 or not bs or bs[0] != 0:
            raise ValueError("RSA key: malformed BIT STRING")
        _, body, _ = _der_read_tlv(bs[1:], 0)  # the PKCS#1 SEQUENCE
        n, p = _der_int(body, 0)
        e, _ = _der_int(body, p)
    elif inner_tag == 0x02:  # bare PKCS#1: SEQUENCE { n, e }
        n, p = _der_int(body, 0)
        e, _ = _der_int(body, p)
    else:
        raise ValueError("not an RSA public key (SPKI or PKCS#1)")
    if n <= 0 or e <= 0:
        raise ValueError("RSA key: non-positive modulus/exponent")
    return n, e


# DigestInfo prefix for SHA-256 (RFC 8017 §9.2 note 1)
_SHA256_DIGESTINFO = bytes.fromhex("3031300d060960864801650304020105000420")


def rs256_verifier(public_key: bytes | str):
    """Default asymmetric ``verifier`` for :class:`JWTTokenHandler`:
    RSASSA-PKCS1-v1_5 / SHA-256 per RFC 8017 §8.2.2, from the public
    spec with stdlib only (the container has no crypto lib). The padding
    is checked by CONSTRUCTING the one legal encoded message and
    comparing whole — no parse-then-trust of attacker-controlled
    padding (immune to Bleichenbacher'06-style lenient-parse bugs).
    Verification uses only public key material, so no constant-time
    obligations apply."""
    n, e = parse_rsa_public_key(public_key)
    k = (n.bit_length() + 7) // 8

    def verify(signing_input: bytes, signature: bytes, header: dict) -> bool:
        if header.get("alg") != "RS256":
            raise UnauthorizedError(f"Unsupported JWT alg {header.get('alg')}")
        if len(signature) != k:
            return False
        s = int.from_bytes(signature, "big")
        if s >= n:
            return False
        em = pow(s, e, n).to_bytes(k, "big")
        h = hashlib.sha256(signing_input).digest()
        t = _SHA256_DIGESTINFO + h
        ps_len = k - len(t) - 3
        if ps_len < 8:
            return False
        expect = b"\x00\x01" + b"\xff" * ps_len + b"\x00" + t
        return hmac.compare_digest(em, expect)

    return verify


class JWTTokenHandler:
    """String JWT <-> TimelyUsers (JWTTokenHandler.java:35-99).

    ``key``: HS256 HMAC secret. ``public_key``: RSA public key (PEM or
    DER) — when set, RS256 verification is the default, mirroring the
    keystore public key of JWTTokenHandler.init (JWTTokenHandler.java:43-79).
    ``verifier``: optional override callable
    ``(signing_input: bytes, signature: bytes, header: dict) -> bool``
    — the seam where other schemes (ES256 &c.) plug in; takes
    precedence over both built-ins.
    """

    PRINCIPALS_CLAIM = "principals"  # AuthenticationService.java:48

    def __init__(self, key: bytes, root_auths=None, verifier=None,
                 public_key: bytes | str | None = None):
        self.key = key
        # accumuloAuths analogue: the store user's own auth set; user
        # auths are downgraded to this intersection (JWTTokenHandler.java:66-72)
        self.root_auths = None if root_auths is None else frozenset(root_auths)
        if verifier is None and public_key is not None:
            verifier = rs256_verifier(public_key)
        self.verifier = verifier

    # -- encode (test/emitter side; the authorization service's role) ----
    def create_token(
        self,
        users: list[TimelyUser],
        subject: str | None = None,
        expires_in: int | None = None,
        claim_name: str = PRINCIPALS_CLAIM,
    ) -> str:
        header = {"alg": "HS256", "typ": "JWT"}
        claims: dict = {claim_name: [u.to_json() for u in users]}
        if subject:
            claims["sub"] = subject
        if expires_in is not None:
            claims["exp"] = int(time.time()) + int(expires_in)
        signing_input = (
            _b64url(json.dumps(header, separators=(",", ":")).encode())
            + "."
            + _b64url(json.dumps(claims, separators=(",", ":")).encode())
        ).encode("ascii")
        sig = hmac.new(self.key, signing_input, hashlib.sha256).digest()
        return signing_input.decode("ascii") + "." + _b64url(sig)

    # -- decode + verify -------------------------------------------------
    def decode(self, token: str) -> dict:
        try:
            head_b64, claims_b64, sig_b64 = token.split(".")
            header = json.loads(_b64url_decode(head_b64))
            signature = _b64url_decode(sig_b64)
        except (ValueError, json.JSONDecodeError) as e:
            raise UnauthorizedError(f"Malformed JWT: {e}") from None
        signing_input = f"{head_b64}.{claims_b64}".encode("ascii")
        if self.verifier is not None:
            ok = self.verifier(signing_input, signature, header)
        else:
            if header.get("alg") != "HS256":
                raise UnauthorizedError(f"Unsupported JWT alg {header.get('alg')}")
            expect = hmac.new(self.key, signing_input, hashlib.sha256).digest()
            ok = hmac.compare_digest(expect, signature)
        if not ok:
            raise UnauthorizedError("JWT signature verification failed")
        claims = json.loads(_b64url_decode(claims_b64))
        exp = claims.get("exp")
        if exp is not None and time.time() >= float(exp):
            raise UnauthorizedError("JWT expired")
        return claims

    def create_users_from_token(
        self, token: str, claim_name: str = PRINCIPALS_CLAIM
    ) -> list[TimelyUser]:
        claims = self.decode(token)
        principals = claims.get(claim_name)
        if not principals:
            # JWTTokenHandler.java:84-86
            raise UnauthorizedError(
                f"JWT for {claims.get('sub')} does not contain any proxied principals."
            )
        users = [TimelyUser.from_json(o) for o in principals]
        if self.root_auths is not None:
            users = [
                TimelyUser(
                    subject_dn=u.subject_dn,
                    issuer_dn=u.issuer_dn,
                    auths=u.auths & self.root_auths,
                    roles=u.roles,
                    user_type=u.user_type,
                    creation_time=u.creation_time,
                    expiration_time=u.expiration_time,
                )
                for u in users
            ]
        return users


# ----------------------------------------------------------- auth service


class AuthenticationService:
    """Login sessions + request authentication for the facades.

    Mirrors AuthenticationService.java: an expiring cache keyed by
    session id (and entity name for token-derived principals), the
    ``enforceAccess`` 401 decision tree, and ``checkAllowedAccess``
    required-role/auth gating. ``authorized_users`` plays
    FileUserDetailsService's file-configured user map; the
    ``security.authorized-users`` block of the reference's
    application.yml (server/src/test/resources/config/application.yml:43)
    is exactly a list of such records.
    """

    COOKIE_NAME = "TSESSIONID"  # netty/Constants.java:10
    AUTH_HEADER = "Authorization"

    def __init__(
        self,
        authorized_users: list[TimelyUser] = (),
        jwt: JWTTokenHandler | None = None,
        session_max_age: int = 86400,
        allow_anonymous_http: bool = False,
        allow_anonymous_ws: bool = False,
        required_roles: set[str] | None = None,
        required_auths: set[str] | None = None,
        server_ous: set[str] | None = None,
    ):
        """``server_ous``: OU values identifying non-person (server)
        entities in a DN — DnUtils.NpeUtils's configured
        ``npe.ou.entries`` list; a chain's primary user is the first
        entry NOT matching one (TimelyPrincipal.findPrimaryUser)."""
        self.server_ous = {o.upper() for o in (server_ous or ())}
        self._users: dict[str, TimelyUser] = {}
        for u in authorized_users:
            # FileUserDetailsService.setUsers keys by full dn-pair name;
            # accept bare subject-dn lookups too (cert without issuer cfg)
            self._users[u.name] = u
            self._users.setdefault(u.subject_dn, u)
        self.jwt = jwt
        self.session_max_age = session_max_age
        self.allow_anonymous_http = allow_anonymous_http
        self.allow_anonymous_ws = allow_anonymous_ws
        self.required_roles = frozenset(required_roles or ())
        self.required_auths = frozenset(required_auths or ())
        self._cache: dict[str, tuple[TimelyPrincipal, float]] = {}

    # -- cache (AuthCache analogue) --------------------------------------
    def _cache_get(self, key: str) -> TimelyPrincipal | None:
        hit = self._cache.get(key)
        if hit is None:
            return None
        principal, expiry = hit
        if time.monotonic() >= expiry:
            del self._cache[key]
            return None
        return principal

    def _cache_put(self, key: str, principal: TimelyPrincipal) -> None:
        self._cache[key] = (principal, time.monotonic() + self.session_max_age)

    # -- login (TimelyLoginRequestHandler.channelRead0) ------------------
    def login(self, subject_dn: str, issuer_dn: str | None = None) -> tuple[str, TimelyPrincipal]:
        """Authenticate a DN against the authorized-user map and mint a
        session id for the TSESSIONID cookie. Unknown DN -> 401
        (FileUserDetailsService.loadUserDetails)."""
        user = self._users.get(dn_pair_name(subject_dn, issuer_dn)) or self._users.get(
            subject_dn
        )
        if user is None:
            raise UnauthorizedError(f"{subject_dn} not configured.")
        principal = TimelyPrincipal.of(user)
        session_id = str(uuid.uuid4())
        self._cache_put(session_id, principal)
        return session_id, principal

    def logout(self, session_id: str) -> None:
        self._cache.pop(session_id, None)

    # -- request authentication (HttpRequestDecoder.decode order) --------
    def _lookup_user(self, subject: str, issuer: str | None) -> TimelyUser:
        user = self._users.get(dn_pair_name(subject, issuer)) or self._users.get(
            subject
        )
        if user is None:
            raise UnauthorizedError(f"{subject} not configured.")
        if self.server_ous and user.user_type == "USER":
            # re-type by OU (DnUtils.isServerDN) so chain primary-user
            # selection works even when the directory entry didn't say
            ous = {
                part.split("=", 1)[1].strip().upper()
                for part in subject.split(",")
                if part.strip().upper().startswith("OU=")
            }
            if ous & self.server_ous:
                user = TimelyUser(
                    subject_dn=user.subject_dn,
                    issuer_dn=user.issuer_dn,
                    auths=user.auths,
                    roles=user.roles,
                    user_type="SERVER",
                    creation_time=user.creation_time,
                    expiration_time=user.expiration_time,
                )
        return user

    def _proxied_chain_principal(
        self,
        client_cert_dn: tuple[str, str | None],
        proxied_entities: str,
        proxied_issuers: str | None,
    ) -> TimelyPrincipal:
        """X-ProxiedEntitiesChain handling: the TLS peer (the proxying
        server) heads the chain; each forwarded entity is authenticated
        against the user directory and the combined principal's
        effective auths are the chain intersection
        (TimelyAuthenticationToken.java:35-69, AuthenticationService
        enforceAccess authenticating every proxied user)."""
        if proxied_issuers is None:
            raise UnauthorizedError(
                f"{PROXIED_ENTITIES_HEADER} supplied, but missing "
                f"{PROXIED_ISSUERS_HEADER}"
            )
        subjects = split_proxied_dns(proxied_entities)
        issuers = split_proxied_dns(proxied_issuers)
        if len(subjects) != len(issuers):
            raise UnauthorizedError(
                "Proxied subjects and issuers don't match up. "
                f"Subjects={proxied_entities} , Issuers={proxied_issuers}"
            )
        users = [self._lookup_user(*client_cert_dn)]
        users += [self._lookup_user(s, i) for s, i in zip(subjects, issuers)]
        principal = TimelyPrincipal.of(*users)
        self._cache_put(principal.name, principal)
        self._check_allowed_access(principal.primary_user)
        return principal

    def authenticate_request(
        self,
        auth_header: str | None = None,
        session_id: str | None = None,
        client_cert_dn: tuple[str, str | None] | None = None,
        proxied_entities: str | None = None,
        proxied_issuers: str | None = None,
    ) -> TimelyPrincipal:
        """Resolve a request to a principal, in the reference's priority
        order (HttpRequestDecoder.java:117-137): Authorization header
        (JWT) > session cookie > TLS client certificate > anonymous.
        Raises UnauthorizedError for a bad token, an unknown session id
        (AuthenticationService.java:116-120), or a cert DN that is not an
        authorized user; the caller decides whether anonymous access
        downgrades the failure (enforce_access)."""
        if auth_header:
            token = auth_header.split(None, 1)[1] if " " in auth_header else auth_header
            if self.jwt is None:
                raise UnauthorizedError("JWT authentication is not configured")
            users = self.jwt.create_users_from_token(token)
            principal = TimelyPrincipal.of(*users)
            self._cache_put(principal.name, principal)
            self._check_allowed_access(principal.primary_user)
            return principal
        if session_id:
            principal = self._cache_get(session_id)
            if principal is None:
                raise UnauthorizedError(
                    "Unknown session id was submitted, log in again"
                )
            self._check_allowed_access(principal.primary_user)
            return principal
        if client_cert_dn is not None:
            if proxied_entities is not None:
                return self._proxied_chain_principal(
                    client_cert_dn, proxied_entities, proxied_issuers
                )
            subject, issuer = client_cert_dn
            cached = self._cache_get(dn_pair_name(subject, issuer))
            if cached is not None:
                self._check_allowed_access(cached.primary_user)
                return cached
            _, principal = self.login(subject, issuer)
            self._cache_put(dn_pair_name(subject, issuer), principal)
            self._check_allowed_access(principal.primary_user)
            return principal
        raise UnauthorizedError(
            "User must authenticate with a client certificate, OAuth token, or login credentials"
        )

    def enforce_access(
        self,
        auth_header: str | None = None,
        session_id: str | None = None,
        client_cert_dn: tuple[str, str | None] | None = None,
        transport: str = "http",
        proxied_entities: str | None = None,
        proxied_issuers: str | None = None,
    ) -> TimelyPrincipal:
        """authenticate_request + the anonymous-access downgrade
        (HttpRequestDecoder.java:149-157: enforceAccess failures pass
        through as anonymous when allow-anonymous-*-access is set)."""
        allow_anon = (
            self.allow_anonymous_ws if transport == "ws" else self.allow_anonymous_http
        )
        try:
            return self.authenticate_request(
                auth_header,
                session_id,
                client_cert_dn,
                proxied_entities=proxied_entities,
                proxied_issuers=proxied_issuers,
            )
        except UnauthorizedError:
            if allow_anon:
                return TimelyPrincipal.anonymous()
            raise

    # -- required roles/auths (AuthenticationService.java:188-216) -------
    def _check_allowed_access(self, primary: TimelyUser) -> None:
        missing_roles = sorted(self.required_roles - primary.roles)
        missing_auths = sorted(self.required_auths - primary.auths)
        if not missing_roles and not missing_auths:
            return
        if missing_roles and missing_auths:
            msg = (
                f"User:{primary.name} is missing role(s):{missing_roles}"
                f" and auth(s):{missing_auths}"
            )
        elif missing_roles:
            msg = f"User:{primary.name} is missing role(s):{missing_roles}"
        else:
            msg = f"User:{primary.name} is missing auths(s):{missing_auths}"
        raise UnauthorizedError(msg)
