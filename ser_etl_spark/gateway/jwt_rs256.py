"""Pure-stdlib RS256 JWT verification (C10 crypto parity).

The reference verifies Auth0-issued RS256 JWTs with ``pyjwt``
(``/root/reference/api-service/src/auth.py:62-74``: signature +
audience + issuer). No crypto library ships in this sandbox, but RSA
PKCS#1 v1.5 / SHA-256 *verification* needs nothing beyond integer
modular exponentiation (``pow``) and ``hashlib.sha256``:

    EM = sig^e mod n            (textbook RSA public operation)
    EM must equal 0x00 0x01 FF...FF 0x00 || DigestInfo(SHA-256) || H(msg)

per RFC 8017 §8.2.2 (EMSA-PKCS1-v1_5) and RFC 7518 §3.3 (alg RS256).
This module implements exactly that, so :class:`JwksAuthenticator` gets
real cryptographic verification by default — the injectable seams remain
for tests and for swapping in an accelerated library.

Only *verification* lives here. Tests exercise the path end-to-end by
generating a throwaway RSA keypair and signing with the private
exponent (see ``tests/test_gateway.py``) — signing never happens in the
gateway, which holds public JWKS material only.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time
from typing import Any

from ser_etl_spark.gateway.access import AuthError

#: DER DigestInfo prefix for SHA-256 (RFC 8017 §9.2 note 1).
_SHA256_DIGEST_INFO = bytes.fromhex(
    "3031300d060960864801650304020105000420"
)

#: Clock skew allowance for exp/nbf, seconds (pyjwt calls this leeway).
DEFAULT_LEEWAY_S = 30


def b64url_decode(segment: str | bytes) -> bytes:
    """base64url without padding (RFC 7515 §2) -> bytes."""
    if isinstance(segment, str):
        segment = segment.encode("ascii")
    pad = -len(segment) % 4
    try:
        return base64.urlsafe_b64decode(segment + b"=" * pad)
    except Exception as exc:
        raise AuthError("Invalid base64url segment") from exc


def b64url_encode(raw: bytes) -> str:
    return base64.urlsafe_b64encode(raw).rstrip(b"=").decode("ascii")


def peek_header(token: str) -> dict[str, Any]:
    """Unverified JOSE header — the reference reads it pre-verification
    to pick the JWKS key by ``kid`` (``auth.py:44-55``)."""
    try:
        header_b64 = token.split(".")[0]
        header = json.loads(b64url_decode(header_b64))
    except AuthError:
        raise
    except Exception as exc:
        raise AuthError("Invalid token header") from exc
    if not isinstance(header, dict):
        raise AuthError("Invalid token header")
    return header


def _jwk_rsa_numbers(jwk: dict[str, Any]) -> tuple[int, int]:
    """(n, e) from an RSA JWK (RFC 7518 §6.3.1)."""
    if jwk.get("kty") != "RSA":
        raise AuthError("JWK is not an RSA key")
    try:
        n = int.from_bytes(b64url_decode(jwk["n"]), "big")
        e = int.from_bytes(b64url_decode(jwk["e"]), "big")
    except KeyError as exc:
        raise AuthError("JWK missing RSA parameters") from exc
    if n <= 0 or e <= 0:
        raise AuthError("Invalid RSA public numbers")
    return n, e


def verify_rs256_signature(
    signing_input: bytes, signature: bytes, jwk: dict[str, Any]
) -> None:
    """RSASSA-PKCS1-v1_5 / SHA-256 verification (RFC 8017 §8.2.2).

    Builds the ONE valid encoded message for this key size and compares
    it against ``sig^e mod n`` in constant time — the
    encode-then-compare form of the RFC, which structurally rules out
    the classic lenient-padding-parse forgeries (e.g. accepting
    mis-placed digests for e=3 keys).
    """
    n, e = _jwk_rsa_numbers(jwk)
    k = (n.bit_length() + 7) // 8
    if len(signature) != k:
        raise AuthError("Signature length does not match key size")
    s = int.from_bytes(signature, "big")
    if s >= n:
        raise AuthError("Signature out of range")
    em_actual = pow(s, e, n).to_bytes(k, "big")

    digest = hashlib.sha256(signing_input).digest()
    t = _SHA256_DIGEST_INFO + digest
    ps_len = k - len(t) - 3
    if ps_len < 8:
        raise AuthError("RSA key too small for RS256")
    em_expected = b"\x00\x01" + b"\xff" * ps_len + b"\x00" + t
    if not hmac.compare_digest(em_actual, em_expected):
        raise AuthError("Signature verification failed")


def decode_rs256(
    token: str,
    jwk: dict[str, Any],
    audience: str,
    issuer: str,
    *,
    now: float | None = None,
    leeway_s: float = DEFAULT_LEEWAY_S,
) -> dict[str, Any]:
    """Verify an RS256 JWT and return its claims.

    The pyjwt-parity checks the reference relies on (``auth.py:62-74``):
    structure, ``alg`` pinned to RS256 (never taken from an attacker's
    header as anything else — rejects the alg-confusion family),
    signature over ``header.payload``, then ``exp``/``nbf`` with leeway,
    ``aud`` (string or list membership) and ``iss`` equality.
    """
    parts = token.split(".")
    if len(parts) != 3:
        raise AuthError("Token structure invalid")
    header_b64, payload_b64, sig_b64 = parts

    header = peek_header(token)
    if header.get("alg") != "RS256":
        raise AuthError("Unexpected token algorithm")

    signing_input = f"{header_b64}.{payload_b64}".encode("ascii")
    verify_rs256_signature(signing_input, b64url_decode(sig_b64), jwk)

    try:
        claims = json.loads(b64url_decode(payload_b64))
    except Exception as exc:
        raise AuthError("Invalid token payload") from exc
    if not isinstance(claims, dict):
        raise AuthError("Invalid token payload")

    ts = time.time() if now is None else now
    exp = claims.get("exp")
    if exp is not None and ts > float(exp) + leeway_s:
        raise AuthError("Token expired")
    nbf = claims.get("nbf")
    if nbf is not None and ts < float(nbf) - leeway_s:
        raise AuthError("Token not yet valid")

    aud = claims.get("aud")
    auds = aud if isinstance(aud, list) else [aud]
    if audience not in auds:
        raise AuthError("Invalid audience")
    if claims.get("iss") != issuer:
        raise AuthError("Invalid issuer")
    return claims
