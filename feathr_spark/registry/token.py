"""Bearer-token (JWT) validation for the registry HTTP layer.

Mirrors the reference's AAD token decoder and its claims→credential
mapping (all paths relative to /root/reference/):

- ``registry/auth/src/token.rs:25-133`` — ``TokenDecoder`` holds a
  ``kid -> key`` map built from a JWKS document, looks the key up by the
  JWS header's ``kid`` falling back to ``x5t`` (token.rs:85), verifies
  an RS256 signature, and (when ``check_expiration``) rejects tokens
  outside their ``[nbf, exp]`` validity window (token.rs:56-69 —
  ``nbf > now || exp < now`` is ``InvalidTimestamp``; both claims are
  REQUIRED, matching the reference's non-optional serde fields).
- ``registry/raft-registry/src/rbac_middleware.rs:31-58`` — claims map
  to a principal as ``preferred_username | email | upn | unique_name``
  (first present wins) for a user credential, else ``appid`` (which
  must parse as a UUID) for a service-principal credential, else the
  token is rejected as "Invalid token claims".

The cloud-only pieces are replaced by their public-standard mechanics,
no network and no crypto SDK:

- Key material is a JWKS document (RFC 7517) handed to the decoder
  directly (or via an injectable zero-argument fetcher for deployments
  that do hit a discovery endpoint). The reference downloads the same
  ``{"keys": [...]}`` shape from the OpenID configuration's
  ``jwks_uri`` and extracts each key's RSA public half — it reads
  (n, e) out of the x5c certificate; JWKS carries the identical (n, e)
  as base64url fields, so verification is bit-for-bit the same.
- RS256 verification is implemented straight from the public specs:
  RFC 7515 (JWS compact serialization) + RFC 8017 §8.2.2
  (RSASSA-PKCS1-v1_5 VERIFY): ``pow(sig, e, n)`` then an exact,
  constant-time EMSA-PKCS1-v1_5 encoding comparison against the
  SHA-256 DigestInfo of ``header.payload``.
- HS256 (HMAC-SHA256 over the same signing input) is supported for
  ``"kty": "oct"`` JWKS entries — shared-secret deployments and tests.

Like the reference (token.rs:88 "TODO: Use 'alg' header" pins
``Algorithm::RS256``), the algorithm is determined by the RESOLVED
KEY's type, never by the attacker-controlled ``alg`` header — this is
also the standard defense against alg-confusion (``"alg": "none"`` /
RSA-key-as-HMAC-secret) attacks: an RSA key only ever verifies RS256,
an oct key only HS256, and an absent signature never verifies.
"""

from __future__ import annotations

import base64
import binascii
import hashlib
import hmac
import json
import time
import uuid
from typing import Callable, Dict, Optional, Tuple, Union


class AuthError(Exception):
    """Token rejected: malformed, unknown key, bad signature, or outside
    its validity window (the reference's ``AuthError`` enum)."""


# ASN.1 DER DigestInfo prefix for SHA-256 (RFC 8017 §9.2 note 1).
_SHA256_DIGESTINFO = bytes.fromhex(
    "3031300d060960864801650304020105000420")


def _b64url_decode(s: str) -> bytes:
    try:
        return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))
    except (binascii.Error, ValueError) as e:
        raise AuthError(f"invalid base64url segment: {e}") from None


def _b64url_encode(b: bytes) -> str:
    return base64.urlsafe_b64encode(b).rstrip(b"=").decode("ascii")


# key forms: ("rsa", n, e) with n, e ints; ("oct", secret_bytes)
_Key = Union[Tuple[str, int, int], Tuple[str, bytes]]


def jwks_to_keys(jwks: dict) -> Dict[str, _Key]:
    """Build the ``kid -> verification key`` map from a JWKS document.

    Mirrors token.rs:40-47 (and AadKey::into_decoding_key:115-131):
    unusable entries are skipped with the rest kept, so one malformed
    key never takes down the decoder. RSA entries use the JWKS (n, e)
    fields; ``oct`` entries carry an HMAC secret in ``k``.
    """
    keys: Dict[str, _Key] = {}
    for k in jwks.get("keys", []):
        try:
            kid = k["kid"]
            kty = k.get("kty", "RSA")
            if kty == "RSA":
                n = int.from_bytes(_b64url_decode(k["n"]), "big")
                e = int.from_bytes(_b64url_decode(k["e"]), "big")
                if n <= 0 or e <= 0:
                    continue
                keys[kid] = ("rsa", n, e)
            elif kty == "oct":
                keys[kid] = ("oct", _b64url_decode(k["k"]))
        except (KeyError, AuthError, TypeError):
            continue
    return keys


def _emsa_pkcs1_v15(msg: bytes, em_len: int) -> bytes:
    """EMSA-PKCS1-v1_5 encoding of SHA-256(msg) (RFC 8017 §9.2)."""
    t = _SHA256_DIGESTINFO + hashlib.sha256(msg).digest()
    if em_len < len(t) + 11:
        raise AuthError("RSA modulus too small for RS256")
    return b"\x00\x01" + b"\xff" * (em_len - len(t) - 3) + b"\x00" + t


def _verify_rs256(n: int, e: int, signing_input: bytes,
                  sig: bytes) -> bool:
    """RSASSA-PKCS1-v1_5 VERIFY (RFC 8017 §8.2.2): full-encoding
    comparison, immune to Bleichenbacher-style forgery shortcuts."""
    k = (n.bit_length() + 7) // 8
    if len(sig) != k:
        return False
    s = int.from_bytes(sig, "big")
    if s >= n:
        return False
    em = pow(s, e, n).to_bytes(k, "big")
    return hmac.compare_digest(em, _emsa_pkcs1_v15(signing_input, k))


class TokenDecoder:
    """Verify-and-decode for JWS compact tokens (token.rs:25-94).

    ``jwks`` is the key document; alternatively pass ``fetcher`` (a
    zero-argument callable returning the JWKS dict — the seam where the
    reference performs its OpenID discovery + jwks_uri download,
    token.rs:31-48). ``clock`` is injectable for tests.
    """

    def __init__(self, jwks: Optional[dict] = None, *,
                 fetcher: Optional[Callable[[], dict]] = None,
                 clock: Callable[[], float] = time.time):
        if jwks is None:
            if fetcher is None:
                raise ValueError("TokenDecoder needs jwks or fetcher")
            jwks = fetcher()
        self._keys = jwks_to_keys(jwks)
        self._clock = clock

    def decode(self, token: str, check_expiration: bool = True) -> dict:
        """Return the verified claims dict or raise :class:`AuthError`.

        Matches token.rs decode_token(:49-70) + the unvalidated-claims
        helper (:80-93): header kid (or x5t) selects the key, the
        signature must verify, and with ``check_expiration`` the claims
        MUST carry ``nbf``/``exp`` with ``nbf <= now <= exp``.
        """
        parts = token.strip().split(".")
        if len(parts) != 3:
            raise AuthError("invalid token: not a JWS compact string")
        h_b64, p_b64, s_b64 = parts
        try:
            header = json.loads(_b64url_decode(h_b64))
        except (json.JSONDecodeError, UnicodeDecodeError):
            raise AuthError("invalid token: bad header") from None
        if not isinstance(header, dict):
            raise AuthError("invalid token: bad header")
        kid = header.get("kid") or header.get("x5t")
        if not kid:
            raise AuthError("invalid token: no kid/x5t in header")
        key = self._keys.get(kid)
        if key is None:
            raise AuthError(f"key not found: {kid}")
        signing_input = f"{h_b64}.{p_b64}".encode("ascii")
        sig = _b64url_decode(s_b64)
        if key[0] == "rsa":
            ok = _verify_rs256(key[1], key[2], signing_input, sig)
        else:
            mac = hmac.new(key[1], signing_input, hashlib.sha256).digest()
            ok = hmac.compare_digest(mac, sig)
        if not ok:
            raise AuthError("invalid token: signature verification failed")
        try:
            claims = json.loads(_b64url_decode(p_b64))
        except (json.JSONDecodeError, UnicodeDecodeError):
            raise AuthError("invalid token: bad claims") from None
        if not isinstance(claims, dict):
            raise AuthError("invalid token: bad claims")
        if check_expiration:
            try:
                nbf = float(claims["nbf"])
                exp = float(claims["exp"])
            except (KeyError, TypeError, ValueError):
                raise AuthError(
                    "invalid token: missing/bad nbf or exp") from None
            now = self._clock()
            if nbf > now or exp < now:
                raise AuthError("invalid timestamp: token expired "
                                "or not yet valid")
        return claims


def credential_from_claims(claims: dict) -> str:
    """Principal string from verified claims
    (rbac_middleware.rs:42-58): ``preferred_username | email | upn |
    unique_name`` (first present) is a user credential; else ``appid``
    must parse as a UUID (a service principal — rendered as the
    canonical lowercase UUID string, since this registry's RBAC keys
    grants by plain credential strings, see rbac.py module docstring);
    else the claims are invalid.
    """
    for c in ("preferred_username", "email", "upn", "unique_name"):
        v = claims.get(c)
        if isinstance(v, str) and v:
            return v
    appid = claims.get("appid")
    if isinstance(appid, str) and appid:
        try:
            return str(uuid.UUID(appid))
        except ValueError:
            raise AuthError(f"invalid appid: {appid!r}") from None
    raise AuthError("invalid token claims: no principal claim")


def encode_token(claims: dict, *, kid: str,
                 hs256_secret: Optional[bytes] = None,
                 rsa_private: Optional[Tuple[int, int]] = None,
                 header_extra: Optional[dict] = None) -> str:
    """Mint a JWS compact token (test/dev utility — the inverse of
    :meth:`TokenDecoder.decode`). ``rsa_private`` is ``(n, d)``."""
    if (hs256_secret is None) == (rsa_private is None):
        raise ValueError("exactly one of hs256_secret/rsa_private")
    alg = "HS256" if hs256_secret is not None else "RS256"
    header = {"alg": alg, "typ": "JWT", "kid": kid}
    if header_extra:
        header.update(header_extra)
    h_b64 = _b64url_encode(json.dumps(
        header, separators=(",", ":")).encode())
    p_b64 = _b64url_encode(json.dumps(
        claims, separators=(",", ":")).encode())
    signing_input = f"{h_b64}.{p_b64}".encode("ascii")
    if hs256_secret is not None:
        sig = hmac.new(hs256_secret, signing_input,
                       hashlib.sha256).digest()
    else:
        n, d = rsa_private
        k = (n.bit_length() + 7) // 8
        em = _emsa_pkcs1_v15(signing_input, k)
        sig = pow(int.from_bytes(em, "big"), d, n).to_bytes(k, "big")
    return f"{h_b64}.{p_b64}.{_b64url_encode(sig)}"
