"""Bearer-token validation tests (VERDICT r9 item 3): pure-Python
RS256/HS256 JWT verification mirroring the reference's
registry/auth/src/token.rs:25-133 decoder semantics and the
rbac_middleware.rs:31-58 claims→credential mapping, plus localhost
HTTP E2E with valid / expired / garbage / missing tokens.
"""

import base64
import json
import urllib.error
import urllib.request

import pytest

from feathr_spark.registry.api import RegistryApi
from feathr_spark.registry.catalog import Registry
from feathr_spark.registry.http import RegistryHttpServer
from feathr_spark.registry.rbac import GLOBAL_SCOPE, Permission, RbacStore
from feathr_spark.registry.token import (
    AuthError, TokenDecoder, credential_from_claims, encode_token,
    jwks_to_keys,
)

# Fixed 1024-bit RSA pair (deterministically generated for tests; public
# math only). e = 65537.
RSA_N = int(
    "0x6f6f8a0468c649b3d6e7c9079c4fee61f62b4b6427a5f2226f56c69dd9bccb86"
    "3fa50aa75554e27537ca6a8ee56b1715bab8e75d2d0cc5ab517122465fa780f5"
    "2037f9991f20e186b17e0a387d5f5a992b5cce2ea574df92b12204e76abab6f7"
    "bbb4f7790760048ddab7502ccca53006ceab3947b64b9d977d52cb9d9cf5d043", 16)
RSA_D = int(
    "0x585ed7d0cf561034b2047603b70e1c394b82e1f2b70e7e8a9848f491518ecac7"
    "d7c9063dd509cfdcad35b47345b43b465c212e3951f482fd6d448eadc8458999"
    "cebb2226af74c3959cb04032b48db38bfac1f8f7600237835a2e2795d39af1ca"
    "3f175c65e3d7af5b02d17d3875fa7b8f61e9f1e6732791035bab83936a016ba1", 16)
RSA_E = 65537


def _b64u(b: bytes) -> str:
    return base64.urlsafe_b64encode(b).rstrip(b"=").decode()


def _int_b64u(n: int) -> str:
    return _b64u(n.to_bytes((n.bit_length() + 7) // 8, "big"))


SECRET = b"shared-secret-for-tests"
JWKS = {"keys": [
    {"kty": "RSA", "kid": "rsa-1", "use": "sig",
     "n": _int_b64u(RSA_N), "e": _int_b64u(RSA_E)},
    {"kty": "oct", "kid": "hs-1", "k": _b64u(SECRET)},
    # malformed entry: must be skipped, not fatal (token.rs:40-47
    # filter_map semantics)
    {"kty": "RSA", "kid": "broken"},
]}

NOW = 1_700_000_000.0
LIVE = {"nbf": NOW - 60, "exp": NOW + 3600}


def _decoder():
    return TokenDecoder(JWKS, clock=lambda: NOW)


def _rs(claims, kid="rsa-1", **kw):
    return encode_token(claims, kid=kid, rsa_private=(RSA_N, RSA_D), **kw)


def _hs(claims, kid="hs-1", secret=SECRET, **kw):
    return encode_token(claims, kid=kid, hs256_secret=secret, **kw)


def test_jwks_skips_malformed_entries():
    keys = jwks_to_keys(JWKS)
    assert set(keys) == {"rsa-1", "hs-1"}


def test_rs256_round_trip_and_claims():
    claims = dict(LIVE, preferred_username="alice", scp="user.read")
    out = _decoder().decode(_rs(claims))
    assert out["preferred_username"] == "alice"
    assert credential_from_claims(out) == "alice"


def test_hs256_round_trip():
    out = _decoder().decode(_hs(dict(LIVE, upn="bob@contoso.com")))
    assert credential_from_claims(out) == "bob@contoso.com"


def test_bearer_prefix_and_whitespace_trimmed():
    # token.rs:65 trims; the middleware strips the "Bearer" prefix
    tok = "  " + _rs(dict(LIVE, email="c@d.e")) + " \n"
    assert _decoder().decode(tok)["email"] == "c@d.e"


def test_tampered_payload_rejected():
    tok = _rs(dict(LIVE, preferred_username="alice"))
    h, p, s = tok.split(".")
    forged = _b64u(json.dumps(
        dict(LIVE, preferred_username="mallory")).encode())
    with pytest.raises(AuthError, match="signature"):
        _decoder().decode(f"{h}.{forged}.{s}")


def test_wrong_rsa_key_rejected():
    # sign with d+2 (not the valid exponent) -> verification fails
    bad = encode_token(dict(LIVE, upn="x"), kid="rsa-1",
                       rsa_private=(RSA_N, RSA_D + 2))
    with pytest.raises(AuthError, match="signature"):
        _decoder().decode(bad)


def test_alg_confusion_rejected():
    # an HS256 token pointing at the RSA kid must NOT verify with the
    # public modulus as an HMAC secret: the resolved KEY's type picks
    # the algorithm (token.rs:88 pins RS256), not the alg header
    n_bytes = RSA_N.to_bytes((RSA_N.bit_length() + 7) // 8, "big")
    confused = _hs(dict(LIVE, upn="evil"), kid="rsa-1", secret=n_bytes)
    with pytest.raises(AuthError, match="signature"):
        _decoder().decode(confused)


def test_unknown_kid_and_missing_kid():
    with pytest.raises(AuthError, match="key not found"):
        _decoder().decode(_hs(dict(LIVE, upn="x"), kid="nope"))
    h = _b64u(json.dumps({"alg": "HS256"}).encode())
    p = _b64u(json.dumps(dict(LIVE, upn="x")).encode())
    with pytest.raises(AuthError, match="kid"):
        _decoder().decode(f"{h}.{p}.{_b64u(b'sig')}")


def test_x5t_fallback_selects_key():
    # token.rs:85: kid falls back to the x5t thumbprint header
    tok = _hs(dict(LIVE, upn="t@x.y"), kid="hs-1")
    h, p, s = tok.split(".")
    hdr = json.loads(base64.urlsafe_b64decode(h + "=="))
    del hdr["kid"]
    hdr["x5t"] = "hs-1"
    h2 = _b64u(json.dumps(hdr, separators=(",", ":")).encode())
    # re-sign since the header changed
    import hashlib
    import hmac as hmac_mod
    sig = hmac_mod.new(SECRET, f"{h2}.{p}".encode(),
                       hashlib.sha256).digest()
    assert _decoder().decode(
        f"{h2}.{p}.{_b64u(sig)}")["upn"] == "t@x.y"


def test_validity_window():
    d = _decoder()
    with pytest.raises(AuthError, match="timestamp"):
        d.decode(_hs({"nbf": NOW - 100, "exp": NOW - 10, "upn": "x"}))
    with pytest.raises(AuthError, match="timestamp"):
        d.decode(_hs({"nbf": NOW + 100, "exp": NOW + 200, "upn": "x"}))
    # exactly at the boundary is valid (nbf <= now <= exp)
    assert d.decode(_hs({"nbf": NOW, "exp": NOW, "upn": "x"}))
    # nbf/exp are REQUIRED claims when checking (reference serde fields
    # are non-optional)
    with pytest.raises(AuthError, match="nbf or exp"):
        d.decode(_hs({"upn": "x"}))
    # check_expiration=False mirrors token.rs:49's toggle
    assert d.decode(_hs({"upn": "x"}),
                    check_expiration=False)["upn"] == "x"


def test_garbage_tokens():
    d = _decoder()
    for garbage in ("", "not-a-token", "a.b", "a.b.c.d",
                    "!!!.???.###",
                    _b64u(b"[1,2]") + "." + _b64u(b"{}") + ".AA"):
        with pytest.raises(AuthError):
            d.decode(garbage)


def test_credential_mapping_precedence_and_appid():
    # rbac_middleware.rs:42-49 precedence order
    assert credential_from_claims(
        {"preferred_username": "a", "email": "b", "upn": "c",
         "unique_name": "d"}) == "a"
    assert credential_from_claims({"email": "b", "upn": "c"}) == "b"
    assert credential_from_claims({"unique_name": "d"}) == "d"
    # appid must be a UUID (rbac_middleware.rs:51-54), canonicalized
    u = credential_from_claims(
        {"appid": "00000000-0000-0000-0000-0000000000AB"})
    assert u == "00000000-0000-0000-0000-0000000000ab"
    with pytest.raises(AuthError, match="appid"):
        credential_from_claims({"appid": "not-a-uuid"})
    with pytest.raises(AuthError, match="claims"):
        credential_from_claims({"scp": "user.read"})


def test_fetcher_seam():
    # the injectable stand-in for the OpenID discovery + jwks_uri fetch
    d = TokenDecoder(fetcher=lambda: JWKS, clock=lambda: NOW)
    assert d.decode(_rs(dict(LIVE, upn="f")))["upn"] == "f"
    with pytest.raises(ValueError):
        TokenDecoder()


def _call(url, tok=None, method="GET", expect=200, data=None):
    headers = {}
    if tok is not None:
        headers["Authorization"] = f"Bearer {tok}"
    if data is not None:
        headers["Content-Type"] = "application/json"
    r = urllib.request.Request(url, method=method, headers=headers,
                               data=data)
    try:
        with urllib.request.urlopen(r) as resp:
            assert resp.status == expect, url
            return json.loads(resp.read())
    except urllib.error.HTTPError as e:
        assert e.code == expect, f"{url}: {e.code} != {expect}: {e.read()}"
        return json.loads(e.read())


def test_token_auth_over_http():
    """E2E: ENFORCING server, debug header path disabled — only verified
    bearer tokens carry a principal (valid→RBAC decision, expired→401,
    garbage→401, missing→403, appid→service-principal grant)."""
    reg = Registry()
    rbac = RbacStore(reg.db)
    api = RegistryApi(reg, rbac=rbac)
    rbac.grant(GLOBAL_SCOPE, "root", Permission.ADMIN, "root", "boot")
    rbac.grant(GLOBAL_SCOPE, "alice", Permission.WRITE, "root", "team")
    app_uuid = "7f9c24e5-0a3b-4f71-9d2c-1c5b8e6a0f42"
    rbac.grant(GLOBAL_SCOPE, app_uuid, Permission.READ, "root", "svc")
    srv = RegistryHttpServer(api, token_decoder=_decoder(),
                             debug_credentials=False)
    with srv as url:
        base = f"{url}/api/v1"
        body = json.dumps({"name": "proj"}).encode()
        # valid token, global WRITE -> create project
        tok = _rs(dict(LIVE, preferred_username="alice"))
        _call(f"{base}/projects", tok, "POST", 201, body)
        # valid token, principal with no grants -> RBAC 403
        _call(f"{base}/projects/proj",
              _rs(dict(LIVE, preferred_username="mallory")), expect=403)
        # service principal via appid claim -> READ allowed
        _call(f"{base}/projects/proj",
              _rs(dict(LIVE, appid=app_uuid)))
        # expired -> 401
        _call(f"{base}/projects/proj",
              _rs({"nbf": NOW - 100, "exp": NOW - 1,
                   "preferred_username": "alice"}), expect=401)
        # garbage -> 401
        _call(f"{base}/projects/proj", "garbage.token.here", expect=401)
        # tampered signature -> 401
        good = _rs(dict(LIVE, preferred_username="alice"))
        _call(f"{base}/projects/proj", good[:-4] + "AAAA", expect=401)
        # missing token entirely -> 403 Missing token
        # (rbac_middleware.rs:104)
        out = _call(f"{base}/projects/proj", expect=403)
        assert "Missing token" in out["error"]
        # debug header is IGNORED when debug_credentials=False
        r = urllib.request.Request(
            f"{base}/projects/proj",
            headers={"x-registry-credential": "root"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(r)
        assert ei.value.code == 403


def test_debug_header_still_works_by_default():
    reg = Registry()
    rbac = RbacStore(reg.db)
    api = RegistryApi(reg, rbac=rbac)
    rbac.grant(GLOBAL_SCOPE, "root", Permission.ADMIN, "root", "boot")
    with RegistryHttpServer(api, token_decoder=_decoder()) as url:
        base = f"{url}/api/v1"
        # Authorization takes precedence when present; debug header
        # remains usable when absent (default debug_credentials=True)
        r = urllib.request.Request(
            f"{base}/userroles",
            headers={"x-registry-credential": "root"})
        with urllib.request.urlopen(r) as resp:
            assert resp.status == 200
        _call(f"{base}/userroles",
              _rs(dict(LIVE, preferred_username="root")))
