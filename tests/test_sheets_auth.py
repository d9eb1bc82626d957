"""Signed-JWT service-account transport (sources/sheets.py, round-11).

The live path needs only ``google.auth``'s RSA signer; everything else —
assertion shape, token exchange, Bearer wiring — is stdlib and pinned here
with a stubbed signer and a fake token endpoint (no google deps, no
network). The v4 request shape itself is covered by the wire-level fake-
server tests; these pin the AUTH leg the sandbox can't run live.
"""

from __future__ import annotations

import base64
import io
import json
import urllib.parse

import pytest

from polars_ad_etl_spark.sources.sheets import (
    _JWT_BEARER_GRANT,
    GOOGLE_SHEETS_V4,
    GoogleSheetService,
    _google_auth_available,
    build_jwt_assertion,
    exchange_jwt_for_token,
    fetch_service_account_token,
)

SA_INFO = {
    "client_email": "svc@project.iam.gserviceaccount.com",
    "private_key_id": "kid-123",
    "token_uri": "https://oauth2.example/token",
}


class StubSigner:
    def __init__(self):
        self.signed = []

    def sign(self, message: bytes) -> bytes:
        self.signed.append(message)
        return b"SIG:" + message[:10]


def _b64d(part: str) -> bytes:
    return base64.urlsafe_b64decode(part + "=" * (-len(part) % 4))


def test_assertion_shape_and_claims():
    signer = StubSigner()
    jwt = build_jwt_assertion(
        SA_INFO, ["scope.a", "scope.b"], signer, now=1_700_000_000
    )
    h, p, sig = jwt.split(".")
    header = json.loads(_b64d(h))
    payload = json.loads(_b64d(p))
    assert header == {"alg": "RS256", "typ": "JWT", "kid": "kid-123"}
    assert payload == {
        "iss": SA_INFO["client_email"],
        "scope": "scope.a scope.b",
        "aud": SA_INFO["token_uri"],
        "iat": 1_700_000_000,
        "exp": 1_700_003_600,
    }
    # the signature covers exactly header.payload, base64url unpadded
    assert signer.signed == [f"{h}.{p}".encode()]
    assert _b64d(sig).startswith(b"SIG:")
    assert "=" not in jwt  # JWS compact serialization is unpadded


def test_token_exchange_request_shape():
    captured = {}

    def opener(req):
        captured["url"] = req.full_url
        captured["method"] = req.get_method()
        captured["content_type"] = req.headers.get("Content-type")
        captured["body"] = dict(
            urllib.parse.parse_qsl(req.data.decode("ascii"))
        )
        return io.BytesIO(json.dumps({"access_token": "tok-42"}).encode())

    tok = exchange_jwt_for_token("A.B.C", SA_INFO["token_uri"], opener=opener)
    assert tok == "tok-42"
    assert captured["url"] == SA_INFO["token_uri"]
    assert captured["method"] == "POST"
    assert captured["content_type"] == "application/x-www-form-urlencoded"
    assert captured["body"] == {
        "grant_type": _JWT_BEARER_GRANT,
        "assertion": "A.B.C",
    }


def test_fetch_token_end_to_end_with_stubs(tmp_path):
    creds = tmp_path / "sa.json"
    creds.write_text(json.dumps(SA_INFO), encoding="utf-8")
    seen = {}

    def opener(req):
        seen["body"] = dict(urllib.parse.parse_qsl(req.data.decode("ascii")))
        seen["url"] = req.full_url
        return io.BytesIO(json.dumps({"access_token": "tok-99"}).encode())

    tok = fetch_service_account_token(
        str(creds),
        ["s1"],
        signer=StubSigner(),
        now=1_700_000_000,
        opener=opener,
    )
    assert tok == "tok-99"
    assert seen["url"] == SA_INFO["token_uri"]
    payload = json.loads(_b64d(seen["body"]["assertion"].split(".")[1]))
    assert payload["iss"] == SA_INFO["client_email"]
    assert payload["scope"] == "s1"


def test_fetch_token_without_google_auth_raises_import_error(tmp_path):
    creds = tmp_path / "sa.json"
    creds.write_text(json.dumps(SA_INFO), encoding="utf-8")
    if _google_auth_available():  # pragma: no cover - sandbox lacks it
        pytest.skip("google.auth installed; gated path not reachable")
    with pytest.raises(ImportError):
        fetch_service_account_token(str(creds), ["s1"])


def test_authorize_gating(spark, tmp_path, monkeypatch):
    """With neither gspread nor google.auth nor an endpoint, the connector
    stays credential-gated; with google.auth 'present' (stubbed detection +
    token provider), it constructs the self-refreshing REST client against
    the live v4 base — the token is fetched lazily through the provider,
    not baked in as a static string (round-11 advice, low)."""
    import polars_ad_etl_spark.sources.sheets as sh

    svc = GoogleSheetService(spark, credentials_path=str(tmp_path / "x.json"))
    monkeypatch.setattr(sh, "_google_auth_available", lambda: False)
    with pytest.raises(NotImplementedError, match="signed-JWT"):
        svc._authorize()

    monkeypatch.setattr(sh, "_google_auth_available", lambda: True)
    monkeypatch.setattr(
        sh,
        "service_account_token_provider",
        lambda path, scopes: (lambda: ("tok-7", 2_000_000_000.0)),
    )
    client = GoogleSheetService(
        spark, credentials_path=str(tmp_path / "x.json")
    )._authorize()
    assert client.base_url == GOOGLE_SHEETS_V4
    assert client.token is None  # nothing fetched before the first request
    assert client._bearer() == "tok-7"
    assert client.token == "tok-7"


def test_provider_returns_token_and_skewed_expiry(tmp_path):
    """The provider re-runs the full grant per call and returns the
    endpoint's expires_in minus the skew margin as the refresh deadline."""
    import time

    from polars_ad_etl_spark.sources.sheets import (
        _TOKEN_REFRESH_SKEW,
        service_account_token_provider,
    )

    creds = tmp_path / "sa.json"
    creds.write_text(json.dumps(SA_INFO), encoding="utf-8")
    calls = []

    def opener(req):
        calls.append(dict(urllib.parse.parse_qsl(req.data.decode("ascii"))))
        return io.BytesIO(
            json.dumps(
                {"access_token": f"tok-{len(calls)}", "expires_in": 1800}
            ).encode()
        )

    provide = service_account_token_provider(
        str(creds), ["s1"], signer=StubSigner(), opener=opener
    )
    before = time.time()
    tok, expiry = provide()
    assert tok == "tok-1"
    assert before + 1800 - _TOKEN_REFRESH_SKEW - 5 <= expiry
    assert expiry <= time.time() + 1800 - _TOKEN_REFRESH_SKEW + 5
    # each call is a fresh grant (fresh assertion, fresh token)
    tok2, _ = provide()
    assert tok2 == "tok-2"
    assert calls[0]["assertion"] != "" and len(calls) == 2


def test_rest_client_refreshes_past_expiry(monkeypatch):
    """A transport older than its token's refresh deadline re-fetches
    before the next request instead of serving the stale Bearer."""
    from polars_ad_etl_spark.sources.sheets import _RestSheetsClient

    tokens = iter([("t1", 0.0), ("t2", 2_000_000_000.0)])
    client = _RestSheetsClient(
        "https://x.example", token_provider=lambda: next(tokens)
    )
    assert client._bearer() == "t1"  # first fetch
    # t1's refresh deadline (0.0) is already past -> next bearer re-fetches
    assert client._bearer() == "t2"
    # t2 is fresh -> no further provider call (iterator would StopIteration)
    assert client._bearer() == "t2"


def test_rest_client_retries_once_on_401(monkeypatch):
    """A surprise 401 (token revoked before its stated lifetime) forces
    exactly one refresh + replay; a second 401 surfaces as SheetsApiError."""
    import urllib.error
    import urllib.request

    from polars_ad_etl_spark.sources.sheets import (
        SheetsApiError,
        _RestSheetsClient,
    )

    fetched = []

    def provider():
        fetched.append(f"t{len(fetched) + 1}")
        return fetched[-1], 2_000_000_000.0

    attempts = []

    def fake_urlopen(req, timeout=None):
        attempts.append(req.headers.get("Authorization"))
        if len(attempts) == 1:
            raise urllib.error.HTTPError(
                req.full_url, 401, "unauthorized", {}, io.BytesIO(b"expired")
            )
        return io.BytesIO(json.dumps({"ok": True}).encode())

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    client = _RestSheetsClient("https://x.example", token_provider=provider)
    out = client._request("GET", "/v4/whatever")
    assert out == {"ok": True}
    assert attempts == ["Bearer t1", "Bearer t2"]  # one refresh, one replay

    # persistent 401 -> exactly one retry, then the documented error
    attempts.clear()

    def always_401(req, timeout=None):
        attempts.append(1)
        raise urllib.error.HTTPError(
            req.full_url, 401, "unauthorized", {}, io.BytesIO(b"nope")
        )

    monkeypatch.setattr(urllib.request, "urlopen", always_401)
    with pytest.raises(SheetsApiError, match="401"):
        client._request("GET", "/v4/whatever")
    assert len(attempts) == 2
