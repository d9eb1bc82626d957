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
    token fetch), it constructs the REST client against the live v4 base
    with the fetched Bearer token."""
    import polars_ad_etl_spark.sources.sheets as sh

    svc = GoogleSheetService(spark, credentials_path=str(tmp_path / "x.json"))
    monkeypatch.setattr(sh, "_google_auth_available", lambda: False)
    with pytest.raises(NotImplementedError, match="signed-JWT"):
        svc._authorize()

    monkeypatch.setattr(sh, "_google_auth_available", lambda: True)
    monkeypatch.setattr(
        sh, "fetch_service_account_token", lambda path, scopes: "tok-7"
    )
    client = GoogleSheetService(
        spark, credentials_path=str(tmp_path / "x.json")
    )._authorize()
    assert client.base_url == GOOGLE_SHEETS_V4
    assert client.token == "tok-7"
