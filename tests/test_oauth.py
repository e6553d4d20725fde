"""OAuth2 authenticator: grant flows, token caching/expiry, 401-retry.

Stubbed token endpoint + token-gated data endpoint (no network), per the
reference's Oauth2Authenticator contract (airbyte-cdk .../http/auth/oauth.py).
"""

from __future__ import annotations

import pytest

from airbyte_spark.sources.oauth import (
    OAuth2Authenticator,
    OAuth2Config,
    UnauthorizedError,
    with_oauth,
)


class FakeClock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t


class TokenServer:
    """Token endpoint stub: issues tok-N with a TTL, records grants,
    optionally rotates refresh tokens, validates grant params."""

    def __init__(self, ttl=300.0, rotate=False, expect_grant="client_credentials"):
        self.ttl, self.rotate, self.expect_grant = ttl, rotate, expect_grant
        self.grants = []
        self.n = 0

    def __call__(self, path, params):
        assert path == "https://auth.example/token"
        assert params["grant_type"] == self.expect_grant
        assert params["client_id"] == "cid" and params["client_secret"] == "sec"
        self.grants.append(dict(params))
        self.n += 1
        resp = {"access_token": f"tok-{self.n}", "expires_in": self.ttl}
        if self.rotate:
            resp["refresh_token"] = f"rt-{self.n}"
        return resp


def _auth(server, clock, **cfg_kw):
    cfg = OAuth2Config(
        token_endpoint="https://auth.example/token",
        client_id="cid",
        client_secret="sec",
        expiry_margin_s=60.0,
        **cfg_kw,
    )
    return OAuth2Authenticator(cfg, server, clock=clock)


def test_client_credentials_cached_until_expiry():
    clock, srv = FakeClock(), TokenServer(ttl=300.0)
    a = _auth(srv, clock)
    assert a.token() == "tok-1"
    assert a.token() == "tok-1" and srv.n == 1  # cached
    clock.t += 239.0  # within ttl - margin
    assert a.token() == "tok-1" and srv.n == 1
    clock.t += 2.0  # past ttl - margin → refresh ahead of nominal expiry
    assert a.token() == "tok-2" and srv.n == 2


def test_refresh_token_grant_and_rotation():
    clock = FakeClock()
    srv = TokenServer(ttl=300.0, rotate=True, expect_grant="refresh_token")
    a = _auth(srv, clock, refresh_token="rt-0")
    assert a.token() == "tok-1"
    assert srv.grants[0]["refresh_token"] == "rt-0"
    clock.t += 500.0
    assert a.token() == "tok-2"
    # rotating refresh token: the SECOND grant must present the rotated one
    assert srv.grants[1]["refresh_token"] == "rt-1"


def test_scopes_sent_space_joined():
    clock, srv = FakeClock(), TokenServer()
    a = _auth(srv, clock, scopes=["read:events", "read:users"])
    a.token()
    assert srv.grants[0]["scope"] == "read:events read:users"


def test_401_refreshes_once_and_retries():
    clock, srv = FakeClock(), TokenServer(ttl=300.0)
    a = _auth(srv, clock)
    calls = []

    def gated(path, params):
        calls.append(params.get("access_token"))
        # server-side revocation: tok-1 is rejected even though the client
        # still believes it valid
        if params.get("access_token") == "tok-1":
            raise UnauthorizedError("401")
        return {"records": [{"x": 1}], "next_page_token": None}

    t = with_oauth(gated, a)
    resp = t("events", {"limit": 10})
    assert resp["records"] == [{"x": 1}]
    assert calls == ["tok-1", "tok-2"]  # exactly one forced refresh + retry
    assert srv.n == 2


def test_second_401_propagates():
    clock, srv = FakeClock(), TokenServer()
    a = _auth(srv, clock)

    def always_401(path, params):
        raise UnauthorizedError("401")

    t = with_oauth(always_401, a)
    with pytest.raises(UnauthorizedError):
        t("events", {})
    assert srv.n == 2  # initial grant + the one forced refresh, no loop


def test_missing_access_token_raises():
    clock = FakeClock()

    def bad_endpoint(path, params):
        return {"error": "invalid_client"}

    a = OAuth2Authenticator(
        OAuth2Config("https://auth.example/token", "cid", "sec"),
        bad_endpoint,
        clock=clock,
    )
    with pytest.raises(UnauthorizedError, match="no access_token"):
        a.token()


def test_http_stream_reads_through_oauth(spark, sf_dir):
    """End-to-end: a token-gated events API read through with_oauth matches
    the ungated read — offset pagination, distributed page fetch."""
    from airbyte_spark.sources.http import (
        HttpStreamConfig,
        events_rest_transport,
        read_http_stream,
    )

    clock, srv = FakeClock(), TokenServer(ttl=10_000.0)
    a = _auth(srv, clock)
    inner = events_rest_transport(sf_dir)

    def gated(path, params):
        p = dict(params)
        if p.pop("access_token", None) != a._access_token or a._access_token is None:
            raise UnauthorizedError("401")
        return inner(path, p)

    schema = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "event_type")
        .schema
    )
    cfg = HttpStreamConfig(name="events", path="events", schema=schema, page_size=500)
    got = read_http_stream(spark, cfg, with_oauth(gated, a))
    want = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
