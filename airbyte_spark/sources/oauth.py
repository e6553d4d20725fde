"""OAuth2 authentication for the HTTP source.

Restates the reference's authenticator hooks (airbyte-cdk/python/
airbyte_cdk/sources/streams/http/auth/oauth.py — Oauth2Authenticator:
token caching with expiry, refresh ahead of use, refresh-token grant
params; and auth/token.py token injection into requests) over this
engine's injected-transport seam: an authenticator owns the token
lifecycle, `with_oauth` wraps any Transport so every request carries a
fresh access token and a 401 triggers exactly one forced refresh + retry
(the cdk re-authenticates through its session hook the same way).

Grants supported:
  * client_credentials — machine-to-machine, no user refresh token
  * refresh_token      — long-lived refresh token exchanged per expiry;
                         rotating refresh tokens (RFC 6749 §6 servers MAY
                         issue a new one) are honored when the response
                         carries `refresh_token`.

The token endpoint is itself an injected Transport, so tests (and this
offline sandbox) bind a deterministic stub; deployment binds the same
`requests` session the data transport uses. When a wrapped transport is
captured into a distributed fetch (mapInPandas), each executor's copy of
the authenticator refreshes independently — same behavior as the cdk's
per-worker sessions; token endpoints are built for that fan-in.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

Transport = Callable[[str, dict], dict]


class UnauthorizedError(Exception):
    """401: the access token was rejected (expired server-side, revoked).
    Distinct from TransportError — retrying without a new token is
    pointless, so the retry wrapper must NOT swallow it."""


@dataclass
class OAuth2Config:
    token_endpoint: str
    client_id: str
    client_secret: str
    refresh_token: str | None = None  # set → refresh_token grant
    scopes: list[str] = field(default_factory=list)
    # refresh this many seconds BEFORE nominal expiry (clock skew margin,
    # ≡ the cdk's token_expiry_date buffer behavior)
    expiry_margin_s: float = 60.0


class OAuth2Authenticator:
    """Token lifecycle: cache until (expires_at - margin), then refresh.

    `token_transport(path, params) -> response` posts the grant to the
    token endpoint and returns the parsed JSON body; `clock` is injectable
    so tests drive expiry without sleeping.
    """

    def __init__(
        self,
        config: OAuth2Config,
        token_transport: Transport,
        clock: Callable[[], float] = time.time,
    ) -> None:
        self.config = config
        self._token_transport = token_transport
        self._clock = clock
        self._access_token: str | None = None
        self._expires_at: float = 0.0
        self.refreshes = 0  # observability: grants performed

    # -- token cache ---------------------------------------------------------

    def token(self) -> str:
        if self._access_token is None or self._clock() >= self._expires_at:
            self._refresh()
        return self._access_token  # type: ignore[return-value]

    def invalidate(self) -> None:
        """Force the next token() to hit the token endpoint (called on 401:
        the server rejected a token we still believed valid)."""
        self._access_token = None

    # -- grant ---------------------------------------------------------------

    def _grant_params(self) -> dict:
        c = self.config
        p = {"client_id": c.client_id, "client_secret": c.client_secret}
        if c.refresh_token is not None:
            p["grant_type"] = "refresh_token"
            p["refresh_token"] = c.refresh_token
        else:
            p["grant_type"] = "client_credentials"
        if c.scopes:
            p["scope"] = " ".join(c.scopes)
        return p

    def _refresh(self) -> None:
        resp = self._token_transport(self.config.token_endpoint, self._grant_params())
        try:
            self._access_token = resp["access_token"]
        except KeyError:
            raise UnauthorizedError(
                f"token endpoint returned no access_token: {sorted(resp)}"
            )
        ttl = float(resp.get("expires_in", 3600.0))
        self._expires_at = self._clock() + ttl - self.config.expiry_margin_s
        # rotating refresh tokens: adopt the replacement or the old one is
        # dead after first use on strict servers
        if self.config.refresh_token is not None and resp.get("refresh_token"):
            self.config.refresh_token = resp["refresh_token"]
        self.refreshes += 1


def with_oauth(
    transport: Transport,
    authenticator: OAuth2Authenticator,
    token_param: str = "access_token",
) -> Transport:
    """Wrap a data Transport so every call carries a valid bearer token
    (injected as `token_param` — this engine's transports are param-keyed;
    an HTTP deployment maps it onto the Authorization header). On
    UnauthorizedError the token is invalidated and the request retried
    ONCE with a freshly-granted token; a second 401 propagates (bad
    credentials, not a stale token). Compose under with_retries so
    transport-level retries happen per authenticated attempt."""

    def call(path: str, params: dict) -> dict:
        try:
            return transport(path, {**params, token_param: authenticator.token()})
        except UnauthorizedError:
            authenticator.invalidate()
            return transport(path, {**params, token_param: authenticator.token()})

    return call
