"""Framework-free HTTP ingress over :class:`GatewayFront`.

The reference binds its gateway stack to HTTP with FastAPI + gunicorn
(``/root/reference/api-service/src/main.py:78-130``,
``gunicorn.conf.py:11-14``). This module is the same binding as a plain
WSGI callable — no framework, stdlib only — so the complete gateway
library (validate → rate-limit → auth → scope → execute → envelope →
log) is one ``make_server(app)`` away from a real port, and the whole
route → status-code → envelope contract is testable IN-PROCESS by
invoking the callable with an environ dict (no socket, no server).

Routes (reference parity):

==============  ====  =============================================
GET /health     200   liveness + snapshot freshness (unauthenticated)
GET /schema     200   ``{"schema": {table: [columns]}}`` (auth only)
GET /query?q=…  200   ``{"success", "data", "columns", "row_count",
                      "execution_time_ms"}``
==============  ====  =============================================

Error mapping (main.py:100-130 + auth.py:46-117):

- 400 — validation rejected the query (``ValueError``/``QueryRejected``;
  also a missing ``q`` parameter — FastAPI would say 422, the
  reference's contract table documents 400 and we follow it)
- 401 — missing/invalid bearer token (``AuthError``)
- 403 — authenticated but missing the required scope (``ScopeError``)
- 404 / 405 — unknown path / non-GET method
- 429 — rate limit exceeded (``RateLimitExceeded``)
- 500 — execution failure; the body says ``"Query execution failed"``
  without internals, exactly like the reference (main.py:129-130)

Client identity for rate limiting follows the reference's
``get_remote_address`` behind ``forwarded_allow_ips="*"``: the first
``X-Forwarded-For`` hop when present, else ``REMOTE_ADDR``.

CORS (main.py:44-52 — ``CORSMiddleware`` with
``allow_origins=settings.cors_origins`` (config.py:26 defaults
``["*"]``), ``allow_credentials=True``, ``allow_methods=["GET",
"POST"]``, ``allow_headers=["*"]``), mirrored with starlette's
observable behavior:

- every response to a request carrying an ``Origin`` gets the config
  headers (``Access-Control-Allow-Credentials: true``; ``Vary: Origin``
  for restricted lists); ``Access-Control-Allow-Origin`` is the literal
  ``*`` under ``["*"]`` — EXCEPT for cookie-bearing requests, where the
  origin is echoed with ``Vary: Origin`` instead (a credentialed
  response with ``*`` is invalid, and starlette's has_cookie branch
  echoes) — or the echoed origin when it matches a restricted list
  (withheld, but with the other config headers still present, when it
  doesn't);
- ``Origin`` + ``OPTIONS`` + ``Access-Control-Request-Method`` is a
  PREFLIGHT, answered 200 BEFORE auth (browsers never attach
  credentials to preflights) with ``Access-Control-Allow-Methods: GET,
  POST``, the echoed ``Access-Control-Request-Headers`` (the ``["*"]``
  config), and ``Access-Control-Max-Age: 600``; a disallowed origin or
  method gets starlette's 400 "Disallowed CORS" response WITH the
  accumulated preflight headers;
- ``OPTIONS`` without an ``Origin`` header is NOT a preflight — even
  with a request-method header — and falls through to the normal 405
  (starlette gates on Origin before the preflight branch), as does a
  plain ``OPTIONS``.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Iterable
from urllib.parse import parse_qs

from ser_etl_spark.gateway.access import (
    AuthError,
    GatewayFront,
    RateLimitExceeded,
    ScopeError,
)

_REASONS = {
    200: "OK",
    400: "Bad Request",
    401: "Unauthorized",
    403: "Forbidden",
    404: "Not Found",
    405: "Method Not Allowed",
    429: "Too Many Requests",
    500: "Internal Server Error",
}


def _bearer_token(environ: dict[str, Any]) -> str:
    """Extract the bearer token; '' when absent/malformed (the
    authenticator then rejects it as a normal invalid token → 401)."""
    header = environ.get("HTTP_AUTHORIZATION", "")
    scheme, _, token = header.partition(" ")
    if scheme.lower() == "bearer" and token.strip():
        return token.strip()
    return ""


def _client_key(environ: dict[str, Any]) -> str:
    fwd = environ.get("HTTP_X_FORWARDED_FOR", "")
    if fwd:
        return fwd.split(",")[0].strip()
    return environ.get("REMOTE_ADDR", "-")


class GatewayHTTP:
    """WSGI app: ``GatewayHTTP(front)`` is servable by any WSGI server
    (``wsgiref.simple_server.make_server``, gunicorn sync workers) and
    callable directly in tests."""

    def __init__(
        self,
        front: GatewayFront,
        cors_origins: list[str] | None = None,
    ) -> None:
        self.front = front
        # reference default: config.py:26 ``cors_origins = ["*"]``
        self.cors_origins = ["*"] if cors_origins is None else list(
            cors_origins
        )
        self._allow_all = "*" in self.cors_origins

    # -- WSGI entrypoint ----------------------------------------------------

    def __call__(
        self,
        environ: dict[str, Any],
        start_response: Callable[[str, list[tuple[str, str]]], Any],
    ) -> Iterable[bytes]:
        preflight = self._preflight(environ)
        if preflight is not None:
            status, body, cors = preflight
        else:
            status, body = self._dispatch(environ)
            cors = self._cors_headers(environ)
        # Decimal/datetime cells in query rows serialize via str — the
        # reference's FastAPI encoder does the same stringly rendering
        payload = json.dumps(body, default=str).encode("utf-8")
        start_response(
            f"{status} {_REASONS[status]}",
            [
                ("Content-Type", "application/json"),
                ("Content-Length", str(len(payload))),
            ]
            + cors,
        )
        return [payload]

    # -- CORS ----------------------------------------------------------------

    def _origin_allowed(self, origin: str) -> bool:
        return bool(origin) and (
            self._allow_all or origin in self.cors_origins
        )

    def _cors_headers(self, environ: dict[str, Any]) -> list[tuple[str, str]]:
        """Simple-response headers, exactly starlette's send-wrapper
        behavior: no Origin → no headers at all; under allow-all a
        COOKIE-bearing (credentialed) request gets the echoed origin +
        ``Vary: Origin`` instead of the literal ``*`` (a credentialed
        response with ``*`` is invalid and browsers reject it); under a
        restricted list the config headers (credentials + Vary) are
        sent even to a DISALLOWED origin — only the allow-origin header
        itself is withheld."""
        origin = environ.get("HTTP_ORIGIN", "")
        if not origin:
            return []
        headers = [("Access-Control-Allow-Credentials", "true")]
        if self._allow_all:
            if "HTTP_COOKIE" in environ:
                headers.append(("Access-Control-Allow-Origin", origin))
                headers.append(("Vary", "Origin"))
            else:
                headers.append(("Access-Control-Allow-Origin", "*"))
        else:
            headers.append(("Vary", "Origin"))
            if origin in self.cors_origins:
                headers.append(("Access-Control-Allow-Origin", origin))
        return headers

    def _preflight(
        self, environ: dict[str, Any]
    ) -> tuple[int, dict, list[tuple[str, str]]] | None:
        """Handle OPTIONS preflights; None when the request isn't one.
        Starlette gates on the ORIGIN header before anything else, so
        OPTIONS without Origin — even with a request-method header —
        falls through to the route table (405), as does plain OPTIONS.
        Failures (disallowed origin/method) return 400 WITH the
        accumulated preflight headers, like the middleware's
        PlainTextResponse(headers=...)."""
        if environ.get("REQUEST_METHOD") != "OPTIONS":
            return None
        origin = environ.get("HTTP_ORIGIN", "")
        req_method = environ.get("HTTP_ACCESS_CONTROL_REQUEST_METHOD", "")
        if not origin or not req_method:
            return None
        headers = [
            ("Access-Control-Allow-Methods", "GET, POST"),
            ("Access-Control-Max-Age", "600"),
            ("Access-Control-Allow-Credentials", "true"),
        ]
        if self._allow_all:
            # credentials are always on here, so starlette 0.27 (pinned
            # via the reference's fastapi==0.105.0) takes its
            # preflight_explicit_allow_origin branch: the preflight
            # ECHOES the request origin with Vary: Origin and never
            # sends the literal '*' — a credentialed preflight answered
            # with '*' is rejected by browsers (r10 ADVICE). Under '*'
            # every origin is allowed, so the echo is unconditional.
            headers.append(("Access-Control-Allow-Origin", origin))
            headers.append(("Vary", "Origin"))
        else:
            headers.append(("Vary", "Origin"))
            if origin in self.cors_origins:
                headers.append(("Access-Control-Allow-Origin", origin))
        req_headers = environ.get(
            "HTTP_ACCESS_CONTROL_REQUEST_HEADERS", ""
        )
        if req_headers:
            # allow_headers=["*"]: echo whatever the browser asks for
            headers.append(("Access-Control-Allow-Headers", req_headers))
        if not self._origin_allowed(origin) or req_method not in (
            "GET",
            "POST",
        ):
            return 400, {"detail": "Disallowed CORS origin or method"}, headers
        return 200, {"detail": "OK"}, headers

    # -- routing ------------------------------------------------------------

    def _dispatch(self, environ: dict[str, Any]) -> tuple[int, dict]:
        path = environ.get("PATH_INFO", "/")
        if path not in ("/health", "/schema", "/query"):
            return 404, {"detail": "Not Found"}
        if environ.get("REQUEST_METHOD", "GET") != "GET":
            return 405, {"detail": "Method Not Allowed"}
        if path == "/health":
            return 200, self.front.health()
        token = _bearer_token(environ)
        if path == "/schema":
            return self._schema(token)
        return self._query(token, environ)

    def _schema(self, token: str) -> tuple[int, dict]:
        # auth only, like the reference's Depends(get_current_user) on
        # GET /schema (main.py:84-97); failures inside → 500 with the
        # error text (main.py:96-97 exposes str(e) here)
        try:
            self.front.authenticator.authenticate(token)
        except AuthError as e:
            return 401, {"detail": str(e)}
        try:
            return 200, {"schema": self.front.engine.get_schema()}
        except Exception as e:  # noqa: BLE001 - route boundary
            return 500, {"detail": str(e)}

    def _query(self, token: str, environ: dict[str, Any]) -> tuple[int, dict]:
        qs = parse_qs(environ.get("QUERY_STRING", ""))
        sql = (qs.get("q") or [""])[0]
        if not sql:
            return 400, {"detail": "Missing required query parameter: q"}
        try:
            result = self.front.query(token, _client_key(environ), sql)
        except AuthError as e:
            return 401, {"detail": str(e)}
        except ScopeError as e:
            return 403, {"detail": str(e)}
        except RateLimitExceeded as e:
            return 429, {"detail": f"Rate limit exceeded: {e}"}
        except ValueError as e:
            # QueryRejected is a ValueError: the reference maps
            # validation failures to 400 with the rejection text
            return 400, {"detail": str(e)}
        except Exception:  # noqa: BLE001 - route boundary
            # never leak execution internals (main.py:129-130)
            return 500, {"detail": "Query execution failed"}
        return 200, {
            "success": True,
            "data": result.data,
            "columns": result.columns,
            "row_count": result.row_count,
            "execution_time_ms": result.execution_time_ms,
        }

    # -- lifecycle ----------------------------------------------------------

    def close(self) -> None:
        """The reference's shutdown_event → engine cleanup
        (main.py:133-137)."""
        self.front.close()


def serve(app: GatewayHTTP, host: str = "127.0.0.1", port: int = 8000):
    """Bind the app to a real port with the stdlib WSGI server — the
    single-process stand-in for the reference's gunicorn config; returns
    the server (caller drives ``serve_forever``/``shutdown``)."""
    from wsgiref.simple_server import WSGIServer, make_server

    return make_server(host, port, app, server_class=WSGIServer)
