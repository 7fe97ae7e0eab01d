"""httpOps (T5) — the Lua HTTP-enrichment surface, with an injectable
client.

The reference exposes GET/POST/PUT/DELETE with headers/forms to Lua
transforms (/root/reference/service/luaengine/http_actuator.go:33-156),
returning ``{status_code, body}``.  Network calls are out of scope for
the lake pipeline (and this sandbox has no network), so the API surface
is real and the transport is injectable: production would pass a
requests-backed client; tests and default runs use ``StubHttpClient``
with canned routes.  The ops object lives in the rule-engine actor's
``UdfContext`` — constructed once per actor, used per row/batch, exactly
like the reference's pooled state.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class HttpResponse:
    """http_actuator.go returns {status_code, body} to Lua (:52-58)."""

    status_code: int
    body: str


@dataclass
class StubHttpClient:
    """Canned-route client: routes maps ``(method, url)`` or ``url`` to a
    body string (status 200) or an ``HttpResponse``.  Records every call
    so tests can assert enrichment happened; unknown routes → 404."""

    routes: dict = field(default_factory=dict)
    calls: list = field(default_factory=list)

    def request(self, method: str, url: str, headers=None, data=None) -> HttpResponse:
        self.calls.append(
            {"method": method, "url": url, "headers": headers, "data": data}
        )
        hit = self.routes.get((method, url), self.routes.get(url))
        if hit is None:
            return HttpResponse(404, "")
        if isinstance(hit, HttpResponse):
            return hit
        return HttpResponse(200, str(hit))


class HttpOps:
    """The httpOps module surface (http_actuator.go:33-156)."""

    def __init__(self, client=None):
        self.client = client or StubHttpClient()

    def get(self, url: str, headers: "dict | None" = None) -> dict:
        r = self.client.request("GET", url, headers=headers)
        return {"status_code": r.status_code, "body": r.body}

    def post(self, url: str, data=None, headers=None) -> dict:
        r = self.client.request("POST", url, headers=headers, data=data)
        return {"status_code": r.status_code, "body": r.body}

    def put(self, url: str, data=None, headers=None) -> dict:
        r = self.client.request("PUT", url, headers=headers, data=data)
        return {"status_code": r.status_code, "body": r.body}

    def delete(self, url: str, headers=None) -> dict:
        r = self.client.request("DELETE", url, headers=headers)
        return {"status_code": r.status_code, "body": r.body}
