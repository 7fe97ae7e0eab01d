"""Web-admin / REST surface — the reference's HTTP endpoints, stdlib-only.

The reference optionally serves a web admin with the sync position and
per-table insert/update/delete counters
(/root/reference/web/router.go:23-126: position, destination state, boot
time, ``tables`` + ``insertAmounts``/``updateAmounts``/``deleteAmounts``)
and a Prometheus exporter (/root/reference/metrics/metrics.go:94-112,
promhttp on its own port).  Here both ride one ``http.server`` on
localhost (no third-party web framework, no network beyond loopback):

* ``GET /``         — the dashboard state as JSON (the reference renders
                      the same dict into index.html; JSON is the honest
                      equivalent for a headless engine);
* ``GET /metrics``  — the Prometheus text exposition
                      (functions/metrics_text.py — same families/labels
                      as metrics.go:41-92);
* ``GET /position`` — the saved position (per-partition manifest
                      watermarks, the upgrade of the single binlog
                      coordinate);
* ``POST /position`` body ``{"watermark": N}`` — overwrite the position
                      (main.go:156-189 ``-position`` over HTTP): forces
                      every manifest watermark so the next replay
                      recomputes or fences accordingly.

The server is a plain embedding API (``AdminServer(out_dir).start()``)
— it reads manifests from disk on every request, so it can watch a lake
another process is writing.  No Ray session is created or required.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .functions.metrics_text import render_exposition
from .state import manifest as mstate


class AdminServer:
    """Localhost admin endpoint over a lake directory.

    ``action_counts``: {(table, action): count} — the per-table counter
    state the reference tracks in its metrics registry; pass the counts a
    replay/metrics pipeline produced (or a zero dict).  ``port=0`` binds
    an ephemeral port (read it from ``.port`` after ``start()``)."""

    def __init__(
        self,
        out_dir: str,
        action_counts: "dict[tuple[str, str], int] | None" = None,
        *,
        host: str = "127.0.0.1",
        port: int = 0,
        destination: str = "lake",
        election=None,
    ):
        self.out_dir = out_dir
        self.action_counts = dict(action_counts or {})
        self.destination = destination
        # cluster mode (router.go:105-110): a LeaseElection handle adds
        # the isLeader/leader fields and the Prometheus leader gauge
        self.election = election
        self.boot_time = time.strftime("%Y-%m-%d %H:%M")
        self._host, self._port = host, port
        self._httpd: "ThreadingHTTPServer | None" = None
        self._thread: "threading.Thread | None" = None

    # -- state assembly ----------------------------------------------------

    def _position(self) -> dict:
        ms = mstate.load_manifests(self.out_dir)
        if not ms:
            return {"out": self.out_dir, "partitions": 0, "rows": 0,
                    "watermark_min": None, "watermark_max": None}
        wms = [m["gtid_watermark"] for m in ms.values()]
        return {
            "out": self.out_dir,
            "partitions": len(ms),
            "rows": sum(m["rows"] for m in ms.values()),
            "watermark_min": min(wms),
            "watermark_max": max(wms),
        }

    def _dashboard(self) -> dict:
        """The router.go:87-104 gin.H dict, field-for-field where a batch
        engine has an analogue."""
        pos = self._position()
        tables = sorted({t for (t, _a) in self.action_counts})
        amounts = {
            action: [self.action_counts.get((t, action), 0) for t in tables]
            for action in ("insert", "update", "delete")
        }
        totals = {
            action: sum(v for (t, a), v in self.action_counts.items() if a == action)
            for action in ("insert", "update", "delete")
        }
        h = {
            "destName": self.destination,
            "destAddr": self.out_dir,
            "destState": 1 if pos["partitions"] else 0,
            "bootTime": self.boot_time,
            "binPos": pos["watermark_max"],
            "insertAmount": totals["insert"],
            "updateAmount": totals["update"],
            "deleteAmount": totals["delete"],
            "tables": tables,
            "insertAmounts": amounts["insert"],
            "updateAmounts": amounts["update"],
            "deleteAmounts": amounts["delete"],
            "isCluster": self.election is not None,
        }
        if self.election is not None:
            # router.go:105-110: isLeader / leader / currentNode
            h["isLeader"] = self.election.is_leader()
            h["leader"] = self.election.leader()
            h["currentNode"] = self.election.node_id
        return h

    def _metrics_text(self) -> str:
        pos = self._position()
        leader = (
            1 if self.election is None or self.election.is_leader() else 0
        )
        return render_exposition(
            self.action_counts,
            leader_state=leader,
            destination_state=1 if pos["partitions"] else 0,
            delay=0,
        )

    # -- http plumbing -------------------------------------------------------

    def _handler(self):
        admin = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, body: str, ctype: str) -> None:
                data = body.encode()
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _json(self, obj, code: int = 200) -> None:
                self._send(code, json.dumps(obj), "application/json")

            def do_GET(self):
                path = self.path.split("?")[0]
                if path == "/":
                    self._json(admin._dashboard())
                elif path == "/metrics":
                    self._send(
                        200, admin._metrics_text(),
                        "text/plain; version=0.0.4; charset=utf-8",
                    )
                elif path == "/position":
                    self._json(admin._position())
                else:
                    self._json({"error": "not found"}, 404)

            def do_POST(self):
                path = self.path.split("?")[0]
                if path != "/position":
                    self._json({"error": "not found"}, 404)
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    wm = int(body["watermark"])
                except (ValueError, KeyError, TypeError):
                    self._json({"error": "body must be {\"watermark\": int}"}, 400)
                    return
                touched = mstate.set_watermarks(admin.out_dir, wm)
                self._json({"out": admin.out_dir, "partitions": touched,
                            "watermark": wm})

        return Handler

    def start(self) -> "AdminServer":
        self._httpd = ThreadingHTTPServer(
            (self._host, self._port), self._handler()
        )
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    @property
    def port(self) -> int:
        assert self._httpd is not None, "start() first"
        return self._httpd.server_address[1]

    def close(self) -> None:
        """router.go Close(): shut the listener down."""
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
