"""In-process loopback sinks — real sockets for the live delivery loop.

The reference's whole runtime is "put exact bytes on a socket and react
to the sink failing" (`/root/reference/service/endpoint/endpoint.go:42-48`
Connect/Ping/Consume; `service/handler.go:173-181` consume-error →
disable; `service/transfer_service.go:328-354` 1 Hz ping → restart).
This sandbox has no Redis/Elasticsearch, so these test doubles close the
loop in-process: a minimal RESP v2 server and a minimal HTTP bulk
endpoint, each listening on a real 127.0.0.1 TCP socket, applying the
frames `functions/wire.py` emits to an in-memory keyspace, and able to
FAIL ON DEMAND (``kill()`` / ``fail_after(n)``) so the delivery loop's
pause / ping / resume-from-checkpoint path is exercised against genuine
connection errors (EOF/reset), not injected exceptions.

These are test doubles, not servers to deploy: per-command parity with
Redis is limited to the commands the reference's sink can emit
(redis.go:225-267 — SET/DEL/HSET/HDEL/RPUSH/LREM/SADD/SREM/ZADD/ZREM
plus PING), and the bulk endpoint to the three NDJSON op framings
(elastic6.go:293-300).  The variadic-member semantics matter: the
reference's update path puts a stray ``0`` member on the wire
(``SREM key 0 old``, redis.go:252,261) and a real Redis removes the
member ``"0"`` — so does this one.
"""

from __future__ import annotations

import json
import socket
import socketserver
import threading


class SinkError(Exception):
    """A consume/ping against the sink failed (connection or -ERR)."""


# ---------------------------------------------------------------------------
# RESP v2 loopback server


def _read_exact(rfile, n: int) -> bytes:
    buf = rfile.read(n)
    if buf is None or len(buf) < n:
        raise ConnectionError("peer closed")
    return buf


def _read_line(rfile) -> bytes:
    line = rfile.readline()
    if not line.endswith(b"\r\n"):
        raise ConnectionError("peer closed")
    return line[:-2]


def parse_resp_command(rfile) -> "list[bytes] | None":
    """One RESP array of bulk strings → list of raw args; None on EOF."""
    head = rfile.readline()
    if not head:
        return None
    if not head.startswith(b"*") or not head.endswith(b"\r\n"):
        raise ValueError(f"malformed RESP array header {head!r}")
    n = int(head[1:-2])
    args = []
    for _ in range(n):
        ln = _read_line(rfile)
        if not ln.startswith(b"$"):
            raise ValueError(f"malformed bulk header {ln!r}")
        size = int(ln[1:])
        args.append(_read_exact(rfile, size))
        _read_exact(rfile, 2)  # trailing CRLF
    return args


class _RespState:
    """Single keyspace with per-key typed values, WRONGTYPE on clash —
    the visible behavior of the commands redis.go:225-267 can emit."""

    def __init__(self):
        self.data: dict[str, tuple[str, object]] = {}

    def _typed(self, key: str, typ: str, empty):
        cur = self.data.get(key)
        if cur is None:
            cur = (typ, empty())
            self.data[key] = cur
        if cur[0] != typ:
            raise _Wrongtype()
        return cur[1]

    def apply(self, args: "list[bytes]") -> bytes:
        cmd = args[0].decode().upper()
        a = [x.decode("utf-8", "surrogateescape") for x in args[1:]]
        if cmd == "PING":
            return b"+PONG\r\n"
        if cmd == "SET":
            self.data[a[0]] = ("string", a[1])
            return b"+OK\r\n"
        if cmd == "DEL":
            n = sum(1 for k in a if self.data.pop(k, None) is not None)
            return b":%d\r\n" % n
        if cmd == "HSET":
            h = self._typed(a[0], "hash", dict)
            new = a[1] not in h
            h[a[1]] = a[2]
            return b":%d\r\n" % int(new)
        if cmd == "HDEL":
            h = self._typed(a[0], "hash", dict)
            n = sum(1 for f in a[1:] if h.pop(f, None) is not None)
            if not h:
                self.data.pop(a[0], None)
            return b":%d\r\n" % n
        if cmd == "RPUSH":
            lst = self._typed(a[0], "list", list)
            lst.extend(a[1:])
            return b":%d\r\n" % len(lst)
        if cmd == "LREM":
            lst = self._typed(a[0], "list", list)
            count, val = int(a[1]), a[2]
            if count == 0:
                n = lst.count(val)
                lst[:] = [x for x in lst if x != val]
            else:  # pragma: no cover - reference only sends count=0
                n = 0
                step = 1 if count > 0 else -1
                idxs = range(len(lst))[::step]
                keep = set()
                for i in idxs:
                    if lst[i] == val and n < abs(count):
                        keep.add(i)
                        n += 1
                lst[:] = [x for i, x in enumerate(lst) if i not in keep]
            if not lst:
                self.data.pop(a[0], None)
            return b":%d\r\n" % n
        if cmd == "SADD":
            st = self._typed(a[0], "set", set)
            n = len(a) - 1 - len(st.intersection(a[1:]))
            st.update(a[1:])
            return b":%d\r\n" % n
        if cmd == "SREM":
            st = self._typed(a[0], "set", set)
            n = len(st.intersection(a[1:]))
            st.difference_update(a[1:])
            if not st:
                self.data.pop(a[0], None)
            return b":%d\r\n" % n
        if cmd == "ZADD":
            z = self._typed(a[0], "zset", dict)
            n = 0
            for sc, mem in zip(a[1::2], a[2::2]):
                n += mem not in z
                z[mem] = sc
            return b":%d\r\n" % n
        if cmd == "ZREM":
            z = self._typed(a[0], "zset", dict)
            n = sum(1 for m in a[1:] if z.pop(m, None) is not None)
            if not z:
                self.data.pop(a[0], None)
            return b":%d\r\n" % n
        return b"-ERR unknown command '%s'\r\n" % cmd.encode()


class _Wrongtype(Exception):
    pass


class _FaultInjector:
    """Shared kill switch: ``kill()`` drops every live connection and
    makes new ones close on accept; ``fail_after(n)`` kills the server
    mid-stream after ``n`` more successful commands/requests."""

    def __init__(self):
        self.lock = threading.Lock()
        self.down = False
        self.remaining: "int | None" = None
        self.processed = 0

    def tick(self) -> bool:
        """Account one unit of work; True if the server just died."""
        with self.lock:
            if self.down:
                return True
            self.processed += 1
            if self.remaining is not None:
                self.remaining -= 1
                if self.remaining <= 0:
                    self.down = True
                    self.remaining = None
                    return True
            return False

    def is_down(self) -> bool:
        with self.lock:
            return self.down


class _LoopbackBase:
    """start/stop/kill/heal plumbing shared by both loopback servers."""

    _server_cls: type
    _handler_cls: type

    def __init__(self):
        self._fault = _FaultInjector()
        self._server = self._server_cls(("127.0.0.1", 0), self._handler_cls)
        self._server.loopback = self
        self._thread = threading.Thread(
            target=self._server.serve_forever, kwargs={"poll_interval": 0.01},
            daemon=True,
        )

    @property
    def address(self) -> tuple[str, int]:
        return self._server.server_address

    def start(self) -> "_LoopbackBase":
        self._thread.start()
        return self

    def stop(self):
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)

    def kill(self):
        """Simulate the sink going away: drop connections, refuse work."""
        with self._fault.lock:
            self._fault.down = True

    def heal(self):
        """Bring the sink back (the reference's ping then succeeds)."""
        with self._fault.lock:
            self._fault.down = False
            self._fault.remaining = None

    def fail_after(self, n_commands: int):
        with self._fault.lock:
            self._fault.remaining = n_commands

    @property
    def commands_processed(self) -> int:
        with self._fault.lock:
            return self._fault.processed


class _RespHandler(socketserver.StreamRequestHandler):
    def handle(self):
        lb: LoopbackRespServer = self.server.loopback
        if lb._fault.is_down():
            return  # close immediately → client sees EOF
        while True:
            try:
                args = parse_resp_command(self.rfile)
            except (ConnectionError, ValueError, OSError):
                return
            if args is None:
                return
            if lb._fault.tick():
                return  # die mid-stream, reply unsent
            with lb._state_lock:
                try:
                    reply = lb.state.apply(args)
                except _Wrongtype:
                    reply = (
                        b"-WRONGTYPE Operation against a key holding"
                        b" the wrong kind of value\r\n"
                    )
            try:
                self.wfile.write(reply)
            except OSError:
                return


class _RespServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


class LoopbackRespServer(_LoopbackBase):
    """Minimal RESP v2 server over a real TCP socket."""

    _server_cls = _RespServer
    _handler_cls = _RespHandler

    def __init__(self):
        super().__init__()
        self.state = _RespState()
        self._state_lock = threading.Lock()

    def snapshot(self) -> dict:
        """(key → (type, plain-python value)) copy of the keyspace."""
        with self._state_lock:
            out = {}
            for k, (typ, v) in self.state.data.items():
                if typ == "hash":
                    v = dict(v)
                elif typ == "list":
                    v = list(v)
                elif typ == "set":
                    v = set(v)
                elif typ == "zset":
                    v = dict(v)
                out[k] = (typ, v)
            return out


# ---------------------------------------------------------------------------
# HTTP bulk loopback server (the ES _bulk surface)


class _HttpHandler(socketserver.StreamRequestHandler):
    """Hand-rolled HTTP/1.1, one request per connection (the client
    sends ``Connection: close``): GET/HEAD / → 200 (the reference's
    Ping is a client ping; any 200 will do), POST /_bulk → apply
    NDJSON ops to the doc store."""

    def handle(self):
        lb: LoopbackHttpBulkServer = self.server.loopback
        if lb._fault.is_down():
            return
        try:
            request = _read_line(self.rfile).decode("latin-1")
            method, path, _ = request.split(" ", 2)
            length = 0
            while True:
                line = _read_line(self.rfile)
                if not line:
                    break
                name, _, value = line.decode("latin-1").partition(":")
                if name.strip().lower() == "content-length":
                    length = int(value.strip())
            body = _read_exact(self.rfile, length) if length else b""
        except (ConnectionError, ValueError, OSError):
            return
        if lb._fault.tick():
            return  # die before answering; ops NOT applied
        if method in ("GET", "HEAD") and path == "/":
            payload = b'{"status":"ok"}'
        elif method == "POST" and path == "/_bulk":
            with lb._state_lock:
                payload = lb._apply_bulk(body)
        else:
            self._respond(404, b'{"error":"no such route"}')
            return
        self._respond(200, payload if method != "HEAD" else b"")

    def _respond(self, code: int, payload: bytes):
        reason = {200: "OK", 404: "Not Found"}[code]
        head = (
            f"HTTP/1.1 {code} {reason}\r\n"
            f"Content-Type: application/json\r\n"
            f"Content-Length: {len(payload)}\r\nConnection: close\r\n\r\n"
        ).encode("latin-1")
        try:
            self.wfile.write(head + payload)
        except OSError:
            pass


class _HttpServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


class LoopbackHttpBulkServer(_LoopbackBase):
    """Doc store behind a real HTTP socket: index → put, update → merge
    the ``doc`` into the source (create if absent — full-row updates
    make merge ≡ replace), delete → drop.  ``errors`` mirrors the bulk
    response flag the reference checks (elastic6.go:302-310)."""

    _server_cls = _HttpServer
    _handler_cls = _HttpHandler

    def __init__(self):
        super().__init__()
        self.docs: dict[str, dict] = {}
        self._state_lock = threading.Lock()

    def _apply_bulk(self, body: bytes) -> bytes:
        lines = body.decode("utf-8").split("\n")
        i, applied = 0, 0
        while i < len(lines):
            if not lines[i]:
                i += 1
                continue
            action_line = json.loads(lines[i])
            action, meta = next(iter(action_line.items()))
            doc_id = str(meta["_id"])
            i += 1
            if action == "delete":
                self.docs.pop(doc_id, None)
            elif action == "index":
                self.docs[doc_id] = json.loads(lines[i])
                i += 1
            elif action == "update":
                patch = json.loads(lines[i])["doc"]
                self.docs.setdefault(doc_id, {}).update(patch)
                i += 1
            else:
                return json.dumps(
                    {"errors": True, "reason": f"bad action {action}"}
                ).encode()
            applied += 1
        return json.dumps({"errors": False, "items": applied}).encode()

    def snapshot(self) -> dict:
        with self._state_lock:
            return {k: dict(v) for k, v in self.docs.items()}
