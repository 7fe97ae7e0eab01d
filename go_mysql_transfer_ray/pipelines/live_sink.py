"""Live sink loop — the reference's Connect / Ping / Consume runtime.

This is the subsystem that makes go-mysql-transfer a *daemon* rather
than a batch job: rows stream to a network endpoint, a consume failure
disables the endpoint and stops the dump, a 1 Hz ping probes the sink,
and on recovery the stream restarts from the last *saved* position —
at-least-once delivery, converged by idempotent per-key commands.

Reference behavior reproduced here:

* ``Endpoint`` protocol = Connect/Ping/Consume/Close
  (/root/reference/service/endpoint/endpoint.go:42-48).
* Consume error → ``endpointEnable=false`` + ``stopDump()`` — delivery
  pauses, the in-flight batch is NOT acknowledged
  (/root/reference/service/handler.go:173-181).
* Recovery loop: every ``ping_interval`` (reference: 1 s,
  transfer_service.go:37 ``_transferLoopInterval``) ping the sink; on
  pong re-enable, reconnect and ``StartUp()`` from the saved position
  (/root/reference/service/transfer_service.go:328-354).
* Positions are saved only while the endpoint is enabled, and throttled
  (reference: ≥3 s between saves unless forced, handler.go:152-161) —
  here every ``pos_save_every`` delivered batches so tests are
  deterministic.  Everything delivered after the last save is
  REDELIVERED after a failure; the commands the reference's sinks emit
  are idempotent per key (SET/HSET/DEL/bulk-index by _id), so the sink
  CONVERGES to the same state (the reference's list-structure RPUSH is
  the same known non-idempotent exception there as here).

Ray-native shape: the frame stream is computed distributed (decode →
rule → wire encode as ``map_batches`` stages over Arrow batches); only
the tail — writing bytes to ONE socket in commit order — is serial on
the driver, exactly as serial as the reference's single-endpoint
consumer.  On resume the stream is re-planned with a ``gtid >
position`` filter, so already-acknowledged blocks are pruned at the
read instead of recomputed and skipped.
"""

from __future__ import annotations

import json
import os
import socket
import time

from ..functions.loopback import SinkError

DEST_STATE_OK = "ok"  # metrics.DestStateOK / DestStateFail parity
DEST_STATE_FAIL = "fail"


# ---------------------------------------------------------------------------
# endpoints (socket clients writing the exact wire frames)


class RespEndpoint:
    """Redis endpoint: pipelined RESP frames with a PING barrier.

    ``consume`` writes every frame plus one trailing PING, then reads
    replies until the barrier's +PONG — the pipelined-Exec shape of the
    reference's go-redis sink (redis.go:269-275: one Exec per batch,
    any command error fails the batch).  Any ``-ERR``/``-WRONGTYPE``
    reply or connection drop raises ``SinkError`` → the whole batch is
    unacknowledged and will be redelivered."""

    _PING = b"*1\r\n$4\r\nPING\r\n"

    def __init__(self, address: tuple, *, timeout: float = 10.0):
        self.address = tuple(address)
        self.timeout = timeout
        self._sock: "socket.socket | None" = None
        self._rfile = None

    def connect(self):
        self.close()
        try:
            sock = socket.create_connection(self.address, timeout=self.timeout)
        except OSError as e:
            raise SinkError(f"connect {self.address}: {e}") from e
        self._sock = sock
        self._rfile = sock.makefile("rb")

    def close(self):
        if self._rfile is not None:
            try:
                self._rfile.close()
            except OSError:
                pass
            self._rfile = None
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass
            self._sock = None

    def _read_reply(self) -> bytes:
        line = self._rfile.readline()
        if not line.endswith(b"\r\n"):
            raise SinkError("connection closed mid-reply")
        kind = line[:1]
        if kind == b"-":
            raise SinkError(line[1:-2].decode("utf-8", "replace"))
        if kind in (b"+", b":"):
            return line[:-2]
        if kind == b"$":  # pragma: no cover - sinks only get +/:/-
            n = int(line[1:-2])
            if n >= 0:
                body = self._rfile.read(n + 2)
                if len(body) != n + 2:
                    raise SinkError("connection closed mid-bulk")
            return line[:-2]
        raise SinkError(f"unexpected reply {line!r}")

    def ping(self):
        if self._sock is None:
            raise SinkError("not connected")
        try:
            self._sock.sendall(self._PING)
            reply = self._read_reply()
        except (OSError, ValueError) as e:
            raise SinkError(f"ping: {e}") from e
        if reply != b"+PONG":
            raise SinkError(f"ping got {reply!r}")

    def consume(self, frames: "list[bytes]"):
        if self._sock is None:
            raise SinkError("not connected")
        try:
            self._sock.sendall(b"".join(frames) + self._PING)
            while True:
                if self._read_reply() == b"+PONG":
                    return
        except (OSError, ValueError) as e:
            raise SinkError(f"consume: {e}") from e


class HttpBulkEndpoint:
    """Bulk-HTTP endpoint: one POST /_bulk per batch, NDJSON body —
    the ES sink's surface.  Ping is GET / expecting 200 (the olivere
    client pings the cluster root).  A non-200 response, a response
    with ``"errors": true`` (elastic6.go:302-310), or a dropped
    connection raises ``SinkError``."""

    def __init__(self, address: tuple, *, timeout: float = 10.0):
        self.address = tuple(address)
        self.timeout = timeout

    def connect(self):  # connection-per-request; nothing persistent
        self.ping()

    def close(self):
        pass

    def _request(self, method: str, path: str, body: bytes = b"") -> bytes:
        # Content-Type is mandatory against real ES (strict content-type
        # checking since 6.0 → 406 without it); the bulk body is NDJSON
        head = (
            f"{method} {path} HTTP/1.1\r\nHost: {self.address[0]}\r\n"
            f"Content-Type: application/x-ndjson\r\n"
            f"Content-Length: {len(body)}\r\nConnection: close\r\n\r\n"
        ).encode("latin-1")
        try:
            with socket.create_connection(
                self.address, timeout=self.timeout
            ) as sock:
                sock.sendall(head + body)
                rfile = sock.makefile("rb")
                status = rfile.readline()
                # accept any HTTP/1.x 200 (proxies answer 1.0)
                parts = status.split()
                if len(parts) < 2 or not parts[0].startswith(b"HTTP/1.") \
                        or parts[1] != b"200":
                    raise SinkError(f"{method} {path}: {status!r}")
                length: "int | None" = None
                chunked = False
                while True:
                    line = rfile.readline()
                    if line in (b"\r\n", b""):
                        break
                    name, _, value = line.decode("latin-1").partition(":")
                    name = name.strip().lower()
                    if name == "content-length":
                        length = int(value.strip())
                    elif name == "transfer-encoding":
                        chunked = "chunked" in value.strip().lower()
                if chunked:
                    # minimal chunked-body decode (size line, data, CRLF)
                    out = []
                    while True:
                        size = int(rfile.readline().split(b";")[0], 16)
                        if size == 0:
                            rfile.readline()  # trailing CRLF
                            return b"".join(out)
                        out.append(rfile.read(size))
                        rfile.read(2)
                if length is not None:
                    return rfile.read(length)
                # no framing header: Connection: close → body runs to EOF
                return rfile.read()
        except (OSError, ValueError) as e:
            raise SinkError(f"{method} {path}: {e}") from e

    def ping(self):
        self._request("GET", "/")

    def consume(self, frames: "list[bytes]"):
        payload = self._request("POST", "/_bulk", b"".join(frames))
        try:
            result = json.loads(payload)
        except ValueError as e:
            raise SinkError(f"bulk reply not JSON: {payload!r}") from e
        if result.get("errors"):
            raise SinkError(f"bulk reply has errors: {result}")


# ---------------------------------------------------------------------------
# position storage (positionDao analogue)


class FilePositionStore:
    """Crash-safe single-position file (write-temp + atomic rename) —
    the positionDao the handler saves through (handler.go:183-189);
    the bolt/etcd/zk backends' contract is just Get/Save of one
    position."""

    def __init__(self, path: str):
        self.path = path

    def load(self) -> int:
        try:
            with open(self.path, "r", encoding="utf-8") as f:
                return int(json.load(f)["gtid"])
        except FileNotFoundError:
            return -1

    def save(self, gtid: int):
        tmp = f"{self.path}.tmp.{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"gtid": int(gtid)}, f)
        os.replace(tmp, self.path)


# ---------------------------------------------------------------------------
# the delivery loop (handler + transfer_service recovery semantics)


class LiveSinkLoop:
    """Drive (position, frames) micro-batches into an endpoint with the
    reference's failure semantics.  ``stream_fn(from_gtid)`` must yield
    ``(batch_max_gtid, [frame_bytes, ...])`` in gtid order, starting
    AFTER ``from_gtid`` — it is re-invoked from the saved position after
    every recovery (the ``StartUp()`` analogue)."""

    def __init__(
        self,
        endpoint,
        position_store,
        *,
        pos_save_every: int = 4,
        ping_interval: float = 1.0,
        max_pings: int = 600,
        max_consume_errors: "int | None" = None,
        sleep=time.sleep,
    ):
        self.endpoint = endpoint
        self.store = position_store
        self.pos_save_every = pos_save_every
        self.ping_interval = ping_interval
        self.max_pings = max_pings
        # None = reference parity (transfer_service retries forever); a
        # bound turns a poison batch (-WRONGTYPE every time from a live,
        # pingable sink — max_pings never trips for it) into a terminal
        # SinkError instead of an unbounded redeliver spin
        self.max_consume_errors = max_consume_errors
        self.sleep = sleep
        self.dest_state = DEST_STATE_OK
        self.metrics = {
            "batches_delivered": 0,
            "frames_delivered": 0,
            "consume_errors": 0,
            "pings_failed": 0,
            "reconnects": 0,
            "position_saves": 0,
        }

    def _save(self, gtid: int):
        self.store.save(gtid)
        self.metrics["position_saves"] += 1

    def _wait_for_sink(self):
        """transfer_service.startLoop: ping until the sink answers."""
        self.dest_state = DEST_STATE_FAIL
        self.endpoint.close()
        for _ in range(self.max_pings):
            self.sleep(self.ping_interval)
            try:
                self.endpoint.connect()
                self.endpoint.ping()
            except SinkError:
                self.metrics["pings_failed"] += 1
                self.endpoint.close()
                continue
            self.dest_state = DEST_STATE_OK
            self.metrics["reconnects"] += 1
            return
        raise SinkError(
            f"sink did not recover within {self.max_pings} pings"
        )

    def run(self, stream_fn) -> dict:
        """Deliver the whole stream; returns the metrics dict (plus the
        final position under ``"position"``)."""
        position = self.store.load()
        need_connect = True
        while True:
            if need_connect:
                try:
                    self.endpoint.connect()
                except SinkError:
                    self._wait_for_sink()
            unsaved = 0
            try:
                for batch_gtid, frames in stream_fn(position):
                    self.endpoint.consume(frames)
                    self.metrics["batches_delivered"] += 1
                    self.metrics["frames_delivered"] += len(frames)
                    position = int(batch_gtid)
                    unsaved += 1
                    if unsaved >= self.pos_save_every:
                        self._save(position)
                        unsaved = 0
                if unsaved:
                    self._save(position)
                self.endpoint.close()
                self.metrics["position"] = position
                return self.metrics
            except SinkError:
                # handler.go:175-181: disable endpoint, stop the dump;
                # the unacknowledged tail since the last save redelivers
                self.metrics["consume_errors"] += 1
                if (
                    self.max_consume_errors is not None
                    and self.metrics["consume_errors"]
                    >= self.max_consume_errors
                ):
                    self.endpoint.close()
                    raise
                position = self.store.load()
                self._wait_for_sink()
                # _wait_for_sink returned with a connected, pinged
                # endpoint — re-dialing at the loop top would waste a
                # connection per recovery cycle
                need_connect = False


# ---------------------------------------------------------------------------
# frame streams (Dataset → ordered micro-batches on the driver tail)


def frame_stream(
    dataset_fn,
    *,
    frame_col: str,
    gtid_col: str = "gtid",
    seq_col: "str | None" = None,
    batch_size: int = 1024,
    final_tail: bool = True,
    max_carry: "int | None" = None,
):
    """Build a ``stream_fn`` for ``LiveSinkLoop`` from a Dataset factory.

    ``dataset_fn(from_gtid)`` returns the (lazy) frame Dataset already
    filtered to ``gtid > from_gtid`` — resume re-plans the pipeline so
    pruning happens at the read.  The tail sorts by (gtid[, seq_col])
    (commit order; pass ``seq_col`` whenever the frames carry an
    intra-transaction sequence — equal-gtid rows have no defined order
    out of a range-partitioned sort otherwise, and order-sensitive
    commands like RPUSH/SET-same-key land inside one transaction) and
    iterates Arrow batches with backpressure — the full stream is never
    materialized on the driver.

    Micro-batches are ALIGNED TO TRANSACTION BOUNDARIES: rows of a gtid
    that spills past an Arrow batch are held back and yielded with the
    rest of their transaction, so the ``batch_max_gtid`` the loop
    checkpoints never names a transaction whose tail is undelivered
    (the reference saves the position only on XID — commit — events,
    /root/reference/service/handler.go:106-113, for the same reason).

    ``final_tail``: with a BOUNDED stream (the default) end-of-stream
    means the trailing transaction is complete, so its flush checkpoints
    its own gtid.  Follow-mode passes set ``final_tail=False``: the pass
    end is only "shards landed so far", and a producer rolling files
    mid-transaction may still owe the trailing gtid more rows — the
    flush then delivers the tail but checkpoints the LAST COMPLETE
    transaction, so the next pass redelivers the open one whole
    (at-least-once on the boundary txn; the keyed commands converge).

    ``max_carry`` (default 8×batch_size): a bulk-load transaction of
    millions of rows shares one gtid — slices of it stream out once the
    hold-back buffer reaches this many frames, checkpointed at the last
    complete gtid, so a giant transaction never materializes on the
    driver."""

    import numpy as np

    cap = max_carry if max_carry is not None else 8 * batch_size

    def stream(from_gtid: int):
        keys = [gtid_col] if seq_col is None else [gtid_col, seq_col]
        ds = dataset_fn(from_gtid).sort(keys)
        carry: "list[bytes]" = []  # frames of the trailing (open) gtid
        carry_gtid = -1
        completed = int(from_gtid)  # gtid of the last fully-yielded txn
        for batch in ds.iter_batches(
            batch_size=batch_size, batch_format="pyarrow"
        ):
            if batch.num_rows == 0:
                continue
            gtids = batch.column(gtid_col).to_numpy(zero_copy_only=False)
            frames = [
                f.encode("utf-8") if isinstance(f, str) else f
                for f in batch.column(frame_col).to_pylist()
            ]
            last = int(gtids[-1])
            # first index of the trailing run of `last` (gtids ascending)
            cut = int(np.searchsorted(gtids, last, side="left"))
            if cut > 0:
                # carry (gtid ≤ gtids[0] ≤ gtids[cut-1]) + rows[:cut] are
                # complete transactions — no later batch can revisit a
                # gtid < last once the stream is sorted
                completed = int(gtids[cut - 1])
                yield completed, carry + frames[:cut]
                carry, carry_gtid = frames[cut:], last
            elif carry and carry_gtid != last:
                # whole batch is one NEW gtid: the carried txn closed
                completed = carry_gtid
                yield completed, carry
                carry, carry_gtid = frames, last
            else:
                carry += frames
                carry_gtid = last
            if len(carry) >= cap:
                # giant open transaction: stream a slice now, checkpoint
                # the last COMPLETE gtid (a failure redelivers the whole
                # transaction — at-least-once) — bounded driver memory
                yield completed, carry
                carry = []  # carry_gtid stays: the txn is still open
        if carry:
            yield (carry_gtid if final_tail else completed), carry

    return stream
