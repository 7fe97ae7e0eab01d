"""Lease-based leader election over the shared lake store.

The reference's cluster mode serializes ingestion behind a leader
elected through etcd/zookeeper: campaign, hold a TTL session, renew it,
and hand over when the session dies
(/root/reference/service/election/etcd_election.go:55-110 — Campaign /
session.Done → beFollower; /root/reference/service/cluster_service.go:43-61
— selected → StartUp(), deposed → stopDump()).  This engine's shared
store is the lake directory itself, so the election rides the same
storage with no coordination service:

* **Primitive**: atomic create-if-absent (``os.link`` of a fully
  written temp file — atomic on POSIX, the conditional-put analogue on
  object stores).  A campaign for epoch ``N+1`` is one such create;
  exactly one contender's create succeeds, everyone else re-reads and
  becomes a follower.
* **Epoch = fencing token**: monotonically increasing, one file per
  epoch (``_manifests/_election/epoch-<N>.json``).  The highest epoch
  file IS the lease.  A deposed leader can still be running — its next
  ``renew()`` sees the higher epoch and reports deposition (the
  ``session.Done()`` signal), and its stale fencing token lets
  downstream writers reject it.
* **Renewal**: only the epoch holder rewrites its own epoch file
  (atomic temp + ``os.replace``) with a fresh expiry; contenders never
  touch epoch ``N`` — they create ``N+1`` once ``N`` has expired.
* **Resign**: the holder zeroes its expiry so a standby takes over
  immediately (``elc.Resign``, etcd_election.go:101-104).

Clocks: expiries use wall-clock epoch seconds (``time.time``) because
contending drivers are separate processes/machines; the TTL must be
chosen ≫ plausible clock skew, exactly as with etcd leases.
"""

from __future__ import annotations

import json
import os
import time

_ELECTION_DIR = "_election"
_KEEP_EPOCHS = 4  # retain a short trail for debugging/takeover forensics


class LeaseElection:
    """Campaign/renew/resign over ``<out_dir>/_manifests/_election``.

    ``node_id`` is this driver's identity (global.CurrentNode()); ``ttl``
    the lease duration in seconds.  All methods are crash-safe: every
    state transition is one atomic filesystem operation."""

    def __init__(self, out_dir: str, node_id: str, *, ttl: float = 10.0,
                 clock=time.time):
        from .manifest import manifest_dir

        self.dir = os.path.join(manifest_dir(out_dir), _ELECTION_DIR)
        os.makedirs(self.dir, exist_ok=True)
        self.node_id = node_id
        self.ttl = float(ttl)
        self.clock = clock
        self._epoch = 0  # the epoch this node holds (0 = never led)

    # -- store primitives ---------------------------------------------------

    def _epoch_path(self, epoch: int) -> str:
        return os.path.join(self.dir, f"epoch-{epoch:012d}.json")

    def _scan(self) -> tuple[int, "dict | None"]:
        """(highest epoch, its lease dict) — (0, None) when nobody has
        ever campaigned.  A concurrent ``os.replace`` of the lease file
        is atomic, so reads see either the old or the new content."""
        best = 0
        for name in os.listdir(self.dir):
            if name.startswith("epoch-") and name.endswith(".json"):
                try:
                    best = max(best, int(name[6:-5]))
                except ValueError:
                    continue
        if not best:
            return 0, None
        try:
            with open(self._epoch_path(best), "r", encoding="utf-8") as f:
                return best, json.load(f)
        except (FileNotFoundError, ValueError):
            # mid-replace or GC'd from under us: treat as expired
            return best, None

    def _write_atomic(self, path: str, lease: dict, *, exclusive: bool) -> bool:
        """Full-content atomic publish.  ``exclusive=True`` is the CAS:
        fails (returns False) when the path already exists."""
        tmp = f"{path}.tmp.{self.node_id}.{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(lease, f)
        try:
            if exclusive:
                try:
                    os.link(tmp, path)  # atomic create-if-absent
                except FileExistsError:
                    return False
            else:
                os.replace(tmp, path)
            return True
        finally:
            try:
                os.unlink(tmp)
            except FileNotFoundError:
                pass

    def _lease(self) -> dict:
        now = self.clock()
        return {
            "node": self.node_id,
            "acquired_at": now,
            "expires_at": now + self.ttl,
        }

    # -- the election protocol ----------------------------------------------

    def campaign(self) -> bool:
        """One campaign round (etcd_election.go:61-88 doElect body):
        returns True iff this node now holds the lease.  Non-blocking —
        followers re-call on their poll loop (ensureFollower)."""
        epoch, lease = self._scan()
        if lease is not None and self.clock() < lease["expires_at"]:
            if lease["node"] == self.node_id:
                self._epoch = epoch
                return True
            return False  # live leader elsewhere → follower
        # expired (or vacant): exactly one contender creates epoch+1
        if self._write_atomic(
            self._epoch_path(epoch + 1), self._lease(), exclusive=True
        ):
            self._epoch = epoch + 1
            self._gc(epoch + 1)
            return True
        # lost the race — re-read in case WE somehow won a parallel call
        epoch, lease = self._scan()
        won = bool(
            lease
            and lease["node"] == self.node_id
            and self.clock() < lease["expires_at"]
        )
        if won:
            self._epoch = epoch
        return won

    def renew(self) -> bool:
        """Extend the held lease; False means DEPOSED (a higher epoch
        exists or the lease changed hands) — the session.Done signal.
        Only ever rewrites this node's own epoch file."""
        if not self._epoch:
            return False
        epoch, lease = self._scan()
        if epoch != self._epoch or not lease or lease["node"] != self.node_id:
            self._epoch = 0
            return False
        return self._write_atomic(
            self._epoch_path(epoch), self._lease(), exclusive=False
        )

    def resign(self):
        """Zero the expiry so a standby can take over immediately."""
        if not self._epoch:
            return
        epoch, lease = self._scan()
        if epoch == self._epoch and lease and lease["node"] == self.node_id:
            lease = dict(lease, expires_at=0.0)
            self._write_atomic(self._epoch_path(epoch), lease, exclusive=False)
        self._epoch = 0

    def is_leader(self) -> bool:
        """Live check against the store (IsLeader, etcd_election.go:112)."""
        epoch, lease = self._scan()
        return bool(
            lease
            and epoch == self._epoch
            and lease["node"] == self.node_id
            and self.clock() < lease["expires_at"]
        )

    def leader(self) -> str:
        """Current holder's node id, '' when the lease is vacant/expired
        (Leader(), etcd_election.go:116)."""
        _, lease = self._scan()
        if lease and self.clock() < lease["expires_at"]:
            return lease["node"]
        return ""

    @property
    def fencing_token(self) -> int:
        """The held epoch (0 when not leader) — stamp writes with it so
        a deposed leader's stragglers are rejectable downstream."""
        return self._epoch

    def _gc(self, current: int):
        for name in os.listdir(self.dir):
            if name.startswith("epoch-") and name.endswith(".json"):
                try:
                    n = int(name[6:-5])
                except ValueError:
                    continue
                if n <= current - _KEEP_EPOCHS:
                    try:
                        os.unlink(os.path.join(self.dir, name))
                    except FileNotFoundError:
                        pass
