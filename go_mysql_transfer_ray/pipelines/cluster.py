"""Cluster mode: serialize contending drivers behind the lease election.

The reference's cluster service wires election signals to the transfer
lifecycle: become leader → ``StartUp()`` (start ingesting from the
shared position), become follower → ``stopDump()``
(/root/reference/service/cluster_service.go:43-61).  Here the ingest
unit is one ``cdc.replay`` pass over the shared lake, so the node loop
is: campaign until leader (the ensureFollower poll,
etcd_election.go:120-139), replay with a heartbeat renewing the lease,
then resign.  A node that CRASHES mid-replay simply stops renewing —
the standby's campaign succeeds after the TTL and its replay converges
from the crashed leader's manifests (partition fencing + idempotent
delta exchange do the actual recovery; the lease only guarantees the
drivers don't run stage A concurrently).

The heartbeat runs in a daemon thread; if it ever finds the node
DEPOSED (a higher epoch appeared — possible only after a renewal gap
longer than the TTL, e.g. a paused process), it sets ``deposed`` and
the replay result is discarded by raising, because a deposed leader
must not report success it can no longer vouch for."""

from __future__ import annotations

import threading
import time

from ..state.election import LeaseElection


class Deposed(RuntimeError):
    """The lease was lost mid-replay (session.Done mid-dump)."""


def replay_as_cluster_node(
    events_dir: str,
    out_dir: str,
    node_id: str,
    *,
    ttl: float = 10.0,
    poll: float = 0.25,
    max_wait: float = 300.0,
    sleep=time.sleep,
    replay_fn=None,
    **replay_kwargs,
) -> dict:
    """Campaign on ``out_dir``'s lease, then replay as the leader.

    Returns ``cdc.replay``'s metrics dict plus ``node``/``epoch``/
    ``waited_rounds``.  ``replay_fn`` overrides the replay callable
    (tests inject slow/crashing replays); signature
    ``fn(events_dir, out_dir, **kwargs)``."""
    if replay_fn is None:
        from . import cdc

        replay_fn = cdc.replay

    election = LeaseElection(out_dir, node_id, ttl=ttl)
    waited = 0
    deadline = time.monotonic() + max_wait
    while not election.campaign():
        if time.monotonic() >= deadline:
            raise TimeoutError(
                f"{node_id}: no leadership within {max_wait}s "
                f"(leader={election.leader()!r})"
            )
        waited += 1
        sleep(poll)

    deposed = threading.Event()
    stop = threading.Event()

    def heartbeat():
        while not stop.wait(ttl / 3.0):
            if not election.renew():
                deposed.set()
                return

    hb = threading.Thread(target=heartbeat, daemon=True)
    hb.start()
    try:
        metrics = replay_fn(events_dir, out_dir, **replay_kwargs)
        if deposed.is_set():
            raise Deposed(f"{node_id} lost the lease mid-replay")
        return dict(
            metrics,
            node=node_id,
            epoch=election.fencing_token,
            waited_rounds=waited,
        )
    finally:
        stop.set()
        hb.join(timeout=5)
        if not deposed.is_set():
            election.resign()
