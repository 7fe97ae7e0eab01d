"""Multi-driver stories: takeover after a mid-stage-B crash, and the
concurrent node-mode guard.

The reference runs cluster HA via leader election + shared position
storage (/root/reference/service/election/etcd_election.go:55-110,
service/cluster_service.go:43-61): a standby takes over from the shared
checkpoint when the leader dies.  In this engine's batch-replay model
the equivalents are per-partition manifests + GTID fencing + plan
signatures: ANY driver pointed at the lake converges — finished
partitions fence, unfinished ones recompute from the idempotent delta
exchange.  These tests prove that takeover story, plus the guard that
keeps a second LIVE node-mode run's delta buffers from being destroyed
(stages/shuffle.reap_stale_node_buffers)."""

import glob
import os
import shutil

import pytest
import ray

from go_mysql_transfer_ray import oracle
from go_mysql_transfer_ray.pipelines import cdc
from go_mysql_transfer_ray.sources.binlog import (
    BinlogConfig,
    generate,
    materialize_events,
)
from go_mysql_transfer_ray.stages import shuffle as shfl

from .util import assert_state_equal


def test_takeover_after_mid_stage_b_crash(tmp_path):
    """Driver 1 dies AFTER the exchange but with only part of stage B
    done (some partitions have final output + manifests, others only
    delta files).  Driver 2 — a different process in production; the
    same public call here — must fence the finished partitions and
    finish the rest, converging to the sequential oracle."""
    cfg = BinlogConfig(num_keys=250, avg_events_per_key=3.0, delete_pct=15)
    events_dir = materialize_events(cfg, root=str(tmp_path / "ev"), shards=2)
    out = str(tmp_path / "lake")

    # driver 1: full run, then reconstruct its mid-stage-B crash state —
    # keep the shuffle deltas (stage A finished), drop 3 of 8 partitions'
    # outputs + manifests (stage B died in flight).  cdc.replay removes
    # the shuffle dir on success, so driver 1's exchange is rebuilt the
    # same way the crashed driver built it: by running stage A again
    # against the same plan meta (delta names are content-addressed, so
    # this is byte-identical to the crash leftovers).
    cdc.replay(events_dir, out, num_partitions=8)
    for p in (1, 4, 6):
        shutil.rmtree(os.path.join(out, f"part={p:05d}"))
        os.unlink(os.path.join(out, "_manifests", f"part-{p:05d}.json"))

    # driver 2 takes over: only the 3 dead partitions recompute
    m2 = cdc.replay(events_dir, out, num_partitions=8)
    assert m2["parts_written"] == 3 and m2["parts_skipped"] == 5
    assert_state_equal(cdc.lake_table(out), oracle.replay_full(generate(cfg).table))

    # driver 3 (same plan, nothing to do): pure fence
    m3 = cdc.replay(events_dir, out, num_partitions=8)
    assert m3["parts_written"] == 0 and m3["resumed"]


def test_takeover_with_changed_plan_recomputes_everything(tmp_path):
    """A takeover driver running a DIFFERENT plan (here: a different
    partition count) must not trust the old manifests — the plan
    signature forces a clean recompute, still converging."""
    cfg = BinlogConfig(num_keys=180, avg_events_per_key=2.5, delete_pct=10)
    events_dir = materialize_events(cfg, root=str(tmp_path / "ev"), shards=2)
    out = str(tmp_path / "lake")
    cdc.replay(events_dir, out, num_partitions=8)
    m2 = cdc.replay(events_dir, out, num_partitions=4)
    assert m2["parts_written"] == 4 and m2["parts_skipped"] == 0
    assert_state_equal(cdc.lake_table(out), oracle.replay_full(generate(cfg).table))


def _spawn_buffer(name: str, shuffle_dir: str):
    cls = ray.remote(num_cpus=0)(shfl._NodeDeltaBuffer)
    a = cls.options(
        name=name, namespace=shfl._BUF_NAMESPACE, lifetime="detached"
    ).remote(shuffle_dir, 1 << 20)
    ray.get(a.describe.remote())  # ensure constructed before the sweep
    return a


def test_concurrent_node_mode_guard(tmp_path, ray_session):
    """The reaper kills only provably-stale buffer actors; a live buffer
    for a DIFFERENT lake's shuffle dir means a concurrent node-mode run
    and must fail fast instead of destroying its deltas."""
    other_dir = str(tmp_path / "other_shuffle")
    os.makedirs(other_dir)
    name = "gmtbuf-otherrun-node0"
    _spawn_buffer(name, other_dir)
    try:
        # live + different dir → fail fast, actor survives
        with pytest.raises(RuntimeError, match="live node-mode replay"):
            shfl.reap_stale_node_buffers("myrun", str(tmp_path / "mine"))
        assert ray.get_actor(name, namespace=shfl._BUF_NAMESPACE) is not None

        # same shuffle dir as the new run (superseded attempt) → reaped
        assert shfl.reap_stale_node_buffers("myrun", other_dir) == 1
        with pytest.raises(ValueError):
            ray.get_actor(name, namespace=shfl._BUF_NAMESPACE)

        # its shuffle dir vanished (lake cleaned up) → reaped
        gone_dir = str(tmp_path / "gone")
        os.makedirs(gone_dir)
        _spawn_buffer(name, gone_dir)
        shutil.rmtree(gone_dir)
        assert shfl.reap_stale_node_buffers(
            "myrun", str(tmp_path / "mine")
        ) == 1

        # idle past the staleness horizon (crashed driver aging out) →
        # reaped even though the dir still exists
        _spawn_buffer(name, other_dir)
        assert shfl.reap_stale_node_buffers(
            "myrun", str(tmp_path / "mine"), stale_after_s=0.0
        ) == 1

        # a buffer of THIS run id is never touched
        mine = "gmtbuf-myrun-node0"
        _spawn_buffer(mine, other_dir)
        assert shfl.reap_stale_node_buffers(
            "myrun", str(tmp_path / "mine"), stale_after_s=0.0
        ) == 0
        ray.kill(ray.get_actor(mine, namespace=shfl._BUF_NAMESPACE))
    finally:
        for n in (name, "gmtbuf-myrun-node0"):
            try:
                ray.kill(ray.get_actor(n, namespace=shfl._BUF_NAMESPACE))
            except ValueError:
                pass


def test_node_mode_replay_reaps_stale_then_converges(tmp_path, ray_session):
    """End-to-end: a leftover aged buffer from a 'crashed' prior run does
    not stop a node-mode takeover replay (it is reaped), and the lake
    converges to the oracle."""
    cfg = BinlogConfig(num_keys=150, avg_events_per_key=2.5, delete_pct=10)
    events_dir = materialize_events(cfg, root=str(tmp_path / "ev"), shards=2)
    out = str(tmp_path / "lake")
    # the crashed run's buffer points at THIS lake's (future) shuffle dir
    stale = _spawn_buffer(
        "gmtbuf-deadrun-node0", os.path.join(out, "_shuffle")
    )
    del stale
    cdc.replay(events_dir, out, num_partitions=8, delta_mode="node")
    with pytest.raises(ValueError):  # reaped by the replay's sweep
        ray.get_actor("gmtbuf-deadrun-node0", namespace=shfl._BUF_NAMESPACE)
    assert_state_equal(cdc.lake_table(out), oracle.replay_full(generate(cfg).table))


# ---------------------------------------------------------------------------
# lease-based leader election (cluster mode): two CONTENDING drivers


def test_lease_cas_exactly_one_winner(tmp_path):
    """N contenders campaigning concurrently for a vacant lease: the
    atomic create admits exactly one (etcd Campaign semantics)."""
    import threading

    from go_mysql_transfer_ray.state.election import LeaseElection

    out = str(tmp_path / "lake")
    os.makedirs(os.path.join(out, "_manifests"), exist_ok=True)
    winners = []
    barrier = threading.Barrier(8)

    def contend(i):
        e = LeaseElection(out, f"node-{i}", ttl=30.0)
        barrier.wait()
        if e.campaign():
            winners.append((i, e.fencing_token))

    threads = [threading.Thread(target=contend, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(winners) == 1 and winners[0][1] == 1


def test_lease_renew_resign_and_expiry(tmp_path):
    from go_mysql_transfer_ray.state.election import LeaseElection

    out = str(tmp_path / "lake")
    os.makedirs(os.path.join(out, "_manifests"), exist_ok=True)
    now = {"t": 1000.0}
    clk = lambda: now["t"]  # noqa: E731
    a = LeaseElection(out, "a", ttl=10.0, clock=clk)
    b = LeaseElection(out, "b", ttl=10.0, clock=clk)

    assert a.campaign() and a.is_leader() and a.fencing_token == 1
    assert not b.campaign() and b.leader() == "a"
    # renewal extends the lease past the original expiry
    now["t"] += 8
    assert a.renew()
    now["t"] += 8  # 16 > ttl from acquisition, but only 8 since renew
    assert a.is_leader() and not b.campaign()
    # expiry without renewal → standby takes over with a HIGHER epoch
    now["t"] += 11
    assert not a.is_leader()
    assert b.campaign() and b.fencing_token == 2
    # the deposed leader's next renew reports session-done
    assert not a.renew() and a.fencing_token == 0
    # resign hands over immediately, no TTL wait
    b.resign()
    assert b.leader() == ""
    assert a.campaign() and a.fencing_token == 3


def test_contending_drivers_serialize_then_fence(tmp_path, ray_session):
    """Two drivers started concurrently on one lake: the lease admits
    exactly one replayer; the loser waits as a follower and, once the
    winner resigns, replays as a pure fence (zero partitions rewritten).
    This is cluster_service.go:43-61 with the lake as the shared store."""
    import threading

    from go_mysql_transfer_ray.pipelines.cluster import replay_as_cluster_node

    cfg = BinlogConfig(num_keys=200, avg_events_per_key=3.0, delete_pct=10)
    events_dir = materialize_events(cfg, root=str(tmp_path / "ev"), shards=2)
    out = str(tmp_path / "lake")
    os.makedirs(os.path.join(out, "_manifests"), exist_ok=True)

    results = {}
    barrier = threading.Barrier(2)

    def drive(node):
        barrier.wait()
        results[node] = replay_as_cluster_node(
            events_dir, out, node, ttl=5.0, poll=0.05, num_partitions=8
        )

    threads = [
        threading.Thread(target=drive, args=(f"driver-{i}",)) for i in (1, 2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    by_written = sorted(results.values(), key=lambda m: -m["parts_written"])
    leader_run, standby_run = by_written
    assert leader_run["parts_written"] == 8
    assert standby_run["parts_written"] == 0 and standby_run["resumed"]
    # the standby really waited for the lease, then held a later epoch
    assert standby_run["waited_rounds"] >= 1
    assert standby_run["epoch"] > leader_run["epoch"]
    assert_state_equal(cdc.lake_table(out), oracle.replay_full(generate(cfg).table))


def test_standby_takes_over_on_lease_expiry(tmp_path, ray_session):
    """The leader CRASHES mid-replay (stops renewing, partitions half
    written): the standby's campaign succeeds only after the TTL, gets a
    higher fencing token, and its replay converges the lake."""
    from go_mysql_transfer_ray.pipelines.cluster import replay_as_cluster_node
    from go_mysql_transfer_ray.state.election import LeaseElection

    cfg = BinlogConfig(num_keys=200, avg_events_per_key=3.0, delete_pct=10)
    events_dir = materialize_events(cfg, root=str(tmp_path / "ev"), shards=2)
    out = str(tmp_path / "lake")
    os.makedirs(os.path.join(out, "_manifests"), exist_ok=True)

    # the doomed leader: acquires, "replays" partially (3 of 8 partitions
    # missing, the takeover fixture), then dies without renew/resign.
    # TTL is long so the "still live" pre-check below can never race the
    # replay's wall time — expiry is then fast-forwarded explicitly.
    crashed = LeaseElection(out, "doomed", ttl=30.0)
    assert crashed.campaign() and crashed.fencing_token == 1
    cdc.replay(events_dir, out, num_partitions=8)
    for p in (2, 5, 7):
        shutil.rmtree(os.path.join(out, f"part={p:05d}"))
        os.unlink(os.path.join(out, "_manifests", f"part-{p:05d}.json"))

    # standby contends while the (dead) leader's lease is still live
    standby = LeaseElection(out, "standby", ttl=5.0)
    assert not standby.campaign()  # lease not yet expired

    # fast-forward: the dead leader stops renewing and its lease lapses
    # in ~1 s (deterministic stand-in for waiting out a real TTL; the
    # "still live" behavior is already proven by the assert above, so no
    # second check races this window)
    import json as _json
    import time as _time

    lease_path = os.path.join(
        out, "_manifests", "_election", "epoch-000000000001.json"
    )
    with open(lease_path, "r", encoding="utf-8") as f:
        lease = _json.load(f)
    lease["expires_at"] = _time.time() + 1.0
    with open(lease_path, "w", encoding="utf-8") as f:
        _json.dump(lease, f)
    m = replay_as_cluster_node(
        events_dir, out, "standby", ttl=5.0, poll=0.05, num_partitions=8
    )
    assert m["epoch"] == 2  # took over with a HIGHER fencing token
    assert m["waited_rounds"] >= 1  # actually waited out the dead lease
    assert m["parts_written"] == 3 and m["parts_skipped"] == 5
    assert_state_equal(cdc.lake_table(out), oracle.replay_full(generate(cfg).table))


def test_admin_dashboard_reports_cluster_fields(tmp_path):
    """web_admin surfaces isCluster/isLeader/leader/currentNode
    (router.go:105-110) and flips the Prometheus leader gauge."""
    import json
    import urllib.request

    from go_mysql_transfer_ray.state.election import LeaseElection
    from go_mysql_transfer_ray.web_admin import AdminServer

    out = str(tmp_path / "lake")
    os.makedirs(os.path.join(out, "_manifests"), exist_ok=True)
    leader = LeaseElection(out, "n1", ttl=30.0)
    follower = LeaseElection(out, "n2", ttl=30.0)
    assert leader.campaign() and not follower.campaign()

    srv = AdminServer(out, {}, election=follower).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/", timeout=5
        ) as r:
            dash = json.loads(r.read())
        assert dash["isCluster"] is True
        assert dash["isLeader"] is False
        assert dash["leader"] == "n1" and dash["currentNode"] == "n2"
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/metrics", timeout=5
        ) as r:
            text = r.read().decode()
        assert "transfer_leader_state 0" in text
    finally:
        srv.close()
