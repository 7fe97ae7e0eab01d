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
