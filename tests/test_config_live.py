"""run_app_live (the ``live`` CLI mode): app.yml redis rules → exact
RESP frames over a real loopback socket — the reference's actual daemon
delivery loop (service/handler.go:173-181, transfer_service.go:328-354).

The decisive property: the live keyspace must converge to exactly the
state relation run_app materializes for the same rules, and killing the
sink mid-stream must not change that."""

import json
import os
import shutil
import subprocess
import sys
import threading

import pyarrow.parquet as pq
import pytest

from go_mysql_transfer_ray.config import load_app, run_app, run_app_live
from go_mysql_transfer_ray.functions.loopback import (
    LoopbackHttpBulkServer,
    LoopbackRespServer,
)
from go_mysql_transfer_ray.sources.binlog import BinlogConfig, materialize_events

ROOT = "/tmp/gmt_test_config_live"

APP_STRING = (
    "target: redis\n"
    "rule:\n"
    "  -\n"
    "    table: repos\n"
    "    redis_structure: string\n"
    "    redis_key_prefix: 'r:'\n"
)

APP_HASH = (
    "target: redis\n"
    "rule:\n"
    "  -\n"
    "    table: repos\n"
    "    redis_structure: hash\n"
    "    redis_key_value: repo_hash\n"
    "    redis_hash_field_prefix: 'f_'\n"
)


@pytest.fixture(scope="module")
def events(ray_session):
    return materialize_events(
        BinlogConfig(num_keys=120, avg_events_per_key=3.0, delete_pct=12, seed=11),
        root=os.path.join(ROOT, "events"),
        shards=2,
    )


def _state_table(app_yaml: str, events_dir: str, tag: str):
    """run_app's materialized redis state — the convergence oracle."""
    out = os.path.join(ROOT, f"state_{tag}")
    shutil.rmtree(out, ignore_errors=True)
    res = run_app(load_app(app_yaml), events_dir, out, num_partitions=8)
    return pq.read_table(res["tables"]["repos"]["path"])


def _live(app_yaml: str, events_dir: str, server, tag: str, **kw):
    pos = os.path.join(ROOT, f"pos_{tag}")
    shutil.rmtree(pos, ignore_errors=True)
    kw.setdefault("batch_size", 256)
    return run_app_live(
        load_app(app_yaml), events_dir, server.address,
        position_dir=pos, **kw,
    )


def test_live_string_converges_to_run_app_state(events):
    server = LoopbackRespServer().start()
    try:
        m = _live(APP_STRING, events, server, "string")
        live = {
            k: v for k, (typ, v) in server.snapshot().items() if typ == "string"
        }
    finally:
        server.stop()
    oracle_tab = _state_table(APP_STRING, events, "string")
    oracle = dict(
        zip(
            oracle_tab.column("redis_key").to_pylist(),
            oracle_tab.column("value").to_pylist(),
        )
    )
    assert live == oracle and len(live) > 50
    tm = m["tables"]["repos"]
    assert tm["consume_errors"] == 0 and tm["frames_delivered"] > 0


def test_live_hash_converges_to_run_app_state(events):
    server = LoopbackRespServer().start()
    try:
        _live(APP_HASH, events, server, "hash")
        snap = server.snapshot()
    finally:
        server.stop()
    assert set(snap) == {"repo_hash"} and snap["repo_hash"][0] == "hash"
    oracle_tab = _state_table(APP_HASH, events, "hash")
    oracle = dict(
        zip(
            oracle_tab.column("field").to_pylist(),
            oracle_tab.column("value").to_pylist(),
        )
    )
    assert snap["repo_hash"][1] == oracle and len(oracle) > 50


def test_live_kill_mid_stream_converges_identically(events):
    """Sink dies mid-delivery → pause → ping → resume from the position
    file; the healed keyspace is identical to an uninterrupted run's."""
    server = LoopbackRespServer().start()
    try:
        server.fail_after(120)
        stop = threading.Event()

        def heal_once_down():
            # heal only after the injected fault actually fired —
            # healing earlier would clear the pending fail_after counter
            while not stop.is_set() and not server._fault.is_down():
                stop.wait(0.02)
            stop.wait(0.3)
            server.heal()

        healer = threading.Thread(target=heal_once_down, daemon=True)
        healer.start()
        try:
            m = _live(
                APP_STRING, events, server, "kill",
                ping_interval=0.1, max_pings=300,
            )
        finally:
            stop.set()
        live = {
            k: v for k, (typ, v) in server.snapshot().items() if typ == "string"
        }
        tm = m["tables"]["repos"]
        assert tm["consume_errors"] >= 1 and tm["reconnects"] >= 1
    finally:
        server.stop()
    oracle_tab = _state_table(APP_STRING, events, "kill")
    oracle = dict(
        zip(
            oracle_tab.column("redis_key").to_pylist(),
            oracle_tab.column("value").to_pylist(),
        )
    )
    assert live == oracle


def test_live_resume_skips_delivered_prefix(events):
    """A second run over the same position dir replays nothing — the
    pruned re-read starts after the saved gtid (StartUp analogue)."""
    server = LoopbackRespServer().start()
    try:
        m1 = _live(APP_STRING, events, server, "resume")
        pos_dir = os.path.join(ROOT, "pos_resume")
        m2 = run_app_live(
            load_app(APP_STRING), events, server.address,
            position_dir=pos_dir, batch_size=256,
        )
    finally:
        server.stop()
    assert m1["tables"]["repos"]["frames_delivered"] > 0
    assert m2["tables"]["repos"]["frames_delivered"] == 0


APP_ES = (
    "target: elasticsearch\n"
    "rule:\n"
    "  -\n"
    "    table: repos\n"
    "    include_columns: repo,path,lang\n"
)


def test_live_es_converges_to_lake_with_kill(events):
    """Bulk NDJSON over the HTTP loopback, killed mid-stream and
    healed, converges to the same per-id docs as run_app's keyed lake
    (elastic6.go:293-310 bulk by _id is LWW per doc)."""
    from go_mysql_transfer_ray.pipelines import cdc

    server = LoopbackHttpBulkServer().start()
    try:
        server.fail_after(2)
        stop = threading.Event()

        def heal_once_down():
            while not stop.is_set() and not server._fault.is_down():
                stop.wait(0.02)
            stop.wait(0.3)
            server.heal()

        threading.Thread(target=heal_once_down, daemon=True).start()
        try:
            m = _live(
                APP_ES, events, server, "es", batch_size=64,
                ping_interval=0.1, max_pings=300,
            )
        finally:
            stop.set()
        docs = server.snapshot()
        tm = m["tables"]["repos"]
        assert tm["consume_errors"] >= 1 and tm["reconnects"] >= 1
    finally:
        server.stop()
    live = {i: (d["repo"], d["path"], d["lang"]) for i, d in docs.items()}

    out = os.path.join(ROOT, "state_es")
    shutil.rmtree(out, ignore_errors=True)
    run_app(load_app(APP_ES), events, out, num_partitions=8)
    lake = cdc.lake_table(os.path.join(out, "lake"))
    oracle = {
        r["repo"] + r["path"]: (r["repo"], r["path"], r["lang"])
        for r in lake.to_pylist()
    }
    assert live == oracle and len(live) > 100


APP_MULTI = (
    "target: redis\n"
    "rule:\n"
    "  -\n"
    "    table: repos\n"
    "    redis_structure: string\n"
    "    redis_key_prefix: 'r:'\n"
    "  -\n"
    "    table: users\n"
    "    redis_structure: string\n"
    "    redis_key_prefix: 'u:'\n"
    "    include_columns: user_id,plan\n"
)


def test_live_multi_table_two_rules(ray_session):
    """Two per-table rules over ONE interleaved binlog (the reference's
    core operating mode, transfer_service.go:206-276) run one live loop
    + position file per table and converge both keyspaces."""
    from go_mysql_transfer_ray.sources.binlog import materialize_multi_events

    ev = materialize_multi_events(
        BinlogConfig(num_keys=150, avg_events_per_key=3.0, delete_pct=12,
                     seed=5),
        BinlogConfig(num_keys=80, avg_events_per_key=3.0, delete_pct=10,
                     seed=6),
        root=os.path.join(ROOT, "multi_events"), shards=2,
    )
    server = LoopbackRespServer().start()
    try:
        m = _live(APP_MULTI, ev, server, "multi")
        live = {
            k: v for k, (typ, v) in server.snapshot().items() if typ == "string"
        }
    finally:
        server.stop()
    assert set(m["tables"]) == {"repos", "users"}
    pos_dir = os.path.join(ROOT, "pos_multi")
    assert sorted(os.listdir(pos_dir)) == ["repos.json", "users.json"]

    oracle_tab = _state_table(APP_MULTI, ev, "multi")
    # run_app writes one state relation per table; merge both
    out = os.path.join(ROOT, "state_multi")
    oracle = {}
    for tbl in ("repos", "users"):
        t = pq.read_table(os.path.join(out, f"redis={tbl}"))
        oracle.update(
            zip(t.column("redis_key").to_pylist(), t.column("value").to_pylist())
        )
    assert live == oracle
    assert sum(k.startswith("u:") for k in live) > 20
    assert sum(k.startswith("r:") for k in live) > 50


def test_live_rejects_non_socket_target(events):
    with pytest.raises(ValueError, match="socket sinks"):
        run_app_live(
            load_app("target: kafka\nrule:\n  -\n    table: repos\n"),
            events, ("127.0.0.1", 1), position_dir=os.path.join(ROOT, "bad"),
        )


def test_cli_live_loopback(events):
    """``live --loopback`` end-to-end in a fresh process (own Ray
    session, per the CLI contract)."""
    cfg = os.path.join(ROOT, "app_cli.yml")
    with open(cfg, "w", encoding="utf-8") as f:
        f.write(APP_STRING)
    shutil.rmtree(os.path.join(ROOT, "pos_cli"), ignore_errors=True)
    r = subprocess.run(
        [sys.executable, "-m", "go_mysql_transfer_ray", "--num-cpus", "4",
         "live", "--config", cfg, "--events", events, "--loopback",
         "--position-dir", os.path.join(ROOT, "pos_cli")],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["target"] == "redis-live"
    assert out["loopback_keys"] > 50
    assert out["tables"]["repos"]["consume_errors"] == 0


def test_follow_mode_delivers_late_arriving_tail(events):
    """The daemon shape (main.go's blocking transfer service): follow
    mode drains the stream, keeps polling the events dir, and when a
    NEW shard lands (the binlog growing) delivers ONLY the tail past
    the saved positions — the final keyspace equals the batch state of
    the full stream."""
    import glob

    import pyarrow as pa
    import pyarrow.compute as pc

    full = pa.concat_tables(
        pq.read_table(f)
        for f in sorted(glob.glob(os.path.join(events, "events-*.parquet")))
    )
    gtids = full.column("gtid").to_pylist()
    mid = sorted(gtids)[len(gtids) // 2]
    grow = os.path.join(ROOT, "grow_events")
    shutil.rmtree(grow, ignore_errors=True)
    os.makedirs(grow)
    pq.write_table(
        full.filter(pc.less_equal(full.column("gtid"), mid)),
        os.path.join(grow, "events-00000.parquet"),
    )
    shutil.copy(os.path.join(events, "_meta.json"), grow)
    late = full.filter(pc.greater(full.column("gtid"), mid))

    server = LoopbackRespServer().start()
    polls = {"n": 0}

    def poll_hook(dt):
        polls["n"] += 1
        if polls["n"] == 1:  # the binlog grows between polls 0 and 1
            pq.write_table(late, os.path.join(grow, "events-00001.parquet"))

    pos = os.path.join(ROOT, "pos_follow")
    shutil.rmtree(pos, ignore_errors=True)
    try:
        m = run_app_live(
            load_app(APP_STRING), grow, server.address,
            position_dir=pos, batch_size=256,
            follow=True, poll_interval=0.0, idle_polls=2, sleep=poll_hook,
        )
        live = {
            k: v for k, (typ, v) in server.snapshot().items() if typ == "string"
        }
    finally:
        server.stop()

    # the late tail was delivered by a FOLLOW pass, not the initial
    # drain: the final position covers gtids that did not exist when
    # the first pass ran, and the loop kept polling until idle.  Follow
    # passes checkpoint only COMPLETE transactions (the trailing gtid
    # may still be owed rows by a mid-write producer), so the saved
    # position sits past the first half but strictly below the stream's
    # final (possibly-open) transaction.
    tm = m["tables"]["repos"]
    assert m["passes"] >= 3  # drain + tail pass + idle polls
    assert mid < tm["position"] < max(gtids)
    assert tm["frames_delivered"] > 0
    # final keyspace equals the batch oracle over the FULL stream
    oracle_tab = _state_table(APP_STRING, events, "follow")
    oracle = dict(
        zip(
            oracle_tab.column("redis_key").to_pylist(),
            oracle_tab.column("value").to_pylist(),
        )
    )
    assert live == oracle and len(live) > 50


def test_follow_idle_polls_skip_the_pipeline(events, monkeypatch):
    """An idle poll must not pay the full read/decode pipeline: the
    footer-stats watermark already proves nothing is new past the saved
    position, so only the initial drain builds a Dataset."""
    import go_mysql_transfer_ray.config as config_mod

    calls = {"n": 0}
    orig = config_mod._decoded

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(config_mod, "_decoded", counting)

    server = LoopbackRespServer().start()
    pos = os.path.join(ROOT, "pos_idle")
    shutil.rmtree(pos, ignore_errors=True)
    try:
        m = run_app_live(
            load_app(APP_STRING), events, server.address,
            position_dir=pos, batch_size=256,
            follow=True, poll_interval=0.0, idle_polls=3,
            sleep=lambda dt: None,
        )
    finally:
        server.stop()
    assert m["passes"] == 4  # drain + 3 idle polls
    # the pipeline ran ONLY for the drain (decode is re-planned per
    # LiveSinkLoop resume, but never for a watermark-clean idle poll)
    assert calls["n"] == 1
    assert m["tables"]["repos"]["frames_delivered"] > 0


def test_follow_survives_partial_shard_write(events):
    """A producer appending a shard non-atomically must not kill the
    daemon loop: the broken pass counts as an idle poll and is retried;
    accumulated delivery state survives."""
    grow = os.path.join(ROOT, "grow_partial")
    shutil.rmtree(grow, ignore_errors=True)
    shutil.copytree(events, grow)

    polls = {"n": 0}

    def poll_hook(dt):
        polls["n"] += 1
        if polls["n"] == 1:  # a half-written parquet file lands
            with open(os.path.join(grow, "events-99999.parquet"), "wb") as f:
                f.write(b"PAR1\x00\x00garbage-mid-write")

    server = LoopbackRespServer().start()
    pos = os.path.join(ROOT, "pos_partial")
    shutil.rmtree(pos, ignore_errors=True)
    try:
        m = run_app_live(
            load_app(APP_STRING), grow, server.address,
            position_dir=pos, batch_size=256,
            follow=True, poll_interval=0.0, idle_polls=2, sleep=poll_hook,
        )
        live = {
            k: v for k, (typ, v) in server.snapshot().items() if typ == "string"
        }
    finally:
        server.stop()
    assert m.get("transient_errors", 0) >= 1  # the broken passes
    assert m["tables"]["repos"]["frames_delivered"] > 0  # drain kept
    # converged keyspace from the drain is intact
    oracle_tab = _state_table(APP_STRING, events, "partial")
    oracle = dict(
        zip(
            oracle_tab.column("redis_key").to_pylist(),
            oracle_tab.column("value").to_pylist(),
        )
    )
    assert live == oracle
