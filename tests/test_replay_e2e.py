"""End-to-end replay vs the sequential oracle (per-row sha256 parity)."""

import shutil

import pytest

from go_mysql_transfer_ray import oracle
from go_mysql_transfer_ray.pipelines import cdc
from go_mysql_transfer_ray.rules import RuleConfig
from go_mysql_transfer_ray.sources.binlog import BinlogConfig, generate, materialize_events

from .util import assert_state_equal


def run_case(tmp_path, cfg: BinlogConfig, num_partitions=16, **replay_kw):
    events_dir = materialize_events(cfg, root=str(tmp_path / "events"), shards=4)
    out = str(tmp_path / "lake")
    metrics = cdc.replay(events_dir, out, num_partitions=num_partitions, **replay_kw)
    engine = cdc.lake_table(out)
    ora = oracle.replay_full(generate(cfg).table)
    assert_state_equal(engine, ora)
    return metrics, engine, out, events_dir


def test_insert_only(tmp_path):
    cfg = BinlogConfig(num_keys=150, avg_events_per_key=1.0, delete_pct=0, ddl_at=1.0)
    metrics, engine, _, _ = run_case(tmp_path, cfg)
    assert engine.num_rows == 150
    assert metrics["rows"] == 150


def test_mixed_iud_chains(tmp_path):
    cfg = BinlogConfig(num_keys=400, avg_events_per_key=6.0, delete_pct=25)
    metrics, engine, _, _ = run_case(tmp_path, cfg)
    assert 0 < engine.num_rows < 400  # some keys end deleted
    assert metrics["parts_written"] > 0


def test_ddl_widening_nulls(tmp_path):
    cfg = BinlogConfig(num_keys=300, avg_events_per_key=3.0, ddl_at=0.5)
    _, engine, _, _ = run_case(tmp_path, cfg)
    assert "stars" in engine.column_names
    stars = engine.column("stars")
    assert stars.null_count > 0, "pre-DDL last-touched rows must be null-padded"
    assert stars.null_count < engine.num_rows, "post-DDL rows must carry stars"


def test_arity_guard_drops(tmp_path):
    cfg = BinlogConfig(num_keys=300, avg_events_per_key=4.0, bad_arity_permille=80)
    run_case(tmp_path, cfg)  # oracle drops the same events → parity proves it


def test_hot_skew_same_state_and_balanced(tmp_path):
    cfg = BinlogConfig(
        num_keys=400, avg_events_per_key=4.0, hot_repos=1, hot_multiplier=25
    )
    _, _, out, _ = run_case(tmp_path, cfg, num_partitions=8)
    from go_mysql_transfer_ray.state.manifest import load_manifests

    rows = [m["rows"] for m in load_manifests(out).values()]
    assert len(rows) == 8
    # keys hash-distribute even when one repo dominates the event volume
    assert max(rows) <= 3 * max(1, min(rows)) + 10


def test_exactly_once_duplicate_blocks(tmp_path):
    import ray.data

    cfg = BinlogConfig(num_keys=250, avg_events_per_key=4.0, delete_pct=20)
    events_dir = materialize_events(cfg, root=str(tmp_path / "events"), shards=4)
    files = cdc.event_files(events_dir)
    dup = ray.data.read_parquet(files[:2])  # re-deliver half the log
    out = str(tmp_path / "lake")
    cdc.replay(events_dir, out, num_partitions=8, extra_events=dup)
    engine = cdc.lake_table(out)
    ora = oracle.replay_full(generate(cfg).table)
    assert_state_equal(engine, ora)


def test_resume_skips_finished_partitions(tmp_path):
    cfg = BinlogConfig(num_keys=300, avg_events_per_key=3.0)
    metrics, engine, out, events_dir = run_case(tmp_path, cfg, num_partitions=8)
    assert metrics["parts_written"] == 8

    # full resume: everything fenced, nothing recomputed
    m2 = cdc.replay(events_dir, out, num_partitions=8)
    assert m2["parts_written"] == 0 and m2["parts_skipped"] == 8 and m2["resumed"]

    # crash simulation: two partitions lost their manifests mid-write
    shutil.rmtree(out + "/part=00003")
    (tmp_path / "lake" / "_manifests" / "part-00003.json").unlink()
    (tmp_path / "lake" / "_manifests" / "part-00006.json").unlink()
    m3 = cdc.replay(events_dir, out, num_partitions=8)
    assert m3["parts_written"] == 2 and m3["parts_skipped"] == 6
    engine2 = cdc.lake_table(out)
    ora = oracle.replay_full(generate(cfg).table)
    assert_state_equal(engine2, ora)


def test_stock_then_incremental(tmp_path):
    """Reference -stock then incremental sync (main.go:99-154): snapshot
    rows participate at lowest precedence; events override their keys."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cfg = BinlogConfig(num_keys=150, avg_events_per_key=4.0, delete_pct=20)
    events_dir = materialize_events(cfg, root=str(tmp_path / "events"), shards=4)

    # base snapshot: 20 keys outside the event stream + 5 keys that the
    # stream WILL touch (its first per-key op is an insert → overrides)
    stream_state = oracle.replay_full(generate(cfg).table)
    touched = sorted(stream_state)[:5]
    base_rows = {
        "repo": [f"base/r{i}" for i in range(20)] + [stream_state[k]["repo"] for k in touched],
        "path": [f"p{i}.py" for i in range(20)] + [stream_state[k]["path"] for k in touched],
        "commit": ["c" * 40] * 25,
        "lang": ["python"] * 25,
        "content": [f"base content {i}" for i in range(25)],
    }
    base_path = str(tmp_path / "base.parquet")
    pq.write_table(pa.table(base_rows), base_path)

    out = str(tmp_path / "lake")
    m1 = cdc.stock_import(base_path, out, num_partitions=16)
    assert m1["rows"] == 25 and m1["watermark"] == -1

    m2 = cdc.replay(events_dir, out, num_partitions=16, base_dir=out)
    engine = cdc.lake_table(out)

    # expected: stream oracle state + the 20 untouched base keys (stars null)
    expected = dict(stream_state)
    for i in range(20):
        expected[f"base/r{i}p{i}.py"] = {
            "repo": f"base/r{i}", "path": f"p{i}.py", "commit": "c" * 40,
            "lang": "python", "content": f"base content {i}", "stars": None,
        }
    assert_state_equal(engine, expected)
    # the 5 touched keys must show STREAM content, not base content
    eng = {r["repo"] + r["path"]: r for r in engine.to_pylist()}
    for k in touched:
        assert eng[k]["content"] == stream_state[k]["content"]


def test_two_ddls_widen_twice(tmp_path):
    """Two mid-stream ALTERs: arity grows 5→6→7; second column is a
    string; rows before each ALTER are null for its column."""
    cfg = BinlogConfig(
        num_keys=250, avg_events_per_key=5.0, delete_pct=15,
        ddl_at=0.35, extra_ddls=(("license", "string", 0.7),),
    )
    metrics, engine, out, _ = run_case(tmp_path, cfg)
    cols = engine.column_names
    assert cols[-2:] == ["stars", "license"]
    lic = engine.column("license").to_pylist()
    assert any(v is not None for v in lic) and any(v is None for v in lic)
    assert all(v is None or v.startswith("license-v") for v in lic)


def test_resume_plan_identity(tmp_path):
    """A manifest written under a different rule/plan must NOT fence a
    re-run with a new configuration (review regression)."""
    from go_mysql_transfer_ray.rules import RuleConfig

    cfg = BinlogConfig(num_keys=100, avg_events_per_key=3.0)
    events_dir = materialize_events(cfg, root=str(tmp_path / "ev"), shards=2)
    out = str(tmp_path / "lake")
    cdc.replay(events_dir, out, num_partitions=8,
               rule_config=RuleConfig(include_columns="repo,path,lang"))
    t1 = cdc.lake_table(out)
    assert set(t1.column_names) == {"repo", "path", "lang"}
    # same watermark, different plan → must fully recompute, not skip
    m = cdc.replay(events_dir, out, num_partitions=8)
    assert m["parts_skipped"] == 0 and m["parts_written"] > 0
    t2 = cdc.lake_table(out)
    assert "content" in t2.column_names
    # and no stale rule-plan partitions survive alongside
    ora = oracle.replay_full(generate(cfg).table)
    assert_state_equal(t2, ora)
    # identical re-run still fences
    m3 = cdc.replay(events_dir, out, num_partitions=8)
    assert m3["parts_written"] == 0 and m3["resumed"]


def test_incremental_microbatch_tail(tmp_path):
    """The reference's continuous-sync loop as micro-batches: replay the
    first half of the stream, then tail the second half onto the lake —
    final state must equal the full-stream oracle."""
    import glob
    import json
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    cfg = BinlogConfig(num_keys=200, avg_events_per_key=5.0, delete_pct=20)
    events_dir = materialize_events(cfg, root=str(tmp_path / "ev"), shards=4)

    # split the stream by pos into two micro-batches (DDL row goes with
    # its half; second half keeps later positions only)
    full = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(f"{events_dir}/events-*.parquet"))]
    )
    mid = int(full.column("pos").to_numpy().max() // 2)
    for name, tab in (
        ("b1", full.filter(pc.less_equal(full.column("pos"), mid))),
        ("b2", full.filter(pc.greater(full.column("pos"), mid))),
    ):
        d = str(tmp_path / name)
        os.makedirs(d)
        pq.write_table(tab, os.path.join(d, "events-00000.parquet"))
        with open(os.path.join(d, "_meta.json"), "w") as f:
            json.dump({"split": name}, f)

    out = str(tmp_path / "lake")
    m1 = cdc.incremental_replay(str(tmp_path / "b1"), out, num_partitions=8)
    assert not m1["resumed"]
    mid_state = cdc.lake_table(out)
    m2 = cdc.incremental_replay(str(tmp_path / "b2"), out, num_partitions=8)
    final = cdc.lake_table(out)

    ora = oracle.replay_full(generate(cfg).table)
    assert_state_equal(final, ora)
    # the tail actually changed state (not a no-op)
    assert m2["watermark"] > m1["watermark"]
    assert final.num_rows != mid_state.num_rows or not final.equals(mid_state)


def test_crash_recovery_partial_deltas(tmp_path):
    """A crash mid-shuffle leaves partial delta files; the rerun must
    converge to the oracle state anyway (delta dedup by (key,gtid,seq))."""
    import os

    import pyarrow.parquet as pq

    from go_mysql_transfer_ray.stages import shuffle as shfl

    cfg = BinlogConfig(num_keys=120, avg_events_per_key=4.0, delete_pct=20)
    events_dir = materialize_events(cfg, root=str(tmp_path / "ev"), shards=2)
    out = str(tmp_path / "lake")

    # simulate the crashed run: a shuffle dir with this run's meta and a
    # partial delta (a duplicate slice of real events, already decoded)
    from go_mysql_transfer_ray.pipelines import cdc as cdcmod
    from go_mysql_transfer_ray.stages.decode import decode_batch
    from go_mysql_transfer_ray.stages.merge import add_partition_column

    facts = cdcmod.stream_facts(events_dir)
    full = pq.read_table(os.path.join(events_dir, "events-00000.parquet"))
    dec = decode_batch(full, ddl_gtid=[d["gtid"] for d in facts["ddl_events"]])
    dec = dec.select(["key", "gtid", "seq_in_txn", "op",
                      *cdcmod._final_columns(facts["ddl_events"])])
    dec = add_partition_column(dec, 8)
    shuf = os.path.join(out, "_shuffle")
    # meta must match the plan the real run will use, else it gets wiped
    plan_sig = repr((None, None, None, None,
                     cdcmod._final_columns(facts["ddl_events"]), 8))
    shfl.prepare_shuffle_dir(
        shuf, 8, {"watermark": facts["watermark"], "num_partitions": 8,
                  "plan": plan_sig},
    )
    shfl.DeltaWriter(shuf)(dec.slice(0, dec.num_rows // 2))  # partial write
    import glob as _glob

    stale = set(_glob.glob(os.path.join(shuf, "part=*", "*.parquet")))
    assert stale, "partial deltas must exist before the rerun"
    # same-meta prepare keeps them (the crash-recovery path)…
    shfl.prepare_shuffle_dir(
        shuf, 8, {"watermark": facts["watermark"], "num_partitions": 8,
                  "plan": plan_sig},
    )
    assert stale <= set(_glob.glob(os.path.join(shuf, "part=*", "*.parquet")))
    # …while a different plan would wipe them
    shfl.prepare_shuffle_dir(shuf, 8, {"watermark": 0, "num_partitions": 8,
                                       "plan": "other"})
    assert not set(_glob.glob(os.path.join(shuf, "part=*", "*.parquet")))
    # restore the crashed run's state for the real rerun
    shfl.prepare_shuffle_dir(
        shuf, 8, {"watermark": facts["watermark"], "num_partitions": 8,
                  "plan": plan_sig},
    )
    shfl.DeltaWriter(shuf)(dec.slice(0, dec.num_rows // 2))

    metrics = cdc.replay(events_dir, out, num_partitions=8)
    engine = cdc.lake_table(out)
    ora = oracle.replay_full(generate(cfg).table)
    assert_state_equal(engine, ora)
    assert metrics["parts_written"] > 0


def test_stock_reset_removes_old_replay_output(tmp_path):
    """A stock import into a lake that already holds replay output resets
    it to the snapshot — no stale replay partitions survive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cfg = BinlogConfig(num_keys=80, avg_events_per_key=3.0)
    events_dir = materialize_events(cfg, root=str(tmp_path / "ev"), shards=2)
    out = str(tmp_path / "lake")
    cdc.replay(events_dir, out, num_partitions=8)
    assert cdc.lake_table(out).num_rows > 10

    base = pa.table(
        {
            "repo": ["x/only"], "path": ["a.py"], "commit": ["c" * 40],
            "lang": ["python"], "content": ["snapshot"],
        }
    )
    bp = str(tmp_path / "base.parquet")
    pq.write_table(base, bp)
    cdc.stock_import(bp, out, num_partitions=8)
    t = cdc.lake_table(out)
    assert t.num_rows == 1 and t.column("repo").to_pylist() == ["x/only"]


def test_node_buffered_deltas_same_lake_fewer_files(tmp_path, ray_session):
    """delta_mode='node' (per-node buffer actor, the documented 10^10
    adaptation): byte-identical lake output, and delta-file count bounded
    by partitions (single node), not tasks × partitions."""
    import glob

    from go_mysql_transfer_ray.stages import shuffle as shfl

    cfg = BinlogConfig(num_keys=3000, avg_events_per_key=4.0, delete_pct=12)
    ev = materialize_events(cfg, root=str(tmp_path / "ev"), shards=8)
    out_a = str(tmp_path / "task")
    out_b = str(tmp_path / "node")
    ma = cdc.replay(ev, out_a, num_partitions=8)
    # count the per-task delta files by re-running stage A manually:
    # observed indirectly — instead intercept via a buffered run's file
    # tally below; here just assert output equality and buffer teardown
    mb = cdc.replay(ev, out_b, num_partitions=8, delta_mode="node")
    assert ma["rows"] == mb["rows"] and ma["watermark"] == mb["watermark"]
    ta = cdc.lake_table(out_a).sort_by([("repo", "ascending"), ("path", "ascending")])
    tb = cdc.lake_table(out_b).sort_by([("repo", "ascending"), ("path", "ascending")])
    assert ta.equals(tb)
    # all buffer actors torn down
    from ray.util import list_named_actors

    assert not [
        a for a in list_named_actors(all_namespaces=True)
        if a["namespace"] == "gmt_shuffle"
    ]


def test_buffered_writer_file_count_and_content(tmp_path, ray_session):
    """Component-level: many stage-A batches through BufferedDeltaWriter
    produce ≤ partitions files (one node, no mid-run flush) with the same
    rows the per-task writer would have written."""
    import glob
    import uuid

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_mysql_transfer_ray.stages import shuffle as shfl

    def mk(i):
        n = 200
        return pa.table(
            {
                "key": pa.array([f"k{(i * n + j) % 50}" for j in range(n)]),
                "gtid": pa.array(np.arange(n, dtype=np.int64) + i * n),
                "_part": pa.array((np.arange(n) % 4).astype(np.int32)),
            }
        )

    d_task = str(tmp_path / "task")
    d_node = str(tmp_path / "node")
    shfl.prepare_shuffle_dir(d_task, 4, {"m": "t"})
    shfl.prepare_shuffle_dir(d_node, 4, {"m": "n"})
    wt = shfl.DeltaWriter(d_task)
    run_id = uuid.uuid4().hex[:8]
    wn = shfl.BufferedDeltaWriter(d_node, run_id)
    for i in range(10):
        wt(mk(i))
        wn(mk(i))
    shfl.flush_node_buffers(run_id)
    files_task = glob.glob(f"{d_task}/part=*/*.parquet")
    files_node = glob.glob(f"{d_node}/part=*/*.parquet")
    assert len(files_task) == 40  # tasks(10) × partitions(4)
    assert len(files_node) <= 4   # nodes(1) × partitions(4)
    for p in range(4):
        a = pa.concat_tables(
            [pq.read_table(f) for f in shfl.partition_delta_files(d_task, p)]
        ).sort_by([("gtid", "ascending")])
        b = pa.concat_tables(
            [pq.read_table(f) for f in shfl.partition_delta_files(d_node, p)]
        ).sort_by([("gtid", "ascending")])
        assert a.equals(b)


def test_lambda_plan_change_not_fenced(tmp_path):
    """Two different lambdas must not share a resume plan (bytecode hash
    in the signature)."""
    cfg = BinlogConfig(num_keys=60, avg_events_per_key=3.0)
    events_dir = materialize_events(cfg, root=str(tmp_path / "ev"), shards=2)
    out = str(tmp_path / "lake")
    cdc.replay(events_dir, out, num_partitions=4,
               rule_config=RuleConfig(reserve_raw_data=True),
               udf=lambda r, o, a, c: {**r, "tag": "one"})
    m = cdc.replay(events_dir, out, num_partitions=4,
                   rule_config=RuleConfig(reserve_raw_data=True),
                   udf=lambda r, o, a, c: {**r, "tag": "two"})
    assert m["parts_written"] > 0 and m["parts_skipped"] == 0
    tags = set(cdc.lake_table(out).column("tag").to_pylist())
    assert tags == {"two"}


def test_scan_facts_chunked_paths_match_serial(tmp_path, monkeypatch):
    """The fanned-out facts scan (thread-pool and Ray-task paths) must
    produce byte-identical facts to a serial footer loop — exercised by
    shrinking _FACTS_CHUNK so a 12-shard fixture spans many chunks
    (round-4 verdict item 3: the driver footer loop was O(files))."""
    cfg = BinlogConfig(num_keys=300, avg_events_per_key=3.0, delete_pct=10,
                       ddl_at=0.5)
    events_dir = materialize_events(cfg, root=str(tmp_path / "ev"), shards=12)
    serial = cdc.stream_facts(events_dir)  # 12 files → 1 chunk → inline

    monkeypatch.setattr(cdc, "_FACTS_CHUNK", 3)  # 4 chunks → thread pool
    threaded = cdc.stream_facts(events_dir)
    assert threaded == serial

    monkeypatch.setattr(cdc, "_FACTS_CHUNK", 1)  # 12 chunks → Ray tasks
    rayed = cdc.stream_facts(events_dir)
    assert rayed == serial
    multi = cdc.stream_facts_multi(events_dir)
    assert multi["watermark"] == serial["watermark"]
    assert sorted(
        d["gtid"] for ds in multi["ddl_by_table"].values() for d in ds
    ) == sorted(d["gtid"] for d in serial["ddl_events"])


def test_fenced_rerun_repairs_finalization_window(tmp_path):
    """A crash AFTER the last partition write but BEFORE save_schema /
    reconcile must be repaired by the (fully-fenced) rerun: the DDL
    history is re-persisted so a later incremental tail still decodes
    post-ALTER arities, instead of silently dropping every row."""
    import json
    import os

    cfg = BinlogConfig(num_keys=150, avg_events_per_key=4.0, delete_pct=10)
    events_dir = materialize_events(cfg, root=str(tmp_path / "ev"), shards=2)
    out = str(tmp_path / "lake")
    m1 = cdc.replay(events_dir, out, num_partitions=8)
    assert not m1["resumed"]
    schema_path = os.path.join(out, "_manifests", "_schema.json")
    assert os.path.exists(schema_path)
    saved = json.load(open(schema_path))
    assert saved  # the stream's DDL landed in the history

    # simulate the crash window: manifests durable, schema not persisted
    os.unlink(schema_path)
    m2 = cdc.replay(events_dir, out, num_partitions=8)
    assert m2["resumed"] and m2["parts_written"] == 0  # fenced rerun
    assert os.path.exists(schema_path)  # ...repaired the window
    assert json.load(open(schema_path)) == saved


def test_extra_events_bypass_the_fence(tmp_path):
    """Injected extra_events are invisible to the watermark and the plan
    signature — a fenced short-circuit would silently ignore them, so
    their presence must force a recompute."""
    import pyarrow as pa

    import ray.data

    cfg = BinlogConfig(num_keys=100, avg_events_per_key=3.0, delete_pct=0)
    events_dir = materialize_events(cfg, root=str(tmp_path / "ev"), shards=2)
    out = str(tmp_path / "lake")
    m1 = cdc.replay(events_dir, out, num_partitions=8)
    rows_before = cdc.lake_table(out).num_rows

    # an extra insert with a brand-new key, gtid far past the watermark
    from go_mysql_transfer_ray.schema import row_image_type

    img = row_image_type()
    row = {f.name: None for f in img}
    row.update(repo="org0/extra", path="x.py", commit="c" * 40,
               lang="py", content="x")
    extra = ray.data.from_arrow(
        pa.table(
            {
                "gtid": pa.array([10**9], pa.int64()),
                "seq_in_txn": pa.array([0], pa.int32()),
                "pos": pa.array([10**9], pa.int64()),
                "ts": pa.array([0], pa.timestamp("ms")),
                "op": pa.array(["insert"], pa.string()),
                "table": pa.array(["repos"], pa.string()),
                # gtid 10^9 sits past the stream's one ALTER, so the
                # arity guard expects the widened width (5 base + 1 DDL)
                "col_count": pa.array([6], pa.int32()),
                "before": pa.array([None], img),
                "after": pa.array([row], img),
                "ddl": pa.array(
                    [None],
                    pa.struct([("add_column", pa.string()),
                               ("arrow_type", pa.string())]),
                ),
            }
        )
    )
    m2 = cdc.replay(events_dir, out, num_partitions=8, extra_events=extra)
    assert not m2["resumed"]  # fence bypassed, recompute happened
    after = cdc.lake_table(out)
    assert after.num_rows == rows_before + 1
    assert "org0/extra" in set(after.column("repo").to_pylist())
