"""JSONL CDC-envelope ingestion → canonical event shards → replay."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from go_mysql_transfer_ray.pipelines import cdc
from go_mysql_transfer_ray.sources.ingest import jsonl_to_event_shards

ROOT = "/tmp/gmt_test_ingest"


def _envelope_lines():
    """A small Debezium-style stream over the repos table: insert,
    update (before+after), delete, re-insert, snapshot read."""
    rows = [
        {"op": "c", "gtid": 1, "seq": 0, "ts_ms": 1000,
         "after": {"repo": "o/r1", "path": "a.py", "commit": "c1",
                   "lang": "python", "content": "v1"}},
        {"op": "c", "gtid": 1, "seq": 1, "ts_ms": 1000,
         "after": {"repo": "o/r2", "path": "b.go", "commit": "c2",
                   "lang": "go", "content": "w1"}},
        {"op": "u", "gtid": 2, "seq": 0, "ts_ms": 2000,
         "before": {"repo": "o/r1", "path": "a.py", "commit": "c1",
                    "lang": "python", "content": "v1"},
         "after": {"repo": "o/r1", "path": "a.py", "commit": "c9",
                   "lang": "python", "content": "v2"}},
        {"op": "d", "gtid": 3, "seq": 0, "ts_ms": 3000,
         "before": {"repo": "o/r2", "path": "b.go", "commit": "c2",
                    "lang": "go", "content": "w1"}},
        {"op": "c", "gtid": 4, "seq": 0, "ts_ms": 4000,
         "after": {"repo": "o/r2", "path": "b.go", "commit": "c3",
                   "lang": "go", "content": "w2"}},
        {"op": "r", "gtid": 0, "seq": 0, "ts_ms": 500,
         "after": {"repo": "o/r3", "path": "c.rs", "commit": "c4",
                   "lang": "rust", "content": "x1"}},
    ]
    return [json.dumps(r) for r in rows]


@pytest.fixture(scope="module")
def ingested(ray_session):
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT)
    src = os.path.join(ROOT, "stream.jsonl")
    with open(src, "w") as f:
        f.write("\n".join(_envelope_lines()) + "\n")
    return jsonl_to_event_shards(src, os.path.join(ROOT, "events"))


def test_shards_are_canonical(ingested):
    files = cdc.event_files(ingested)
    assert files, "no events-*.parquet written"
    t = pq.read_table(files)
    assert {"gtid", "seq_in_txn", "pos", "op", "table", "ts", "col_count",
            "before", "after", "ddl"} <= set(t.column_names)
    ops = set(t.column("op").to_pylist())
    assert ops <= {"insert", "update", "delete"}
    # snapshot read (op=r) became an insert
    assert t.num_rows == 6
    # stream_facts' pruned watermark read works on the shards
    assert cdc.stream_facts(ingested)["watermark"] == 4


def test_replay_from_ingested_stream(ingested):
    out = os.path.join(ROOT, "lake")
    shutil.rmtree(out, ignore_errors=True)
    m = cdc.replay(ingested, out, num_partitions=4)
    assert m["watermark"] == 4
    state = {
        (r["repo"], r["path"]): r for r in cdc.lake_table(out).to_pylist()
    }
    # LWW expectations: r1 updated, r2 deleted-then-reinserted, r3 snapshot
    assert state[("o/r1", "a.py")]["commit"] == "c9"
    assert state[("o/r1", "a.py")]["content"] == "v2"
    assert state[("o/r2", "b.go")]["commit"] == "c3"
    assert state[("o/r3", "c.rs")]["content"] == "x1"
    assert len(state) == 3


def test_unknown_op_code_raises(ray_session):
    shutil.rmtree(ROOT + "_bad", ignore_errors=True)
    os.makedirs(ROOT + "_bad")
    src = os.path.join(ROOT + "_bad", "s.jsonl")
    with open(src, "w") as f:
        f.write(json.dumps({"op": "z", "gtid": 1, "seq": 0,
                            "after": {"repo": "a", "path": "b"}}) + "\n")
    with pytest.raises(Exception, match="unknown envelope op"):
        jsonl_to_event_shards(src, os.path.join(ROOT + "_bad", "events"))


def test_failed_reingest_preserves_previous_shards(ingested):
    """Write-tmp-then-swap: a bad stream must not destroy the old dir."""
    src = os.path.join(ROOT, "bad.jsonl")
    with open(src, "w") as f:
        f.write(json.dumps({"op": "z", "gtid": 9, "seq": 0,
                            "after": {"repo": "a", "path": "b"}}) + "\n")
    before = sorted(os.listdir(ingested))
    with pytest.raises(Exception, match="unknown envelope op"):
        jsonl_to_event_shards(src, ingested)
    assert sorted(os.listdir(ingested)) == before
    assert cdc.stream_facts(ingested)["watermark"] == 4
