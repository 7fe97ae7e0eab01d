"""Mongo $set partial-update merge (K2 semantics)."""

import pyarrow as pa
import ray.data

from go_mysql_transfer_ray.stages.merge import (
    fieldwise_final_merge,
    fieldwise_merged_dataset,
)


def _t(rows):
    """rows: (gtid, op, key, a, b) — None = field not set."""
    return pa.table(
        {
            "key": pa.array([r[2] for r in rows], pa.string()),
            "gtid": pa.array([r[0] for r in rows], pa.int64()),
            "seq_in_txn": pa.array([0] * len(rows), pa.int32()),
            "op": pa.array([r[1] for r in rows], pa.string()),
            "a": pa.array([r[3] for r in rows], pa.string()),
            "b": pa.array([r[4] for r in rows], pa.string()),
        }
    )


def test_partial_update_keeps_unset_fields():
    t = _t(
        [
            (1, "insert", "k1", "a1", "b1"),
            (2, "update", "k1", None, "b2"),   # $set only b
            (3, "update", "k1", "a3", None),   # $set only a
        ]
    )
    out = fieldwise_final_merge(t, final_columns=["a", "b"]).to_pydict()
    assert out == {"a": ["a3"], "b": ["b2"]}


def test_insert_resets_document():
    t = _t(
        [
            (1, "insert", "k1", "a1", "b1"),
            (2, "update", "k1", None, "b2"),
            (3, "delete", "k1", None, None),
            (4, "insert", "k1", "a4", None),   # re-insert: b must NOT leak b2
        ]
    )
    out = fieldwise_final_merge(t, final_columns=["a", "b"]).to_pydict()
    assert out == {"a": ["a4"], "b": [None]}


def test_delete_and_orphan_update():
    t = _t(
        [
            (1, "insert", "gone", "x", "y"),
            (2, "delete", "gone", None, None),
            (3, "update", "orphan", "zz", None),  # update w/o insert: no-op
            (4, "insert", "kept", "a", "b"),
        ]
    )
    out = fieldwise_final_merge(t, final_columns=["a", "b"]).to_pydict()
    assert out == {"a": ["a"], "b": ["b"]}


def test_dataset_plan(ray_session):
    rows = []
    for k in range(50):
        rows.append((k * 10 + 1, "insert", f"k{k}", f"a{k}", f"b{k}"))
        rows.append((k * 10 + 2, "update", f"k{k}", None, f"B{k}"))
    ds = ray.data.from_arrow(_t(rows))
    out = fieldwise_merged_dataset(ds, 4, final_columns=["key", "a", "b"]).to_pandas()
    assert len(out) == 50
    got = dict(zip(out["key"], zip(out["a"], out["b"])))
    assert got["k7"] == ("a7", "B7")


# --- upsert liveness (the Lua SetUpsert(true) path, mongo.go:141-149) ---


def test_upsert_creates_when_absent():
    t = _t([(1, "upsert", "k", "a1", None)])
    out = fieldwise_final_merge(t, final_columns=["a", "b"], upsert=True).to_pydict()
    assert out == {"a": ["a1"], "b": [None]}


def test_upsert_is_set_update_when_alive():
    t = _t(
        [
            (1, "insert", "k", "a1", "b1"),
            (2, "upsert", "k", "a2", None),  # $set: b survives
        ]
    )
    out = fieldwise_final_merge(t, final_columns=["a", "b"], upsert=True).to_pydict()
    assert out == {"a": ["a2"], "b": ["b1"]}


def test_upsert_after_delete_recreates_partial():
    t = _t(
        [
            (1, "insert", "k", "a1", "b1"),
            (2, "delete", "k", None, None),
            (3, "upsert", "k", "a3", None),  # fresh doc: b must NOT resurrect
        ]
    )
    out = fieldwise_final_merge(t, final_columns=["a", "b"], upsert=True).to_pydict()
    assert out == {"a": ["a3"], "b": [None]}


def test_insert_still_resets_after_upserts():
    t = _t(
        [
            (1, "upsert", "k", "a1", "b1"),
            (2, "insert", "k", "a2", None),  # full replace: b wiped
        ]
    )
    out = fieldwise_final_merge(t, final_columns=["a", "b"], upsert=True).to_pydict()
    assert out == {"a": ["a2"], "b": [None]}


def test_upsert_flag_off_ignores_upsert_liveness():
    # without the flag, 'upsert' is not a recognized setter/create:
    # an upsert-only key stays dead (backward-compatible strictness)
    t = _t([(1, "upsert", "k", "a1", None)])
    out = fieldwise_final_merge(t, final_columns=["a", "b"]).to_pydict()
    assert out == {"a": [], "b": []}
