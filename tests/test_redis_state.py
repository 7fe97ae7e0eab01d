"""Redis keyed-state model (M10 key encoding + K1 structure semantics)."""

import pyarrow as pa
import ray.data

from go_mysql_transfer_ray.stages.redis_state import (
    RedisConfig,
    RedisPlan,
    list_state,
    structure_state,
)


def _changes(rows):
    """rows: (gtid, op, user, val[, old_val])"""
    has_old = any(len(r) > 4 for r in rows)
    cols = {
        "gtid": pa.array([r[0] for r in rows], pa.int64()),
        "seq_in_txn": pa.array([0] * len(rows), pa.int32()),
        "op": pa.array([r[1] for r in rows], pa.string()),
        "user": pa.array([r[2] for r in rows], pa.string()),
        "val": pa.array([r[3] for r in rows], pa.string()),
        "score": pa.array([float(r[0]) for r in rows], pa.float64()),
    }
    if has_old:
        cols["old_val"] = pa.array(
            [(r[4] if len(r) > 4 else r[3]) for r in rows], pa.string()
        )
    return ray.data.from_arrow(pa.table(cols))


def test_key_precedence_and_prefix():
    t = pa.table({"user": pa.array(["u1"]), "val": pa.array(["x"])})
    # formatter > fixed > column > pk
    p = RedisPlan(
        RedisConfig(key_formatter="k-{{.user}}", key_value="fixed", key_column="user"),
        pk_columns=("user",),
    )
    assert p.keys(t).to_pylist() == ["k-u1"]
    p = RedisPlan(RedisConfig(key_value="fixed", key_column="user"), ("user",))
    assert p.keys(t).to_pylist() == ["fixed"]
    p = RedisPlan(RedisConfig(key_column="user", key_prefix="pre:"), ("user",))
    assert p.keys(t).to_pylist() == ["pre:u1"]
    p = RedisPlan(RedisConfig(), pk_columns=("user", "val"))
    assert p.keys(t).to_pylist() == ["u1x"]  # separator-less composite


def test_string_lww_and_delete(ray_session):
    ds = _changes(
        [
            (1, "insert", "a", "v1"),
            (2, "update", "a", "v2"),
            (3, "insert", "b", "v1"),
            (4, "delete", "b", "v1"),
        ]
    )
    plan = RedisPlan(RedisConfig(structure="string", key_column="user"), ("user",))
    out = structure_state(ds, plan, value_col="val", num_partitions=2).to_pandas()
    assert dict(zip(out.redis_key, out.value)) == {"a": "v2"}


def test_set_update_removes_old_member(ray_session):
    ds = _changes(
        [
            (1, "insert", "a", "x"),
            (2, "insert", "a", "y"),
            (3, "update", "a", "z", "x"),  # SREM x + SADD z
        ]
    )
    plan = RedisPlan(RedisConfig(structure="set", key_column="user"), ("user",))
    out = structure_state(
        ds, plan, value_col="val", old_value_col="old_val", num_partitions=2
    ).to_pandas()
    assert sorted(out.value) == ["y", "z"]


def test_zset_score_quirk_and_zrem(ray_session):
    # score column ends up in the hash-field slot (rule.go:520-524)
    cfg = RedisConfig(
        structure="sortedset", key_value="lb", sorted_set_score_column="score"
    )
    plan = RedisPlan(cfg, ("user",))
    assert plan.field_column == "score"
    ds = _changes(
        [
            (1, "insert", "a", "m1"),
            (2, "insert", "a", "m2"),
            (3, "delete", "a", "m1"),
        ]
    )
    out = structure_state(ds, plan, value_col="val", num_partitions=2).to_pandas()
    assert list(out.member) == ["m2"] and list(out.score) == [2.0]


def test_list_ordered_fold(ray_session):
    ds = _changes(
        [
            (1, "insert", "a", "x"),
            (2, "insert", "a", "y"),
            (3, "update", "a", "x2", "x"),  # LREM x + RPUSH x2
            (4, "insert", "a", "z"),
            (5, "delete", "a", "y"),        # LREM y
        ]
    )
    plan = RedisPlan(RedisConfig(structure="list", key_column="user"), ("user",))
    out = (
        list_state(ds, plan, value_col="val", old_value_col="old_val")
        .to_pandas()
        .sort_values("list_pos")
    )
    assert list(out.value) == ["x2", "z"]


def test_list_lrem_removes_all_occurrences(ray_session):
    """LREM count=0 semantics (redis.go:240-246): delete removes EVERY
    occurrence of the value."""
    ds = _changes(
        [
            (1, "insert", "a", "v"),
            (2, "insert", "a", "v"),
            (3, "insert", "a", "w"),
            (4, "delete", "a", "v"),
        ]
    )
    plan = RedisPlan(RedisConfig(structure="list", key_column="user"), ("user",))
    out = list_state(ds, plan, value_col="val").to_pandas()
    assert list(out.value) == ["w"]


def test_config_validation_errors():
    import pytest as _p

    with _p.raises(ValueError):
        RedisPlan(RedisConfig(structure="sortedset"), ("user",))
    with _p.raises(ValueError):
        RedisPlan(RedisConfig(structure="hash"), ("user",))
