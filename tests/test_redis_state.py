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
    # fixed value wins over everything (redis.go:272-274 early return)
    p = RedisPlan(
        RedisConfig(key_formatter="k-{{.user}}", key_value="fixed", key_column="user"),
        pk_columns=("user",),
    )
    assert p.keys(t).to_pylist() == ["fixed"]
    p = RedisPlan(RedisConfig(key_value="fixed", key_column="user"), ("user",))
    assert p.keys(t).to_pylist() == ["fixed"]
    # formatter beats column/PK at runtime (redis.go:276-283)...
    p = RedisPlan(RedisConfig(key_formatter="k-{{.user}}"), ("user",))
    assert p.keys(t).to_pylist() == ["k-u1"]
    # ...but an explicit key_column clears the formatter at compile time
    # (rule.go:530-538)
    p = RedisPlan(
        RedisConfig(key_formatter="k-{{.user}}", key_column="user"), ("user",)
    )
    assert p.keys(t).to_pylist() == ["u1"]
    p = RedisPlan(RedisConfig(key_column="user", key_prefix="pre:"), ("user",))
    assert p.keys(t).to_pylist() == ["pre:u1"]
    # prefix applies ONLY to the column/PK branch (fixed and templated
    # keys return verbatim, redis.go:272-283)
    p = RedisPlan(RedisConfig(key_value="fixed", key_prefix="pre:"), ("user",))
    assert p.keys(t).to_pylist() == ["fixed"]
    p = RedisPlan(
        RedisConfig(key_formatter="k-{{.user}}", key_prefix="pre:"), ("user",)
    )
    assert p.keys(t).to_pylist() == ["k-u1"]
    p = RedisPlan(RedisConfig(), pk_columns=("user", "val"))
    assert p.keys(t).to_pylist() == ["u1x"]  # separator-less composite


def test_hash_field_default_pk_and_prefix():
    t = pa.table({"user": pa.array(["u1"]), "val": pa.array(["x"])})
    # field defaults to PK concat when hash_field_column is unset
    # (rule.go:486-494), hash_field_prefix applied last (redis.go:311-314)
    p = RedisPlan(
        RedisConfig(structure="hash", key_value="h", hash_field_prefix="f_"),
        pk_columns=("user", "val"),
    )
    assert p.fields(t).to_pylist() == ["f_u1x"]
    p = RedisPlan(
        RedisConfig(structure="hash", key_value="h", hash_field_column="val"),
        pk_columns=("user",),
    )
    assert p.fields(t).to_pylist() == ["x"]


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


def test_list_fold_mixed_clean_and_dirty_keys(ray_session):
    """The vectorized fold's two paths agree with a straight replay:
    pure-RPUSH keys (numpy fast path) interleaved with LREM keys."""
    rows = []
    gt = 0
    # clean keys c0..c4: RPUSH only
    for i in range(5):
        for j in range(4):
            gt += 1
            rows.append((gt, "insert", f"c{i}", f"v{j}"))
    # dirty keys d0..d2: RPUSH + LREM interleaved
    for i in range(3):
        gt += 1
        rows.append((gt, "insert", f"d{i}", "a"))
        gt += 1
        rows.append((gt, "insert", f"d{i}", "b"))
        gt += 1
        rows.append((gt, "update", f"d{i}", "a2", "a"))
        gt += 1
        rows.append((gt, "insert", f"d{i}", "a"))
        gt += 1
        rows.append((gt, "delete", f"d{i}", "b"))
    ds = _changes(rows)
    plan = RedisPlan(RedisConfig(structure="list", key_column="user"), ("user",))
    out = list_state(
        ds, plan, value_col="val", old_value_col="old_val", num_partitions=4
    ).to_pandas()
    state = {}
    for k, grp in out.groupby("redis_key"):
        state[k] = list(grp.sort_values("list_pos").value)
    for i in range(5):
        assert state[f"c{i}"] == ["v0", "v1", "v2", "v3"]
    for i in range(3):
        assert state[f"d{i}"] == ["a2", "a"]


_LUA_LIST_RULE = """
local ops = require("redisOps")
local row = ops.rawRow()
local act = ops.rawAction()
local key = "lst:" .. row["user"]
if act == "delete" then
  ops.LREM(key, row["val"])
else
  ops.RPUSH(key, row["val"])
end
"""


def test_lua_redis_state_rejects_list_ops(ray_session):
    import pytest as _p

    from go_mysql_transfer_ray.pipelines.lua_rules import lua_redis_state

    ds = _changes([(1, "insert", "a", "x")])
    # the storage-fold exchange executes eagerly, so the guard fires at
    # pipeline-construction time
    with _p.raises(Exception) as ei:
        lua_redis_state(
            ds, _LUA_LIST_RULE, payload_cols=("user", "val"), num_partitions=2
        ).materialize()
    assert "lua_redis_list_state" in str(ei.value)


def test_lua_redis_list_state_ordered_replay(ray_session):
    """Lua RPUSH/LREM ops ride the ordered list replay, not the LWW merge
    (which would collapse the list to its last pushed value)."""
    from go_mysql_transfer_ray.pipelines.lua_rules import lua_redis_list_state

    ds = _changes(
        [
            (1, "insert", "a", "x"),
            (2, "insert", "a", "y"),
            (3, "insert", "a", "x"),
            (4, "delete", "a", "x"),  # LREM removes ALL occurrences
            (5, "insert", "a", "z"),
            (6, "insert", "b", "only"),
        ]
    )
    out = (
        lua_redis_list_state(
            ds, _LUA_LIST_RULE, payload_cols=("user", "val"), num_partitions=2
        )
        .to_pandas()
        .sort_values(["redis_key", "list_pos"])
    )
    state = {
        k: list(g.value) for k, g in out.groupby("redis_key")
    }
    assert state == {"lst:a": ["y", "z"], "lst:b": ["only"]}


def test_config_validation_errors():
    import pytest as _p

    with _p.raises(ValueError):
        RedisPlan(RedisConfig(structure="sortedset"), ("user",))
    with _p.raises(ValueError):
        RedisPlan(RedisConfig(structure="hash"), ("user",))
