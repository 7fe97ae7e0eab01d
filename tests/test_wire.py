"""Wire-format encoders: RESP frames and ES bulk NDJSON bodies are
byte-exact reproductions of what the reference's clients transmit
(/root/reference/service/endpoint/redis.go:225-267,
elastic6.go:293-300)."""

import pyarrow as pa
import pytest

from go_mysql_transfer_ray.functions.wire import (
    es_bulk_ndjson,
    redis_resp_stream,
    resp_command,
)
from go_mysql_transfer_ray.stages.redis_state import RedisConfig, RedisPlan


def parse_resp(buf: str) -> list[list[str]]:
    """Minimal RESP v2 array-of-bulk-strings parser (byte-accurate)."""
    data = buf.encode("utf-8")
    cmds, i = [], 0
    while i < len(data):
        assert data[i : i + 1] == b"*"
        j = data.index(b"\r\n", i)
        n = int(data[i + 1 : j])
        i = j + 2
        args = []
        for _ in range(n):
            assert data[i : i + 1] == b"$"
            j = data.index(b"\r\n", i)
            ln = int(data[i + 1 : j])
            i = j + 2
            args.append(data[i : i + ln].decode("utf-8"))
            assert data[i + ln : i + ln + 2] == b"\r\n"
            i = i + ln + 2
        cmds.append(args)
    return cmds


def test_resp_command_exact_frame():
    out = resp_command("SET", pa.array(["k1"]), pa.array(["v1"]))
    assert out.to_pylist() == ["*3\r\n$3\r\nSET\r\n$2\r\nk1\r\n$2\r\nv1\r\n"]


def test_resp_command_utf8_byte_lengths():
    # bulk-string lengths are BYTES, not characters (RESP contract)
    out = resp_command("SET", pa.array(["ключ"]), pa.array(["значение"]))
    (frame,) = out.to_pylist()
    assert "$8\r\nключ" in frame  # 4 cyrillic chars = 8 bytes
    assert parse_resp(frame) == [["SET", "ключ", "значение"]]


def test_resp_command_requires_an_array():
    with pytest.raises(ValueError):
        resp_command("PING")


def _changes(rows):
    cols = {k: [r.get(k) for r in rows] for k in rows[0]}
    return pa.table(cols)


def test_string_structure_set_and_del():
    plan = RedisPlan(
        RedisConfig(structure="string", key_prefix="u:", key_column="uid"),
        pk_columns=("uid",),
    )
    batch = _changes(
        [
            {"gtid": "g1", "op": "insert", "uid": 7, "v": "a"},
            {"gtid": "g2", "op": "delete", "uid": 8, "v": "b"},
        ]
    )
    out = redis_resp_stream(plan, batch, value_col="v")
    assert out.column("cmd").to_pylist() == ["SET", "DEL"]
    frames = out.column("resp").to_pylist()
    assert parse_resp(frames[0]) == [["SET", "u:7", "a"]]
    assert parse_resp(frames[1]) == [["DEL", "u:8"]]


def test_hash_structure_hset_hdel():
    plan = RedisPlan(
        RedisConfig(structure="hash", key_value="h", hash_field_column="f"),
        pk_columns=("f",),
    )
    batch = _changes(
        [
            {"gtid": "g1", "op": "update", "f": "x", "v": "1"},
            {"gtid": "g2", "op": "delete", "f": "y", "v": "2"},
        ]
    )
    out = redis_resp_stream(plan, batch, value_col="v")
    frames = out.column("resp").to_pylist()
    assert parse_resp(frames[0]) == [["HSET", "h", "x", "1"]]
    assert parse_resp(frames[1]) == [["HDEL", "h", "y"]]


def test_list_update_emits_lrem_then_rpush():
    plan = RedisPlan(
        RedisConfig(structure="list", key_value="l"), pk_columns=("id",)
    )
    batch = _changes(
        [
            {"gtid": "g1", "op": "insert", "id": 1, "v": "new", "old": None},
            {"gtid": "g2", "op": "update", "id": 1, "v": "new", "old": "old"},
            {"gtid": "g3", "op": "delete", "id": 1, "v": "new", "old": None},
        ]
    )
    out = redis_resp_stream(plan, batch, value_col="v", old_value_col="old")
    frames = out.column("resp").to_pylist()
    assert parse_resp(frames[0]) == [["RPUSH", "l", "new"]]
    # redis.go:243-244: LREM key 0 old, then RPUSH key new
    assert parse_resp(frames[1]) == [["LREM", "l", "0", "old"], ["RPUSH", "l", "new"]]
    assert parse_resp(frames[2]) == [["LREM", "l", "0", "new"]]


def test_set_update_keeps_reference_stray_zero_member():
    plan = RedisPlan(
        RedisConfig(structure="set", key_value="s"), pk_columns=("id",)
    )
    batch = _changes(
        [{"gtid": "g1", "op": "update", "id": 1, "v": "new", "old": "old"}]
    )
    out = redis_resp_stream(plan, batch, value_col="v", old_value_col="old")
    (frame,) = out.column("resp").to_pylist()
    # redis.go:252 passes the stray 0 member on the update-remove path
    assert parse_resp(frame) == [["SREM", "s", "0", "old"], ["SADD", "s", "new"]]


def test_sortedset_zadd_score_member_order():
    plan = RedisPlan(
        RedisConfig(
            structure="sortedset", key_value="z", sorted_set_score_column="sc"
        ),
        pk_columns=("id",),
    )
    batch = _changes(
        [
            {"gtid": "g1", "op": "insert", "id": 1, "v": "m1", "sc": 1.5},
            {"gtid": "g2", "op": "delete", "id": 2, "v": "m2", "sc": 3.0},
        ]
    )
    out = redis_resp_stream(plan, batch, value_col="v")
    frames = out.column("resp").to_pylist()
    # go-redis ZAdd marshals as ZADD key score member, shortest float form
    assert parse_resp(frames[0]) == [["ZADD", "z", "1.5", "m1"]]
    assert parse_resp(frames[1]) == [["ZREM", "z", "m2"]]


def _ops(rows):
    return pa.table({k: [r[k] for r in rows] for k in rows[0]})


def test_es_bulk_ndjson_action_framings():
    ops = _ops(
        [
            {"es_index": "t", "es_type": "_doc", "id": "1", "action": "insert", "body": '{"a":1}'},
            {"es_index": "t", "es_type": "_doc", "id": "2", "action": "update", "body": '{"a":2}'},
            {"es_index": "t", "es_type": "_doc", "id": "3", "action": "delete", "body": ""},
        ]
    )
    lines = es_bulk_ndjson(ops).column("ndjson").to_pylist()
    assert lines[0] == '{"index":{"_index":"t","_type":"_doc","_id":"1"}}\n{"a":1}\n'
    assert lines[1] == '{"update":{"_index":"t","_type":"_doc","_id":"2"}}\n{"doc":{"a":2}}\n'
    assert lines[2] == '{"delete":{"_index":"t","_type":"_doc","_id":"3"}}\n'


def test_es_bulk_ndjson_es7_typeless():
    ops = _ops(
        [{"es_index": "t", "es_type": "_doc", "id": "1", "action": "insert", "body": "{}"}]
    )
    (line,) = es_bulk_ndjson(ops, include_type=False).column("ndjson").to_pylist()
    assert line == '{"index":{"_index":"t","_id":"1"}}\n{}\n'


def test_null_value_frames_as_empty_bulk_string():
    # stringutil.ToString(nil) → "" in the reference: a null value must
    # produce a $0 bulk string, not null out the whole frame
    plan = RedisPlan(
        RedisConfig(structure="string", key_column="uid"), pk_columns=("uid",)
    )
    batch = pa.table(
        {
            "gtid": ["g1"],
            "op": ["insert"],
            "uid": [5],
            "v": pa.array([None], pa.string()),
        }
    )
    (frame,) = redis_resp_stream(plan, batch, value_col="v").column("resp").to_pylist()
    assert frame is not None
    assert parse_resp(frame) == [["SET", "5", ""]]


def test_es_bulk_ndjson_escapes_metadata():
    # ids come from arbitrary PK stringification: quotes/backslashes must
    # be JSON-escaped in the action line (Go json.Marshal parity)
    ops = _ops(
        [
            {
                "es_index": "t",
                "es_type": "_doc",
                "id": 'a"b\\c',
                "action": "insert",
                "body": "{}",
            }
        ]
    )
    out = es_bulk_ndjson(ops)
    (line,) = out.column("ndjson").to_pylist()
    assert '"_id":"a\\"b\\\\c"' in line
    # the id COLUMN stays raw (only the embedded JSON literal escapes)
    assert out.column("id").to_pylist() == ['a"b\\c']
    import json

    action_line = line.split("\n")[0]
    assert json.loads(action_line)["index"]["_id"] == 'a"b\\c'


def test_mongo_bulk_models_all_actions():
    from go_mysql_transfer_ray.functions.wire import mongo_bulk_models

    ops = _ops(
        [
            {"id": "5", "action": "insert", "body": '{"a":1}'},
            {"id": "6", "action": "update", "body": '{"a":2}'},
            {"id": "7", "action": "upsert", "body": '{"a":3}'},
            {"id": "8", "action": "delete", "body": "{}"},
        ]
    )
    models = mongo_bulk_models(ops).column("model").to_pylist()
    # mongo.go:173: insert document carries the injected _id first
    assert models[0] == '{"insertOne":{"document":{"_id":5,"a":1}}}'
    # mongo.go:175: $set payload INCLUDES _id (kvm gained it before the model)
    assert models[1] == (
        '{"updateOne":{"filter":{"_id":6},"update":{"$set":{"_id":6,"a":2}}}}'
    )
    # mongo.go:150 (Lua path): SetUpsert(true)
    assert models[2] == (
        '{"updateOne":{"filter":{"_id":7},"update":{"$set":{"_id":7,"a":3}},"upsert":true}}'
    )
    assert models[3] == '{"deleteOne":{"filter":{"_id":8}}}'
    import json

    for m in models:
        json.loads(m)  # every model is valid JSON


def test_mongo_bulk_models_string_id_escaped():
    from go_mysql_transfer_ray.functions.wire import mongo_bulk_models

    ops = _ops([{"id": 'k"x', "action": "delete", "body": "{}"}])
    (m,) = mongo_bulk_models(ops, id_numeric=False).column("model").to_pylist()
    import json

    assert json.loads(m)["deleteOne"]["filter"]["_id"] == 'k"x'


def test_mongo_bulk_models_empty_body():
    from go_mysql_transfer_ray.functions.wire import mongo_bulk_models

    ops = _ops([{"id": "1", "action": "insert", "body": "{}"}])
    (m,) = mongo_bulk_models(ops).column("model").to_pylist()
    assert m == '{"insertOne":{"document":{"_id":1}}}'


def test_hash_null_field_frames_as_empty_bulk_string():
    plan = RedisPlan(
        RedisConfig(structure="hash", key_value="h", hash_field_column="f"),
        pk_columns=("f",),
    )
    batch = pa.table(
        {
            "gtid": ["g1"],
            "op": ["insert"],
            "f": pa.array([None], pa.string()),
            "v": ["1"],
        }
    )
    (frame,) = redis_resp_stream(plan, batch, value_col="v").column("resp").to_pylist()
    assert frame is not None
    assert parse_resp(frame) == [["HSET", "h", "", "1"]]


def test_json_escape_control_characters_match_encode_json():
    """Metadata fields must escape C0 controls the same way encode_json's
    json.dumps path escapes body strings — a raw newline in an _id would
    split the bulk action line across NDJSON rows, and merge keys carry
    embedded NULs (CLAUDE.md)."""
    import json

    from go_mysql_transfer_ray.functions.encoders import encode_json
    from go_mysql_transfer_ray.functions.wire import _json_escape

    nasty = "a\nb\rc\td\x00e\x1ff\bg\fh\\i\"j<k>&"
    (escaped,) = _json_escape(pa.array([nasty])).to_pylist()
    # byte-identical to the body escaper's JSON string literal
    assert f'"{escaped}"' == encode_json({"k": nasty})[len('{"k":'):-1]
    # the action line stays ONE line and round-trips
    assert "\n" not in escaped and "\r" not in escaped
    assert json.loads(f'"{escaped}"') == nasty


def test_es_bulk_ndjson_newline_id_keeps_framing():
    ops = _ops(
        [
            {
                "es_index": "t",
                "es_type": "_doc",
                "id": "a\nb\x00c",
                "action": "delete",
                "body": "{}",
            }
        ]
    )
    (line,) = es_bulk_ndjson(ops).column("ndjson").to_pylist()
    # exactly one NDJSON line (trailing \n), valid JSON, id round-trips
    assert line.count("\n") == 1 and line.endswith("\n")
    import json

    assert json.loads(line.rstrip("\n"))["delete"]["_id"] == "a\nb\x00c"


def test_mongo_bulk_models_control_char_string_id():
    from go_mysql_transfer_ray.functions.wire import mongo_bulk_models

    ops = _ops([{"id": "k\x00\nx", "action": "delete", "body": "{}"}])
    (m,) = mongo_bulk_models(ops, id_numeric=False).column("model").to_pylist()
    import json

    assert "\n" not in m
    assert json.loads(m)["deleteOne"]["filter"]["_id"] == "k\x00\nx"
