"""Lua-UDF shim — the reference's Lua execution protocol (T1-T3), with the
ret-key encoding reproduced exactly and the Lua VM itself gated on lupa.

Reference protocol (/root/reference/service/luaengine/actuator.go:33-37,
redis_actuator.go:169-245): the script sees globals ``___ROW___``,
``___OLDROW___`` (updates only), ``___ACT___``; sink calls write entries
into the global ``___RET___`` table under keys encoded as
``<action>_<structcode>_<key-or-uuid>``; the host then decodes
``Action = key[0:6]``, ``Structure = key[7:8]``, ``Key = key[9:]``.
Structure codes (redis_actuator.go:231-245): 1=string 2=hash 3=list
4=set 5=sortedset.  Hash/ZAdd entries use a UUID suffix and carry the
real key inside a nested table (redis_actuator.go:81-106,144-158).

This module provides:

* ``RetBuilder`` — the redisOps API (SET/DEL/HSET/HDEL/RPUSH/LREM/
  SADD/SREM/ZADD/ZREM) writing the exact ret-key encoding.  Works for
  plain-Python UDFs *and* as the module injected into a lupa runtime.
* ``decode_ret`` — the host-side decode into structured ops.
* ``LuaUdf`` — compiles a Lua script via lupa (once, in the actor's
  ``__init__`` — T2's compile-once semantics) and conforms to the
  engine's UDF contract ``fn(row, old, act, ctx)``.  Raises
  ``NotImplementedError`` when lupa isn't installed (it is not baked
  into this container); the protocol itself is fully tested through
  ``RetBuilder`` + ``decode_ret``.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field

from .encoders import to_string_go

try:  # pragma: no cover - exercised only where lupa is installed
    import lupa

    HAS_LUPA = True
except ImportError:  # pragma: no cover
    lupa = None
    HAS_LUPA = False

STRUCTURES = {"1": "string", "2": "hash", "3": "list", "4": "set", "5": "sortedset"}


@dataclass
class RedisOp:
    """Decoded sink operation (model.RedisRespond analogue,
    /root/reference/model/respond.go:53-61)."""

    action: str
    structure: str
    key: str
    field: "str | None" = None
    score: "float | None" = None
    val: object = None


class RetBuilder:
    """The redisOps module surface, writing the reference's ret encoding.

    Deterministic "UUIDs": the reference uses random UUIDs purely to keep
    hash/zadd ret keys unique (redis_actuator.go:92,156); a distributed
    engine needs reproducibility, so we use a monotonic counter."""

    def __init__(self):
        self.ret: dict[str, object] = {}
        self._uuid = itertools.count()

    def _next_uuid(self) -> str:
        return f"u{next(self._uuid):08d}"

    # string (redis_actuator.go:65-79)
    def SET(self, key, val):
        self.ret[f"insert_1_{key}"] = val

    def DEL(self, key):
        self.ret[f"delete_1_{key}"] = True

    # hash (redis_actuator.go:81-110)
    def HSET(self, key, fld, val):
        self.ret[f"insert_2_{self._next_uuid()}"] = {
            "key": key, "field": fld, "val": val,
        }

    def HDEL(self, key, fld):
        self.ret[f"delete_2_{self._next_uuid()}"] = {
            "key": key, "field": fld, "val": 1,
        }

    # list (redis_actuator.go:112-126)
    def RPUSH(self, key, val):
        self.ret[f"insert_3_{key}"] = val

    def LREM(self, key, val):
        self.ret[f"delete_3_{key}"] = val

    # set (redis_actuator.go:128-143)
    def SADD(self, key, val):
        self.ret[f"insert_4_{key}"] = val

    def SREM(self, key, val):
        self.ret[f"delete_4_{key}"] = val

    # sorted set (redis_actuator.go:145-168)
    def ZADD(self, key, score, val):
        self.ret[f"insert_5_{self._next_uuid()}"] = {
            "key": key, "score": score, "val": val,
        }

    def ZREM(self, key, val):
        self.ret[f"delete_5_{key}"] = val


def decode_ret(ret: dict) -> list[RedisOp]:
    """Host-side decode — the exact slicing of redis_actuator.go:193-226."""
    ops = []
    for kk, v in ret.items():
        action = kk[0:6]
        structure = STRUCTURES.get(kk[7:8], "")
        if action == "delete":
            ops.append(RedisOp(action, structure, key=kk[9:], val=_plain(v)))
            continue
        if structure == "hash":
            t = _plain(v)
            ops.append(
                RedisOp(action, structure, key=str(t["key"]),
                        field=str(t["field"]), val=t["val"])
            )
        elif structure == "sortedset":
            t = _plain(v)
            ops.append(
                RedisOp(action, structure, key=str(t["key"]),
                        score=float(t["score"]), val=t["val"])
            )
        else:
            ops.append(RedisOp(action, structure, key=kk[9:], val=_plain(v)))
    return ops


def _plain(v):
    """lupa/mini-Lua table → dict/list; everything else passes through."""
    if HAS_LUPA and lupa is not None and type(v).__name__ == "_LuaTable":
        keys = list(v.keys())
        if keys and all(isinstance(k, int) for k in keys):
            return [_plain(v[k]) for k in sorted(keys)]
        return {str(k): _plain(v[k]) for k in keys}
    if type(v).__name__ == "LuaTable":
        from .lua_mini import to_python

        return to_python(v)
    return v


# ---------------------------------------------------------------------------
# mongodbOps / esOps / mqOps ret protocols
# (/root/reference/service/luaengine/mongo_actuator.go:46-116,
#  es_actuator.go:45-96, mq_actuator.go:43-50)


@dataclass
class MongoOp:
    """model.MongoRespond analogue (/root/reference/model/respond.go:44-51)."""

    collection: str
    action: str
    id: object = None
    table: "dict | None" = None


@dataclass
class EsOp:
    """model.ESRespond analogue (/root/reference/model/respond.go:37-42)."""

    index: str
    id: str
    action: str
    date: str = ""


@dataclass
class MqOp:
    """model.MQRespond analogue (/root/reference/model/respond.go:29-35)."""

    topic: str
    body: bytes = b""


class MongoRetBuilder:
    """mongodbOps module: INSERT/UPDATE/DELETE/UPSERT write uuid-keyed
    tables into RET (mongo_actuator.go:46-116); deterministic counter in
    place of random UUIDs."""

    def __init__(self):
        self.ret: dict[str, dict] = {}
        self._uuid = itertools.count()

    def _key(self) -> str:
        return f"u{next(self._uuid):08d}"

    def INSERT(self, collection, table):
        self.ret[self._key()] = {
            "collection": collection, "action": "insert", "table": table,
        }

    def UPDATE(self, collection, id, table):
        self.ret[self._key()] = {
            "collection": collection, "action": "update", "id": id, "table": table,
        }

    def UPSERT(self, collection, id, table):
        self.ret[self._key()] = {
            "collection": collection, "action": "upsert", "id": id, "table": table,
        }

    def DELETE(self, collection, id):
        self.ret[self._key()] = {
            "collection": collection, "action": "delete", "id": id,
        }


def decode_mongo_ret(ret: dict, action: str,
                     id_seed: "str | None" = None) -> "list[MongoOp]":
    """Host-side decode of DoMongoOps (mongo_actuator.go:125-158): the
    stream action (not the op's) gates table handling; an INSERT without
    ``_id`` gets a generated id stamped into the doc.

    The reference generates a random UUID per insert
    (stringutil.UUID()); a distributed engine needs ids that are both
    UNIQUE across rows/actors and reproducible, so callers pass an
    ``id_seed`` derived from the row's position (e.g. "gtid:seq") and
    the generated id is ``gid-<seed>-<k>``.  Without a seed (ad-hoc
    decode) a random UUID keeps reference behavior."""
    import uuid as _uuid

    ops: list[MongoOp] = []
    gen = itertools.count()
    for _k, v in ret.items():
        v = _plain(v)
        table = v.get("table")
        if not isinstance(table, dict) and action != "delete":
            raise ValueError("The parameter must be of table type")
        op = MongoOp(
            collection=to_string_go(v.get("collection")),
            action=to_string_go(v.get("action")),
            id=v.get("id"),
            table=None if action == "delete" else dict(table),
        )
        if action == "insert":
            if "_id" not in op.table:
                op.id = (
                    f"gid-{id_seed}-{next(gen)}"
                    if id_seed is not None
                    else _uuid.uuid4().hex
                )
                op.table["_id"] = op.id
            else:
                op.id = op.table["_id"]
        ops.append(op)
    return ops


class EsRetBuilder:
    """esOps module (es_actuator.go:45-96)."""

    def __init__(self):
        self.ret: dict[str, dict] = {}
        self._uuid = itertools.count()

    def _key(self) -> str:
        return f"u{next(self._uuid):08d}"

    def INSERT(self, index, id, body):
        self.ret[self._key()] = {
            "index": index, "action": "insert", "id": id, "body": body,
        }

    def UPDATE(self, index, id, body):
        self.ret[self._key()] = {
            "index": index, "action": "update", "id": id, "body": body,
        }

    def DELETE(self, index, id):
        self.ret[self._key()] = {"index": index, "action": "delete", "id": id}


def _lua_number_str(v) -> str:
    from .lua_mini import lua_tostring

    return lua_tostring(v)


def decode_es_ret(ret: dict) -> "list[EsOp]":
    """DoESOps decode (es_actuator.go:98-140): body number/string pass
    through; body table → Go json.Marshal of the map (sorted keys)."""
    from .encoders import encode_json

    ops: list[EsOp] = []
    for _k, v in ret.items():
        v = _plain(v)
        body = v.get("body")
        if isinstance(body, bool):
            date = "true" if body else "false"
        elif isinstance(body, (int, float)):
            date = _lua_number_str(body)
        elif isinstance(body, str):
            date = body
        elif isinstance(body, dict):
            date = encode_json(body)
        elif body is None:
            date = "null"
        else:
            date = encode_json(body)
        ops.append(
            EsOp(
                index=to_string_go(v.get("index")),
                id=to_string_go(v.get("id")),
                action=to_string_go(v.get("action")),
                date=date,
            )
        )
    return ops


class MqRetBuilder:
    """mqOps module: SEND(topic, msg) → RET[msg] = topic
    (mq_actuator.go:43-50).  Messages may be Lua tables (unhashable), so
    entries are kept as an ordered list."""

    def __init__(self):
        self.entries: "list[tuple[object, object]]" = []

    def SEND(self, topic, msg):
        self.entries.append((msg, topic))


def decode_mq_ret(entries) -> "list[MqOp]":
    """DoMQOps decode (mq_actuator.go:52-89): ByteArray = lvToByteArray
    (nil→nil, bool→json, number→Lua string form, string→bytes,
    table→json of lvToInterface)."""
    import json as _json

    ops: list[MqOp] = []
    for msg, topic in entries:
        m = _plain(msg)
        if m is None:
            body = b""
        elif isinstance(m, bool):
            body = b"true" if m else b"false"
        elif isinstance(m, (int, float)):
            body = _lua_number_str(m).encode()
        elif isinstance(m, str):
            body = m.encode()
        else:
            body = _json.dumps(m, separators=(",", ":"), sort_keys=True).encode()
        ops.append(MqOp(topic=to_string_go(_plain(topic)), body=body))
    return ops


# ---------------------------------------------------------------------------
# script execution — lupa when present, the in-tree mini-Lua otherwise


def _mini_modules(executor) -> dict:
    """Build the preloaded module set of luaStatePool.New
    (actuator.go:71-87) for the mini interpreter."""
    from .encoders import encode_json
    from .lua_mini import LuaTable, to_python

    def raw_row():
        return (executor._row_table,)

    def raw_old_row():
        return (executor._old_table,)

    def raw_action():
        return (executor._act,)

    def module(api: dict) -> LuaTable:
        t = LuaTable()
        t.set("rawRow", raw_row)
        t.set("rawOldRow", raw_old_row)
        t.set("rawAction", raw_action)
        for name, fn in api.items():
            t.set(name, fn)
        return t

    def plainify(group: str, name: str):
        # resolve the CURRENT builder at call time — execute() swaps in
        # fresh builders per row
        def wrapped(*args):
            fn = getattr(executor.builders[group], name)
            fn(*[to_python(a) if isinstance(a, LuaTable) else a for a in args])
            return ()

        return wrapped

    redis = module(
        {
            name: plainify("redis", name)
            for name in (
                "SET", "DEL", "HSET", "HDEL", "RPUSH", "LREM",
                "SADD", "SREM", "ZADD", "ZREM",
            )
        }
    )
    mongo = module(
        {
            name: plainify("mongo", name)
            for name in ("INSERT", "UPDATE", "DELETE", "UPSERT")
        }
    )
    es = module(
        {name: plainify("es", name) for name in ("INSERT", "UPDATE", "DELETE")}
    )
    mq = module({"SEND": plainify("mq", "SEND")})

    json_mod = LuaTable()
    json_mod.set(
        "encode",
        lambda v: (encode_json(to_python(v)) if isinstance(v, LuaTable)
                   else encode_json(v),),
    )

    def json_decode(s):
        import json as _json

        from .lua_mini import _to_lua

        return (_to_lua(_json.loads(s)),)

    json_mod.set("decode", json_decode)

    # dbOps lookup (db_actuator.go:39-124): broadcast dict injected by the
    # host; selectOne(key) → row table (the per-row-SQL analogue)
    db = module({})
    lookup = executor.lookup or {}
    db.set(
        "selectOne",
        lambda _sql=None, key=None: (
            _to_lua_row(lookup.get(to_python(key) if isinstance(key, LuaTable) else key)),
        ),
    )

    # httpOps via the injectable transport stub (http_actuator.go:33-156)
    http = module({})
    transport = executor.http_transport

    def http_get(url):
        if transport is None:
            return (None,)
        from .lua_mini import _to_lua

        return (_to_lua(transport("GET", url, None)),)

    http.set("get", http_get)

    script_ops = module({})  # script sink: rawRow/rawAction only

    return {
        "redisOps": redis,
        "mongodbOps": mongo,
        "esOps": es,
        "mqOps": mq,
        "json": json_mod,
        "dbOps": db,
        "httpOps": http,
        "scriptOps": script_ops,
    }


def _to_lua_row(v):
    from .lua_mini import _to_lua

    return _to_lua(v) if v is not None else None


class LuaScriptRunner:
    """Compile-once Lua rule executor over every sink module surface.

    The script is parsed ONCE (the actor ``__init__`` path — T2,
    /root/reference/global/rule.go:621-694); ``execute`` binds the
    reference's globals (___ROW___/___OLDROW___/___ACT___/___RET___,
    actuator.go:33-37) and returns the per-module decoded ops.  Uses the
    in-tree mini-Lua (functions/lua_mini.py); the lupa path in LuaUdf is
    kept for environments that have it."""

    def __init__(self, script: str, lookup: "dict | None" = None,
                 http_transport=None):
        from .lua_mini import Interpreter, LuaTable

        self.lookup = lookup
        self.http_transport = http_transport
        self.builders: dict = {}
        self._row_table = LuaTable()
        self._old_table = LuaTable()
        self._act = ""
        self._reset_builders()
        self.interp = Interpreter(script, modules=_mini_modules(self))
        # modules are also visible as globals (scripts in the wild skip
        # require() because PreloadModule + common snippets assign them)
        for name, mod in self.interp.modules.items():
            self.interp.global_set(name, mod)

    def _reset_builders(self):
        self.builders["redis"] = RetBuilder()
        self.builders["mongo"] = MongoRetBuilder()
        self.builders["es"] = EsRetBuilder()
        self.builders["mq"] = MqRetBuilder()

    def execute(self, row: "dict | None", old: "dict | None", action: str,
                id_seed: "str | None" = None) -> dict:
        """Run the script for one change row; returns decoded ops per
        module: {"redis": [RedisOp], "mongo": [...], "es": [...],
        "mq": [...], "ret": raw merged ret dict}.  ``id_seed`` feeds
        Mongo generated-insert-id uniqueness (see decode_mongo_ret)."""
        from .lua_mini import LuaTable, to_python

        self._reset_builders()
        self._row_table = LuaTable.from_dict(row or {})
        self._old_table = LuaTable.from_dict(old or {})
        self._act = action
        ret_table = LuaTable()
        self.interp.global_set("___ROW___", self._row_table)
        self.interp.global_set("___OLDROW___", self._old_table if action == "update" else None)
        self.interp.global_set("___ACT___", action)
        self.interp.global_set("___RET___", ret_table)
        self.interp.run()
        # entries the script wrote straight into ___RET___ join the
        # module-call entries (the reference decodes the one RET table)
        merged = dict(self.builders["redis"].ret)
        for k, v in ret_table.lua_items():
            merged[str(k) if not isinstance(k, float) else _lua_number_str(k)] = (
                to_python(v) if isinstance(v, LuaTable) else v
            )
        return {
            "redis": decode_ret(merged),
            "mongo": decode_mongo_ret(
                self.builders["mongo"].ret, action, id_seed=id_seed
            ),
            "es": decode_es_ret(self.builders["es"].ret),
            "mq": decode_mq_ret(self.builders["mq"].entries),
            "ret": merged,
        }


class LuaUdf:
    """Engine UDF contract adapter for a Lua script.

    Compile happens once here (the actor's ``__init__`` path) — mirroring
    the reference's compiled-proto reuse (/root/reference/global/rule.go:
    621-694, NewFunctionFromProto at redis_actuator.go:186-191).  Runs on
    lupa when installed, else on the in-tree mini-Lua interpreter
    (functions/lua_mini.py) — either way the script REALLY executes."""

    def __init__(self, script: str):
        if HAS_LUPA:
            self.rt = lupa.LuaRuntime(unpack_returned_tuples=True)
            self.compiled = self.rt.compile(script)
            self.runner = None
        else:
            self.rt = None
            self.runner = LuaScriptRunner(script)

    def __call__(self, row, old, act, ctx):
        if self.rt is not None:
            builder = RetBuilder()
            g = self.rt.globals()
            g["___ROW___"] = self.rt.table_from(row or {})
            if act == "update":
                g["___OLDROW___"] = self.rt.table_from(old or {})
            g["___ACT___"] = act
            ret = self.rt.table()
            g["___RET___"] = ret
            g["redisOps"] = builder
            self.compiled()
            for k, v in ret.items():
                builder.ret[str(k)] = v
            ops = decode_ret(builder.ret)
        else:
            ops = self.runner.execute(row, old, act)["redis"]
        # adapt to the engine contract: string SETs become row upserts
        out = []
        for op in ops:
            if op.structure == "string" and op.action != "delete":
                out.append(op.val if isinstance(op.val, dict) else {"value": op.val})
        return out or None
