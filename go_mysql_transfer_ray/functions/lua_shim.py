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
    """lupa table → dict/list; everything else passes through."""
    if HAS_LUPA and lupa is not None and type(v).__name__ == "_LuaTable":
        keys = list(v.keys())
        if keys and all(isinstance(k, int) for k in keys):
            return [_plain(v[k]) for k in sorted(keys)]
        return {str(k): _plain(v[k]) for k in keys}
    return v


class LuaUdf:
    """Engine UDF contract adapter for a Lua script (requires lupa).

    Compile happens once here (the actor's ``__init__`` path) — mirroring
    the reference's compiled-proto reuse (/root/reference/global/rule.go:
    621-694, NewFunctionFromProto at redis_actuator.go:186-191)."""

    def __init__(self, script: str):
        if not HAS_LUPA:
            raise NotImplementedError(
                "Lua UDFs need the 'lupa' package, which is not available in "
                "this environment; use a Python UDF with the same contract "
                "(fn(row, old, act, ctx)) — see stages/rule_engine.py."
            )
        self.rt = lupa.LuaRuntime(unpack_returned_tuples=True)
        self.compiled = self.rt.compile(script)

    def __call__(self, row, old, act, ctx):
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
        # adapt to the engine contract: string SETs become row upserts
        out = []
        for op in ops:
            if op.structure == "string" and op.action != "delete":
                out.append(op.val if isinstance(op.val, dict) else {"value": op.val})
        return out or None
