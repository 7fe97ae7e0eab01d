"""Lua rule scripts as a pipeline stage — the reference's script sinks.

The reference executes a per-rule Lua script for every change row and
applies the decoded ops to the sink
(/root/reference/service/luaengine/redis_actuator.go:59-245,
``DoRedisOps`` → Redis pipeline apply redis.go:148-223).  Here the script
runs inside a ``map_batches`` ACTOR pool (compiled once per actor — T2)
over the change stream, and the decoded Redis ops feed the same LWW
structure merge the declarative Redis rules use (stages/redis_state.py),
yielding the converged final state a real Redis would hold.

Per-row execution is inherent to the Lua contract (the reference runs the
script per RowRequest); everything around it — decode, merge, shuffle —
stays vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.encoders import to_string_go
from ..functions.lua_shim import LuaScriptRunner
from ..stages.merge import fieldwise_merged_dataset, merged_dataset

_SEP = "\x00"
_STRUCT_RANK = {"string": 1, "hash": 2, "list": 3, "set": 4, "sortedset": 5}
# intra-row op index rides inside seq_in_txn (seq*K + j); a script
# emitting more ops than K for ONE row would collide with the next
# row's ordering, so it is a hard error
_MAX_OPS_PER_ROW = 1024


class LuaRedisActor:
    """Actor-pool stage: change rows → Lua script → redis op rows.

    ``__init__`` compiles the script once per actor (T1/T2); ``__call__``
    executes it per row (the reference contract) and emits one merge row
    per decoded op, keyed so the LWW merge converges each structure
    entry: string → key, hash → key+field, set/zset → key+member."""

    def __init__(self, script: str, payload_cols: "tuple[str, ...]",
                 order_cols: "tuple[str, str]" = ("gtid", "seq_in_txn"),
                 lookup: "dict | None" = None, on_list: str = "error"):
        # ``on_list``: what to do with list-structure ops (RPUSH/LREM).
        #   "error" — raise: the LWW merge would collapse a list to its
        #             last pushed value (use lua_redis_list_state);
        #   "only"  — keep ONLY list ops (the ordered-replay path);
        #   "drop"  — keep only NON-list ops (pairs with "only" when one
        #             script feeds both merges).
        if on_list not in ("error", "only", "drop"):
            raise ValueError(f"on_list must be error|only|drop, got {on_list!r}")
        self.runner = LuaScriptRunner(script, lookup=lookup)
        self.payload_cols = payload_cols
        self.order_cols = order_cols
        self.on_list = on_list

    def __call__(self, t: pa.Table) -> pa.Table:
        gtid = t.column(self.order_cols[0]).to_numpy(zero_copy_only=False)
        seq = t.column(self.order_cols[1]).to_numpy(zero_copy_only=False)
        op_col = t.column("op").to_pylist()
        payload = t.select(list(self.payload_cols)).to_pylist()
        before = (
            t.column("before").to_pylist() if "before" in t.column_names else None
        )
        keys, gtids, seqs, ops = [], [], [], []
        redis_keys, fields, values, scores = [], [], [], []
        for i, row in enumerate(payload):
            old = before[i] if before is not None else None
            decoded = self.runner.execute(row, old, op_col[i])["redis"]
            if len(decoded) > _MAX_OPS_PER_ROW:
                raise ValueError(
                    f"script emitted {len(decoded)} ops for one row; the "
                    f"intra-row LWW order supports at most {_MAX_OPS_PER_ROW}"
                )
            for j, op in enumerate(decoded):
                struct = op.structure
                if struct == "list":
                    if self.on_list == "error":
                        raise ValueError(
                            "script emitted a list-structure op (RPUSH/"
                            "LREM); the LWW merge would collapse the list "
                            "to its last value — use lua_redis_list_state "
                            "for the ordered replay"
                        )
                    if self.on_list == "drop":
                        continue
                elif self.on_list == "only":
                    continue
                if struct == "hash":
                    mk = f"{struct}{_SEP}{op.key}{_SEP}{op.field}"
                elif struct in ("set", "sortedset"):
                    member = to_string_go(op.val)
                    mk = f"{struct}{_SEP}{op.key}{_SEP}{member}"
                else:
                    mk = f"{struct}{_SEP}{op.key}"
                keys.append(mk)
                gtids.append(int(gtid[i]))
                # intra-row op order is part of the LWW order (a script
                # may DEL then SET the same key for one event)
                seqs.append(int(seq[i]) * _MAX_OPS_PER_ROW + j)
                ops.append("delete" if op.action == "delete" else "insert")
                redis_keys.append(op.key)
                fields.append(op.field)
                values.append(
                    op.val if isinstance(op.val, str) else to_string_go(op.val)
                )
                scores.append(op.score)
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                # packed seq*K+j is int64: int32 silently wrapped (numpy
                # 1.x) for source seq_in_txn above ~2.09M
                "gtid": pa.array(np.asarray(gtids, dtype=np.int64)),
                "seq_in_txn": pa.array(np.asarray(seqs, dtype=np.int64)),
                "op": pa.array(ops, pa.string()),
                "redis_key": pa.array(redis_keys, pa.string()),
                "field": pa.array(fields, pa.string()),
                "value": pa.array(values, pa.string()),
                "score": pa.array(scores, pa.float64()),
            }
        )


class LuaMongoActor:
    """Actor-pool stage: change rows → Lua script → mongo op rows.

    Decoded ``MongoOp``s (INSERT/UPDATE/UPSERT/DELETE,
    /root/reference/service/luaengine/mongo_actuator.go:46-116) become
    field-wise merge rows keyed ``collection\\x00id``; document fields
    named in ``doc_cols`` are lifted from ``op.table`` (absent → null =
    "not set", the $set contract)."""

    def __init__(self, script: str, payload_cols: "tuple[str, ...]",
                 doc_cols: "tuple[str, ...]",
                 order_cols: "tuple[str, str]" = ("gtid", "seq_in_txn"),
                 lookup: "dict | None" = None):
        self.runner = LuaScriptRunner(script, lookup=lookup)
        self.payload_cols = payload_cols
        self.doc_cols = doc_cols
        self.order_cols = order_cols

    def __call__(self, t: pa.Table) -> pa.Table:
        gtid = t.column(self.order_cols[0]).to_numpy(zero_copy_only=False)
        seq = t.column(self.order_cols[1]).to_numpy(zero_copy_only=False)
        op_col = t.column("op").to_pylist()
        payload = t.select(list(self.payload_cols)).to_pylist()
        keys, gtids, seqs, ops = [], [], [], []
        docs: dict[str, list] = {c: [] for c in self.doc_cols}
        for i, row in enumerate(payload):
            decoded = self.runner.execute(
                row, None, op_col[i], id_seed=f"{int(gtid[i])}:{int(seq[i])}"
            )["mongo"]
            if len(decoded) > _MAX_OPS_PER_ROW:
                raise ValueError(
                    f"script emitted {len(decoded)} ops for one row; the "
                    f"intra-row LWW order supports at most {_MAX_OPS_PER_ROW}"
                )
            for j, op in enumerate(decoded):
                keys.append(f"{op.collection}{_SEP}{to_string_go(op.id)}")
                gtids.append(int(gtid[i]))
                seqs.append(int(seq[i]) * _MAX_OPS_PER_ROW + j)
                ops.append(op.action)
                table = op.table or {}
                for c in self.doc_cols:
                    docs[c].append(table.get(c))
        cols = {
            "key": pa.array(keys, pa.string()),
            "gtid": pa.array(np.asarray(gtids, dtype=np.int64)),
            # int64: the seq*K+j packing overflows int32 for large txns
            "seq_in_txn": pa.array(np.asarray(seqs, dtype=np.int64)),
            "op": pa.array(ops, pa.string()),
        }
        for c in self.doc_cols:
            cols[c] = pa.array(docs[c])
        return pa.table(cols)


def lua_mongo_state(
    ds,
    script: str,
    *,
    payload_cols: "tuple[str, ...]",
    doc_cols: "tuple[str, ...]",
    order_cols: "tuple[str, str]" = ("gtid", "seq_in_txn"),
    lookup: "dict | None" = None,
    num_partitions: int = 16,
    concurrency: "int | tuple[int, int]" = (1, 4),
):
    """Converged Mongo collection state produced by a Lua rule script:
    the field-wise $set merge with the Lua UPSERT path enabled
    (mongo_actuator.go:77-91 → SetUpsert(true), mongo.go:141-149)."""
    ops = ds.map_batches(
        LuaMongoActor,
        fn_constructor_args=(
            script, tuple(payload_cols), tuple(doc_cols), tuple(order_cols), lookup,
        ),
        concurrency=concurrency,
        batch_format="pyarrow",
    )
    return fieldwise_merged_dataset(
        ops, num_partitions, final_columns=list(doc_cols), upsert=True
    )


class LuaEsActor:
    """Stateless-per-batch Lua ES stage: each change row's script run
    yields ES bulk ops (es_actuator.go:45-140) — emitted 1:1, no merge
    (the ES sink applies bulk ops in order; the converged-index view is
    the same fieldwise merge users get from lua_mongo_state)."""

    def __init__(self, script: str, payload_cols: "tuple[str, ...]",
                 es_type: str = "_doc",
                 lookup: "dict | None" = None):
        self.runner = LuaScriptRunner(script, lookup=lookup)
        self.payload_cols = payload_cols
        self.es_type = es_type

    def __call__(self, t: pa.Table) -> pa.Table:
        op_col = t.column("op").to_pylist()
        payload = t.select(list(self.payload_cols)).to_pylist()
        idxs, ids, actions, bodies = [], [], [], []
        for i, row in enumerate(payload):
            for op in self.runner.execute(row, None, op_col[i])["es"]:
                idxs.append(op.index)
                ids.append(op.id)
                actions.append(op.action)
                bodies.append(op.date)
        n = len(idxs)
        return pa.table(
            {
                "es_index": pa.array(idxs, pa.string()),
                "es_type": pa.array([self.es_type] * n, pa.string()),
                "id": pa.array(ids, pa.string()),
                "action": pa.array(actions, pa.string()),
                "body": pa.array(bodies, pa.string()),
            }
        )


def lua_es_ops(
    ds,
    script: str,
    *,
    payload_cols: "tuple[str, ...]",
    es_type: str = "_doc",
    lookup: "dict | None" = None,
    concurrency: "int | tuple[int, int]" = (1, 4),
):
    """ES bulk-op stream produced by a Lua rule script (with the ES6
    ``_type`` carried on every op, elastic6.go:211)."""
    return ds.map_batches(
        LuaEsActor,
        fn_constructor_args=(script, tuple(payload_cols), es_type, lookup),
        concurrency=concurrency,
        batch_format="pyarrow",
    )


def lua_redis_state(
    ds,
    script: str,
    *,
    payload_cols: "tuple[str, ...]",
    order_cols: "tuple[str, str]" = ("gtid", "seq_in_txn"),
    lookup: "dict | None" = None,
    num_partitions: int = 16,
    concurrency: "int | tuple[int, int]" = (1, 4),
    on_list: str = "error",
):
    """Converged Redis state produced by a Lua rule script.

    ``ds``: change-event dataset with ``op`` + ``order_cols`` +
    ``payload_cols``.  Returns a Dataset of surviving entries
    ``(redis_key, field, value, score)`` after the LWW merge (delete
    tombstones dropped) — identical semantics to replaying the script's
    ops against a Redis in log order.  List-structure ops (RPUSH/LREM)
    are position-dependent and raise here (``on_list="error"``) — use
    ``lua_redis_list_state`` for their ordered replay; a script that
    mixes structures runs both pipelines (``on_list="drop"`` here)."""
    ops = ds.map_batches(
        LuaRedisActor,
        fn_constructor_args=(
            script, tuple(payload_cols), tuple(order_cols), lookup, on_list,
        ),
        concurrency=concurrency,
        batch_format="pyarrow",
    )
    return merged_dataset(
        ops, num_partitions, final_columns=["redis_key", "field", "value", "score"]
    )


def lua_redis_list_state(
    ds,
    script: str,
    *,
    payload_cols: "tuple[str, ...]",
    order_cols: "tuple[str, str]" = ("gtid", "seq_in_txn"),
    lookup: "dict | None" = None,
    num_partitions: int = 16,
    concurrency: "int | tuple[int, int]" = (1, 4),
):
    """Converged Redis LIST state from a Lua rule script's RPUSH/LREM ops
    (redis_actuator.go list path → redis.go:239-252).

    List semantics are position-dependent, so instead of the LWW merge
    the decoded list ops ride the same per-key ordered replay as the
    declarative list rules (stages/redis_state.list_replay_fold over the
    storage shuffle).  Returns ``(redis_key, list_pos, value)``."""
    from ..stages.merge import add_partition_column
    from ..stages.redis_state import list_replay_fold
    from ..stages.shuffle import storage_fold

    ops = ds.map_batches(
        LuaRedisActor,
        fn_constructor_args=(
            script, tuple(payload_cols), tuple(order_cols), lookup, "only",
        ),
        concurrency=concurrency,
        batch_format="pyarrow",
    )

    def project(t: pa.Table) -> pa.Table:
        # group by the rendered redis key; gtid/seq carry the log order
        # (seq already packs the intra-row op index)
        t = t.select(["redis_key", "gtid", "seq_in_txn", "op", "value"])
        t = t.rename_columns(["key", "gtid", "seq_in_txn", "op", "value"])
        return add_partition_column(t, num_partitions)

    return storage_fold(
        ops.map_batches(project, batch_format="pyarrow"),
        num_partitions,
        list_replay_fold,
        label="lua-redis-list",
        empty_schema={
            "redis_key": pa.string(),
            "list_pos": pa.int32(),
            "value": pa.string(),
        },
    )
