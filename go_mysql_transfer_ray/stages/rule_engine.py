"""Rule-engine stage — actor pool applying compiled RulePlans + UDF hooks.

The Ray re-expression of the reference's Lua VM pool + compiled-script
machinery (/root/reference/service/luaengine/actuator.go:46-101,
/root/reference/global/rule.go:621-694): a callable CLASS handed to
``map_batches(Cls, concurrency=N)`` so that plan compilation, UDF setup and
lookup-table fetch happen ONCE per actor (``__init__``), and every batch is
transformed vectorized in ``__call__``.

UDF contract (T3, /root/reference/service/luaengine/actuator.go:33-37,103-113):
the reference exposes globals ``___ROW___``, ``___OLDROW___``, ``___ACT___``
to Lua and decodes a ``___RET___`` table of ops.  Our equivalent is

    udf(row: dict, old_row: dict | None, action: str, ctx: UdfContext)
        -> list[SinkOp] | dict | None

* return a dict        → replace the row (common transform case);
* return ``None``      → drop the row (filter);
* return list[SinkOp]  → explicit ops incl. UPSERT/DELETE with custom keys
  (the Lua ret-protocol ``action_structcode_key`` analogue,
  /root/reference/service/luaengine/redis_actuator.go:169-245).

``ctx.lookup`` is the dbOps analogue
(/root/reference/service/luaengine/db_actuator.go:39-124): instead of
per-row SQL against the source, a small dimension table is broadcast via
``ray.put`` once and fetched per actor — never per batch, never per row.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import pyarrow as pa

import ray

from ..rules import RuleConfig, RulePlan
from ..functions.coerce import ColumnSpec


@dataclass
class SinkOp:
    """One logical sink operation (the Respond analogue,
    /root/reference/model/respond.go:29-61)."""

    action: str           # insert | update | delete | upsert
    key: str
    row: dict | None = None


@dataclass
class UdfContext:
    lookup: dict[str, Any]
    http: Any = None  # HttpOps (T5); constructed per actor in __init__
    db: Any = None    # DbOps (T4); broadcast-dict lookup join


class MultiRuleEngine:
    """map_batches actor: N per-table RulePlans over ONE mixed stream.

    The reference compiles a rule per concrete table and its handler
    routes each event to its table's rule
    (/root/reference/service/transfer_service.go:206-276,
    service/handler.go:83-86).  Here the batch (already decoded by
    stages.decode.MultiDecoder, carrying a ``table`` column) is split per
    table, each slice transformed vectorized by that table's compiled
    plan, and re-concatenated onto the UNION of the plans' output
    columns (null-padded) — so the stream stays ONE schema through the
    shared merge exchange.  Plans compile once per actor.

    ``configs``: {table: RuleConfig | None} — None means identity
    projection of the table's decoded columns.  ``specs``: {table:
    list[ColumnSpec]} describing each table's decoded payload columns.
    """

    _META = ("key", "gtid", "seq_in_txn", "op", "table")

    def __init__(
        self,
        configs: "dict[str, RuleConfig | None]",
        specs: "dict[str, list[ColumnSpec]]",
    ):
        self.plans: dict[str, RulePlan | None] = {}
        union: dict[str, pa.DataType] = {}
        self._outputs: dict[str, list[str]] = {}
        for table, cfg in configs.items():
            cols = specs[table]
            if cfg is None:
                self.plans[table] = None
                out_names = [c.name for c in cols]
            else:
                plan = RulePlan(cfg, cols)
                self.plans[table] = plan
                out_names = list(plan.output_order)
            self._outputs[table] = out_names
        self._union_names: list[str] = []
        seen: set[str] = set()
        for table, names in self._outputs.items():
            for n in names:
                if n not in seen:
                    seen.add(n)
                    self._union_names.append(n)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tcol = batch.column("table")
        projected: dict[str, pa.Table] = {}
        metas: dict[str, dict] = {}
        for table, plan in self.plans.items():
            sub = batch.filter(pc.equal(tcol, pa.scalar(table)))
            metas[table] = {
                n: sub.column(n) for n in self._META if n in sub.column_names
            }
            if plan is None:
                projected[table] = sub.select(
                    [c for c in self._outputs[table] if c in sub.column_names]
                )
            else:
                projected[table] = plan.apply(sub)
        # union column types come from whichever table produces the column
        # (typed, e.g. int64 stars); other tables pad with typed nulls
        types: dict[str, pa.DataType] = {}
        for p in projected.values():
            for f in p.schema:
                prev = types.get(f.name)
                if prev is not None and prev != f.type:
                    raise ValueError(
                        f"rule output column {f.name!r} has conflicting "
                        f"types across tables: {prev} vs {f.type}"
                    )
                types[f.name] = f.type
        outs = []
        for table, p in projected.items():
            cols = dict(metas[table])
            for name in self._union_names:
                if name in p.column_names:
                    cols[name] = p.column(name)
                else:
                    cols[name] = pa.nulls(p.num_rows, types.get(name, pa.string()))
            outs.append(pa.table(cols))
        return pa.concat_tables(outs, promote_options="default")


class RuleEngine:
    """map_batches actor: vectorized rule application (+ optional UDF).

    Parameters are plain picklable values; heavy state (plan compile, UDF
    import, broadcast fetch) is built in ``__init__`` — once per actor.
    """

    def __init__(
        self,
        config: RuleConfig,
        columns: list[ColumnSpec],
        *,
        udf: Callable | None = None,
        lookup_ref: "ray.ObjectRef | None" = None,
        passthrough: list[str] = ("gtid", "seq_in_txn", "op", "key"),
        http_client=None,
    ):
        self.plan = RulePlan(config, columns)
        self.udf = udf
        lookup = ray.get(lookup_ref) if lookup_ref is not None else {}
        from ..functions.db_ops import DbOps
        from ..functions.http_stub import HttpOps

        self.ctx = UdfContext(
            lookup=lookup,
            http=HttpOps(http_client),
            db=DbOps(lookup if isinstance(lookup, dict) else {}),
        )
        self.passthrough = list(passthrough)

    def __call__(self, batch: pa.Table) -> pa.Table:
        meta = {
            name: batch.column(name)
            for name in self.passthrough
            if name in batch.column_names
        }
        projected = self.plan.apply(batch)
        if self.udf is None:
            return pa.table({**meta, **{c: projected.column(c) for c in projected.column_names}})
        return self._apply_udf(batch, meta, projected)

    def _apply_udf(self, batch: pa.Table, meta: dict, projected: pa.Table) -> pa.Table:
        """Row-contract UDF path (inherently row-wise, like the Lua VM)."""
        rows = projected.to_pylist()
        ops = (
            batch.column("op").to_pylist()
            if "op" in batch.column_names
            else ["insert"] * len(rows)
        )
        old_rows = (
            batch.column("before").to_pylist()
            if "before" in batch.column_names
            else [None] * len(rows)
        )
        keep_idx: list[int] = []
        out_rows: list[dict] = []
        out_actions: list[str] = []
        out_keys: list[str | None] = []
        keys = (
            batch.column("key").to_pylist()
            if "key" in batch.column_names
            else [None] * len(rows)
        )
        for i, (row, old, act) in enumerate(zip(rows, old_rows, ops)):
            ret = self.udf(row, old, act, self.ctx)
            if ret is None:
                continue
            if isinstance(ret, dict):
                keep_idx.append(i)
                out_rows.append(ret)
                out_actions.append(act)
                out_keys.append(keys[i])
            else:  # list[SinkOp]
                for op_ in ret:
                    keep_idx.append(i)
                    out_rows.append(op_.row if op_.row is not None else row)
                    # upsert = write regardless of the triggering action
                    # (the Lua path upserts even on deletes,
                    # /root/reference/service/luaengine/mongo_actuator.go:77-91)
                    out_actions.append(
                        "insert" if op_.action == "upsert" else op_.action
                    )
                    out_keys.append(op_.key if op_.key is not None else keys[i])
        if not out_rows:  # whole batch filtered: keep a stable empty schema
            empty_meta = {n: c.slice(0, 0) for n, c in meta.items()}
            return pa.table(
                {**empty_meta, **{c: projected.column(c).slice(0, 0) for c in projected.column_names}}
            )
        cols: dict[str, Any] = {}
        for name, col in meta.items():
            if name == "op":
                cols["op"] = pa.array(out_actions, pa.string())
            elif name == "key":
                cols["key"] = pa.array(out_keys, pa.string())
            else:
                cols[name] = col.take(pa.array(keep_idx, pa.int64()))
        # deterministic column order: plan output order, then sorted
        # extras.  Projected columns are ALWAYS emitted (typed from the
        # plan) even when every out row of THIS batch omits them — the
        # schema must not drift per batch (the empty-batch fast path
        # above keeps the full projected schema; non-empty batches must
        # agree or the downstream concat/write fails)
        proj_names = list(projected.column_names)
        extra = sorted({k for r in out_rows for k in r} - set(proj_names))
        for name in proj_names + extra:
            vals = [r.get(name) for r in out_rows]
            if name in projected.column_names:
                try:
                    cols[name] = pa.array(
                        vals, type=projected.schema.field(name).type
                    )
                    continue
                except (pa.ArrowInvalid, pa.ArrowTypeError):
                    pass  # UDF changed the column's type: infer below
            cols[name] = pa.array(vals)
        return pa.table(cols)


# ---------------------------------------------------------------------------
# task-pool variants for the no-UDF paths
#
# When a rule stage's only state is compiled RulePlans (and at most a
# broadcast lookup dict), an actor pool buys nothing over a task pool
# with a per-worker-process cache — and it costs: ~1-3 s of actor spawn
# per pipeline invocation, plus a concurrency cap that leaves most of
# the node's CPUs out of the rule stage while decode/shuffle stages run
# task-parallel.  Plan compile is string parsing (microseconds) and
# ray.get of the same lookup ref is a local plasma lookup, so the
# per-process rebuild is ~free.  The actor classes above remain the
# right tool when a UDF closure or Lua chunk is part of the state.

_ENGINE_CACHE: dict = {}
_ENGINE_CACHE_MAX = 8


def _cached_engine(key, build):
    # LRU, not clear-all: a driver alternating >MAX distinct plans must
    # not thrash recompiles, and evicting only the least-recently-used
    # entry releases the engine's materialized broadcast-lookup dict
    # (otherwise pinned in long-lived Ray workers after its pipeline
    # ends).  dict preserves insertion order; re-inserting on hit makes
    # the first key the LRU victim.
    eng = _ENGINE_CACHE.pop(key, None)
    if eng is None:
        while len(_ENGINE_CACHE) >= _ENGINE_CACHE_MAX:
            _ENGINE_CACHE.pop(next(iter(_ENGINE_CACHE)))
        eng = build()
    _ENGINE_CACHE[key] = eng
    return eng


def multi_rule_engine_batch(
    batch: pa.Table,
    configs: "dict[str, RuleConfig | None]",
    specs: "dict[str, list[ColumnSpec]]",
) -> pa.Table:
    """Task-pool form of ``MultiRuleEngine`` (dataclass reprs key the
    per-process compiled-plan cache)."""
    key = (
        "multi",
        repr(sorted(configs.items())),
        repr(sorted((t, tuple(s)) for t, s in specs.items())),
    )
    return _cached_engine(key, lambda: MultiRuleEngine(configs, specs))(batch)


def rule_engine_batch(
    batch: pa.Table,
    config: RuleConfig,
    columns: "list[ColumnSpec]",
    lookup_ref=None,
    passthrough: "tuple[str, ...]" = ("gtid", "seq_in_txn", "op", "key"),
) -> pa.Table:
    """Task-pool form of ``RuleEngine`` for the plain (no-UDF) path."""
    key = (
        "single",
        repr(config),
        repr(columns),
        lookup_ref.hex() if lookup_ref is not None else None,
        tuple(passthrough),
    )
    return _cached_engine(
        key,
        lambda: RuleEngine(
            config, columns, lookup_ref=lookup_ref, passthrough=list(passthrough)
        ),
    )(batch)
