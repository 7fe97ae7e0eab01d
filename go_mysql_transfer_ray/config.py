"""app.yml-compatible application config — the reference's user DSL.

The reference is driven entirely by one YAML file (``app.yml``): global
target/runtime settings (/root/reference/global/config.go:63-196, yaml
tags) plus a ``rule`` list (/root/reference/global/rule.go:57-133).  This
module parses that exact document shape, applies the reference's defaults
and validation (checkConfig, config.go:198-262; initRedisConfig,
rule.go:458-548), and compiles it onto this engine's pipelines so a
go-mysql-transfer user can bring their config file unchanged:

    app = load_app("app.yml")
    run_app(app, events_dir, out_dir)

Target → pipeline dispatch (endpoint.NewEndpoint, endpoint.go:50-88):

    mongodb / elasticsearch   keyed LWW lake upsert (cdc.replay /
                              replay_multi) — the engine's canonical
                              idempotent upsert-by-key sink
    kafka / rocketmq /        JSON message envelopes (message_sink),
    rabbitmq                  one Parquet directory per topic/queue
                              (kafka.go:83-121 topic default = table)
    redis                     converged structure state
                              (stages.redis_state), value = encoded row
    script                    per-row Lua execution; decoded ___RET___
                              entries written as the runnable artifact
                              (script.go:48-68 executes for side effects)

Wildcard table names expand with Go-QuoteMeta/RLIKE semantics
(rules.expand_rules); a Lua rule (lua_script / lua_file_path) routes
redis targets through pipelines.lua_rules.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, replace

import pyarrow as pa

from .rules import RuleConfig, expand_rules
from .schema import TABLE_COLUMNS, TABLE_NAME, TABLE_PKS
from .stages.redis_state import RedisConfig

TARGETS = (
    "redis", "mongodb", "elasticsearch", "kafka", "rocketmq", "rabbitmq",
    "script",
)

# global defaults, per checkConfig / config.go
_DEF_BULK_SIZE = 100           # config.go:231-233
_DEF_FLUSH_INTERVAL = 200      # config.go:227-229
_DEF_ES_VERSION = 7            # config.go:383-385
_DEF_EXPORTER_PORT = 9595      # config.go:256-258
_DEF_WEB_ADMIN_PORT = 8060     # config.go:260-262


@dataclass
class AppRule:
    """One parsed ``rule:`` entry (global/rule.go:64-133 yaml tags)."""

    rule_config: RuleConfig
    schema: str = ""
    order_by_column: str = ""          # stock paging column (stock only)
    lua_script: str = ""               # resolved script text
    redis: "RedisConfig | None" = None
    mongodb_database: str = ""
    mongodb_collection: str = ""       # default: table (mongo.go:102-123)
    es_index: str = ""                 # default: table (elastic7.go)
    es_type: str = "_doc"              # ES6 only (elastic6.go:191-246)
    es_mappings: tuple = ()            # (column, field, type, ...) dicts
    kafka_topic: str = ""
    rocketmq_topic: str = ""
    rabbitmq_queue: str = ""

    def topic_for(self, target: str, table: str) -> str:
        """Destination name: per-target override or the table name
        (kafka.go:83-121 / rocket.go / rabbit.go defaults)."""
        override = {
            "kafka": self.kafka_topic,
            "rocketmq": self.rocketmq_topic,
            "rabbitmq": self.rabbitmq_queue,
        }.get(target, "")
        return override or table


@dataclass
class AppConfig:
    target: str
    rules: list[AppRule] = field(default_factory=list)
    es_version: int = _DEF_ES_VERSION
    bulk_size: int = _DEF_BULK_SIZE
    flush_bulk_interval: int = _DEF_FLUSH_INTERVAL
    maxprocs: int = 0
    data_dir: str = ""
    enable_exporter: bool = False
    exporter_port: int = _DEF_EXPORTER_PORT
    enable_web_admin: bool = False
    web_admin_port: int = _DEF_WEB_ADMIN_PORT
    # skip (with a warning) tables that have no primary key instead of
    # failing startup — config.go SkipNoPkTable,
    # transfer_service.go:253-257
    skip_no_pk_table: bool = False
    # log directory (config.go:243-252: ``logger: store:`` in app.yml,
    # defaulting to <data_dir>/log when a data_dir is configured)
    logger_store: str = ""

    def expand(self, tables: "list[str]") -> "dict[str, AppRule]":
        """Expand wildcard rules against the stream's concrete tables —
        one cloned AppRule per table, last registration wins
        (transfer_service.go:206-246)."""
        out: dict[str, AppRule] = {}
        for r in self.rules:
            expanded = expand_rules([r.rule_config], tables)
            for tbl, rc in expanded.items():
                rc = replace(rc, primary_keys=TABLE_PKS.get(tbl, rc.primary_keys))
                out[tbl] = replace(r, rule_config=rc)
        return out


def _bool(v) -> bool:
    if isinstance(v, str):
        return v.strip().lower() in ("true", "1", "yes", "on")
    return bool(v)


def _parse_rule(raw: dict, base_dir: str, target: str) -> AppRule:
    table = str(raw.get("table") or "").strip()
    if not table:
        raise ValueError("rule without table not allowed")
    rc = RuleConfig(
        table=table,
        primary_keys=TABLE_PKS.get(table, ("repo", "path")),
        include_columns=raw.get("include_columns"),
        exclude_columns=raw.get("exclude_columns"),
        column_mappings=raw.get("column_mappings"),
        default_column_values=raw.get("default_column_values"),
        column_lower_case=_bool(raw.get("column_lower_case", False)),
        column_upper_case=_bool(raw.get("column_upper_case", False)),
        column_underscore_to_camel=_bool(
            raw.get("column_underscore_to_camel", False)
        ),
        value_encoder=str(raw.get("value_encoder") or "json"),  # rule.go:215-217
        value_formatter=str(raw.get("value_formatter") or ""),
        datetime_formatter=str(raw.get("datetime_formatter") or ""),
        date_formatter=str(raw.get("date_formatter") or ""),
        reserve_raw_data=_bool(raw.get("reserve_raw_data", False)),
    )
    # ES es_mappings also feed column renames (rule.go:349-370: the
    # Padding wrap name comes from the mapping's field)
    es_mappings = tuple(raw.get("es_mappings") or ())
    if target == "elasticsearch" and es_mappings:
        extra = {
            str(m["column"]): str(m["field"])
            for m in es_mappings
            if m.get("column") and m.get("field")
        }
        base = rc.column_mappings
        joined = ",".join(f"{k}={v}" for k, v in extra.items())
        if isinstance(base, dict):
            rc = replace(rc, column_mappings={**base, **extra})
        else:
            rc = replace(
                rc, column_mappings=f"{base},{joined}" if base else joined
            )

    lua = str(raw.get("lua_script") or "")
    lua_path = str(raw.get("lua_file_path") or "")
    if not lua and lua_path:
        p = lua_path if os.path.isabs(lua_path) else os.path.join(base_dir, lua_path)
        with open(p) as fh:  # rule.go:621-640 reads the file at compile
            lua = fh.read()

    redis_cfg = None
    if target == "redis" and not lua:  # initRedisConfig skips Lua rules
        structure = str(raw.get("redis_structure") or "").strip().lower()
        if not structure:
            raise ValueError(
                "empty redis_structure not allowed in rule"
            )  # rule.go:463-465
        if structure not in ("string", "hash", "list", "set", "sortedset"):
            raise ValueError(
                "redis_structure must be string or hash or list or set"
            )  # rule.go:525-527
        redis_cfg = RedisConfig(
            structure=structure,
            key_prefix=str(raw.get("redis_key_prefix") or ""),
            key_value=str(raw.get("redis_key_value") or ""),
            key_column=str(raw.get("redis_key_column") or ""),
            key_formatter=str(raw.get("redis_key_formatter") or ""),
            hash_field_prefix=str(raw.get("redis_hash_field_prefix") or ""),
            hash_field_column=str(raw.get("redis_hash_field_column") or ""),
            sorted_set_score_column=str(
                raw.get("redis_sorted_set_score_column") or ""
            ),
        )

    return AppRule(
        rule_config=rc,
        schema=str(raw.get("schema") or ""),
        order_by_column=str(raw.get("order_by_column") or ""),
        lua_script=lua,
        redis=redis_cfg,
        mongodb_database=str(raw.get("mongodb_database") or ""),
        mongodb_collection=str(raw.get("mongodb_collection") or ""),
        es_index=str(raw.get("es_index") or ""),
        es_type=str(raw.get("es_type") or "_doc"),
        es_mappings=es_mappings,
        kafka_topic=str(raw.get("kafka_topic") or ""),
        rocketmq_topic=str(raw.get("rocketmq_topic") or ""),
        rabbitmq_queue=str(raw.get("rabbitmq_queue") or ""),
    )


def load_app(src: str, *, base_dir: "str | None" = None) -> AppConfig:
    """Parse an app.yml document (path or YAML text) with the reference's
    defaults and validation."""
    import yaml

    if os.path.exists(src):
        base_dir = base_dir or os.path.dirname(os.path.abspath(src))
        with open(src) as fh:
            doc = yaml.safe_load(fh)
    else:
        base_dir = base_dir or "."
        doc = yaml.safe_load(src)
    if not isinstance(doc, dict):
        raise ValueError("config must be a YAML mapping")

    target = str(doc.get("target") or "").strip().lower()
    if not target:
        raise ValueError("empty target not allowed")  # config.go:199-201
    if target not in TARGETS:
        raise ValueError(
            f"unknown target {target!r} (supported: {', '.join(TARGETS)})"
        )  # config.go:162-196 switch default

    es_version = int(doc.get("es_version") or _DEF_ES_VERSION)
    if es_version not in (6, 7):  # config.go:387-389
        raise ValueError("es_version must be 6 or 7")

    raw_rules = doc.get("rule") or []
    if not raw_rules:
        raise ValueError("empty rule not allowed")
    rules = [_parse_rule(r, base_dir, target) for r in raw_rules]

    data_dir = str(doc.get("data_dir") or "")
    logger = doc.get("logger") or {}
    logger_store = (
        str(logger.get("store") or "") if isinstance(logger, dict) else ""
    )
    if not logger_store and data_dir:
        logger_store = os.path.join(data_dir, "log")

    return AppConfig(
        target=target,
        rules=rules,
        es_version=es_version,
        bulk_size=int(doc.get("bulk_size") or _DEF_BULK_SIZE),
        flush_bulk_interval=int(
            doc.get("flush_bulk_interval") or _DEF_FLUSH_INTERVAL
        ),
        maxprocs=int(doc.get("maxprocs") or 0),
        data_dir=data_dir,
        enable_exporter=_bool(doc.get("enable_exporter", False)),
        exporter_port=int(doc.get("exporter_addr") or _DEF_EXPORTER_PORT),
        enable_web_admin=_bool(doc.get("enable_web_admin", False)),
        web_admin_port=int(doc.get("web_admin_port") or _DEF_WEB_ADMIN_PORT),
        skip_no_pk_table=_bool(doc.get("skip_no_pk_table", False)),
        logger_store=logger_store,
    )


def setup_logging(cfg: AppConfig) -> "str | None":
    """Wire the stdlib root logger to the configured log file
    (util/logs setup the reference performs from LoggerConfig at
    startup).  Returns the log path, or None when no store is
    configured (console logging, the reference's default)."""
    import logging

    if not cfg.logger_store:
        return None
    os.makedirs(cfg.logger_store, exist_ok=True)
    path = os.path.join(cfg.logger_store, "app.log")
    handler = logging.FileHandler(path, encoding="utf-8")
    handler.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)s %(name)s %(message)s")
    )
    logging.getLogger().addHandler(handler)
    return path


# ---------------------------------------------------------------------------
# dispatch


def _table_specs(table: str, ddl_events: "list[dict]"):
    """ColumnSpecs for one stream table: the flagship table evolves via
    in-band DDL; secondary tables carry their base columns."""
    from .functions.coerce import ColumnSpec
    from .pipelines.cdc import _stream_specs

    if table == TABLE_NAME:
        return _stream_specs(ddl_events)
    return [ColumnSpec(c) for c in TABLE_COLUMNS[table]]


def _decoded(events_dir: str, table: str, *, keep_before: bool,
             facts: "dict | None" = None):
    """Per-table decoded change stream (Decoder stage, arity-guarded).

    ``facts``: pre-computed ``cdc.stream_facts(events_dir)`` — run_app
    threads one result into every per-table pipeline so the parquet
    footers and the pruned DDL read are scanned once per run, not once
    per matched table."""
    import ray.data

    from .pipelines.cdc import (
        _ddl_columns,
        event_files,
        stream_facts,
    )
    from .stages.decode import Decoder

    facts = facts if facts is not None else stream_facts(events_dir)
    ddl_events = sorted(facts["ddl_events"], key=lambda d: d["gtid"])
    ds = ray.data.read_parquet(event_files(events_dir))
    ds = ds.map_batches(
        Decoder(
            table=table,
            ddl_gtid=(
                ([d["gtid"] for d in ddl_events] or None)
                if table == TABLE_NAME
                else None
            ),
            ddl_columns=_ddl_columns(ddl_events) if table == TABLE_NAME else (),
            keep_before=keep_before,
        ),
        batch_format="pyarrow",
    )
    return ds, ddl_events


class _RedisValueEncoder:
    """Actor stage: append the encoded row value (endpoint.go:221-257 —
    the reference's redis val is the encoder/formatter output over the
    projected row map); for member-keyed structures also encodes the
    BEFORE image so updates can emit remove-old-then-add
    (redis.go:254-267)."""

    def __init__(self, rule_config: RuleConfig, specs, want_old: bool):
        from .rules import RulePlan

        self.plan = RulePlan(rule_config, specs)
        self.want_old = want_old

    def _encode(self, batch: pa.Table) -> pa.Array:
        projected = self.plan.apply(batch)
        return self.plan.encode_values(projected)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = batch.append_column("val", self._encode(batch))
        if self.want_old and "before" in batch.column_names:
            before = batch.column("before")
            names = {c.name for c in self.plan.columns}
            flat = pa.table(
                {
                    f.name: pc.struct_field(before, f.name)
                    for f in before.type
                    if f.name in names
                }
            )
            out = out.append_column("old_val", self._encode(flat))
        if "before" in out.column_names:
            out = out.drop_columns(["before"])
        return out


class _EsBulkEncoder:
    """Actor stage: change rows → bulk-API NDJSON frames for one ES
    rule — the bytes elastic6.go:293-300 / the ES7 typeless path append
    per row (insert → index+doc, update → update+{"doc":...}, delete →
    metadata only), with the rule plan compiled once per worker."""

    def __init__(self, rule_config: RuleConfig, specs, index: str,
                 es_type: str, include_type: bool):
        from .rules import RulePlan

        self.plan = RulePlan(rule_config, specs)
        self.index = index
        self.es_type = es_type
        self.include_type = include_type

    def __call__(self, t: pa.Table) -> pa.Table:
        from .functions.es_mapping import es6_bulk_ops
        from .functions.wire import es_bulk_ndjson

        ops = es6_bulk_ops(
            self.plan, t, index=self.index, es_type=self.es_type
        )
        # per-row action from the change op (prepareBulk switches on
        # RowRequest.Action, elastic6.go:293-300)
        ops = ops.set_column(
            ops.schema.get_field_index("action"), "action", t.column("op")
        )
        nd = es_bulk_ndjson(ops, include_type=self.include_type)
        return pa.table(
            {
                "gtid": t.column("gtid"),
                "seq_in_txn": t.column("seq_in_txn"),
                "ndjson": nd.column("ndjson"),
            }
        )


class _LuaScriptExec:
    """Actor stage for the script target: per-row Lua execution
    (script.go:48-68 runs DoScript for side effects); emits the decoded
    raw ___RET___ entries as the inspectable artifact."""

    def __init__(self, script: str, payload_cols: "tuple[str, ...]"):
        from .functions.lua_shim import LuaScriptRunner

        self.runner = LuaScriptRunner(script)
        self.payload_cols = payload_cols

    def __call__(self, t: pa.Table) -> pa.Table:
        import json as _json

        ops = t.column("op").to_pylist()
        gtid = t.column("gtid").to_pylist()
        seq = t.column("seq_in_txn").to_pylist()
        rows = t.select(
            [c for c in self.payload_cols if c in t.column_names]
        ).to_pylist()
        out_g, out_s, out_a, out_ret = [], [], [], []
        for g, s, act, row in zip(gtid, seq, ops, rows):
            ret = self.runner.execute(row, None, act, id_seed=f"{g}:{s}")
            out_g.append(g)
            out_s.append(s)
            out_a.append(act)
            out_ret.append(_json.dumps(ret["ret"], sort_keys=True, default=str))
        return pa.table(
            {
                "gtid": pa.array(out_g, pa.int64()),
                "seq_in_txn": pa.array(out_s, pa.int32()),
                "action": pa.array(out_a, pa.string()),
                "ret": pa.array(out_ret, pa.string()),
            }
        )


def run_app(
    app: AppConfig,
    events_dir: str,
    out_dir: str,
    *,
    num_partitions: int = 16,
) -> dict:
    """Run one synced batch of the configured pipeline over an event
    stream — the engine analogue of the reference's incremental sync run
    (service.StartUp, transfer_service.go:136-149).  Returns per-table
    result metadata; all outputs land under ``out_dir``."""
    from .pipelines import cdc
    from .state.manifest import atomic_write_parquet_dir

    tables = cdc._stream_tables(events_dir)
    # literal rule names register unconditionally (the reference fails on
    # GetTable for unknown tables, transfer_service.go:249-262); here the
    # stream defines what exists, so restrict to its tables
    matched = {t: r for t, r in app.expand(tables).items() if t in tables}
    # PK guard (transfer_service.go:253-257): keyed sinks need a primary
    # key; a PK-less table fails startup unless skip_no_pk_table is set,
    # in which case it is dropped with a warning (the reference logs one)
    for tbl in list(matched):
        if not TABLE_PKS.get(tbl, ()):
            if not app.skip_no_pk_table:
                raise ValueError(f"{tbl} must have a PK for a column")
            import logging

            logging.getLogger(__name__).warning(
                "skip_no_pk_table: skipping %s (no primary key)", tbl
            )
            del matched[tbl]
    if not matched:
        raise ValueError(
            f"no rule matches stream tables {tables} "
            f"(rules: {[r.rule_config.table for r in app.rules]})"
        )
    os.makedirs(out_dir, exist_ok=True)
    results: dict = {"target": app.target, "tables": {}}

    if app.target in ("mongodb", "elasticsearch"):
        # upsert-by-key sinks → the keyed LWW lake (K2/K3 semantics)
        if list(matched) == [TABLE_NAME]:
            m = cdc.replay(
                events_dir,
                os.path.join(out_dir, "lake"),
                num_partitions=num_partitions,
                rule_config=matched[TABLE_NAME].rule_config,
            )
            results["tables"][TABLE_NAME] = m
        else:
            m = cdc.replay_multi(
                events_dir,
                os.path.join(out_dir, "lake"),
                rules={t: r.rule_config for t, r in matched.items()},
                num_partitions=num_partitions,
            )
            results["tables"] = m
        if app.enable_web_admin:
            # the reference serves its admin alongside the sync
            # (web.Start, router.go:23-62); port=0 → ephemeral.  The
            # caller owns the handle (cmd_run blocks on it; tests close).
            from .web_admin import AdminServer

            srv = AdminServer(
                os.path.join(out_dir, "lake"),
                port=app.web_admin_port if app.web_admin_port > 0 else 0,
                destination=app.target,
            ).start()
            results["admin_url"] = f"http://127.0.0.1:{srv.port}"
            results["_admin_server"] = srv
        return results

    # one footer/DDL scan per run, shared by every per-table pipeline
    # below (the keyed-sink branch above replays via cdc.replay*, which
    # owns its own facts — computing them up front would double the scan)
    facts = cdc.stream_facts(events_dir)

    if app.target in ("kafka", "rocketmq", "rabbitmq"):
        from .pipelines.message_sink import message_stream

        for tbl, r in matched.items():
            topic = r.topic_for(app.target, tbl)
            ds = message_stream(events_dir, r.rule_config, table=tbl,
                                facts=facts)
            path = atomic_write_parquet_dir(
                ds, os.path.join(out_dir, f"topic={topic}")
            )
            results["tables"][tbl] = {"topic": topic, "path": path}
        return results

    if app.target == "redis":
        from .pipelines.lua_rules import lua_redis_state
        from .stages.redis_state import RedisPlan, list_state, structure_state

        for tbl, r in matched.items():
            if r.lua_script:
                ds, _ = _decoded(events_dir, tbl, keep_before=True,
                                 facts=facts)
                state = lua_redis_state(
                    ds,
                    r.lua_script,
                    payload_cols=tuple(TABLE_COLUMNS[tbl]),
                    num_partitions=num_partitions,
                )
            else:
                plan = RedisPlan(r.redis, TABLE_PKS.get(tbl, ("repo", "path")))
                # member/position-keyed structures replay updates as
                # remove-OLD-then-add (redis.go:239-267) — they need the
                # before image's encoded value
                want_old = r.redis.structure in ("set", "sortedset", "list")
                ds, ddl_events = _decoded(
                    events_dir, tbl, keep_before=want_old, facts=facts
                )
                ds = ds.map_batches(
                    _RedisValueEncoder,
                    fn_constructor_args=(
                        r.rule_config,
                        _table_specs(tbl, ddl_events),
                        want_old,
                    ),
                    concurrency=(1, 4),
                    batch_format="pyarrow",
                )
                if r.redis.structure == "list":
                    state = list_state(
                        ds, plan, value_col="val", old_value_col="old_val",
                        num_partitions=num_partitions,
                    )
                else:
                    state = structure_state(
                        ds, plan, value_col="val",
                        old_value_col="old_val" if want_old else None,
                        num_partitions=num_partitions,
                    )
            path = atomic_write_parquet_dir(
                state, os.path.join(out_dir, f"redis={tbl}")
            )
            results["tables"][tbl] = {"path": path}
        return results

    # script target: execute the Lua per row, artifact = decoded RETs
    for tbl, r in matched.items():
        if not r.lua_script:
            raise ValueError(
                "target=script requires lua_script/lua_file_path in every rule"
            )  # the script endpoint is Lua-only (script.go:48-68)
        ds, _ = _decoded(events_dir, tbl, keep_before=False, facts=facts)
        ds = ds.map_batches(
            _LuaScriptExec,
            fn_constructor_args=(r.lua_script, tuple(TABLE_COLUMNS[tbl])),
            concurrency=(1, 4),
            batch_format="pyarrow",
        )
        path = atomic_write_parquet_dir(
            ds, os.path.join(out_dir, f"script={tbl}")
        )
        results["tables"][tbl] = {"path": path}
    return results


def run_app_live(
    app: AppConfig,
    events_dir: str,
    address: "tuple[str, int]",
    *,
    position_dir: str,
    batch_size: int = 2048,
    pos_save_every: int = 4,
    ping_interval: float = 1.0,
    max_pings: int = 600,
    follow: bool = False,
    poll_interval: float = 1.0,
    idle_polls: int = 3,
    sleep=None,
) -> dict:
    """target=redis|elasticsearch LIVE mode — the reference's actual
    daemon loop.

    Instead of materializing the converged state relation (``run_app``),
    deliver the EXACT wire frames of every configured rule to a real
    socket at ``address`` — RESP v2 pipelines for redis
    (redis.go:225-269), bulk-API NDJSON POSTs for elasticsearch
    (elastic6.go:293-310 / elastic7.go bulk path; es_version picks the
    typed vs typeless action line) — through ``LiveSinkLoop``: consume
    error → pause → ping → resume from the per-table position file
    under ``position_dir`` (service/handler.go:173-181,
    transfer_service.go:328-354).  Loopback sinks for both protocols
    live in ``functions.loopback``.

    ``follow=True`` is the daemon shape: after draining the stream the
    loop polls ``events_dir`` every ``poll_interval`` seconds for NEW
    event shards (the binlog the reference tails forever, main.go's
    blocking transfer service) and delivers only the tail past each
    table's saved position — new tables, new DDLs and new shards are
    picked up per pass because facts/rules are re-expanded from the
    directory each time.  It returns after ``idle_polls`` consecutive
    empty passes (a test/sandbox bound; a real daemon would pass a
    large value and be killed by signal).

    Tables run one loop each with independent positions — per-key
    ordering (the only ordering the keyed commands/doc-ids need) is
    table-scoped, so per-table streams deliver the same final keyspace
    as the reference's single interleaved consumer.  Returns per-table
    LiveSinkLoop metrics (summed across passes in follow mode)."""
    import pyarrow.compute as pc

    from .functions.loopback import SinkError
    from .functions.wire import redis_resp_stream
    from .pipelines import cdc
    from .pipelines.live_sink import (
        FilePositionStore,
        HttpBulkEndpoint,
        LiveSinkLoop,
        RespEndpoint,
        frame_stream,
    )
    from .stages.redis_state import RedisPlan

    if app.target not in ("redis", "elasticsearch"):
        raise ValueError(
            "live mode drives the socket sinks (redis, elasticsearch); "
            f"target={app.target!r} replays via run_app"
        )
    os.makedirs(position_dir, exist_ok=True)
    results: dict = {"target": f"{app.target}-live", "tables": {}}

    def _deliver_pass() -> dict:
        """One full delivery pass over the CURRENT contents of
        events_dir: rules re-expanded, facts re-scanned (new shards /
        DDLs / tables since the last pass are all visible), each table
        resumed from its position file."""
        tables = cdc._stream_tables(events_dir)
        matched = {t: r for t, r in app.expand(tables).items() if t in tables}
        if not matched:
            raise ValueError(f"no rule matches stream tables {tables}")
        facts = cdc.stream_facts(events_dir)
        pass_metrics: dict = {}

        for tbl, r in matched.items():
            if r.lua_script:
                raise ValueError(
                    "live mode covers the rule path; Lua rules replay via "
                    "run_app (their RET protocol is stated there)"
                )
            store = FilePositionStore(
                os.path.join(position_dir, f"{tbl}.json")
            )
            saved = store.load()
            if facts["watermark"] <= saved:
                # idle-poll fast path: the footer-stats watermark (already
                # scanned for this pass) proves nothing exists past the
                # saved position — skip the full read/decode/actor-pool
                # pipeline entirely (a daemon polls every second; O(full
                # history) work per empty poll would be wrong at scale)
                pass_metrics[tbl] = {
                    "batches_delivered": 0, "frames_delivered": 0,
                    "consume_errors": 0, "pings_failed": 0,
                    "reconnects": 0, "position_saves": 0,
                    "position": saved,
                }
                continue
            if app.target == "redis":
                plan = RedisPlan(r.redis, TABLE_PKS.get(tbl, ("repo", "path")))
                want_old = r.redis.structure in ("set", "sortedset", "list")
                encoder_cls: type = _RedisValueEncoder
                frame_col = "resp"
                endpoint = RespEndpoint(address)

                def frames(t: pa.Table, plan=plan, want_old=want_old) -> pa.Table:
                    return redis_resp_stream(
                        plan, t, value_col="val",
                        old_value_col="old_val" if want_old else None,
                        seq_col="seq_in_txn",
                    )

                def encoder_args(specs, r=r, want_old=want_old):
                    return (r.rule_config, specs, want_old)
            else:
                want_old = False
                encoder_cls = _EsBulkEncoder
                frame_col = "ndjson"
                endpoint = HttpBulkEndpoint(address)
                frames = None

                def encoder_args(specs, r=r, tbl=tbl, es_version=app.es_version):
                    return (
                        r.rule_config, specs, r.es_index or tbl, r.es_type,
                        es_version == 6,
                    )
            specs_cache: dict = {}

            def dataset_fn(from_gtid: int, tbl=tbl, want_old=want_old,
                           encoder_cls=encoder_cls, encoder_args=encoder_args,
                           frames=frames, specs_cache=specs_cache, facts=facts):
                ds, ddl_events = _decoded(
                    events_dir, tbl, keep_before=want_old, facts=facts
                )
                specs_cache.setdefault("s", _table_specs(tbl, ddl_events))

                def prune(t: pa.Table) -> pa.Table:
                    return t.filter(pc.greater(t.column("gtid"), from_gtid))

                ds = ds.map_batches(prune, batch_format="pyarrow")
                ds = ds.map_batches(
                    encoder_cls,
                    fn_constructor_args=encoder_args(specs_cache["s"]),
                    concurrency=(1, 4),
                    batch_format="pyarrow",
                )
                if frames is not None:
                    ds = ds.map_batches(frames, batch_format="pyarrow")
                return ds

            loop = LiveSinkLoop(
                endpoint,
                store,
                pos_save_every=pos_save_every,
                ping_interval=ping_interval,
                max_pings=max_pings,
                # an injected sleep (tests/embedders faking time) must
                # govern the recovery pings too, not only the poll loop
                **({"sleep": sleep} if sleep is not None else {}),
            )
            pass_metrics[tbl] = loop.run(
                frame_stream(
                    dataset_fn, frame_col=frame_col, seq_col="seq_in_txn",
                    batch_size=batch_size,
                    # a follow pass's stream end is just "shards landed so
                    # far" — a producer rolling files mid-transaction may
                    # still owe the trailing gtid rows, so checkpoint only
                    # COMPLETE transactions and redeliver the open one
                    # whole next pass (live_sink.frame_stream docstring)
                    final_tail=not follow,
                )
            )
        return pass_metrics

    def _fold(into: dict, pass_metrics: dict):
        for tbl, m in pass_metrics.items():
            agg = into.setdefault(tbl, {})
            for k, v in m.items():
                agg[k] = v if k == "position" else agg.get(k, 0) + v

    def _dir_sig() -> tuple:
        """Cheap change detector: (name, size, mtime) of every shard.
        Computed BEFORE a pass, so a file landing mid-pass flips the
        next poll's signature and forces a real pass — conservative."""
        return tuple(
            sorted(
                (e.name, e.stat().st_size, e.stat().st_mtime_ns)
                for e in os.scandir(events_dir)
                if e.name.endswith(".parquet")
            )
        )

    sig = _dir_sig()
    _fold(results["tables"], _deliver_pass())
    if not follow:
        return results

    import time as _time

    _sleep = sleep if sleep is not None else _time.sleep
    passes, idle, transient = 1, 0, 0
    while idle < idle_polls:
        _sleep(poll_interval)
        new_sig = _dir_sig()
        if new_sig == sig:
            # nothing landed since the signature was taken: don't even
            # fan out the footer scan (a daemon polls every second; at
            # 10^4 shards that scan is itself the idle-poll cost center)
            idle += 1
            passes += 1
            continue
        sig = new_sig
        try:
            pm = _deliver_pass()
        except SinkError:
            raise  # sink exhaustion is LiveSinkLoop's terminal signal
        except Exception:
            # a growing dir can hand a poll a shard mid-write (the
            # producer's append is not atomic): treat the pass as idle
            # and retry next poll instead of killing the daemon; counted
            # toward idle_polls so a permanently corrupt file still
            # terminates the loop
            transient += 1
            idle += 1
            passes += 1
            continue
        passes += 1
        delivered = sum(m["frames_delivered"] for m in pm.values())
        idle = 0 if delivered else idle + 1
        _fold(results["tables"], pm)
    results["passes"] = passes
    if transient:
        results["transient_errors"] = transient
    return results
