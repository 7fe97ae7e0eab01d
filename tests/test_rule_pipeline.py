"""Rule engine + UDF integrated into the replay pipeline, vs oracle."""

import json

import pyarrow.compute as pc

from go_mysql_transfer_ray import oracle
from go_mysql_transfer_ray.pipelines import cdc, message_sink
from go_mysql_transfer_ray.rules import RuleConfig
from go_mysql_transfer_ray.sources.binlog import BinlogConfig, generate, materialize_events

CFG = BinlogConfig(num_keys=250, avg_events_per_key=4.0, delete_pct=15)


def oracle_rule_rows(state: dict, transform) -> dict:
    """Apply a row-wise transform to the oracle's final state."""
    out = {}
    for k, row in state.items():
        r = transform(dict(row))
        if r is not None:
            out[k] = r
    return out


def engine_rows(table, key_of) -> dict:
    return {key_of(r): r for r in table.to_pylist()}


def run(tmp_path, **replay_kw):
    events_dir = materialize_events(CFG, root=str(tmp_path / "ev"), shards=4)
    out = str(tmp_path / "lake")
    cdc.replay(events_dir, out, num_partitions=8, **replay_kw)
    return cdc.lake_table(out), events_dir


def test_rule_projection_rename_defaults(tmp_path):
    rule = RuleConfig(
        include_columns="repo,path,content",
        column_mappings="content=body",
        default_column_values="source=binlog",
    )
    engine, _ = run(tmp_path, rule_config=rule)
    assert engine.column_names == ["repo", "path", "body", "source"]

    ora = oracle.replay_full(generate(CFG).table)

    def tf(row):
        return {
            "repo": row["repo"],
            "path": row["path"],
            "body": row["content"],
            "source": "binlog",
        }

    expected = oracle_rule_rows(ora, tf)
    got = engine_rows(engine, lambda r: r["repo"] + r["path"])
    assert got == {oracle.composite_key(v["repo"], v["path"]): v for v in expected.values()}


def test_rule_camel_case_policy(tmp_path):
    rule = RuleConfig(column_underscore_to_camel=True, exclude_columns="stars")
    engine, _ = run(tmp_path, rule_config=rule)
    assert engine.column_names == ["repo", "path", "commit", "lang", "content"]


def test_udf_filter_keeps_prior_state(tmp_path):
    """A UDF that drops markdown rows per EVENT: the sink simply never sees
    them, so a key whose last event is filtered keeps its previous visible
    state — the reference's Lua-filter semantics (events skipped, not
    tombstoned)."""

    def udf(row, old, action, ctx):
        if row["lang"] == "markdown":
            return None
        return row

    engine, _ = run(tmp_path, rule_config=RuleConfig(), udf=udf)
    assert "markdown" not in set(engine.column("lang").to_pylist())

    # oracle: apply the same filter per event during sequential replay
    ev = generate(CFG).table
    langs = [
        (a or {}).get("lang") for a in ev.column("after").to_pylist()
    ]
    import numpy as np

    keep = pc.or_(
        pc.equal(ev.column("op"), "delete"),
        pc.not_equal(
            pc.fill_null(pc.struct_field(ev.column("after"), "lang"), ""),
            "markdown",
        ),
    )
    # filtering update/insert events for markdown rows; deletes stay
    filtered = ev.filter(keep)
    ora = oracle.replay_full(filtered)
    ora = {k: v for k, v in ora.items() if v["lang"] != "markdown"}
    eng = engine_rows(engine, lambda r: r["repo"] + r["path"])
    assert set(eng) == set(ora)
    for k in ora:
        assert eng[k]["commit"] == ora[k]["commit"]


def test_udf_lookup_enrichment(tmp_path):
    lookup = {"python": "dynamic", "go": "static", "rust": "static"}

    def udf(row, old, action, ctx):
        row = dict(row)
        row["typing"] = ctx.lookup.get(row["lang"], "unknown")
        return row

    engine, _ = run(tmp_path, rule_config=RuleConfig(), udf=udf, lookup=lookup)
    assert "typing" in engine.column_names
    got = dict(zip(engine.column("lang").to_pylist(), engine.column("typing").to_pylist()))
    assert got["python"] == "dynamic" and got["go"] == "static"


def test_message_sink_envelope(tmp_path):
    events_dir = materialize_events(CFG, root=str(tmp_path / "ev"), shards=4)
    rule = RuleConfig(include_columns="repo,path,lang", reserve_raw_data=True)
    msgs = message_sink.message_stream(events_dir, rule).take_all()
    ev = generate(CFG).table
    n_events = ev.num_rows - 1  # minus the DDL row
    assert len(msgs) == n_events

    by_action = {}
    for m in msgs:
        env = json.loads(m["value"])
        by_action.setdefault(env["action"], env)
        assert set(env).issubset({"action", "timestamp", "raw", "date"})
        assert isinstance(env["date"], dict)
        assert set(env["date"]) == {"repo", "path", "lang"}
        # struct field order parity: action, timestamp, [raw], date
        keys = list(json.loads(m["value"]).keys())
        assert keys[0] == "action" and keys[-1] == "date"
        if env["action"] == "update":
            assert "raw" in env and set(env["raw"]) == {"repo", "path", "lang"}
        else:
            assert "raw" not in env
    assert {"insert", "update", "delete"} <= set(by_action)


def test_message_sink_kv_encoder(tmp_path):
    events_dir = materialize_events(CFG, root=str(tmp_path / "ev"), shards=4)
    rule = RuleConfig(include_columns="repo,lang", value_encoder="kv-commas")
    msgs = message_sink.message_stream(events_dir, rule).take(5)
    for m in msgs:
        env = json.loads(m["value"])
        date = env["date"]
        assert isinstance(date, str) and date.startswith("repo=")
        assert ",lang=" in date


def test_udf_upsert_on_delete_keeps_row(tmp_path):
    """A UDF emitting SinkOp(action='upsert') for a DELETE event must
    write the row, not tombstone it (Lua mongo upsert analogue,
    /root/reference/service/luaengine/mongo_actuator.go:77-91)."""
    from go_mysql_transfer_ray.stages.rule_engine import SinkOp

    cfg = BinlogConfig(num_keys=60, avg_events_per_key=4.0, delete_pct=40)
    events_dir = materialize_events(cfg, root=str(tmp_path / "ev"), shards=2)

    def udf(row, old, act, ctx):
        if act == "delete":
            return [SinkOp(action="upsert", key=None, row={**row, "lang": "tomb"})]
        return row

    out = str(tmp_path / "lake")
    cdc.replay(
        events_dir, out, num_partitions=8,
        rule_config=RuleConfig(reserve_raw_data=True), udf=udf,
    )
    engine = cdc.lake_table(out)
    ora = oracle.replay_full(generate(cfg).table)
    # every key ever seen must be present: deleted keys as 'tomb' rows
    langs = {r["repo"] + r["path"]: r["lang"] for r in engine.to_pylist()}
    deleted = set(langs) - set(ora)
    assert deleted, "fixture should contain finally-deleted keys"
    assert all(langs[k] == "tomb" for k in deleted)
    assert set(ora) <= set(langs)


def test_udf_http_enrichment(tmp_path):
    """T5 httpOps: UDF enriches rows through the injectable HTTP surface
    (stubbed transport, real API shape — http_actuator.go:33-156)."""
    from go_mysql_transfer_ray.functions.http_stub import StubHttpClient
    from go_mysql_transfer_ray.stages.rule_engine import RuleEngine
    from go_mysql_transfer_ray.functions.coerce import ColumnSpec
    import pyarrow as pa

    client = StubHttpClient(routes={"https://api/langs/go": "Golang"})
    eng = RuleEngine(
        RuleConfig(include_columns="repo,lang", primary_keys=("repo",)),
        [ColumnSpec("repo", "string"), ColumnSpec("lang", "string")],
        udf=lambda row, old, act, ctx: {
            **row,
            "lang_full": ctx.http.get(f"https://api/langs/{row['lang']}")["body"],
        },
        http_client=client,
    )
    out = eng(pa.table({"repo": ["r1"], "lang": ["go"], "op": ["insert"]}))
    assert out.column("lang_full").to_pylist() == ["Golang"]
    assert client.calls[0]["url"] == "https://api/langs/go"
    # unknown route → 404 with empty body, like a real failed enrichment
    miss = eng.ctx.http.get("https://api/langs/unknown")
    assert miss == {"status_code": 404, "body": ""}


def test_udf_dbops_lookup_join(tmp_path):
    """T4 dbOps: selectOne/select against broadcast dimension tables —
    the per-row SQL lookup (db_actuator.go:39-124) as a local dict probe."""
    from go_mysql_transfer_ray.functions.coerce import ColumnSpec
    from go_mysql_transfer_ray.stages.rule_engine import RuleEngine
    import pyarrow as pa
    import ray

    dims = {"langs": {"go": {"name": "Golang", "year": 2009},
                      "rust": {"name": "Rust", "year": 2015}}}
    ref = ray.put(dims)

    def udf(row, old, act, ctx):
        hit = ctx.db.select_one("langs", row["lang"])
        return {**row, "lang_name": hit["name"] if hit else "?"}

    eng = RuleEngine(
        RuleConfig(include_columns="repo,lang", primary_keys=("repo",)),
        [ColumnSpec("repo", "string"), ColumnSpec("lang", "string")],
        udf=udf, lookup_ref=ref,
    )
    out = eng(pa.table({"repo": ["a", "b"], "lang": ["go", "c"],
                        "op": ["insert", "insert"]}))
    assert out.column("lang_name").to_pylist() == ["Golang", "?"]
    # predicate select
    assert len(eng.ctx.db.select("langs", lambda r: r["year"] > 2010)) == 1


def test_rule_concurrency_int_caps_task_pool(tmp_path):
    # an int rule_concurrency must still be honored on the no-UDF
    # task-pool path (caps concurrent tasks) — same converged output
    rule = RuleConfig(include_columns="repo,path,content")
    engine, _ = run(tmp_path, rule_config=rule, rule_concurrency=2)
    assert engine.column_names == ["repo", "path", "content"]

    ora = oracle.replay_full(generate(CFG).table)
    assert engine.num_rows == len(ora)


def test_cached_engine_lru_evicts_oldest_only():
    # Alternating >MAX distinct plans must evict one-at-a-time (LRU), not
    # clear the whole cache — and a hit must refresh recency so a hot
    # plan survives a parade of cold ones (ADVICE r4).
    from go_mysql_transfer_ray.stages import rule_engine as re_mod

    re_mod._ENGINE_CACHE.clear()
    builds = []

    def make(k):
        return re_mod._cached_engine(k, lambda: builds.append(k) or object())

    hot = make("hot")
    for i in range(re_mod._ENGINE_CACHE_MAX * 2):
        make(f"cold{i}")
        assert make("hot") is hot  # refreshed on every touch, never evicted
        assert len(re_mod._ENGINE_CACHE) <= re_mod._ENGINE_CACHE_MAX
    assert builds.count("hot") == 1
    # oldest cold entries were evicted one at a time, newest retained
    assert f"cold{re_mod._ENGINE_CACHE_MAX * 2 - 1}" in re_mod._ENGINE_CACHE
    assert "cold0" not in re_mod._ENGINE_CACHE
    re_mod._ENGINE_CACHE.clear()


def test_rule_projection_pushdown_narrows_read_same_lake(tmp_path, monkeypatch):
    """A no-UDF projecting rule must narrow the parquet read to the
    consumed struct fields (round-4 verdict item 4: leaf-level pruning,
    the fat content column never leaves storage) — and converge to the
    same lake as the unpruned decode."""
    seen = {}
    orig = cdc._projected_event_schema

    def spy(events_dir, fields):
        s = orig(events_dir, fields)
        seen["fields"] = set(fields)
        seen["after"] = set(f.name for f in s.field("after").type)
        return s

    monkeypatch.setattr(cdc, "_projected_event_schema", spy)
    rule = RuleConfig(include_columns="repo,path,lang")
    engine, _ = run(tmp_path, rule_config=rule)
    # the read schema was narrowed to exactly the consumed payload set
    assert seen["fields"] == {"repo", "path", "lang"}
    assert seen["after"] == {"repo", "path", "lang"}  # no content/commit/stars

    ora = oracle.replay_full(generate(CFG).table)
    expected = oracle_rule_rows(
        ora, lambda r: {"repo": r["repo"], "path": r["path"], "lang": r["lang"]}
    )
    got = engine_rows(engine, lambda r: r["repo"] + r["path"])
    assert got == {
        oracle.composite_key(v["repo"], v["path"]): v for v in expected.values()
    }


def test_pushdown_keeps_table_pks_with_custom_rule_keys(tmp_path):
    """A rule keyed on a SUBSET of the table's PKs must not prune the
    other PK out of the read — decode builds the merge key from
    TABLE_PKS (repo,path) regardless of the rule's primary_keys, so
    ``path`` has to survive the projection even though the rule never
    outputs it."""
    rule = RuleConfig(primary_keys=("repo",), include_columns="repo,lang")
    engine, _ = run(tmp_path, rule_config=rule)
    assert engine.column_names == ["repo", "lang"]

    ora = oracle.replay_full(generate(CFG).table)
    expected = sorted(
        (r["repo"], r["lang"]) for r in ora.values()
    )
    got = sorted((r["repo"], r["lang"]) for r in engine.to_pylist())
    assert got == expected


def test_transform_with_rule_sees_full_row(tmp_path):
    """A ``transform`` callable is an opaque row consumer: combining it
    with a narrowing rule must NOT prune columns the transform reads
    (here the transform derives ``lang`` from ``content``, which the
    rule itself never consumes)."""

    def tf(t):
        lens = pc.cast(pc.binary_length(t.column("content")), "string")
        return t.set_column(
            t.schema.get_field_index("lang"), "lang", lens
        )

    rule = RuleConfig(include_columns="repo,path,lang")
    engine, _ = run(tmp_path, rule_config=rule, transform=tf)

    ora = oracle.replay_full(generate(CFG).table)
    expected = oracle_rule_rows(
        ora,
        lambda r: {
            "repo": r["repo"],
            "path": r["path"],
            "lang": str(len(r["content"])),
        },
    )
    got = engine_rows(engine, lambda r: r["repo"] + r["path"])
    assert got == {
        oracle.composite_key(v["repo"], v["path"]): v for v in expected.values()
    }


def test_full_width_rule_skips_pushdown(tmp_path, monkeypatch):
    """A rule consuming every column must not pay the narrowed-schema
    read path at all."""
    called = []
    monkeypatch.setattr(
        cdc, "_projected_event_schema",
        lambda *a: called.append(a) or (_ for _ in ()).throw(AssertionError),
    )
    rule = RuleConfig()  # identity projection: all columns consumed
    engine, _ = run(tmp_path, rule_config=rule)
    assert called == []
    assert engine.num_rows == len(oracle.replay_full(generate(CFG).table))


def test_stock_base_pads_renamed_ddl_column_with_right_type(tmp_path):
    """A rule that renames/case-transforms columns makes the merge see
    WRAPPED names; the stock base's null padding for a DDL-added column
    must use the DDL's coerced type under that wrapped name (a string
    pad against the rule stage's int64 STARS crashed the delta concat)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cfg = BinlogConfig(num_keys=120, avg_events_per_key=3.0, delete_pct=10,
                       ddl_at=0.4)
    events_dir = materialize_events(cfg, root=str(tmp_path / "ev"), shards=2)

    base_rows = {
        "repo": [f"base/r{i}" for i in range(10)],
        "path": [f"p{i}.py" for i in range(10)],
        "commit": ["c" * 40] * 10,
        "lang": ["python"] * 10,
        "content": [f"base {i}" for i in range(10)],
    }
    base_path = str(tmp_path / "base.parquet")
    pq.write_table(pa.table(base_rows), base_path)

    out = str(tmp_path / "lake")
    cdc.stock_import(base_path, out, num_partitions=8)
    rule = RuleConfig(column_upper_case=True)
    cdc.replay(events_dir, out, num_partitions=8, base_dir=out,
               rule_config=rule)
    lake = cdc.lake_table(out)
    assert "STARS" in lake.column_names
    assert pa.types.is_integer(lake.schema.field("STARS").type)
    # untouched base keys survive with a null (typed) STARS pad
    repos = set(lake.column("REPO").to_pylist())
    assert any(r.startswith("base/") for r in repos)
