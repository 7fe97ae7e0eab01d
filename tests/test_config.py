"""app.yml config surface: parse/validation parity + target dispatch."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from go_mysql_transfer_ray.config import AppConfig, load_app, run_app
from go_mysql_transfer_ray.pipelines import cdc
from go_mysql_transfer_ray.sources.binlog import BinlogConfig, materialize_events

ROOT = "/tmp/gmt_test_config"


@pytest.fixture(scope="module")
def events(ray_session):
    return materialize_events(
        BinlogConfig(num_keys=150, avg_events_per_key=3.0, delete_pct=10, seed=7),
        root=os.path.join(ROOT, "events"),
        shards=2,
    )


def _yaml(target: str, rule_body: str, extra: str = "") -> str:
    return f"target: {target}\n{extra}rule:\n  -\n    table: repos\n{rule_body}"


# -- parse / validation -------------------------------------------------


def test_defaults_match_reference():
    app = load_app(_yaml("redis", "    redis_structure: string\n"))
    assert app.bulk_size == 100            # config.go:231-233
    assert app.flush_bulk_interval == 200  # config.go:227-229
    assert app.es_version == 7             # config.go:383-385
    assert app.exporter_port == 9595
    assert app.web_admin_port == 8060
    assert app.rules[0].rule_config.value_encoder == "json"  # rule.go:215-217


def test_validation_errors():
    with pytest.raises(ValueError, match="empty target"):
        load_app("rule:\n  -\n    table: repos\n")
    with pytest.raises(ValueError, match="unknown target"):
        load_app("target: oracle\nrule:\n  -\n    table: repos\n")
    with pytest.raises(ValueError, match="empty rule"):
        load_app("target: redis\n")
    with pytest.raises(ValueError, match="es_version"):
        load_app(_yaml("elasticsearch", "", extra="es_version: 5\n"))
    with pytest.raises(ValueError, match="empty redis_structure"):
        load_app(_yaml("redis", "    redis_key_value: k\n"))
    with pytest.raises(ValueError, match="redis_structure must be"):
        load_app(_yaml("redis", "    redis_structure: bitmap\n"))
    with pytest.raises(ValueError, match="without table"):
        load_app("target: redis\nrule:\n  -\n    schema: eseap\n")


def test_es_mappings_feed_renames():
    # rule.go:349-370 — EsMappings' field names become the wrap names
    app = load_app(
        "target: elasticsearch\n"
        "rule:\n"
        "  -\n"
        "    table: repos\n"
        "    include_columns: repo,path,lang\n"
        "    es_mappings:\n"
        "      -\n"
        "        column: lang\n"
        "        field: language\n"
        "        type: keyword\n"
    )
    rc = app.rules[0].rule_config
    assert "lang=language" in rc.column_mappings


def test_lua_file_path_resolves_relative_to_config(tmp_path):
    script = 'local ops = require("redisOps")\nops.SET("k", "v")\n'
    (tmp_path / "rule.lua").write_text(script)
    cfg = tmp_path / "app.yml"
    cfg.write_text(
        "target: script\nrule:\n  -\n    table: repos\n"
        "    lua_file_path: rule.lua\n"
    )
    app = load_app(str(cfg))
    assert app.rules[0].lua_script == script


def test_wildcard_expansion_and_topic_default():
    app = load_app(
        "target: kafka\nrule:\n  -\n    table: repo.*\n"
    )
    matched = app.expand(["repos", "users"])
    assert list(matched) == ["repos"]
    assert matched["repos"].rule_config.primary_keys == ("repo", "path")
    # topic default = table name (kafka.go:83-121)
    assert matched["repos"].topic_for("kafka", "repos") == "repos"
    app2 = load_app(
        "target: kafka\nrule:\n  -\n    table: repos\n    kafka_topic: t_user\n"
    )
    assert app2.rules[0].topic_for("kafka", "repos") == "t_user"


def test_expand_no_match_raises(events):
    app = load_app(_yaml("redis", "    redis_structure: string\n"))
    app.rules[0].rule_config = type(app.rules[0].rule_config)(table="nosuch")
    with pytest.raises(ValueError, match="no rule matches"):
        run_app(app, events, os.path.join(ROOT, "nomatch"))


# -- dispatch ------------------------------------------------------------


def test_run_app_elasticsearch_lake(events):
    out = os.path.join(ROOT, "es")
    shutil.rmtree(out, ignore_errors=True)
    app = load_app(
        "target: elasticsearch\n"
        "rule:\n"
        "  -\n"
        "    table: repos\n"
        "    include_columns: repo,path,lang\n"
        "    es_mappings:\n"
        "      -\n"
        "        column: lang\n"
        "        field: language\n"
        "        type: keyword\n"
    )
    res = run_app(app, events, out, num_partitions=8)
    assert res["target"] == "elasticsearch"
    lake = cdc.lake_table(os.path.join(out, "lake"))
    assert set(lake.column_names) == {"repo", "path", "language"}
    assert lake.num_rows > 0


def test_run_app_kafka_envelopes(events):
    out = os.path.join(ROOT, "kafka")
    shutil.rmtree(out, ignore_errors=True)
    app = load_app(
        "target: kafka\nrule:\n  -\n    table: repos\n    kafka_topic: t_repo\n"
    )
    res = run_app(app, events, out, num_partitions=8)
    path = res["tables"]["repos"]["path"]
    assert path.endswith("topic=t_repo")
    t = pq.read_table(path)
    assert {"key", "action", "value"} <= set(t.column_names)
    env = json.loads(t.column("value")[0].as_py())
    assert set(env) <= {"action", "timestamp", "raw", "date"}


def test_run_app_redis_string_and_hash(events):
    out = os.path.join(ROOT, "redis_s")
    shutil.rmtree(out, ignore_errors=True)
    app = load_app(
        "target: redis\n"
        "rule:\n"
        "  -\n"
        "    table: repos\n"
        "    redis_structure: string\n"
        "    redis_key_prefix: 'r:'\n"
        "    redis_key_column: repo\n"
    )
    res = run_app(app, events, out, num_partitions=8)
    t = pq.read_table(res["tables"]["repos"]["path"])
    keys = t.column("redis_key").to_pylist()
    assert keys and all(k.startswith("r:") for k in keys)
    # encoded value is the rule's json encoding of the projected row
    assert t.column("value")[0].as_py().startswith("{")

    out = os.path.join(ROOT, "redis_h")
    shutil.rmtree(out, ignore_errors=True)
    app = load_app(
        "target: redis\n"
        "rule:\n"
        "  -\n"
        "    table: repos\n"
        "    redis_structure: hash\n"
        "    redis_key_value: repo_hash\n"
        "    redis_hash_field_prefix: 'f_'\n"
    )
    res = run_app(app, events, out, num_partitions=8)
    t = pq.read_table(res["tables"]["repos"]["path"])
    assert set(t.column("redis_key").to_pylist()) == {"repo_hash"}
    # field defaults to the separator-less PK concat (rule.go:486-494)
    # with the prefix applied last (redis.go:311-314)
    fields = t.column("field").to_pylist()
    assert fields and all(f.startswith("f_") for f in fields)


def test_run_app_script_executes_lua(events):
    out = os.path.join(ROOT, "script")
    shutil.rmtree(out, ignore_errors=True)
    app = load_app(
        "target: script\n"
        "rule:\n"
        "  -\n"
        "    table: repos\n"
        "    lua_script: |\n"
        '      local ops = require("scriptOps")\n'
        "      local row = ops.rawRow()\n"
        "      local act = ops.rawAction()\n"
        '      ___RET___[act .. "#" .. row["repo"] .. "/" .. row["path"]] = act\n'
    )
    res = run_app(app, events, out, num_partitions=8)
    t = pq.read_table(res["tables"]["repos"]["path"])
    assert t.num_rows > 0
    rets = [json.loads(r) for r in t.column("ret").to_pylist()[:20]]
    acts = t.column("action").to_pylist()[:20]
    for ret, act in zip(rets, acts):
        assert len(ret) == 1
        (k, v), = ret.items()
        assert k.startswith(act + "#") and v == act


def test_run_app_script_without_lua_raises(events):
    app = load_app(_yaml("script", "    include_columns: repo\n"))
    with pytest.raises(ValueError, match="requires lua_script"):
        run_app(app, events, os.path.join(ROOT, "script_bad"))


def test_run_app_redis_list_replay(events):
    out = os.path.join(ROOT, "redis_l")
    shutil.rmtree(out, ignore_errors=True)
    app = load_app(
        "target: redis\n"
        "rule:\n"
        "  -\n"
        "    table: repos\n"
        "    include_columns: repo,path,commit\n"
        "    redis_structure: list\n"
        "    redis_key_value: repo_list\n"
    )
    res = run_app(app, events, out, num_partitions=8)
    t = pq.read_table(res["tables"]["repos"]["path"])
    assert t.num_rows > 0
    assert set(t.column_names) == {"redis_key", "list_pos", "value"}
    # update = LREM old + RPUSH new; delete = LREM old (redis.go:239-252):
    # the surviving list must match the lake's live keys one-to-one —
    # each live (repo,path) contributes exactly its LAST encoded value
    lake_out = os.path.join(ROOT, "redis_l_lake")
    shutil.rmtree(lake_out, ignore_errors=True)
    from go_mysql_transfer_ray.rules import RuleConfig

    cdc.replay(events, lake_out, num_partitions=8,
               rule_config=RuleConfig(include_columns="repo,path,commit"))
    lake = cdc.lake_table(lake_out)
    assert t.num_rows == lake.num_rows
    import json as _json

    live = {(r["repo"], r["path"]): r["commit"] for r in lake.to_pylist()}
    for v in t.column("value").to_pylist():
        row = _json.loads(v)
        assert live[(row["repo"], row["path"])] == row["commit"]


def test_run_app_web_admin_serves_dashboard(events):
    import urllib.request

    out = os.path.join(ROOT, "admin")
    shutil.rmtree(out, ignore_errors=True)
    app = load_app(
        "target: mongodb\n"
        "enable_web_admin: true\n"
        "web_admin_port: 18317\n"
        "rule:\n  -\n    table: repos\n"
    )
    res = run_app(app, events, out, num_partitions=8)
    srv = res.pop("_admin_server")
    try:
        body = urllib.request.urlopen(res["admin_url"], timeout=5).read()
        state = json.loads(body)
        assert state["destState"] == 1  # endpoint alive (router.go:87-104)
    finally:
        srv.close()


@pytest.fixture(scope="module")
def multi_events(ray_session):
    from go_mysql_transfer_ray.sources.binlog import materialize_multi_events

    return materialize_multi_events(
        BinlogConfig(num_keys=120, avg_events_per_key=2.5, delete_pct=10, seed=3),
        BinlogConfig(num_keys=60, avg_events_per_key=2.0, delete_pct=10, seed=31),
        root=os.path.join(ROOT, "multi_events"),
        shards=2,
    )


def test_run_app_kafka_multi_table_decodes_both(multi_events):
    # regression: decode_batch once hardcoded the flagship columns/arity,
    # so a users rule silently produced an EMPTY topic
    out = os.path.join(ROOT, "kafka_multi")
    shutil.rmtree(out, ignore_errors=True)
    app = load_app(
        "target: kafka\n"
        "rule:\n"
        "  -\n"
        "    table: repos\n"
        "  -\n"
        "    table: users\n"
        "    include_columns: user_id,plan\n"
    )
    res = run_app(app, multi_events, out, num_partitions=8)
    assert set(res["tables"]) == {"repos", "users"}
    for tbl in ("repos", "users"):
        t = pq.read_table(res["tables"][tbl]["path"])
        assert t.num_rows > 0, f"{tbl} topic is empty"
    env = json.loads(
        pq.read_table(res["tables"]["users"]["path"]).column("value")[0].as_py()
    )
    assert set(env["date"]) == {"user_id", "plan"}


def test_skip_no_pk_table(events, monkeypatch):
    """PK guard parity (transfer_service.go:253-257): a PK-less table
    fails startup unless skip_no_pk_table, which drops it with a
    warning."""
    import go_mysql_transfer_ray.config as cfgmod

    monkeypatch.setitem(cfgmod.TABLE_PKS, "repos", ())
    app = load_app(_yaml("kafka", "    include_columns: repo\n"))
    with pytest.raises(ValueError, match="must have a PK"):
        run_app(app, events, os.path.join(ROOT, "nopk"))
    app2 = load_app(
        _yaml("kafka", "    include_columns: repo\n",
              extra="skip_no_pk_table: true\n")
    )
    # the only matched table is skipped → "no rule matches" surfaces
    with pytest.raises(ValueError, match="no rule matches"):
        run_app(app2, events, os.path.join(ROOT, "nopk2"))
    assert app2.skip_no_pk_table is True
