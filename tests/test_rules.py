"""Rule compiler + encoders + rule-engine actor (SURVEY §2.2 M2-M11, §2.3 T1-T4)."""

import json

import pyarrow as pa
import pytest

from go_mysql_transfer_ray.functions.coerce import ColumnSpec
from go_mysql_transfer_ray.functions.encoders import (
    encode_json,
    encode_kv_commas,
    encode_v_commas,
    to_string_go,
)
from go_mysql_transfer_ray.rules import RuleConfig, RulePlan, _case2camel
from go_mysql_transfer_ray.stages.rule_engine import RuleEngine, SinkOp

COLS = [
    ColumnSpec("repo"),
    ColumnSpec("path"),
    ColumnSpec("commit"),
    ColumnSpec("lang"),
    ColumnSpec("content"),
]

BATCH = pa.table(
    {
        "repo": ["org0/repo1", "a/b"],
        "path": ["src/x.py", "c"],
        "commit": ["deadbeef", "cafebabe"],
        "lang": ["python", "go"],
        "content": ["print(1)", "func main() {}"],
    }
)


def plan(**kw):
    return RulePlan(RuleConfig(**kw), COLS)


def test_include_wins_over_exclude():
    p = plan(include_columns="repo,path,content", exclude_columns="repo")
    out = p.apply(BATCH)
    assert out.column_names == ["repo", "path", "content"]


def test_exclude():
    p = plan(exclude_columns="commit")
    assert plan(exclude_columns="commit").apply(BATCH).column_names == [
        "repo",
        "path",
        "lang",
        "content",
    ]
    assert p.apply(BATCH).num_rows == 2


def test_rename_explicit_case_insensitive_and_policy():
    p = plan(column_mappings="CONTENT=body", column_underscore_to_camel=True)
    out = p.apply(BATCH)
    # explicit mapping wins over the case policy (rule.go:412-416)
    assert "body" in out.column_names and "content" not in out.column_names


def test_case_policies():
    assert plan(column_upper_case=True).apply(BATCH).column_names[0] == "REPO"
    assert plan(column_lower_case=True).apply(BATCH).column_names[0] == "repo"
    assert _case2camel("user_name_x") == "userNameX"
    assert _case2camel("ABC_def") == "abcDef"


def test_default_column_values_appended():
    p = plan(default_column_values="source=binlog,env=prod")
    out = p.apply(BATCH)
    assert out.column("source").to_pylist() == ["binlog", "binlog"]
    assert out.column("env").to_pylist() == ["prod", "prod"]
    assert out.column_names[-2:] == ["source", "env"]


def test_unknown_column_raises():
    with pytest.raises(ValueError):
        plan(include_columns="nope")


def test_composite_key_no_separator_collision():
    p = plan()
    keys = p.build_key(BATCH).to_pylist()
    assert keys == ["org0/repo1src/x.py", "a/bc"]
    # the deliberate collision pair (FIXTURES F3.7): "ab"+"c" == "a"+"bc" —
    # separator-less concat is collision-prone by design; we keep reference
    # semantics for the parity key (endpoint.go:309-316)
    b2 = pa.table(
        {
            "repo": ["ab", "a"],
            "path": ["c", "bc"],
            "commit": ["x", "y"],
            "lang": ["go", "go"],
            "content": ["1", "2"],
        }
    )
    k2 = p.build_key(b2).to_pylist()
    assert k2[0] == k2[1] == "abc"  # reference-faithful collision semantics


def test_single_pk_key():
    p = RulePlan(RuleConfig(primary_keys=("repo",)), COLS)
    assert p.build_key(BATCH).to_pylist() == ["org0/repo1", "a/b"]


def test_to_string_go_floats():
    assert to_string_go(3.14) == "3.14"
    assert to_string_go(1e21) == "1000000000000000000000"
    assert to_string_go(2.0) == "2"
    assert to_string_go(None) == ""
    assert to_string_go([1, "a"]) == '[1,"a"]'


def test_encoders():
    kv = {"b": 1, "a": "x<y", "c": 2.5}
    assert encode_json(kv) == '{"a":"x\\u003cy","b":1,"c":2.5}'
    assert encode_kv_commas(kv, ["a", "b", "c"]) == "a=x<y,b=1,c=2.5"
    assert encode_v_commas(kv, ["c", "a"]) == "2.5,x<y"


def test_value_formatter_overrides_encoder():
    p = plan(value_formatter="{{.repo}}:{{.lang}}", value_encoder="json")
    out = p.encode_values(p.apply(BATCH)).to_pylist()
    assert out == ["org0/repo1:python", "a/b:go"]
    missing = plan(value_formatter="{{.nope}}")
    assert missing.encode_values(missing.apply(BATCH)).to_pylist() == [
        "<no value>",
        "<no value>",
    ]


def test_json_encoder_rows():
    p = plan(include_columns="repo,lang", value_encoder="json")
    vals = [json.loads(s) for s in p.encode_values(p.apply(BATCH)).to_pylist()]
    assert vals[0] == {"repo": "org0/repo1", "lang": "python"}


def _mk_engine(**kw):
    return RuleEngine(RuleConfig(**kw.pop("config_kw", {})), COLS, **kw)


def test_rule_engine_passthrough_meta():
    eng = _mk_engine()
    batch = BATCH.append_column("op", pa.array(["insert", "update"]))
    out = eng(batch)
    assert out.column("op").to_pylist() == ["insert", "update"]
    assert out.column("repo").to_pylist() == BATCH.column("repo").to_pylist()


def test_udf_transform_and_filter():
    def udf(row, old, action, ctx):
        if row["lang"] == "go":
            return None  # filter
        row = dict(row)
        row["lang"] = row["lang"].upper()
        return row

    eng = _mk_engine(udf=udf)
    out = eng(BATCH)
    assert out.num_rows == 1
    assert out.column("lang").to_pylist() == ["PYTHON"]


def test_udf_lookup_join_broadcast():
    import ray

    dim = {"python": "dynamic", "go": "static"}
    ref = ray.put(dim)

    def udf(row, old, action, ctx):
        row = dict(row)
        row["typing"] = ctx.lookup.get(row["lang"], "?")
        return row

    eng = _mk_engine(udf=udf, lookup_ref=ref)
    out = eng(BATCH)
    assert out.column("typing").to_pylist() == ["dynamic", "static"]


def test_udf_sink_ops_upsert_delete():
    def udf(row, old, action, ctx):
        if row["lang"] == "go":
            return [SinkOp("delete", key="K-" + row["repo"])]
        return [SinkOp("upsert", key="K-" + row["repo"], row=row)]

    eng = _mk_engine(udf=udf)
    batch = BATCH.append_column("op", pa.array(["insert", "insert"])).append_column(
        "key", pa.array(["k1", "k2"])
    )
    out = eng(batch)
    assert out.column("op").to_pylist() == ["insert", "delete"]
    assert out.column("key").to_pylist() == ["K-org0/repo1", "K-a/b"]


def test_es_mapping_inference_and_delta():
    """T7: type map (endpoint.go:338-384) + add-only evolution
    (elastic7.go:119-171)."""
    from go_mysql_transfer_ray.functions.es_mapping import build_properties, mapping_delta
    from go_mysql_transfer_ray.functions.coerce import ColumnSpec
    from go_mysql_transfer_ray.rules import RuleConfig, RulePlan

    plan = RulePlan(
        RuleConfig(
            include_columns="a,b,c,d",
            default_column_values="src=x",
            primary_keys=("a",),
        ),
        [
            ColumnSpec("a", "number"),
            ColumnSpec("b", "float"),
            ColumnSpec("c", "datetime"),
            ColumnSpec("d", "string"),
        ],
    )
    props = build_properties(plan, es_mappings=[{"field": "d", "type": "text", "analyzer": "ik"}])
    assert props["a"] == {"type": "long"}
    assert props["b"] == {"type": "float"}
    assert props["c"] == {"type": "date", "format": "yyyy-MM-dd HH:mm:ss"}
    assert props["d"] == {"type": "text", "analyzer": "ik"}  # override wins
    assert props["src"] == {"type": "keyword"}
    delta = mapping_delta({"a": {"type": "long"}, "b": {"type": "float"}}, props)
    assert set(delta) == {"c", "d", "src"}  # add-only, never mutates existing


def test_wildcard_rule_expansion():
    """S6: regex table names expand to deep-cloned per-table rules with
    MySQL RLIKE match semantics (unanchored, case-insensitive)."""
    from go_mysql_transfer_ray.rules import expand_rules

    rc = RuleConfig(table=r"logs_\d+", include_columns="a,b")
    plain = RuleConfig(table="Users", include_columns="c")
    out = expand_rules(
        [rc, plain], ["logs_1", "app_Logs_22", "logsX", "users"]
    )
    # RLIKE: substring + case-insensitive → app_Logs_22 matches too
    assert set(out) == {"logs_1", "app_logs_22", "users"}
    assert out["app_logs_22"].table == "app_Logs_22"
    # every registered rule is a deep clone — both branches
    out["logs_1"].include_columns = "changed"
    assert out["app_logs_22"].include_columns == "a,b"
    out["users"].include_columns = "mutated"
    assert plain.include_columns == "c"
    # a literal name with a char Python's re.escape would quote (but Go's
    # QuoteMeta would not) stays a plain table
    dash = expand_rules([RuleConfig(table="my-table")], [])
    assert set(dash) == {"my-table"}
    # duplicates are last-wins (reference's guard map is dead code)
    last = expand_rules(
        [RuleConfig(table=r"logs_\d+", value_encoder="json"),
         RuleConfig(table=r"logs_.*", value_encoder="kv-commas")],
        ["logs_1"],
    )
    assert last["logs_1"].value_encoder == "kv-commas"
    with pytest.raises(ValueError):
        expand_rules([RuleConfig(table="*")], ["t"])
