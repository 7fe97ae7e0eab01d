"""Regression tests for the round-5 review-sweep hardening.

Covers the fixes landed in the "Datapipe hardening", "Redis/windows/
envelope parity fixes" and "Harden ParseInt-range coercion" commits:

* ``strconv.ParseInt`` range semantics (/root/reference/service/endpoint/
  endpoint.go:180-197): overflow → nil, leading ``+`` accepted;
* reserved-meta-column guards in Decoder/MultiDecoder/RulePlan;
* ``atomic_write_parquet_dir`` never destroys the previous export;
* ``_ensure_schema`` fails loudly on a non-empty block missing columns;
* ``connected_components`` raises instead of emitting wrong labels when
  the star rounds hit the iteration cap;
* Redis ``_stringify`` null → "" (ToString(nil), string_util.go:162-215)
  and sorted-set score nil/non-numeric → 0 (redis.go:319-327);
* MQ envelope: null event ts renders 0, payload stays raw UTF-8.
"""

import os

import pyarrow as pa
import pytest
import ray.data

from go_mysql_transfer_ray.functions.coerce import ColumnSpec, coerce_number
from go_mysql_transfer_ray.pipelines.datapipe import (
    _ensure_schema,
    connected_components,
)
from go_mysql_transfer_ray.pipelines.message_sink import EnvelopeBuilder
from go_mysql_transfer_ray.rules import RuleConfig, RulePlan
from go_mysql_transfer_ray.stages.decode import Decoder, MultiDecoder, _coerce_ddl
from go_mysql_transfer_ray.stages.redis_state import RedisConfig, RedisPlan
from go_mysql_transfer_ray.state.manifest import atomic_write_parquet_dir

INT64_MAX = 9223372036854775807
INT64_MIN = -9223372036854775808


# -- ParseInt range semantics ---------------------------------------------


def test_coerce_number_parseint_range():
    vals = [
        "42",
        "+42",                      # ParseInt accepts a leading +
        "-42",
        str(INT64_MAX),             # exactly max → parses
        str(INT64_MIN),             # exactly min → parses
        "9223372036854775808",      # max+1 → nil, NOT a cast crash
        "-9223372036854775809",     # min-1 → nil
        "+9223372036854775808",     # signed overflow via +
        "99999999999999999999999",  # 23 digits → nil
        "000" + str(INT64_MAX),     # leading zeros don't break the limit
        "000",
        "",
        "12a",
        "1e3",                      # ParseInt (not ParseFloat) rejects
        None,
    ]
    out = coerce_number(pa.array(vals, pa.string()), ColumnSpec("stars", "number"))
    assert out.to_pylist() == [
        42, 42, -42, INT64_MAX, INT64_MIN,
        None, None, None, None,
        INT64_MAX, 0, None, None, None, None,
    ]


def test_ddl_number_coercion_matches_parseint():
    out = _coerce_ddl(
        pa.array(["+7", "99999999999999999999", "5", str(INT64_MIN)]), "number"
    )
    assert out.to_pylist() == [7, None, 5, INT64_MIN]


# -- reserved meta-column guards ------------------------------------------


def test_decoder_rejects_reserved_payload_column():
    with pytest.raises(ValueError, match="collide with decode meta"):
        Decoder(payload_columns=("repo", "op"))


def test_decoder_rejects_reserved_ddl_column():
    with pytest.raises(ValueError, match="collide with decode meta"):
        Decoder(ddl_columns=(("pos", "number"),))


def test_multidecoder_reserves_table_column():
    # multi-table output routes by the synthetic "table" column too
    with pytest.raises(ValueError, match="collide with decode meta"):
        MultiDecoder({"t1": {"columns": ("id", "table"), "pk_columns": ("id",)}})


def test_rule_plan_rejects_meta_default_column():
    specs = [ColumnSpec("id", "number"), ColumnSpec("v")]
    cfg = RuleConfig(
        table="t", primary_keys=("id",), default_column_values={"key": "x"}
    )
    with pytest.raises(ValueError, match="collide"):
        RulePlan(cfg, specs)


def test_rule_plan_rejects_meta_rename_target():
    specs = [ColumnSpec("id", "number"), ColumnSpec("v")]
    cfg = RuleConfig(
        table="t", primary_keys=("id",), column_mappings={"v": "gtid"}
    )
    with pytest.raises(ValueError, match="collide"):
        RulePlan(cfg, specs)


# -- atomic parquet-dir export --------------------------------------------


def test_atomic_parquet_dir_rewrite_replaces_and_cleans(tmp_path):
    out = str(tmp_path / "export")
    atomic_write_parquet_dir(ray.data.from_items([{"x": 1}]), out)
    atomic_write_parquet_dir(ray.data.from_items([{"x": 2}, {"x": 3}]), out)
    got = sorted(r["x"] for r in ray.data.read_parquet(out).take_all())
    assert got == [2, 3]
    # no .tmp.<pid> / .old.<pid> siblings survive a clean rewrite
    siblings = [p for p in os.listdir(tmp_path) if p != "export"]
    assert siblings == []


# -- schema pinning after map_groups --------------------------------------


def test_ensure_schema_raises_on_nonempty_missing_column():
    ds = ray.data.from_arrow(pa.table({"a": [1, 2]}))
    pinned = _ensure_schema(ds, {"a": pa.int64(), "b": pa.string()})
    with pytest.raises(Exception, match="missing declared"):
        pinned.take_all()


def test_ensure_schema_replaces_schemaless_empty_block():
    # one schema-less empty block (what map_groups emits) + one real block:
    # the empty block must be repinned so the blocks concat downstream
    empty = pa.table({"z": pa.array([], pa.int64())})
    real = pa.table({"a": [1], "b": ["x"]})
    ds = ray.data.from_arrow([empty, real])
    pinned = _ensure_schema(ds, {"a": pa.int64(), "b": pa.string()})
    assert pinned.take_all() == [{"a": 1, "b": "x"}]
    schema = pinned.schema().base_schema
    assert [f.name for f in schema] == ["a", "b"]


# -- connected components convergence guard --------------------------------


def test_connected_components_raises_at_round_cap():
    pairs = ray.data.from_arrow(pa.table({"a": [1, 2], "b": [2, 3]}))
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            pairs, max_iterations=0, small_graph_edges=0, num_partitions=2
        )


# -- Redis ToString(nil) and score coercion --------------------------------


def test_redis_key_null_part_is_empty_string():
    plan = RedisPlan(RedisConfig(), ("user", "city"))
    batch = pa.table({"user": ["u1", None], "city": [None, "c2"]})
    # a null part must concat as "" — a null key would break LWW merge
    assert plan.keys(batch).to_pylist() == ["u1", "c2"]


def test_redis_hash_field_null_is_empty_string():
    plan = RedisPlan(
        RedisConfig(structure="hash", key_value="h", hash_field_column="f"),
        ("user",),
    )
    batch = pa.table({"user": ["u"], "f": pa.array([None], pa.string())})
    assert plan.fields(batch).to_pylist() == [""]


def test_zset_score_nil_and_nonnumeric_coerce_to_zero():
    plan = RedisPlan(
        RedisConfig(
            structure="sortedset",
            key_value="z",
            sorted_set_score_column="score",
        ),
        ("user",),
    )
    batch = pa.table({"user": ["a", "b", "c"], "score": ["1.5", None, "abc"]})
    assert plan.scores(batch).to_pylist() == [1.5, 0.0, 0.0]
    numeric = pa.table(
        {"user": ["a", "b"], "score": pa.array([2, None], pa.int64())}
    )
    assert plan.scores(numeric).to_pylist() == [2.0, 0.0]


# -- MQ envelope: null ts and raw UTF-8 ------------------------------------


def test_envelope_null_ts_renders_zero_and_utf8_raw():
    specs = [ColumnSpec("id", "number"), ColumnSpec("name")]
    eb = EnvelopeBuilder(RuleConfig(table="t", primary_keys=("id",)), [], specs)
    batch = pa.table(
        {
            "id": ["1"],
            "name": ["héllo✓"],
            "op": ["insert"],
            "ts": pa.array([None], pa.timestamp("s")),
            "key": ["1"],
        }
    )
    out = eb(batch)
    value = out.column("value").to_pylist()[0]
    assert '"timestamp":0' in value          # None is not valid JSON
    assert "héllo✓" in value                 # ensure_ascii=False (Go json.Marshal)
    assert "\\u00e9" not in value


# -- sequential oracle coercion must equal the engine's ParseInt mask -------


def test_oracle_coerce_number_matches_engine_mask():
    from go_mysql_transfer_ray import oracle

    adversarial = [
        None, "", "42", "+42", "-42", " 5", "5 ", "1_0", "٣",  # ٣
        "12a", "1e3", "0x10", "007", str(INT64_MAX), str(INT64_MIN),
        "9223372036854775808", "-9223372036854775809",
        "99999999999999999999999", "+0", "-0",
    ]
    engine = coerce_number(
        pa.array(adversarial, pa.string()), ColumnSpec("stars", "number")
    ).to_pylist()
    seq = [oracle.coerce_number(v) for v in adversarial]
    assert seq == engine


def test_coercion_parity_property():
    """Property: over arbitrary strings (signs, digits of every script,
    huge magnitudes, junk), the engine's vectorized ParseInt mask and the
    sequential oracle's coercion agree element-wise."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from go_mysql_transfer_ray import oracle

    digitish = st.text(
        alphabet=st.sampled_from(list("0123456789+-_. eE\t٣①x")), max_size=25
    )
    big = st.integers(min_value=-(2**70), max_value=2**70).map(str)
    val = st.one_of(st.none(), digitish, big)

    @given(st.lists(val, min_size=1, max_size=50))
    @settings(max_examples=200, deadline=None)
    def check(vals):
        engine = coerce_number(
            pa.array(vals, pa.string()), ColumnSpec("stars", "number")
        ).to_pylist()
        assert engine == [oracle.coerce_number(v) for v in vals]

    check()
