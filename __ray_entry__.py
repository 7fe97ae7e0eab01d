"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC replay (synthetic binlog over a
repos-shaped base table derived from sf0.001) and returns the converged
lake table.  ``queries()`` exposes one callable per implemented operator
family (SURVEY.md §2 + the training-data additions); ``oracle_sql()`` gives
the DuckDB-checkable subset.  Ray is initialised by the caller — nothing
here calls ``ray.init``/``ray.shutdown``.

Column-name discipline: every computed column is named identically in the
Ray pipeline and the SQL so the driver's order-insensitive value-hash
compare lines up.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data
from ray.data.aggregate import Count, Max, Sum

from go_mysql_transfer_ray.functions import text as textfn
from go_mysql_transfer_ray.functions.coerce import ColumnSpec
from go_mysql_transfer_ray.pipelines import cdc, datapipe, message_sink, multimodal
from go_mysql_transfer_ray.rules import RuleConfig, RulePlan
from go_mysql_transfer_ray.sources.binlog import (
    BinlogConfig,
    materialize_events,
    materialize_multi_events,
)
from go_mysql_transfer_ray.stages.merge import merged_dataset

_EVENT_CACHE_ROOT = "/tmp/gmt_ray_entry_events"
_LAKE_ROOT = "/tmp/gmt_ray_entry_lake"
_CHANGES_ORACLE_PATH = "/tmp/gmt_oracle_changes/cdc_replay_repos"
_MULTI_CHANGES_ORACLE_PATH = "/tmp/gmt_oracle_changes/cdc_replay_two_tables"


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """SQL ROUND semantics (half away from zero) as int64."""
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)


def _binlog_cfg(sf_dir: str) -> BinlogConfig:
    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    return BinlogConfig(
        num_keys=max(200, n_docs * 4),
        avg_events_per_key=4.0,
        delete_pct=12,
        hot_repos=1,
        hot_multiplier=8,
        bad_arity_permille=5,
    )


def _replay(sf_dir: str) -> pa.Table:
    cfg = _binlog_cfg(sf_dir)
    events_dir = materialize_events(cfg, root=_EVENT_CACHE_ROOT, shards=8)
    out = os.path.join(_LAKE_ROOT, cfg.fingerprint())
    cdc.replay(events_dir, out, num_partitions=32)
    return cdc.lake_table(out)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: binlog replay → lake."""
    return _replay("/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# query implementations (each takes sf_dir)


def _events(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"))


def _docs(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def q_cdc_replay_repos(sf_dir: str) -> pa.Table:
    """Flagship: full CDC replay (decode → merge → lake) on synthetic
    binlog.  Also emits the decoded change stream as a Parquet relation
    so ``oracle_sql()`` can state the LWW final state in DuckDB — the
    flagship's value-level correctness gate (round-1 verdict item 6)."""
    cfg = _binlog_cfg(sf_dir)
    events_dir = materialize_events(cfg, root=_EVENT_CACHE_ROOT, shards=8)
    cdc.write_decoded_changes(events_dir, _CHANGES_ORACLE_PATH)
    return _replay(sf_dir)


def _users_cfg(sf_dir: str) -> BinlogConfig:
    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    return BinlogConfig(
        seed=101,
        num_keys=max(60, n_docs),
        avg_events_per_key=3.0,
        delete_pct=10,
        bad_arity_permille=5,
    )


_TWO_TABLE_RULES = None  # built lazily (RuleConfig import order)


def _two_table_rules():
    global _TWO_TABLE_RULES
    if _TWO_TABLE_RULES is None:
        _TWO_TABLE_RULES = {
            "repos": RuleConfig(
                table="repos", include_columns="repo,path,lang,stars",
                column_mappings="lang=language", primary_keys=("repo", "path"),
            ),
            "users": RuleConfig(
                table="users", include_columns="user_id,plan",
                column_mappings="plan=tier", default_column_values="src=cdc",
                primary_keys=("user_id",),
            ),
        }
    return _TWO_TABLE_RULES


def q_cdc_replay_two_tables(sf_dir: str) -> pa.Table:
    """Multi-table, multi-rule SINGLE-PASS replay (the reference's core
    operating mode, /root/reference/service/transfer_service.go:206-276 +
    service/handler.go:83-86): two tables interleaved in one GTID stream,
    each routed to its own rule, one shared merge exchange.  repos takes
    its mid-stream DDL (stars) through the rule; users gets a rename and
    an appended default.  Returns the UNION view (table column + null-
    padded per-table columns) so the oracle can state both tables' LWW in
    one relation."""
    cfg = _binlog_cfg(sf_dir)
    ucfg = _users_cfg(sf_dir)
    events_dir = materialize_multi_events(
        cfg, ucfg, root=_EVENT_CACHE_ROOT + "_multi", shards=8
    )
    cdc.write_decoded_changes_multi(events_dir, _MULTI_CHANGES_ORACLE_PATH)
    out = os.path.join(
        _LAKE_ROOT, f"multi-{cfg.fingerprint()}-{ucfg.fingerprint()}"
    )
    cdc.replay_multi(events_dir, out, rules=_two_table_rules(), num_partitions=32)
    repos = cdc.lake_table(os.path.join(out, "repos"))
    users = cdc.lake_table(os.path.join(out, "users"))
    nr, nu = repos.num_rows, users.num_rows
    return pa.table(
        {
            "src_table": pa.array(["repos"] * nr + ["users"] * nu, pa.string()),
            "repo": pa.concat_arrays(
                [repos.column("repo").combine_chunks(), pa.nulls(nu, pa.string())]
            ),
            "path": pa.concat_arrays(
                [repos.column("path").combine_chunks(), pa.nulls(nu, pa.string())]
            ),
            "language": pa.concat_arrays(
                [repos.column("language").combine_chunks(), pa.nulls(nu, pa.string())]
            ),
            "stars": pa.concat_arrays(
                [repos.column("stars").combine_chunks(), pa.nulls(nu, pa.int64())]
            ),
            "user_id": pa.concat_arrays(
                [pa.nulls(nr, pa.string()), users.column("user_id").combine_chunks()]
            ),
            "tier": pa.concat_arrays(
                [pa.nulls(nr, pa.string()), users.column("tier").combine_chunks()]
            ),
            "src": pa.concat_arrays(
                [pa.nulls(nr, pa.string()), users.column("src").combine_chunks()]
            ),
        }
    )


def q_cdc_last_state_per_user(sf_dir: str) -> pa.Table:
    """The merge operator applied to the events table as a change stream:
    'error' = delete, anything else = upsert; order by event_id (J3/A3)."""

    def to_changes(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pc.cast(t.column("user_id"), pa.string()),
                "gtid": t.column("event_id"),
                "seq_in_txn": pa.array(
                    np.zeros(t.num_rows, dtype=np.int32), pa.int32()
                ),
                "op": pc.if_else(
                    pc.equal(t.column("event_type"), "error"),
                    pa.scalar("delete"),
                    pa.scalar("insert"),
                ),
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "value": t.column("value"),
            }
        )

    ds = _events(sf_dir).map_batches(to_changes, batch_format="pyarrow")
    return merged_dataset(
        ds, num_partitions=16, final_columns=["user_id", "event_id", "event_type", "value"]
    )


_INGEST_ROOT = "/tmp/gmt_ray_entry_ingest"
_INGEST_IMG_FIELDS = ["repo", "path", "commit", "lang", "content"]


def _doc_envelopes(t: pa.Table) -> pa.Table:
    """documents batch → Debezium-style envelope rows (pure Arrow):
    one insert per doc; an update (commit c0→c1, content prefixed 'u:')
    for doc_id%3==0; a delete for doc_id%7==0.  gtid = doc_id*3+{1,2,3}
    keeps per-key log order without needing the corpus size."""
    ids = pc.cast(t.column("doc_id"), pa.string())
    path = pc.binary_join_element_wise("doc", ids, ".txt", "")
    repo, lang, text = t.column("source"), t.column("lang"), t.column("text")
    img_type = pa.struct([(f, pa.string()) for f in _INGEST_IMG_FIELDS])

    def img(commit_arr, content_arr, repo=repo, path=path, lang=lang):
        return pa.StructArray.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in (repo, path, commit_arr, lang, content_arr)],
            names=_INGEST_IMG_FIELDS,
        )

    doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(doc)
    upd = pa.array(doc % 3 == 0)
    dele = pa.array(doc % 7 == 0)
    c0 = pa.array(np.full(n, "c0"), pa.string())
    c1 = pa.array(np.full(n, "c1"), pa.string())
    utext = pc.binary_join_element_wise("u:", text, "")

    def envelope(mask, op, gtid_off, before, after):
        base = pa.table(
            {
                "op": pa.array(np.full(n, op), pa.string()),
                "gtid": pa.array(doc * 3 + gtid_off, pa.int64()),
                "seq": pa.array(np.zeros(n, np.int32)),
                "ts_ms": pa.array(doc * 1000 + gtid_off, pa.int64()),
                "before": before,
                "after": after,
            }
        )
        return base if mask is None else base.filter(mask)

    last_commit = pc.if_else(upd, c1, c0)
    last_content = pc.if_else(upd, utext, text)
    parts = [
        envelope(None, "c", 1, pa.nulls(n, img_type), img(c0, text)),
        envelope(upd, "u", 2, img(c0, text), img(c1, utext)),
        envelope(dele, "d", 3, img(last_commit, last_content),
                 pa.nulls(n, img_type)),
    ]
    return pa.concat_tables(parts)


def q_ingest_jsonl_replay(sf_dir: str) -> pa.Table:
    """External-source ingestion end-to-end: a Debezium-style JSONL change
    stream (op c/u/d + before/after images — the public interchange shape;
    the reference's only source is a live replication connection,
    /root/reference/service/transfer_service.go:106-134) is derived
    deterministically from ``documents``, ingested by
    ``sources.ingest.jsonl_to_event_shards`` into canonical event shards,
    and replayed through the flagship lake merge.  The oracle states the
    surviving LWW row images straight over ``documents``."""
    from go_mysql_transfer_ray.sources.ingest import jsonl_to_event_shards

    root = os.path.join(
        _INGEST_ROOT, os.path.basename(os.path.normpath(sf_dir))
    )
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    stream = os.path.join(root, "stream")
    _docs(sf_dir).map_batches(
        _doc_envelopes, batch_format="pyarrow"
    ).write_json(stream)
    events = jsonl_to_event_shards(stream, os.path.join(root, "events"))
    lake = os.path.join(root, "lake")
    cdc.replay(events, lake, num_partitions=16)
    return cdc.lake_table(lake).select(_INGEST_IMG_FIELDS)


def q_mongo_fieldwise_state(sf_dir: str):
    """K2 Mongo $set partial-update semantics: purchase=insert (full doc),
    error=delete, others=update carrying ONLY the value field — the final
    event_type must survive from the insert (a full-image LWW would null
    it), value comes from the last setter."""
    from go_mysql_transfer_ray.stages.merge import fieldwise_merged_dataset

    def to_changes(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        is_ins = pc.equal(et, "purchase")
        is_del = pc.equal(et, "error")
        op = pc.if_else(
            is_ins, pa.scalar("insert"),
            pc.if_else(is_del, pa.scalar("delete"), pa.scalar("update")),
        )
        return pa.table(
            {
                "key": pc.cast(t.column("user_id"), pa.string()),
                "gtid": t.column("event_id"),
                "seq_in_txn": pa.array(np.zeros(t.num_rows, dtype=np.int32)),
                "op": op,
                "user_id": t.column("user_id"),
                # partial update: event_type only present on inserts
                "event_type": pc.if_else(is_ins, et, pa.scalar(None, pa.string())),
                "value": t.column("value"),
            }
        )

    ds = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "event_type", "value"],
        )
        .map_batches(to_changes, batch_format="pyarrow")
    )
    return fieldwise_merged_dataset(
        ds, num_partitions=16, final_columns=["user_id", "event_type", "value"]
    )


def q_metrics_action_counts(sf_dir: str):
    """Per-action counters (T10/A1 metrics parity)."""
    return (
        _events(sf_dir)
        .groupby("event_type")
        .aggregate(Count(alias_name="n"))
    )


def q_stock_projection_rule(sf_dir: str):
    """Stock import (S5) + rule projection/rename/default (M2/M3/M5)."""
    plan = RulePlan(
        RuleConfig(
            include_columns="c_custkey,c_name,c_mktsegment",
            column_mappings="c_name=name",
            default_column_values="source=stock",
            primary_keys=("c_custkey",),
        ),
        [
            ColumnSpec("c_custkey", "number"),
            ColumnSpec("c_name", "string"),
            ColumnSpec("c_nationkey", "number"),
            ColumnSpec("c_acctbal", "float"),
            ColumnSpec("c_mktsegment", "string"),
        ],
    )
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_mktsegment"],
    )
    return ds.map_batches(plan.apply, batch_format="pyarrow")


def q_composite_key_lineitem(sf_dir: str):
    """Composite-key construction (M9): separator-less stringified concat."""
    plan = RulePlan(
        RuleConfig(primary_keys=("l_orderkey", "l_linenumber")),
        [ColumnSpec("l_orderkey", "number"), ColumnSpec("l_linenumber", "number")],
    )

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_linenumber": t.column("l_linenumber"),
                "key": plan.build_key(t),
            }
        )

    return ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber"],
    ).map_batches(fn, batch_format="pyarrow")


def q_value_encoder_kv(sf_dir: str):
    """kv-commas value encoder (M8) over the customer table."""
    plan = RulePlan(
        RuleConfig(
            include_columns="c_custkey,c_name",
            value_encoder="kv-commas",
            primary_keys=("c_custkey",),
        ),
        [ColumnSpec("c_custkey", "number"), ColumnSpec("c_name", "string")],
    )

    def fn(t: pa.Table) -> pa.Table:
        proj = plan.apply(t)
        return pa.table(
            {"c_custkey": t.column("c_custkey"), "encoded": plan.encode_values(proj)}
        )

    return ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    ).map_batches(fn, batch_format="pyarrow")


def q_value_encoder_json(sf_dir: str):
    """json value encoder (M8): Go-style sorted-key compact JSON."""
    plan = RulePlan(
        RuleConfig(
            include_columns="c_custkey,c_name",
            value_encoder="json",
            primary_keys=("c_custkey",),
        ),
        [ColumnSpec("c_custkey", "number"), ColumnSpec("c_name", "string")],
    )

    def fn(t: pa.Table) -> pa.Table:
        proj = plan.apply(t)
        return pa.table(
            {"c_custkey": t.column("c_custkey"), "encoded": plan.encode_values(proj)}
        )

    return ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    ).map_batches(fn, batch_format="pyarrow")


def q_value_formatter_template(sf_dir: str):
    """M8 value_formatter: Go text/template interpolation overrides the
    encoder (global/rule.go:219-226)."""
    plan = RulePlan(
        RuleConfig(
            include_columns="c_custkey,c_name",
            value_formatter="c:{{.c_custkey}}-{{.c_name}}",
            primary_keys=("c_custkey",),
        ),
        [ColumnSpec("c_custkey", "number"), ColumnSpec("c_name", "string")],
    )

    def fn(t: pa.Table) -> pa.Table:
        proj = plan.apply(t)
        return pa.table(
            {"c_custkey": t.column("c_custkey"), "encoded": plan.encode_values(proj)}
        )

    return ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    ).map_batches(fn, batch_format="pyarrow")


def q_value_encoder_vcommas(sf_dir: str):
    """v-commas value encoder (M8): values joined by commas, field order
    pinned to the rule's output order (determinization of the reference's
    random Go map iteration — see functions/encoders.py)."""
    plan = RulePlan(
        RuleConfig(
            include_columns="c_custkey,c_name,c_mktsegment",
            value_encoder="v-commas",
            primary_keys=("c_custkey",),
        ),
        [
            ColumnSpec("c_custkey", "number"),
            ColumnSpec("c_name", "string"),
            ColumnSpec("c_mktsegment", "string"),
        ],
    )

    def fn(t: pa.Table) -> pa.Table:
        proj = plan.apply(t)
        return pa.table(
            {"c_custkey": t.column("c_custkey"), "encoded": plan.encode_values(proj)}
        )

    return ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_mktsegment"],
    ).map_batches(fn, batch_format="pyarrow")


def q_es_mapping_infer(sf_dir: str) -> pa.Table:
    """T7 ES mapping inference + evolution delta as a queryable artifact."""
    from go_mysql_transfer_ray.functions.es_mapping import build_properties, mapping_delta

    plan = RulePlan(
        RuleConfig(
            include_columns="c_custkey,c_name,c_acctbal,c_mktsegment",
            default_column_values="source=stock",
            primary_keys=("c_custkey",),
        ),
        [
            ColumnSpec("c_custkey", "number"),
            ColumnSpec("c_name", "string"),
            ColumnSpec("c_acctbal", "float"),
            ColumnSpec("c_mktsegment", "string"),
        ],
    )
    desired = build_properties(
        plan, es_mappings=[{"field": "c_name", "type": "text", "analyzer": "standard"}]
    )
    existing = {"c_custkey": {"type": "long"}}
    delta = mapping_delta(existing, desired)
    fields = sorted(desired)
    return pa.table(
        {
            "field": pa.array(fields, pa.string()),
            "es_type": pa.array([desired[f]["type"] for f in fields], pa.string()),
            "in_delta": pa.array([f in delta for f in fields], pa.bool_()),
        }
    )


def q_events_filter_project(sf_dir: str):
    """Table filter + projection pushdown (S2/M2)."""

    def fn(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(t.column("event_type"), "purchase"),
            pc.greater(t.column("value"), 100.0),
        )
        return t.filter(keep)

    return (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "event_type", "value"],
        )
        .map_batches(fn, batch_format="pyarrow")
        .select_columns(["event_id", "user_id", "value"])
    )


def q_lookup_join_nation(sf_dir: str):
    """Broadcast lookup join (J1/T4 dbOps analogue): user_id%25 → nation."""
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    lookup = dict(
        zip(
            nation.column("n_nationkey").to_pylist(),
            nation.column("n_name").to_pylist(),
        )
    )
    lookup_ref = ray.put(lookup)

    class Enrich:
        def __init__(self):
            self.lut = ray.get(lookup_ref)
            keys = np.fromiter(self.lut.keys(), dtype=np.int64)
            vals = np.array([self.lut[k] for k in keys], dtype=object)
            self.max_key = int(keys.max()) + 1
            self.table = np.empty(self.max_key, dtype=object)
            self.table[keys] = vals

        def __call__(self, t: pa.Table) -> pa.Table:
            uid = t.column("user_id").to_numpy(zero_copy_only=False)
            names = self.table[uid % 25]
            return pa.table(
                {
                    "event_id": t.column("event_id"),
                    "user_id": t.column("user_id"),
                    "n_name": pa.array(names, pa.string()),
                }
            )

    return ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id"]
    ).map_batches(Enrich, concurrency=(1, 4), batch_format="pyarrow")


def q_tpch_q1ish(sf_dir: str):
    """Wide aggregate with block-local pre-aggregation (the combiner
    pattern from SURVEY §7.4): sums kept exact via integer cents."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_returnflag": t.column("l_returnflag").to_pandas(),
                "l_linestatus": t.column("l_linestatus").to_pandas(),
                "qty": t.column("l_quantity").to_numpy(),
                # half-away-from-zero to match SQL ROUND (prices are ≥ 0,
                # but keep the sign-safe form for parity with windows.py)
                "cents": _round_half_away(
                    t.column("l_extendedprice").to_numpy() * 100
                ),
            }
        )
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(sum_qty=("qty", "sum"), price_cents=("cents", "sum"), n=("qty", "size"))
            .reset_index()
        )
        g["sum_qty"] = g["sum_qty"].astype(np.int64)
        # pin the schema so empty blocks don't degrade to null types
        return pa.Table.from_pandas(
            g,
            schema=pa.schema(
                [
                    ("l_returnflag", pa.string()),
                    ("l_linestatus", pa.string()),
                    ("sum_qty", pa.int64()),
                    ("price_cents", pa.int64()),
                    ("n", pa.int64()),
                ]
            ),
            preserve_index=False,
        )

    return (
        ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("price_cents", alias_name="price_cents"),
            Sum("n", alias_name="n"),
        )
    )


def q_date_format_orders(sf_dir: str):
    """M11 datetime reformatting: yyyy-MM-dd DSL → strftime, incl. the
    reference's mm=month / MM=minute quirk (util/dates/date_format.go)."""
    plan = RulePlan(
        RuleConfig(
            include_columns="o_orderkey,o_orderdate",
            datetime_formatter="dd/mm/yyyy HH:MM:SS",
            primary_keys=("o_orderkey",),
        ),
        [ColumnSpec("o_orderkey", "number"), ColumnSpec("o_orderdate", "datetime")],
    )

    def fn(t: pa.Table) -> pa.Table:
        # binlog semantics: temporal values arrive as MySQL-format strings
        as_str = t.set_column(
            t.schema.get_field_index("o_orderdate"),
            "o_orderdate",
            pc.strftime(
                pc.cast(t.column("o_orderdate"), pa.timestamp("s")),
                format="%Y-%m-%d %H:%M:%S",
            ),
        )
        return plan.apply(as_str)

    return ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_orderdate"]
    ).map_batches(fn, batch_format="pyarrow")


def q_window_daily_stats(sf_dir: str):
    """Tumbling-window aggregate (combiner pattern; exact integer cents)."""
    from go_mysql_transfer_ray.pipelines.windows import tumbling_aggregate

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type", "value"],
    )
    return tumbling_aggregate(
        ds, ts_col="ts", key_col="event_type", value_col="value", window="day"
    )


def q_hopping_daily_stats(sf_dir: str):
    """Hopping window (2-day windows, 1-day hop): every event counted in
    two overlapping windows; explode happens inside the per-block
    partial, so the shuffle carries only (window, key) partials."""
    from go_mysql_transfer_ray.pipelines.windows import hopping_aggregate

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type", "value"],
    )
    return hopping_aggregate(
        ds, ts_col="ts", key_col="event_type", value_col="value",
        window_days=2, hop_days=1,
    )


def q_sessionize(sf_dir: str):
    """Gap-based sessionization per user (1-hour gap) — vectorized
    lag/cumsum fold over the storage shuffle."""
    from go_mysql_transfer_ray.pipelines.windows import sessionize

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    return sessionize(ds, key_col="user_id", ts_col="ts", gap_seconds=3600)


def q_asof_last_purchase(sf_dir: str):
    """As-of join along event time per user: every event takes the most
    recent purchase value at-or-before it."""
    from go_mysql_transfer_ray.pipelines.windows import asof_forward_fill

    def prep(t: pa.Table) -> pa.Table:
        return t.append_column(
            "is_purchase", pc.equal(t.column("event_type"), "purchase")
        )

    ds = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "event_type", "value"],
        )
        .map_batches(prep, batch_format="pyarrow")
    )
    return asof_forward_fill(
        ds,
        key_col="user_id",
        order_col="event_id",
        build_mask_col="is_purchase",
        value_col="value",
    ).select_columns(["event_id", "user_id", "asof_value"])


def _query_vectors(sf_dir: str, n: int = 4) -> np.ndarray:
    """First n embedding vectors WITHOUT reading the whole file."""
    pf = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    batch = next(pf.iter_batches(batch_size=n, columns=["embedding"]))
    return np.stack(batch.column("embedding").to_pylist())


def q_doc_token_counts(sf_dir: str):
    """Whitespace + BPE-ish-pre-tokenizer token counts, both pure
    ``count_substring_regex`` kernels (functions/text.py)."""

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": textfn.token_count(t.column("text")),
                "n_bpe_tokens": textfn.bpe_ish_token_count(t.column("text")),
            }
        )

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def q_chunk_documents(sf_dir: str):
    """Context-window chunking: 128-char windows, stride 96 (25% overlap)
    — the training-context explode step (datapipe.chunk_documents)."""
    return datapipe.chunk_documents(
        _docs(sf_dir), text_col="text", id_col="doc_id", size=128, stride=96
    )


def q_doc_quality(sf_dir: str):
    def fn(t: pa.Table) -> pa.Table:
        s = textfn.quality_score(t.column("text"))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_chars": s["n_chars"],
                "n_tokens": s["n_tokens"],
                "n_punct": s["n_punct"],
                "punct_ratio": s["punct_ratio"],
                "mean_tok_len": s["mean_tok_len"],
                "quality": s["quality"],
            }
        )

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def q_train_test_split(sf_dir: str):
    return datapipe.train_test_split(_docs(sf_dir))


def q_pack_sequences(sf_dir: str):
    return datapipe.pack_sequences(_docs(sf_dir), capacity=512)


def q_dedup_exact(sf_dir: str):
    return datapipe.exact_dedup(_docs(sf_dir)).select_columns(["doc_id"])


def q_redact_text(sf_dir: str):
    """PII-style scrubbing: vectorized RE2 replacements (email + long
    digit runs) — value-checked against DuckDB regexp_replace."""
    return datapipe.redact_text(_docs(sf_dir)).select_columns(["doc_id", "text"])


def q_stratified_sample(sf_dir: str):
    """Deterministic per-stratum down-sampling (training-data mixing):
    id-hash permille against a per-lang rate table."""
    return datapipe.stratified_sample(
        _docs(sf_dir),
        rates_permille={"en": 500, "de": 250},
        default_permille=100,
    ).select_columns(["doc_id", "lang"])


def q_repetition_stats(sf_dir: str):
    """Gopher-style line-repetition quality filter (duplicate-line
    character fraction per doc) — all-integer outputs so the SQL oracle
    restates the flag bit-for-bit."""
    return datapipe.repetition_stats(_docs(sf_dir)).select_columns(
        ["doc_id", "n_lines", "n_distinct_lines", "dup_line_chars",
         "line_chars", "flagged"]
    )


def q_vocab_topk(sf_dir: str):
    """Global token-frequency top-100: per-batch value_counts partials →
    small groupby-sum over the vocabulary → deterministic sort+limit
    (ties broken by token text)."""
    return datapipe.vocab_topk(_docs(sf_dir), k=100)


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag docs sharing any 8-token shingle
    with the deterministic benchmark subset (doc_id % 37 == 0).  The
    engine's k=8 shingle-hash stream is exported so the oracle can
    restate the distinct-overlap counts in SQL."""
    docs = _docs(sf_dir)

    def explode(t: pa.Table) -> pa.Table:
        flat, off = textfn.hash_tokens(t.column("text"))
        sh, soff = textfn.shingle_hashes(flat, off, k=8)
        ids = pc.cast(t.column("doc_id"), pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, np.diff(soff))),
                "h": pa.array(sh, pa.uint64()),
            }
        )

    stream = docs.map_batches(explode, batch_format="pyarrow")
    if os.environ.get("GRAFT_SKIP_ORACLE_EXPORT") == "1":
        # bench mode: no export to re-read — take the benchmark-side
        # hashes straight off the (streaming) shingle dataset
        rel_t = pa.concat_tables(
            ray.get(stream.to_arrow_refs()), promote_options="default"
        )
    else:
        rel = _write_rel(stream, "decon_stream")
        # the exported relation already holds every shingle hash — derive
        # the benchmark set from it instead of a second benchmark-side scan
        rel_t = pq.read_table(rel, columns=["doc_id", "h"])
    ids = rel_t.column("doc_id").to_numpy(zero_copy_only=False)
    bench = np.unique(
        rel_t.column("h").to_numpy(zero_copy_only=False)[ids % 37 == 0]
    ).astype(np.uint64)
    return datapipe.decontaminate(docs, bench=bench)


def q_json_props_stats(sf_dir: str):
    """JSON-column normalization (the reference parses JSON column values
    into structured data, /root/reference/service/endpoint/endpoint.go:
    136-145) + the partial-aggregation pattern: extract ``$.k`` from the
    events ``props`` JSON with one vectorized RE2 kernel, pre-aggregate
    per batch, merge partials in a small groupby."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "props"]
    )

    def partial(t: pa.Table) -> pa.Table:
        # fast path: ^-anchored RE2 matches $.k as the object's FIRST key
        # (the generator's shape), consuming the trailing delimiter so a
        # non-integer number ('1.5') is captured whole, never truncated
        # to its integer prefix.  Integer tokens cast exactly; decimal
        # tokens replicate DuckDB's TRY_CAST-to-BIGINT rounding
        # (half away from zero — '1.5'→2, '-1.5'→-2).  Rows the anchor
        # misses but that DO contain a '"k"' token fall back to a real
        # JSON parse (the reference parses JSON values outright,
        # endpoint.go:136-145) with the same value semantics as
        # json_extract_string + TRY_CAST: numbers round half-away,
        # numeric STRINGS parse (extract_string unquotes them),
        # booleans/non-numerics → null.
        props = t.column("props")
        if isinstance(props, pa.ChunkedArray):
            props = props.combine_chunks()
        k_str = pc.struct_field(
            pc.extract_regex(
                props, r'^\{\s*"k"\s*:\s*(?P<k>-?\d+(?:\.\d+)?)\s*[,}]'
            ),
            "k",
        )
        is_int = pc.match_substring_regex(k_str, r"^-?\d+$")
        k = pc.if_else(
            is_int,
            pc.cast(pc.if_else(is_int, k_str, pa.scalar(None, pa.string())), pa.int64()),
            pc.cast(
                pc.round(
                    pc.cast(
                        pc.if_else(is_int, pa.scalar(None, pa.string()), k_str),
                        pa.float64(),
                    ),
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            ),
        )
        missed = pc.and_kleene(
            pc.is_null(k), pc.match_substring(props, '"k"')
        )
        if pc.any(missed).as_py():
            import json as _json
            import math as _math

            def _try_cast_bigint(v):
                # DuckDB TRY_CAST(json_extract_string(..) AS BIGINT)
                if isinstance(v, str):
                    try:
                        v = float(v) if ("." in v or "e" in v or "E" in v) else int(v)
                    except ValueError:
                        return None
                if isinstance(v, bool) or not isinstance(v, (int, float)):
                    return None
                if isinstance(v, float):
                    if v != v or v in (float("inf"), float("-inf")):
                        return None
                    return int(_math.floor(v + 0.5)) if v >= 0 else int(_math.ceil(v - 0.5))
                return int(v)

            idx = np.flatnonzero(missed.to_numpy(zero_copy_only=False))
            vals = pc.fill_null(k, 0).to_numpy(zero_copy_only=False).copy()
            ok = pc.is_valid(k).to_numpy(zero_copy_only=False).copy()
            for i in idx:
                try:
                    v = _try_cast_bigint(_json.loads(props[int(i)].as_py()).get("k"))
                except (ValueError, AttributeError):
                    v = None
                if v is not None:
                    vals[i] = v
                    ok[i] = True
            k = pa.array(vals, pa.int64(), mask=~ok)
        g = (
            pa.table({"event_type": t.column("event_type"), "k": k})
            .group_by("event_type")
            .aggregate(
                [
                    ("k", "count", pc.CountOptions(mode="all")),
                    ("k", "sum"),
                    ("k", "max"),
                ]
            )
        )
        return pa.table(
            {
                "event_type": pc.cast(g.column("event_type"), pa.string()),
                "n_events": pc.cast(g.column("k_count"), pa.int64()),
                "sum_k": pc.cast(g.column("k_sum"), pa.int64()),
                "max_k": pc.cast(g.column("k_max"), pa.int64()),
            }
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_k", alias_name="sum_k"),
            Max("max_k", alias_name="max_k"),
        )
    )


def q_group_lang_stats(sf_dir: str):
    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": t.column("lang").to_pandas(),
                "chars": t.column("n_chars").to_numpy(),
            }
        )
        g = (
            df.groupby("lang", sort=False)
            .agg(n_docs=("chars", "size"), total_chars=("chars", "sum"))
            .reset_index()
        )
        # pin the schema: an empty block's pandas frame would otherwise
        # infer null types and trip the executor's schema-mismatch warning
        return pa.Table.from_pandas(
            g,
            schema=pa.schema(
                [
                    ("lang", pa.string()),
                    ("n_docs", pa.int64()),
                    ("total_chars", pa.int64()),
                ]
            ),
            preserve_index=False,
        )

    return (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("total_chars", alias_name="total_chars"),
        )
    )


# -- rows-only (non-SQL-expressible) ----------------------------------------


def q_lang_id(sf_dir: str):
    return datapipe.language_id(_docs(sf_dir)).select_columns(["doc_id", "pred_lang"])


def q_fingerprints(sf_dir: str):
    """Winnowing fingerprints (Schleimer et al.), value-checkable: the
    engine's 5-gram rolling-hash stream is exported as (doc_id, pos,
    h:uint64) — h stays UNSIGNED so DuckDB's MIN uses the same u64 order
    as the engine — and the oracle restates winnowing itself in SQL:
    per-window (w=4) minimum via a ROWS window frame, whole-doc minimum
    for docs with ≤w shingles, xor-fold of the DISTINCT selected hashes
    (bit_xor), hex formatting."""
    docs = _docs(sf_dir)

    def explode_shingles(t: pa.Table) -> pa.Table:
        flat, off = textfn.hash_tokens(t.column("text"))
        sh, soff = textfn.shingle_hashes(flat, off, k=5)
        ids = pc.cast(t.column("doc_id"), pa.int64()).to_numpy(zero_copy_only=False)
        cnts = np.diff(soff)
        pos = np.arange(len(sh), dtype=np.int64) - np.repeat(soff[:-1], cnts)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, cnts)),
                "pos": pa.array(pos),
                "h": pa.array(sh, pa.uint64()),
            }
        )

    _write_rel(
        docs.map_batches(explode_shingles, batch_format="pyarrow"),
        "shingle_stream",
    )
    return datapipe.fingerprints(docs).select_columns(["doc_id", "fingerprint"])


_SKETCH_ORACLE_ROOT = "/tmp/gmt_oracle_changes"


def _write_rel(ds: "ray.data.Dataset", name: str) -> str:
    """Write an oracle-support relation as a Parquet dir (tmp + rename,
    idempotent) — the same pattern the flagship uses for its decoded
    change stream.  These relations export engine-computed SKETCHES
    (signatures / shingle hashes / simhashes), letting the oracle restate
    the whole banding + verify + transitive-closure pipeline in SQL.

    GRAFT_SKIP_ORACLE_EXPORT=1 (set by bench.py) skips the write: the
    export exists solely so DuckDB can check the operator, it is not part
    of the operator's work, and it belongs outside the timed span.  The
    driver's correctness runs never set it.  (q_decontaminate is the one
    query that re-reads its exported relation — it is not in the bench
    headline set, so the skip never breaks it.)"""
    path = os.path.join(_SKETCH_ORACLE_ROOT, name)
    if os.environ.get("GRAFT_SKIP_ORACLE_EXPORT") == "1":
        return path
    from go_mysql_transfer_ray.state.manifest import atomic_write_parquet_dir

    return atomic_write_parquet_dir(ds, path)


_MINHASH_SIGS_REL = os.path.join(_SKETCH_ORACLE_ROOT, "minhash_sigs")
_SIMHASH_REL = os.path.join(_SKETCH_ORACLE_ROOT, "simhashes")
_NGRAM_SETS_REL = os.path.join(_SKETCH_ORACLE_ROOT, "ngram_sets")
_ANN_LSH_PRUNED_REL = os.path.join(_SKETCH_ORACLE_ROOT, "ann_lsh_pruned")
_ANN_IVF_PRUNED_REL = os.path.join(_SKETCH_ORACLE_ROOT, "ann_ivf_pruned")
_SHINGLE_STREAM_REL = os.path.join(_SKETCH_ORACLE_ROOT, "shingle_stream")
_DECON_STREAM_REL = os.path.join(_SKETCH_ORACLE_ROOT, "decon_stream")
_ANN_QUERIES_REL = os.path.join(_SKETCH_ORACLE_ROOT, "ann_queries")


def q_minhash_dedup(sf_dir: str) -> pa.Table:
    """MinHash-LSH near-dup clustering, with a full SQL restatement: the
    query exports the exploded signature matrix (doc_id, i, v); the
    oracle rebuilds the 32-band×4-row banding, candidate pairs, the
    128-position agreement verify (≥0.8) and the transitive closure with
    min-id labels — the complete algorithm, not just row counts."""
    docs = _docs(sf_dir)

    def explode_sigs(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        m = datapipe._sig_matrix(t.column("sig"), 128)
        n = len(ids)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids.astype(np.int64), 128)),
                "i": pa.array(np.tile(np.arange(128, dtype=np.int32), n)),
                "v": pa.array(np.ascontiguousarray(m.reshape(-1)).view(np.int64)),
            }
        )

    sigs = datapipe.minhash_signatures_ds(docs, "text", "doc_id", 128, 5).materialize()
    _write_rel(sigs.map_batches(explode_sigs, batch_format="pyarrow"), "minhash_sigs")
    return datapipe.minhash_dedup(docs, sigs=sigs)


def q_simhash_dedup(sf_dir: str) -> pa.Table:
    """SimHash near-dup clustering; exports (doc_id, h) so the oracle
    restates the 4-block pigeonhole banding, Hamming≤3 verify
    (bit_count(xor)) and closure in SQL.  The relation is the pipeline's
    own materialized ``simhash_ds`` — one hash pass, shared."""
    docs = _docs(sf_dir)
    hashed = datapipe.simhash_ds(docs, "text", "doc_id").materialize()
    _write_rel(
        hashed.map_batches(
            lambda t: t.rename_columns(["doc_id", "h"]), batch_format="pyarrow"
        ),
        "simhashes",
    )
    return datapipe.simhash_dedup(docs, hashed=hashed)


def q_ann_topk(sf_dir: str) -> pa.Table:
    """Exact brute-force top-k cosine neighbors.  The compared columns
    are (query_id, neighbor_id, rank): rank is the value-level check of
    the cosine ORDER (the oracle recomputes every cosine in DuckDB and
    ranks identically); the raw float is excluded from the hash compare
    because f32-matmul vs DuckDB accumulation differ in final ulps."""
    emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = _query_vectors(sf_dir)
    _write_ann_queries_rel(q)
    out = datapipe.ann_topk(emb, q, k=10)
    return out.select(["query_id", "neighbor_id", "rank"])


def _write_ann_queries_rel(q: np.ndarray) -> None:
    _write_rel(
        ray.data.from_arrow(
            pa.table(
                {
                    "query_id": pa.array(np.arange(len(q), dtype=np.int64)),
                    "embedding": pa.array(
                        [row.tolist() for row in q], pa.list_(pa.float32())
                    ),
                }
            )
        ),
        "ann_queries",
    )


def q_ann_lsh(sf_dir: str) -> pa.Table:
    """LSH-bucketed approximate ANN, value-checkable: the engine-computed
    pruned subset (bucket membership) is exported as a relation, and the
    oracle states EXACT cosine top-k over that subset — so bucket
    assignment, multiprobe expansion, and the final ranking are all
    value-checked; only the hyperplane hash itself is taken as given
    (it defines the operator, like minhash's seeds)."""
    emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = _query_vectors(sf_dir)
    _write_ann_queries_rel(q)
    pruned = datapipe.lsh_prune(emb, q).materialize()
    _write_rel(pruned.select_columns(["vec_id"]), "ann_lsh_pruned")
    out = datapipe.lsh_bucketed_ann(emb, q, k=10, pruned=pruned)
    return out.select(["query_id", "neighbor_id", "rank"])


def q_ngram_jaccard_dedup(sf_dir: str) -> pa.Table:
    """Exact n-gram Jaccard clustering; exports each doc's unique shingle
    hashes (doc_id, h; h NULL marks a shingle-less doc so the oracle
    still covers it) — the oracle restates the bottom-8 anchor candidate
    generation (u64 order via ORDER BY (h<0), h), the exact-Jaccard
    verify and the closure.

    The set relation is UNPACKED from the pipeline's own materialized
    ``ngram_sets_ds`` blobs (zero-copy off the Arrow buffers) instead of
    re-running the shingle pass — one scan, shared with the dedup."""
    docs = _docs(sf_dir)
    sets = datapipe.ngram_sets_ds(docs, "text", "doc_id", 3, 8).materialize()

    def explode_sets(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64()).to_numpy(zero_copy_only=False)
        g = t.column("ngrams")
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        vals, starts, cnts = datapipe.blob_u64_stream(g)
        tot = int(cnts.sum())
        base = np.repeat(starts, cnts)
        run0 = np.repeat(np.r_[0, np.cumsum(cnts)[:-1]], cnts)
        hv = vals[base + (np.arange(tot, dtype=np.int64) - run0)]
        out_ids = np.repeat(ids, cnts)
        out_h = hv.view(np.int64)
        # docs with zero shingles: one NULL-hash row keeps them in the
        # oracle's doc universe
        empty_ids = ids[cnts == 0]
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate([out_ids, empty_ids]).astype(np.int64)
                ),
                "h": pa.concat_arrays(
                    [
                        pa.array(out_h, pa.int64()),
                        pa.nulls(len(empty_ids), pa.int64()),
                    ]
                ),
            }
        )

    _write_rel(
        sets.map_batches(explode_sets, batch_format="pyarrow"), "ngram_sets"
    )
    return datapipe.ngram_jaccard_dedup(docs, threshold=0.8, sets_ds=sets)


def q_ann_ivf(sf_dir: str) -> pa.Table:
    """IVF-flat approximate ANN, value-checkable like ``ann_lsh``: the
    pruned subset (union of each query's nprobe closest inverted lists,
    under the engine's k-means quantizer) is exported; the oracle states
    exact cosine top-k over it."""
    emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = _query_vectors(sf_dir)
    _write_ann_queries_rel(q)
    pruned = datapipe.ivf_prune(emb, q).materialize()
    _write_rel(pruned.select_columns(["vec_id"]), "ann_ivf_pruned")
    out = datapipe.ivf_ann(emb, q, k=10, pruned=pruned)
    return out.select(["query_id", "neighbor_id", "rank"])


def q_embedding_dedup(sf_dir: str) -> pa.Table:
    """The synthetic embeddings have no natural near-dups (max pairwise
    cosine ≈ 0.5), so plant exact duplicates of the 20 SMALLEST vec_ids
    (vec_id + 1_000_000) — deterministic for the SQL oracle, which
    restates the planting and the all-pairs cosine ≥ 0.95 filter.
    ``cosine`` is rounded to 3 decimals on both sides (f32 vs DuckDB
    accumulation differ in final ulps; every true pair here is ≈1.0)."""
    tab = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).sort_by("vec_id")
    dup = tab.slice(0, 20).set_column(
        tab.schema.get_field_index("vec_id"),
        "vec_id",
        pc.add(tab.slice(0, 20).column("vec_id"), 1_000_000),
    )
    emb = ray.data.from_arrow(pa.concat_tables([tab, dup]))
    out = datapipe.embedding_dedup(emb, threshold=0.95)

    def round3(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("cosine"),
            "cosine",
            pc.round(t.column("cosine"), 3),
        )

    return out.map_batches(round3, batch_format="pyarrow")


def _events_as_changes(sf_dir: str):
    """events table → change-stream shape: gtid=event_id, 'error' = delete."""

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "gtid": t.column("event_id"),
                "seq_in_txn": pa.array(
                    np.zeros(t.num_rows, dtype=np.int32), pa.int32()
                ),
                "op": pc.if_else(
                    pc.equal(t.column("event_type"), "error"),
                    pa.scalar("delete"),
                    pa.scalar("insert"),
                ),
                "user_id": t.column("user_id"),
                "event_type": t.column("event_type"),
                "value": t.column("value"),
            }
        )

    return (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "event_type", "value"],
        )
        .map_batches(fn, batch_format="pyarrow")
    )


def q_redis_string_state(sf_dir: str):
    """K1 String structure: SET/DEL converged state (M10 key encoding)."""
    from go_mysql_transfer_ray.stages.redis_state import RedisConfig, RedisPlan, structure_state

    plan = RedisPlan(
        RedisConfig(structure="string", key_prefix="evt:", key_column="user_id"),
        pk_columns=("user_id",),
    )
    return structure_state(
        _events_as_changes(sf_dir), plan, value_col="event_type"
    )


def q_redis_hash_state(sf_dir: str):
    """K1 Hash structure: HSET/HDEL per (fixed key, field column)."""
    from go_mysql_transfer_ray.stages.redis_state import RedisConfig, RedisPlan, structure_state

    plan = RedisPlan(
        RedisConfig(structure="hash", key_value="users", hash_field_column="user_id"),
        pk_columns=("user_id",),
    )
    return structure_state(
        _events_as_changes(sf_dir), plan, value_col="event_type"
    )


def q_redis_zset_state(sf_dir: str):
    """K1 SortedSet: ZADD(score)/ZREM — incl. the score-column-index-in-
    hash-field-slot quirk (/root/reference/global/rule.go:520-524)."""
    from go_mysql_transfer_ray.stages.redis_state import RedisConfig, RedisPlan, structure_state

    plan = RedisPlan(
        RedisConfig(
            structure="sortedset",
            key_value="leaderboard",
            sorted_set_score_column="value",
        ),
        pk_columns=("user_id",),
    )
    return structure_state(
        _events_as_changes(sf_dir), plan, value_col="user_id"
    )


def q_redis_set_state(sf_dir: str):
    """K1 Set structure: SADD membership (distinct event types per user)."""
    from go_mysql_transfer_ray.stages.redis_state import RedisConfig, RedisPlan, structure_state

    def all_inserts(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("op"),
            "op",
            pa.array(["insert"] * t.num_rows, pa.string()),
        )

    plan = RedisPlan(
        RedisConfig(structure="set", key_prefix="seen:", key_column="user_id"),
        pk_columns=("user_id",),
    )
    ds = _events_as_changes(sf_dir).map_batches(all_inserts, batch_format="pyarrow")
    return structure_state(ds, plan, value_col="event_type")


_LUA_STRING_RULE = """
local ops = require("redisOps")
local row = ops.rawRow()
local act = ops.rawAction()
local key = "evt:" .. row["user_id"]
if act == "delete" then
  ops.DEL(key)
else
  ops.SET(key, row["event_type"])
end
"""


def q_lua_redis_rule(sf_dir: str):
    """K8/T1-T3: a REAL Lua rule script executed per change row (in-tree
    mini-Lua interpreter, functions/lua_mini.py) — semantics mirror
    /root/reference/service/luaengine/redis_actuator.go:59-245.  The
    converged string state must equal the declarative redis_string_state
    rule, which is exactly what the oracle SQL states."""
    from go_mysql_transfer_ray.pipelines.lua_rules import lua_redis_state

    out = lua_redis_state(
        _events_as_changes(sf_dir),
        _LUA_STRING_RULE,
        payload_cols=("user_id", "event_type"),
    )
    return out.select_columns(["redis_key", "value"])


_LUA_LIST_RULE = """
local ops = require("redisOps")
local row = ops.rawRow()
local act = ops.rawAction()
local key = "lst:" .. row["user_id"]
if act == "delete" then
  ops.LREM(key, "click")
else
  ops.RPUSH(key, row["event_type"])
end
"""


def q_lua_redis_list_rule(sf_dir: str):
    """K1/K8 via the Lua surface, LIST structure: RPUSH/LREM ops decoded
    from a real rule script ride the per-key ORDERED replay (not the LWW
    merge, which would collapse a list to its last value — round-2
    advisory).  'error' events LREM every 'click' pushed so far
    (redis.go:240-246 LREM count=0 removes ALL occurrences); the oracle
    states survival as 'no later LREM of my value' + row_number order."""
    from go_mysql_transfer_ray.pipelines.lua_rules import lua_redis_list_state

    out = lua_redis_list_state(
        _events_as_changes(sf_dir),
        _LUA_LIST_RULE,
        payload_cols=("user_id", "event_type"),
    )

    def widen(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("list_pos"),
            "list_pos",
            pc.cast(t.column("list_pos"), pa.int64()),
        )

    return out.map_batches(widen, batch_format="pyarrow")


_LUA_DBOPS_RULE = """
local db = require("dbOps")
local ops = require("redisOps")
local row = ops.rawRow()
local dim = db.selectOne("select n_name from nation where n_nationkey = ?", row["user_id"] % 25)
if dim then
  ops.SET("u:" .. row["user_id"], dim["n_name"])
end
"""


def q_lua_dbops_enrich(sf_dir: str):
    """T4 through the Lua surface: dbOps.selectOne lookup join executed
    inside a rule script (/root/reference/service/luaengine/
    db_actuator.go:39-124) — the dimension is a broadcast dict held by
    the script actor, never a per-row RPC.  Every event SETs its user's
    nation; LWW leaves one row per user."""
    from go_mysql_transfer_ray.pipelines.lua_rules import lua_redis_state

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    lookup = {
        float(k): {"n_name": v}
        for k, v in zip(
            nation.column("n_nationkey").to_pylist(),
            nation.column("n_name").to_pylist(),
        )
    }

    def all_inserts(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("op"),
            "op",
            pa.array(["insert"] * t.num_rows, pa.string()),
        )

    ds = _events_as_changes(sf_dir).map_batches(all_inserts, batch_format="pyarrow")
    out = lua_redis_state(
        ds, _LUA_DBOPS_RULE, payload_cols=("user_id",), lookup=lookup
    )
    return out.select_columns(["redis_key", "value"])


_LUA_MONGO_RULE = """
local mongo = require("mongodbOps")
local row = mongo.rawRow()
local act = mongo.rawAction()
if act == "insert" then
  mongo.INSERT("users", {_id = row["user_id"], user_id = row["user_id"],
                         event_type = row["event_type"], value = row["value"]})
elseif act == "delete" then
  mongo.DELETE("users", row["user_id"])
else
  mongo.UPSERT("users", row["user_id"], {user_id = row["user_id"], value = row["value"]})
end
"""


def q_lua_mongo_upsert(sf_dir: str):
    """K2 via the Lua surface: INSERT replaces the doc, UPSERT $set-creates
    (SetUpsert(true), /root/reference/service/luaengine/mongo_actuator.go:
    77-91 → mongo.go:141-149), DELETE removes — the field-wise merge with
    upsert liveness.  purchase=INSERT (full doc), error=DELETE, everything
    else UPSERT carrying only (user_id, value)."""
    from go_mysql_transfer_ray.pipelines.lua_rules import lua_mongo_state

    def to_ops(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        op = pc.if_else(
            pc.equal(et, "purchase"), pa.scalar("insert"),
            pc.if_else(pc.equal(et, "error"), pa.scalar("delete"), pa.scalar("update")),
        )
        return pa.table(
            {
                "gtid": t.column("event_id"),
                "seq_in_txn": pa.array(np.zeros(t.num_rows, dtype=np.int32)),
                "op": op,
                "user_id": t.column("user_id"),
                "event_type": et,
                "value": t.column("value"),
            }
        )

    ds = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "event_type", "value"],
        )
        .map_batches(to_ops, batch_format="pyarrow")
    )
    return lua_mongo_state(
        ds,
        _LUA_MONGO_RULE,
        payload_cols=("user_id", "event_type", "value"),
        doc_cols=("user_id", "event_type", "value"),
    )


_LUA_ES_RULE = """
local es = require("esOps")
local row = es.rawRow()
es.INSERT("events", row["event_id"], {user_id = row["user_id"], event_type = row["event_type"]})
"""


def q_lua_es_ops(sf_dir: str):
    """K3/K4 via the Lua surface: per-row ES bulk ops emitted by a script
    (es_actuator.go:45-140), body = Go json.Marshal of the Lua table
    (sorted keys), ES6 ``_type`` on every op."""
    from go_mysql_transfer_ray.pipelines.lua_rules import lua_es_ops

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "op": pa.array(["insert"] * t.num_rows, pa.string()),
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "event_type": t.column("event_type"),
            }
        )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "event_type"],
    ).map_batches(prep, batch_format="pyarrow")
    return lua_es_ops(
        ds, _LUA_ES_RULE, payload_cols=("event_id", "user_id", "event_type")
    )


def q_es6_bulk_ops(sf_dir: str):
    """K4 ES6 variant: bulk ops carry ``_type`` on every operation
    (/root/reference/service/endpoint/elastic6.go:191-246), index
    defaults to the table name, type to '_doc' (rule.go:585-591)."""
    from go_mysql_transfer_ray.functions.es_mapping import es6_bulk_ops

    plan = RulePlan(
        RuleConfig(
            include_columns="c_custkey,c_name",
            value_encoder="json",
            primary_keys=("c_custkey",),
        ),
        [ColumnSpec("c_custkey", "number"), ColumnSpec("c_name", "string")],
    )

    def fn(t: pa.Table) -> pa.Table:
        return es6_bulk_ops(plan, t, table_name="customer")

    return ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    ).map_batches(fn, batch_format="pyarrow")


def q_redis_list_state(sf_dir: str):
    """K1 List structure: RPUSH replay in (gtid, seq) order per key —
    the ordered fold (redis.go:239-252).  Driver query uses the
    insert-only path (LREM removal is order-dependent state covered by
    pytest); final list position is SQL row_number per user."""
    from go_mysql_transfer_ray.stages.redis_state import (
        RedisConfig, RedisPlan, list_state,
    )

    def all_inserts(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("op"),
            "op",
            pa.array(["insert"] * t.num_rows, pa.string()),
        )

    plan = RedisPlan(
        RedisConfig(structure="list", key_prefix="log:", key_column="user_id"),
        pk_columns=("user_id",),
    )
    ds = _events_as_changes(sf_dir).map_batches(all_inserts, batch_format="pyarrow")
    out = list_state(ds, plan, value_col="event_type")

    def widen(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("list_pos"),
            "list_pos",
            pc.cast(t.column("list_pos"), pa.int64()),
        )

    return out.map_batches(widen, batch_format="pyarrow")


def q_dedup_clusters_distributed(sf_dir: str) -> "ray.data.Dataset":
    """Distributed connected components (large-star/small-star) over the
    planted-duplicate embedding pairs — the scale path replacing the
    driver union-find."""
    pairs = q_embedding_dedup(sf_dir)
    # small_graph_edges=0 forces the large-star/small-star rounds so the
    # driver exercises the distributed path, not the single-task fast path
    return datapipe.connected_components(
        pairs.select_columns(["a", "b"]), small_graph_edges=0
    )


def q_message_envelopes(sf_dir: str):
    cfg = _binlog_cfg(sf_dir)
    events_dir = materialize_events(cfg, root=_EVENT_CACHE_ROOT, shards=8)
    return message_sink.message_stream(
        events_dir, RuleConfig(include_columns="repo,path,lang", reserve_raw_data=True)
    )


def q_message_envelopes_sql(sf_dir: str):
    """K5 MQ envelope, SQL-checkable variant: no reserve_raw_data (the
    ``raw`` update path is pytest-covered in test_rule_pipeline), so the
    envelope is a pure function of the decoded change row — the oracle
    rebuilds it string-for-string from the decoded-stream relation."""
    cfg = _binlog_cfg(sf_dir)
    events_dir = materialize_events(cfg, root=_EVENT_CACHE_ROOT, shards=8)
    cdc.write_decoded_changes(events_dir, _CHANGES_ORACLE_PATH)
    return message_sink.message_stream(
        events_dir,
        RuleConfig(include_columns="repo,path,lang", value_encoder="json"),
    )


def q_group_topk(sf_dir: str):
    """Per-group top-k selection (curation best-of filter): the 3 docs
    with the most whitespace tokens per language, ties broken by doc_id.
    Two-phase top-k — each block self-reduces to ≤k rows per group, the
    k-sized partials ride the storage shuffle keyed on the group."""
    docs = _docs(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": t.column("lang"),
                "n_tokens": textfn.token_count(t.column("text")),
            }
        )

    return datapipe.group_topk(
        docs.map_batches(fn, batch_format="pyarrow"),
        group_col="lang",
        order_col="n_tokens",
        id_col="doc_id",
        k=3,
    )


def q_deterministic_shard(sf_dir: str):
    """Deterministic training-order shuffle: Knuth hash with seed 7 →
    shard h%8 → (h, id)-ordered position within shard.  Pure function of
    (doc_id, seed): the oracle restates hash, shard and rank in SQL."""
    return datapipe.deterministic_shard(
        _docs(sf_dir).select_columns(["doc_id"]),
        id_col="doc_id",
        n_shards=8,
        seed=7,
    )


def q_media_features(sf_dir: str):
    """Real container decode (PPM/BMP images, WAV audio, Y4M video) over
    a deterministic synthetic corpus.  Every emitted feature (dims,
    frame/sample counts, duration, channel/amplitude/luma sums) is an
    exact integer the engine derives from the PAYLOAD BYTES; the oracle
    restates each from the generator's closed-form parameter formulas —
    a hash match proves the decode inverted the encode."""
    tab = multimodal.synthetic_media_table(n=120)
    return multimodal.media_features(ray.data.from_arrow(tab))


def _live_loop_run(dataset_fn, endpoint, server, *, frame_col: str,
                   fail_after: int, batch_size: int = 2048):
    """Shared live-delivery runner: LiveSinkLoop with a position file in
    a fresh temp dir, plus a deterministic mid-stream fault — the sink
    dies after ``fail_after`` commands/requests and heals on the
    recovery loop's first ping sleep, so every CORRECTNESS row for a
    live query also evidences the pause → ping → resume-from-checkpoint
    path (handler.go:173-181, transfer_service.go:328-354)."""
    import tempfile

    from go_mysql_transfer_ray.pipelines.live_sink import (
        FilePositionStore,
        LiveSinkLoop,
        frame_stream,
    )

    server.fail_after(fail_after)
    healer = {"done": False}

    def heal_once(dt):
        if not healer["done"]:
            server.heal()
            healer["done"] = True

    loop = LiveSinkLoop(
        endpoint,
        FilePositionStore(
            os.path.join(tempfile.mkdtemp(prefix="live_pos_"), "pos.json")
        ),
        pos_save_every=3,
        ping_interval=0.0,
        sleep=heal_once,
    )
    return loop.run(
        frame_stream(dataset_fn, frame_col=frame_col, batch_size=batch_size)
    )


def q_live_resp_state(sf_dir: str):
    """The reference's DAEMON runtime, end to end: the exact RESP frames
    of a string-structure Redis rule (redis.go:228-231) delivered over a
    real 127.0.0.1 TCP socket to an in-process RESP v2 server, through
    the Connect/Ping/Consume loop with a mid-stream sink kill + heal —
    consume error → pause → ping → resume from the saved position
    (handler.go:173-181, transfer_service.go:328-354).  Returns the
    server's converged string keyspace, which must hash-match the same
    LWW SQL as the batch-converged ``redis_string_state``: at-least-once
    redelivery over idempotent SET/DEL converges byte-identically."""
    from go_mysql_transfer_ray.functions.loopback import LoopbackRespServer
    from go_mysql_transfer_ray.functions.wire import redis_resp_stream
    from go_mysql_transfer_ray.pipelines.live_sink import RespEndpoint
    from go_mysql_transfer_ray.stages.redis_state import RedisConfig, RedisPlan

    plan = RedisPlan(
        RedisConfig(structure="string", key_prefix="evt:", key_column="user_id"),
        pk_columns=("user_id",),
    )

    def frames(t: pa.Table) -> pa.Table:
        return redis_resp_stream(plan, t, value_col="event_type")

    def dataset_fn(from_gtid: int):
        def prune(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater(t.column("gtid"), from_gtid))

        return (
            _events_as_changes(sf_dir)
            .map_batches(prune, batch_format="pyarrow")
            .map_batches(frames, batch_format="pyarrow")
        )

    server = LoopbackRespServer().start()
    try:
        _live_loop_run(
            dataset_fn, RespEndpoint(server.address), server,
            frame_col="resp", fail_after=600,
        )
        snap = server.snapshot()
    finally:
        server.stop()
    keys = sorted(k for k, (typ, _) in snap.items() if typ == "string")
    return pa.table(
        {
            "redis_key": pa.array(keys, pa.string()),
            "value": pa.array([snap[k][1] for k in keys], pa.string()),
        }
    )


def q_live_es_state(sf_dir: str):
    """The HTTP-bulk half of the live loop: ES7 typeless bulk NDJSON
    bodies (elastic7.go bulk path) POSTed to an in-process /_bulk
    endpoint with the same kill + heal mid-stream; the converged doc
    store (delete drops, index puts, LWW by delivery order) must
    hash-match the SQL restatement."""
    from go_mysql_transfer_ray.functions.loopback import LoopbackHttpBulkServer
    from go_mysql_transfer_ray.functions.wire import es_bulk_ndjson
    from go_mysql_transfer_ray.pipelines.live_sink import HttpBulkEndpoint

    def frames(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("user_id"), pa.string())
        body = pc.binary_join_element_wise(
            '{"user_id":', ids, ',"event_type":"', t.column("event_type"),
            '"}', "",
        )
        ops = pa.table(
            {
                "es_index": pa.array(["events"] * t.num_rows, pa.string()),
                "es_type": pa.array(["_doc"] * t.num_rows, pa.string()),
                "id": ids,
                "action": t.column("op"),
                "body": body,
            }
        )
        nd = es_bulk_ndjson(ops, include_type=False)
        return pa.table({"gtid": t.column("gtid"), "ndjson": nd.column("ndjson")})

    def dataset_fn(from_gtid: int):
        def prune(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater(t.column("gtid"), from_gtid))

        return (
            _events_as_changes(sf_dir)
            .map_batches(prune, batch_format="pyarrow")
            .map_batches(frames, batch_format="pyarrow")
        )

    server = LoopbackHttpBulkServer().start()
    try:
        # HTTP faults tick per request: die on the 3rd, heal on ping
        _live_loop_run(
            dataset_fn, HttpBulkEndpoint(server.address), server,
            frame_col="ndjson", fail_after=3,
        )
        docs = server.snapshot()
    finally:
        server.stop()
    ids = sorted(docs, key=int)
    return pa.table(
        {
            "id": pa.array(ids, pa.string()),
            "user_id": pa.array(
                [docs[i]["user_id"] for i in ids], pa.int64()
            ),
            "event_type": pa.array(
                [docs[i]["event_type"] for i in ids], pa.string()
            ),
        }
    )


def q_redis_resp_wire(sf_dir: str):
    """Exact RESP pipeline bytes for a string-structure Redis rule over
    the events change stream — the frames the reference's go-redis
    pipeline transmits per row (service/endpoint/redis.go:228-231:
    delete → DEL key, else SET key val).  The oracle reassembles every
    frame byte-for-byte in SQL (bulk-string lengths = strlen bytes)."""
    from go_mysql_transfer_ray.functions.wire import redis_resp_stream
    from go_mysql_transfer_ray.stages.redis_state import RedisConfig, RedisPlan

    plan = RedisPlan(
        RedisConfig(structure="string", key_prefix="evt:", key_column="user_id"),
        pk_columns=("user_id",),
    )

    def fn(t: pa.Table) -> pa.Table:
        return redis_resp_stream(plan, t, value_col="event_type")

    return _events_as_changes(sf_dir).map_batches(fn, batch_format="pyarrow")


def q_es_bulk_wire(sf_dir: str):
    """ES bulk-API NDJSON body lines for the stock export of the
    customer rule — action/metadata line + source line exactly as the
    reference's bulk client serializes index requests
    (service/endpoint/elastic6.go:293-295)."""
    from go_mysql_transfer_ray.functions.es_mapping import es6_bulk_ops
    from go_mysql_transfer_ray.functions.wire import es_bulk_ndjson

    plan = RulePlan(
        RuleConfig(
            include_columns="c_custkey,c_name",
            value_encoder="json",
            primary_keys=("c_custkey",),
        ),
        [ColumnSpec("c_custkey", "number"), ColumnSpec("c_name", "string")],
    )

    def fn(t: pa.Table) -> pa.Table:
        return es_bulk_ndjson(es6_bulk_ops(plan, t, table_name="customer"))

    return ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    ).map_batches(fn, batch_format="pyarrow")


def q_mongo_bulk_wire(sf_dir: str):
    """Extended-JSON bulkWrite models for a Mongo rule over the events
    change stream — insert documents / $set updates / delete filters
    exactly as the reference builds its WriteModels
    (service/endpoint/mongo.go:167-178), with _id injected first."""
    from go_mysql_transfer_ray.functions.wire import mongo_bulk_models

    plan = RulePlan(
        RuleConfig(
            include_columns="user_id,event_type",
            value_encoder="json",
            primary_keys=("user_id",),
        ),
        [ColumnSpec("user_id", "number"), ColumnSpec("event_type", "string")],
    )

    def fn(t: pa.Table) -> pa.Table:
        ops = pa.table(
            {
                "id": plan.build_key(t),
                "action": t.column("op"),
                "body": plan.encode_values(plan.apply(t)),
            }
        )
        out = mongo_bulk_models(ops)
        return pa.table(
            {
                "gtid": t.column("gtid"),
                "id": out.column("id"),
                "action": out.column("action"),
                "model": out.column("model"),
            }
        )

    return _events_as_changes(sf_dir).map_batches(fn, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    # NOTE on ordering: the driver checks the FIRST 50 entries against
    # their oracles each round.  Round-5 window: (1) every query whose
    # code path changed this round sits first — the new live sink loop
    # (pipelines/live_sink.py, functions/loopback.py), multimodal
    # (vectorized decode), message envelopes + all cdc-replay queries
    # (pipelines/cdc.py: facts fan-out + rule-projection pushdown;
    # stages/rule_engine.py: LRU plan cache), the wire encoders
    # (functions/wire.py: C0-control escaping) and the Lua queries
    # (functions/lua_mini.py: math.random interval validation);
    # (2) the 13 queries whose last green row dates to r3 re-enter the
    # window to refresh their evidence; (3) the remaining slots re-green
    # r4-verified operators, including every family whose module changed
    # late in r5 (pipelines/datapipe.py dedup/ANN/shard/split/pack,
    # stages/redis_state.py score/stringify parity, windows.py asof,
    # functions/encoders.py encode_json).  The 15-entry tail holds only
    # queries green in a prior round whose CODE PATHS are untouched this
    # round (functions/text.py, dateformat, es_mapping, the tumbling/
    # hopping aggregate functions, datapipe group_topk/vocab/
    # decontaminate).
    return {
        # --- (1) code paths changed in r5 -------------------------------
        "redis_string_state": q_redis_string_state,
        "redis_hash_state": q_redis_hash_state,
        "redis_zset_state": q_redis_zset_state,
        "redis_set_state": q_redis_set_state,
        "redis_list_state": q_redis_list_state,
        "asof_last_purchase": q_asof_last_purchase,
        "live_resp_state": q_live_resp_state,
        "live_es_state": q_live_es_state,
        "media_features": q_media_features,
        "message_envelopes": q_message_envelopes,
        "message_envelopes_sql": q_message_envelopes_sql,
        "redis_resp_wire": q_redis_resp_wire,
        "es_bulk_wire": q_es_bulk_wire,
        "mongo_bulk_wire": q_mongo_bulk_wire,
        "cdc_replay_repos": q_cdc_replay_repos,
        "cdc_replay_two_tables": q_cdc_replay_two_tables,
        "ingest_jsonl_replay": q_ingest_jsonl_replay,
        "lua_redis_rule": q_lua_redis_rule,
        "lua_redis_list_rule": q_lua_redis_list_rule,
        "lua_dbops_enrich": q_lua_dbops_enrich,
        "lua_mongo_upsert": q_lua_mongo_upsert,
        "lua_es_ops": q_lua_es_ops,
        # --- (2) last green row is r3 — refresh the evidence -------------
        "value_encoder_kv": q_value_encoder_kv,
        "value_encoder_json": q_value_encoder_json,
        "value_encoder_vcommas": q_value_encoder_vcommas,
        "value_formatter_template": q_value_formatter_template,
        "es6_bulk_ops": q_es6_bulk_ops,
        "redact_text": q_redact_text,
        "stratified_sample": q_stratified_sample,
        # --- (3) r4-green, untouched — re-verified while room remains ----
        "cdc_last_state_per_user": q_cdc_last_state_per_user,
        "mongo_fieldwise_state": q_mongo_fieldwise_state,
        "metrics_action_counts": q_metrics_action_counts,
        "stock_projection_rule": q_stock_projection_rule,
        "composite_key_lineitem": q_composite_key_lineitem,
        "events_filter_project": q_events_filter_project,
        # RulePlan.__init__ / build_key changed in the final review sweep
        # (reserved-meta guard, formatter-aware single-PK key) — these two
        # traverse it, so they re-enter the window; fingerprints and
        # chunk_documents (text.py / chunking untouched this round) rotate
        # to the tail in their place
        "date_format_orders": q_date_format_orders,
        "es_mapping_infer": q_es_mapping_infer,
        "sessionize": q_sessionize,
        # datapipe.py changed late in r5 (_knuth_hash consolidation,
        # exact-integer pack ranges) — these three re-enter the window
        "deterministic_shard": q_deterministic_shard,
        "train_test_split": q_train_test_split,
        "pack_sequences": q_pack_sequences,
        "dedup_exact": q_dedup_exact,
        "minhash_dedup": q_minhash_dedup,
        "simhash_dedup": q_simhash_dedup,
        "ann_topk": q_ann_topk,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "ngram_jaccard_dedup": q_ngram_jaccard_dedup,
        "embedding_dedup": q_embedding_dedup,
        "dedup_clusters_distributed": q_dedup_clusters_distributed,
        # ---------------- 50-slot window boundary -------------------------
        # --- stable tail: green in r4, modules untouched this round ------
        "doc_token_counts": q_doc_token_counts,
        "tpch_q1ish": q_tpch_q1ish,
        "fingerprints": q_fingerprints,
        "lookup_join_nation": q_lookup_join_nation,
        "doc_quality": q_doc_quality,
        "chunk_documents": q_chunk_documents,
        "group_topk": q_group_topk,
        "window_daily_stats": q_window_daily_stats,
        "hopping_daily_stats": q_hopping_daily_stats,
        "group_lang_stats": q_group_lang_stats,
        "repetition_stats": q_repetition_stats,
        "vocab_topk": q_vocab_topk,
        "decontaminate": q_decontaminate,
        "json_props_stats": q_json_props_stats,
        "lang_id": q_lang_id,
    }


def oracle_sql() -> dict[str, str]:
    return {
        # the flagship invariant, stated in SQL over the decoded change
        # stream the replay itself consumed (written by q_cdc_replay_repos):
        # last (gtid, seq) writer wins per key, delete tombstones drop
        "cdc_replay_repos": f"""
            WITH ch AS (
                SELECT * FROM read_parquet('{_CHANGES_ORACLE_PATH}/*.parquet')
            ),
            ranked AS (
                SELECT repo, path, "commit", lang, content, stars, op,
                       row_number() OVER (
                           PARTITION BY "key"
                           ORDER BY gtid DESC, seq_in_txn DESC
                       ) AS rn
                FROM ch
            )
            SELECT repo, path, "commit", lang, content, stars
            FROM ranked WHERE rn = 1 AND op <> 'delete'
        """,
        # two tables' LWW in one relation: the decoded multi stream's key
        # embeds the table, so ONE window states both tables; per-table
        # rule effects (rename lang→language / plan→tier, appended default
        # src='cdc' on users) are restated column-for-column
        "cdc_replay_two_tables": f"""
            WITH ch AS (
                SELECT * FROM read_parquet('{_MULTI_CHANGES_ORACLE_PATH}/*.parquet')
            ),
            ranked AS (
                SELECT "table", repo, path, lang, stars, user_id, plan, op,
                       row_number() OVER (
                           PARTITION BY "key"
                           ORDER BY gtid DESC, seq_in_txn DESC
                       ) AS rn
                FROM ch
            )
            SELECT "table" AS src_table, repo, path,
                   lang AS language, stars, user_id,
                   plan AS tier,
                   CASE WHEN "table" = 'users' THEN 'cdc' END AS src
            FROM ranked WHERE rn = 1 AND op <> 'delete'
        """,
        # the JSONL-envelope ingestion query derives its stream
        # deterministically from documents (insert per doc, update for
        # doc_id%3==0 with commit c1 + 'u:' content, delete for
        # doc_id%7==0), so the surviving LWW images are statable directly
        "ingest_jsonl_replay": """
            SELECT source AS repo,
                   'doc' || CAST(doc_id AS VARCHAR) || '.txt' AS path,
                   CASE WHEN doc_id % 3 = 0 THEN 'c1' ELSE 'c0' END AS "commit",
                   lang,
                   CASE WHEN doc_id % 3 = 0 THEN 'u:' || text ELSE text END AS content
            FROM documents
            WHERE doc_id % 7 <> 0
        """,
        "cdc_last_state_per_user": """
            WITH ranked AS (
                SELECT user_id, event_id, event_type, value,
                       row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
                FROM events
            )
            SELECT user_id, event_id, event_type, value
            FROM ranked WHERE rn = 1 AND event_type <> 'error'
        """,
        "mongo_fieldwise_state": """
            WITH base AS (
                SELECT user_id, event_id, event_type, value,
                       CASE WHEN event_type = 'error' THEN 'delete'
                            WHEN event_type = 'purchase' THEN 'insert'
                            ELSE 'update' END AS op
                FROM events
            ),
            last_ins AS (
                SELECT user_id, max(event_id) AS li FROM base
                WHERE op = 'insert' GROUP BY user_id
            ),
            last_del AS (
                SELECT user_id, max(event_id) AS ld FROM base
                WHERE op = 'delete' GROUP BY user_id
            ),
            alive AS (
                SELECT i.user_id, i.li FROM last_ins i
                LEFT JOIN last_del d ON i.user_id = d.user_id
                WHERE d.ld IS NULL OR i.li > d.ld
            ),
            lastv AS (
                SELECT b.user_id, b.value,
                       row_number() OVER (PARTITION BY b.user_id ORDER BY b.event_id DESC) AS rn
                FROM base b JOIN alive a
                  ON b.user_id = a.user_id AND b.event_id >= a.li AND b.op <> 'delete'
            )
            SELECT a.user_id, 'purchase' AS event_type, v.value
            FROM alive a JOIN lastv v ON v.user_id = a.user_id AND v.rn = 1
        """,
        "metrics_action_counts": """
            SELECT event_type, count(*) AS n FROM events GROUP BY event_type
        """,
        "stock_projection_rule": """
            SELECT c_custkey, c_name AS name, c_mktsegment, 'stock' AS source
            FROM customer
        """,
        "composite_key_lineitem": """
            SELECT l_orderkey, l_linenumber,
                   CAST(l_orderkey AS VARCHAR) || CAST(l_linenumber AS VARCHAR) AS key
            FROM lineitem
        """,
        "value_encoder_kv": """
            SELECT c_custkey,
                   'c_custkey=' || CAST(c_custkey AS VARCHAR) || ',c_name=' || c_name AS encoded
            FROM customer
        """,
        "value_encoder_json": """
            SELECT c_custkey,
                   '{"c_custkey":' || CAST(c_custkey AS VARCHAR) || ',"c_name":"' || c_name || '"}' AS encoded
            FROM customer
        """,
        "value_formatter_template": """
            SELECT c_custkey,
                   'c:' || CAST(c_custkey AS VARCHAR) || '-' || c_name AS encoded
            FROM customer
        """,
        "value_encoder_vcommas": """
            SELECT c_custkey,
                   CAST(c_custkey AS VARCHAR) || ',' || c_name || ',' || c_mktsegment AS encoded
            FROM customer
        """,
        "events_filter_project": """
            SELECT event_id, user_id, value FROM events
            WHERE event_type = 'purchase' AND value > 100.0
        """,
        "lookup_join_nation": """
            SELECT e.event_id, e.user_id, n.n_name
            FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
        """,
        "tpch_q1ish": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "window_daily_stats": """
            SELECT date_trunc('day', ts) AS window_start, event_type,
                   count(*) AS n,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
            FROM events GROUP BY 1, 2
        """,
        "hopping_daily_stats": """
            SELECT date_trunc('day', ts) - (k.k * INTERVAL 1 DAY) AS window_start,
                   event_type,
                   count(*) AS n,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
            FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) k
            GROUP BY 1, 2
        """,
        "sessionize": """
            WITH e AS (
                SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events
            ), flags AS (
                SELECT user_id, t,
                       CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 3600
                            THEN 1 ELSE 0 END AS new_sess
                FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
            ), sess AS (
                SELECT user_id, t,
                       CAST(SUM(new_sess) OVER (
                           PARTITION BY user_id ORDER BY t
                           ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_seq
                FROM flags
            )
            SELECT user_id, session_seq, count(*) AS n_events,
                   min(t) AS start_ts, max(t) AS end_ts
            FROM sess GROUP BY user_id, session_seq
        """,
        "asof_last_purchase": """
            SELECT event_id, user_id,
                   LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_value
            FROM events
        """,
        "date_format_orders": """
            SELECT o_orderkey,
                   strftime(o_orderdate, '%d/%m/%Y %H:%M:%S') AS o_orderdate
            FROM orders
        """,
        "doc_token_counts": r"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE array_length(string_split_regex(trim(text), '\s+'))
                   END AS n_tokens,
                   coalesce(array_length(regexp_extract_all(
                       text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+')), 0)
                     AS n_bpe_tokens
            FROM documents
        """,
        # 128-char windows, stride 96: window k starts at k*96; k=0 always
        # emitted, k>=1 iff the doc extends past the previous window
        "chunk_documents": r"""
            SELECT doc_id, t.k AS chunk_id,
                   substr(text, CAST(t.k * 96 + 1 AS BIGINT), 128) AS chunk
            FROM documents,
                 unnest(generate_series(0,
                     CASE WHEN length(text) <= 128 THEN 0
                          ELSE CAST(ceil((length(text) - 128) / 96.0) AS BIGINT)
                     END)) AS t(k)
        """,
        "doc_quality": r"""
            SELECT doc_id,
                   length(text) AS n_chars,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE array_length(string_split_regex(trim(text), '\s+'))
                   END AS n_tokens,
                   length(regexp_replace(text, '[^.,;:!?''"()\[\]{}]', '', 'g')) AS n_punct,
                   CAST(length(regexp_replace(text, '[^.,;:!?''"()\[\]{}]', '', 'g')) AS DOUBLE)
                       / GREATEST(length(text), 1) AS punct_ratio,
                   CAST(GREATEST(length(text), 1) AS DOUBLE)
                       / GREATEST(CASE WHEN trim(text) = '' THEN 0
                                       ELSE array_length(string_split_regex(trim(text), '\s+'))
                                  END, 1) AS mean_tok_len,
                   0.5 * LEAST(CAST(length(text) AS DOUBLE) / 400.0, 1.0)
                   + 0.2 * LEAST(CAST(length(regexp_replace(text, '[^.,;:!?''"()\[\]{}]', '', 'g')) AS DOUBLE)
                                 / GREATEST(length(text), 1) * 10.0, 1.0)
                   + 0.3 * (CASE WHEN CAST(GREATEST(length(text), 1) AS DOUBLE)
                                      / GREATEST(CASE WHEN trim(text) = '' THEN 0
                                                      ELSE array_length(string_split_regex(trim(text), '\s+'))
                                                 END, 1) BETWEEN 3.0 AND 12.0
                                 THEN 1.0 ELSE 0.0 END) AS quality
            FROM documents
        """,
        "es_mapping_infer": """
            SELECT * FROM (VALUES
                ('c_acctbal', 'float', TRUE),
                ('c_custkey', 'long', FALSE),
                ('c_mktsegment', 'keyword', TRUE),
                ('c_name', 'text', TRUE),
                ('source', 'keyword', TRUE)
            ) AS t(field, es_type, in_delta)
        """,
        "lua_redis_rule": """
            WITH ranked AS (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
                FROM events
            )
            SELECT 'evt:' || CAST(user_id AS VARCHAR) AS redis_key,
                   event_type AS value
            FROM ranked WHERE rn = 1 AND event_type <> 'error'
        """,
        # Lua list replay: a push survives unless its value is 'click' AND
        # a later 'error' event LREMs the key (count=0 = ALL occurrences);
        # final positions = push order over survivors
        "lua_redis_list_rule": """
            WITH pushes AS (
                SELECT user_id, event_id, event_type FROM events
                WHERE event_type <> 'error'
            ),
            dels AS (
                SELECT user_id, event_id FROM events WHERE event_type = 'error'
            ),
            survive AS (
                SELECT p.user_id, p.event_id, p.event_type
                FROM pushes p
                WHERE NOT (p.event_type = 'click' AND EXISTS (
                    SELECT 1 FROM dels d
                    WHERE d.user_id = p.user_id AND d.event_id > p.event_id
                ))
            )
            SELECT 'lst:' || CAST(user_id AS VARCHAR) AS redis_key,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY event_id
                   ) - 1 AS list_pos,
                   event_type AS value
            FROM survive
        """,
        "lua_dbops_enrich": """
            SELECT DISTINCT 'u:' || CAST(e.user_id AS VARCHAR) AS redis_key,
                   n.n_name AS value
            FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
        """,
        "lua_mongo_upsert": """
            WITH base AS (
                SELECT user_id, event_id, event_type, value,
                       CASE WHEN event_type = 'error' THEN 'delete'
                            WHEN event_type = 'purchase' THEN 'insert'
                            ELSE 'upsert' END AS op
                FROM events
            ),
            ld AS (SELECT user_id, max(event_id) AS d FROM base WHERE op = 'delete' GROUP BY user_id),
            li AS (SELECT user_id, max(event_id) AS i FROM base WHERE op = 'insert' GROUP BY user_id),
            fca AS (
                SELECT b.user_id, min(b.event_id) AS c
                FROM base b LEFT JOIN ld ON b.user_id = ld.user_id
                WHERE b.op IN ('insert', 'upsert') AND b.event_id > COALESCE(ld.d, -1)
                GROUP BY b.user_id
            ),
            alive AS (
                SELECT f.user_id, GREATEST(COALESCE(li.i, -1), f.c) AS b0,
                       CASE WHEN li.i IS NOT NULL AND li.i >= f.c THEN 'purchase' END AS event_type
                FROM fca f LEFT JOIN li ON f.user_id = li.user_id
            ),
            lastv AS (
                SELECT b.user_id, b.value,
                       row_number() OVER (PARTITION BY b.user_id ORDER BY b.event_id DESC) AS rn
                FROM base b JOIN alive a
                  ON b.user_id = a.user_id AND b.event_id >= a.b0 AND b.op <> 'delete'
            )
            SELECT a.user_id, a.event_type, v.value
            FROM alive a JOIN lastv v ON v.user_id = a.user_id AND v.rn = 1
        """,
        "lua_es_ops": """
            SELECT 'events' AS es_index, '_doc' AS es_type,
                   CAST(event_id AS VARCHAR) AS id, 'insert' AS action,
                   '{"event_type":"' || event_type || '","user_id":' ||
                   CAST(user_id AS VARCHAR) || '}' AS body
            FROM events
        """,
        "es6_bulk_ops": """
            SELECT 'customer' AS es_index, '_doc' AS es_type,
                   CAST(c_custkey AS VARCHAR) AS id, 'insert' AS action,
                   '{"c_custkey":' || CAST(c_custkey AS VARCHAR) || ',"c_name":"' || c_name || '"}' AS body
            FROM customer
        """,
        "redis_string_state": """
            WITH ranked AS (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
                FROM events
            )
            SELECT 'evt:' || CAST(user_id AS VARCHAR) AS redis_key,
                   event_type AS value
            FROM ranked WHERE rn = 1 AND event_type <> 'error'
        """,
        # the LIVE loop must converge to the same LWW state the batch
        # fold computes — at-least-once redelivery over idempotent
        # SET/DEL is invisible in the final keyspace
        "live_resp_state": """
            WITH ranked AS (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
                FROM events
            )
            SELECT 'evt:' || CAST(user_id AS VARCHAR) AS redis_key,
                   event_type AS value
            FROM ranked WHERE rn = 1 AND event_type <> 'error'
        """,
        "live_es_state": """
            WITH ranked AS (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
                FROM events
            )
            SELECT CAST(user_id AS VARCHAR) AS id, user_id, event_type
            FROM ranked WHERE rn = 1 AND event_type <> 'error'
        """,
        "redis_hash_state": """
            WITH ranked AS (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
                FROM events
            )
            SELECT 'users' AS redis_key, CAST(user_id AS VARCHAR) AS field,
                   event_type AS value
            FROM ranked WHERE rn = 1 AND event_type <> 'error'
        """,
        "redis_zset_state": """
            WITH ranked AS (
                SELECT user_id, event_type, value,
                       row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
                FROM events
            )
            SELECT 'leaderboard' AS redis_key,
                   CAST(user_id AS VARCHAR) AS member, value AS score
            FROM ranked WHERE rn = 1 AND event_type <> 'error'
        """,
        "redis_set_state": """
            SELECT DISTINCT 'seen:' || CAST(user_id AS VARCHAR) AS redis_key,
                   event_type AS value
            FROM events
        """,
        "redis_list_state": """
            SELECT 'log:' || CAST(user_id AS VARCHAR) AS redis_key,
                   row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS list_pos,
                   event_type AS value
            FROM events
        """,
        # lang_id: same stopword families as functions/text.py STOPWORDS;
        # argmax with FIRST-max tie-break in list order (en,de,fr,es),
        # all-zero → 'und' — exactly numpy argmax's behavior
        "lang_id": r"""
            WITH c AS (
                SELECT doc_id,
                    array_length(regexp_extract_all(text, '(?i)\b(the|and|of|a|to|in|is|that|it|for)\b', 0)) AS en,
                    array_length(regexp_extract_all(text, '(?i)\b(der|die|und|das|ist|von|nicht|mit|ein|zu)\b', 0)) AS de,
                    array_length(regexp_extract_all(text, '(?i)\b(le|la|et|les|des|est|pas|que|une|pour)\b', 0)) AS fr,
                    array_length(regexp_extract_all(text, '(?i)\b(el|la|de|que|y|los|es|una|por|con)\b', 0)) AS es
                FROM documents
            )
            SELECT doc_id,
                   CASE WHEN GREATEST(en, de, fr, es) = 0 THEN 'und'
                        WHEN en >= de AND en >= fr AND en >= es THEN 'en'
                        WHEN de >= fr AND de >= es THEN 'de'
                        WHEN fr >= es THEN 'fr'
                        ELSE 'es' END AS pred_lang
            FROM c
        """,
        "dedup_exact": """
            SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        "train_test_split": """
            SELECT doc_id,
                   ((doc_id * 2654435761) % 4294967296) % 1000 AS bucket,
                   CASE WHEN ((doc_id * 2654435761) % 4294967296) % 1000 < 800 THEN 'train'
                        WHEN ((doc_id * 2654435761) % 4294967296) % 1000 < 900 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "group_lang_stats": """
            SELECT lang, count(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars
            FROM documents GROUP BY lang
        """,
        # greedy first-fit packing is inherently sequential per id range —
        # statable in SQL as a set-based recursive CTE stepping rn→rn+1
        # within each range (r2: packing became partition-invariant, so a
        # full value oracle is possible)
        "pack_sequences": r"""
            WITH RECURSIVE base AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE array_length(string_split_regex(trim(text), '\s+'))
                       END AS n_tokens,
                       doc_id // 1024 AS rng
                FROM documents
            ), seq AS (
                SELECT doc_id, n_tokens, rng,
                       row_number() OVER (PARTITION BY rng ORDER BY doc_id) AS rn
                FROM base
            ), packed AS (
                SELECT doc_id, n_tokens, rng, rn,
                       doc_id AS bin_id, CAST(0 AS BIGINT) AS offset_in_bin,
                       n_tokens AS fill
                FROM seq WHERE rn = 1
                UNION ALL
                SELECT s.doc_id, s.n_tokens, s.rng, s.rn,
                       CASE WHEN p.fill + s.n_tokens > 512 THEN s.doc_id ELSE p.bin_id END,
                       CASE WHEN p.fill + s.n_tokens > 512 THEN 0 ELSE p.fill END,
                       CASE WHEN p.fill + s.n_tokens > 512 THEN s.n_tokens ELSE p.fill + s.n_tokens END
                FROM seq s JOIN packed p ON s.rng = p.rng AND s.rn = p.rn + 1
            )
            SELECT doc_id, n_tokens, bin_id, offset_in_bin FROM packed
        """,
        "redact_text": r"""
            SELECT doc_id,
                   regexp_replace(
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g'),
                       '\b[0-9][0-9 ()+.-]{7,}[0-9]\b', '<PHONE>', 'g') AS text
            FROM documents
        """,
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE ((doc_id * 2654435761) % 4294967296) % 1000 <
                  CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 250 ELSE 100 END
        """,
        "message_envelopes_sql": f"""
            SELECT "key", op AS action,
                   '{{"action":"' || op || '","timestamp":' ||
                   CAST(CAST(epoch(ts) AS BIGINT) AS VARCHAR) ||
                   ',"date":{{"lang":"' || lang || '","path":"' || path ||
                   '","repo":"' || repo || '"}}}}' AS value
            FROM read_parquet('{_CHANGES_ORACLE_PATH}/*.parquet')
        """,
        # full MinHash-LSH restatement over the exported signature matrix:
        # 32 bands × 4 rows banding → candidate pairs → 128-position
        # agreement ≥ 0.8 → symmetric transitive closure, min-id labels
        "minhash_dedup": f"""
            WITH RECURSIVE s AS (
                SELECT doc_id, i, v
                FROM read_parquet('{_MINHASH_SIGS_REL}/*.parquet')
            ),
            docs AS (SELECT DISTINCT doc_id FROM s),
            bk AS (
                SELECT doc_id, i // 4 AS band,
                       string_agg(CAST(v AS VARCHAR), ',' ORDER BY i) AS key
                FROM s GROUP BY doc_id, i // 4
            ),
            cand AS (
                SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                FROM bk x JOIN bk y
                  ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
            ),
            sim AS (
                SELECT c.a, c.b,
                       avg(CASE WHEN sa.v = sb.v THEN 1.0 ELSE 0.0 END) AS agree
                FROM cand c
                JOIN s sa ON sa.doc_id = c.a
                JOIN s sb ON sb.doc_id = c.b AND sb.i = sa.i
                GROUP BY c.a, c.b
            ),
            edges AS (SELECT a, b FROM sim WHERE agree >= 0.8),
            sym AS (
                SELECT a AS x, b AS y FROM edges
                UNION ALL SELECT b, a FROM edges
            ),
            reach(node, label) AS (
                SELECT doc_id, doc_id FROM docs
                UNION
                SELECT sym.y, reach.label
                FROM reach JOIN sym ON sym.x = reach.node
            )
            SELECT node AS doc_id, min(label) AS cluster_id
            FROM reach GROUP BY node
        """,
        # SimHash restatement: 4-block pigeonhole banding, Hamming ≤ 3 via
        # bit_count(xor), closure; hex formatting matches the engine output
        "simhash_dedup": f"""
            WITH RECURSIVE hsh AS (
                SELECT doc_id, h FROM read_parquet('{_SIMHASH_REL}/*.parquet')
            ),
            blocks AS (
                SELECT doc_id, k.k, (h >> (16 * k.k)) & 65535 AS key
                FROM hsh, (SELECT unnest([0, 1, 2, 3]) AS k) k
            ),
            cand AS (
                SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                FROM blocks x JOIN blocks y
                  ON x.k = y.k AND x.key = y.key AND x.doc_id < y.doc_id
            ),
            edges AS (
                SELECT c.a, c.b
                FROM cand c
                JOIN hsh ha ON ha.doc_id = c.a
                JOIN hsh hb ON hb.doc_id = c.b
                WHERE bit_count(xor(ha.h, hb.h)) <= 3
            ),
            sym AS (
                SELECT a AS x, b AS y FROM edges
                UNION ALL SELECT b, a FROM edges
            ),
            reach(node, label) AS (
                SELECT doc_id, doc_id FROM hsh
                UNION
                SELECT sym.y, reach.label
                FROM reach JOIN sym ON sym.x = reach.node
            )
            SELECT r.node AS doc_id,
                   printf('%016x', hsh.h) AS simhash,
                   min(r.label) AS cluster_id
            FROM reach r JOIN hsh ON hsh.doc_id = r.node
            GROUP BY r.node, hsh.h
        """,
        # exact n-gram Jaccard restatement: bottom-8 anchors in u64 order
        # (ORDER BY (h<0), h over the int64 view), anchor-sharing candidate
        # pairs, exact Jaccard ≥ 0.8 from the full sets, closure; NULL-hash
        # rows keep shingle-less docs in the universe
        "ngram_jaccard_dedup": f"""
            WITH RECURSIVE raw AS (
                SELECT doc_id, h FROM read_parquet('{_NGRAM_SETS_REL}/*.parquet')
            ),
            docs AS (SELECT DISTINCT doc_id FROM raw),
            g AS (SELECT doc_id, h FROM raw WHERE h IS NOT NULL),
            sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
            anchors AS (
                SELECT doc_id, h FROM (
                    SELECT doc_id, h,
                           row_number() OVER (
                               PARTITION BY doc_id ORDER BY (h < 0), h
                           ) AS rn
                    FROM g
                ) WHERE rn <= 8
            ),
            cand AS (
                SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                FROM anchors x JOIN anchors y
                  ON x.h = y.h AND x.doc_id < y.doc_id
            ),
            inter AS (
                SELECT c.a, c.b, count(*) AS i
                FROM cand c
                JOIN g ga ON ga.doc_id = c.a
                JOIN g gb ON gb.doc_id = c.b AND gb.h = ga.h
                GROUP BY c.a, c.b
            ),
            edges AS (
                SELECT i.a, i.b
                FROM inter i
                JOIN sizes sa ON sa.doc_id = i.a
                JOIN sizes sb ON sb.doc_id = i.b
                WHERE i.i >= 0.8 * (sa.n + sb.n - i.i)
            ),
            sym AS (
                SELECT a AS x, b AS y FROM edges
                UNION ALL SELECT b, a FROM edges
            ),
            reach(node, label) AS (
                SELECT doc_id, doc_id FROM docs
                UNION
                SELECT sym.y, reach.label
                FROM reach JOIN sym ON sym.x = reach.node
            )
            SELECT node AS doc_id, min(label) AS cluster_id
            FROM reach GROUP BY node
        """,
        # exact top-k: every cosine recomputed in DuckDB, ranked cosine
        # DESC then neighbor_id — the rank IS the value check of the
        # similarity order (raw floats excluded: f32 ulps differ)
        "ann_topk": f"""
            WITH q AS (
                SELECT * FROM read_parquet('{_ANN_QUERIES_REL}/*.parquet')
            ),
            sims AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(q.embedding, e.embedding) AS c
                FROM q CROSS JOIN embeddings e
            ),
            ranked AS (
                SELECT query_id, neighbor_id,
                       row_number() OVER (
                           PARTITION BY query_id ORDER BY c DESC, neighbor_id
                       ) AS rank
                FROM sims
            )
            SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 10
        """,
        # planting restated in SQL (duplicates of the 20 smallest vec_ids),
        # then ALL-pairs cosine ≥ 0.95 — the LSH result must equal the
        # exhaustive scan (exact duplicates collide in every table)
        "embedding_dedup": """
            WITH planted AS (
                SELECT vec_id, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 1000000, embedding FROM (
                    SELECT vec_id, embedding,
                           row_number() OVER (ORDER BY vec_id) AS rn
                    FROM embeddings
                ) WHERE rn <= 20
            )
            SELECT x.vec_id AS a, y.vec_id AS b,
                   round(list_cosine_similarity(x.embedding, y.embedding), 3)
                       AS cosine
            FROM planted x JOIN planted y ON x.vec_id < y.vec_id
            WHERE list_cosine_similarity(x.embedding, y.embedding) >= 0.95
        """,
        # approximate ANN made value-checkable: the engine exports its
        # pruned corpus subset (bucket / inverted-list membership under
        # its own hash/quantizer); the oracle recomputes EXACT cosine
        # top-k over that subset, so pruning plumbing + ranking are both
        # checked value-for-value
        "ann_lsh": f"""
            WITH q AS (
                SELECT * FROM read_parquet('{_ANN_QUERIES_REL}/*.parquet')
            ),
            p AS (
                SELECT vec_id
                FROM read_parquet('{_ANN_LSH_PRUNED_REL}/*.parquet')
            ),
            sims AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(q.embedding, e.embedding) AS c
                FROM q
                CROSS JOIN embeddings e
                JOIN p ON p.vec_id = e.vec_id
            ),
            ranked AS (
                SELECT query_id, neighbor_id,
                       row_number() OVER (
                           PARTITION BY query_id ORDER BY c DESC, neighbor_id
                       ) AS rank
                FROM sims
            )
            SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 10
        """,
        "ann_ivf": f"""
            WITH q AS (
                SELECT * FROM read_parquet('{_ANN_QUERIES_REL}/*.parquet')
            ),
            p AS (
                SELECT vec_id
                FROM read_parquet('{_ANN_IVF_PRUNED_REL}/*.parquet')
            ),
            sims AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(q.embedding, e.embedding) AS c
                FROM q
                CROSS JOIN embeddings e
                JOIN p ON p.vec_id = e.vec_id
            ),
            ranked AS (
                SELECT query_id, neighbor_id,
                       row_number() OVER (
                           PARTITION BY query_id ORDER BY c DESC, neighbor_id
                       ) AS rank
                FROM sims
            )
            SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 10
        """,
        # distributed CC over the planted embedding-dup pairs: the pair
        # set is restated exactly as in the embedding_dedup oracle, the
        # closure as a recursive CTE, cluster = min reachable node
        "dedup_clusters_distributed": """
            WITH RECURSIVE planted AS (
                SELECT vec_id, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 1000000, embedding FROM (
                    SELECT vec_id, embedding,
                           row_number() OVER (ORDER BY vec_id) AS rn
                    FROM embeddings
                ) WHERE rn <= 20
            ),
            pairs AS (
                SELECT x.vec_id AS a, y.vec_id AS b
                FROM planted x JOIN planted y ON x.vec_id < y.vec_id
                WHERE list_cosine_similarity(x.embedding, y.embedding) >= 0.95
            ),
            edges AS (
                SELECT a, b FROM pairs UNION SELECT b, a FROM pairs
            ),
            nodes AS (SELECT DISTINCT a AS id FROM edges),
            reach(id, r) AS (
                SELECT id, id FROM nodes
                UNION
                SELECT g.id, e.b FROM reach g JOIN edges e ON e.a = g.r
            )
            SELECT id AS doc_id, min(r) AS cluster_id
            FROM reach GROUP BY id
        """,
        # Gopher-style line repetition restated from RAW TEXT: split on
        # \n, per-(doc,line) occurrence counts, duplicate-line chars as
        # integer sums, flag via cross-multiplied integers (no division)
        "repetition_stats": """
            WITH l AS (
                SELECT doc_id, unnest(string_split(text, chr(10))) AS line
                FROM documents
            ),
            per AS (
                SELECT doc_id, line, count(*) AS c, length(line) AS ch
                FROM l GROUP BY doc_id, line
            ),
            agg AS (
                SELECT doc_id,
                       sum(c) AS n_lines,
                       count(*) AS n_distinct_lines,
                       sum(CASE WHEN c >= 2 THEN c * ch ELSE 0 END)
                           AS dup_line_chars,
                       sum(c * ch) AS line_chars
                FROM per GROUP BY doc_id
            )
            SELECT doc_id,
                   CAST(n_lines AS BIGINT) AS n_lines,
                   CAST(n_distinct_lines AS BIGINT) AS n_distinct_lines,
                   CAST(dup_line_chars AS BIGINT) AS dup_line_chars,
                   CAST(line_chars AS BIGINT) AS line_chars,
                   CAST(CASE WHEN dup_line_chars * 1000 > line_chars * 300
                             THEN 1 ELSE 0 END AS BIGINT) AS flagged
            FROM agg
        """,
        # global token top-100 from RAW TEXT: same [^ \t\n\r]+ token
        # definition (RE2 parses the escapes identically on both sides),
        # deterministic (cnt DESC, token ASC) tie-break
        "vocab_topk": """
            WITH toks AS (
                SELECT unnest(regexp_split_to_array(text, '[ \t\n\r]+'))
                       AS token
                FROM documents
            )
            SELECT token, CAST(count(*) AS BIGINT) AS cnt
            FROM toks WHERE token <> ''
            GROUP BY token
            ORDER BY cnt DESC, token ASC
            LIMIT 100
        """,
        # benchmark decontamination over the engine's exported 8-token
        # shingle stream: distinct-hash overlap vs the doc_id%37 subset
        "decontaminate": f"""
            WITH s AS (
                SELECT doc_id, h
                FROM read_parquet('{_DECON_STREAM_REL}/*.parquet')
            ),
            bench AS (SELECT DISTINCT h FROM s WHERE doc_id % 37 = 0),
            per AS (
                SELECT s.doc_id,
                       count(DISTINCT s.h) AS n_shingles,
                       count(DISTINCT b.h) AS n_hits
                FROM s LEFT JOIN bench b ON b.h = s.h
                GROUP BY s.doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(per.n_shingles, 0) AS BIGINT) AS n_shingles,
                   CAST(coalesce(per.n_hits, 0) AS BIGINT) AS n_hits,
                   CAST(CASE WHEN coalesce(per.n_hits, 0) > 0
                             THEN 1 ELSE 0 END AS BIGINT) AS contaminated
            FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
        """,
        # per-group top-k: same whitespace tokenizer as doc_token_counts,
        # rank = row_number with the engine's deterministic tie-break
        "group_topk": r"""
            WITH tok AS (
                SELECT doc_id, lang,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE array_length(
                                string_split_regex(trim(text), '\s+'))
                       END AS n_tokens
                FROM documents
            ),
            ranked AS (
                SELECT doc_id, lang, n_tokens,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY n_tokens DESC, doc_id
                       ) AS rank
                FROM tok
            )
            SELECT doc_id, lang,
                   CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(rank AS BIGINT) AS rank
            FROM ranked WHERE rank <= 3
        """,
        # deterministic shard + within-shard order: the Knuth hash,
        # shard routing and rank are restated exactly
        "deterministic_shard": """
            WITH h AS (
                SELECT doc_id,
                       ((doc_id + 7) * 2654435761) % 4294967296 AS h
                FROM documents
            )
            SELECT doc_id,
                   CAST(h % 8 AS BIGINT) AS shard,
                   CAST(h AS BIGINT) AS h,
                   CAST(row_number() OVER (
                       PARTITION BY h % 8 ORDER BY h, doc_id
                   ) - 1 AS BIGINT) AS pos
            FROM h
        """,
        # RESP wire frames: every byte of the go-redis pipeline command
        # stream is reassembled in SQL — bulk-string lengths are BYTE
        # lengths (DuckDB strlen); delete → DEL key, else SET key value
        # (redis.go:228-231)
        "redis_resp_wire": """
            WITH c AS (
                SELECT event_id AS gtid,
                       event_type = 'error' AS is_del,
                       'evt:' || CAST(user_id AS VARCHAR) AS k,
                       event_type AS v
                FROM events
            )
            SELECT gtid, k AS redis_key,
                   CASE WHEN is_del THEN 'DEL' ELSE 'SET' END AS cmd,
                   CASE WHEN is_del THEN
                       '*2' || chr(13) || chr(10) ||
                       '$3' || chr(13) || chr(10) || 'DEL' || chr(13) || chr(10) ||
                       '$' || CAST(strlen(k) AS VARCHAR) || chr(13) || chr(10) ||
                       k || chr(13) || chr(10)
                   ELSE
                       '*3' || chr(13) || chr(10) ||
                       '$3' || chr(13) || chr(10) || 'SET' || chr(13) || chr(10) ||
                       '$' || CAST(strlen(k) AS VARCHAR) || chr(13) || chr(10) ||
                       k || chr(13) || chr(10) ||
                       '$' || CAST(strlen(v) AS VARCHAR) || chr(13) || chr(10) ||
                       v || chr(13) || chr(10)
                   END AS resp
            FROM c
        """,
        # ES bulk NDJSON: action/metadata line + source line per index op
        # (elastic6.go:293-295); body is the rule's json value encoding
        "es_bulk_wire": """
            SELECT CAST(c_custkey AS VARCHAR) AS id,
                   'insert' AS action,
                   '{"index":{"_index":"customer","_type":"_doc","_id":"'
                   || CAST(c_custkey AS VARCHAR) || '"}}' || chr(10) ||
                   '{"c_custkey":' || CAST(c_custkey AS VARCHAR)
                   || ',"c_name":"' || c_name || '"}' || chr(10) AS ndjson
            FROM customer
        """,
        # Mongo bulkWrite models: insert documents carry the injected
        # _id first, $set updates/deletes filter on {_id}
        # (mongo.go:167-178); delete rows ('error' events) emit only
        # the filter
        "mongo_bulk_wire": """
            SELECT event_id AS gtid,
                   CAST(user_id AS VARCHAR) AS id,
                   CASE WHEN event_type = 'error' THEN 'delete'
                        ELSE 'insert' END AS action,
                   CASE WHEN event_type = 'error' THEN
                       '{"deleteOne":{"filter":{"_id":'
                       || CAST(user_id AS VARCHAR) || '}}}'
                   ELSE
                       '{"insertOne":{"document":{"_id":'
                       || CAST(user_id AS VARCHAR)
                       || ',"event_type":"' || event_type
                       || '","user_id":' || CAST(user_id AS VARCHAR) || '}}}'
                   END AS model
            FROM events
        """,
        # real-container media decode: the generator's parameters are
        # closed-form in media_id, so every decoded feature (dims, frame
        # and sample counts, duration, integer channel/amplitude/luma
        # sums) is restated from the formulas — hash match proves the
        # engine's PPM/BMP/WAV/Y4M byte-level decode inverted the encode.
        # Σ over pixels of (base + x + 2y) = w·h·base + h·w(w−1)/2 +
        # w·h(h−1); video adds Σ3f = w·h·3·f(f−1)/2 across f frames.
        "media_features": """
            WITH m AS (
                SELECT CAST(t.range AS BIGINT) AS i FROM range(120) t
            )
            SELECT i AS media_id, 'image' AS media_type,
                   CASE WHEN (i // 3) % 2 = 0 THEN 'ppm' ELSE 'bmp' END
                       AS format,
                   CAST(16 + (i % 5) * 8 AS BIGINT) AS width,
                   CAST(12 + (i % 4) * 6 AS BIGINT) AS height,
                   CAST(NULL AS BIGINT) AS n_frames,
                   CAST(NULL AS BIGINT) AS channels,
                   CAST(NULL AS BIGINT) AS sample_rate,
                   CAST(NULL AS BIGINT) AS duration_ms,
                   CAST((16 + (i % 5) * 8) * (12 + (i % 4) * 6) * (i % 89)
                        + (12 + (i % 4) * 6) * (16 + (i % 5) * 8)
                          * (16 + (i % 5) * 8 - 1) // 2
                        + (16 + (i % 5) * 8) * (12 + (i % 4) * 6)
                          * (12 + (i % 4) * 6 - 1) AS BIGINT) AS px_sum_r,
                   CAST((16 + (i % 5) * 8) * (12 + (i % 4) * 6) * ((3 * i) % 89)
                        + (12 + (i % 4) * 6) * (16 + (i % 5) * 8)
                          * (16 + (i % 5) * 8 - 1) // 2
                        + (16 + (i % 5) * 8) * (12 + (i % 4) * 6)
                          * (12 + (i % 4) * 6 - 1) AS BIGINT) AS px_sum_g,
                   CAST((16 + (i % 5) * 8) * (12 + (i % 4) * 6) * ((7 * i) % 89)
                        + (12 + (i % 4) * 6) * (16 + (i % 5) * 8)
                          * (16 + (i % 5) * 8 - 1) // 2
                        + (16 + (i % 5) * 8) * (12 + (i % 4) * 6)
                          * (12 + (i % 4) * 6 - 1) AS BIGINT) AS px_sum_b,
                   CAST(NULL AS BIGINT) AS sample_peak,
                   CAST(NULL AS BIGINT) AS sample_abs_sum,
                   CAST(NULL AS BIGINT) AS luma_sum
            FROM m WHERE i % 3 = 0
            UNION ALL
            SELECT i, 'audio', 'wav',
                   NULL, NULL,
                   CAST(2000 + (i % 8) * 1000 AS BIGINT),
                   CAST(1 + (i % 2) AS BIGINT),
                   CAST(8000 AS BIGINT),
                   CAST((2000 + (i % 8) * 1000) * 1000 // 8000 AS BIGINT),
                   NULL, NULL, NULL,
                   CAST(500 + (i % 100) * 37 AS BIGINT),
                   CAST((500 + (i % 100) * 37) * (2000 + (i % 8) * 1000)
                        * (1 + (i % 2)) AS BIGINT),
                   NULL
            FROM m WHERE i % 3 = 1
            UNION ALL
            SELECT i, 'video', 'y4m',
                   CAST(16 + (i % 5) * 8 AS BIGINT),
                   CAST(12 + (i % 4) * 6 AS BIGINT),
                   CAST(4 + (i % 4) AS BIGINT),
                   NULL, NULL,
                   CAST((4 + (i % 4)) * 40 AS BIGINT),
                   NULL, NULL, NULL, NULL, NULL,
                   CAST((4 + (i % 4))
                        * ((16 + (i % 5) * 8) * (12 + (i % 4) * 6) * (i % 80)
                           + (12 + (i % 4) * 6) * (16 + (i % 5) * 8)
                             * (16 + (i % 5) * 8 - 1) // 2
                           + (16 + (i % 5) * 8) * (12 + (i % 4) * 6)
                             * (12 + (i % 4) * 6 - 1))
                        + (16 + (i % 5) * 8) * (12 + (i % 4) * 6) * 3
                          * (4 + (i % 4) - 1) * (4 + (i % 4)) // 2
                        AS BIGINT) AS luma_sum
            FROM m WHERE i % 3 = 2
        """,
        # JSON prop extraction + aggregation from RAW props strings
        "json_props_stats": """
            WITH x AS (
                SELECT event_type,
                       CASE WHEN json_valid(props)
                            THEN TRY_CAST(json_extract_string(props, '$.k')
                                          AS BIGINT)
                       END AS k
                FROM events
            )
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(k) AS BIGINT) AS sum_k,
                   CAST(max(k) AS BIGINT) AS max_k
            FROM x GROUP BY event_type
        """,
        # winnowing restated over the engine's exported 5-gram hash
        # stream (h is UBIGINT so MIN is u64 order): per-window(4) min
        # frame, whole-doc min for short docs, xor-fold of the DISTINCT
        # selected hashes, %016x hex; docs with no shingles → all-zero
        "fingerprints": f"""
            WITH s AS (
                SELECT doc_id, pos, h
                FROM read_parquet('{_SHINGLE_STREAM_REL}/*.parquet')
            ),
            cnt AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
            winmin AS (
                SELECT s.doc_id, s.pos, c.n,
                       min(h) OVER (
                           PARTITION BY s.doc_id ORDER BY s.pos
                           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
                       ) AS m
                FROM s JOIN cnt c ON c.doc_id = s.doc_id
            ),
            sel AS (
                SELECT doc_id, m FROM winmin
                WHERE (n <= 4 AND pos = 0) OR (n > 4 AND pos <= n - 4)
            ),
            fp AS (
                SELECT doc_id, bit_xor(DISTINCT m) AS f
                FROM sel GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(lower(lpad(to_hex(fp.f), 16, '0')),
                            '0000000000000000') AS fingerprint
            FROM documents d LEFT JOIN fp ON fp.doc_id = d.doc_id
        """,
    }
