"""Message-sink mode — MQ envelope parity (Kafka/RocketMQ/RabbitMQ path).

The reference's MQ sinks wrap every change row in a JSON envelope
``{"action": ..., "timestamp": ..., "raw": <old row, update only>,
"date": <row map or encoded string>}`` — ``MQRespond``
(/root/reference/model/respond.go:29-36), built per row in
``buildMessage`` (/root/reference/service/endpoint/kafka.go:205-230):

* ``date`` is the projected row map itself under the ``json`` encoder,
  otherwise the encoder/formatter-rendered string (kafka.go:210-214);
* ``raw`` is the OLD row map, present only for updates when
  ``reserve_raw_data`` is set (kafka.go:216-218);
* field order is the Go struct order (action, timestamp, raw, date); map
  values inside are key-sorted (Go json.Marshal of a map).

Note the reference's Kafka producer uses a **random partitioner**
(/root/reference/service/endpoint/kafka.go:51) — per-key ordering is
already surrendered on MQ sinks, so this pipeline is embarrassingly
parallel and needs no shuffle at all.
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data

from ..functions.encoders import _escape_html_like_go, encode_json
from ..rules import RuleConfig, RulePlan
from ..stages.decode import Decoder
from .cdc import _ddl_columns, _stream_specs, event_files, stream_facts


class EnvelopeBuilder:
    """Actor-pool stage: compiled rule plan + per-batch envelope render."""

    def __init__(self, rule_config: RuleConfig, ddl_events: list[dict],
                 specs=None):
        self.plan = RulePlan(rule_config, specs or _stream_specs(ddl_events))
        self.reserve_raw = rule_config.reserve_raw_data

    def _encode_rows(self, projected: pa.Table) -> list:
        if self.plan.config.value_encoder == "json" and self.plan.value_render is None:
            order = [
                c for c in self.plan.output_order if c in projected.column_names
            ]
            return [
                encode_json({k: r.get(k) for k in order})
                for r in projected.to_pylist()
            ]
        return [
            _escape_html_like_go(json.dumps(s, ensure_ascii=False))
            for s in self.plan.encode_values(projected).to_pylist()
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        projected = self.plan.apply(batch)
        dates = self._encode_rows(projected)
        ops = batch.column("op").to_pylist()
        # reference Timestamp is epoch seconds (uint32, e.Header.Timestamp);
        # a null ts (external ingests without ts_ms) must render as 0, not
        # the Python literal None — None is not valid JSON
        ts = pa.compute.fill_null(
            batch.column("ts").cast(pa.timestamp("s")).cast(pa.int64()), 0
        ).to_pylist()

        raws: list[str | None] = [None] * len(ops)
        upd_idx = [i for i, op in enumerate(ops) if op == "update"]
        if self.reserve_raw and upd_idx and "before" in batch.column_names:
            # only update rows consume the before image — project and box
            # just those rows, not the whole batch
            sub = batch.take(pa.array(upd_idx, pa.int64()))
            before = sub.column("before")
            flat = pa.table(
                {
                    f.name: pa.compute.struct_field(before, f.name)
                    for f in before.type
                    if f.name in {c.name for c in self.plan.columns}
                }
            )
            old_projected = self.plan.apply(flat)
            old_rows = old_projected.to_pylist()
            order = [
                c for c in self.plan.output_order if c in old_projected.column_names
            ]
            for j, i in enumerate(upd_idx):
                raws[i] = encode_json({k: old_rows[j].get(k) for k in order})

        envelopes = []
        for op, t, raw, date in zip(ops, ts, raws, dates):
            raw_part = f',"raw":{raw}' if raw is not None else ""
            envelopes.append(
                f'{{"action":{json.dumps(op)},"timestamp":{t}{raw_part},"date":{date}}}'
            )
        return pa.table(
            {
                "key": batch.column("key"),
                "action": batch.column("op"),
                "value": pa.array(envelopes, pa.string()),
            }
        )


class MessageDeliverer:
    """Actor-pool delivery stage with the reference MQ sinks' infra
    semantics, against an injectable transport (no broker in this
    environment):

    * declare-on-demand queue cache — a queue is declared at most once
      per actor, before its first publish
      (/root/reference/service/endpoint/rabbit.go:77-105);
    * bounded send retry — a failed batch send is retried up to
      ``retries`` more times before the error propagates
      (/root/reference/service/endpoint/rocket.go:42,49-142: retry=2,
      async batch + wait).

    ``transport`` must provide ``declare(queue)`` and
    ``send(queue, list_of_payloads)`` (raising on failure).  Emits one
    metrics row per batch: (queue, sent, attempts)."""

    def __init__(self, transport_factory, *, retries: int = 2,
                 queue_for=None):
        self.transport = transport_factory()
        self.retries = retries
        self.queue_for = queue_for or (lambda key: "repos")
        self.declared: set[str] = set()

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column("key").to_pylist()
        values = batch.column("value").to_pylist()
        by_queue: dict[str, list] = {}
        for k, v in zip(keys, values):
            by_queue.setdefault(self.queue_for(k), []).append(v)
        out_q, out_sent, out_attempts = [], [], []
        for queue, msgs in by_queue.items():
            if queue not in self.declared:
                self.transport.declare(queue)
                self.declared.add(queue)
            attempts = 0
            while True:
                attempts += 1
                try:
                    self.transport.send(queue, msgs)
                    break
                except Exception:
                    if attempts > self.retries:
                        raise
            out_q.append(queue)
            out_sent.append(len(msgs))
            out_attempts.append(attempts)
        return pa.table(
            {
                "queue": pa.array(out_q, pa.string()),
                "sent": pa.array(out_sent, pa.int64()),
                "attempts": pa.array(out_attempts, pa.int64()),
            }
        )


def deliver_stream(
    messages: "ray.data.Dataset",
    transport_factory,
    *,
    retries: int = 2,
    queue_for=None,
    concurrency: "int | tuple[int, int]" = (1, 2),
    batch_size: int = 4096,
) -> "ray.data.Dataset":
    """Deliver an envelope stream through MessageDeliverer actors; returns
    the per-batch delivery metrics dataset (queue, sent, attempts)."""
    return messages.map_batches(
        MessageDeliverer,
        fn_constructor_args=(transport_factory,),
        fn_constructor_kwargs={"retries": retries, "queue_for": queue_for},
        concurrency=concurrency,
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def message_stream(
    events_dir: str,
    rule_config: RuleConfig | None = None,
    *,
    table: "str | None" = None,
    batch_size: int = 16384,
    concurrency: "int | tuple[int, int]" = (1, 4),
    facts: "dict | None" = None,
) -> "ray.data.Dataset":
    """Decode + rule + envelope — returns the message Dataset (no shuffle).

    ``table``: which stream table to envelope (default the flagship;
    secondary tables decode against their base columns — in-band DDL
    applies to the flagship only).  ``facts``: pre-computed
    ``stream_facts(events_dir)``, so multi-table callers (config.run_app)
    scan the parquet footers / pruned DDL read once per run."""
    from ..schema import TABLE_COLUMNS, TABLE_NAME

    rule_config = rule_config or RuleConfig()
    facts = facts if facts is not None else stream_facts(events_dir)
    ddl_gtid = [d["gtid"] for d in facts["ddl_events"]] or None
    keep_before = rule_config.reserve_raw_data
    table = table or TABLE_NAME
    flagship = table == TABLE_NAME
    if flagship:
        specs = None
        ddl_columns = _ddl_columns(facts["ddl_events"])
    else:
        from ..functions.coerce import ColumnSpec

        specs = [ColumnSpec(c) for c in TABLE_COLUMNS[table]]
        ddl_columns = ()
    ds = ray.data.read_parquet(event_files(events_dir))
    ds = ds.map_batches(
        Decoder(table=table, ddl_gtid=ddl_gtid if flagship else None,
                keep_before=keep_before, ddl_columns=ddl_columns),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return ds.map_batches(
        EnvelopeBuilder,
        fn_constructor_args=(rule_config, facts["ddl_events"], specs),
        concurrency=concurrency,
        batch_format="pyarrow",
        batch_size=batch_size,
    )
