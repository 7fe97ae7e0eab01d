"""Redis-sink keyed-state model — M10 key/field/score encoding + K1
structure semantics as Ray Data merge pipelines.

The reference's Redis endpoint applies change events to five structures
(/root/reference/service/endpoint/redis.go:225-269):

* String  — ``SET key val`` / ``DEL key``
* Hash    — ``HSET key field val`` / ``HDEL key field``
* List    — insert: ``RPUSH``; update: ``LREM old + RPUSH new``;
            delete: ``LREM val``
* Set     — ``SADD val`` / update: ``SREM old + SADD new`` / ``SREM val``
* SortedSet — ``ZADD score member`` / ``ZREM member``

Key construction (/root/reference/service/endpoint/redis.go:271-327,
compiled /root/reference/global/rule.go:458-548): fixed value | template
formatter | named column | primary key, with an optional prefix.  The
hash field and the sorted-set score each come from a named column —
including the reference quirk that the **score column's index is stored
in the hash-field index slot** (/root/reference/global/rule.go:520-524);
``RedisPlan`` reproduces that by letting ``field_column`` carry the score
column when the structure is a sorted set.

Instead of issuing commands against a server, the engine computes the
**converged final state** of each structure from the change stream — the
same state a real Redis would hold after the reference replayed the
stream (A5: update = remove-old-then-add):

* string                → last-writer-wins per key, deletes drop
* hash / set / sortedset → last-writer-wins per (key, field|member),
  delete/SREM/ZREM tombstones drop — an associative reduce, so it uses
  the same combiner + shuffle plan as the lake merge (stages/merge.py)
* list                  → per-key ordered fold (RPUSH order matters);
  hash-partition by key over the storage shuffle, vectorized replay per
  partition (``list_replay_fold``: pure-RPUSH keys are one numpy pass;
  Python replay only for keys that saw an LREM)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.encoders import compile_template, template_fields, to_string_go
from .merge import merged_dataset

_FIELD_SEP = "\x00"  # internal (key, field) separator for the LWW merge


@dataclass
class RedisConfig:
    """Rule fields of the reference's Redis DSL
    (/root/reference/global/rule.go:83-91,458-548)."""

    structure: str = "string"   # string|hash|list|set|sortedset
    key_prefix: str = ""        # redis_key_prefix
    key_value: str = ""         # redis_key_value (fixed key)
    key_column: str = ""        # redis_key_column
    key_formatter: str = ""     # redis_key_formatter (template)
    hash_field_prefix: str = "" # redis_hash_field_prefix (redis.go:311-314)
    hash_field_column: str = "" # redis_hash_field_column
    sorted_set_score_column: str = ""  # redis_sorted_set_score_column


class RedisPlan:
    """Compiled key/field/score encoder for one rule (vectorized)."""

    def __init__(self, cfg: RedisConfig, pk_columns: tuple[str, ...]):
        self.cfg = cfg
        self.pk_columns = pk_columns
        # an explicit key_column disables the formatter at compile time
        # (rule.go:530-538 clears RedisKeyFormatter when RedisKeyColumn is
        # set); runtime precedence is key_value > formatter > column/PK
        # (redis.go:272-283)
        formatter = "" if cfg.key_column else cfg.key_formatter
        self.render = compile_template(formatter) if formatter else None
        self.render_fields = template_fields(formatter) if formatter else []
        # config validation at compile time (clear errors instead of
        # KeyErrors deep inside the merge)
        if cfg.structure == "sortedset" and not cfg.sorted_set_score_column:
            raise ValueError(
                "structure='sortedset' requires sorted_set_score_column"
            )  # rule.go:517-519
        if cfg.structure != "string" and not (
            cfg.key_value or cfg.key_column or cfg.key_formatter
        ):
            # the reference demands a fixed redis_key_value for every
            # non-string structure (rule.go:482-520); we additionally
            # accept a key column / formatter (its runtime encodeKey
            # handles them, redis.go:271-298) but never a silent PK
            # fallback — that default exists only for STRING
            # (rule.go:470-478)
            raise ValueError(
                f"structure={cfg.structure!r} requires redis_key_value "
                "(or a key column / formatter)"
            )
        # reference quirk (rule.go:520-524): the sorted-set score column
        # index is stored into the hash-field index slot
        if cfg.structure == "sortedset":
            self.field_column = cfg.sorted_set_score_column
            self.field_columns: tuple[str, ...] = ()
        elif cfg.structure == "hash":
            self.field_column = cfg.hash_field_column
            # hash field defaults to the PK column(s) when unset
            # (rule.go:486-494 composite loop → separator-less concat)
            self.field_columns = (
                (cfg.hash_field_column,) if cfg.hash_field_column else pk_columns
            )
        else:
            self.field_column = cfg.hash_field_column
            self.field_columns = (
                (cfg.hash_field_column,) if cfg.hash_field_column else ()
            )

    def _stringify(self, col: "pa.Array | pa.ChunkedArray") -> pa.Array:
        # null → "" on EVERY branch: the reference's ToString(nil) is ""
        # (string_util.go:162-215), and a null key part would otherwise
        # null the whole merge key (binary_join_element_wise emits null
        # through), breaking LWW convergence for those rows
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_string(col.type):
            return pc.fill_null(col, "")
        if pa.types.is_floating(col.type):
            # Go shortest round-trip float formatting
            vals = col.to_numpy(zero_copy_only=False)
            return pa.array(
                [to_string_go(None if np.isnan(v) else float(v)) for v in vals],
                pa.string(),
            )
        return pc.fill_null(pc.cast(col, pa.string()), "")

    def keys(self, batch: pa.Table) -> pa.Array:
        """Vectorized key construction (redis.go:271-298 precedence:
        fixed value > formatter > column/PK; key_prefix applies ONLY to
        the column/PK branch — a fixed or templated key is returned
        verbatim, redis.go:272-283 early returns).

        Known divergence: the reference renders the formatter over the
        RULE-projected rowMap (redis.go:276-283 — default_column_values
        present, excluded columns absent → ``<no value>``), while this
        plan renders over the decoded batch columns.  A formatter that
        references a rule default or an excluded column behaves
        differently; none of the reference docs' configs combine those."""
        cfg = self.cfg
        if cfg.key_value:
            return pa.array([cfg.key_value] * batch.num_rows, pa.string())
        if self.render is not None:
            # row-wise render is the reference contract, but only box the
            # columns the template actually references — never the payload
            rows = batch.select(
                [
                    c
                    for c in self.render_fields
                    if c in batch.column_names and not c.startswith("_")
                ]
            ).to_pylist()
            return pa.array([self.render(r) for r in rows], pa.string())
        if cfg.key_column:
            key = self._stringify(batch.column(cfg.key_column))
        else:
            parts = [self._stringify(batch.column(c)) for c in self.pk_columns]
            key = (
                pc.binary_join_element_wise(*parts, "")
                if len(parts) > 1
                else parts[0]
            )
        if cfg.key_prefix:
            key = pc.binary_join_element_wise(
                pa.scalar(cfg.key_prefix), key, ""
            )
        return key

    def fields(self, batch: pa.Table) -> "pa.Array | None":
        """Hash field (redis.go:301-317): explicit column or PK-concat
        default, hash_field_prefix applied last."""
        if not self.field_columns:
            return None
        parts = [self._stringify(batch.column(c)) for c in self.field_columns]
        field = (
            pc.binary_join_element_wise(*parts, "")
            if len(parts) > 1
            else parts[0]
        )
        if self.cfg.hash_field_prefix:
            field = pc.binary_join_element_wise(
                pa.scalar(self.cfg.hash_field_prefix), field, ""
            )
        return field

    def scores(self, batch: pa.Table) -> "pa.Array | None":
        if self.cfg.structure != "sortedset":
            return None
        col = batch.column(self.field_column)
        # reference parity: nil score → 0 and a non-numeric score string
        # → 0 (encodeSortedSetScoreField redis.go:319-327 via
        # ToFloat64Safe) — a raw cast would keep null / crash the replay
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            ok = pc.match_substring_regex(
                pc.fill_null(col, ""),
                r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?$",
            )
            col = pc.if_else(ok, col, pa.scalar("0"))
        return pc.fill_null(pc.cast(col, pa.float64()), 0.0)


def _op_table(
    batch: pa.Table,
    plan: RedisPlan,
    *,
    value_col: str,
    op_col: str,
    order_cols: tuple[str, str],
    rank_offset: int = 1,
    force_op: "str | None" = None,
) -> pa.Table:
    """Normalize one change batch into redis-op rows for the merge.

    Member-keyed structures (set/sortedset) explode updates into
    remove-old + add-new; ``rank_offset`` disambiguates those two ops of
    one event in the LWW order (rem=0 < add=1)."""
    value = plan._stringify(batch.column(value_col))
    key = plan.keys(batch)
    field = plan.fields(batch)
    if plan.cfg.structure in ("set", "sortedset"):
        # membership is keyed by the encoded member value itself
        merge_key = pc.binary_join_element_wise(key, value, _FIELD_SEP)
    elif field is not None:
        merge_key = pc.binary_join_element_wise(key, field, _FIELD_SEP)
    else:
        merge_key = key
    rank = pc.add(
        pc.multiply(pc.cast(batch.column(order_cols[1]), pa.int32()), 2),
        rank_offset,
    )
    op = (
        pa.array([force_op] * batch.num_rows, pa.string())
        if force_op
        else batch.column(op_col)
    )
    cols = {
        "key": merge_key,
        "gtid": batch.column(order_cols[0]),
        "seq_in_txn": rank,
        "op": op,
        "redis_key": key,
        "value": value,
    }
    if field is not None and plan.cfg.structure != "sortedset":
        cols["field"] = field
    score = plan.scores(batch)
    if score is not None:
        cols["member"] = value
        cols["score"] = score
    return pa.table(cols)


def structure_state(
    ds: "object",
    plan: RedisPlan,
    *,
    value_col: str,
    old_value_col: "str | None" = None,
    op_col: str = "op",
    order_cols: tuple[str, str] = ("gtid", "seq_in_txn"),
    num_partitions: int = 16,
):
    """Final state of a string/hash/set/sortedset structure.

    ``ds``: change-event Dataset whose ``op_col`` is insert/update/delete.
    Returns a Dataset of the surviving entries (LWW per merge key, delete
    tombstones dropped — the same skew-proof combiner plan as the lake).
    For member-keyed structures, pass ``old_value_col`` so updates emit
    the reference's remove-old-then-add pair (redis.go:254-267)."""
    structure = plan.cfg.structure
    if structure == "list":
        raise ValueError("use list_state() — lists need an ordered fold")

    def to_ops(t: pa.Table) -> pa.Table:
        base = _op_table(
            t, plan, value_col=value_col, op_col=op_col, order_cols=order_cols
        )
        if structure in ("set", "sortedset") and old_value_col and (
            old_value_col in t.column_names
        ):
            upd = t.filter(pc.equal(t.column(op_col), pa.scalar("update")))
            if upd.num_rows:
                rem = _op_table(
                    upd, plan, value_col=old_value_col, op_col=op_col,
                    order_cols=order_cols, rank_offset=0, force_op="delete",
                )
                base = pa.concat_tables([rem, base])
        return base

    ops = ds.map_batches(to_ops, batch_format="pyarrow")
    if structure == "sortedset":
        final_cols = ["redis_key", "member", "score"]
    elif structure == "hash":
        final_cols = ["redis_key", "field", "value"]
    else:  # string | set
        final_cols = ["redis_key", "value"]
    return merged_dataset(ops, num_partitions, final_columns=final_cols)


def list_replay_fold(group: pa.Table) -> pa.Table:
    """Per-key ordered replay of RPUSH / LREM+RPUSH / LREM
    (/root/reference/service/endpoint/redis.go:239-252; LREM count=0
    removes ALL occurrences).

    Vectorized where list semantics allow: the partition is sorted once
    and segmented by key (arrow dictionary codes + numpy); keys whose
    every op is RPUSH (the common case) are emitted with one vectorized
    position computation — Python replay runs ONLY for the keys that saw
    an LREM (update/delete), on numpy array slices, no dict rows.

    ``group`` columns: key, gtid, seq_in_txn, op, value[, old_value].
    Returns (redis_key, list_pos, value)."""
    empty = pa.table(
        {
            "redis_key": pa.array([], pa.string()),
            "list_pos": pa.array([], pa.int32()),
            "value": pa.array([], pa.string()),
        }
    )
    n = group.num_rows
    if n == 0:
        return empty
    group = group.sort_by(
        [("key", "ascending"), ("gtid", "ascending"), ("seq_in_txn", "ascending")]
    )
    k = group.column("key")
    if isinstance(k, pa.ChunkedArray):
        k = k.combine_chunks()
    codes = k.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    ops = group.column("op").to_numpy(zero_copy_only=False)
    new_seg = np.empty(n, dtype=bool)
    new_seg[0] = True
    new_seg[1:] = codes[1:] != codes[:-1]
    seg_start = np.flatnonzero(new_seg)
    seg_end = np.r_[seg_start[1:], n]
    seg_id = np.cumsum(new_seg) - 1
    is_push = ops == "insert"
    # a key is "clean" iff it only ever saw RPUSH — its final list is the
    # pushed values in log order, positions 0..len-1 (pure vector math)
    clean_seg = np.logical_and.reduceat(is_push, seg_start)
    clean_rows = clean_seg[seg_id]
    outs = []
    if clean_rows.any():
        idx = np.arange(n, dtype=np.int64)
        pos = (idx - seg_start[seg_id])[clean_rows].astype(np.int32)
        sel = group.filter(pa.array(clean_rows))
        outs.append(
            pa.table(
                {
                    "redis_key": sel.column("key"),
                    "list_pos": pa.array(pos),
                    "value": sel.column("value"),
                }
            )
        )
    dirty = np.flatnonzero(~clean_seg)
    if len(dirty):
        vals = group.column("value").to_numpy(zero_copy_only=False)
        olds = (
            group.column("old_value").to_numpy(zero_copy_only=False)
            if "old_value" in group.column_names
            else None
        )
        keys_np = k.to_numpy(zero_copy_only=False)
        out_keys: list = []
        out_pos: list[int] = []
        out_vals: list = []
        for s in dirty:
            a, b = int(seg_start[s]), int(seg_end[s])
            lst: list = []
            for i in range(a, b):
                op = ops[i]
                if op == "insert":
                    lst.append(vals[i])
                elif op == "update":
                    old = olds[i] if olds is not None else vals[i]
                    lst = [x for x in lst if x != old]
                    lst.append(vals[i])
                elif op == "delete":
                    lst = [x for x in lst if x != vals[i]]
            key = keys_np[a]
            out_keys.extend([key] * len(lst))
            out_pos.extend(range(len(lst)))
            out_vals.extend(lst)
        outs.append(
            pa.table(
                {
                    "redis_key": pa.array(out_keys, pa.string()),
                    "list_pos": pa.array(out_pos, pa.int32()),
                    "value": pa.array(out_vals, pa.string()),
                }
            )
        )
    return pa.concat_tables(outs) if outs else empty


def list_state(
    ds: "object",
    plan: RedisPlan,
    *,
    value_col: str,
    old_value_col: "str | None" = None,
    op_col: str = "op",
    order_cols: tuple[str, str] = ("gtid", "seq_in_txn"),
    num_partitions: int = 16,
):
    """Final List structure state: per-key ordered replay of
    RPUSH / LREM+RPUSH / LREM (redis.go:239-252).

    Returns Dataset rows ``(redis_key, list_pos, value)``.  The fold is
    per-key sequential by necessity (list order is position-dependent),
    so the plan hash-partitions by key over the storage shuffle
    (stages/shuffle.storage_fold — same exchange as the lake merge) and
    replays each partition's keys in one task — keys are independent,
    which is all the parallelism list semantics allow."""

    def to_ops(t: pa.Table) -> pa.Table:
        key = plan.keys(t)
        cols = {
            "key": key,
            "gtid": t.column(order_cols[0]),
            "seq_in_txn": pc.cast(t.column(order_cols[1]), pa.int32()),
            "op": t.column(op_col),
            "value": plan._stringify(t.column(value_col)),
        }
        if old_value_col is not None and old_value_col in t.column_names:
            cols["old_value"] = plan._stringify(t.column(old_value_col))
        return pa.table(cols)

    from .merge import add_partition_column
    from .shuffle import storage_fold

    ops = ds.map_batches(to_ops, batch_format="pyarrow").map_batches(
        lambda t: add_partition_column(t, num_partitions), batch_format="pyarrow"
    )
    return storage_fold(
        ops, num_partitions, list_replay_fold, label="redis-list",
        empty_schema={
            "redis_key": pa.string(),
            "list_pos": pa.int32(),
            "value": pa.string(),
        },
    )
