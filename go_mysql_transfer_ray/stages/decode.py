"""Decode stage — binlog event batch → flat typed change rows.

The Ray-Data re-expression of the reference's row-event fan-out + arity
guard + per-column type normalization:

* row-event fan-out (`service/handler.go:88-117` in /root/reference):
  already one row per change in our event model; here we flatten the
  ``before``/``after`` structs into typed columns (zero-copy
  ``pyarrow.compute.struct_field``);
* table filter (`service/transfer_service.go:197-204`,
  `service/handler.go:83-86`): vectorized equality predicate;
* arity guard (`service/endpoint/redis.go:106-109` — repeated in all 7
  endpoints): rows whose ``col_count`` mismatches the schema width valid at
  their position are dropped silently, exactly as the reference's endpoints
  skip them (correctness is proven by oracle parity on bad-arity fixtures,
  not by a drop counter);
* NUMBER coercion for the DDL-added ``stars`` column
  (`service/endpoint/endpoint.go:180-197`): parse failure → null.

Stateless — runs as plain ``map_batches`` tasks over pyarrow batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import TABLE_COLUMNS, TABLE_NAME, TABLE_PKS

_KEY_SEP = "\x00"  # table identity embedded in the multi-table merge key

# meta columns the decode output computes — a payload column with one of
# these names would silently OVERWRITE the merge key / op routing in the
# output dict, so registration fails loudly instead
RESERVED_META = ("gtid", "seq_in_txn", "pos", "op", "ts", "key", "before")


def _check_reserved(
    table: str,
    columns: "tuple[str, ...]",
    ddl_columns: "tuple[tuple[str, str], ...]" = (),
    *,
    extra: "tuple[str, ...]" = (),
) -> None:
    reserved = set(RESERVED_META) | set(extra)
    clash = reserved & (set(columns) | {n for n, _ in ddl_columns})
    if clash:
        raise ValueError(
            f"table {table!r} declares payload column(s) {sorted(clash)} "
            "that collide with decode meta columns — rename them (the "
            "reference routes by these fields too; a collision would "
            "silently corrupt the merge key / op routing)"
        )


def _coerce_ddl(raw: pa.Array, mtype: str) -> pa.Array:
    """DDL-added columns arrive as raw strings; coerce per declared type —
    NUMBER: digits-only check then cast, unparsable → null
    (endpoint.go:180-197); FLOAT: same with a float pattern; else string."""
    if mtype == "number":
        from ..functions.coerce import int64_parse_mask, strip_plus_sign

        # range-checked parse: a 20-digit value must null (ParseInt
        # semantics), never crash the decode task in pc.cast
        ok = int64_parse_mask(raw)
        return pc.cast(
            pc.if_else(ok, strip_plus_sign(raw), pa.scalar(None, pa.string())),
            pa.int64(),
        )
    if mtype == "float":
        ok = pc.match_substring_regex(
            raw, r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?$"
        )
        return pc.cast(
            pc.if_else(pc.fill_null(ok, False), raw, pa.scalar(None, pa.string())),
            pa.float64(),
        )
    return raw


def decode_table_batch(
    batch: pa.Table,
    *,
    table: str,
    columns: "tuple[str, ...]",
    pk_columns: "tuple[str, ...]",
    base_width: "int | None" = None,
    ddl_gtid: "int | list[int] | None" = None,
    keep_before: bool = False,
    ddl_columns: "tuple[tuple[str, str], ...]" = (),
) -> pa.Table:
    """Decode ONE table's rows out of a (possibly mixed) event batch.

    ``columns``/``pk_columns``: the table's base payload columns and its
    primary key (composite key = separator-less concat,
    endpoint.go:309-322).  ``ddl_gtid``: gtid(s) of the table's ALTERs
    (None = no DDL) — each one widens the expected arity by one column
    for rows after it.  DDL rows themselves are dropped here (their
    effect is carried via ``ddl_gtid``, extracted by a cheap pruned
    pre-read in the pipeline driver — see pipelines/cdc.py).
    """
    width = base_width if base_width is not None else len(columns)
    op = batch.column("op")
    keep = pc.and_(
        pc.equal(batch.column("table"), pa.scalar(table)),
        pc.not_equal(op, pa.scalar("ddl")),
    )

    # arity guard: expected width grows by one at each DDL transaction
    if ddl_gtid is None:
        ddl_gtids: list[int] = []
    elif isinstance(ddl_gtid, int):
        ddl_gtids = [ddl_gtid]
    else:
        ddl_gtids = sorted(ddl_gtid)
    if not ddl_gtids:
        arity_ok = pc.equal(
            batch.column("col_count"), pa.scalar(width, pa.int32())
        )
    else:
        gtid = batch.column("gtid").to_numpy(zero_copy_only=False)
        # no change event shares a DDL's transaction, so strict < counts
        # the ALTERs already applied at each row's position
        expected = width + np.searchsorted(
            np.asarray(ddl_gtids, dtype=np.int64), gtid, side="left"
        ).astype(np.int32)
        arity_ok = pc.equal(
            batch.column("col_count"), pa.array(expected, pa.int32())
        )
    keep = pc.and_(keep, arity_ok)
    t = batch.filter(keep)

    op = t.column("op")
    is_del = pc.equal(op, pa.scalar("delete"))
    # image to read identity/payload from: AFTER for insert/update, BEFORE
    # for delete (reference reads the delete key from the old row:
    # /root/reference/service/endpoint/redis.go:225-237 uses the row sent
    # with the delete action).
    after = t.column("after")
    before = t.column("before")

    def field(name: str) -> pa.Array:
        a = pc.struct_field(after, name)
        b = pc.struct_field(before, name)
        return pc.if_else(is_del, b, a)

    payload = {c: field(c) for c in columns}
    # composite key: separator-less concat (endpoint.go:309-322)
    pk_parts = [payload[c] for c in pk_columns]
    key = (
        pc.binary_join_element_wise(*pk_parts, "")
        if len(pk_parts) > 1
        else pk_parts[0]
    )

    cols = {
        "gtid": t.column("gtid"),
        "seq_in_txn": t.column("seq_in_txn"),
        "pos": t.column("pos"),
        "op": op,
        "ts": t.column("ts"),
        "key": key,
        **payload,
    }
    for name, mtype in ddl_columns:
        cols[name] = _coerce_ddl(field(name), mtype)
    if keep_before:
        cols["before"] = before
    return pa.table(cols)


def decode_batch(
    batch: pa.Table,
    *,
    table: str = TABLE_NAME,
    ddl_gtid: "int | list[int] | None" = None,
    keep_before: bool = False,
    ddl_columns: "tuple[tuple[str, str], ...]" = (("stars", "number"),),
    payload_columns: "tuple[str, ...] | None" = None,
) -> pa.Table:
    """Single-table decode: columns/PK/arity derive from the named table
    (the flagship by default; any registered table works — the arity
    guard must count THAT table's columns or every row is dropped).

    ``payload_columns``: optional projection pushdown — extract only
    these base columns (a rule's consumed set; must contain the PKs).
    ``base_width`` stays the full table width so the arity guard is
    unchanged by the projection."""
    cols = (
        payload_columns
        if payload_columns is not None
        else tuple(TABLE_COLUMNS[table])
    )
    return decode_table_batch(
        batch,
        table=table,
        columns=cols,
        pk_columns=TABLE_PKS[table],
        base_width=len(TABLE_COLUMNS[table]),
        ddl_gtid=ddl_gtid,
        keep_before=keep_before,
        ddl_columns=ddl_columns,
    )


class Decoder:
    """Callable wrapper so the pipeline can pass config once."""

    def __init__(self, table: str = TABLE_NAME, ddl_gtid=None,
                 keep_before: bool = False,
                 ddl_columns: "tuple[tuple[str, str], ...]" = (("stars", "number"),),
                 payload_columns: "tuple[str, ...] | None" = None):
        self.table = table
        self.ddl_gtid = ddl_gtid
        self.keep_before = keep_before
        self.ddl_columns = tuple(ddl_columns)
        _check_reserved(
            table,
            tuple(payload_columns or TABLE_COLUMNS.get(table, ())),
            self.ddl_columns,
        )
        # projection pushdown: extract only the payload columns a
        # downstream rule consumes (must include its PKs) — the arity
        # guard still counts the FULL table width via base_width.
        self.payload_columns = (
            tuple(payload_columns) if payload_columns is not None else None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        return decode_batch(
            batch, table=self.table, ddl_gtid=self.ddl_gtid,
            keep_before=self.keep_before, ddl_columns=self.ddl_columns,
            payload_columns=self.payload_columns,
        )


def _ddl_arrow_type(mtype: str) -> pa.DataType:
    return {"number": pa.int64(), "float": pa.float64()}.get(mtype, pa.string())


class MultiDecoder:
    """Multi-table routing decoder — ONE map stage over a MIXED stream.

    The reference registers a rule per concrete table and routes every
    event by its ruleKey (/root/reference/service/transfer_service.go:
    206-276, service/handler.go:83-86); here the router is a
    ``{table → (columns, pks, ddl state)}`` map consulted vectorized:
    each batch is filtered per table, decoded with that table's arity
    guard / key / DDL coercions, null-padded to the UNION of all tables'
    decoded columns, and concatenated.  The merge key embeds the table
    (``<table>\\x00<pk concat>``) so ONE downstream exchange serves every
    table in a single pass.

    ``table_specs``: {table: {"columns": tuple, "pk_columns": tuple,
    "ddl_gtid": list|None, "ddl_columns": ((name, mtype), ...)}}.
    Tables default their columns/pks from schema.TABLE_COLUMNS/TABLE_PKS.
    """

    def __init__(self, table_specs: "dict[str, dict]", keep_before: bool = False):
        self.specs: dict[str, dict] = {}
        union: dict[str, pa.DataType] = {}
        for table, spec in table_specs.items():
            columns = tuple(spec.get("columns") or TABLE_COLUMNS[table])
            pks = tuple(spec.get("pk_columns") or TABLE_PKS[table])
            ddl_columns = tuple(spec.get("ddl_columns") or ())
            _check_reserved(table, columns, ddl_columns, extra=("table",))
            self.specs[table] = {
                "columns": columns,
                "pk_columns": pks,
                "ddl_gtid": spec.get("ddl_gtid"),
                "ddl_columns": ddl_columns,
                # the arity guard counts the FULL registered table width;
                # a projected `columns` subset must not shrink it (it
                # would silently drop every row of the table)
                "base_width": (
                    len(TABLE_COLUMNS[table])
                    if table in TABLE_COLUMNS
                    else len(columns)
                ),
            }
            for c in columns:
                self._claim(union, c, pa.string(), table)
            for name, mtype in ddl_columns:
                self._claim(union, name, _ddl_arrow_type(mtype), table)
        self.union_payload = union  # name -> type, first-seen order
        self.keep_before = keep_before

    @staticmethod
    def _claim(union: dict, name: str, typ: pa.DataType, table: str) -> None:
        if name in union and union[name] != typ:
            raise ValueError(
                f"column {name!r} of table {table!r} conflicts with an "
                f"earlier table's type ({union[name]} vs {typ}) in the "
                "union decode schema"
            )
        union.setdefault(name, typ)

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for table, spec in self.specs.items():
            t = decode_table_batch(
                batch,
                table=table,
                columns=spec["columns"],
                pk_columns=spec["pk_columns"],
                base_width=spec["base_width"],
                ddl_gtid=spec["ddl_gtid"],
                ddl_columns=spec["ddl_columns"],
                keep_before=self.keep_before,
            )
            n = t.num_rows
            cols = {
                "gtid": t.column("gtid"),
                "seq_in_txn": t.column("seq_in_txn"),
                "pos": t.column("pos"),
                "op": t.column("op"),
                "ts": t.column("ts"),
                "table": pa.array([table] * n, pa.string()),
                "key": pc.binary_join_element_wise(
                    pa.scalar(table), t.column("key"), _KEY_SEP
                ),
            }
            for name, typ in self.union_payload.items():
                if name in t.column_names:
                    cols[name] = t.column(name)
                else:
                    cols[name] = pa.nulls(n, typ)
            if self.keep_before:
                cols["before"] = t.column("before")
            outs.append(pa.table(cols))
        return pa.concat_tables(outs, promote_options="default")
