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
  their position are dropped; the count of dropped rows is tracked per
  batch in a ``_dropped`` metrics column emitted via side-channel counters;
* NUMBER coercion for the DDL-added ``stars`` column
  (`service/endpoint/endpoint.go:180-197`): parse failure → null.

Stateless — runs as plain ``map_batches`` tasks over pyarrow batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import TABLE_NAME

BASE_WIDTH = 5


def decode_batch(
    batch: pa.Table,
    *,
    table: str = TABLE_NAME,
    ddl_gtid: "int | list[int] | None" = None,
    keep_before: bool = False,
    ddl_columns: "tuple[tuple[str, str], ...]" = (("stars", "number"),),
) -> pa.Table:
    """Decode one Arrow batch of raw events into flat change rows.

    ``ddl_gtid``: gtid(s) of the stream's ALTERs (None = no DDL) — each
    one widens the expected arity by one column for rows after it.  DDL
    rows themselves are dropped here (their effect is carried via
    ``ddl_gtid``, extracted by a cheap pruned pre-read in the pipeline
    driver — see pipelines/cdc.py).
    """
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
            batch.column("col_count"), pa.scalar(BASE_WIDTH, pa.int32())
        )
    else:
        gtid = batch.column("gtid").to_numpy(zero_copy_only=False)
        # no change event shares a DDL's transaction, so strict < counts
        # the ALTERs already applied at each row's position
        expected = BASE_WIDTH + np.searchsorted(
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

    repo = field("repo")
    path = field("path")
    # composite key: separator-less concat (endpoint.go:309-322)
    key = pc.binary_join_element_wise(repo, path, "")

    cols = {
        "gtid": t.column("gtid"),
        "seq_in_txn": t.column("seq_in_txn"),
        "pos": t.column("pos"),
        "op": op,
        "ts": t.column("ts"),
        "key": key,
        "repo": repo,
        "path": path,
        "commit": field("commit"),
        "lang": field("lang"),
        "content": field("content"),
    }
    # DDL-added columns arrive as raw strings; coerce per declared type —
    # NUMBER: digits-only check then cast, unparsable → null
    # (endpoint.go:180-197); FLOAT: same with a float pattern; else string.
    for name, mtype in ddl_columns:
        raw = field(name)
        if mtype == "number":
            ok = pc.match_substring_regex(raw, r"^-?[0-9]+$")
            cols[name] = pc.cast(
                pc.if_else(pc.fill_null(ok, False), raw, pa.scalar(None, pa.string())),
                pa.int64(),
            )
        elif mtype == "float":
            ok = pc.match_substring_regex(
                raw, r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?$"
            )
            cols[name] = pc.cast(
                pc.if_else(pc.fill_null(ok, False), raw, pa.scalar(None, pa.string())),
                pa.float64(),
            )
        else:
            cols[name] = raw
    if keep_before:
        cols["before"] = before
    return pa.table(cols)


class Decoder:
    """Callable wrapper so the pipeline can pass config once."""

    def __init__(self, table: str = TABLE_NAME, ddl_gtid=None,
                 keep_before: bool = False,
                 ddl_columns: "tuple[tuple[str, str], ...]" = (("stars", "number"),)):
        self.table = table
        self.ddl_gtid = ddl_gtid
        self.keep_before = keep_before
        self.ddl_columns = tuple(ddl_columns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return decode_batch(
            batch, table=self.table, ddl_gtid=self.ddl_gtid,
            keep_before=self.keep_before, ddl_columns=self.ddl_columns,
        )
