"""External CDC-envelope ingestion — JSONL change streams → event shards.

The reference's only source is a live MySQL replication connection
(/root/reference/service/transfer_service.go:106-134).  Real deployments
also replicate via log shippers that emit one JSON envelope per change
(the de-facto public interchange shape popularized by Debezium: ``op`` in
{c,u,d,r}, ``before``/``after`` row images, a source timestamp).  This
module ingests such a stream with ``ray.data.read_json`` — block-parallel,
streaming — normalizes it to the engine's canonical typed event schema
(schema.event_schema) and writes ``events-*.parquet`` shards that
``cdc.replay`` / ``cdc.replay_multi`` consume unchanged.

Envelope contract (one JSON object per line):

    op       "c" (create) | "u" (update) | "d" (delete) | "r" (snapshot
             read — replays as insert, like the reference's stock rows)
    before   object | null   row image before the change (u, d)
    after    object | null   row image after the change (c, u, r)
    gtid     int             transaction id (GTID/LSN analogue)
    seq      int             order within the transaction
    ts_ms    int             source timestamp, epoch millis
    table    string          optional; defaults to the flagship table
    col_count int            optional; row-image arity as sent.  JSON
             cannot distinguish an absent key from an explicit null, so
             when the stream contains mid-stream DDL the shipper must
             send the arity explicitly (the reference reads it off the
             wire, /root/reference/service/handler.go:88-117); without
             it every row is assumed at the table's base arity.

Everything is vectorized Arrow (struct_field / casts); no Python per row.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..schema import DDL_TYPE, TABLE_COLUMNS, TABLE_NAME, row_image_type

_OP_MAP = {"c": "insert", "r": "insert", "u": "update", "d": "delete"}


def _map_ops(col: pa.Array) -> pa.Array:
    """c/r/u/d → insert/update/delete, vectorized; null or unknown codes
    raise (a null op is a malformed envelope, not a droppable row — the
    reference reads the action off the wire and can't receive one)."""
    if pc.any(pc.is_null(col)).as_py():
        n_null = pc.sum(pc.is_null(col)).as_py()
        raise ValueError(
            f"null envelope op not allowed ({n_null} line(s) missing 'op'; "
            "every change line must carry op in {c,u,d,r})"
        )
    codes = pa.array(list(_OP_MAP), pa.string())
    idx = pc.index_in(col, codes)
    if pc.any(pc.is_null(idx)).as_py():
        bad = pc.unique(col.filter(pc.is_null(idx)))
        raise ValueError(f"unknown envelope op codes: {bad.to_pylist()}")
    targets = pa.array([_OP_MAP[c] for c in _OP_MAP], pa.string())
    return pc.take(targets, idx)


def _image(col, img_type: pa.StructType, n: int) -> pa.Array:
    """Project an incoming (possibly partial / untyped) image struct onto
    the canonical all-string image type; absent fields → null columns."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    present = (
        {f.name for f in col.type} if pa.types.is_struct(col.type) else set()
    )
    arrays = []
    for f in img_type:
        if f.name in present:
            v = pc.struct_field(col, f.name)
            # JSON numbers arrive as int64/double — the canonical image
            # carries raw strings (the decode stage owns coercion, like
            # the reference's convertColumnData, endpoint.go:90-219)
            arrays.append(pc.cast(v, pa.string()))
        else:
            arrays.append(pa.nulls(n, pa.string()))
    # row-level validity: an image is null iff the incoming struct is null
    if pa.types.is_struct(col.type):
        mask = col.is_valid()
    else:
        mask = pa.array(np.zeros(n, bool))
    return pa.StructArray.from_arrays(
        arrays, fields=list(img_type), mask=pc.invert(mask)
    )


class _Normalizer:
    """map_batches stage: envelope batch → canonical event batch."""

    def __init__(self, table: str, ddl_columns: "tuple[str, ...]",
                 tables: "tuple[str, ...]"):
        self.table = table
        self.img_type = row_image_type(ddl_columns, tables)
        self.base_width = {
            t: len(TABLE_COLUMNS[t]) for t in tables
        }

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        names = set(t.column_names)
        gtid = pc.cast(t.column("gtid"), pa.int64())
        seq = (
            pc.cast(t.column("seq"), pa.int32())
            if "seq" in names
            else pa.array(np.zeros(n, np.int32))
        )
        table_col = (
            pc.cast(t.column("table"), pa.string())
            if "table" in names
            else pa.array([self.table] * n, pa.string())
        )
        if "col_count" in names:
            col_count = pc.cast(t.column("col_count"), pa.int32())
        else:
            widths = np.full(n, self.base_width.get(self.table, 0), np.int32)
            tn = table_col.to_numpy(zero_copy_only=False)
            for tname, w in self.base_width.items():
                widths[tn == tname] = w
            col_count = pa.array(widths)
        ts = (
            pc.cast(
                pc.divide(pc.cast(t.column("ts_ms"), pa.int64()), 1000),
                pa.timestamp("s"),
            )
            if "ts_ms" in names
            else pa.nulls(n, pa.timestamp("s"))
        )
        before = _image(
            t.column("before") if "before" in names else pa.nulls(n),
            self.img_type, n,
        )
        after = _image(
            t.column("after") if "after" in names else pa.nulls(n),
            self.img_type, n,
        )
        pos = (
            pc.cast(t.column("pos"), pa.int64())
            if "pos" in names
            else pa.array(
                (
                    gtid.to_numpy(zero_copy_only=False).astype(np.int64) << 20
                )
                + seq.to_numpy(zero_copy_only=False).astype(np.int64)
            )
        )
        return pa.table(
            {
                "gtid": gtid,
                "seq_in_txn": seq,
                "pos": pos,
                "op": _map_ops(
                    pc.cast(t.column("op"), pa.string()).combine_chunks()
                    if isinstance(t.column("op"), pa.ChunkedArray)
                    else pc.cast(t.column("op"), pa.string())
                ),
                "table": table_col,
                "ts": ts,
                "col_count": col_count,
                "before": before,
                "after": after,
                "ddl": pa.nulls(n, DDL_TYPE),
            }
        )


def jsonl_to_event_shards(
    src: "str | list[str]",
    out_dir: str,
    *,
    table: str = TABLE_NAME,
    ddl_columns: "tuple[str, ...]" = ("stars",),
    tables: "tuple[str, ...] | None" = None,
) -> str:
    """Ingest a JSONL CDC-envelope stream into canonical event shards.

    ``src``: file, directory or list for ``ray.data.read_json``.  Writes
    ``out_dir/events-NNNNN.parquet`` (+ ``_meta.json``) so the result is a
    drop-in ``events_dir`` for ``cdc.replay`` — including the pruned
    ``stream_facts`` reads (parquet row-group gtid statistics come from
    the writer).  The whole conversion is a streaming Ray job; nothing
    materializes on the driver."""
    tables = tuple(tables or (table,))
    ds = ray.data.read_json(src)
    ds = ds.map_batches(
        _Normalizer(table, tuple(ddl_columns), tables),
        batch_format="pyarrow",
    )
    tmp = out_dir + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp)
    # the write succeeded — only now replace any previous events dir
    # (write-tmp-then-swap: a failed ingest never destroys the old shards)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "*.parquet")))):
        os.replace(f, os.path.join(out_dir, f"events-{i:05d}.parquet"))
    with open(os.path.join(out_dir, "_meta.json"), "w") as fh:
        json.dump({"source": "jsonl", "tables": list(tables)}, fh)
    shutil.rmtree(tmp, ignore_errors=True)
    return out_dir
