"""Canonical Arrow schemas for the CDC engine.

The event record mirrors the reference's ``model.RowRequest``
(/root/reference/model/request.go:11-17) — ``{RuleKey, Action, Timestamp,
Old, Row}`` — upgraded from positional ``[]interface{}`` rows to typed Arrow
structs, and from a (binlog file, offset) position
(/root/reference/storage/bolt_position_storage.go:48-71) to a
``(gtid, seq_in_txn)`` pair usable for exactly-once fencing.

Raw binlog values arrive untyped (the reference coerces them per column in
``convertColumnData``, /root/reference/service/endpoint/endpoint.go:90-219);
we model that by carrying the DDL-added ``stars`` column as *string* in the
row image — the decode stage performs the reference's NUMBER coercion
(bad parse -> null, endpoint.go:180-197).
"""

from __future__ import annotations

import pyarrow as pa

TABLE_NAME = "repos"

# Base lake-table columns, per BASELINE.json input_hint.
BASE_COLUMNS = ["repo", "path", "commit", "lang", "content"]

# Source tables a binlog stream can carry (the reference syncs N tables
# through one stream, each with its own rule:
# /root/reference/service/transfer_service.go:206-276).  ``repos`` is the
# flagship input_hint table; ``users`` is the second table for the
# multi-table single-pass replay.
TABLE_COLUMNS: "dict[str, list[str]]" = {
    "repos": BASE_COLUMNS,
    "users": ["user_id", "name", "email", "plan"],
}
TABLE_PKS: "dict[str, tuple[str, ...]]" = {
    "repos": ("repo", "path"),
    "users": ("user_id",),
}


# Row image carried by every change event.  DDL-added columns (default:
# one mid-stream ``stars``) are string-typed here (raw binlog bytes) and
# null for events before their ALTER.  With multiple ``tables`` the image
# is the UNION of the tables' columns (a row fills only its own table's
# fields — nulls elsewhere cost one validity bit in Arrow / nothing in
# Parquet), so a mixed stream stays ONE typed schema end-to-end.
def row_image_type(
    ddl_columns: "tuple[str, ...]" = ("stars",),
    tables: "tuple[str, ...]" = ("repos",),
) -> pa.StructType:
    fields = [(c, pa.string()) for c in TABLE_COLUMNS[tables[0]]]
    fields += [(c, pa.string()) for c in ddl_columns]
    for t in tables[1:]:
        fields += [(c, pa.string()) for c in TABLE_COLUMNS[t]]
    return pa.struct(fields)


DDL_TYPE = pa.struct([("add_column", pa.string()), ("arrow_type", pa.string())])


def event_schema(
    ddl_columns: "tuple[str, ...]" = ("stars",),
    tables: "tuple[str, ...]" = ("repos",),
) -> pa.Schema:
    img = row_image_type(ddl_columns, tables)
    return pa.schema(
        [
            ("gtid", pa.int64()),        # transaction id (GTID analogue)
            ("seq_in_txn", pa.int32()),  # order inside the transaction
            ("pos", pa.int64()),         # global change index
            ("op", pa.string()),         # insert | update | delete | ddl
            ("table", pa.string()),
            ("ts", pa.timestamp("s")),
            ("col_count", pa.int32()),   # row-image arity as sent (M1)
            ("before", img),             # BEFORE image: updates + deletes
            ("after", img),              # AFTER image: inserts + updates
            ("ddl", DDL_TYPE),           # only for op='ddl'
        ]
    )


ROW_IMAGE_TYPE = row_image_type()
EVENT_SCHEMA = event_schema()

# Decoded (flattened) change-row schema produced by stages.decode — the
# engine's internal IR.  ``key`` is the reference's separator-less composite
# PK concat (/root/reference/service/endpoint/endpoint.go:309-322).
DECODED_COLUMNS = [
    "gtid",
    "seq_in_txn",
    "pos",
    "op",
    "ts",
    "key",
    "repo",
    "path",
    "commit",
    "lang",
    "content",
    "stars",
]

# Final lake-table schema after the DDL widened it.
LAKE_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
        ("stars", pa.int64()),
    ]
)
