"""Wire-format encoders — the exact bytes the reference's network sinks
put on the socket, reproduced as vectorized Arrow kernels.

The engine's sinks are converged lake/state relations (no services in
this sandbox), but the byte streams the reference would transmit are a
pure function of the change rows, so they are computable — and checkable
— without a network:

* **RESP** (REdis Serialization Protocol v2): the reference builds one
  go-redis pipeline command per change row
  (/root/reference/service/endpoint/redis.go:225-267 — ``pipe.Set`` /
  ``HSet`` / ``Del`` / ``HDel`` / ``LRem``+``RPush`` / ``SRem``+``SAdd``
  / ``ZRem``+``ZAdd``); go-redis marshals every command as a RESP array
  of bulk strings (``*N\\r\\n`` then ``$len\\r\\narg\\r\\n`` per arg,
  lengths in BYTES).  ``redis_resp_stream`` emits those exact frames.
  Reference quirk kept: the update path of set/sortedset passes a stray
  ``0`` member to the remove (redis.go:252,261 — a copy of the LRem
  count argument), so ``SREM key 0 old`` / ``ZREM key 0 old`` go on the
  wire verbatim.

* **ES bulk NDJSON**: the reference maps insert/update/delete to
  olivere BulkIndex/BulkUpdate/BulkDelete requests
  (/root/reference/service/endpoint/elastic6.go:293-300); the bulk body
  serializes as an action/metadata line plus, for index/update, a
  source line (``{"index":{"_index":i,"_type":t,"_id":id}}\\n{doc}\\n``;
  update wraps the doc as ``{"doc":{...}}``; delete is the action line
  only).  ES7 omits ``_type`` (elastic7.go sends typeless bulk ops).

Everything is ``pyarrow.compute`` string assembly — no Python row loops,
so the stage streams at Arrow speed and the frames are byte-exact
(multi-byte UTF-8 args frame with their UTF-8 byte length via
``pc.binary_length``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

CRLF = "\r\n"

_ArrOrStr = "pa.Array | pa.ChunkedArray | str"


def _bulk(piece: "pa.Array | pa.ChunkedArray") -> list:
    """RESP bulk-string frame pieces for one argument array."""
    ln = pc.cast(pc.binary_length(piece), pa.string())
    return ["$", ln, CRLF, piece, CRLF]


def resp_command(*args: _ArrOrStr) -> "pa.Array | pa.ChunkedArray":
    """RESP-encode one command per row: ``*N`` then each arg as a bulk
    string.  ``args`` mixes constant ``str`` (command names, literal
    counts) with string arrays; at least one argument must be an array.
    Constant args are framed once at compile time."""
    pieces: list = [f"*{len(args)}{CRLF}"]
    n_arrays = 0
    for a in args:
        if isinstance(a, str):
            raw = a.encode("utf-8")
            pieces.append(f"${len(raw)}{CRLF}{a}{CRLF}")
        else:
            n_arrays += 1
            pieces.extend(_bulk(a))
    if not n_arrays:
        raise ValueError("resp_command needs at least one array argument")
    return pc.binary_join_element_wise(*pieces, "")


def _concat(*parts) -> "pa.Array | pa.ChunkedArray":
    return pc.binary_join_element_wise(*parts, "")


def redis_resp_stream(
    plan,
    batch: pa.Table,
    *,
    value_col: str,
    old_value_col: "str | None" = None,
    gtid_col: str = "gtid",
    op_col: str = "op",
    seq_col: "str | None" = None,
) -> pa.Table:
    """Exact RESP pipeline bytes per change row for one Redis rule.

    Command selection follows redis.go:225-267 by ``plan.cfg.structure``
    and the row's op; rows whose op maps to two pipeline commands
    (list/set/sortedset updates) emit both frames concatenated, exactly
    the bytes that row appends to the reference's pipeline buffer.
    Returns (gtid, redis_key, cmd, resp); ``seq_col`` (opt-in so the
    wire-oracle schema stays fixed) passes the intra-transaction
    sequence through for delivery-order sorts.
    """
    cfg = plan.cfg
    # nil values go on the wire as empty bulk strings ($0), matching the
    # reference's stringutil.ToString(nil) → "" — a null must never null
    # out the whole frame (binary_join_element_wise emits null through)
    key = pc.fill_null(plan.keys(batch), "")
    val = pc.fill_null(plan._stringify(batch.column(value_col)), "")
    op = batch.column(op_col)
    is_del = pc.equal(op, "delete")
    is_upd = pc.equal(op, "update")
    old = (
        pc.fill_null(plan._stringify(batch.column(old_value_col)), "")
        if old_value_col is not None and old_value_col in batch.column_names
        else None
    )

    if cfg.structure == "string":
        # redis.go:228-231: delete → DEL key, else SET key val
        resp = pc.if_else(is_del, resp_command("DEL", key), resp_command("SET", key, val))
        cmd = pc.if_else(is_del, pa.scalar("DEL"), pa.scalar("SET"))
    elif cfg.structure == "hash":
        # redis.go:234-237: delete → HDEL key field, else HSET key field val
        field = pc.fill_null(plan.fields(batch), "")
        resp = pc.if_else(
            is_del,
            resp_command("HDEL", key, field),
            resp_command("HSET", key, field, val),
        )
        cmd = pc.if_else(is_del, pa.scalar("HDEL"), pa.scalar("HSET"))
    elif cfg.structure == "list":
        # redis.go:240-246: delete → LREM key 0 val; update → LREM key 0
        # old + RPUSH key val; insert → RPUSH key val
        push = resp_command("RPUSH", key, val)
        rem_val = resp_command("LREM", key, "0", val)
        if old is not None:
            rem_old = resp_command("LREM", key, "0", old)
            upd = _concat(rem_old, push)
        else:
            upd = push
        resp = pc.if_else(is_del, rem_val, pc.if_else(is_upd, upd, push))
        cmd = pc.if_else(
            is_del,
            pa.scalar("LREM"),
            pc.if_else(is_upd, pa.scalar("LREM+RPUSH"), pa.scalar("RPUSH")),
        )
    elif cfg.structure == "set":
        # redis.go:248-255: delete → SREM key val; update → SREM key 0
        # old (stray 0 member kept, redis.go:252) + SADD; insert → SADD
        add = resp_command("SADD", key, val)
        rem_val = resp_command("SREM", key, val)
        if old is not None:
            upd = _concat(resp_command("SREM", key, "0", old), add)
        else:
            upd = add
        resp = pc.if_else(is_del, rem_val, pc.if_else(is_upd, upd, add))
        cmd = pc.if_else(
            is_del,
            pa.scalar("SREM"),
            pc.if_else(is_upd, pa.scalar("SREM+SADD"), pa.scalar("SADD")),
        )
    elif cfg.structure == "sortedset":
        # redis.go:257-266: delete → ZREM key val; update → ZREM key 0
        # old (stray 0, redis.go:261) + ZADD key score val; insert → ZADD
        # same Go shortest-float formatting (NaN/null → "") as the
        # converged-state path, so both Redis surfaces encode one score
        # identically (stages/redis_state.py _stringify float branch)
        score = pc.fill_null(plan._stringify(plan.scores(batch)), "")
        add = resp_command("ZADD", key, score, val)
        rem_val = resp_command("ZREM", key, val)
        if old is not None:
            upd = _concat(resp_command("ZREM", key, "0", old), add)
        else:
            upd = add
        resp = pc.if_else(is_del, rem_val, pc.if_else(is_upd, upd, add))
        cmd = pc.if_else(
            is_del,
            pa.scalar("ZREM"),
            pc.if_else(is_upd, pa.scalar("ZREM+ZADD"), pa.scalar("ZADD")),
        )
    else:  # pragma: no cover - RedisPlan validates structure
        raise ValueError(f"unknown structure {cfg.structure!r}")

    cols = {
        "gtid": batch.column(gtid_col),
        "redis_key": key,
        "cmd": cmd,
        "resp": resp,
    }
    if seq_col is not None:
        cols[seq_col] = batch.column(seq_col)
    return pa.table(cols)


# JSON string-literal escapes, applied in order (backslash FIRST so the
# escapes it introduces are never re-escaped): backslash, quote, the
# named control shorthands \b \t \n \f \r (the same forms encode_json's
# json.dumps path emits for bodies), \u00xx for the remaining C0
# controls — merge keys legitimately contain \x00 (CLAUDE.md) and a raw
# newline in an _id would split an ES bulk action line across NDJSON
# rows — and the HTML trio Go's json.Marshal escapes by default.
_JSON_PRE: "tuple[tuple[str, str], ...]" = (
    ("\\", "\\\\"), ('"', '\\"'),
)
_JSON_CTRL: "tuple[tuple[str, str], ...]" = (
    (("\b", "\\b"), ("\t", "\\t"), ("\n", "\\n"),
     ("\f", "\\f"), ("\r", "\\r"))
    + tuple(
        (chr(c), f"\\u{c:04x}")
        for c in range(0x20)
        if chr(c) not in "\b\t\n\f\r"
    )
)
_JSON_POST: "tuple[tuple[str, str], ...]" = (
    ("<", "\\u003c"), (">", "\\u003e"), ("&", "\\u0026"),
)
# RE2 class matching any C0 control — one vectorized containment probe
# decides whether the 32 control-escape passes run at all
_CTRL_CLASS = "[\\x00-\\x1f]"


def _json_escape(col):
    """Escape a value for embedding inside a JSON string literal with the
    same byte output as ``encoders.encode_json`` (json.dumps +
    Go-HTML-escape) produces for body strings — named shorthands for the
    common controls, ``\\u00xx`` for the rest, so metadata fields
    (``_index``/``_type``/``_id``) and bodies frame identically and no
    raw control byte can corrupt NDJSON/extended-JSON framing.

    Hot-path shape: backslash runs FIRST (so escapes it introduces are
    never re-escaped), then the 32 per-control passes run only when one
    cheap regex probe finds any C0 byte in the column — metadata columns
    almost never carry controls, so the common case is 5 kernel passes
    plus one match, not 37 full-column materializations."""
    for lit, rep in _JSON_PRE:
        col = pc.replace_substring(col, pattern=lit, replacement=rep)
    has_ctrl = pc.any(
        pc.match_substring_regex(pc.fill_null(col, ""), _CTRL_CLASS)
    ).as_py()
    if has_ctrl:
        for lit, rep in _JSON_CTRL:
            col = pc.replace_substring(col, pattern=lit, replacement=rep)
    for lit, rep in _JSON_POST:
        col = pc.replace_substring(col, pattern=lit, replacement=rep)
    return col


def es_bulk_ndjson(ops: pa.Table, *, include_type: bool = True) -> pa.Table:
    """Bulk-API NDJSON body lines from bulk-op rows (es_index, es_type,
    id, action, body) as produced by ``es_mapping.es6_bulk_ops``.

    Framing per elastic6.go:293-300: insert → ``{"index":meta}\\n{doc}\\n``,
    update → ``{"update":meta}\\n{"doc":{doc}}\\n``, delete →
    ``{"delete":meta}\\n``.  ``include_type=False`` gives the ES7
    typeless action line (elastic7.go bulk path).  Returns (id, action,
    ndjson)."""
    raw_id = ops.column("id")
    idx = _json_escape(ops.column("es_index"))
    typ = _json_escape(ops.column("es_type"))
    _id = _json_escape(raw_id)
    action = ops.column("action")
    body = ops.column("body")

    if include_type:
        meta = _concat(
            '{"_index":"', idx, '","_type":"', typ, '","_id":"', _id, '"}'
        )
    else:
        meta = _concat('{"_index":"', idx, '","_id":"', _id, '"}')

    index_lines = _concat('{"index":', meta, "}\n", body, "\n")
    update_lines = _concat('{"update":', meta, '}\n{"doc":', body, "}\n")
    delete_line = _concat('{"delete":', meta, "}\n")

    ndjson = pc.if_else(
        pc.equal(action, "delete"),
        delete_line,
        pc.if_else(pc.equal(action, "update"), update_lines, index_lines),
    )
    return pa.table({"id": raw_id, "action": action, "ndjson": ndjson})


def mongo_bulk_models(ops: pa.Table, *, id_numeric: bool = True) -> pa.Table:
    """Extended-JSON bulkWrite models from op rows (id, action, body).

    Shapes per the reference's non-Lua path
    (/root/reference/service/endpoint/mongo.go:167-178: ``kvm["_id"] =
    primaryKey``; insert → InsertOneModel(kvm), update →
    UpdateOneModel(filter {_id}, {"$set": kvm}), delete →
    DeleteOneModel(filter {_id})) plus the Lua upsert action
    (mongo.go:150: SetUpsert(true)).  ``body`` is the rule's json value
    encoding WITHOUT _id; the _id key is injected first, exactly where
    the reference's map gains it.  ``id_numeric=False`` quotes (and
    JSON-escapes) string primary keys.  Returns (id, action, model)."""
    raw_id = ops.column("id")
    if not pa.types.is_string(raw_id.type):
        raw_id = pc.cast(raw_id, pa.string())
    action = ops.column("action")
    body = ops.column("body")
    idj = raw_id if id_numeric else _concat('"', _json_escape(raw_id), '"')

    # '{"a":1}' → '"a":1}' so the _id pair can be injected up front;
    # an empty body '{}' leaves just the closing brace (no comma)
    rest = pc.utf8_slice_codeunits(body, 1, 2**31 - 1)
    sep = pc.if_else(pc.equal(body, "{}"), pa.scalar(""), pa.scalar(","))
    doc = _concat('{"_id":', idj, sep, rest)

    filt = _concat('{"_id":', idj, "}")
    ins = _concat('{"insertOne":{"document":', doc, "}}")
    upd = _concat('{"updateOne":{"filter":', filt, ',"update":{"$set":', doc, "}}}")
    ups = _concat(
        '{"updateOne":{"filter":', filt, ',"update":{"$set":', doc, '},"upsert":true}}'
    )
    dele = _concat('{"deleteOne":{"filter":', filt, "}}")

    model = pc.if_else(
        pc.equal(action, "delete"),
        dele,
        pc.if_else(
            pc.equal(action, "update"),
            upd,
            pc.if_else(pc.equal(action, "upsert"), ups, ins),
        ),
    )
    return pa.table({"id": raw_id, "action": action, "model": model})
