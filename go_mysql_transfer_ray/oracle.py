"""Sequential reference replayer — the correctness oracle.

Pure-Python analogue of the reference's single-threaded listener loop
(/root/reference/service/handler.go:135-194): consume the binlog in log
order, keep a dict of key → row, apply insert/update/delete/DDL.  This is
the semantics the distributed engine must reproduce byte-for-byte (per-row
content sha256, BASELINE.json invariant).

Semantics pinned here (and asserted by tests):

* **Upsert inserts** — an insert on an existing key overwrites it, exactly
  like Redis ``SET`` (/root/reference/service/endpoint/redis.go:225-233)
  and the Mongo duplicate-key tolerant slow path
  (/root/reference/service/endpoint/mongo.go:193-216).
* **Arity guard** — events whose ``col_count`` does not match the cached
  schema width are dropped with a warning, as in every reference endpoint
  (/root/reference/service/endpoint/redis.go:106-109).  The cached width
  changes when the in-band DDL is applied
  (/root/reference/service/transfer_service.go:298-326).
* **NUMBER coercion** — the DDL-added ``stars`` column arrives as raw
  strings; unparsable values become null
  (/root/reference/service/endpoint/endpoint.go:180-197).
* **Composite key** — separator-less concat of the stringified PK columns
  in PK order (/root/reference/service/endpoint/endpoint.go:309-322).
* **Exactly-once** — replaying a duplicated ``(gtid, seq_in_txn)`` event is
  a no-op state change (last-writer-wins by the same image), so the oracle
  is insensitive to duplicates; the engine must be too.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

BASE_WIDTH = 5  # (repo, path, commit, lang, content)


def coerce_number(raw: str | None) -> int | None:
    """Reference NUMBER coercion: parse failure → null (endpoint.go:180-197).

    Exact ``strconv.ParseInt(s, 10, 64)`` acceptance — NOT Python
    ``int()``, which additionally accepts underscores (``"1_0"``),
    unicode digits, surrounding whitespace and unbounded magnitude;
    Go rejects all of those (returns err → the sink stores nil), and
    the engine's ``functions.coerce.coerce_number`` mask does too."""
    if raw is None:
        return None
    body = raw[1:] if raw[:1] in ("+", "-") else raw
    if not body or any(c not in "0123456789" for c in body):
        return None
    v = int(raw)
    if not (-(2**63) <= v <= 2**63 - 1):
        return None
    return v


def composite_key(repo: str, path: str) -> str:
    """Separator-less PK concat (endpoint.go:309-322)."""
    return f"{repo}{path}"


BASE_ROW_COLUMNS = ("repo", "path", "commit", "lang", "content")


def replay_full(events: pa.Table) -> dict[str, dict]:
    """Replay a full event table sequentially; returns key → final row.

    ``events`` must use the ``schema.event_schema`` shape; rows are
    processed in ``(gtid, seq_in_txn)`` order regardless of physical
    order.  Each in-band DDL widens the expected arity by one and adds a
    column (typed per its ``arrow_type``); rows written before an ALTER
    get null for columns added later.
    """
    cols = events.select(
        ["gtid", "seq_in_txn", "op", "col_count", "before", "after", "ddl"]
    ).to_pylist()
    cols.sort(key=lambda r: (r["gtid"], r["seq_in_txn"]))

    state: dict[str, dict] = {}
    added: list[tuple[str, str]] = []  # (column, arrow_type) in DDL order
    for r in cols:
        op = r["op"]
        if op == "ddl":
            if r["ddl"] and r["ddl"].get("add_column"):
                added.append((r["ddl"]["add_column"], r["ddl"].get("arrow_type", "string")))
            continue
        if r["col_count"] != BASE_WIDTH + len(added):
            continue
        if op == "delete":
            img = r["before"]
            state.pop(composite_key(img["repo"], img["path"]), None)
            continue
        img = r["after"]
        key = composite_key(img["repo"], img["path"])
        row = {c: img[c] for c in BASE_ROW_COLUMNS}
        for name, atype in added:
            raw = img.get(name)
            row[name] = coerce_number(raw) if atype == "int64" else raw
        state[key] = row
    # columns added after a key's last write: null-pad (Arrow widening)
    all_added = [name for name, _ in added]
    for row in state.values():
        for name in all_added:
            row.setdefault(name, None)
        row["__added__"] = tuple(all_added)
    return state


def row_sha256(row: dict, extra_cols: "tuple[str, ...]" = ("stars",)) -> str:
    """Canonical per-row content hash (BASELINE.json invariant):
    base columns + DDL-added columns in ALTER order."""
    parts = []
    for col in (*BASE_ROW_COLUMNS, *extra_cols):
        v = row.get(col)
        parts.append("\\N" if v is None else str(v))
    return hashlib.sha256("\x1e".join(parts).encode()).hexdigest()


def state_hashes(state: dict[str, dict]) -> dict[str, str]:
    out = {}
    for k, v in state.items():
        extra = v.get("__added__", ("stars",))
        out[k] = row_sha256(v, extra_cols=extra)
    return out
