"""dbOps (T4/J1) — the Lua source-database lookup surface as a
broadcast-dictionary join.

The reference lets transforms run ``selectOne``/``select`` SQL against
the live source MySQL from inside the Lua VM
(/root/reference/service/luaengine/db_actuator.go:39-124) — per-row
lookup joins.  A distributed engine must never RPC per row, so the same
API is backed by dimension tables broadcast ONCE (``ray.put`` of
key→row dicts, fetched in each actor's ``__init__``): the lookup itself
is a local dict/index probe inside ``map_batches``.
"""

from __future__ import annotations


class DbOps:
    """selectOne / select over broadcast dimension tables.

    ``tables``: {table_name: {key: row_dict}} for selectOne, and/or
    {table_name: list[row_dict]} for predicate select.  Built per actor
    from a ``ray.get`` of the broadcast ref."""

    def __init__(self, tables: "dict | None" = None):
        self.tables = tables or {}

    def select_one(self, table: str, key) -> "dict | None":
        """db_actuator.go:39-76 selectOne — single-row lookup by key."""
        t = self.tables.get(table)
        if isinstance(t, dict):
            return t.get(key)
        for row in t or []:
            if row.get("id") == key:
                return row
        return None

    def select(self, table: str, predicate=None) -> list:
        """db_actuator.go:78-124 select — multi-row scan with an optional
        Python predicate (the SQL-WHERE analogue)."""
        t = self.tables.get(table)
        rows = list(t.values()) if isinstance(t, dict) else list(t or [])
        if predicate is None:
            return rows
        return [r for r in rows if predicate(r)]
