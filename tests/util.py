"""Shared test helpers: engine-vs-oracle parity check."""

from __future__ import annotations

import pyarrow as pa

from go_mysql_transfer_ray import oracle


def lake_hashes(table: pa.Table) -> dict[str, str]:
    """Per-row canonical sha256 of an engine lake table, keyed by composite
    key.  Extra (DDL-added) columns = everything beyond the base five, in
    table order — which is ALTER order by construction."""
    extras = tuple(
        c for c in table.column_names if c not in oracle.BASE_ROW_COLUMNS
    )
    out = {}
    for row in table.to_pylist():
        out[oracle.composite_key(row["repo"], row["path"])] = oracle.row_sha256(
            row, extra_cols=extras
        )
    return out


def assert_state_equal(engine_table: pa.Table, oracle_state: dict[str, dict]):
    eng = lake_hashes(engine_table)
    ora = oracle.state_hashes(oracle_state)
    assert set(eng) == set(ora), (
        f"key sets differ: engine-only={list(set(eng) - set(ora))[:5]} "
        f"oracle-only={list(set(ora) - set(eng))[:5]} "
        f"(engine {len(eng)} vs oracle {len(ora)})"
    )
    bad = [k for k in ora if eng[k] != ora[k]]
    assert not bad, f"{len(bad)} rows hash-mismatch, e.g. {bad[:5]}"
