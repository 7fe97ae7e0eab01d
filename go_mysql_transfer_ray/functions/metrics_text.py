"""Prometheus text-exposition rendering of the engine's counters (T10).

The reference registers gauges/counters and serves them over promhttp
(/root/reference/metrics/metrics.go:41-92, exporter wiring :94-112,
counter updates :145-172).  This sandbox has no network, so the export
surface is the artifact itself: the same metric families rendered in the
Prometheus text exposition format (a public, stable format), from the
per-table action counts the merge pipelines already produce as datasets.

Metric names/labels mirror the reference exactly:
``transfer_leader_state``, ``transfer_destination_state``,
``transfer_delay``, ``transfer_inserted_num{table=...}``,
``transfer_updated_num{table=...}``, ``transfer_deleted_num{table=...}``.
"""

from __future__ import annotations

_GAUGES = [
    ("transfer_leader_state", "The cluster leader state: 0=false, 1=true"),
    ("transfer_destination_state", "The destination running state: 0=stopped, 1=ok"),
    ("transfer_delay", "The transfer slave lag"),
]

_COUNTERS = {
    "insert": ("transfer_inserted_num", "The number of data inserted to destination"),
    "update": ("transfer_updated_num", "The number of data updated to destination"),
    "delete": ("transfer_deleted_num", "The number of data deleted from destination"),
}


def _escape_label(v: str) -> str:
    return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def render_exposition(
    action_counts: "dict[tuple[str, str], int]",
    *,
    leader_state: int = 1,
    destination_state: int = 1,
    delay: int = 0,
) -> str:
    """Render the reference's metric families as Prometheus text format.

    ``action_counts``: {(table, action): count} — e.g. the collected
    per-partition metrics of a replay, or a
    ``groupby(table, op).count()`` result.  Deterministic output: gauges
    first, then each counter family with labels sorted by table."""
    lines: list[str] = []
    gauge_vals = {
        "transfer_leader_state": leader_state,
        "transfer_destination_state": destination_state,
        "transfer_delay": delay,
    }
    for name, help_text in _GAUGES:
        lines.append(f"# HELP {name} {help_text}")
        lines.append(f"# TYPE {name} gauge")
        lines.append(f"{name} {gauge_vals[name]}")
    for action in ("insert", "update", "delete"):
        name, help_text = _COUNTERS[action]
        lines.append(f"# HELP {name} {help_text}")
        lines.append(f"# TYPE {name} counter")
        tables = sorted(
            t for (t, a) in action_counts if a == action
        )
        for t in tables:
            lines.append(
                f'{name}{{table="{_escape_label(t)}"}} '
                f"{int(action_counts[(t, action)])}"
            )
    return "\n".join(lines) + "\n"


def counts_from_dataset(ds, *, table_col: str = "table", op_col: str = "op"):
    """(table, op) → count from a change-event dataset — a two-phase
    vectorized aggregate (Count), then a tiny driver-side dict."""
    from ray.data.aggregate import Count

    out = ds.groupby([table_col, op_col]).aggregate(Count(alias_name="n"))
    return {
        (r[table_col], r[op_col]): int(r["n"])
        for r in out.take_all()
    }
