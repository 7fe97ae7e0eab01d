"""Windowed aggregates + as-of join — streaming-shaped operators.

The reference has no windows (its stream is applied in pure log order,
SURVEY §2.8); these are the custom operators a large-scale training-data
/ event pipeline needs, expressed Ray-Data-first:

* ``tumbling_aggregate`` — classic two-phase aggregation: a vectorized
  per-block partial (window, key) reduce inside ``map_batches`` (the
  combiner), then a small ``groupby().aggregate(Sum)`` over partials —
  the shuffle carries O(windows × keys × blocks), not O(events).
* ``asof_forward_fill`` — as-of join along time within each key: probe
  rows take the most recent build-row value at-or-before their
  timestamp.  One hash shuffle by key; within each key-partition the
  fill is a vectorized forward-fill over the time-sorted union — the
  same merge-sorted algorithm a two-table as-of join uses (the build
  side is just a tagged sub-stream).

Partitioning assumption (documented per the build brief): ``key`` must
be hash-partitionable with per-key data fitting one group task; at
10^10 scale hot keys would be range-split by time with boundary
carry-over of the last build value.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum


def tumbling_aggregate(
    ds,
    *,
    ts_col: str,
    key_col: str,
    value_col: str,
    window: str = "day",
    cents: bool = True,
):
    """Per (tumbling window, key): row count + exact value sum.

    ``cents=True`` sums integer cents (float sums are not associative —
    the same exactness trick as tpch_q1ish)."""

    def partial(t: pa.Table) -> pa.Table:
        w = pc.floor_temporal(t.column(ts_col), unit=window)
        vals = t.column(value_col).to_numpy(zero_copy_only=False)
        # SQL semantics: SUM skips nulls, COUNT(*) counts every row —
        # and np.rint(NaN).astype(int64) would silently produce INT64_MIN
        valid = ~np.isnan(vals)
        safe = np.where(valid, vals, 0.0)
        # half-away-from-zero, matching SQL ROUND (np.rint rounds half to
        # even — a .5-cent tie would diverge from the DuckDB oracle)
        v = (
            np.where(
                safe >= 0, np.floor(safe * 100 + 0.5), np.ceil(safe * 100 - 0.5)
            ).astype(np.int64)
            if cents
            else safe
        )
        # Arrow-native local groupby — the decode→partial hot path stays
        # pandas-free (count mode="all" = COUNT(*); sum skips nothing
        # because invalid values were zeroed above)
        g = (
            pa.table(
                {
                    "window_start": w,
                    key_col: t.column(key_col),
                    "v": pa.array(v),  # already zeroed at invalid positions
                }
            )
            .group_by(["window_start", key_col])
            .aggregate(
                [("v", "count", pc.CountOptions(mode="all")), ("v", "sum")]
            )
        )
        return pa.table(
            {
                "window_start": g.column("window_start"),
                key_col: g.column(key_col),
                "n": pc.cast(g.column("v_count"), pa.int64()),
                "sum_cents": pc.cast(
                    g.column("v_sum"), pa.int64() if cents else pa.float64()
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["window_start", key_col])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents"))
    )


def hopping_aggregate(
    ds,
    *,
    ts_col: str,
    key_col: str,
    value_col: str,
    window_days: int = 2,
    hop_days: int = 1,
):
    """Hopping (sliding) window aggregate: each event contributes to
    ``window_days / hop_days`` overlapping windows.

    Same combiner shape as ``tumbling_aggregate`` — the explode happens
    INSIDE the per-block partial (each row fans out to its windows
    before the local groupby), so the shuffle still carries only
    (window, key, partials), never the exploded events."""
    assert window_days % hop_days == 0, "window must be a multiple of hop"
    fanout = window_days // hop_days

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t.column(ts_col), unit="day")
        vals = t.column(value_col).to_numpy(zero_copy_only=False)
        valid = ~np.isnan(vals)
        safe = np.where(valid, vals, 0.0)
        cents = np.where(
            safe >= 0, np.floor(safe * 100 + 0.5), np.ceil(safe * 100 - 0.5)
        ).astype(np.int64)
        key_arr = t.column(key_col)
        v_arr = pa.array(cents)  # already zeroed at invalid positions
        pieces = []
        for k in range(fanout):
            # window starting k hops BEFORE the event's day covers it
            start = pc.add(
                day, pa.scalar(-k * hop_days * 86_400_000_000, pa.duration("us"))
            )
            pieces.append(
                pa.table(
                    {
                        "window_start": pc.cast(start, pa.timestamp("us")),
                        key_col: key_arr,
                        "v": v_arr,
                    }
                )
            )
        # Arrow-native explode + local groupby (no pandas round-trip)
        g = (
            pa.concat_tables(pieces)
            .group_by(["window_start", key_col])
            .aggregate(
                [("v", "count", pc.CountOptions(mode="all")), ("v", "sum")]
            )
        )
        return pa.table(
            {
                "window_start": g.column("window_start"),
                key_col: g.column(key_col),
                "n": pc.cast(g.column("v_count"), pa.int64()),
                "sum_cents": pc.cast(g.column("v_sum"), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["window_start", key_col])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents"))
    )


def sessionize(
    ds,
    *,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 3600,
    num_partitions: int = 16,
):
    """Gap-based sessionization per key — the classic streaming window
    the reference has no analogue for (its stream is pure log order,
    SURVEY §2.8).

    One hash exchange by key (the storage shuffle); within each
    partition the fold is fully vectorized: sort by (key, ts), flag
    rows whose gap to the previous event exceeds ``gap_seconds``,
    cumulative-sum the flags into session ids, then segment-reduce
    start/end/count.  Output: (key, session_seq, n_events,
    start_ts, end_ts) with ``session_seq`` numbering a key's sessions
    from 0 in time order."""
    from ..stages.merge import add_partition_column
    from ..stages.shuffle import storage_fold

    def add_part(t: pa.Table) -> pa.Table:
        return add_partition_column(t, num_partitions, col=key_col)

    def fold(group: pa.Table) -> pa.Table:
        k = group.column(key_col)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        codes = (
            pc.cast(k, pa.string()).dictionary_encode().indices.to_numpy(
                zero_copy_only=False
            )
            if not pa.types.is_integer(k.type)
            else k.to_numpy(zero_copy_only=False)
        )
        # floor to whole epoch seconds (sub-second timestamps would fail
        # a lossy cast; the SQL oracle floors identically)
        us = pc.cast(pc.cast(group.column(ts_col), pa.timestamp("us")), pa.int64())
        tsv = us.to_numpy(zero_copy_only=False) // 1_000_000
        order = np.lexsort((tsv, codes))
        sc, st_ = codes[order], tsv[order]
        n = len(sc)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = sc[1:] != sc[:-1]
        gap = np.empty(n, dtype=bool)
        gap[0] = True
        gap[1:] = (st_[1:] - st_[:-1]) > gap_seconds
        new_sess = new_key | gap
        starts = np.flatnonzero(new_sess)
        ends = np.r_[starts[1:], n]
        # session_seq: per-key running index
        key_first = np.flatnonzero(new_key)
        sess_key = sc[starts]
        seq = np.arange(len(starts), dtype=np.int64)
        first_sess_of_key = np.searchsorted(starts, key_first)
        seq = seq - np.repeat(
            first_sess_of_key, np.diff(np.r_[first_sess_of_key, len(starts)])
        )
        key_arr = k.take(pa.array(order[starts]))
        return pa.table(
            {
                key_col: key_arr,
                "session_seq": pa.array(seq),
                "n_events": pa.array((ends - starts).astype(np.int64)),
                "start_ts": pa.array(st_[starts]),
                "end_ts": pa.array(st_[ends - 1]),
            }
        )

    # empty-input schema mirrors the fold's real output; the key type
    # comes from the input schema (a string key hardcoded as int64 broke
    # schema-dependent consumers of an empty result)
    try:
        schema = ds.schema()
        key_type = dict(zip(schema.names, schema.types))[key_col]
        if not isinstance(key_type, pa.DataType):
            key_type = pa.int64()
    except Exception:
        key_type = pa.int64()
    return storage_fold(
        ds.map_batches(add_part, batch_format="pyarrow"),
        num_partitions,
        fold,
        label="sessionize",
        empty_schema={
            key_col: key_type,
            "session_seq": pa.int64(),
            "n_events": pa.int64(),
            "start_ts": pa.int64(),
            "end_ts": pa.int64(),
        },
    )


def asof_forward_fill(
    ds,
    *,
    key_col: str,
    order_col: str,
    build_mask_col: str,
    value_col: str,
    out_col: str = "asof_value",
    num_partitions: int = 16,
):
    """As-of join along ``order_col`` within each key.

    Every row is a probe; rows where ``build_mask_col`` is true are also
    build rows.  Each probe gets the build row's ``value_col`` with the
    greatest ``order_col`` at-or-before its own (inclusive).  Returns the
    input columns + ``out_col``."""

    def fill(group: pa.Table) -> pa.Table:
        k = group.column(key_col)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        codes = k.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        ordv = group.column(order_col).to_numpy(zero_copy_only=False)
        build_np = group.column(build_mask_col).to_numpy(zero_copy_only=False)
        # tertiary key: builds BEFORE probes at equal order_col, so the
        # documented inclusive at-or-before semantics are deterministic
        order = np.lexsort((np.where(build_np, 0, 1), ordv, codes))
        t = group.take(pa.array(order))
        oc = codes[order]
        n = t.num_rows
        is_build = build_np[order].astype(bool)
        vals = t.column(value_col).to_numpy(zero_copy_only=False)
        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        new_seg[1:] = oc[1:] != oc[:-1]
        # forward-fill: index of the last build row at-or-before each row,
        # resetting at key boundaries
        idx = np.arange(n, dtype=np.int64)
        src = np.where(is_build, idx, -1)
        # segment-wise cummax: reset by forcing -1 carriers at boundaries
        seg_id = np.cumsum(new_seg) - 1
        # offset trick: add seg_id * n so cummax can't cross segments
        carrier = np.where(src >= 0, src + seg_id * n, seg_id * n - 1)
        filled = np.maximum.accumulate(carrier) - seg_id * n
        out = np.where(filled >= 0, vals[np.clip(filled, 0, n - 1)], np.nan)
        has = filled >= 0
        return t.append_column(
            out_col,
            pc.if_else(
                pa.array(has), pa.array(out, pa.float64()), pa.scalar(None, pa.float64())
            ),
        )

    from ..stages.merge import add_partition_column
    from ..stages.shuffle import storage_fold

    def add_part(t: pa.Table) -> pa.Table:
        return add_partition_column(t, num_partitions, col=key_col)

    # empty-input schema mirrors the fold's real output (input columns +
    # the filled value), same contract sessionize pins — without it an
    # empty/fully-filtered input returns a schema-less table that breaks
    # the caller's select_columns
    try:
        schema = ds.schema()
        empty_schema = {
            n: (t if isinstance(t, pa.DataType) else pa.string())
            for n, t in zip(schema.names, schema.types)
        }
        empty_schema[out_col] = pa.float64()
    except Exception:
        empty_schema = None

    # the exchange is the storage shuffle (stages/shuffle.storage_fold),
    # not the CPU-count-invariant sort groupby — same fill fold per
    # co-located key partition
    return storage_fold(
        ds.map_batches(add_part, batch_format="pyarrow"),
        num_partitions,
        fill,
        label="asof",
        empty_schema=empty_schema,
    )
