"""Key-partitioned upsert/merge — the engine's one true shuffle.

The reference applies changes to keyed sink state strictly in log order from
a single thread (/root/reference/service/handler.go:135-194; Redis SET/DEL
/root/reference/service/endpoint/redis.go:225-269, Mongo by ``_id``
/root/reference/service/endpoint/mongo.go:166-190).  Because every change
event carries the **full AFTER image**, the final state of a key is fully
determined by its **last** event in ``(gtid, seq_in_txn)`` order:

    state(key) = argmax_{(gtid, seq)} events(key);  absent if that op=delete

i.e. last-writer-wins per key is an **associative, commutative reduce** —
which is what makes it expressible as a skew-proof Ray Data plan:

  1. ``combine_batch`` (inside map_batches, before the shuffle): per-block
     partial reduce — keep only each key's last event in the block.  This is
     the salted-sub-partition / combiner pattern required by the north rule:
     a hot key contributes at most ONE row per input block to the shuffle,
     no matter how many updates hit it, so partition sizes stay balanced
     even when one repo receives ~50% of all events.
  2. hash-partition on the composite key (``add_partition_column``) —
     deterministic ``hash(key) % P``.
  3. ``final_merge`` per partition: same reduce over the partials, then drop
     delete tombstones.

Exactly-once falls out of the same reduce: duplicated blocks / replayed
events share ``(gtid, seq)`` and an identical image, so the argmax is
unchanged (the upgrade of the reference's at-least-once position throttle,
/root/reference/service/handler.go:152-191).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_SORT_KEYS = [
    ("key", "ascending"),
    ("gtid", "ascending"),
    ("seq_in_txn", "ascending"),
]


def keep_last_per_key(t: pa.Table) -> pa.Table:
    """Vectorized per-key argmax(gtid, seq).

    Factorize the key strings once, lexsort INT arrays only (never the
    payload), mark each key's winner, and apply a single boolean filter —
    the payload (large ``content`` strings) is copied exactly once, for
    surviving rows only, instead of a full-table sorted ``take``."""
    n = t.num_rows
    if n <= 1:
        return t
    k = t.column("key")
    if isinstance(k, pa.ChunkedArray):
        k = k.combine_chunks()
    # arrow dictionary codes, NOT pd.factorize — pandas' string hashtable
    # truncates at embedded NUL bytes, which our "\x00" composite-key
    # separators (redis_state) would collide on
    codes = k.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    gtid = t.column("gtid").to_numpy(zero_copy_only=False)
    seq = t.column("seq_in_txn").to_numpy(zero_copy_only=False)
    order = np.lexsort((seq, gtid, codes))
    oc = codes[order]
    last_of_run = np.empty(n, dtype=bool)
    last_of_run[:-1] = oc[:-1] != oc[1:]
    last_of_run[-1] = True
    mask = np.zeros(n, dtype=bool)
    mask[order[last_of_run]] = True
    return t.filter(pa.array(mask))


def key_hash(keys: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic 64-bit hash of the key column (stable across processes:
    pandas siphash with its fixed default hash_key)."""
    arr = keys.to_numpy(zero_copy_only=False)
    return pd.util.hash_array(arr, categorize=False)


def add_partition_column(
    t: pa.Table, num_partitions: int, *, col: str = "key"
) -> pa.Table:
    """Append the hash-partition id for ``col`` — THE partitioning step
    every storage-fold caller shares (windows/sessionize/asof included),
    so null-handling or hash changes live in exactly one place."""
    k = t.column(col)
    if not pa.types.is_string(k.type):
        import pyarrow.compute as pc

        k = pc.cast(k, pa.string())
    part = (key_hash(k) % np.uint64(num_partitions)).astype(np.int32)
    return t.append_column("_part", pa.array(part, type=pa.int32()))


class Combiner:
    """map_batches stage: partial reduce + partition id + fencing filter.

    ``skip_parts``: partitions already converged at-or-past the target
    watermark (from manifests) — their events are dropped at the earliest
    stage so a resumed run does no work for finished partitions (GTID
    fencing, the upgrade of the reference's positionStorage resume,
    /root/reference/storage/bolt_position_storage.go:48-71).
    """

    def __init__(self, num_partitions: int, skip_parts: frozenset[int] = frozenset()):
        self.num_partitions = num_partitions
        self.skip_parts = skip_parts

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = keep_last_per_key(batch)
        t = add_partition_column(t, self.num_partitions)
        if self.skip_parts:
            keep = np.isin(
                t.column("_part").to_numpy(),
                np.fromiter(self.skip_parts, dtype=np.int32),
                invert=True,
            )
            t = t.filter(pa.array(keep))
        return t


INTERNAL_COLUMNS = ("key", "gtid", "seq_in_txn", "op", "pos", "ts", "before", "_part")


def merged_dataset(
    ds, num_partitions: int, final_columns: list[str] | None = None
):
    """The merge plan as a Dataset → Dataset transform (no lake write).

    Input needs columns (key, gtid, seq_in_txn, op, payload...).  Used by
    generic keyed-upsert pipelines (e.g. last-state-per-key over an events
    table) that want the CDC merge semantics without manifests.  The
    exchange is the same storage shuffle as the flagship lake merge
    (stages/shuffle.storage_fold) — round 1 rode the sort-based
    ``groupby("_part").map_groups`` here, which BASELINE.md measured as
    CPU-count-invariant."""
    import functools

    from .shuffle import storage_fold

    combined = ds.map_batches(
        Combiner(num_partitions), batch_format="pyarrow"
    )
    fm = functools.partial(final_merge, final_columns=final_columns)
    return storage_fold(combined, num_partitions, fm, label="merged")


def final_merge(group: pa.Table, *, final_columns: list[str] | None) -> pa.Table:
    """Per-partition finalize: reduce partials, drop tombstones, project.

    ``final_columns=None``: keep every non-internal column (used when a UDF
    may add columns the plan can't know statically).
    """
    t = keep_last_per_key(group)
    t = t.filter(pc.not_equal(t.column("op"), pa.scalar("delete")))
    if final_columns is None:
        final_columns = [c for c in t.column_names if c not in INTERNAL_COLUMNS]
    return t.select(final_columns)


# ---------------------------------------------------------------------------
# field-wise merge — Mongo $set partial-update semantics (K2)


def _segment_last(values: np.ndarray, seg_start: np.ndarray) -> np.ndarray:
    return np.maximum.reduceat(values, seg_start)


def fieldwise_final_merge(
    group: pa.Table, *, final_columns: list[str], upsert: bool = False
) -> pa.Table:
    """Per-key ordered fold with PARTIAL updates, fully vectorized.

    The reference's Mongo sink applies updates as ``UpdateOne({$set:
    doc})`` by ``_id`` (/root/reference/service/endpoint/mongo.go:166-190)
    — an update only overwrites the fields it carries; inserts replace
    the whole document; deletes remove it; an update on a missing key is
    a no-op (no upsert outside the Lua path).  Null fields in an update
    row mean "not set".

    ``upsert=True`` additionally honors op='upsert' — the Lua path's
    ``UpdateOne(..., SetUpsert(true))``
    (/root/reference/service/luaengine/mongo_actuator.go:77-91,
    mongo.go:141-149): creates the document when absent (its fields
    become the whole doc), behaves like a $set update when alive.  The
    document baseline (the point field resolution starts from) is
    therefore max(last insert, first create after the last delete) —
    an insert RESETS the doc, an upsert never does.

    Unlike the full-image LWW merge, this fold is NOT block-prereducible
    (dropping an intermediate update would lose a field), so the plan
    partitions WITHOUT the combiner and folds whole partitions here.
    """
    n = group.num_rows
    if n == 0:
        return group.select([c for c in final_columns if c in group.column_names])
    k = group.column("key")
    if isinstance(k, pa.ChunkedArray):
        k = k.combine_chunks()
    codes = k.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    gtid = group.column("gtid").to_numpy(zero_copy_only=False)
    seq = group.column("seq_in_txn").to_numpy(zero_copy_only=False)
    order = np.lexsort((seq, gtid, codes))
    t = group.take(pa.array(order))
    oc = codes[order]
    new_seg = np.empty(n, dtype=bool)
    new_seg[0] = True
    new_seg[1:] = oc[1:] != oc[:-1]
    seg_start = np.flatnonzero(new_seg)
    seg_id = np.cumsum(new_seg) - 1
    idx = np.arange(n, dtype=np.int64)

    op = t.column("op").to_numpy(zero_copy_only=False)
    is_ins = op == "insert"
    is_del = op == "delete"
    li = _segment_last(np.where(is_ins, idx, -1), seg_start)
    ld = _segment_last(np.where(is_del, idx, -1), seg_start)
    if upsert:
        is_ups = op == "upsert"
        creates = is_ins | is_ups
        INF = np.int64(np.iinfo(np.int64).max)
        # first create strictly after the key's last delete
        cand = np.where(creates & (idx > ld[seg_id]), idx, INF)
        fca = np.minimum.reduceat(cand, seg_start)
        alive = fca != INF
        li = np.maximum(li, np.where(alive, fca, -1))
        setter_extra = is_ups
    else:
        alive = (li >= 0) & (li > ld)
        setter_extra = np.zeros(n, dtype=bool)

    out_cols: dict[str, pa.Array] = {}
    setter = is_ins | (op == "update") | setter_extra
    for c in final_columns:
        col = t.column(c)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        non_null = ~np.asarray(pc.is_null(col))
        cand = setter & non_null & (idx >= li[seg_id])
        win = _segment_last(np.where(cand, idx, -1), seg_start)
        wa = win[alive]
        taken = col.take(pa.array(np.where(wa >= 0, wa, 0)))
        out_cols[c] = pc.if_else(
            pa.array(wa >= 0), taken, pa.scalar(None, col.type)
        )
    return pa.table(out_cols)


def fieldwise_merged_dataset(ds, num_partitions: int, final_columns: list[str],
                             *, upsert: bool = False):
    """Dataset plan for the field-wise merge: hash-partition by key (NO
    combiner — see fieldwise_final_merge) then fold each partition over
    the storage shuffle (same exchange as ``merged_dataset``)."""
    import functools

    from .shuffle import storage_fold

    part = ds.map_batches(
        lambda t: add_partition_column(t, num_partitions), batch_format="pyarrow"
    )
    fm = functools.partial(
        fieldwise_final_merge, final_columns=final_columns, upsert=upsert
    )
    return storage_fold(part, num_partitions, fm, label="fieldwise")
