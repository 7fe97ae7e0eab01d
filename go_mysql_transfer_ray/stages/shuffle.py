"""Storage-backed key exchange — the engine's shuffle, without a Sort.

Ray Data's built-in ``groupby(...).map_groups`` routes through a global
sort-based all-to-all whose wall time barely scales with CPUs for this
workload (measured: 34-41 s at sf0.1×2 regardless of 4 vs 16 CPUs).  The
merge only needs *co-location by partition id*, not order — so the
exchange is expressed as the classic external-shuffle pattern instead:

  stage A  map task: split each combined batch by ``_part`` and append
           one delta Parquet per (task, partition) under
           ``<shuffle_dir>/part=K/`` — sequential local writes, no
           cross-task coordination;
  stage B  one independent task per partition: read that partition's
           delta files, reduce (LWW by key), write the final partition +
           manifest.  Embarrassingly parallel; the only barrier is the
           inherent one (a partition can't finalize before all its
           deltas exist).

On a multi-node cluster the shuffle dir lives on the shared store the
lake already requires — the same design as Spark's external shuffle /
push-based shuffle.  Crash safety falls out of the merge's idempotence:
duplicate delta files (task retries, reruns) carry identical
``(key, gtid, seq)`` rows and dedupe in the LWW reduce; a stale shuffle
dir from a run with different parameters is detected via ``_meta.json``
and wiped.

Scale note: delta-file count = A-tasks × partitions.  At 10^10 events
the pattern stays the same but deltas aggregate per node (actor-held
buffers / a shuffle service) rather than per task; at bench scale
(~10^2 tasks × ~10^2 partitions) per-task files are the simple and
fast choice.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class DeltaWriter:
    """map_batches stage: split a combined batch by ``_part`` and append
    delta Parquet files.  Emits one tiny count row per batch so the
    pipeline stays streaming (no data returns to the object store).

    Delta filenames are a CONTENT fingerprint of the batch (plus the Ray
    task id): a retried map task re-processing the same batch writes the
    same filename and overwrites instead of appending duplicates —
    making the exchange retry-idempotent for ALL folds, including
    non-prereducible ones (sessionize event counts, redis list replay)
    where the flagship's LWW dedup argument alone would not hold.  A
    task-id-plus-counter scheme is NOT retry-stable: Ray caches the
    deserialized UDF per worker, so a retry in a surviving worker would
    continue the counter."""

    def __init__(self, shuffle_dir: str):
        self.shuffle_dir = shuffle_dir

    @staticmethod
    def _name_stem(batch: pa.Table, part: np.ndarray) -> str:
        import hashlib

        import pandas as pd

        h = hashlib.sha1()
        h.update(len(part).to_bytes(8, "little"))
        h.update(np.ascontiguousarray(part).tobytes())
        # EVERY non-partition column contributes to the stem (hashing
        # only the first column collided for batches that agreed on the
        # key but differed in payload — same 'key'/'_part', different
        # 'gtid' — silently overwriting one batch's deltas with
        # another's).  Per column we fold the vectorized row-hash into a
        # sum + 16-point strided sample: content-distinguishing, but the
        # sha1 input stays O(1) per column.
        for name in batch.column_names:
            if name == "_part":
                continue
            col = batch.column(name)
            try:
                hv = pd.util.hash_array(
                    col.to_numpy(zero_copy_only=False), categorize=False
                )
                h.update(hv.sum(dtype=np.uint64).tobytes())
                h.update(np.ascontiguousarray(hv[:: max(1, len(hv) // 16)]).tobytes())
            except (TypeError, ValueError):
                # nested / non-hashable dtype: fall back to the Arrow
                # buffer bytes of the combined chunk (still vectorized)
                for chunk in col.chunks if hasattr(col, "chunks") else [col]:
                    for buf in chunk.buffers():
                        if buf is not None:
                            h.update(buf)
        try:
            import ray as _ray

            tid = _ray.get_runtime_context().get_task_id() or ""
        except Exception:
            tid = ""
        return f"{tid[:16]}-{h.hexdigest()[:16]}"

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"_rows": pa.array([0], pa.int64())})
        u = self._name_stem(batch, batch.column("_part").to_numpy())
        n = 0
        for p, t in split_by_part(batch):
            pq.write_table(
                t, os.path.join(self.shuffle_dir, f"part={p:05d}", f"d-{u}.parquet")
            )
            n += t.num_rows
        return pa.table({"_rows": pa.array([n], pa.int64())})


def split_by_part(batch: pa.Table):
    """Yield (partition, table-without-_part) slices of a combined batch."""
    part = batch.column("_part").to_numpy()
    order = np.argsort(part, kind="stable")
    t = batch.take(pa.array(order))
    part = part[order]
    bounds = np.flatnonzero(np.diff(part)) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(part)]])
    for s, e in zip(starts, ends):
        yield int(part[s]), t.slice(int(s), int(e - s)).drop_columns(["_part"])


_BUF_NAMESPACE = "gmt_shuffle"


class _NodeDeltaBuffer:
    """Node-local delta aggregation actor (one per node per run).

    Buffers each partition's rows in memory and writes ONE delta file per
    (node, partition, flush) instead of one per (task, partition) —
    delta-file count scales with nodes, not tasks: the adaptation the
    module docstring names for 10^10-event streams, where per-task files
    would swamp the shared store's metadata.  A partition's buffer
    flushes when it crosses ``flush_bytes``; the driver flushes the
    remainder (``flush_node_buffers``) after stage A completes."""

    def __init__(self, shuffle_dir: str, flush_bytes: int):
        self.shuffle_dir = shuffle_dir
        self.flush_bytes = flush_bytes
        self.bufs: dict[int, list] = {}
        self.sizes: dict[int, int] = {}
        self.seq = 0
        self.tag = uuid.uuid4().hex[:12]
        self.last_activity = time.monotonic()

    def describe(self) -> dict:
        """Liveness probe for the reaper: which shuffle dir this buffer
        serves and how long since its last append."""
        return {
            "shuffle_dir": self.shuffle_dir,
            "idle_s": time.monotonic() - self.last_activity,
        }

    def append(self, batch: pa.Table) -> int:
        self.last_activity = time.monotonic()
        n = 0
        for p, t in split_by_part(batch):
            self.bufs.setdefault(p, []).append(t)
            self.sizes[p] = self.sizes.get(p, 0) + t.nbytes
            n += t.num_rows
            if self.sizes[p] >= self.flush_bytes:
                self._flush_part(p)
        return n

    def _flush_part(self, p: int) -> None:
        tabs = self.bufs.pop(p, [])
        if not tabs:
            return
        self.sizes.pop(p, None)
        self.seq += 1
        pq.write_table(
            pa.concat_tables(tabs, promote_options="default"),
            os.path.join(
                self.shuffle_dir, f"part={p:05d}",
                f"d-node-{self.tag}-{self.seq:06d}.parquet",
            ),
        )

    def flush(self) -> int:
        wrote = 0
        for p in sorted(self.bufs):
            self._flush_part(p)
            wrote += 1
        return wrote


class BufferedDeltaWriter:
    """map_batches stage: route combined batches to the caller node's
    delta-buffer actor instead of writing per-task files.

    The append is node-local (object-store transfer never crosses the
    network) and synchronous, so when stage A's sum() returns every row
    is either on disk or in a buffer — the driver then calls
    ``flush_node_buffers(run_id)`` before stage B.

    Exactly-once caveat: a retried task RE-APPENDS its batch (buffered
    rows have no content-addressed filename), so this mode is only valid
    for folds whose reduce dedups replayed rows — the LWW merge (both
    flagship replays) qualifies; non-prereducible folds (sessionize,
    list replay) must keep the per-task DeltaWriter."""

    def __init__(self, shuffle_dir: str, run_id: str,
                 flush_bytes: int = 64 << 20):
        self.shuffle_dir = shuffle_dir
        self.run_id = run_id
        self.flush_bytes = flush_bytes
        self._actor = None

    def _buffer_actor(self):
        import ray

        if self._actor is None:
            node_id = ray.get_runtime_context().get_node_id()
            actor_cls = ray.remote(num_cpus=0)(_NodeDeltaBuffer)
            self._actor = actor_cls.options(
                name=f"gmtbuf-{self.run_id}-{node_id[:16]}",
                namespace=_BUF_NAMESPACE,
                get_if_exists=True,
                lifetime="detached",
                scheduling_strategy=ray.util.scheduling_strategies.NodeAffinitySchedulingStrategy(
                    node_id=node_id, soft=False
                ),
            ).remote(self.shuffle_dir, self.flush_bytes)
        return self._actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if batch.num_rows == 0:
            return pa.table({"_rows": pa.array([0], pa.int64())})
        n = ray.get(self._buffer_actor().append.remote(batch))
        return pa.table({"_rows": pa.array([n], pa.int64())})


def reap_stale_node_buffers(
    exclude_run_id: str,
    shuffle_dir: "str | None" = None,
    *,
    stale_after_s: float = 1800.0,
) -> int:
    """Kill leftover gmtbuf-* actors from PRIOR runs — without destroying
    a live concurrent run's buffers.

    The buffer actors must be detached (their creators are short-lived
    map tasks — a non-detached actor dies with its owner mid-run), so a
    driver that crashes before ``flush_node_buffers`` leaks them.  Every
    node-mode replay sweeps the namespace first.  An actor with a
    different run id is killed only when it is provably stale:

    * it serves THIS run's ``shuffle_dir`` (just re-prepared — its
      buffered rows belong to a superseded attempt of the same lake);
    * its shuffle dir no longer exists on disk;
    * it has been idle longer than ``stale_after_s`` (a live stage A
      appends at least once per batch; the 30-minute default sits far
      above even this sandbox's documented multi-minute degraded-phase
      stalls, so a merely-slow live run is not mistaken for a corpse);
    * it does not answer ``describe()`` within 10 s (wedged).

    A RESPONSIVE, recently-active buffer for a DIFFERENT shuffle dir
    means a second node-mode replay is running in this cluster — that
    run's deltas must not be destroyed, so the sweep fails fast instead
    of reaping (the caller should serialize the runs or use separate
    Ray clusters)."""
    import ray
    from ray.util import list_named_actors

    keep = f"gmtbuf-{exclude_run_id}-"
    reaped = 0
    for info in list_named_actors(all_namespaces=True):
        if info["namespace"] != _BUF_NAMESPACE or not info["name"].startswith("gmtbuf-"):
            continue
        if info["name"].startswith(keep):
            continue
        try:
            actor = ray.get_actor(info["name"], namespace=info["namespace"])
        except ValueError:  # raced with its own teardown
            continue
        try:
            d = ray.get(actor.describe.remote(), timeout=10)
            same_dir = shuffle_dir is not None and d["shuffle_dir"] == shuffle_dir
            dir_gone = not os.path.isdir(d["shuffle_dir"])
            aged_out = d["idle_s"] >= stale_after_s
            if not (same_dir or dir_gone or aged_out):
                raise RuntimeError(
                    f"live node-mode replay detected (buffer {info['name']} "
                    f"for {d['shuffle_dir']!r}, idle {d['idle_s']:.0f}s): "
                    "concurrent node-mode replays in one Ray cluster are "
                    "not supported — refusing to reap its delta buffers"
                )
        except RuntimeError:
            raise
        except ray.exceptions.GetTimeoutError:
            # alive but BUSY: an actor's tasks run serially, so a
            # describe() queued behind a long append/flush (this box's
            # degraded phases stall writes for minutes — BASELINE.md)
            # times out while the buffer is perfectly healthy.  Killing
            # it would silently drop a concurrent run's buffered rows —
            # skip; a truly dead actor raises RayActorError instead, and
            # a wedged-but-idle one is reaped once describe() answers
            # with aged_out.
            continue
        except Exception:
            # dead / pre-describe actor version: treat as wedged
            pass
        try:
            ray.kill(actor)
            reaped += 1
        except ValueError:
            pass
    return reaped


def flush_node_buffers(run_id: str) -> int:
    """Flush + tear down every node's delta buffer for ``run_id``.
    Returns the number of residual partition buffers written."""
    import ray
    from ray.util import list_named_actors

    wrote = 0
    prefix = f"gmtbuf-{run_id}-"
    for info in list_named_actors(all_namespaces=True):
        if info["namespace"] != _BUF_NAMESPACE or not info["name"].startswith(prefix):
            continue
        a = ray.get_actor(info["name"], namespace=info["namespace"])
        wrote += ray.get(a.flush.remote())
        ray.kill(a)
    return wrote


def prepare_shuffle_dir(shuffle_dir: str, num_partitions: int, meta: dict) -> None:
    """Create (or wipe-and-create) the shuffle dir.

    ``meta`` identifies the run's parameters (watermark, partitions); a
    leftover dir whose meta differs would mix incompatible partition
    assignments, so it is removed."""
    meta_path = os.path.join(shuffle_dir, "_meta.json")
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                old = json.load(f)
        except (OSError, ValueError):
            old = None
        if old != meta:
            shutil.rmtree(shuffle_dir, ignore_errors=True)
    elif os.path.exists(shuffle_dir):
        shutil.rmtree(shuffle_dir, ignore_errors=True)
    for p in range(num_partitions):
        os.makedirs(os.path.join(shuffle_dir, f"part={p:05d}"), exist_ok=True)
    with open(meta_path, "w") as f:
        json.dump(meta, f)


def partition_delta_files(shuffle_dir: str, part: int) -> list[str]:
    return sorted(glob.glob(os.path.join(shuffle_dir, f"part={part:05d}", "*.parquet")))


def read_partition_deltas(shuffle_dir: str, part: int) -> "pa.Table | None":
    files = partition_delta_files(shuffle_dir, part)
    if not files:
        return None
    return pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="default"
    )


def cleanup(shuffle_dir: str) -> None:
    shutil.rmtree(shuffle_dir, ignore_errors=True)


_FOLD_ROOT = "/tmp/gmt_shuffle"


def storage_fold(ds, num_partitions: int, fold, *, label: str = "fold",
                 empty_schema: "dict | None" = None):
    """Generic Dataset → Dataset keyed fold over the storage shuffle.

    ``ds`` must carry an int32 ``_part`` column (0..num_partitions-1);
    ``fold(table) -> table`` consumes one whole co-located partition.
    This is the shared exchange behind ``merged_dataset``,
    ``fieldwise_merged_dataset``, the redis list fold and the as-of join
    — all of which rode ``groupby("_part").map_groups`` in round 1, the
    sort-based all-to-all whose wall time is CPU-count-invariant on this
    box (BASELINE.md).  Same two stages as the lake merge
    (pipelines/cdc.py), minus manifests:

      stage A  DeltaWriter appends one delta Parquet per (task, part);
      stage B  one independent task per NON-EMPTY partition reads its
               deltas and applies ``fold``.

    Partitions that received no rows are skipped by a driver-side
    directory listing (cheap, local metadata), so every stage-B task
    returns the fold's real schema — no empty-schema RefBundles.  The
    folded result (the small converged state) is materialized so the
    shuffle dir can be removed before returning."""
    import ray.data

    shuffle_dir = os.path.join(_FOLD_ROOT, f"{label}-{uuid.uuid4().hex[:12]}")
    prepare_shuffle_dir(
        shuffle_dir, num_partitions,
        {"label": label, "num_partitions": num_partitions},
    )
    try:
        ds.map_batches(
            DeltaWriter(shuffle_dir), batch_format="pyarrow"
        ).sum("_rows")
        live = [
            p for p in range(num_partitions) if partition_delta_files(shuffle_dir, p)
        ]
        if not live:
            # ``empty_schema`` keeps an empty result schema-ful so
            # downstream select_columns on a no-op stream doesn't break
            return ray.data.from_arrow(
                pa.table({c: pa.array([], t) for c, t in (empty_schema or {}).items()})
            )

        def run(batch: dict) -> pa.Table:
            outs = []
            for p in batch["id"]:
                group = read_partition_deltas(shuffle_dir, int(p))
                if group is not None and group.num_rows:
                    outs.append(fold(group))
            return pa.concat_tables(outs, promote_options="default")

        out = (
            ray.data.from_items(
                [{"id": p} for p in live], override_num_blocks=len(live)
            )
            .map_batches(run, batch_size=None)
            .materialize()
        )
        return out
    finally:
        cleanup(shuffle_dir)
