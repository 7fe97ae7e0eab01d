"""Per-partition lake manifests — checkpoint / resume / exactly-once fence.

Upgrade of the reference's single BoltDB binlog position
(/root/reference/storage/bolt_position_storage.go:48-71, save throttling at
/root/reference/service/handler.go:149-192) to **per-partition resumable
lineage**: each merge partition atomically writes its Parquet data file and
a small JSON manifest ``{partition, gtid_watermark, file, rows}``.

Atomicity = write-temp + ``os.replace`` (rename) — a crash mid-write leaves
either no manifest (partition re-runs: the merge is deterministic and
idempotent) or a complete one (partition is skipped on resume).  A resumed
run skips every partition whose manifest watermark is >= the run's target
watermark (GTID fencing); partial partitions are simply recomputed from the
retained input log, which replays to a byte-identical state because the
merge is a pure function of the event set.

Layout::

    out_dir/
      part=00017/data.parquet
      _manifests/part-00017.json
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq


def _write_json_atomic(path: str, obj) -> None:
    """THE atomic-JSON recipe (write-temp + os.replace) every manifest
    artifact shares — one place to add fsync or collision handling."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifests")


def atomic_write_parquet_dir(ds, out_path: str) -> str:
    """Write a Dataset as a Parquet directory with tmp-dir + rename swap.

    A reader never sees a partial write, and a crash never DESTROYS the
    previous complete export: the old directory is renamed aside (not
    rmtree'd) before the new one takes its place, and deleted only after
    the swap — POSIX has no atomic directory exchange, so the one
    remaining hazard is a crash in the instant between the two renames,
    which leaves the previous data intact under ``<out>.old.<pid>``.
    Used by the decoded-change and oracle-relation exports (idempotent
    re-writes)."""
    import shutil

    tmp = f"{out_path}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp)
    old = f"{out_path}.old.{os.getpid()}"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(out_path):
        os.rename(out_path, old)
    os.rename(tmp, out_path)
    shutil.rmtree(old, ignore_errors=True)
    return out_path


def write_partition(
    out_dir: str, part: int, table: pa.Table, gtid_watermark: int,
    plan: str = "",
) -> dict:
    """Atomically write one partition's data + manifest; returns the manifest.

    ``plan`` identifies the run configuration (rule/transform/partition
    count); resume only fences partitions written under the SAME plan."""
    pdir = os.path.join(out_dir, f"part={part:05d}")
    os.makedirs(pdir, exist_ok=True)
    data_path = os.path.join(pdir, "data.parquet")
    tmp = data_path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, data_path)

    m = {
        "partition": part,
        "gtid_watermark": int(gtid_watermark),
        "file": data_path,
        "rows": table.num_rows,
        "plan": plan,
    }
    _write_json_atomic(
        os.path.join(manifest_dir(out_dir), f"part-{part:05d}.json"), m
    )
    return m


def write_marker(
    out_dir: str, part: int, gtid_watermark: int, plan: str = "", rows: int = 0
) -> dict:
    """Manifest WITHOUT a data file — used by the multi-table replay as a
    run-level fence: the partition's per-table slices live under each
    table's own lake dir; this marker records that the shared exchange
    converged partition ``part`` at the watermark (a table with zero rows
    in the partition gets no per-table manifest, so per-table fences
    alone could never cover every partition)."""
    m = {
        "partition": part,
        "gtid_watermark": int(gtid_watermark),
        "file": None,
        "rows": int(rows),
        "plan": plan,
    }
    _write_json_atomic(
        os.path.join(manifest_dir(out_dir), f"part-{part:05d}.json"), m
    )
    return m


def load_manifests(out_dir: str) -> dict[int, dict]:
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return {}
    out: dict[int, dict] = {}
    for name in os.listdir(mdir):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
            out[m["partition"]] = m
    return out


def finished_partitions(
    out_dir: str, target_watermark: int, plan: str = ""
) -> frozenset[int]:
    """Partitions already converged at (or past) the target watermark
    UNDER THE SAME PLAN — a manifest written by a run with a different
    rule/transform/partitioning must not fence this one."""
    return frozenset(
        p
        for p, m in load_manifests(out_dir).items()
        if m["gtid_watermark"] >= target_watermark and m.get("plan", "") == plan
    )


def save_schema(out_dir: str, ddl_events: list) -> None:
    """Persist the accumulated DDL history next to the manifests — the
    analogue of the reference's cached table metadata that survives
    across sync sessions (/root/reference/service/transfer_service.go:
    249-262 fetches it per start; we persist what the stream taught us so
    later micro-batches know the schema ALTERs they didn't see)."""
    _write_json_atomic(
        os.path.join(manifest_dir(out_dir), "_schema.json"),
        {"ddl_events": ddl_events},
    )


def load_schema(out_dir: str) -> list:
    path = os.path.join(manifest_dir(out_dir), "_schema.json")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return json.load(f)["ddl_events"]


def remove_partitions_except(out_dir: str, keep: "set[int]") -> int:
    """Post-write reconciliation: drop every manifested partition NOT in
    ``keep`` (stale output of an older plan, or a partition whose correct
    state this run is empty).  Runs only after the replacement partitions
    are durably written — a crash beforehand leaves stale data visible
    but never loses data (the rerun recomputes and reconciles)."""
    import shutil

    removed = 0
    for p in load_manifests(out_dir):
        if p not in keep:
            shutil.rmtree(
                os.path.join(out_dir, f"part={p:05d}"), ignore_errors=True
            )
            try:
                os.unlink(os.path.join(manifest_dir(out_dir), f"part-{p:05d}.json"))
            except OSError:
                pass
            removed += 1
    return removed


def set_watermarks(out_dir: str, watermark: int) -> int:
    """Force every manifest's watermark (the CLI -position override,
    /root/reference/main.go:156-189).  Returns manifests touched."""
    mdir = manifest_dir(out_dir)
    n = 0
    for p, m in load_manifests(out_dir).items():
        m["gtid_watermark"] = int(watermark)
        _write_json_atomic(os.path.join(mdir, f"part-{p:05d}.json"), m)
        n += 1
    return n
