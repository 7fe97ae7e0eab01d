"""Large-scale correctness spot-run (round-5 verdict item 7).

The driver's CORRECTNESS gate runs every oracle at sf0.01; this script
repeats the same compare (row count + schema + value hash, columns
sorted by name — the driver's exact procedure) at larger scales to
guard against small-fixture-only correctness:

* the named trio ``cdc_replay_repos`` / ``minhash_dedup`` /
  ``sessionize`` at **sf0.1** (10× the gated fixture), via the same
  ``queries()``/``oracle_sql()`` entries the driver uses;
* the flagship once more on a **~13M-change-event stream** (1.6M keys,
  64-byte contents), value-hashed against the same DuckDB LWW oracle
  over the decoded change relation the replay itself consumed.

Writes ``SPOTCHECK_r05.json`` at the repo root.  Owns its Ray session
(a script, not library code).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SPOT_SF_DIR", "/root/testdata/sf0.1")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _value_hash(df) -> str:
    """The driver-style digest: columns sorted by name, rows sorted,
    canonical string rendering, one sha256 over everything."""
    cols = sorted(df.columns)
    df = df[cols].sort_values(cols).reset_index(drop=True)
    h = hashlib.sha256()
    for c in cols:
        col = df[c]
        h.update(c.encode())
        h.update(
            "\x1f".join(
                "\\N" if v is None or v != v else str(v) for v in col.tolist()
            ).encode()
        )
    return h.hexdigest()


def _compare(name: str, got, oracle_df) -> dict:
    import pandas as pd
    import pyarrow as pa

    if isinstance(got, pa.Table):
        got = got.to_pandas()
    elif not isinstance(got, pd.DataFrame):
        got = got.to_pandas()  # ray Dataset
    rows_match = len(got) == len(oracle_df)
    schema_match = sorted(got.columns) == sorted(oracle_df.columns)
    hash_match = (
        rows_match
        and schema_match
        and _value_hash(got) == _value_hash(oracle_df)
    )
    return {
        "rows_match": rows_match,
        "schema_match": schema_match,
        "hash_match": hash_match,
        "engine_rows": len(got),
        "oracle_rows": len(oracle_df),
    }


def spot_sf01(names: list[str]) -> dict:
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    out = {}
    qs, oracles = entry.queries(), entry.oracle_sql()
    for name in names:
        t0 = time.time()
        got = qs[name](SF_DIR)
        oracle_df = con.execute(oracles[name]).fetch_df()
        out[name] = dict(_compare(name, got, oracle_df),
                         sf=SF_DIR, sec=round(time.time() - t0, 1))
        print(name, out[name], flush=True)
    return out


def spot_flagship_13m() -> dict:
    """~13M-event flagship vs the DuckDB LWW oracle over its own decoded
    change relation (the exact oracle_sql()['cdc_replay_repos'] shape)."""
    from go_mysql_transfer_ray.pipelines import cdc
    from go_mysql_transfer_ray.sources.binlog import (
        BinlogConfig,
        materialize_events,
        read_meta,
    )

    cfg = BinlogConfig(
        num_keys=1_600_000,
        avg_events_per_key=8.0,
        delete_pct=12,
        hot_repos=1,
        hot_multiplier=8,
        bad_arity_permille=5,
        content_bytes=64,
    )
    t0 = time.time()
    events_dir = materialize_events(cfg, root="/tmp/gmt_spot_events", shards=64)
    n_events = read_meta(events_dir)["num_change_events"]
    changes = "/tmp/gmt_spot_changes"
    cdc.write_decoded_changes(events_dir, changes)
    out = "/tmp/gmt_spot_lake"
    shutil.rmtree(out, ignore_errors=True)
    t1 = time.time()
    cdc.replay(events_dir, out, num_partitions=128)
    replay_sec = time.time() - t1
    lake = cdc.lake_table(out)

    con = duckdb.connect()
    oracle_df = con.execute(
        f"""
        WITH ch AS (
            SELECT * FROM read_parquet('{changes}/*.parquet')
        ),
        ranked AS (
            SELECT repo, path, "commit", lang, content, stars, op,
                   row_number() OVER (
                       PARTITION BY "key"
                       ORDER BY gtid DESC, seq_in_txn DESC
                   ) AS rn
            FROM ch
        )
        SELECT repo, path, "commit", lang, content, stars
        FROM ranked WHERE rn = 1 AND op <> 'delete'
        """
    ).fetch_df()
    res = _compare("flagship_13m", lake, oracle_df)
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(changes, ignore_errors=True)
    res.update(
        events=n_events,
        replay_sec=round(replay_sec, 2),
        events_per_sec=round(n_events / replay_sec, 1),
        total_sec=round(time.time() - t0, 1),
    )
    print("flagship_13m", res, flush=True)
    return res


def main():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        results = {
            "sf0.1": spot_sf01(["cdc_replay_repos", "minhash_dedup", "sessionize"]),
            "flagship_13m": spot_flagship_13m(),
        }
    finally:
        ray.shutdown()
    path = os.path.join(REPO, "SPOTCHECK_r05.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
