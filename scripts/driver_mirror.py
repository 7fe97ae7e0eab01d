"""Mirror the driver's CORRECTNESS compare over ALL `queries()` entries.

The driver's per-round gate checks only the FIRST 50 queries at sf0.01;
this script runs the same compare (row count + sorted-column schema +
value hash vs the DuckDB oracles) over EVERY entry, at any scale —
the tool behind BASELINE.md's "65/65 at sf0.01 and sf0.1" records.

    python scripts/driver_mirror.py [sf_dir]      # default sf0.01

Owns its Ray session (a script, not library code).  Prints one JSON
object per query plus a TOTAL/FAILS line; exit code 1 on any failure.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb
import pandas as pd
import pyarrow as pa

import ray

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df: pd.DataFrame) -> str:
    """The driver's value hash: columns sorted by name, rows sorted by
    stringified content, None as \\N — stable across engines."""
    df = df[sorted(df.columns)]
    rows = df.astype(object).where(pd.notna(df), None).values.tolist()
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    h = hashlib.sha256()
    for r in rows:
        h.update(
            ("\x1f".join("\\N" if x is None else str(x) for x in r) + "\x1e").encode()
        )
    return h.hexdigest()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    ray.init(
        address="local", num_cpus=32, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, REPO)
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    qs, oracles = entry.queries(), entry.oracle_sql()
    out, fails = {}, []
    for i, (name, fn) in enumerate(qs.items(), 1):
        t0 = time.time()
        try:
            res = fn(sf)
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            if name in oracles:
                odf = con.execute(oracles[name]).df()
                rows = len(df) == len(odf)
                schema = sorted(df.columns) == sorted(odf.columns)
                hmatch = canon(df) == canon(odf)
                out[name] = {
                    "slot": i, "rows": rows, "schema": schema,
                    "hash": hmatch, "sec": round(time.time() - t0, 1),
                }
                if not (rows and schema and hmatch):
                    fails.append(name)
            else:
                out[name] = {
                    "slot": i, "rows": len(df) >= 0, "no_oracle": True,
                    "sec": round(time.time() - t0, 1),
                }
        except Exception as ex:  # noqa: BLE001 - report, don't abort the sweep
            out[name] = {"slot": i, "err": repr(ex)[:200]}
            fails.append(name)
    print(json.dumps(out, indent=1))
    print("TOTAL", len(out), "FAILS", fails)
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
