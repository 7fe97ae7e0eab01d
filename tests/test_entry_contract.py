"""Local replica of the driver's verify: run every queries() entry at
sf0.001 and compare against oracle_sql() via DuckDB — row count, column
names, and an order-insensitive value hash."""

import hashlib
import importlib
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")
entrymod = importlib.import_module("__ray_entry__")

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        df.astype(object).where(pd.notna(df), None).itertuples(index=False, name=None),
        key=repr,
    )
    return hashlib.sha256(repr(rows).encode()).hexdigest()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def test_every_oracle_key_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, con):
    ray_df = to_pandas(QUERIES[name](SF))
    sql_df = con.execute(ORACLES[name]).fetchdf()
    assert sorted(ray_df.columns) == sorted(sql_df.columns), (
        f"{name}: columns {sorted(ray_df.columns)} vs {sorted(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: {len(ray_df)} vs {len(sql_df)} rows"
    h1, h2 = value_hash(ray_df), value_hash(sql_df)
    if h1 != h2:
        merged = ray_df.sort_values(list(sorted(ray_df.columns))).reset_index(drop=True)
        merged2 = sql_df.sort_values(list(sorted(sql_df.columns))).reset_index(drop=True)
        diff = (merged[sorted(merged.columns)] != merged2[sorted(merged2.columns)]).any(axis=1)
        raise AssertionError(
            f"{name}: value hash mismatch; first diffs:\n"
            f"ray:\n{merged[diff].head(3)}\nsql:\n{merged2[diff].head(3)}"
        )


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES) - {"cdc_replay_repos"})
)
def test_rows_only_queries_run(name):
    df = to_pandas(QUERIES[name](SF))
    assert len(df) > 0, f"{name} returned no rows"


def test_entry_smoke():
    res = entrymod.entry()
    df = to_pandas(res)
    assert len(df) > 0
    assert set(["repo", "path", "commit", "lang", "content"]) <= set(df.columns)
