"""The reference's documented Lua rule-script examples, run end-to-end.

go-mysql-transfer's primary extension surface is a per-rule Lua script
(README.md:34, /root/reference/global/rule.go:621-694) executed against
the redisOps/scriptOps module API (/root/reference/service/luaengine/
redis_actuator.go:38-57: rawRow/rawOldRow/rawAction + SET/DEL/HSET/...).
Its canonical documented example (the user-table → Redis script shown in
the project's docs) reads the row, builds a result table, json-encodes
it and SETs a derived key — or DELs it on delete.  These tests run that
exact script shape VERBATIM (adapted only to this stream's column
names) through the full app.yml config surface (``config.run_app``),
then value-check the converged Redis state against an independent LWW
replay — the same oracle discipline as the ``lua_redis_rule`` query.

The second script exercises the Lua-5.1 features production scripts
commonly need beyond the happy path — varargs (``...``/``select``),
``string.gmatch``, ``string.byte``/``char``, ``string.match`` — which
gopher-lua provides natively (actuator.go:46-113 runs any 5.1 script)
and lua_mini now implements."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from go_mysql_transfer_ray.config import load_app, run_app
from go_mysql_transfer_ray.pipelines import cdc
from go_mysql_transfer_ray.rules import RuleConfig
from go_mysql_transfer_ray.sources.binlog import BinlogConfig, materialize_events

ROOT = "/tmp/gmt_test_ref_lua"


@pytest.fixture(scope="module")
def events(ray_session):
    return materialize_events(
        BinlogConfig(num_keys=120, avg_events_per_key=3.0, delete_pct=12, seed=19),
        root=os.path.join(ROOT, "events"),
        shards=2,
    )


@pytest.fixture(scope="module")
def live_rows(events, ray_session):
    """Independent oracle: the LWW lake state (engine-equivalent of the
    docs' 'current row' at stream end)."""
    lake = os.path.join(ROOT, "lake")
    shutil.rmtree(lake, ignore_errors=True)
    cdc.replay(events, lake, num_partitions=8,
               rule_config=RuleConfig())
    return {(r["repo"], r["path"]): r for r in cdc.lake_table(lake).to_pylist()}


# The reference docs' canonical Redis example, verbatim in structure:
# load module → rawRow/rawAction → derived key → DEL on delete, else
# build a result table, json.encode, SET.  (Column names adapted from
# the docs' T_USER example to this stream's repos table.)
_DOCS_REDIS_EXAMPLE = """
local ops = require("redisOps") -- load the redis operation module

local row = ops.rawRow()  -- current DB row, table keyed by column name
local action = ops.rawAction()  -- current DB event: insert/update/delete

local repo = row["repo"]
local path = row["path"]
local key = "repo_" .. repo .. "/" .. path -- derive the key

if action == "delete" -- delete event
then
    ops.DEL(key) -- delete the KEY
else
    local commit = row["commit"]
    local lang = row["lang"]
    local result = {} -- result table
    result["repo"] = repo
    result["path"] = path
    result["commit"] = commit
    result["lang"] = lang
    result["source"] = "binlog" -- data origin
    local val = json.encode(result) -- encode result as json
    ops.SET(key, val) -- redis SET: key, value
end
"""


def test_docs_redis_example_script_through_config(events, live_rows):
    out = os.path.join(ROOT, "redis_docs")
    shutil.rmtree(out, ignore_errors=True)
    app = load_app(
        "target: redis\n"
        "rule:\n"
        "  -\n"
        "    table: repos\n"
        "    lua_script: |\n"
        + "".join(f"      {line}\n" for line in _DOCS_REDIS_EXAMPLE.strip().splitlines())
    )
    res = run_app(app, events, out, num_partitions=8)
    t = pq.read_table(res["tables"]["repos"]["path"])
    state = {
        k: json.loads(v)
        for k, v in zip(
            t.column("redis_key").to_pylist(), t.column("value").to_pylist()
        )
    }
    # one surviving SET per live key, none for deleted keys
    assert len(state) == len(live_rows) > 0
    for (repo, path), row in live_rows.items():
        got = state[f"repo_{repo}/{path}"]
        assert got == {
            "repo": repo,
            "path": path,
            "commit": row["commit"],
            "lang": row["lang"],
            "source": "binlog",
        }


# A production-shaped script using the 5.1 features beyond the happy
# path: gmatch tokenization, varargs + select, byte/char, match.
_ADVANCED_SCRIPT = """
local ops = require("redisOps")
local row = ops.rawRow()
local action = ops.rawAction()

local function join(sep, ...)
    local parts = {}
    for i = 1, select("#", ...) do
        table.insert(parts, (select(i, ...)))
    end
    return table.concat(parts, sep)
end

local repo = row["repo"]
local path = row["path"]
local key = "adv_" .. repo .. "/" .. path

if action == "delete" then
    ops.DEL(key)
else
    local segs = {}
    for seg in string.gmatch(path, "[^/]+") do
        table.insert(segs, seg)
    end
    local base = segs[#segs]
    local ext = string.match(base, "%.(%w+)$") or "none"
    local marker = string.char(string.byte(repo, 1) + 1)
    ops.SET(key, join("|", base, ext, marker, tostring(#segs)))
end
"""


def test_advanced_lua51_features_through_config(events, live_rows):
    out = os.path.join(ROOT, "redis_adv")
    shutil.rmtree(out, ignore_errors=True)
    app = load_app(
        "target: redis\n"
        "rule:\n"
        "  -\n"
        "    table: repos\n"
        "    lua_script: |\n"
        + "".join(f"      {line}\n" for line in _ADVANCED_SCRIPT.strip().splitlines())
    )
    res = run_app(app, events, out, num_partitions=8)
    t = pq.read_table(res["tables"]["repos"]["path"])
    state = dict(
        zip(t.column("redis_key").to_pylist(), t.column("value").to_pylist())
    )
    assert len(state) == len(live_rows) > 0
    for (repo, path), _row in live_rows.items():
        segs = [s for s in path.split("/") if s]
        base = segs[-1]
        ext = base.rsplit(".", 1)[1] if "." in base else "none"
        marker = chr(ord(repo[0]) + 1)
        # Lua numbers print via %.14g → integral floats drop ".0"
        expect = "|".join([base, ext, marker, str(len(segs))])
        got = state[f"adv_{repo}/{path}"]
        assert got == expect, (repo, path, got, expect)
