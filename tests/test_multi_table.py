"""Multi-table, multi-rule single-pass replay (round-2 verdict item 1).

The reference's core operating mode: N per-table rules over ONE
interleaved binlog (/root/reference/service/transfer_service.go:206-276,
service/handler.go:83-86).  The oracle here is an independent row-at-a-
time Python replay of the raw event stream (no engine code in the
expected-value path)."""

import glob
import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from go_mysql_transfer_ray.pipelines import cdc
from go_mysql_transfer_ray.rules import RuleConfig
from go_mysql_transfer_ray.sources.binlog import (
    BinlogConfig,
    materialize_multi_events,
)

CFG = BinlogConfig(num_keys=400, avg_events_per_key=4.0, delete_pct=15,
                   bad_arity_permille=10)
UCFG = BinlogConfig(seed=9, num_keys=120, avg_events_per_key=3.0, delete_pct=12)

RULES = {
    # repos: projection including the DDL-added column + a rename
    "repos": RuleConfig(table="repos", include_columns="repo,path,lang,stars",
                        column_mappings="lang=language",
                        primary_keys=("repo", "path")),
    # users: different rule — rename + appended default constant
    "users": RuleConfig(table="users", include_columns="user_id,plan",
                        column_mappings="plan=tier",
                        default_column_values="src=cdc",
                        primary_keys=("user_id",)),
}


@pytest.fixture(scope="module")
def events_dir(ray_session):
    return materialize_multi_events(
        CFG, UCFG, root="/tmp/gmt_test_multi_events", shards=4
    )


def _python_oracle(events_dir):
    """Independent replay: raw events → per-table LWW final state.

    Replays rows one at a time in (gtid, seq_in_txn) order with the
    per-table arity guard, exactly like the reference's single-threaded
    handler — no engine code involved."""
    files = sorted(glob.glob(os.path.join(events_dir, "events-*.parquet")))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    rows = t.to_pylist()
    rows.sort(key=lambda r: (r["gtid"], r["seq_in_txn"]))
    widths = {"repos": 5, "users": 4}
    state = {"repos": {}, "users": {}}
    for r in rows:
        if r["op"] == "ddl":
            if r["table"] == "repos":
                widths["repos"] += 1
            continue
        tbl = r["table"]
        if r["col_count"] != widths[tbl]:
            continue  # arity guard drop
        img = r["before"] if r["op"] == "delete" else r["after"]
        if tbl == "repos":
            key = (img["repo"], img["path"])
        else:
            key = (img["user_id"],)
        if r["op"] == "delete":
            state[tbl].pop(key, None)
        else:
            state[tbl][key] = img
    return state


def _coerce_stars(v):
    if v is None or not v.lstrip("-").isdigit():
        return None
    return int(v)


def test_two_tables_different_rules_one_ddl(ray_session, events_dir, tmp_path):
    out = str(tmp_path / "lake")
    m = cdc.replay_multi(events_dir, out, rules=RULES, num_partitions=8)
    assert m["tables"] == ["repos", "users"]
    assert m["rows_by_table"]["repos"] > 0 and m["rows_by_table"]["users"] > 0

    oracle = _python_oracle(events_dir)

    repos = cdc.lake_table(os.path.join(out, "repos"))
    assert repos.column_names == ["repo", "path", "language", "stars"]
    got = {
        (r["repo"], r["path"]): (r["language"], r["stars"])
        for r in repos.to_pylist()
    }
    want = {
        k: (img["lang"], _coerce_stars(img.get("stars")))
        for k, img in oracle["repos"].items()
    }
    assert got == want

    users = cdc.lake_table(os.path.join(out, "users"))
    assert users.column_names == ["user_id", "tier", "src"]
    gotu = {r["user_id"]: (r["tier"], r["src"]) for r in users.to_pylist()}
    wantu = {k[0]: (img["plan"], "cdc") for k, img in oracle["users"].items()}
    assert gotu == wantu


def test_multi_identity_rules_default(ray_session, events_dir, tmp_path):
    """rules=None → identity projection per table (decoded base + DDL
    columns), same LWW state."""
    out = str(tmp_path / "lake")
    cdc.replay_multi(events_dir, out, num_partitions=8)
    oracle = _python_oracle(events_dir)
    repos = cdc.lake_table(os.path.join(out, "repos"))
    assert repos.column_names == ["repo", "path", "commit", "lang", "content", "stars"]
    assert repos.num_rows == len(oracle["repos"])
    users = cdc.lake_table(os.path.join(out, "users"))
    assert users.column_names == ["user_id", "name", "email", "plan"]
    got = {r["user_id"]: r["email"] for r in users.to_pylist()}
    want = {k[0]: img["email"] for k, img in oracle["users"].items()}
    assert got == want


def test_multi_resume_fences_everything(ray_session, events_dir, tmp_path):
    out = str(tmp_path / "lake")
    cdc.replay_multi(events_dir, out, rules=RULES, num_partitions=8)
    m2 = cdc.replay_multi(events_dir, out, rules=RULES, num_partitions=8)
    assert m2["resumed"] is True and m2["parts_written"] == 0
    assert m2["parts_skipped"] == 8


def test_multi_partial_crash_recomputes_one_partition(
    ray_session, events_dir, tmp_path
):
    out = str(tmp_path / "lake")
    cdc.replay_multi(events_dir, out, rules=RULES, num_partitions=8)
    before = {
        t: cdc.lake_table(os.path.join(out, t)) for t in ("repos", "users")
    }
    # simulate a lost partition: drop the run-level marker + both tables'
    # slices of partition 3
    os.unlink(os.path.join(out, "_manifests", "part-00003.json"))
    for t in ("repos", "users"):
        shutil.rmtree(os.path.join(out, t, "part=00003"), ignore_errors=True)
        try:
            os.unlink(os.path.join(out, t, "_manifests", "part-00003.json"))
        except OSError:
            pass
    m = cdc.replay_multi(events_dir, out, rules=RULES, num_partitions=8)
    assert m["parts_skipped"] == 7 and m["parts_written"] == 1
    after = {
        t: cdc.lake_table(os.path.join(out, t)) for t in ("repos", "users")
    }
    for t in ("repos", "users"):
        a = before[t].sort_by([(c, "ascending") for c in before[t].column_names])
        b = after[t].sort_by([(c, "ascending") for c in after[t].column_names])
        assert a.equals(b)


def test_rules_for_unknown_table_rejected(ray_session, events_dir, tmp_path):
    with pytest.raises(ValueError):
        cdc.replay_multi(
            str(events_dir), str(tmp_path / "x"),
            rules={"nosuch": RuleConfig(table="nosuch")},
        )


def test_plan_change_refences(ray_session, events_dir, tmp_path):
    """A different rule set must NOT be fenced by the old plan's markers."""
    out = str(tmp_path / "lake")
    cdc.replay_multi(events_dir, out, rules=RULES, num_partitions=8)
    other = dict(RULES)
    other["users"] = RuleConfig(table="users", include_columns="user_id,email",
                                primary_keys=("user_id",))
    m = cdc.replay_multi(events_dir, out, rules=other, num_partitions=8)
    assert m["parts_skipped"] == 0
    users = cdc.lake_table(os.path.join(out, "users"))
    assert users.column_names == ["user_id", "email"]
