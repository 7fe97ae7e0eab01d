"""Generator invariants: determinism, valid per-key chains, DDL placement."""

import numpy as np
import pyarrow.compute as pc

from go_mysql_transfer_ray.sources.binlog import BinlogConfig, generate


def test_deterministic():
    cfg = BinlogConfig(num_keys=200, avg_events_per_key=3.0)
    a = generate(cfg).table
    b = generate(cfg).table
    assert a.equals(b)


def test_chain_validity():
    cfg = BinlogConfig(num_keys=300, avg_events_per_key=5.0, delete_pct=30)
    t = generate(cfg).table
    rows = t.select(["gtid", "seq_in_txn", "op", "before", "after"]).to_pylist()
    rows.sort(key=lambda r: (r["gtid"], r["seq_in_txn"]))
    alive: dict[str, str] = {}
    n_del = n_upd = n_reins = 0
    for r in rows:
        if r["op"] == "ddl":
            continue
        img = r["after"] if r["op"] != "delete" else r["before"]
        key = img["repo"] + "\x00" + img["path"]
        if r["op"] == "insert":
            if key in alive:
                n_reins += 1
                assert alive[key] == "deleted", "insert on a live key"
            alive[key] = "live"
        elif r["op"] == "update":
            assert alive.get(key) == "live", "update on a non-live key"
            # BEFORE image = previous AFTER image semantics: commit differs
            assert r["before"]["commit"] != r["after"]["commit"]
            n_upd += 1
        elif r["op"] == "delete":
            assert alive.get(key) == "live", "delete on a non-live key"
            alive[key] = "deleted"
            n_del += 1
    assert n_del > 0 and n_upd > 0


def test_ddl_splits_stream_and_stars_presence():
    cfg = BinlogConfig(num_keys=200, avg_events_per_key=4.0, ddl_at=0.5)
    s = generate(cfg)
    t = s.table
    ddl = t.filter(pc.equal(t.column("op"), "ddl"))
    assert ddl.num_rows == 1
    assert ddl.column("gtid")[0].as_py() == s.ddl_gtid
    ev = t.filter(pc.not_equal(t.column("op"), "ddl"))
    gtid = np.array(ev.column("gtid").to_pylist())
    cc = np.array(ev.column("col_count").to_pylist())
    stars = np.array(
        [(a or {}).get("stars") is not None for a in ev.column("after").to_pylist()]
    )
    pre = gtid < s.ddl_gtid
    post = gtid > s.ddl_gtid
    assert (cc[pre] == 5).all() and (cc[post] == 6).all()
    assert not stars[pre].any()
    is_del = np.array(ev.column("op").to_pylist()) == "delete"
    assert stars[post & ~is_del].all()
    # no change event shares the DDL's transaction
    assert not (gtid == s.ddl_gtid).any()


def test_hot_skew_knob():
    cfg = BinlogConfig(num_keys=500, avg_events_per_key=4.0, hot_repos=1,
                       hot_multiplier=20)
    t = generate(cfg).table
    ev = t.filter(pc.not_equal(t.column("op"), "ddl"))
    repos = [
        (r["after"] or r["before"])["repo"] for r in ev.select(["after", "before"]).to_pylist()
    ]
    import collections

    counts = collections.Counter(repos)
    top = counts.most_common(1)[0][1]
    assert top / len(repos) > 0.25, "hot repo should dominate the stream"


def test_bad_arity_injection():
    cfg = BinlogConfig(num_keys=300, avg_events_per_key=4.0, bad_arity_permille=50)
    s = generate(cfg)
    assert s.num_bad_arity > 0
