"""Property-based engine-vs-oracle parity (hypothesis).

The reference had no property testing (SURVEY §5); here random stream
shapes — key counts, chain lengths, delete rates, skew, DDL position,
bad-arity noise — must all replay to the oracle's exact state.  Examples
are bounded (each case runs a full Ray pipeline)."""

import shutil

from hypothesis import HealthCheck, given, settings, strategies as st

from go_mysql_transfer_ray import oracle
from go_mysql_transfer_ray.pipelines import cdc
from go_mysql_transfer_ray.sources.binlog import BinlogConfig, generate, materialize_events

from .util import assert_state_equal


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    num_keys=st.integers(min_value=5, max_value=400),
    avg=st.floats(min_value=1.0, max_value=8.0),
    delete_pct=st.integers(min_value=0, max_value=60),
    hot_mult=st.integers(min_value=1, max_value=25),
    ddl_at=st.floats(min_value=0.05, max_value=0.95),
    bad=st.integers(min_value=0, max_value=100),
    seed=st.integers(min_value=1, max_value=10_000),
)
def test_random_streams_match_oracle(
    ray_session, tmp_path_factory, num_keys, avg, delete_pct, hot_mult, ddl_at, bad, seed
):
    cfg = BinlogConfig(
        seed=seed,
        num_keys=num_keys,
        avg_events_per_key=avg,
        delete_pct=delete_pct,
        hot_repos=1,
        hot_multiplier=hot_mult,
        ddl_at=ddl_at,
        bad_arity_permille=bad,
    )
    base = tmp_path_factory.mktemp("prop")
    events_dir = materialize_events(cfg, root=str(base / "events"), shards=3)
    out = str(base / "lake")
    shutil.rmtree(out, ignore_errors=True)
    cdc.replay(events_dir, out, num_partitions=8)
    engine = cdc.lake_table(out)
    ora = oracle.replay_full(generate(cfg).table)
    assert_state_equal(engine, ora)


# ---------------------------------------------------------------------------
# field-wise $set merge with upsert liveness vs a sequential dict fold


def _mongo_reference_fold(rows):
    """Sequential reference of the Mongo semantics: insert=replace,
    update=$set-if-alive, upsert=$set-or-create, delete=remove
    (mongo.go:125-216 + SetUpsert path mongo.go:141-149)."""
    state = {}
    for _gtid, op, key, a, b in rows:
        doc = state.get(key)
        fields = {k: v for k, v in (("a", a), ("b", b)) if v is not None}
        if op == "insert":
            state[key] = dict(fields)
        elif op == "update":
            if doc is not None:
                doc.update(fields)
        elif op == "upsert":
            if doc is None:
                state[key] = dict(fields)
            else:
                doc.update(fields)
        elif op == "delete":
            state.pop(key, None)
    return {
        k: (d.get("a"), d.get("b")) for k, d in state.items()
    }


@settings(max_examples=40, deadline=None)
@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(["insert", "update", "upsert", "delete"]),
            st.integers(min_value=0, max_value=5),  # key id
            st.one_of(st.none(), st.text(alphabet="xyz", min_size=1, max_size=3)),
            st.one_of(st.none(), st.text(alphabet="pq", min_size=1, max_size=3)),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_fieldwise_upsert_fold_matches_sequential(ops):
    import pyarrow as pa

    from go_mysql_transfer_ray.stages.merge import fieldwise_final_merge

    rows = [
        (i, op, f"k{key}", a, b) for i, (op, key, a, b) in enumerate(ops)
    ]
    t = pa.table(
        {
            "key": pa.array([r[2] for r in rows], pa.string()),
            "gtid": pa.array([r[0] for r in rows], pa.int64()),
            "seq_in_txn": pa.array([0] * len(rows), pa.int32()),
            "op": pa.array([r[1] for r in rows], pa.string()),
            "a": pa.array([r[3] for r in rows], pa.string()),
            "b": pa.array([r[4] for r in rows], pa.string()),
        }
    )
    out = fieldwise_final_merge(t, final_columns=["key", "a", "b"], upsert=True)
    got = {
        k: (a, b)
        for k, a, b in zip(
            out.column("key").to_pylist(),
            out.column("a").to_pylist(),
            out.column("b").to_pylist(),
        )
    }
    want = _mongo_reference_fold(rows)
    assert got == want
