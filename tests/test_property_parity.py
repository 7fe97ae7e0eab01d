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
