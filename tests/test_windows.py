"""Tumbling-window aggregate + as-of forward-fill join."""

import numpy as np
import pyarrow as pa
import ray.data

from go_mysql_transfer_ray.pipelines.windows import asof_forward_fill, tumbling_aggregate


def test_tumbling_aggregate_exact(ray_session):
    ts = pa.array(
        [1_700_000_000 + d * 86400 + h * 3600 for d in range(3) for h in (1, 5)],
        pa.timestamp("s"),
    )
    t = pa.table(
        {
            "ts": ts,
            "k": pa.array(["a", "b"] * 3),
            "v": pa.array([1.25, 2.50, 3.00, 4.75, 0.10, 0.01]),
        }
    )
    out = (
        tumbling_aggregate(
            ray.data.from_arrow(t), ts_col="ts", key_col="k", value_col="v"
        )
        .to_pandas()
        .sort_values(["window_start", "k"])
    )
    # base ts is 22:13 UTC: the +1h rows stay on day X, the +5h rows roll
    # into day X+1 — windows: a@d14, (a,b)@d15, (a,b)@d16, b@d17
    assert list(out["sum_cents"]) == [125, 300, 250, 10, 475, 1]
    assert list(out["n"]) == [1] * 6


def test_asof_forward_fill_semantics(ray_session):
    t = pa.table(
        {
            "key": pa.array(["u1"] * 4 + ["u2"] * 2),
            "ord": pa.array([1, 2, 3, 4, 1, 2], pa.int64()),
            "build": pa.array([False, True, False, True, False, False]),
            "v": pa.array([9.0, 10.0, 11.0, 12.0, 13.0, 14.0]),
        }
    )
    out = (
        asof_forward_fill(
            ray.data.from_arrow(t),
            key_col="key",
            order_col="ord",
            build_mask_col="build",
            value_col="v",
            num_partitions=2,
        )
        .to_pandas()
        .sort_values(["key", "ord"])
    )
    got = list(out["asof_value"])
    # u1: before any build → null; build@2 → 10; carries; build@4 → 12
    # u2: no build rows at all → null, null (no leak from u1!)
    assert got[0] is None or np.isnan(got[0])
    assert got[1] == 10.0 and got[2] == 10.0 and got[3] == 12.0
    assert all(x is None or np.isnan(x) for x in got[4:])
