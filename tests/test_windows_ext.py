"""Hopping windows, sessionization, redaction, stratified sampling, ES6
bulk ops — unit-level goldens (the driver oracles check them at scale)."""

import numpy as np
import pyarrow as pa
import ray.data

from go_mysql_transfer_ray.pipelines import datapipe
from go_mysql_transfer_ray.pipelines.windows import hopping_aggregate, sessionize


def _events(rows):
    """rows: (user_id, epoch_s, value)."""
    return ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    np.array([r[1] for r in rows], dtype="datetime64[s]").astype(
                        "datetime64[us]"
                    )
                ),
                "value": pa.array([float(r[2]) for r in rows], pa.float64()),
                "event_type": pa.array(["e"] * len(rows), pa.string()),
            }
        )
    )


DAY = 86_400
T0 = 1_700_000_000 - (1_700_000_000 % DAY)  # day-aligned base


def test_sessionize_gap_splits(ray_session):
    rows = [
        (1, T0, 1), (1, T0 + 100, 1), (1, T0 + 5000, 1),   # gap > 3600 → new session
        (2, T0, 1),
    ]
    out = sessionize(
        _events(rows), key_col="user_id", ts_col="ts", gap_seconds=3600
    ).to_pandas().sort_values(["user_id", "session_seq"]).reset_index(drop=True)
    got = out[["user_id", "session_seq", "n_events", "start_ts", "end_ts"]].values.tolist()
    assert got == [
        [1, 0, 2, T0, T0 + 100],
        [1, 1, 1, T0 + 5000, T0 + 5000],
        [2, 0, 1, T0, T0],
    ]


def test_sessionize_boundary_inclusive(ray_session):
    # exactly gap_seconds apart → SAME session (strict > splits)
    rows = [(1, T0, 1), (1, T0 + 3600, 1), (1, T0 + 3600 + 3601, 1)]
    out = sessionize(
        _events(rows), key_col="user_id", ts_col="ts", gap_seconds=3600
    ).to_pandas().sort_values("session_seq")
    assert out["n_events"].tolist() == [2, 1]


def test_hopping_counts_each_event_in_two_windows(ray_session):
    rows = [(1, T0 + 10, 2.0), (1, T0 + DAY + 10, 3.0)]
    out = hopping_aggregate(
        _events(rows), ts_col="ts", key_col="event_type", value_col="value",
        window_days=2, hop_days=1,
    ).to_pandas()
    # event on day D lands in windows starting D and D-1
    per_window = {
        int(ts.timestamp()): v
        for ts, v in zip(out["window_start"], out["sum_cents"])
    }
    assert per_window[T0 - DAY] == 200          # only first event
    assert per_window[T0] == 500                # both
    assert per_window[T0 + DAY] == 300          # only second
    assert out["n"].sum() == 4                  # 2 events × 2 windows


def test_redact_text_patterns(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(
                    [
                        "mail me at a.b+x@example.co.uk or call 415-555-0123 now",
                        "no pii here",
                    ]
                ),
            }
        )
    )
    out = datapipe.redact_text(ds).to_pandas().sort_values("doc_id")
    assert out["text"].tolist() == [
        "mail me at <EMAIL> or call <PHONE> now",
        "no pii here",
    ]


def test_stratified_sample_deterministic_rates(ray_session):
    n = 2000
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "lang": pa.array(["en" if i % 2 else "de" for i in range(n)]),
            }
        )
    )
    out1 = datapipe.stratified_sample(
        ds, rates_permille={"en": 500, "de": 100}
    ).to_pandas()
    out2 = datapipe.stratified_sample(
        ds, rates_permille={"en": 500, "de": 100}
    ).to_pandas()
    assert sorted(out1["doc_id"]) == sorted(out2["doc_id"])  # deterministic
    frac_en = (out1["lang"] == "en").sum() / (n / 2)
    frac_de = (out1["lang"] == "de").sum() / (n / 2)
    assert 0.4 < frac_en < 0.6
    assert 0.05 < frac_de < 0.16


def test_es6_bulk_ops_type_on_every_op(ray_session):
    from go_mysql_transfer_ray.functions.coerce import ColumnSpec
    from go_mysql_transfer_ray.functions.es_mapping import es6_bulk_ops
    from go_mysql_transfer_ray.rules import RuleConfig, RulePlan

    plan = RulePlan(
        RuleConfig(include_columns="id,name", value_encoder="json",
                   primary_keys=("id",)),
        [ColumnSpec("id", "number"), ColumnSpec("name", "string")],
    )
    batch = pa.table({"id": pa.array([1, 2], pa.int64()),
                      "name": pa.array(["a", "b"])})
    out = es6_bulk_ops(plan, batch, table_name="t")
    assert out.column("es_type").to_pylist() == ["_doc", "_doc"]
    assert out.column("es_index").to_pylist() == ["t", "t"]
    assert out.column("id").to_pylist() == ["1", "2"]  # stringified PK
    assert out.column("body").to_pylist()[0] == '{"id":1,"name":"a"}'
    # explicit es_type overrides the default
    out2 = es6_bulk_ops(plan, batch, table_name="t", es_type="doc2")
    assert out2.column("es_type").to_pylist() == ["doc2", "doc2"]
