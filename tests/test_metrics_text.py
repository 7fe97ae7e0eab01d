"""Prometheus exposition rendering (T10 export surface)."""

import ray.data

from go_mysql_transfer_ray.functions.metrics_text import (
    counts_from_dataset,
    render_exposition,
)


def test_exposition_format_families():
    text = render_exposition(
        {
            ("repos", "insert"): 10,
            ("repos", "update"): 4,
            ("repos", "delete"): 1,
            ("other", "insert"): 2,
        },
        leader_state=1,
        destination_state=1,
        delay=3,
    )
    lines = text.splitlines()
    assert "# TYPE transfer_leader_state gauge" in lines
    assert "transfer_leader_state 1" in lines
    assert "transfer_delay 3" in lines
    assert "# TYPE transfer_inserted_num counter" in lines
    # labels sorted by table within each family
    ins = [l for l in lines if l.startswith("transfer_inserted_num{")]
    assert ins == [
        'transfer_inserted_num{table="other"} 2',
        'transfer_inserted_num{table="repos"} 10',
    ]
    assert 'transfer_updated_num{table="repos"} 4' in lines
    assert 'transfer_deleted_num{table="repos"} 1' in lines
    assert text.endswith("\n")


def test_label_escaping():
    text = render_exposition({('we"ird\\t', "insert"): 1})
    assert 'transfer_inserted_num{table="we\\"ird\\\\t"} 1' in text


def test_counts_from_dataset(ray_session):
    import pyarrow as pa

    t = pa.table(
        {
            "table": pa.array(["a", "a", "b", "a"]),
            "op": pa.array(["insert", "delete", "insert", "insert"]),
        }
    )
    counts = counts_from_dataset(ray.data.from_arrow(t))
    assert counts == {("a", "insert"): 2, ("a", "delete"): 1, ("b", "insert"): 1}
    text = render_exposition(counts)
    assert 'transfer_inserted_num{table="a"} 2' in text
