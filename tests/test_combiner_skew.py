"""Skew-proofing evidence (SURVEY §4 / north_rule): a hot key's shuffle
contribution is bounded by the combiner to one row per input block."""

import numpy as np
import pyarrow as pa

from go_mysql_transfer_ray.stages.merge import Combiner


def _batch(hot_rows: int, cold_keys: int) -> pa.Table:
    n = hot_rows + cold_keys
    keys = ["hot/repohot/path"] * hot_rows + [f"r{i}/p{i}" for i in range(cold_keys)]
    return pa.table(
        {
            "key": pa.array(keys, pa.string()),
            "gtid": pa.array(np.arange(n, dtype=np.int64)),
            "seq_in_txn": pa.array(np.zeros(n, dtype=np.int32)),
            "op": pa.array(["insert"] * n, pa.string()),
            "payload": pa.array([f"v{i}" for i in range(n)], pa.string()),
        }
    )


def test_hot_key_contributes_one_row_per_block():
    out = Combiner(16)(_batch(hot_rows=10_000, cold_keys=100))
    assert out.num_rows == 101  # 1 for the hot key + 100 cold
    hot = out.filter(pa.compute.equal(out.column("key"), "hot/repohot/path"))
    # the surviving hot row is the LAST event (max gtid) — LWW partial
    assert hot.column("gtid").to_pylist() == [9_999]


def test_combiner_partition_assignment_is_stable():
    out1 = Combiner(16)(_batch(10, 50))
    out2 = Combiner(16)(_batch(10, 50))
    assert out1.column("_part").to_pylist() == out2.column("_part").to_pylist()


def test_delta_writer_retry_overwrites(tmp_path):
    """A replayed batch (task retry) writes the SAME delta filenames —
    the exchange stays idempotent even for non-prereducible folds."""
    import glob
    import os

    from go_mysql_transfer_ray.stages import shuffle as shfl

    d = str(tmp_path / "shuf")
    shfl.prepare_shuffle_dir(d, 4, {"t": 1})
    batch = Combiner(4)(_batch(100, 20))
    w = shfl.DeltaWriter(d)
    w(batch)
    files1 = sorted(glob.glob(os.path.join(d, "part=*", "*.parquet")))
    w(batch)  # simulated retry: identical batch
    files2 = sorted(glob.glob(os.path.join(d, "part=*", "*.parquet")))
    assert files1 == files2 and files1

    other = Combiner(4)(_batch(101, 21))  # different content → new names
    w(other)
    files3 = sorted(glob.glob(os.path.join(d, "part=*", "*.parquet")))
    assert len(files3) > len(files2)


def test_delta_writer_no_collision_same_key_different_payload(tmp_path):
    """Regression: two batches that agree on the FIRST column (key) and
    _part layout but differ in a later column (gtid) must produce
    distinct delta filenames — a stem that fingerprints only the first
    column silently overwrote the earlier batch's rows."""
    import glob
    import os

    from go_mysql_transfer_ray.stages import shuffle as shfl

    d = str(tmp_path / "shuf")
    shfl.prepare_shuffle_dir(d, 4, {"t": 1})

    def mk(gtid_base: int) -> pa.Table:
        n = 50
        return pa.table(
            {
                "key": pa.array([f"k{i % 5}" for i in range(n)], pa.string()),
                "gtid": pa.array(np.arange(n, dtype=np.int64) + gtid_base),
                "seq_in_txn": pa.array(np.zeros(n, dtype=np.int32)),
                "op": pa.array(["insert"] * n, pa.string()),
                "payload": pa.array([f"v{i}" for i in range(n)], pa.string()),
                "_part": pa.array(np.arange(n, dtype=np.int32) % 4),
            }
        )

    w = shfl.DeltaWriter(d)
    w(mk(0))
    w(mk(1_000_000))  # same key/_part columns, different gtid column
    files = sorted(glob.glob(os.path.join(d, "part=*", "*.parquet")))
    total = sum(
        __import__("pyarrow.parquet", fromlist=["pq"]).read_table(f).num_rows
        for f in files
    )
    assert total == 100, f"expected both batches' rows on disk, got {total}"


def test_delta_writer_nested_column_fallback(tmp_path):
    """A list-typed column must not crash the stem (pandas raises
    ValueError, not TypeError, for object arrays of ndarrays — the
    nested-dtype fallback has to catch both) and must still produce
    retry-idempotent, content-distinct filenames."""
    import glob
    import os

    from go_mysql_transfer_ray.stages import shuffle as shfl

    d = str(tmp_path / "shuf")
    shfl.prepare_shuffle_dir(d, 4, {"t": 1})

    def mk(base: float) -> pa.Table:
        return pa.table(
            {
                "key": pa.array([f"k{i}" for i in range(20)], pa.string()),
                "vec": pa.array(
                    [[base + i, base - i] for i in range(20)],
                    pa.list_(pa.float32()),
                ),
                "_part": pa.array([i % 4 for i in range(20)], pa.int32()),
            }
        )

    w = shfl.DeltaWriter(d)
    w(mk(1.0))
    files1 = sorted(glob.glob(os.path.join(d, "part=*", "*.parquet")))
    assert files1
    w(mk(1.0))  # retry: same content → same names
    assert sorted(glob.glob(os.path.join(d, "part=*", "*.parquet"))) == files1
    w(mk(2.0))  # different vectors, same keys/_part → new names
    assert len(sorted(glob.glob(os.path.join(d, "part=*", "*.parquet")))) > len(files1)
