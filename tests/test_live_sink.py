"""Live sink loop: exact wire frames over real sockets with the
reference's failure semantics — consume error → pause → ping → resume
from the saved position (handler.go:173-181, transfer_service.go:328-354).

The decisive property: killing the sink mid-stream and healing it later
must converge the sink to a state BYTE-IDENTICAL to an uninterrupted
run's (at-least-once redelivery + idempotent per-key commands)."""

import threading

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from go_mysql_transfer_ray.functions.loopback import (
    LoopbackHttpBulkServer,
    LoopbackRespServer,
    SinkError,
)
from go_mysql_transfer_ray.functions.wire import es_bulk_ndjson, redis_resp_stream
from go_mysql_transfer_ray.pipelines.live_sink import (
    FilePositionStore,
    HttpBulkEndpoint,
    LiveSinkLoop,
    RespEndpoint,
    frame_stream,
)
from go_mysql_transfer_ray.stages.redis_state import RedisConfig, RedisPlan


def _change_table(n=400, seed=7) -> pa.Table:
    """Deterministic change stream: per-key inserts/updates/deletes in
    gtid order (op of the LAST row per key decides survival)."""
    gtid, op, uid, val = [], [], [], []
    for i in range(n):
        k = (i * 13 + seed) % 60
        gtid.append(i + 1)
        uid.append(k)
        if i % 11 == 3:
            op.append("delete")
            val.append("")
        elif i % 3 == 1:
            op.append("update")
            val.append(f"v{i}")
        else:
            op.append("insert")
            val.append(f"v{i}")
    return pa.table(
        {
            "gtid": pa.array(gtid, pa.int64()),
            "seq_in_txn": pa.array([0] * n, pa.int32()),
            "op": pa.array(op, pa.string()),
            "user_id": pa.array(uid, pa.int64()),
            "value": pa.array(val, pa.string()),
        }
    )


def _expected_string_state(tab: pa.Table) -> dict:
    """Fold SET/DEL in gtid order (rows are already gtid-sorted)."""
    state = {}
    for r in tab.to_pylist():
        key = f"u:{r['user_id']}"
        if r["op"] == "delete":
            state.pop(key, None)
        else:
            state[key] = r["value"]
    return state


_PLAN = RedisPlan(
    RedisConfig(structure="string", key_prefix="u:", key_column="user_id"),
    pk_columns=("user_id",),
)


def _resp_frames(tab: pa.Table) -> pa.Table:
    return redis_resp_stream(_PLAN, tab, value_col="value")


def _resp_dataset_fn(tab: pa.Table):
    def fn(from_gtid: int):
        filtered = tab.filter(pc.greater(tab.column("gtid"), from_gtid))
        return ray.data.from_arrow(filtered).map_batches(
            _resp_frames, batch_format="pyarrow"
        )

    return fn


def _snapshot_strings(server) -> dict:
    return {k: v for k, (typ, v) in server.snapshot().items() if typ == "string"}


def test_resp_live_delivery_happy_path(tmp_path):
    tab = _change_table()
    server = LoopbackRespServer().start()
    try:
        loop = LiveSinkLoop(
            RespEndpoint(server.address),
            FilePositionStore(str(tmp_path / "pos.json")),
            pos_save_every=3,
        )
        metrics = loop.run(
            frame_stream(_resp_dataset_fn(tab), frame_col="resp", batch_size=64)
        )
        assert _snapshot_strings(server) == _expected_string_state(tab)
        assert metrics["position"] == 400
        assert metrics["frames_delivered"] == 400
        assert metrics["consume_errors"] == 0
        # final position persisted → a fresh loop replays nothing
        metrics2 = LiveSinkLoop(
            RespEndpoint(server.address),
            FilePositionStore(str(tmp_path / "pos.json")),
        ).run(frame_stream(_resp_dataset_fn(tab), frame_col="resp"))
        assert metrics2["frames_delivered"] == 0
    finally:
        server.stop()


def test_resp_kill_mid_stream_converges_identically(tmp_path):
    tab = _change_table()
    # oracle: an uninterrupted run against a pristine server
    oracle = LoopbackRespServer().start()
    try:
        LiveSinkLoop(
            RespEndpoint(oracle.address),
            FilePositionStore(str(tmp_path / "oracle.json")),
        ).run(frame_stream(_resp_dataset_fn(tab), frame_col="resp", batch_size=32))
        oracle_state = _snapshot_strings(oracle)
    finally:
        oracle.stop()

    server = LoopbackRespServer().start()
    try:
        # 32-frame batches are 33 commands each (PING barrier); dying at
        # command 170 lands mid-batch-6 with batch 5 acknowledged but
        # NOT yet saved (pos_save_every=2 → last save after batch 4), so
        # recovery must redeliver batch 5 — real at-least-once overlap
        server.fail_after(170)
        healed = threading.Event()

        def sleep_then_heal(dt):
            # the ping loop's sleep: let two pings fail, then heal
            if not healed.is_set() and loop.metrics["pings_failed"] >= 2:
                server.heal()
                healed.set()

        loop = LiveSinkLoop(
            RespEndpoint(server.address),
            FilePositionStore(str(tmp_path / "pos.json")),
            pos_save_every=2,
            ping_interval=0.0,
            sleep=sleep_then_heal,
        )
        metrics = loop.run(
            frame_stream(_resp_dataset_fn(tab), frame_col="resp", batch_size=32)
        )
        # pause/ping/resume actually happened
        assert metrics["consume_errors"] >= 1
        assert metrics["pings_failed"] >= 2
        assert metrics["reconnects"] >= 1
        # at-least-once: the unacknowledged tail was redelivered
        assert metrics["frames_delivered"] > 400
        assert metrics["position"] == 400
        # and the converged state is identical to the uninterrupted run
        assert _snapshot_strings(server) == oracle_state == _expected_string_state(tab)
    finally:
        server.stop()


def test_resp_resume_from_checkpoint_across_processes(tmp_path):
    """A crash between runs (new LiveSinkLoop over the same position
    file) resumes where the last save left off — no loss."""
    tab = _change_table()
    server = LoopbackRespServer().start()
    try:
        store = FilePositionStore(str(tmp_path / "pos.json"))
        # first driver dies after the sink fails and never heals in time
        server.fail_after(100)
        loop1 = LiveSinkLoop(
            RespEndpoint(server.address), store,
            pos_save_every=2, ping_interval=0.0, max_pings=3,
            sleep=lambda dt: None,
        )
        with pytest.raises(SinkError):
            loop1.run(
                frame_stream(_resp_dataset_fn(tab), frame_col="resp", batch_size=32)
            )
        saved = store.load()
        assert 0 < saved < 400  # some progress was checkpointed
        # takeover driver: sink healed, fresh loop resumes from the file
        server.heal()
        metrics = LiveSinkLoop(RespEndpoint(server.address), store).run(
            frame_stream(_resp_dataset_fn(tab), frame_col="resp", batch_size=32)
        )
        assert metrics["position"] == 400
        # only the unacknowledged tail was replayed
        assert metrics["frames_delivered"] == 400 - saved
        assert _snapshot_strings(server) == _expected_string_state(tab)
    finally:
        server.stop()


def test_resp_error_reply_fails_the_batch():
    """-WRONGTYPE / -ERR anywhere in the pipeline fails the whole batch
    (redis.go:269-275: one Exec error per pipeline)."""
    server = LoopbackRespServer().start()
    try:
        ep = RespEndpoint(server.address)
        ep.connect()
        ep.consume([b"*3\r\n$4\r\nHSET\r\n$1\r\nk\r\n$1\r\nf\r\n"])  # malformed arity
    except Exception:
        pass
    finally:
        server.stop()
    server = LoopbackRespServer().start()
    try:
        ep = RespEndpoint(server.address)
        ep.connect()
        ep.consume([b"*3\r\n$3\r\nSET\r\n$1\r\nk\r\n$1\r\nv\r\n"])
        with pytest.raises(SinkError):
            # k holds a string; HSET against it is a WRONGTYPE error
            ep.consume(
                [b"*4\r\n$4\r\nHSET\r\n$1\r\nk\r\n$1\r\nf\r\n$1\r\nv\r\n"]
            )
        ep.close()
    finally:
        server.stop()


def _es_ops(tab: pa.Table) -> pa.Table:
    ids = pc.cast(tab.column("user_id"), pa.string())
    body = pc.binary_join_element_wise(
        '{"user_id":', ids, ',"value":"', tab.column("value"), '"}', ""
    )
    return pa.table(
        {
            "gtid": tab.column("gtid"),
            "es_index": pa.array(["events"] * tab.num_rows, pa.string()),
            "es_type": pa.array(["_doc"] * tab.num_rows, pa.string()),
            "id": ids,
            "action": tab.column("op"),
            "body": body,
        }
    )


def _es_frames(tab: pa.Table) -> pa.Table:
    ops = _es_ops(tab)
    nd = es_bulk_ndjson(ops, include_type=False)
    return pa.table(
        {"gtid": ops.column("gtid"), "ndjson": nd.column("ndjson")}
    )


def _es_dataset_fn(tab: pa.Table):
    def fn(from_gtid: int):
        filtered = tab.filter(pc.greater(tab.column("gtid"), from_gtid))
        return ray.data.from_arrow(filtered).map_batches(
            _es_frames, batch_format="pyarrow"
        )

    return fn


def _expected_docs(tab: pa.Table) -> dict:
    docs = {}
    for r in tab.to_pylist():
        doc_id = str(r["user_id"])
        if r["op"] == "delete":
            docs.pop(doc_id, None)
        else:
            docs[doc_id] = {"user_id": r["user_id"], "value": r["value"]}
    return docs


def test_http_bulk_live_delivery_and_recovery(tmp_path):
    tab = _change_table(n=300, seed=11)
    server = LoopbackHttpBulkServer().start()
    try:
        # HTTP faults tick per REQUEST (connect-ping is request 1, then
        # one POST per batch): dying at request 5 = mid-stream, after
        # three acknowledged 32-frame batches with only two saved
        server.fail_after(5)
        healed = threading.Event()

        def sleep_then_heal(dt):
            if not healed.is_set() and loop.metrics["pings_failed"] >= 1:
                server.heal()
                healed.set()

        loop = LiveSinkLoop(
            HttpBulkEndpoint(server.address),
            FilePositionStore(str(tmp_path / "pos.json")),
            pos_save_every=2,
            ping_interval=0.0,
            sleep=sleep_then_heal,
        )
        metrics = loop.run(
            frame_stream(_es_dataset_fn(tab), frame_col="ndjson", batch_size=32)
        )
        assert metrics["consume_errors"] >= 1
        assert metrics["reconnects"] >= 1
        assert metrics["position"] == 300
        assert server.snapshot() == _expected_docs(tab)
    finally:
        server.stop()


class _RecordingEndpoint:
    """In-memory endpoint: frames are ``key=value`` strings; fails the
    Nth consume once, pings OK, so recovery is immediate."""

    def __init__(self, fail_on_consume: int = 0):
        self.fail_on = fail_on_consume
        self.consumes = 0
        self.state: dict = {}
        self.deliveries: list = []

    def connect(self):
        pass

    def close(self):
        pass

    def ping(self):
        pass

    def consume(self, frames):
        self.consumes += 1
        if self.consumes == self.fail_on:
            raise SinkError("injected consume failure")
        for f in frames:
            k, _, v = f.decode("utf-8").partition("=")
            self.state[k] = v
            self.deliveries.append(k)


def _txn_table() -> pa.Table:
    """Three transactions; the middle one has three rows, so a 2-row
    Arrow batch boundary lands MID-transaction."""
    return pa.table(
        {
            "gtid": pa.array([1, 2, 2, 2, 3], pa.int64()),
            "seq_in_txn": pa.array([0, 0, 1, 2, 0], pa.int32()),
            "frame": pa.array(
                ["r1=a", "t2a=b", "t2b=c", "t2c=d", "r3=e"], pa.string()
            ),
        }
    )


def _txn_dataset_fn(tab: pa.Table):
    def fn(from_gtid: int):
        return ray.data.from_arrow(
            tab.filter(pc.greater(tab.column("gtid"), from_gtid))
        )

    return fn


def test_txn_spanning_batch_checkpoint_no_loss(tmp_path):
    """A transaction (gtid) spilling past an Arrow batch boundary must
    never be checkpointed half-delivered: the sink dies right after the
    micro-batch that *ends inside* gtid 2, and on resume the WHOLE of
    gtid 2 redelivers — no row of a split transaction is ever lost
    (the reference only saves positions on commit, handler.go:106-113)."""
    tab = _txn_table()
    # batch_size=2 → micro-batches align to txn bounds: [gtid1], then
    # gtid2's three rows held together, then [gtid3]
    ep = _RecordingEndpoint(fail_on_consume=2)
    loop = LiveSinkLoop(
        ep,
        FilePositionStore(str(tmp_path / "pos.json")),
        pos_save_every=1,
        ping_interval=0.0,
        sleep=lambda dt: None,
    )
    metrics = loop.run(
        frame_stream(
            _txn_dataset_fn(tab), frame_col="frame", seq_col="seq_in_txn",
            batch_size=2,
        )
    )
    assert metrics["consume_errors"] == 1
    assert metrics["position"] == 3
    # every row of the split transaction arrived (loss = missing key)
    assert ep.state == {"r1": "a", "t2a": "b", "t2b": "c", "t2c": "d", "r3": "e"}
    # and the checkpoint never named gtid 2 while its tail was pending:
    # the failed consume was gtid 2's FULL transaction, redelivered whole
    assert ep.deliveries == ["r1", "t2a", "t2b", "t2c", "r3"]


def test_same_gtid_rows_deliver_in_seq_order(tmp_path):
    """Rows of one transaction deliver in seq_in_txn order even when the
    physical/source order is reversed — SET k v1 (seq 0) then SET k v2
    (seq 1) must leave v2, whatever order the blocks arrive in."""
    tab = pa.table(
        {
            "gtid": pa.array([7, 7, 7], pa.int64()),
            "seq_in_txn": pa.array([2, 0, 1], pa.int32()),
            "frame": pa.array(["k=v2", "k=v0", "k=v1"], pa.string()),
        }
    )
    ep = _RecordingEndpoint()
    LiveSinkLoop(
        ep, FilePositionStore(str(tmp_path / "pos.json")),
        ping_interval=0.0, sleep=lambda dt: None,
    ).run(
        frame_stream(
            _txn_dataset_fn(tab), frame_col="frame", seq_col="seq_in_txn",
            batch_size=64,
        )
    )
    assert ep.state == {"k": "v2"}  # seq 2 applied last


def test_http_bulk_rejects_errors_response():
    server = LoopbackHttpBulkServer().start()
    try:
        ep = HttpBulkEndpoint(server.address)
        ep.connect()
        with pytest.raises(SinkError):
            ep.consume([b'{"frobnicate":{"_id":"1"}}\n'])
    finally:
        server.stop()


from hypothesis import HealthCheck, given, settings, strategies as st


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    txn_sizes=st.lists(st.integers(min_value=1, max_value=6), min_size=1, max_size=12),
    batch_size=st.integers(min_value=1, max_value=9),
    pos_save_every=st.integers(min_value=1, max_value=4),
    fail_at=st.integers(min_value=0, max_value=8),
    shuffle_seed=st.integers(min_value=0, max_value=1000),
)
def test_property_no_row_lost_any_txn_shape(
    ray_session, tmp_path_factory, txn_sizes, batch_size, pos_save_every,
    fail_at, shuffle_seed,
):
    """For ANY transaction shape, Arrow batch size, checkpoint cadence,
    physical row order and single mid-stream consume failure: every row
    is delivered (no loss), the final position is the last gtid, and
    each transaction's rows arrive contiguously in seq order."""
    import random

    rows = []
    for g, size in enumerate(txn_sizes, start=1):
        for s in range(size):
            rows.append((g, s, f"g{g}s{s}=v"))
    random.Random(shuffle_seed).shuffle(rows)  # physical order is arbitrary
    tab = pa.table(
        {
            "gtid": pa.array([r[0] for r in rows], pa.int64()),
            "seq_in_txn": pa.array([r[1] for r in rows], pa.int32()),
            "frame": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    ep = _RecordingEndpoint(fail_on_consume=fail_at)  # 0 = never fails
    pos = tmp_path_factory.mktemp("livepos") / "pos.json"
    metrics = LiveSinkLoop(
        ep, FilePositionStore(str(pos)),
        pos_save_every=pos_save_every, ping_interval=0.0,
        sleep=lambda dt: None,
    ).run(
        frame_stream(
            _txn_dataset_fn(tab), frame_col="frame", seq_col="seq_in_txn",
            batch_size=batch_size,
        )
    )
    # no loss, final position = last committed gtid
    assert set(ep.state) == {r[2].split("=")[0] for r in rows}
    assert metrics["position"] == len(txn_sizes)
    # txn atomicity + intra-txn order: the LAST delivery run of every
    # transaction must be contiguous and seq-ascending (redelivery after
    # a failure resends the whole transaction in order)
    runs: dict = {}
    for i, k in enumerate(ep.deliveries):
        g, s = k.split("s")
        g, s = int(g[1:]), int(s.split("=")[0])
        runs.setdefault(g, [])
        if runs[g] and runs[g][-1][0] == i - 1 and runs[g][-1][1] == s - 1:
            runs[g].append((i, s))
        elif s == 0:
            runs[g] = [(i, s)]
        else:
            # a delivery starting MID-transaction (or out of order)
            # invalidates the run — only a later full in-order run may
            # satisfy the final assert
            runs[g] = []
    for g, size in enumerate(txn_sizes, start=1):
        assert [s for _, s in runs[g]] == list(range(size)), (
            f"txn {g} rows not delivered contiguously in seq order"
        )


def test_follow_style_pass_holds_checkpoint_before_open_txn(tmp_path):
    """A follow pass (final_tail=False) whose stream ends mid-transaction
    must deliver the tail but checkpoint only the last COMPLETE txn —
    when the rest of the transaction lands in a later shard, the next
    pass redelivers it whole and nothing is lost (a bounded stream with
    final_tail=True would have checkpointed the open gtid and pruned the
    late half forever)."""
    store = FilePositionStore(str(tmp_path / "pos.json"))
    # pass 1 sees gtid 1 complete + the FIRST half of gtid 2
    first = pa.table(
        {
            "gtid": pa.array([1, 2], pa.int64()),
            "seq_in_txn": pa.array([0, 0], pa.int32()),
            "frame": pa.array(["a=1", "b=2"], pa.string()),
        }
    )
    ep = _RecordingEndpoint()
    m1 = LiveSinkLoop(ep, store, ping_interval=0.0, sleep=lambda dt: None).run(
        frame_stream(
            _txn_dataset_fn(first), frame_col="frame", seq_col="seq_in_txn",
            batch_size=64, final_tail=False,
        )
    )
    assert m1["frames_delivered"] == 2  # the open tail IS delivered
    assert m1["position"] == 1  # but the checkpoint stays at the commit
    # pass 2: the producer's next file completes gtid 2 and adds gtid 3
    both = pa.table(
        {
            "gtid": pa.array([1, 2, 2, 3], pa.int64()),
            "seq_in_txn": pa.array([0, 0, 1, 0], pa.int32()),
            "frame": pa.array(["a=1", "b=2", "c=3", "d=4"], pa.string()),
        }
    )
    m2 = LiveSinkLoop(ep, store, ping_interval=0.0, sleep=lambda dt: None).run(
        frame_stream(
            _txn_dataset_fn(both), frame_col="frame", seq_col="seq_in_txn",
            batch_size=64, final_tail=False,
        )
    )
    # gtid 2 redelivered WHOLE (b at-least-once, c for the first time)
    assert ep.state == {"a": "1", "b": "2", "c": "3", "d": "4"}
    assert m2["position"] == 2  # gtid 3 is now the open tail


def test_giant_txn_streams_in_bounded_slices(tmp_path):
    """One transaction larger than max_carry streams out in slices
    (bounded driver memory) checkpointed at the last complete gtid."""
    n = 50
    tab = pa.table(
        {
            "gtid": pa.array([1] + [2] * n + [3], pa.int64()),
            "seq_in_txn": pa.array([0] + list(range(n)) + [0], pa.int32()),
            "frame": pa.array(
                ["a=1"] + [f"k{i}=v" for i in range(n)] + ["z=9"], pa.string()
            ),
        }
    )
    ep = _RecordingEndpoint()
    saves = []
    store = FilePositionStore(str(tmp_path / "pos.json"))
    orig_save = store.save
    store.save = lambda g: (saves.append(g), orig_save(g))[1]
    m = LiveSinkLoop(
        ep, store, pos_save_every=1, ping_interval=0.0, sleep=lambda dt: None,
    ).run(
        frame_stream(
            _txn_dataset_fn(tab), frame_col="frame", seq_col="seq_in_txn",
            batch_size=4, max_carry=8,
        )
    )
    assert m["position"] == 3
    assert len(ep.state) == n + 2  # nothing lost
    # the giant txn went out in multiple micro-batches, and every
    # checkpoint taken while it was open names gtid 1, never gtid 2
    assert m["batches_delivered"] > 3
    assert all(g in (1, 2, 3) for g in saves)
    assert 1 in saves  # mid-txn slices checkpointed at the commit before
