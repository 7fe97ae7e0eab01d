"""MQ sink infra semantics: declare-once queues + bounded send retry
(K6/K7 — rocket.go retry=2, rabbit.go declare-on-demand)."""

import pyarrow as pa
import pytest
import ray.data

from go_mysql_transfer_ray.pipelines.message_sink import deliver_stream


class FlakyTransport:
    """Fails the FIRST send to each queue, succeeds after; records calls."""

    def __init__(self, fail_first: int = 1, fail_forever: bool = False):
        self.declared: list[str] = []
        self.sends: list[tuple[str, int]] = []
        self.failures: dict[str, int] = {}
        self.fail_first = fail_first
        self.fail_forever = fail_forever

    def declare(self, queue: str):
        self.declared.append(queue)

    def send(self, queue: str, msgs):
        n = self.failures.get(queue, 0)
        if self.fail_forever or n < self.fail_first:
            self.failures[queue] = n + 1
            raise ConnectionError("broker hiccup")
        self.sends.append((queue, len(msgs)))


def _messages(n=100):
    return ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array([f"k{i}" for i in range(n)]),
                "action": pa.array(["insert"] * n),
                "value": pa.array([f"m{i}" for i in range(n)]),
            }
        )
    )


def test_retry_recovers_from_transient_failure(ray_session):
    out = deliver_stream(
        _messages(50),
        FlakyTransport,
        retries=2,
        queue_for=lambda k: "q1",
        concurrency=1,
        batch_size=50,
    ).to_pandas()
    assert out["sent"].sum() == 50
    # first attempt failed, second succeeded
    assert (out["attempts"] >= 2).any()


def test_retry_budget_exhausted_raises(ray_session):
    with pytest.raises(Exception):
        deliver_stream(
            _messages(10),
            lambda: FlakyTransport(fail_forever=True),
            retries=2,
            concurrency=1,
            batch_size=10,
        ).to_pandas()


def test_declare_once_per_queue(ray_session):
    class StrictTransport:
        """Raises if a queue is declared twice or published before its
        declare — proving the declare-on-demand cache inside the actor."""

        def __init__(self):
            self.declared: set[str] = set()

        def declare(self, queue):
            if queue in self.declared:
                raise AssertionError(f"queue {queue} declared twice")
            self.declared.add(queue)

        def send(self, queue, msgs):
            if queue not in self.declared:
                raise AssertionError(f"send before declare on {queue}")

    out = deliver_stream(
        _messages(100),
        StrictTransport,
        queue_for=lambda k: f"q{int(k[1:]) % 2}",
        concurrency=1,
        batch_size=25,  # 4 batches through ONE actor -> repeated sends per queue
    ).to_pandas()
    assert out.groupby("queue")["sent"].sum().to_dict() == {"q0": 50, "q1": 50}
    assert (out["attempts"] == 1).all()
