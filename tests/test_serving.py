"""AsyncBatcher: correctness vs direct engine, concurrency, shutdown."""

import threading

import numpy as np
import pytest

import wadt  # noqa: F401
from wadt.engine.executor import Engine
from wadt.engine.serving import AsyncBatcher
from wadt.models import pmg

TINY = dict(
    ndf=8, patch_size=16, patch_div=2, gram_channels=16, d_model=32,
    transformer_layers=1, transformer_heads=2, norm="batch",
)
TASKS = {"A": ["a0", "a1", "a2"], "B": ["b0", "b1"]}


@pytest.fixture(scope="module")
def engine():
    import jax

    spec = pmg.build_spec(TASKS, TINY)
    params = pmg.init(jax.random.PRNGKey(0), spec)
    return Engine("pmg", spec, params, batch_size=8)


def test_async_matches_direct(engine):
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (5, 32, 32, 3), np.uint8)
    direct = engine.run(imgs, collect=("probs", "preds"))
    with AsyncBatcher(engine, max_wait_ms=5) as ab:
        futs = [ab.submit(imgs[i]) for i in range(5)]
        for i, f in enumerate(futs):
            res = f.result(timeout=60)
            np.testing.assert_allclose(res["probs"], direct["probs"][i], atol=1e-6)
            assert res["preds"].tolist() == direct["preds"][i].tolist()
        pct = ab.latency_percentiles()
    assert pct["n"] == 5 and pct["p50"] > 0


def test_async_concurrent_streams(engine):
    rng = np.random.RandomState(1)
    results = {}

    def stream(name, n):
        out = []
        for i in range(n):
            img = rng.randint(0, 256, (32, 32, 3), np.uint8)
            out.append(ab.predict(img, timeout=60)["preds"])
        results[name] = out

    with AsyncBatcher(engine, max_wait_ms=2) as ab:
        threads = [
            threading.Thread(target=stream, args=(f"s{i}", 6)) for i in range(4)
        ]
        [t.start() for t in threads]
        [t.join() for t in threads]
    assert len(results) == 4 and all(len(v) == 6 for v in results.values())


def test_async_shutdown_rejects(engine):
    ab = AsyncBatcher(engine)
    ab.close()
    with pytest.raises(RuntimeError):
        ab.submit(np.zeros((32, 32, 3), np.uint8))


def test_async_zero_wait_single_request_resolves(engine):
    """Regression: with max_wait_ms=0, a lone request must not deadlock
    waiting for a second one (the dispatcher used to block on an expired
    deadline with timeout=None)."""
    with AsyncBatcher(engine, max_wait_ms=0.0) as ab:
        res = ab.predict(
            np.random.RandomState(0).randint(0, 256, (32, 32, 3), np.uint8),
            timeout=30,
        )
        assert res["preds"].shape == (2,)


def test_latencies_bounded(engine):
    from collections import deque

    with AsyncBatcher(engine) as ab:
        assert isinstance(ab.latencies, deque) and ab.latencies.maxlen


class _StallEngine:
    """Engine stub whose dispatch blocks until released — lets a test fill
    the admission queue deterministically."""

    batch_size = 1

    def __init__(self):
        self.release = threading.Event()

    def dispatch(self, images):
        self.release.wait(timeout=30)
        return images

    def fetch(self, handle):
        n = len(handle)
        return {
            "probs": np.full((n, 2, 3), 1 / 3, np.float32),
            "preds": np.zeros((n, 2), np.int32),
        }


def test_async_rejects_nonpositive_max_queue():
    """queue.Queue(maxsize=0) would mean UNBOUNDED — must be rejected."""
    eng = _StallEngine()
    for bad in (0, -4):
        with pytest.raises(ValueError):
            AsyncBatcher(eng, max_batch=1, max_queue=bad)


def test_async_overload_raises():
    """With the dispatcher stalled, submits beyond max_queue must be
    rejected with Overloaded (bounded-memory backpressure), and queued
    requests must still resolve once the stall clears."""
    from wadt.engine.serving import Overloaded

    eng = _StallEngine()
    ab = AsyncBatcher(eng, max_batch=1, max_wait_ms=0.0, max_queue=2)
    try:
        img = np.zeros((8, 8, 3), np.uint8)
        first = ab.submit(img)  # dispatcher takes this one and stalls
        # give the dispatcher time to pull `first` off the queue
        deadline = __import__("time").time() + 5
        while ab._queue.qsize() > 0 and __import__("time").time() < deadline:
            __import__("time").sleep(0.01)
        queued = [ab.submit(img) for _ in range(2)]  # fills max_queue
        with pytest.raises(Overloaded):
            ab.submit(img)
        eng.release.set()
        for f in [first, *queued]:
            assert f.result(timeout=30)["preds"].shape == (2,)
    finally:
        eng.release.set()
        ab.close()


def test_async_close_with_full_queue_still_terminates():
    """close() against a FULL admission queue drops the shutdown sentinel —
    the dispatcher's timed get must re-check _stop and terminate once the
    backlog drains (regression: an untimed blocking get pinned the thread,
    engine, and latency deque for the process lifetime)."""
    import time

    eng = _StallEngine()
    ab = AsyncBatcher(eng, max_batch=1, max_wait_ms=0.0, max_queue=1)
    img = np.zeros((8, 8, 3), np.uint8)
    first = ab.submit(img)  # dispatcher takes this one and stalls in dispatch
    deadline = time.time() + 5
    while ab._queue.qsize() > 0 and time.time() < deadline:
        time.sleep(0.01)
    queued = ab.submit(img)  # fills max_queue=1: the sentinel put must fail
    ab.close(timeout=0.2)  # returns with the dispatcher still wedged
    assert ab._thread.is_alive()
    eng.release.set()
    ab._thread.join(timeout=10)
    assert not ab._thread.is_alive()
    # the backlog was still served on the way down
    assert first.result(timeout=5)["preds"].shape == (2,)
    assert queued.result(timeout=5)["preds"].shape == (2,)
