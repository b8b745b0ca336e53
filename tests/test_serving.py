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
