"""HTTP serving layer: predict/healthz/stats endpoints, error paths,
concurrent clients through the micro-batcher."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

import wadt  # noqa: F401
from wadt.engine.executor import Engine
from wadt.models import pmg
from wadt.workloads.serve import InferenceServer

TINY = dict(
    ndf=8, patch_size=16, patch_div=2, gram_channels=16, d_model=32,
    transformer_layers=1, transformer_heads=2, norm="batch",
)
TASKS = {"A": ["a0", "a1", "a2"], "B": ["b0", "b1"]}


@pytest.fixture(scope="module")
def server():
    import jax

    spec = pmg.build_spec(TASKS, TINY)
    params = pmg.init(jax.random.PRNGKey(0), spec)
    engine = Engine("pmg", spec, params, batch_size=8)
    srv = InferenceServer(engine, host="127.0.0.1", port=0, prob_threshold=0.0)
    srv.start()
    yield srv
    srv.stop()


def _url(server, path):
    return f"http://127.0.0.1:{server.port}{path}"


def _get(server, path):
    with urllib.request.urlopen(_url(server, path), timeout=60) as r:
        return r.status, json.loads(r.read())


def _post_image(server, data):
    req = urllib.request.Request(_url(server, "/predict"), data=data, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def _jpeg_bytes(seed=0, size=(100, 80)):
    img = Image.fromarray(
        np.random.RandomState(seed).randint(0, 256, (size[1], size[0], 3), np.uint8)
    )
    buf = io.BytesIO()
    img.save(buf, "JPEG")
    return buf.getvalue()


def test_healthz(server):
    code, j = _get(server, "/healthz")
    assert code == 200 and j["status"] == "ok" and j["tasks"] == 2


def test_predict_schema(server):
    code, j = _post_image(server, _jpeg_bytes())
    assert code == 200
    pred = j["prediction"]
    assert set(pred) == {"A", "B"}
    assert set(pred["A"]) == {"predicted_class", "probability", "probs"}
    assert abs(sum(pred["A"]["probs"].values()) - 1.0) < 1e-4
    assert j["latency_ms"] > 0
    code, stats = _get(server, "/stats")
    assert stats["n"] >= 1


def test_predict_concurrent(server):
    results = []

    def one(i):
        results.append(_post_image(server, _jpeg_bytes(i))[0])

    ts = [threading.Thread(target=one, args=(i,)) for i in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert results == [200] * 8


def test_predict_bad_body(server):
    req = urllib.request.Request(
        _url(server, "/predict"), data=b"not-an-image", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=60)
    assert exc.value.code == 400


def test_unknown_path(server):
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(_url(server, "/nope"), timeout=60)
    assert exc.value.code == 404


def test_oversize_body_rejected_413():
    """A body over max_body_bytes must be refused BEFORE buffering."""
    import jax

    spec = pmg.build_spec(TASKS, TINY)
    params = pmg.init(jax.random.PRNGKey(0), spec)
    engine = Engine("pmg", spec, params, batch_size=4)
    srv = InferenceServer(engine, host="127.0.0.1", port=0,
                          prob_threshold=0.0, max_body_bytes=1024).start()
    try:
        req = urllib.request.Request(
            _url(srv, "/predict"), data=b"x" * 4096, method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=60)
        assert exc.value.code == 413
        # server still healthy afterwards
        assert _get(srv, "/healthz")[0] == 200
    finally:
        srv.stop()


def test_result_timeout_504(server, monkeypatch):
    """A request whose result does not arrive within result_timeout_s maps
    to 504 (the stdlib Future timeout path)."""
    import concurrent.futures

    def never(*a, **k):
        raise concurrent.futures.TimeoutError()

    monkeypatch.setattr(server.batcher, "predict", never)
    req = urllib.request.Request(
        _url(server, "/predict"), data=_jpeg_bytes(), method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=60)
    assert exc.value.code == 504


def test_overload_503_with_retry_after(server, monkeypatch):
    """Queue-full backpressure surfaces as 503 + Retry-After."""
    from wadt.engine.serving import Overloaded

    def full(*a, **k):
        raise Overloaded("request queue full (test)")

    monkeypatch.setattr(server.batcher, "predict", full)
    req = urllib.request.Request(
        _url(server, "/predict"), data=_jpeg_bytes(), method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=60)
    assert exc.value.code == 503
    assert exc.value.headers.get("Retry-After") == "1"


@pytest.fixture(scope="module")
def exported_server(tmp_path_factory):
    """Server running straight off an AOT export artifact (no Engine)."""
    import jax

    from wadt.engine.export import ExportedPredictor, export_engine

    spec = pmg.build_spec(TASKS, TINY)
    params = pmg.init(jax.random.PRNGKey(0), spec)
    engine = Engine("pmg", spec, params, batch_size=8)
    art = str(tmp_path_factory.mktemp("aot"))
    export_engine(engine, art, platforms=("cpu",))
    pred = ExportedPredictor(art)
    pred.warmup()
    srv = InferenceServer(pred, host="127.0.0.1", port=0, prob_threshold=0.0)
    srv.start()
    yield srv, engine
    srv.stop()


def test_exported_artifact_serving(exported_server):
    srv, engine = exported_server
    code, health = _get(srv, "/healthz")
    assert code == 200 and health["model"] == "pmg" and health["tasks"] == 2

    code, out = _post_image(srv, _jpeg_bytes(3))
    assert code == 200
    pred = out["prediction"]
    assert set(pred) == {"A", "B"}
    for t, classes in TASKS.items():
        probs = pred[t]["probs"]
        assert set(probs) == set(classes)
        assert abs(sum(probs.values()) - 1.0) < 1e-3
        assert pred[t]["predicted_class"] in classes  # threshold 0 -> never Unknown


def test_exported_dispatch_rejects_labels(exported_server):
    srv, _ = exported_server
    with pytest.raises(ValueError, match="no label inputs"):
        srv.batcher.engine.dispatch(
            np.zeros((2, 224, 224, 3), np.uint8),
            labels=np.zeros((2, 2), np.int32),
        )


def test_warmup_compiles_before_traffic_and_skips_telemetry():
    """start(warmup=True) (the default) pushes one dummy frame through the
    full batcher->engine path before accepting traffic — a cold compile can
    exceed result_timeout_s and 504 the first client — and keeps the
    warmup's compile time out of the latency percentiles."""
    import jax

    spec = pmg.build_spec(TASKS, TINY)
    params = pmg.init(jax.random.PRNGKey(3), spec)
    engine = Engine("pmg", spec, params, batch_size=4)
    srv = InferenceServer(engine, host="127.0.0.1", port=0)
    try:
        srv.start()  # blocks until the warmup batch completed
        assert srv.batcher.latency_percentiles() == {}  # telemetry clean
        status, stats = _get(srv, "/stats")
        assert status == 200 and stats.get("n", 0) == 0
    finally:
        srv.stop()


def test_stalled_dispatch_504_then_recovers():
    """A wedged device dispatch (this rig's relay failure mode) must map to
    504 for the waiting client WITHOUT killing the server: once the stall
    clears, the dispatcher drains and subsequent requests succeed."""
    import threading

    import jax

    spec = pmg.build_spec(TASKS, TINY)
    params = pmg.init(jax.random.PRNGKey(5), spec)
    engine = Engine("pmg", spec, params, batch_size=4)
    srv = InferenceServer(engine, host="127.0.0.1", port=0,
                          prob_threshold=0.0, result_timeout_s=1.0)
    try:
        srv.start()  # warmup completes before we inject the stall
        release = threading.Event()
        orig = engine.dispatch
        stalled = []

        def wedged(*a, **k):
            if not stalled:  # only the first post-warmup dispatch stalls
                stalled.append(True)
                assert release.wait(timeout=30), "test stall never released"
            return orig(*a, **k)

        engine.dispatch = wedged
        req = urllib.request.Request(
            _url(srv, "/predict"), data=_jpeg_bytes(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 504

        release.set()  # stall clears -> the dispatcher must drain
        status, out = _post_image(srv, _jpeg_bytes())
        assert status == 200 and set(out["prediction"]) == {"A", "B"}
    finally:
        release.set()
        srv.stop()
