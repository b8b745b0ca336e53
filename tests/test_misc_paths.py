"""Coverage for remaining paths: group norm math, accum-steps training,
bf16 engine, gray-init style transfer, TaskSpec.split_logits."""

import numpy as np
import pytest

import wadt  # noqa: F401
from wadt.config import TaskSpec
from wadt.models import pmg

TINY = dict(
    ndf=8, patch_size=64, patch_div=2, gram_channels=16, d_model=32,
    transformer_layers=1, transformer_heads=2, norm="batch",
)
TASKS = {"A": ["a0", "a1", "a2"], "B": ["b0", "b1"]}


def test_group_norm_matches_manual():
    import jax.numpy as jnp

    from wadt.ops.norms import group_norm

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 4, 8).astype(np.float32)
    p = {"scale": jnp.asarray(rng.rand(8).astype(np.float32) + 0.5),
         "bias": jnp.asarray(rng.randn(8).astype(np.float32))}
    got = np.asarray(group_norm(jnp.asarray(x), p, num_groups=2))
    # manual: stats per (sample, group of 4 channels) over H,W,Cg
    want = np.empty_like(x)
    for b in range(2):
        for g in range(2):
            sl = x[b, :, :, g * 4 : (g + 1) * 4]
            m, v = sl.mean(), sl.var()
            want[b, :, :, g * 4 : (g + 1) * 4] = (sl - m) / np.sqrt(v + 1e-5)
    want = want * np.asarray(p["scale"]) + np.asarray(p["bias"])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_accum_steps_updates_every_k():
    import jax

    from wadt.parallel.train import make_optimizer, make_train_step

    spec = pmg.build_spec(TASKS, TINY)
    params0 = pmg.init(jax.random.PRNGKey(0), spec)
    opt = make_optimizer(lr=1e-2, accum_steps=2, params_template=params0)
    init_fn, step_fn = make_train_step("pmg", spec, opt, bn_train=False)
    state = init_fn(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    imgs = rng.randn(4, 64, 64, 3).astype(np.float32)
    labels = rng.randint(0, 2, (4, 2)).astype(np.int32)
    q0 = np.asarray(state.params["queries"])
    state, _ = step_fn(state, imgs, labels)
    # first micro-step: gradients accumulated, params unchanged
    np.testing.assert_array_equal(q0, np.asarray(state.params["queries"]))
    state, _ = step_fn(state, imgs, labels)
    assert not np.allclose(q0, np.asarray(state.params["queries"]))


def test_engine_bf16_params_stay_f32():
    """bf16 mode must not leak low-precision params through engine.params
    (StreamPredictor/Explainer/train warm-start consume it as f32); the cast
    copy is internal.  CPU-runnable: no bf16 dot is executed."""
    import jax
    import jax.numpy as jnp

    spec = pmg.build_spec(TASKS, TINY)
    params = pmg.init(jax.random.PRNGKey(0), spec)
    from wadt.engine.executor import Engine

    eng = Engine("pmg", spec, params, batch_size=4, dtype=jnp.bfloat16)
    assert eng.params["queries"].dtype == jnp.float32
    assert eng._run_params["queries"].dtype == jnp.bfloat16
    # params swap re-derives the run copy
    eng.params = pmg.init(jax.random.PRNGKey(1), spec)
    assert eng._run_params["heads"]["w"].dtype == jnp.bfloat16


def test_engine_bf16_smoke():
    import jax
    import jax.numpy as jnp

    from wadt.engine.executor import Engine

    if jax.default_backend() == "cpu":
        pytest.skip("CPU XLA lacks bf16xbf16=f32 dots; bf16 execution is TPU-only")

    spec = pmg.build_spec(TASKS, TINY)
    params = pmg.init(jax.random.PRNGKey(0), spec)
    eng32 = Engine("pmg", spec, params, batch_size=4, prob_threshold=0.0)
    eng16 = Engine("pmg", spec, params, batch_size=4, prob_threshold=0.0,
                   dtype=jnp.bfloat16)
    imgs = np.random.RandomState(0).randint(0, 256, (4, 64, 64, 3), np.uint8)
    a = eng32.run(imgs, collect=("preds",))["preds"]
    b = eng16.run(imgs, collect=("preds",))["preds"]
    # bf16 activations keep argmax on this tiny model
    assert (a == b).mean() > 0.7


def test_engine_scan_chunk_matches_per_batch():
    """run(scan_chunk=k) — one lax.scan dispatch per k stacked micro-batches
    (the sustained-regime program, docs/BENCHMARKING.md) — must return the
    same probs/preds/loss as the per-batch path, including the non-scanned
    tail and IGNORE-padded labels."""
    import jax

    from wadt.config import IGNORE_INDEX
    from wadt.engine.executor import Engine

    spec = pmg.build_spec(TASKS, TINY)
    params = pmg.init(jax.random.PRNGKey(0), spec)
    eng = Engine("pmg", spec, params, batch_size=4)
    rng = np.random.RandomState(7)
    imgs = rng.randint(0, 256, (19, 64, 64, 3), np.uint8)  # 4 full + tail 3
    labels = rng.randint(0, 2, (19, 2)).astype(np.int32)
    labels[::5, 0] = IGNORE_INDEX

    ref = eng.run(imgs, labels, collect=("probs", "preds", "logits"))
    got = eng.run(imgs, labels, collect=("probs", "preds", "logits"),
                  scan_chunk=2)
    np.testing.assert_array_equal(got["preds"], ref["preds"])
    np.testing.assert_allclose(got["logits"], ref["logits"], rtol=0, atol=1e-5)
    np.testing.assert_allclose(got["probs"], ref["probs"], rtol=0, atol=1e-6)
    np.testing.assert_array_equal(got["count_per_task"], ref["count_per_task"])
    np.testing.assert_allclose(got["loss_per_task"], ref["loss_per_task"],
                               rtol=1e-6)

    # chunk larger than the number of full batches falls back cleanly
    got8 = eng.run(imgs, labels, collect=("preds",), scan_chunk=8)
    np.testing.assert_array_equal(got8["preds"], ref["preds"])
    # measure_time keeps the per-batch telemetry contract (no scan)
    timed = eng.run(imgs, labels, collect=("preds",), scan_chunk=2,
                    measure_time=True)
    assert len(timed["times"]) == 5


def test_engine_run_stream_scan_order_and_extras(monkeypatch):
    """run_stream stacks consecutive FULL loader batches into scan
    dispatches; short batches mid-stream (skip_errors loaders) flush the
    buffer first so row order and extras stay aligned."""
    import jax

    from wadt.engine.executor import Engine

    spec = pmg.build_spec(TASKS, TINY)
    params = pmg.init(jax.random.PRNGKey(0), spec)
    eng = Engine("pmg", spec, params, batch_size=4)
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 256, (17, 64, 64, 3), np.uint8)
    # sizes 4, 2 (short mid-stream), 4, 4, 3 (tail)
    cuts = [0, 4, 6, 10, 14, 17]
    batches = [
        (imgs[a:b], None, list(range(a, b)))
        for a, b in zip(cuts, cuts[1:])
    ]
    res, extras = eng.run_stream(batches, collect=("probs", "preds"),
                                 scan_chunk=2)
    assert extras == list(range(17))
    ref = eng.run(imgs, collect=("probs", "preds"))
    np.testing.assert_allclose(res["probs"], ref["probs"], rtol=0, atol=1e-6)
    np.testing.assert_array_equal(res["preds"], ref["preds"])

    # "auto" resolves through the recorded A/B winner (none on CPU -> 1)
    assert eng.resolve_scan_chunk("auto") == 1
    from wadt.ops import kernel_select

    monkeypatch.setattr(kernel_select, "winner",
                        lambda op, default="xla": "scan_k8")
    assert eng.resolve_scan_chunk("auto") == 8
    assert eng.resolve_scan_chunk(4) == 4
    assert eng.resolve_scan_chunk(None) == 1


def test_style_transfer_gray_init():
    from wadt.workloads.style_transfer import run_patch_gram_style_transfer

    spec = pmg.build_spec(TASKS, TINY)
    import jax

    params = pmg.init(jax.random.PRNGKey(0), spec)
    style = np.random.RandomState(1).randn(1, 64, 64, 3).astype(np.float32) * 0.5
    img, loss, iters = run_patch_gram_style_transfer(
        params, spec, style, num_iterations=3, lr=0.05, init_type="gray",
        target_loss=0.0, log_every=0,
    )
    assert np.isfinite(loss) and img.size == (64, 64)


def test_taskspec_split_logits():
    spec = TaskSpec.from_tasks(TASKS)
    stacked = np.arange(2 * 2 * 3).reshape(2, 2, 3).astype(np.float32)
    d = spec.split_logits(stacked)
    assert d["A"].shape == (2, 3) and d["B"].shape == (2, 2)
    np.testing.assert_array_equal(d["B"], stacked[:, 1, :2])


def test_parity_diff_json_comparator():
    """The recursive comparator behind the live benchmark-parity gate
    (tools/compare_with_reference.py) must flag every divergence kind and
    pass numeric-within-tolerance trees."""
    from tools.compare_with_reference import _diff_json

    a = {"x": {"p": 1.0, "auc": None, "names": ["a", "b"], "n": 3},
         "y": [0.5, 0.25]}
    # identical within tolerance
    fails = []
    b = {"x": {"p": 1.0 + 5e-7, "auc": None, "names": ["a", "b"], "n": 3},
         "y": [0.5, 0.25]}
    _diff_json(a, b, "", fails, 1e-6)
    assert fails == []
    # every divergence kind flagged
    fails = []
    b = {"x": {"p": 1.1, "auc": 0.3, "names": ["a", "zz"], "n": 3},
         "y": [0.5]}
    _diff_json(a, b, "", fails, 1e-6)
    paths = {p for p, _, _ in fails}
    assert paths == {"/x/p", "/x/auc", "/x/names[1]", "/y/len"}, fails
    # missing key
    fails = []
    _diff_json({"k": 1}, {}, "", fails, 1e-6)
    assert fails and fails[0][0] == "/keys"
    # NaN never satisfies the tolerance check against a number
    nan = float("nan")
    fails = []
    _diff_json({"a": nan}, {"a": 0.5}, "", fails, 1e-6)
    assert [p for p, _, _ in fails] == ["/a"]
    fails = []
    _diff_json({"a": nan}, {"a": nan}, "", fails, 1e-6)
    assert fails == []


def test_load_engine_one_call():
    """wadt.load_engine: checkpoint path -> Engine in one call (sidecar
    discovery + SE probe semantics of the CLI build path, no argparse)."""
    import os

    import wadt
    from tests.conftest import FIXTURES

    eng = wadt.load_engine("pmg", os.path.join(FIXTURES, "pmg_shipped.pth"),
                           batch_size=4)
    out = eng.run(np.random.randint(0, 256, (3, 224, 224, 3), np.uint8))
    assert out["preds"].shape == (3, 12)

    # dict registry + explicit hparams, no checkpoint -> random init
    eng2 = wadt.load_engine("pm", tasks={"A": ["x", "y"]},
                            hparams={"ndf": 8, "patch_size": 16}, batch_size=2)
    assert eng2.run(np.random.randint(0, 256, (1, 224, 224, 3), np.uint8))[
        "preds"
    ].shape == (1, 1)

    # PM SE auto-probe (test_PM.py:149-150): the checkpoint decides, both ways
    import json

    for ck, want_se in (("pm_small", True), ("pm_no_se", False)):
        meta = json.load(open(os.path.join(FIXTURES, f"{ck}.json")))
        # pass the WRONG value in hparams: the checkpoint probe must win
        hp = {**meta["hparams"], "attn_use_se": not want_se}
        eng3 = wadt.load_engine("pm", os.path.join(FIXTURES, f"{ck}.pth"),
                                tasks=meta["tasks"], hparams=hp)
        assert eng3.spec.attn_use_se is want_se, ck

    # empty-string model_path (unset $MODEL in a shell script) means "no
    # checkpoint" like the CLI's truthiness checks — random init, no crash
    eng4 = wadt.load_engine("pm", "", tasks={"A": ["x", "y"]},
                            hparams={"ndf": 8, "patch_size": 16}, batch_size=2)
    assert eng4.run(np.random.randint(0, 256, (1, 224, 224, 3), np.uint8))[
        "preds"
    ].shape == (1, 1)
