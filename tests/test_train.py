"""Trainer tests: recorded-recipe options (focal, class weights, freeze,
accum, BN train mode) and the end-to-end fit() loop."""

import json
import os

import numpy as np
import pytest

import wadt  # noqa: F401
from wadt.config import IGNORE_INDEX
from wadt.models import pmg

TINY = dict(
    ndf=8, patch_size=16, patch_div=2, gram_channels=16, d_model=32,
    transformer_layers=1, transformer_heads=2, norm="batch",
)
TASKS = {"A": ["a0", "a1", "a2"], "B": ["b0", "b1"]}


def test_bn_train_updates_running_stats():
    import jax

    spec = pmg.build_spec(TASKS, TINY)
    params = pmg.init(jax.random.PRNGKey(0), spec)
    x = np.random.RandomState(0).randn(8, 32, 32, 3).astype(np.float32)
    logits, updates = pmg.apply_train(params, x, spec)
    new_trunk = updates["trunk"]
    assert logits.shape == (8, 2, 3)
    # stats moved from init (mean 0 / var 1) toward batch statistics
    m0 = np.asarray(params["trunk"][0]["norm"]["mean"])
    m1 = np.asarray(new_trunk[0]["norm"]["mean"])
    assert not np.allclose(m0, m1)
    # momentum 0.1: new = 0.9*old + 0.1*batch
    v0 = np.asarray(params["trunk"][0]["norm"]["var"])
    v1 = np.asarray(new_trunk[0]["norm"]["var"])
    assert np.all(np.abs(v1 - v0) <= 0.1 * np.abs(v1 / 0.1))  # bounded step


def test_focal_and_weights_reduce_to_ce():
    """gamma=0 focal == plain CE; uniform weights == plain CE."""
    import jax.numpy as jnp

    from wadt.engine.executor import class_mask, masked_cross_entropy
    from wadt.parallel.train import masked_cross_entropy_ex

    rng = np.random.RandomState(0)
    spec = pmg.build_spec(TASKS, TINY)
    mask = jnp.asarray(class_mask(spec.tasks))
    logits = jnp.asarray(rng.randn(6, 2, 3).astype(np.float32))
    labels = jnp.asarray(
        np.array([[0, 1], [2, 0], [1, IGNORE_INDEX], [0, 0], [IGNORE_INDEX, 1], [2, 1]],
                 np.int32))
    base, _ = masked_cross_entropy(logits, labels, mask)
    f0, _ = masked_cross_entropy_ex(logits, labels, mask, focal_gamma=0.0)
    np.testing.assert_allclose(np.asarray(base), np.asarray(f0), atol=1e-6)
    uni = np.zeros((2, 3), np.float32)
    uni[0, :3] = 1.0
    uni[1, :2] = 1.0
    w0, _ = masked_cross_entropy_ex(logits, labels, mask, class_weights=jnp.asarray(uni))
    np.testing.assert_allclose(np.asarray(base), np.asarray(w0), atol=1e-5)
    # focal with gamma>0 strictly reduces easy-sample loss
    f2, _ = masked_cross_entropy_ex(logits, labels, mask, focal_gamma=2.0)
    assert np.all(np.asarray(f2) <= np.asarray(base) + 1e-6)


def test_compute_class_weights_median_cap():
    from wadt.parallel.train import compute_class_weights

    labels = np.array(
        [[0, 0]] * 8 + [[1, 1]] * 2 + [[2, IGNORE_INDEX]] * 1, np.int32
    )
    w = compute_class_weights(labels, (3, 2), mode="median", cap=3.0)
    assert w.shape == (2, 3)
    # task 0 counts: 8,2,1 -> median 2 -> weights 0.25, 1, 2
    np.testing.assert_allclose(w[0], [0.25, 1.0, 2.0], atol=1e-6)
    # cap applies
    labels2 = np.array([[0, 0]] * 100 + [[1, 0]] * 1, np.int32)
    w2 = compute_class_weights(labels2, (3, 2), cap=3.0)
    assert w2[0, 1] == 3.0
    assert w2[0, 2] == 0.0  # absent class -> zero weight


def test_fit_end_to_end(tmp_path):
    from tools.make_synth_dataset import make as make_synth

    from wadt.workloads.train import fit

    synth = make_synth(str(tmp_path / "synth"), n_per_class=4, size=64)
    spec = pmg.build_spec(json.load(open(os.path.join(synth, "tasks.json"))), TINY)
    out = fit(
        "pmg", spec, os.path.join(synth, "dataset.json"),
        os.path.join(synth, "tasks.json"), str(tmp_path / "run"),
        options=dict(epochs=3, batch_size=8, lr=3e-3, val_split=0.25,
                     balance_loss=True, use_focal=True, num_workers=2),
    )
    hist = out["history"]
    assert len(hist) == 3
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]
    assert os.path.exists(tmp_path / "run" / "best_model.pth")
    side = json.load(open(tmp_path / "run" / "hyperparameters.json"))
    assert side["hparams"]["ndf"] == 8 and "train_options" in side
    # trained .pth loads back through the converter
    from wadt.engine import checkpoint

    params = checkpoint.load_torch_checkpoint(
        "pmg", str(tmp_path / "run" / "best_model.pth"), spec
    )
    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    logits, _ = pmg.apply(params, x, spec)
    assert np.isfinite(np.asarray(logits)).all()


def test_freeze_encoder_keeps_trunk_fixed():
    import jax

    from wadt.parallel.train import make_train_step

    spec = pmg.build_spec(TASKS, TINY)
    init_fn, step_fn = make_train_step("pmg", spec, freeze_encoder=True,
                                       bn_train=False)
    state = init_fn(jax.random.PRNGKey(0))
    w0 = np.asarray(state.params["trunk"][0]["conv"]["w"])
    rng = np.random.RandomState(0)
    imgs = rng.randn(8, 32, 32, 3).astype(np.float32)
    labels = rng.randint(0, 2, (8, 2)).astype(np.int32)
    state, _ = step_fn(state, imgs, labels)
    np.testing.assert_array_equal(w0, np.asarray(state.params["trunk"][0]["conv"]["w"]))
    # heads DID move
    assert not np.allclose(
        np.asarray(init_fn(jax.random.PRNGKey(0)).params["queries"]),
        np.asarray(state.params["queries"]),
    )


def test_mixed_precision_train_step():
    """compute_dtype=bf16: forward/backward run in bf16 but master params,
    optimizer state, and BN running stats stay f32, and the loss decreases.

    Trace-level coverage runs everywhere; EXECUTION is TPU-gated (CPU XLA
    lacks bf16xbf16=f32 dots) — tools/tpu_checklist.py runs it on the chip."""
    import jax
    import jax.numpy as jnp

    from wadt.parallel.train import make_train_step

    spec = pmg.build_spec(TASKS, TINY)
    init_fn, step_fn = make_train_step(
        "pmg", spec, compute_dtype=jnp.bfloat16, dropout_rate=0.0
    )
    state = init_fn(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    imgs = rng.randn(8, 32, 32, 3).astype(np.float32)
    labels = rng.randint(0, 2, (8, 2)).astype(np.int32)

    # trace-level check (works on every backend): master state stays f32
    out_shapes = jax.eval_shape(step_fn, state, imgs, labels)
    for leaf in jax.tree_util.tree_leaves(out_shapes[0].params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(out_shapes[0].opt_state):
        assert leaf.dtype != jnp.bfloat16

    if jax.default_backend() == "cpu":
        pytest.skip("CPU XLA lacks bf16xbf16=f32 dots; bf16 execution is TPU-only")

    losses = []
    for _ in range(8):
        state, loss = step_fn(state, imgs, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_augment_batch_properties():
    """Device-side augmentation: identity at zero knobs, deterministic per
    key, flip-only output is exactly image-or-mirror, translate stays within
    the padded window."""
    import jax

    from wadt.ops.augment import DEFAULT_AUGMENT, augment_batch

    rng = np.random.RandomState(0)
    x = rng.randn(6, 16, 16, 3).astype(np.float32)
    key = jax.random.PRNGKey(7)

    # signature defaults are all OFF -> identity (a partial kwargs dict
    # enables only what it names)
    out = augment_batch(key, x)
    np.testing.assert_array_equal(np.asarray(out), x)

    # deterministic per key; different keys differ (full recipe)
    a1 = np.asarray(augment_batch(key, x, **DEFAULT_AUGMENT))
    a2 = np.asarray(augment_batch(key, x, **DEFAULT_AUGMENT))
    np.testing.assert_array_equal(a1, a2)
    assert not np.array_equal(
        a1, np.asarray(augment_batch(jax.random.PRNGKey(8), x, **DEFAULT_AUGMENT))
    )

    # flip-only: each image is itself or its exact horizontal mirror
    f = np.asarray(augment_batch(key, x, flip=True))
    flipped = x[:, :, ::-1, :]
    for i in range(len(x)):
        assert np.array_equal(f[i], x[i]) or np.array_equal(f[i], flipped[i]), i
    # ... and both outcomes occur across a batch of 6 with this key
    same = [np.array_equal(f[i], x[i]) for i in range(len(x))]
    assert any(same) and not all(same)

    # translate-only: every output row/col exists in the edge-padded input
    t = np.asarray(augment_batch(key, x, translate=3))
    padded = np.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="edge")
    for i in range(len(x)):
        hits = [
            np.array_equal(t[i], padded[i, oy : oy + 16, ox : ox + 16])
            for oy in range(7)
            for ox in range(7)
        ]
        assert any(hits), i

    # photometric-only: shape/dtype preserved, bounded change
    p = np.asarray(augment_batch(key, x, brightness=0.2, contrast=0.2))
    assert p.shape == x.shape and p.dtype == x.dtype
    assert not np.array_equal(p, x)

    # make_train_step contract: {} means the full default recipe, and a
    # non-dict truthy value is a clear TypeError (not a cryptic dict() crash)
    from wadt.parallel.train import make_train_step  # noqa: PLC0415

    with pytest.raises(TypeError, match="augment must be"):
        make_train_step("pmg", pmg.build_spec(TASKS, TINY), augment=1)


def test_train_step_with_augmentation():
    """augment=True in make_train_step: loss stays finite, params move, and
    the same state yields the SAME augmented loss twice (step-keyed rng);
    resume-exactness follows from keying on state.step."""
    import jax

    from wadt.parallel.train import make_train_step

    spec = pmg.build_spec(TASKS, TINY)
    init_fn, step_fn = make_train_step("pmg", spec, bn_train=False,
                                       dropout_rate=0.0, augment=True)
    state = init_fn(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    imgs = rng.randn(8, 32, 32, 3).astype(np.float32)
    labels = rng.randint(0, 2, (8, 2)).astype(np.int32)

    _, loss_a = step_fn(state, imgs, labels)
    _, loss_b = step_fn(state, imgs, labels)
    assert float(loss_a) == float(loss_b)  # same step counter -> same draws

    # unaugmented loss differs (the augmentation actually perturbs inputs)
    _, step_plain = make_train_step("pmg", spec, bn_train=False,
                                    dropout_rate=0.0)
    _, loss_plain = step_plain(state, imgs, labels)
    assert float(loss_plain) != float(loss_a)

    # a later step uses different draws
    s1, _ = step_fn(state, imgs, labels)
    _, loss_next = step_fn(s1, imgs, labels)
    assert np.isfinite(float(loss_next))
    assert float(loss_next) != float(loss_a)


def test_rtm_bn_train_updates_backbone_stats():
    import jax

    from wadt.models import rtm

    spec = rtm.build_spec(TASKS, dict(truncate_layer=5, use_attention=False))
    params = rtm.init(jax.random.PRNGKey(0), spec)
    x = np.random.RandomState(0).randn(4, 64, 64, 3).astype(np.float32)
    logits, updates = rtm.apply_train(params, x, spec)
    nb = updates["backbone"]
    assert logits.shape == (4, 2, 3)
    assert not np.allclose(np.asarray(params["backbone"]["bn1"]["mean"]),
                           np.asarray(nb["bn1"]["mean"]))
    assert not np.allclose(
        np.asarray(params["backbone"]["layer1"][0]["bn2"]["mean"]),
        np.asarray(nb["layer1"][0]["bn2"]["mean"]))
    # weights untouched
    np.testing.assert_array_equal(
        np.asarray(params["backbone"]["conv1"]["w"]),
        np.asarray(nb["conv1"]["w"]))


def test_pm_bn_train_updates_trunk_stats():
    import jax

    from wadt.models import pm

    spec = pm.build_spec(TASKS, dict(ndf=8, patch_size=16, norm="batch"))
    params = pm.init(jax.random.PRNGKey(0), spec)
    x = np.random.RandomState(0).randn(4, 32, 32, 3).astype(np.float32)
    logits, updates = pm.apply_train(params, x, spec)
    assert logits.shape == (4, 2, 3)
    assert not np.allclose(np.asarray(params["trunk"][0]["norm"]["mean"]),
                           np.asarray(updates["trunk"][0]["norm"]["mean"]))


def test_pmg_transformer_dropout():
    """rng=None == eval forward; two rngs give different logits; rate=0 is
    rng-independent (the reference trains its transformer with dropout=0.1,
    models_PMG.py:146)."""
    import jax

    spec = pmg.build_spec(TASKS, {**TINY, "norm": "instance"})
    params = pmg.init(jax.random.PRNGKey(0), spec)
    x = np.random.RandomState(0).randn(4, 32, 32, 3).astype(np.float32)
    eval_logits, _ = pmg.apply(params, x, spec)
    det, _ = pmg.apply_train(params, x, spec, rng=None)
    np.testing.assert_allclose(np.asarray(det), np.asarray(eval_logits), atol=1e-5)
    a, _ = pmg.apply_train(params, x, spec, rng=jax.random.PRNGKey(1))
    b, _ = pmg.apply_train(params, x, spec, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(a), np.asarray(b))
    c, _ = pmg.apply_train(params, x, spec, rng=jax.random.PRNGKey(1),
                           dropout_rate=0.0)
    np.testing.assert_allclose(np.asarray(c), np.asarray(eval_logits), atol=1e-5)


def test_fit_resume_matches_straight_run(tmp_path):
    """epochs=1 + resume to 3 must reproduce a straight 3-epoch run exactly
    (full optimizer state + per-epoch seeded order + step-folded dropout)."""
    import jax

    from tools.make_synth_dataset import make as make_synth
    from wadt.workloads.train import fit

    synth = make_synth(str(tmp_path / "synth"), n_per_class=3, size=64)
    tasks = json.load(open(os.path.join(synth, "tasks.json")))
    spec = pmg.build_spec(tasks, TINY)
    opts = dict(epochs=3, batch_size=4, val_split=0.25, num_workers=2,
                dropout_rate=0.1, seed=3)

    out_a = fit("pmg", spec, os.path.join(synth, "dataset.json"),
                os.path.join(synth, "tasks.json"), str(tmp_path / "a"),
                options=opts)

    fit("pmg", spec, os.path.join(synth, "dataset.json"),
        os.path.join(synth, "tasks.json"), str(tmp_path / "b"),
        options={**opts, "epochs": 1})
    out_b = fit("pmg", spec, os.path.join(synth, "dataset.json"),
                os.path.join(synth, "tasks.json"), str(tmp_path / "b"),
                options={**opts, "resume": True})

    assert [h["epoch"] for h in out_b["history"]] == [0, 1, 2]
    la = [h["train_loss"] for h in out_a["history"]]
    lb = [h["train_loss"] for h in out_b["history"]]
    np.testing.assert_allclose(la, lb, rtol=1e-5)
    ja, jb = jax.tree_util.tree_leaves(out_a["params"]), jax.tree_util.tree_leaves(out_b["params"])
    for x, y in zip(ja, jb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_cached_train_step_reuses_traced_step():
    """cached_train_step: same config -> the SAME jitted step object (no
    re-trace on resume / repeat fits); any config delta -> a distinct step.
    ndarray kwargs (class_weights) key by value, meshes by identity."""
    from wadt.parallel.train import _STEP_CACHE, cached_train_step

    spec = pmg.build_spec(TASKS, TINY)
    a = cached_train_step("pmg", spec, dropout_rate=0.0)
    b = cached_train_step("pmg", spec, dropout_rate=0.0)
    assert a[1] is b[1] and a[2] is b[2] and a[0] is b[0]
    c = cached_train_step("pmg", spec, dropout_rate=0.5)
    assert c[2] is not a[2]
    d = cached_train_step("pmg", spec, dropout_rate=0.0, lr=1e-3)
    assert d[2] is not a[2]
    cw = np.ones((2, 3), np.float32)
    e = cached_train_step("pmg", spec, class_weights=cw)
    f = cached_train_step("pmg", spec, class_weights=cw.copy())
    assert e[2] is f[2]
    g = cached_train_step("pmg", spec, class_weights=cw * 2)
    assert g[2] is not e[2]
    assert len(_STEP_CACHE) <= 16

    # an UNHASHABLE spec builds the key tuple fine but must fall back to an
    # uncached build, not raise at the cache lookup (advisor round-4 finding)
    class _UnhashableSpec:
        def __init__(self, inner):
            object.__setattr__(self, "_inner", inner)

        def __getattr__(self, k):
            return getattr(object.__getattribute__(self, "_inner"), k)

        __hash__ = None

    n_before = len(_STEP_CACHE)
    u1 = cached_train_step("pmg", _UnhashableSpec(spec), dropout_rate=0.0)
    u2 = cached_train_step("pmg", _UnhashableSpec(spec), dropout_rate=0.0)
    assert u1[2] is not u2[2]  # uncached: fresh build each call
    assert len(_STEP_CACHE) == n_before  # and nothing was cached
