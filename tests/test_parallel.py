"""Sharded execution tests on the 8-virtual-device CPU mesh: data-parallel
engine, dp+tp training step, Orbax native checkpoint round-trip, and the
driver contract (dryrun_multichip)."""

import numpy as np
import pytest

import wadt  # noqa: F401
from wadt.models import pmg

TINY = dict(
    ndf=8, patch_size=16, patch_div=2, gram_channels=16, d_model=32,
    transformer_layers=1, transformer_heads=2, norm="batch",
)
TASKS = {"A": ["a0", "a1", "a2"], "B": ["b0", "b1"]}


def _spec_params():
    import jax

    spec = pmg.build_spec(TASKS, TINY)
    return spec, pmg.init(jax.random.PRNGKey(0), spec)


@pytest.fixture(scope="module")
def mesh42_step():
    """ONE default-config train step over the (4,2) mesh, shared by the
    loss-decrease and sharded==unsharded tests (per-test compiles were the
    suite's top wall-clock cost on this 1-core rig)."""
    from wadt.parallel.mesh import make_mesh
    from wadt.parallel.train import make_train_step

    spec, _ = _spec_params()
    mesh = make_mesh(8, axes=("data", "model"), shape=(4, 2))
    init_fn, step_fn = make_train_step("pmg", spec, mesh=mesh)
    return init_fn, step_fn


def test_engine_data_parallel_matches_single_device():
    import jax

    from wadt.engine.executor import Engine
    from wadt.parallel.mesh import make_mesh

    spec, params = _spec_params()
    imgs = np.random.RandomState(0).randint(0, 256, (16, 32, 32, 3), np.uint8)

    single = Engine("pmg", spec, params, batch_size=16)
    mesh = make_mesh(8)
    sharded = Engine("pmg", spec, params, batch_size=16, mesh=mesh)
    a = single.run(imgs, collect=("logits",))["logits"]
    b = sharded.run(imgs, collect=("logits",))["logits"]
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_engine_scan_chunk_sharded_matches_single_device():
    """scan_chunk stacks batches as [k, B, ...]; under a mesh the batch axis
    moves to axis 1, so the scan program shards P(None, 'data') — its output
    must still match the single-device per-batch path."""
    from wadt.engine.executor import Engine
    from wadt.parallel.mesh import make_mesh

    spec, params = _spec_params()
    imgs = np.random.RandomState(1).randint(0, 256, (32, 32, 32, 3), np.uint8)

    single = Engine("pmg", spec, params, batch_size=16)
    sharded = Engine("pmg", spec, params, batch_size=16, mesh=make_mesh(8))
    a = single.run(imgs, collect=("logits",))["logits"]
    b = sharded.run(imgs, collect=("logits",), scan_chunk=2)["logits"]
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_train_step_dp_tp_loss_decreases(mesh42_step):
    import jax

    from wadt.config import IGNORE_INDEX

    init_fn, step_fn = mesh42_step
    state = init_fn(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    images = rng.randn(16, 32, 32, 3).astype(np.float32)
    labels = rng.randint(0, 2, (16, 2)).astype(np.int32)
    labels[0, 0] = IGNORE_INDEX

    losses = []
    for _ in range(8):
        state, loss = step_fn(state, images, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    # task-axis tensors actually sharded over 'model'
    sh = state.params["queries"].sharding
    assert sh.spec[0] == "model"


def test_param_shardings_path_aware():
    """Only ROOT-level task-stacked subtrees shard over 'model'; the
    transformer's internal ``attn`` subtree (no task axis) must replicate."""
    from jax.sharding import PartitionSpec as P

    from wadt.parallel.mesh import make_mesh
    from wadt.parallel.train import param_shardings

    spec, params = _spec_params()
    mesh = make_mesh(8, axes=("data", "model"), shape=(4, 2))
    sh = param_shardings(params, mesh)
    assert sh["heads"]["w"].spec == P("model", None, None)
    assert sh["queries"].spec == P("model", None)
    for name, leaf_sh in sh["transformer"][0]["attn"].items():
        assert leaf_sh.spec == P(), (name, leaf_sh.spec)
    for name, leaf_sh in sh["transformer"][0]["ffn1"].items():
        assert leaf_sh.spec == P(), (name, leaf_sh.spec)


def test_train_matches_unsharded(mesh42_step):
    """Same seed, same data: sharded and unsharded training must agree."""
    import jax

    from wadt.parallel.train import make_train_step

    spec, _ = _spec_params()
    rng = np.random.RandomState(1)
    images = rng.randn(8, 32, 32, 3).astype(np.float32)
    labels = rng.randint(0, 2, (8, 2)).astype(np.int32)

    results = []
    for fns in (make_train_step("pmg", spec), mesh42_step):
        init_fn, step_fn = fns
        state = init_fn(jax.random.PRNGKey(0))
        for _ in range(3):
            state, loss = step_fn(state, images, labels)
        results.append(float(loss))
    assert abs(results[0] - results[1]) < 1e-4, results


@pytest.mark.slow
def test_train_augment_matches_unsharded():
    """Augmentation inside the dp-sharded step (replicated rng, vmapped
    dynamic_slice crops over the sharded batch axis) must agree with the
    unsharded step exactly like the plain path does.

    slow: the exhaustive variant of test_train_matches_unsharded (its fast
    sibling); augmentation itself is covered by test_train.py."""
    import jax

    from wadt.parallel.mesh import make_mesh
    from wadt.parallel.train import make_train_step

    spec, _ = _spec_params()
    rng = np.random.RandomState(2)
    images = rng.randn(8, 32, 32, 3).astype(np.float32)
    labels = rng.randint(0, 2, (8, 2)).astype(np.int32)

    results = []
    for mesh in (None, make_mesh(8, axes=("data", "model"), shape=(4, 2))):
        init_fn, step_fn = make_train_step(
            "pmg", spec, mesh=mesh, augment={"translate": 2}, dropout_rate=0.0
        )
        state = init_fn(jax.random.PRNGKey(0))
        for _ in range(2):
            state, loss = step_fn(state, images, labels)
        results.append(float(loss))
    assert abs(results[0] - results[1]) < 1e-4, results


def test_orbax_roundtrip(tmp_path):
    import jax

    from wadt.engine import checkpoint

    spec, params = _spec_params()
    path = str(tmp_path / "ckpt")
    checkpoint.save_native(params, path)
    restored = checkpoint.load_native(path, like=params)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # inference equality
    x = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    la, _ = pmg.apply(params, x, spec)
    lb, _ = pmg.apply(restored, x, spec)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.slow
def test_graft_dryrun_contract():
    """slow: the driver executes dryrun_multichip(8) itself every round
    (MULTICHIP_r*.json); this in-suite copy is for pre-push checks."""
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)  # must not raise


def test_graft_entry_traces():
    """Default-run contract check: entry() traces to the right output shape
    (eval_shape — no XLA compile; the driver compile-checks entry() itself
    every round, and the slow sibling below executes it)."""
    import jax

    import __graft_entry__ as graft

    fn, (params, imgs) = graft.entry()
    out = jax.eval_shape(fn, params, imgs)
    assert out.shape == (imgs.shape[0], 12, 8)


@pytest.mark.slow
def test_graft_entry_compiles():
    """slow: the driver compile-checks entry() single-chip every round;
    fast sibling test_graft_entry_traces covers the trace contract."""
    import jax

    import __graft_entry__ as graft

    fn, (params, imgs) = graft.entry()
    out = jax.jit(fn)(params, imgs)
    assert out.shape == (imgs.shape[0], 12, 8)


@pytest.mark.slow
def test_train_step_sharded_bf16_mixed_precision():
    """bf16 compute under the dp x tp mesh: loss decreases, master params
    stay f32, task-axis sharding still applied (the single-chip
    mixed-precision parity itself is gated on the TPU checklist).

    slow: the bf16 x sharding cross-variant; fast siblings are
    test_train_step_dp_tp_loss_decreases (sharding) and
    test_train.py::test_mixed_precision_train_step (bf16 master-dtype)."""
    import jax
    import jax.numpy as jnp

    from wadt.parallel.mesh import make_mesh
    from wadt.parallel.train import make_train_step

    spec, _ = _spec_params()
    mesh = make_mesh(8, axes=("data", "model"), shape=(4, 2))
    init_fn, step_fn = make_train_step(
        "pmg", spec, mesh=mesh, compute_dtype=jnp.bfloat16)
    state = init_fn(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    images = rng.randn(16, 32, 32, 3).astype(np.float32)
    labels = rng.randint(0, 2, (16, 2)).astype(np.int32)
    losses = []
    for _ in range(8):
        state, loss = step_fn(state, images, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    # Master params must stay f32.  NOTE: bfloat16's numpy dtype kind is
    # 'V', so a kind=='f' filter would pass vacuously on a bf16 regression —
    # assert the inexact leaves are f32 AND none are bf16.
    leaves = jax.tree_util.tree_leaves(state.params)
    assert not any(l.dtype == jnp.bfloat16 for l in leaves)
    assert all(l.dtype == jnp.float32 for l in leaves
               if jnp.issubdtype(l.dtype, jnp.inexact))
    assert state.params["queries"].sharding.spec[0] == "model"
