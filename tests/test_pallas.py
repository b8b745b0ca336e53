"""Pallas kernels vs their jnp reference implementations (interpret mode on
the CPU backend; the TPU-compiled path is exercised by bench_kernels.py)."""

import numpy as np
import pytest

import wadt  # noqa: F401


def test_gram_kernel_matches_reference():
    import jax.numpy as jnp

    from wadt.ops.gram import patch_gram_tokens
    from wadt.ops.pallas_kernels import patch_gram_tokens_pallas

    rng = np.random.RandomState(0)
    for (h, w, c, div) in [(14, 14, 96, 3), (8, 8, 32, 4), (7, 5, 16, 2)]:
        x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
        want = np.asarray(patch_gram_tokens(x, div))
        got = np.asarray(patch_gram_tokens_pallas(x, div, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5, err_msg=str((h, w, c, div)))


def test_fused_stem_matches_reference():
    import jax.numpy as jnp

    from wadt.config import IMAGENET_MEAN, IMAGENET_STD
    from wadt.ops.nn import conv2d, leaky_relu
    from wadt.ops.norms import batch_norm_infer
    from wadt.ops.pallas_kernels import fused_stem
    from wadt.ops.preprocess import normalize_uint8

    rng = np.random.RandomState(1)
    b, h, k, cout = 2, 32, 4, 16
    imgs = rng.randint(0, 256, (b, h, h, 3), np.uint8)
    conv_w = jnp.asarray(rng.randn(k, k, 3, cout).astype(np.float32) * 0.1)
    bn = {
        "scale": jnp.asarray(rng.rand(cout).astype(np.float32) + 0.5),
        "bias": jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1),
        "mean": jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1),
        "var": jnp.asarray(rng.rand(cout).astype(np.float32) + 0.5),
    }
    # reference path: normalize -> conv -> bn(infer) -> lrelu
    x = normalize_uint8(jnp.asarray(imgs))
    want = leaky_relu(batch_norm_infer(conv2d(x, {"w": conv_w}, stride=k), bn), 0.2)

    inv = bn["scale"] / jnp.sqrt(bn["var"] + 1e-5)
    scale, shift = inv, bn["bias"] - bn["mean"] * inv
    got = fused_stem(
        jnp.asarray(imgs), conv_w, scale, shift,
        IMAGENET_MEAN, IMAGENET_STD, stride=k, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)


def test_kernel_select_dispatch(monkeypatch):
    """patch_gram_tokens routes through the measured-selection registry:
    default XLA, pallas when the record says so."""
    import jax.numpy as jnp

    from wadt.ops import gram, kernel_select

    x = jnp.asarray(np.random.RandomState(0).randn(1, 6, 6, 4), jnp.float32)
    monkeypatch.setattr(kernel_select, "winner", lambda op, default="xla": "xla")
    want = np.asarray(gram.patch_gram_tokens(x, 2))

    called = {}

    def fake_pallas(z, div):
        called["yes"] = True
        return gram.patch_gram_tokens.__wrapped__(z, div) if hasattr(
            gram.patch_gram_tokens, "__wrapped__") else want

    monkeypatch.setattr(kernel_select, "winner", lambda op, default="xla": "pallas")
    import wadt.ops.pallas_kernels as pk

    monkeypatch.setattr(pk, "patch_gram_tokens_pallas", fake_pallas)
    got = np.asarray(gram.patch_gram_tokens(x, 2))
    assert called.get("yes"), "pallas route not taken despite recorded win"
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_kernel_select_registry(tmp_path, monkeypatch):
    """record() round-trips through the JSON table winner() reads."""
    from wadt.ops import kernel_select as ks

    monkeypatch.setattr(ks, "RECORD_PATH", str(tmp_path / "ab.json"))
    ks._table.cache_clear()
    assert ks.winner("patch_gram_tokens") == "xla"  # default with no record
    ks.record("patch_gram_tokens", "pallas", {"xla": 10.0, "pallas": 5.0},
              "test", backend=ks.backend_kind())
    assert ks.winner("patch_gram_tokens") == "pallas"
    # the winner must be one of the measured variants
    with pytest.raises(ValueError):
        ks.record("patch_gram_tokens", "nope", {"xla": 1.0}, "test",
                  backend=ks.backend_kind())
    ks._table.cache_clear()


def test_fused_trunk_gram_matches_model():
    """The fused trunk+gram kernel (interpret mode) must reproduce the
    model's patch-Gram tokens from K-packed uint8 input, to folded-bf16
    weight precision."""
    import jax
    import jax.numpy as jnp

    from wadt.models import pmg
    from wadt.ops.nn import conv2d
    from wadt.ops.gram import patch_gram_tokens
    from wadt.ops.pallas_kernels import (
        fold_trunk_gram_weights, fused_trunk_gram, supports_fused_trunk_gram,
    )
    from wadt.ops.preprocess import normalize_uint8, s2d_pack_uint8

    spec = pmg.build_spec(
        {"A": ["a0", "a1"], "B": ["b0", "b1", "b2"]},
        dict(ndf=8, patch_size=64, patch_div=3, gram_channels=16, d_model=32,
             transformer_layers=1, transformer_heads=2, norm="batch"),
    )
    assert supports_fused_trunk_gram(spec)  # 3-block plan (k4s4 x2 + 1x1)
    params = pmg.init(jax.random.PRNGKey(3), spec)
    K = spec.plan[0].kernel * spec.plan[1].kernel
    u8 = np.random.RandomState(0).randint(0, 256, (2, 64, 64, 3), np.uint8)

    feats = pmg.trunk_features(params, normalize_uint8(jnp.asarray(u8)), spec)
    z = conv2d(feats, params["chan_proj"])
    want = np.asarray(patch_gram_tokens(z, spec.patch_div))

    folded = fold_trunk_gram_weights(params, spec)
    got = np.asarray(fused_trunk_gram(
        jnp.asarray(s2d_pack_uint8(u8, K)), folded, spec, interpret=True
    ))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


def test_stream_trunk_kernel_selection(monkeypatch):
    """StreamPredictor('auto') routes to the fused kernel only when the
    measured record says pallas wins; 'packed' forces the GEMM-stem path."""
    import jax

    from wadt.models import pmg
    from wadt.ops import kernel_select
    from wadt.workloads import stream

    spec = pmg.build_spec(
        {"A": ["a0", "a1"]},
        dict(ndf=8, patch_size=64, patch_div=2, gram_channels=16, d_model=32,
             transformer_layers=0, transformer_heads=2, norm="batch"),
    )
    params = pmg.init(jax.random.PRNGKey(0), spec)
    monkeypatch.setattr(kernel_select, "winner", lambda op, default="xla": "xla")
    pred = stream.StreamPredictor("pmg", spec, params)
    assert not pred._fused and pred._pack_k == spec.plan[0].kernel
    monkeypatch.setattr(kernel_select, "winner", lambda op, default="xla": "pallas")
    pred2 = stream.StreamPredictor("pmg", spec, params)
    assert pred2._fused and pred2._pack_k == spec.plan[0].kernel * spec.plan[1].kernel
    pred3 = stream.StreamPredictor("pmg", spec, params, trunk_kernel="packed")
    assert not pred3._fused
