"""Golden-logit parity: converted reference checkpoints must reproduce the
PyTorch reference's outputs (fixtures frozen by tools/make_fixtures.py).

This is the core correctness gate (SURVEY.md section 4: "golden-logit tests
against the published checkpoints"): it exercises the .pth converter, the
NCHW->NHWC layout transposes, every norm flavor, the packed-qkv split, the
replicate-pad patch-Gram path, and all three families' stacked task heads.
"""

import json
import os

import numpy as np
import pytest

from tests.conftest import FIXTURES

import wadt  # noqa: F401
from wadt.engine import checkpoint
from wadt.models import get_family

CASES = sorted(
    os.path.splitext(f)[0] for f in os.listdir(FIXTURES) if f.endswith(".json")
)

# f32 CPU torch vs f32 XLA: reassociation-level differences only.
ATOL, RTOL = 2e-4, 2e-4


def load_case(name):
    with open(os.path.join(FIXTURES, f"{name}.json")) as f:
        meta = json.load(f)
    data = np.load(os.path.join(FIXTURES, f"{name}.npz"))
    mod = get_family(meta["family"])
    spec = mod.build_spec(meta["tasks"], meta["hparams"])
    params = checkpoint.load_torch_checkpoint(
        meta["family"], os.path.join(FIXTURES, f"{name}.pth"), spec
    )
    return meta, data, mod, spec, params


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.mark.parametrize("name", CASES)
def test_logits_match_reference(name):
    meta, data, mod, spec, params = load_case(name)
    x = to_nhwc(data["input"])
    logits, _ = mod.apply(params, x, spec)
    logits = np.asarray(logits)
    for i, task in enumerate(spec.tasks.names):
        want = data[f"logits/{task}"]
        got = logits[:, i, : want.shape[1]]
        np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL, err_msg=f"{name}/{task}")


def test_pm_attention_and_embeddings_match():
    meta, data, mod, spec, params = load_case("pm_small")
    x = to_nhwc(data["input"])
    _, aux = mod.apply(params, x, spec, capture=("attn", "task_embeddings"))
    attn = np.asarray(aux["attn"])
    emb = np.asarray(aux["task_embeddings"])
    for i, task in enumerate(spec.tasks.names):
        np.testing.assert_allclose(
            attn[:, i], data[f"attn/{task}"][:, 0], atol=ATOL, rtol=RTOL
        )
        np.testing.assert_allclose(
            emb[:, i], data[f"task_emb/{task}"], atol=2e-3, rtol=2e-3
        )


def test_rtm_embeddings_match():
    meta, data, mod, spec, params = load_case("rtm_trunc5_attn")
    x = to_nhwc(data["input"])
    _, aux = mod.apply(params, x, spec, capture=("shared_embedding", "task_embeddings"))
    np.testing.assert_allclose(
        np.asarray(aux["shared_embedding"]), data["shared_embedding"], atol=ATOL, rtol=RTOL
    )
    emb = np.asarray(aux["task_embeddings"])
    for i, task in enumerate(spec.tasks.names):
        np.testing.assert_allclose(
            emb[:, i], data[f"task_emb/{task}"], atol=ATOL, rtol=RTOL
        )


def test_pmg_style_grams_match():
    """Unpadded-unfold style-gram extraction (style-transfer tap) parity."""
    meta, data, mod, spec, params = load_case("pmg_shipped")
    from wadt.ops.gram import style_patch_grams
    from wadt.models.pmg import trunk_features

    x = to_nhwc(data["input"])[0:1]
    feats = trunk_features(params, x, spec)
    grams = np.asarray(style_patch_grams(feats, spec.patch_div))[0]
    np.testing.assert_allclose(grams, data["style_grams"], atol=2e-3, rtol=2e-3)


def test_checkpoint_key_manifest_roundtrip():
    """Our converter consumes exactly the shipped PMG state-dict keys
    (golden manifest: Model_weights/PMG/hyperparameters_PMG.json:52-135)."""
    state = checkpoint.load_state_dict(os.path.join(FIXTURES, "pmg_shipped.pth"))
    expect_prefixes = (
        "feature_extractor.", "chan_proj.", "token_proj.",
        "transformer.encoder.layers.", "task_pool.query.", "classifiers.",
    )
    for k in state:
        assert k.startswith(expect_prefixes), f"unexpected key {k}"


@pytest.mark.parametrize(
    "name", ["pmg_tiny_instance_se", "pm_small", "rtm_trunc5_attn", "rtm_trunc6_gap"]
)
def test_gradcam_matches_reference(name):
    """Grad-CAM parity: fixtures freeze the torch reference's CAM (the
    pytorch_grad_cam algorithm hooked on the last top-level Conv2d — the
    last trunk conv for PM/PMG, the stem conv1 for RTM, see
    explain.gradcam_split); our split must reproduce it.  The fixture input
    is already normalized, so this drives the Explainer's core math directly
    rather than the uint8 wrapper."""
    import jax
    import jax.numpy as jnp

    from wadt.workloads.explain import gradcam_split

    meta, data, mod, spec, params = load_case(name)
    if "gradcam/cam" not in data:
        pytest.skip("no gradcam fixture for this case")
    x = to_nhwc(data["input"])
    ti = spec.tasks.names.index(str(data["gradcam/task"]))
    cls = jnp.asarray(data["gradcam/classes"].astype(np.int32))

    target_feats, head_from = gradcam_split(meta["family"], spec)
    feats = target_feats(params, jnp.asarray(x))

    def head_target(f):
        lg = head_from(params, f)
        return jnp.sum(jnp.take_along_axis(lg[:, ti, :], cls[:, None], axis=-1))

    grads = jax.grad(head_target)(feats)
    w = jnp.mean(grads, axis=(1, 2), keepdims=True)
    cam = jax.nn.relu(jnp.sum(feats * w, axis=-1))
    lo = jnp.min(cam, axis=(1, 2), keepdims=True)
    hi = jnp.max(cam, axis=(1, 2), keepdims=True)
    cam = np.asarray((cam - lo) / jnp.maximum(hi - lo, 1e-7))
    np.testing.assert_allclose(cam, data["gradcam/cam"], atol=5e-3, rtol=5e-3)
