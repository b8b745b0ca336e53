"""Edge cases: RTM remapping-loader key schemas (flat classifier, backbone.
prefix, partial-copy), and embedding-tap capture auto-upgrade."""

import numpy as np
import pytest

import wadt  # noqa: F401
from wadt.engine import checkpoint
from wadt.models import rtm


def _rtm_state(spec, flat_classifier=False, backbone_prefix=False,
               wrong_head_shape=False):
    """Synthesize a torch-style RTM state dict for a trunc-5 model."""
    rng = np.random.RandomState(0)
    s = {}
    c = spec.num_features

    def conv(name, ci, co, k):
        s[f"{name}.weight"] = rng.randn(co, ci, k, k).astype(np.float32) * 0.05

    def bn(name, ch):
        s[f"{name}.weight"] = np.ones(ch, np.float32)
        s[f"{name}.bias"] = np.zeros(ch, np.float32)
        s[f"{name}.running_mean"] = rng.randn(ch).astype(np.float32) * 0.1
        s[f"{name}.running_var"] = np.ones(ch, np.float32)

    conv("conv1", 3, 64, 7)
    bn("bn1", 64)
    inplanes = 64
    for bi in range(3):  # layer1: 3 bottlenecks, planes 64
        pre = f"layer1.{bi}"
        conv(f"{pre}.conv1", inplanes, 64, 1)
        bn(f"{pre}.bn1", 64)
        conv(f"{pre}.conv2", 64, 64, 3)
        bn(f"{pre}.bn2", 64)
        conv(f"{pre}.conv3", 64, 256, 1)
        bn(f"{pre}.bn3", 256)
        if bi == 0:
            conv(f"{pre}.downsample.0", inplanes, 256, 1)
            bn(f"{pre}.downsample.1", 256)
        inplanes = 256

    if backbone_prefix:
        s = {f"backbone.{k}": v for k, v in s.items()}
    else:
        # the reference's torch.save form: truncated_encoder.<seq>.
        seq = {"conv1": 0, "bn1": 1, "layer1": 4}
        s = {
            f"truncated_encoder.{seq[k.split('.')[0]]}.{k.split('.', 1)[1]}": v
            for k, v in s.items()
        }

    d = spec.token_dim
    for name in spec.tasks.names:
        key = name.replace(" ", "_")
        s[f"attentions.attention_{key}.q"] = rng.randn(1, 1, d).astype(np.float32)
        s[f"attentions.attention_{key}.proj.weight"] = rng.randn(d, c).astype(np.float32) * 0.05
        s[f"attentions.attention_{key}.out.weight"] = rng.randn(c, d).astype(np.float32) * 0.05
        k_t = spec.tasks.n_classes(name)
        if wrong_head_shape:
            k_t = k_t + 2  # trained with extra classes -> partial copy
        if flat_classifier:
            s[f"classifiers.classifier_{key}.weight"] = rng.randn(k_t, c).astype(np.float32) * 0.05
            s[f"classifiers.classifier_{key}.bias"] = np.zeros(k_t, np.float32)
        else:
            s[f"classifiers.classifier_{key}.0.weight"] = rng.randn(k_t, c).astype(np.float32) * 0.05
            s[f"classifiers.classifier_{key}.0.bias"] = np.zeros(k_t, np.float32)
    return s


TASKS = {"A": ["a0", "a1", "a2"], "B": ["b0", "b1"]}
HP = dict(truncate_layer=5, use_attention=True, attn_token_dim=16,
          cls_hidden_dims=(), cls_num_layers=0)


def test_rtm_truncated_encoder_and_backbone_prefixes_agree():
    spec = rtm.build_spec(TASKS, HP)
    p1 = checkpoint.convert_rtm(_rtm_state(spec), spec)
    p2 = checkpoint.convert_rtm(_rtm_state(spec, backbone_prefix=True), spec)
    x = np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32)
    la, _ = rtm.apply(p1, x, spec)
    lb, _ = rtm.apply(p2, x, spec)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_rtm_flat_classifier_keys():
    spec = rtm.build_spec(TASKS, HP)
    params = checkpoint.convert_rtm(_rtm_state(spec, flat_classifier=True), spec)
    x = np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32)
    logits, _ = rtm.apply(params, x, spec)
    assert np.isfinite(np.asarray(logits)).all()


def test_rtm_partial_copy_on_shape_mismatch():
    spec = rtm.build_spec(TASKS, HP)
    state = _rtm_state(spec, wrong_head_shape=True)
    params = checkpoint.convert_rtm(state, spec, partial_copy=True)
    # overlapping rows copied
    src = state["classifiers.classifier_A.0.weight"]  # [5, C]
    got = np.asarray(params["final"]["w"][0, :, :3])  # [C, 3]
    np.testing.assert_array_equal(got, src[:3].T)
    with pytest.raises(ValueError):
        checkpoint.convert_rtm(state, spec, partial_copy=False)


def test_embedding_capture_auto_upgrade():
    """compute_embeddings must work on an engine built WITHOUT aux capture
    (regression: CLI tsne for pm/rtm crashed with KeyError)."""
    import jax

    from wadt.data import BatchLoader, MultiTaskDataset
    from wadt.engine.executor import Engine
    from wadt.models import pm
    from wadt.workloads.embed import compute_embeddings

    import json
    import os

    from tools.make_synth_dataset import make as make_synth
    import tempfile

    synth = make_synth(tempfile.mkdtemp(), n_per_class=2, size=64)
    tasks = json.load(open(os.path.join(synth, "tasks.json")))
    spec = pm.build_spec(tasks, dict(ndf=8, patch_size=16))
    params = pm.init(jax.random.PRNGKey(0), spec)
    engine = Engine("pm", spec, params, batch_size=4)  # no capture
    ds = MultiTaskDataset(os.path.join(synth, "dataset.json"),
                          os.path.join(synth, "tasks.json"))
    embs, labs, paths = compute_embeddings(
        engine, BatchLoader(ds, batch_size=4, num_workers=2), kind="task"
    )
    assert embs["Weather Type"].shape[0] == 8


def test_nonstrict_conversion_fills_missing_keys(capsys):
    """strict=False: missing tensors come from fresh init + a key report
    (reference fallback, utils/PMG/PMG_model_utils.py:186-196)."""
    import jax
    import numpy as np

    from wadt.models import pmg

    hp = dict(ndf=8, patch_size=16, patch_div=2, gram_channels=16, d_model=32,
              transformer_layers=1, transformer_heads=2, norm="batch")
    spec = pmg.build_spec(TASKS, hp)
    full = checkpoint.export_state_dict("pmg", pmg.init(jax.random.PRNGKey(5), spec), spec)
    partial = {k: v for k, v in full.items() if not k.startswith("token_proj")}
    partial["some.unknown.key"] = np.zeros(3, np.float32)
    with pytest.raises(KeyError):
        checkpoint.convert("pmg", partial, spec, strict=True)
    params = checkpoint.convert("pmg", partial, spec, strict=False)
    out = capsys.readouterr().out
    assert "Missing keys" in out and "Unexpected keys" in out
    x = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    logits, _ = pmg.apply(params, x, spec)
    assert np.isfinite(np.asarray(logits)).all()
    # loaded tensors preserved exactly
    np.testing.assert_array_equal(
        np.asarray(params["queries"][0]), full[f"task_pool.query.{spec.tasks.names[0]}"]
    )


def test_nonstrict_rtm_canonicalizes_backbone_aliases(capsys):
    """strict=False must see through the three accepted RTM backbone key
    forms (truncated_encoder.<seq> / backbone.<root> / raw <root>) instead of
    re-initializing every aliased backbone tensor as 'unexpected'."""
    import jax

    hp = dict(truncate_layer=5, use_attention=True, attn_token_dim=8)
    spec = rtm.build_spec(TASKS, hp)
    full = checkpoint.export_state_dict("rtm", rtm.init(jax.random.PRNGKey(7), spec), spec)

    for form in ("backbone", "raw"):
        aliased = {}
        for k, v in full.items():
            if k.startswith("truncated_encoder."):
                seq, _, tail = k[len("truncated_encoder."):].partition(".")
                root = checkpoint._SEQ_TO_NAME[int(seq)]
                aliased[
                    f"backbone.{root}.{tail}" if form == "backbone" else f"{root}.{tail}"
                ] = v
            else:
                aliased[k] = v
        # drop one head tensor so the non-strict path actually triggers
        aliased.pop(f"attentions.attention_{spec.tasks.names[0]}.q")
        params = checkpoint.convert("rtm", aliased, spec, strict=False)
        out = capsys.readouterr().out
        assert "truncated_encoder" not in out.split("Unexpected keys")[-1], (form, out)
        np.testing.assert_array_equal(
            np.asarray(checkpoint.export_state_dict("rtm", params, spec)[
                "truncated_encoder.0.weight"
            ]),
            full["truncated_encoder.0.weight"],
            err_msg=f"backbone weights lost through alias form {form!r}",
        )


def test_nonstrict_shape_mismatch_errors():
    """A present tensor with the wrong shape must raise, not be merged
    (torch load_state_dict(strict=False) semantics)."""
    import jax

    hp = dict(truncate_layer=5, use_attention=False)
    spec = rtm.build_spec(TASKS, hp)
    full = checkpoint.export_state_dict("rtm", rtm.init(jax.random.PRNGKey(8), spec), spec)
    bad = dict(full)
    bad["truncated_encoder.0.weight"] = np.zeros((8, 3, 7, 7), np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        checkpoint.convert("rtm", bad, spec, strict=False)
