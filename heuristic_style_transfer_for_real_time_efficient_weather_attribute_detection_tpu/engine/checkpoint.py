"""Checkpoint compatibility layer: PyTorch ``.pth`` -> JAX param pytrees.

Implements the semantics of the reference's three loaders (SURVEY.md 2.2):

- strict load with container unwrapping ``{'model'|'state_dict'}`` and
  DataParallel ``module.`` stripping (Models/models_PM.py:213-230),
- sidecar hparams discovery lives in ``config.find_sidecar_hparams``,
- architecture introspection: ``checkpoint_has_se`` probe
  (Models/models_PM.py:233-237),
- RTM remapping: ``backbone.`` / ``truncated_encoder.`` sequential-index /
  raw-ResNet-root key forms all accepted (Functions/RTM_evaluation.py:545-664),
  with optional partial-copy of overlapping slices on shape mismatch
  (:643-648),
- the ``pretrained_load_report`` key manifest
  (Model_weights/PMG/hyperparameters_PMG.json:52-135) is the golden fixture
  for the PMG mapping (tests/test_parity.py::test_checkpoint_key_manifest_roundtrip).

Layout transforms (torch -> ours): conv OIHW -> HWIO, Linear [out,in] ->
[in,out], packed transformer ``in_proj`` split into q/k/v, per-task modules
stacked on a leading task axis with Kmax zero-padding.

Native checkpoints (pytree save/restore) go through Orbax — see
``save_native`` / ``load_native``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..models import pm as pm_mod
from ..models import pmg as pmg_mod
from ..models import resnet as resnet_mod
from ..models import rtm as rtm_mod

Array = np.ndarray
StateDict = Dict[str, Array]


# ---------------------------------------------------------------------------
# Raw state-dict loading
# ---------------------------------------------------------------------------


def load_state_dict(path: str) -> StateDict:
    """Load a ``.pth`` (torch pickle) or ``.npz`` of named arrays -> numpy.

    Unwraps ``{'model': ...}`` / ``{'state_dict': ...}`` containers and strips
    ``module.`` (DataParallel) prefixes, like the reference loaders.
    """
    if path.endswith(".npz"):
        with np.load(path) as z:
            raw = {k: z[k] for k in z.files}
    else:
        import torch  # CPU-only torch is only needed for .pth ingestion

        obj = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(obj, dict) and not all(hasattr(v, "numpy") for v in obj.values()):
            obj = obj.get("model", obj.get("state_dict", obj))
        raw = {
            k: v.detach().cpu().numpy()
            for k, v in obj.items()
            if hasattr(v, "detach")
        }
    return {k[7:] if k.startswith("module.") else k: v for k, v in raw.items()}


def checkpoint_has_se(state: StateDict) -> bool:
    """PM SE-probe: scan keys for ``.se.mlp.`` (Models/models_PM.py:233-237)."""
    return any(".se.mlp." in k for k in state)


# ---------------------------------------------------------------------------
# Primitive converters
# ---------------------------------------------------------------------------


def _conv(w: Array, b: Optional[Array] = None) -> Dict[str, jnp.ndarray]:
    p = {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}  # OIHW -> HWIO
    if b is not None:
        p["b"] = jnp.asarray(b)
    return p


def _linear(w: Array, b: Optional[Array] = None) -> Dict[str, jnp.ndarray]:
    p = {"w": jnp.asarray(w.T)}
    if b is not None:
        p["b"] = jnp.asarray(b)
    return p


def _norm(state: StateDict, prefix: str, kind: str) -> Dict[str, jnp.ndarray]:
    p = {
        "scale": jnp.asarray(state[f"{prefix}.weight"]),
        "bias": jnp.asarray(state[f"{prefix}.bias"]),
    }
    if kind == "batch":
        p["mean"] = jnp.asarray(state[f"{prefix}.running_mean"])
        p["var"] = jnp.asarray(state[f"{prefix}.running_var"])
    return p


def _stack_padded(
    ws: List[Array], bs: List[Optional[Array]], kmax: int
) -> Dict[str, jnp.ndarray]:
    """Per-task Linear [K_t, D] torch weights -> {"w": [T,D,Kmax], "b": [T,Kmax]}."""
    nt, d = len(ws), ws[0].shape[1]
    w = np.zeros((nt, d, kmax), np.float32)
    b = np.zeros((nt, kmax), np.float32)
    for i, (wi, bi) in enumerate(zip(ws, bs)):
        if wi.shape[0] > kmax:
            raise ValueError(
                f"checkpoint head #{i} has {wi.shape[0]} classes but the "
                f"task registry's widest task has {kmax} — the registry "
                f"(CLI: --build_classifier) does not match the one this "
                f"checkpoint was trained with"
            )
        w[i, :, : wi.shape[0]] = wi.T
        if bi is not None:
            b[i, : bi.shape[0]] = bi
    return {"w": jnp.asarray(w), "b": jnp.asarray(b)}


# ---------------------------------------------------------------------------
# PMG
# ---------------------------------------------------------------------------


def convert_pmg(state: StateDict, spec: pmg_mod.Spec) -> Dict[str, Any]:
    """Map a ``MultiTaskPatchGANGramModelNonOverlapV2`` state dict.

    Key schema per the shipped manifest
    (Model_weights/PMG/hyperparameters_PMG.json:52-135).
    """
    t = spec.tasks
    params: Dict[str, Any] = {"trunk": []}
    for i in range(len(spec.plan)):
        ci, ni = 3 * i, 3 * i + 1  # Sequential indices: conv, norm, LeakyReLU
        params["trunk"].append(
            {
                "conv": _conv(state[f"feature_extractor.{ci}.weight"]),
                "norm": _norm(state, f"feature_extractor.{ni}", spec.norm),
            }
        )
    if spec.use_channel_attention:
        # SEBlock.fc = Sequential(Linear, ReLU, Linear, Sigmoid), bias-free
        # (models_PMG.py:19-24).
        params["se"] = {
            "fc1": _linear(state["se.fc.0.weight"]),
            "fc2": _linear(state["se.fc.2.weight"]),
        }
    params["chan_proj"] = _conv(state["chan_proj.weight"])
    params["token_proj"] = _linear(
        state["token_proj.weight"], state["token_proj.bias"]
    )
    if spec.has_transformer:
        d = spec.d_model
        layers = []
        for li in range(spec.transformer_layers):
            pre = f"transformer.encoder.layers.{li}"
            inw = state[f"{pre}.self_attn.in_proj_weight"]  # [3D, D]
            inb = state[f"{pre}.self_attn.in_proj_bias"]  # [3D]
            layers.append(
                {
                    "attn": {
                        "wq": jnp.asarray(inw[:d].T),
                        "wk": jnp.asarray(inw[d : 2 * d].T),
                        "wv": jnp.asarray(inw[2 * d :].T),
                        "bq": jnp.asarray(inb[:d]),
                        "bk": jnp.asarray(inb[d : 2 * d]),
                        "bv": jnp.asarray(inb[2 * d :]),
                        "wo": jnp.asarray(state[f"{pre}.self_attn.out_proj.weight"].T),
                        "bo": jnp.asarray(state[f"{pre}.self_attn.out_proj.bias"]),
                    },
                    "norm1": {
                        "scale": jnp.asarray(state[f"{pre}.norm1.weight"]),
                        "bias": jnp.asarray(state[f"{pre}.norm1.bias"]),
                    },
                    "norm2": {
                        "scale": jnp.asarray(state[f"{pre}.norm2.weight"]),
                        "bias": jnp.asarray(state[f"{pre}.norm2.bias"]),
                    },
                    "ffn1": _linear(
                        state[f"{pre}.linear1.weight"], state[f"{pre}.linear1.bias"]
                    ),
                    "ffn2": _linear(
                        state[f"{pre}.linear2.weight"], state[f"{pre}.linear2.bias"]
                    ),
                }
            )
        params["transformer"] = layers
    params["queries"] = jnp.stack(
        [jnp.asarray(state[f"task_pool.query.{name}"]) for name in t.names]
    )
    params["heads"] = _stack_padded(
        [state[f"classifiers.{n}.weight"] for n in t.names],
        [state[f"classifiers.{n}.bias"] for n in t.names],
        t.max_classes,
    )
    return params


# ---------------------------------------------------------------------------
# PM
# ---------------------------------------------------------------------------


def convert_pm(state: StateDict, spec: pm_mod.Spec) -> Dict[str, Any]:
    """Map a ``MultiTaskPatchGAN`` state dict (models_PM.py:79-150)."""
    t = spec.tasks
    nt, kmax, c = len(t), t.max_classes, spec.trunk_channels
    params: Dict[str, Any] = {"trunk": []}
    for i in range(len(spec.plan)):
        ci, ni = 3 * i, 3 * i + 1
        params["trunk"].append(
            {
                "conv": _conv(
                    state[f"trunk.{ci}.weight"], state.get(f"trunk.{ci}.bias")
                ),
                "norm": _norm(state, f"trunk.{ni}", spec.norm),
            }
        )
    hid = max(c // 16, 1)
    heads = {
        "se1_w": np.zeros((nt, c, hid), np.float32),
        "se1_b": np.zeros((nt, hid), np.float32),
        "se2_w": np.zeros((nt, hid, c), np.float32),
        "se2_b": np.zeros((nt, c), np.float32),
        "attn_w": np.zeros((nt, c), np.float32),
        "attn_b": np.zeros((nt,), np.float32),
        "cls_w": np.zeros((nt, c, kmax), np.float32),
    }
    for i, name in enumerate(t.names):
        pre = f"task_heads.{name}"
        if spec.attn_use_se and f"{pre}.se.mlp.0.weight" in state:
            heads["se1_w"][i] = state[f"{pre}.se.mlp.0.weight"].T
            heads["se1_b"][i] = state[f"{pre}.se.mlp.0.bias"]
            heads["se2_w"][i] = state[f"{pre}.se.mlp.2.weight"].T
            heads["se2_b"][i] = state[f"{pre}.se.mlp.2.bias"]
        heads["attn_w"][i] = state[f"{pre}.attn_conv.weight"][0, :, 0, 0]
        heads["attn_b"][i] = state[f"{pre}.attn_conv.bias"][0]
        kw = state[f"{pre}.cls_conv.weight"][:, :, 0, 0]  # [K, C]
        heads["cls_w"][i, :, : kw.shape[0]] = kw.T
    params["heads"] = {k: jnp.asarray(v) for k, v in heads.items()}
    return params


# ---------------------------------------------------------------------------
# RTM
# ---------------------------------------------------------------------------

# torchvision children order inside the truncated Sequential
# (Functions/RTM_evaluation.py root-name map {conv1:0, bn1:1, ..., layer4:7}).
_SEQ_TO_NAME = {0: "conv1", 1: "bn1", 4: "layer1", 5: "layer2", 6: "layer3", 7: "layer4"}
_NAME_TO_SEQ = {v: k for k, v in _SEQ_TO_NAME.items()}


def _canon_backbone_keys(state: StateDict) -> StateDict:
    """Normalize all accepted RTM backbone key forms to raw ResNet root names.

    Accepts: ``truncated_encoder.<seq>.rest`` / ``backbone.<root>.rest`` /
    raw ``<root>.rest`` (Functions/RTM_evaluation.py:545-620).
    """
    out: StateDict = {}
    for k, v in state.items():
        if k.startswith("truncated_encoder."):
            rest = k[len("truncated_encoder.") :]
            seq, _, tail = rest.partition(".")
            name = _SEQ_TO_NAME.get(int(seq)) if seq.isdigit() else None
            if name is not None:
                out[f"{name}.{tail}"] = v
        elif k.startswith("backbone."):
            out[k[len("backbone.") :]] = v
        else:
            root = k.split(".")[0]
            if root in _NAME_TO_SEQ:
                out[k] = v
    return out


def convert_resnet(state: StateDict) -> Dict[str, Any]:
    """Raw torchvision-ResNet-50-named state dict -> backbone pytree.

    Truncated checkpoints (truncate_after_layer < 8) simply lack later
    stages; the pytree omits them (``apply_truncated`` never touches them).
    """
    params: Dict[str, Any] = {
        "conv1": _conv(state["conv1.weight"]),
        "bn1": _norm(state, "bn1", "batch"),
    }
    for si, (nblocks, _) in enumerate(resnet_mod.STAGES):
        if f"layer{si + 1}.0.conv1.weight" not in state:
            break
        blocks = []
        for bi in range(nblocks):
            pre = f"layer{si + 1}.{bi}"
            block = {}
            for ci in (1, 2, 3):
                block[f"conv{ci}"] = _conv(state[f"{pre}.conv{ci}.weight"])
                block[f"bn{ci}"] = _norm(state, f"{pre}.bn{ci}", "batch")
            if f"{pre}.downsample.0.weight" in state:
                block["downsample"] = {
                    "conv": _conv(state[f"{pre}.downsample.0.weight"]),
                    "bn": _norm(state, f"{pre}.downsample.1", "batch"),
                }
            blocks.append(block)
        params[f"layer{si + 1}"] = blocks
    return params


def convert_rtm(
    state: StateDict, spec: rtm_mod.Spec, partial_copy: bool = True
) -> Dict[str, Any]:
    """Map a ``MultiHeadAttentionPerTaskModel`` state dict.

    ``partial_copy=True`` reproduces the reference's overlapping-slice copy
    for shape-mismatched classifier tensors (Functions/RTM_evaluation.py:643-648):
    the overlapping region is copied, the remainder keeps fresh zeros.
    """
    t = spec.tasks
    nt, kmax = len(t), t.max_classes
    params: Dict[str, Any] = {
        "backbone": convert_resnet(_canon_backbone_keys(state))
    }
    c, d = spec.num_features, spec.token_dim
    if spec.use_attention:
        proj_w = np.zeros((nt, c, d), np.float32)
        out_w = np.zeros((nt, d, c), np.float32)
        qs = np.zeros((nt, d), np.float32)
        for i, name in enumerate(t.names):
            pre = f"attentions.attention_{name.replace(' ', '_')}"
            proj_w[i] = state[f"{pre}.proj.weight"].T
            out_w[i] = state[f"{pre}.out.weight"].T
            qs[i] = state[f"{pre}.q"].reshape(-1)
        params["attn"] = {
            "proj_w": jnp.asarray(proj_w),
            "q": jnp.asarray(qs),
            "out_w": jnp.asarray(out_w),
        }
    # Classifier Sequential: [Linear, ReLU] * n_hidden + final Linear, so
    # Linear modules sit at even indices 0, 2, ..., 2*n_hidden.
    dims = spec.mlp_dims
    n_hidden = len(dims) - 1
    mlp: List[Dict[str, jnp.ndarray]] = []
    for li in range(n_hidden):
        w = np.zeros((nt, dims[li], dims[li + 1]), np.float32)
        b = np.zeros((nt, dims[li + 1]), np.float32)
        for i, name in enumerate(t.names):
            pre = f"classifiers.classifier_{name.replace(' ', '_')}.{2 * li}"
            w[i] = state[f"{pre}.weight"].T
            b[i] = state[f"{pre}.bias"]
        mlp.append({"w": jnp.asarray(w), "b": jnp.asarray(b)})
    fw = np.zeros((nt, dims[-1], kmax), np.float32)
    fb = np.zeros((nt, kmax), np.float32)
    for i, name in enumerate(t.names):
        key = f"classifiers.classifier_{name.replace(' ', '_')}.{2 * n_hidden}"
        if f"{key}.weight" not in state:
            # Flat-key remap: a bare Linear saved as ``classifier_<task>.weight``
            # (Functions/RTM_evaluation.py:600-640 flat-classifier handling).
            key = f"classifiers.classifier_{name.replace(' ', '_')}"
        wsrc, bsrc = state[f"{key}.weight"], state[f"{key}.bias"]
        k_t, d_in = t.num_classes[i], dims[-1]
        if wsrc.shape != (k_t, d_in):
            if not partial_copy:
                raise ValueError(
                    f"shape mismatch for {key}.weight: {wsrc.shape} vs {(k_t, d_in)}"
                )
            rows, cols = min(k_t, wsrc.shape[0]), min(d_in, wsrc.shape[1])
            fw[i, :cols, :rows] = wsrc[:rows, :cols].T
            fb[i, : min(k_t, bsrc.shape[0])] = bsrc[: min(k_t, bsrc.shape[0])]
        else:
            fw[i, :, :k_t] = wsrc.T
            fb[i, :k_t] = bsrc
    params["mlp"] = mlp
    params["final"] = {"w": jnp.asarray(fw), "b": jnp.asarray(fb)}
    return params


# ---------------------------------------------------------------------------
# Reverse conversion: pytree -> torch-format state dict (interop/export)
# ---------------------------------------------------------------------------


def _np(x) -> Array:
    return np.asarray(x, dtype=np.float32)


def _export_conv(p) -> Array:
    return np.transpose(_np(p["w"]), (3, 2, 0, 1))  # HWIO -> OIHW


def _export_norm(out: StateDict, prefix: str, p, kind: str) -> None:
    out[f"{prefix}.weight"] = _np(p["scale"])
    out[f"{prefix}.bias"] = _np(p["bias"])
    if kind == "batch":
        out[f"{prefix}.running_mean"] = _np(p["mean"])
        out[f"{prefix}.running_var"] = _np(p["var"])
        out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def export_pmg(params, spec: pmg_mod.Spec) -> StateDict:
    """Inverse of convert_pmg — produces the reference's exact key schema so
    exported checkpoints load into the PyTorch reference unmodified."""
    t = spec.tasks
    out: StateDict = {}
    for i, lp in enumerate(params["trunk"]):
        out[f"feature_extractor.{3 * i}.weight"] = _export_conv(lp["conv"])
        _export_norm(out, f"feature_extractor.{3 * i + 1}", lp["norm"], spec.norm)
    if spec.use_channel_attention and "se" in params:
        out["se.fc.0.weight"] = _np(params["se"]["fc1"]["w"]).T
        out["se.fc.2.weight"] = _np(params["se"]["fc2"]["w"]).T
    out["chan_proj.weight"] = _export_conv(params["chan_proj"])
    out["token_proj.weight"] = _np(params["token_proj"]["w"]).T
    out["token_proj.bias"] = _np(params["token_proj"]["b"])
    if spec.has_transformer:
        for li, lp in enumerate(params["transformer"]):
            pre = f"transformer.encoder.layers.{li}"
            a = lp["attn"]
            out[f"{pre}.self_attn.in_proj_weight"] = np.concatenate(
                [_np(a["wq"]).T, _np(a["wk"]).T, _np(a["wv"]).T], axis=0
            )
            out[f"{pre}.self_attn.in_proj_bias"] = np.concatenate(
                [_np(a["bq"]), _np(a["bk"]), _np(a["bv"])]
            )
            out[f"{pre}.self_attn.out_proj.weight"] = _np(a["wo"]).T
            out[f"{pre}.self_attn.out_proj.bias"] = _np(a["bo"])
            out[f"{pre}.norm1.weight"] = _np(lp["norm1"]["scale"])
            out[f"{pre}.norm1.bias"] = _np(lp["norm1"]["bias"])
            out[f"{pre}.norm2.weight"] = _np(lp["norm2"]["scale"])
            out[f"{pre}.norm2.bias"] = _np(lp["norm2"]["bias"])
            out[f"{pre}.linear1.weight"] = _np(lp["ffn1"]["w"]).T
            out[f"{pre}.linear1.bias"] = _np(lp["ffn1"]["b"])
            out[f"{pre}.linear2.weight"] = _np(lp["ffn2"]["w"]).T
            out[f"{pre}.linear2.bias"] = _np(lp["ffn2"]["b"])
    q = _np(params["queries"])
    hw, hb = _np(params["heads"]["w"]), _np(params["heads"]["b"])
    for i, name in enumerate(t.names):
        k = t.num_classes[i]
        out[f"task_pool.query.{name}"] = q[i]
        out[f"classifiers.{name}.weight"] = hw[i, :, :k].T
        out[f"classifiers.{name}.bias"] = hb[i, :k]
    return out


def export_pm(params, spec: pm_mod.Spec) -> StateDict:
    t = spec.tasks
    out: StateDict = {}
    for i, lp in enumerate(params["trunk"]):
        out[f"trunk.{3 * i}.weight"] = _export_conv(lp["conv"])
        if "b" in lp["conv"]:
            out[f"trunk.{3 * i}.bias"] = _np(lp["conv"]["b"])
        _export_norm(out, f"trunk.{3 * i + 1}", lp["norm"], spec.norm)
    hp = params["heads"]
    for i, name in enumerate(t.names):
        pre = f"task_heads.{name}"
        k = t.num_classes[i]
        if spec.attn_use_se:
            out[f"{pre}.se.mlp.0.weight"] = _np(hp["se1_w"][i]).T
            out[f"{pre}.se.mlp.0.bias"] = _np(hp["se1_b"][i])
            out[f"{pre}.se.mlp.2.weight"] = _np(hp["se2_w"][i]).T
            out[f"{pre}.se.mlp.2.bias"] = _np(hp["se2_b"][i])
        out[f"{pre}.attn_conv.weight"] = _np(hp["attn_w"][i])[None, :, None, None]
        out[f"{pre}.attn_conv.bias"] = _np(hp["attn_b"][i])[None]
        out[f"{pre}.cls_conv.weight"] = _np(hp["cls_w"][i, :, :k]).T[:, :, None, None]
    return out


def export_rtm(params, spec: rtm_mod.Spec) -> StateDict:
    """Exports with the model's own ``truncated_encoder.<seq>`` naming (what
    ``torch.save(model.state_dict())`` produces for the reference)."""
    t = spec.tasks
    out: StateDict = {}
    bb = params["backbone"]
    raw: StateDict = {}
    raw["conv1.weight"] = _export_conv(bb["conv1"])
    _export_norm(raw, "bn1", bb["bn1"], "batch")
    for si in range(len(resnet_mod.STAGES)):
        name = f"layer{si + 1}"
        if name not in bb:
            continue
        for bi, bp in enumerate(bb[name]):
            pre = f"{name}.{bi}"
            for ci in (1, 2, 3):
                raw[f"{pre}.conv{ci}.weight"] = _export_conv(bp[f"conv{ci}"])
                _export_norm(raw, f"{pre}.bn{ci}", bp[f"bn{ci}"], "batch")
            if "downsample" in bp:
                raw[f"{pre}.downsample.0.weight"] = _export_conv(bp["downsample"]["conv"])
                _export_norm(raw, f"{pre}.downsample.1", bp["downsample"]["bn"], "batch")
    for k, v in raw.items():
        root, _, tail = k.partition(".")
        out[f"truncated_encoder.{_NAME_TO_SEQ[root]}.{tail}"] = v
    if spec.use_attention and "attn" in params:
        a = params["attn"]
        for i, name in enumerate(t.names):
            pre = f"attentions.attention_{name.replace(' ', '_')}"
            out[f"{pre}.q"] = _np(a["q"][i])[None, None, :]
            out[f"{pre}.proj.weight"] = _np(a["proj_w"][i]).T
            out[f"{pre}.out.weight"] = _np(a["out_w"][i]).T
    dims = spec.mlp_dims
    for i, name in enumerate(t.names):
        pre = f"classifiers.classifier_{name.replace(' ', '_')}"
        for li, lp in enumerate(params["mlp"]):
            out[f"{pre}.{2 * li}.weight"] = _np(lp["w"][i]).T
            out[f"{pre}.{2 * li}.bias"] = _np(lp["b"][i])
        k = t.num_classes[i]
        fin = params["final"]
        out[f"{pre}.{2 * (len(dims) - 1)}.weight"] = _np(fin["w"][i, :, :k]).T
        out[f"{pre}.{2 * (len(dims) - 1)}.bias"] = _np(fin["b"][i, :k])
    return out


_EXPORTERS = {"pmg": export_pmg, "pm": export_pm, "rtm": export_rtm}


def export_state_dict(family: str, params, spec) -> StateDict:
    return _EXPORTERS[family.lower()](params, spec)


def save_torch_checkpoint(family: str, params, spec, path: str) -> None:
    """Export a pytree as a reference-loadable ``.pth`` (or ``.npz``)."""
    state = export_state_dict(family, params, spec)
    if path.endswith(".npz"):
        np.savez(path, **state)
    else:
        import torch

        torch.save(
            {k: torch.from_numpy(np.ascontiguousarray(v).copy()) for k, v in state.items()},
            path,
        )


# ---------------------------------------------------------------------------
# Family dispatch + native (Orbax) checkpoints
# ---------------------------------------------------------------------------

_CONVERTERS = {"pmg": convert_pmg, "pm": convert_pm, "rtm": convert_rtm}


def _canon_state_keys(family: str, state: StateDict) -> StateDict:
    """Normalize accepted key aliases to the export manifest's naming.

    RTM checkpoints arrive in three backbone forms (``truncated_encoder.<seq>``
    / ``backbone.<root>`` / raw ``<root>``, Functions/RTM_evaluation.py:545-620)
    while the export manifest uses ``truncated_encoder.<seq>``; without this
    the non-strict missing/unexpected comparison would classify every aliased
    backbone tensor as unexpected and silently re-initialize it.
    """
    if family != "rtm":
        return state
    out: StateDict = {}
    for k, v in state.items():
        root = k.split(".", 1)[0]
        if not (
            k.startswith(("truncated_encoder.", "backbone.")) or root in _NAME_TO_SEQ
        ):
            out[k] = v
    for k, v in _canon_backbone_keys(state).items():
        root, _, tail = k.partition(".")
        seq = _NAME_TO_SEQ.get(root)
        if seq is None:
            out[k] = v
        else:
            out[f"truncated_encoder.{seq}.{tail}"] = v
    return out


def convert(
    family: str, state: StateDict, spec, strict: bool = True, init_key: int = 0
) -> Dict[str, Any]:
    """State dict -> param pytree.

    ``strict=False`` reproduces the reference loaders' fallback
    (utils/PMG/PMG_model_utils.py:186-196): missing tensors come from a fresh
    initialization, unexpected ones are ignored, and both lists are printed.
    A present tensor whose shape disagrees with the manifest is an error
    (torch ``load_state_dict(strict=False)`` semantics) — except RTM
    classifier tensors, which the strict converter partial-copies
    (Functions/RTM_evaluation.py:643-648).
    """
    family = family.lower()
    if strict:
        try:
            return _CONVERTERS[family](state, spec)
        except KeyError as e:
            guessed = sniff_family(state)
            if guessed and guessed != family:
                # a bare KeyError deep in a converter ('conv1.weight') is
                # unhelpful when the real mistake is the family flag
                raise ValueError(
                    f"checkpoint does not look like a {family.upper()} "
                    f"checkpoint (missing key {e.args[0]!r}); its key "
                    f"schema matches {guessed.upper()} — rerun with the "
                    f"'{guessed}' family"
                ) from e
            raise
    import jax

    from ..models import get_family

    init_params = get_family(family).init(jax.random.PRNGKey(init_key), spec)
    full = export_state_dict(family, init_params, spec)
    state = _canon_state_keys(family, state)
    missing = [k for k in full if k not in state]
    unexpected = [
        k for k in state if k not in full and "num_batches_tracked" not in k
    ]
    mismatched = [
        k for k in state
        if k in full
        and tuple(np.shape(state[k])) != tuple(np.shape(full[k]))
        and not (family == "rtm" and k.startswith("classifiers."))
    ]
    if mismatched:
        raise ValueError(
            f"shape mismatch for {len(mismatched)} tensors, e.g. "
            + ", ".join(
                f"{k}: {tuple(np.shape(state[k]))} vs {tuple(np.shape(full[k]))}"
                for k in mismatched[:4]
            )
        )
    if missing:
        print(f"[load] Missing keys ({len(missing)}): {missing[:8]}"
              f"{' ...' if len(missing) > 8 else ''}")
    if unexpected:
        print(f"[load] Unexpected keys ({len(unexpected)}): {unexpected[:8]}"
              f"{' ...' if len(unexpected) > 8 else ''}")
    merged = {**full, **{k: v for k, v in state.items() if k in full}}
    return _CONVERTERS[family](merged, spec)


def sniff_family(state: Dict[str, Any]) -> Optional[str]:
    """Best-effort family guess from checkpoint key roots: PMG checkpoints
    carry ``feature_extractor.*`` (models_PMG.py:77), PM ``trunk.*`` +
    ``task_heads.*`` (models_PM.py:79), RTM ``truncated_encoder.`` /
    ``backbone.`` / bare torchvision roots (RTM_evaluation.py:545-620
    accepted schemas).  ``module.`` DataParallel prefixes are stripped."""
    roots = set()
    for k in state:
        if k.startswith("module."):
            k = k[len("module."):]
        roots.add(k.split(".", 1)[0])
    if "feature_extractor" in roots:
        return "pmg"
    if {"truncated_encoder", "backbone", "conv1", "layer1"} & roots:
        return "rtm"
    if {"trunk", "task_heads"} & roots:
        return "pm"
    return None


def load_torch_checkpoint(
    family: str, path: str, spec, strict: bool = True
) -> Dict[str, Any]:
    state = load_state_dict(path)
    try:
        return convert(family, state, spec, strict=True)
    except KeyError:
        # a wrong-family schema raises ValueError from convert() instead
        # (sniff_family) and deliberately does NOT fall back to non-strict
        if strict:
            raise
        print("[WARN] strict conversion failed, falling back to strict=False")
        return convert(family, state, spec, strict=False)


def save_native(params, path: str) -> None:
    """Save a param pytree with Orbax (the framework-native format)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params, force=True)


def load_native(path: str, like=None):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(os.path.abspath(path), like)
        return ckptr.restore(os.path.abspath(path))
