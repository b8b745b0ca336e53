"""PM — "PatchGAN-Multitask": strided-conv trunk + per-task spatial-attention
heads (reference ``MultiTaskPatchGAN``, models_PM.py:79-194).

Per-task head (``TaskHeadImproved``, models_PM.py:27-76):
  x   = SE(feat)                 (if use_se and not ablate)
  a   = Conv1x1(x) -> [N,1,H,W]  attention logits
  A   = softmax(a/tau) over HW   (or normalized sigmoid)
  M   = Conv1x1_cls(x)           [N,K,H,W]
  out = sum_hw(M*A) / (sum_hw(A)+1e-6)

TPU-first restructuring: the reference materializes a per-task SE-scaled
feature map x_t (implicitly [B,T,H,W,C] across 12 heads).  Because the SE
scaling, the 1x1 convs, and the attention-weighted pooling are all linear in
the channel dim, we reassociate:

  a_t[b,hw]    = <feat[b,hw,:], se_t[b,:] * wa_t> + ba_t
  pool_t[b,c]  = sum_hw A_t[b,hw] * feat[b,hw,c]
  out_t[b,k]   = <pool_t[b,:] * se_t[b,:], wc_t[:,k]> / den_t

which is three stacked einsums over the task axis — bit-identical math
(floating-point reassociation only), no [B,T,H,W,C] tensor ever exists.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import TaskSpec
from ..ops.nn import init_conv, init_linear
from .trunk import apply_trunk, apply_trunk_train, init_trunk, trunk_plan

DEFAULTS = dict(
    ndf=64,
    norm="instance",
    patch_size=70,
    attn_tau=0.7,
    attn_use_se=True,
    attn_softmax_spatial=True,
    ablate_attention=False,
)


@dataclasses.dataclass(frozen=True)
class Spec:
    tasks: TaskSpec
    ndf: int = 64
    norm: str = "instance"
    patch_size: int = 70
    attn_tau: float = 0.7
    attn_use_se: bool = True
    attn_softmax_spatial: bool = True
    ablate_attention: bool = False
    input_nc: int = 3

    @property
    def plan(self):
        # k=4, s=2, p=1; final block k4 s1 p1 (models_PM.py:116-137).
        return trunk_plan(self.ndf, self.patch_size, 4, 2, 1, 4, 1, in_nc=self.input_nc)

    @property
    def trunk_channels(self) -> int:
        return self.plan[-1].cout


def build_spec(tasks: Mapping[str, Any], hparams: Dict[str, Any]) -> Spec:
    h = {**DEFAULTS, **{k: v for k, v in (hparams or {}).items() if k in DEFAULTS}}
    return Spec(
        tasks=TaskSpec.from_tasks(tasks),
        ndf=int(h["ndf"]),
        norm=str(h["norm"]),
        patch_size=int(h["patch_size"]),
        attn_tau=float(h["attn_tau"]),
        attn_use_se=bool(h["attn_use_se"]),
        attn_softmax_spatial=bool(h["attn_softmax_spatial"]),
        ablate_attention=bool(h["ablate_attention"]),
    )


def init(key, spec: Spec) -> Dict[str, Any]:
    t = spec.tasks
    c = spec.trunk_channels
    nt, kmax = len(t), t.max_classes
    kt, kheads = jax.random.split(key)
    # PM trunk convs HAVE bias (models_PM.py:124 uses the Conv2d default).
    params: Dict[str, Any] = {
        "trunk": init_trunk(kt, spec.plan, spec.norm, conv_bias=True)
    }
    hid = max(c // 16, 1)
    se1w = jnp.zeros((nt, c, hid), jnp.float32)
    se1b = jnp.zeros((nt, hid), jnp.float32)
    se2w = jnp.zeros((nt, hid, c), jnp.float32)
    se2b = jnp.zeros((nt, c), jnp.float32)
    aw = jnp.zeros((nt, c), jnp.float32)
    ab = jnp.zeros((nt,), jnp.float32)
    cw = jnp.zeros((nt, c, kmax), jnp.float32)
    for i, kk in enumerate(jax.random.split(kheads, nt)):
        k1, k2, k3, k4 = jax.random.split(kk, 4)
        # PM's SE Linears have bias (models_PM.py:15-17).
        p1, p2 = init_linear(k1, c, hid), init_linear(k2, hid, c)
        se1w, se1b = se1w.at[i].set(p1["w"]), se1b.at[i].set(p1["b"])
        se2w, se2b = se2w.at[i].set(p2["w"]), se2b.at[i].set(p2["b"])
        pa = init_conv(k3, 1, 1, c, 1, bias=True)  # attn_conv (models_PM.py:51)
        aw, ab = aw.at[i].set(pa["w"][0, 0, :, 0]), ab.at[i].set(pa["b"][0])
        pc = init_conv(k4, 1, 1, c, t.num_classes[i])  # cls_conv, bias=False
        cw = cw.at[i, :, : t.num_classes[i]].set(pc["w"][0, 0])
    params["heads"] = {
        "se1_w": se1w, "se1_b": se1b, "se2_w": se2w, "se2_b": se2b,
        "attn_w": aw, "attn_b": ab, "cls_w": cw,
    }
    return params


def _head_outputs(params: Dict[str, Any], feats: jnp.ndarray, spec: Spec):
    """All task heads at once. feats: [B,H,W,C] -> (logits [B,T,Kmax], A [B,T,H,W])."""
    hp = params["heads"]
    b, h, w, c = feats.shape
    nt = len(spec.tasks)

    if spec.attn_use_se and not spec.ablate_attention:
        s = jnp.mean(feats, axis=(1, 2))  # [B, C]
        z = jax.nn.relu(
            jnp.einsum("bc,tch->bth", s, hp["se1_w"], preferred_element_type=jnp.float32)
            + hp["se1_b"]
        )
        se = jax.nn.sigmoid(
            jnp.einsum("bth,thc->btc", z, hp["se2_w"], preferred_element_type=jnp.float32)
            + hp["se2_b"]
        )  # [B, T, C] channel gates
    else:
        se = jnp.ones((b, nt, c), feats.dtype)

    if spec.ablate_attention:
        # Uniform attention == GAP (models_PM.py:59-63); SE is bypassed.
        attn = jnp.full((b, nt, h, w), 1.0 / (h * w), feats.dtype)
        pooled = jnp.mean(feats, axis=(1, 2))  # [B, C]
        logits = jnp.einsum(
            "bc,tck->btk", pooled, hp["cls_w"], preferred_element_type=jnp.float32
        )
        return logits, attn

    # Attention logits: <feat, se_t * wa_t> + ba_t, stacked over tasks.
    gate_a = se * hp["attn_w"][None]  # [B, T, C]
    a = (
        jnp.einsum("bhwc,btc->bthw", feats, gate_a, preferred_element_type=jnp.float32)
        + hp["attn_b"][None, :, None, None]
    )
    a = a.reshape(b, nt, h * w)
    if spec.attn_softmax_spatial:
        attn = jax.nn.softmax(a / spec.attn_tau, axis=-1)
        den = jnp.sum(attn, axis=-1) + 1e-6  # == 1 + 1e-6 (kept for parity)
    else:
        attn = jax.nn.sigmoid(a)
        attn = attn / (jnp.sum(attn, axis=-1, keepdims=True) + 1e-6)
        den = jnp.sum(attn, axis=-1) + 1e-6

    # Attention-weighted feature pooling, then SE gate, then class projection.
    fpool = jnp.einsum(
        "btn,bnc->btc",
        attn,
        feats.reshape(b, h * w, c),
        preferred_element_type=jnp.float32,
    )
    logits = jnp.einsum(
        "btc,tck->btk", fpool * se, hp["cls_w"], preferred_element_type=jnp.float32
    ) / den[..., None]
    return logits, attn.reshape(b, nt, h, w)


def head_apply(
    params: Dict[str, Any],
    feats: jnp.ndarray,
    spec: Spec,
    capture: Sequence[str] = (),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Task heads from trunk features (Grad-CAM differentiates through this)."""
    logits, attn = _head_outputs(params, feats, spec)
    aux: Dict[str, jnp.ndarray] = {}
    if "attn" in capture:
        aux["attn"] = attn
    return logits, aux


def apply(
    params: Dict[str, Any],
    x: jnp.ndarray,
    spec: Spec,
    capture: Sequence[str] = (),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Forward -> (stacked logits [B,T,Kmax], aux).

    ``capture``: "features" (trunk output; Grad-CAM target = last trunk conv,
    Functions/PM_evaluation.py:235-242), "attn" (per-task spatial attention
    [B,T,H,W] — the reference's ``return_full`` 'attn', models_PM.py:183-187),
    "task_embeddings" (attention-weighted embeddings sum(F*A)/sum(A), the PM
    t-SNE tap, Functions/PM_evaluation.py:30-98), "shared_embedding" (GAP of
    trunk feats, models_PM.py:175).
    """
    aux: Dict[str, jnp.ndarray] = {}
    feats = apply_trunk(params["trunk"], x, spec.plan, spec.norm)
    if "features" in capture:
        aux["features"] = feats
    if "shared_embedding" in capture:
        aux["shared_embedding"] = jnp.mean(feats, axis=(1, 2))
    logits, attn = _head_outputs(params, feats, spec)
    if "attn" in capture:
        aux["attn"] = attn
    if "task_embeddings" in capture:
        b, h, w, c = feats.shape
        a = attn.reshape(b, len(spec.tasks), h * w)
        num = jnp.einsum(
            "btn,bnc->btc", a, feats.reshape(b, h * w, c),
            preferred_element_type=jnp.float32,
        )
        aux["task_embeddings"] = num / (jnp.sum(a, axis=-1, keepdims=True) + 1e-6)
    return logits, aux


def apply_train(
    params: Dict[str, Any], x: jnp.ndarray, spec: Spec, rng=None,
    dropout_rate: float = 0.0,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Training-mode forward: BatchNorm batch statistics + running-stat
    updates when spec.norm == "batch" (train == eval for instance norm; the
    PM heads are norm-free).  Returns (stacked_logits, {"trunk": updated}).
    """
    del rng, dropout_rate  # PM has no dropout sites
    feats, new_trunk = apply_trunk_train(params["trunk"], x, spec.plan, spec.norm)
    logits, _ = _head_outputs(params, feats, spec)
    return logits, {"trunk": new_trunk}
