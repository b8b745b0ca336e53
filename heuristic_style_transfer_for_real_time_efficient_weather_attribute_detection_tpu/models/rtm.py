"""RTM — "ResNet-Truncated-Multitask" (reference
``MultiHeadAttentionPerTaskModel``, models_RTM.py:27-119).

Truncated ResNet-50 (first ``truncate_after_layer`` children) -> spatial
tokens [B, HW, C] -> per-task query-attention head (``TaskAttentionHead``,
models_RTM.py:9-24) -> per-task MLP classifier; ablation path
(``use_attention=False``) classifies the GAP embedding.

All per-task heads are stacked over a task axis (one batched einsum chain —
see ops/attention.rtm_task_attention) and the MLP classifiers are stacked
likewise; only class counts differ per task, handled by Kmax zero-padding.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import TaskSpec
from ..ops.attention import rtm_task_attention
from ..ops.nn import init_linear
from . import resnet

DEFAULTS = dict(
    truncate_layer=10,  # test_RTM.py:102 default; clamps to 8 children
    use_attention=True,
    attn_token_dim=None,
    cls_hidden_dims=(),
    cls_num_layers=0,
)


@dataclasses.dataclass(frozen=True)
class Spec:
    tasks: TaskSpec
    truncate_after_layer: int = 10
    use_attention: bool = True
    attn_token_dim: Optional[int] = None
    cls_hidden_dims: Tuple[int, ...] = ()
    cls_num_layers: int = 0

    @property
    def num_features(self) -> int:
        return resnet.stage_out_channels(self.truncate_after_layer)

    @property
    def token_dim(self) -> int:
        return self.attn_token_dim or self.num_features

    @property
    def mlp_dims(self) -> Tuple[int, ...]:
        # MLP: C -> hidden_dims[:cls_num_layers] -> n_cls (models_RTM.py:74-81)
        return (self.num_features,) + tuple(
            self.cls_hidden_dims[: self.cls_num_layers]
        )


def build_spec(tasks: Mapping[str, Any], hparams: Dict[str, Any]) -> Spec:
    h = {**DEFAULTS, **{k: v for k, v in (hparams or {}).items() if k in DEFAULTS}}
    return Spec(
        tasks=TaskSpec.from_tasks(tasks),
        truncate_after_layer=int(h["truncate_layer"]),
        use_attention=bool(h["use_attention"]),
        attn_token_dim=(
            None if h["attn_token_dim"] is None else int(h["attn_token_dim"])
        ),
        cls_hidden_dims=tuple(int(d) for d in (h["cls_hidden_dims"] or ())),
        cls_num_layers=int(h["cls_num_layers"]),
    )


def init(key, spec: Spec) -> Dict[str, Any]:
    t = spec.tasks
    nt, kmax = len(t), t.max_classes
    c, d = spec.num_features, spec.token_dim
    kb, ka, kc = jax.random.split(key, 3)
    params: Dict[str, Any] = {"backbone": resnet.init(kb)}
    if spec.use_attention:
        proj_w = jnp.zeros((nt, c, d), jnp.float32)
        out_w = jnp.zeros((nt, d, c), jnp.float32)
        qs = jnp.zeros((nt, d), jnp.float32)
        for i, kk in enumerate(jax.random.split(ka, nt)):
            k1, k2, k3 = jax.random.split(kk, 3)
            proj_w = proj_w.at[i].set(init_linear(k1, c, d, bias=False)["w"])
            out_w = out_w.at[i].set(init_linear(k2, d, c, bias=False)["w"])
            qs = qs.at[i].set(jax.random.normal(k3, (d,), jnp.float32))
        params["attn"] = {"proj_w": proj_w, "q": qs, "out_w": out_w}
    # Stacked MLP classifiers: hidden layers share dims across tasks.
    dims = spec.mlp_dims
    mlp: List[Dict[str, jnp.ndarray]] = []
    task_keys = jax.random.split(kc, nt)
    for li in range(len(dims) - 1):
        w = jnp.zeros((nt, dims[li], dims[li + 1]), jnp.float32)
        bvec = jnp.zeros((nt, dims[li + 1]), jnp.float32)
        for i in range(nt):
            p = init_linear(jax.random.fold_in(task_keys[i], li), dims[li], dims[li + 1])
            w, bvec = w.at[i].set(p["w"]), bvec.at[i].set(p["b"])
        mlp.append({"w": w, "b": bvec})
    fw = jnp.zeros((nt, dims[-1], kmax), jnp.float32)
    fb = jnp.zeros((nt, kmax), jnp.float32)
    for i in range(nt):
        p = init_linear(jax.random.fold_in(task_keys[i], 99), dims[-1], t.num_classes[i])
        fw = fw.at[i, :, : t.num_classes[i]].set(p["w"])
        fb = fb.at[i, : t.num_classes[i]].set(p["b"])
    params["mlp"] = mlp
    params["final"] = {"w": fw, "b": fb}
    return params


def _classify(params: Dict[str, Any], h: jnp.ndarray) -> jnp.ndarray:
    """Stacked per-task MLP. h: [B, T, C] -> logits [B, T, Kmax].

    Accepts either full-precision ``mlp`` layers or the streaming fold's
    weight-only int8 form (``mlp_q8`` — dequant fuses into the einsum's
    weight read, see fold_stream_weights)."""
    if "mlp_q8" in params:
        for lp in params["mlp_q8"]:
            w = lp["w8"].astype(lp["scale"].dtype) * lp["scale"][:, None, :]
            h = jax.nn.relu(
                jnp.einsum("btc,tcd->btd", h.astype(w.dtype), w,
                           preferred_element_type=jnp.float32)
                + lp["b"]
            )
        return (
            jnp.einsum(
                "btc,tck->btk", h, params["final"]["w"],
                preferred_element_type=jnp.float32,
            )
            + params["final"]["b"]
        )
    for lp in params["mlp"]:
        h = jax.nn.relu(
            jnp.einsum("btc,tcd->btd", h, lp["w"], preferred_element_type=jnp.float32)
            + lp["b"]
        )
    return (
        jnp.einsum(
            "btc,tck->btk", h, params["final"]["w"],
            preferred_element_type=jnp.float32,
        )
        + params["final"]["b"]
    )


def head_apply(
    params: Dict[str, Any],
    feats: jnp.ndarray,
    spec: Spec,
    capture: Sequence[str] = (),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Attention heads + MLPs from backbone features (Grad-CAM entry)."""
    b, h, w, c = feats.shape
    aux: Dict[str, jnp.ndarray] = {}
    if spec.use_attention:
        emb = rtm_task_attention(feats.reshape(b, h * w, c), params["attn"])
    else:
        shared = jnp.mean(feats, axis=(1, 2))
        emb = jnp.broadcast_to(shared[:, None, :], (b, len(spec.tasks), c))
    if "task_embeddings" in capture:
        aux["task_embeddings"] = emb
    return _classify(params, emb), aux


def pack_stem_weights(w7: jnp.ndarray) -> jnp.ndarray:
    """ResNet stem conv [7,7,C,64] -> [4,4,4C,64] for k=2 space-to-depth
    input (s2d_pack_uint8 channel order ky*2C + kx*C + c).

    Exact: pad the kernel to 8x8 with a zero top-left row/col, so the
    7-tap stride-2 window starting at odd offset 2o-3 becomes an 8-tap
    window at even offset 2o-4 = packed taps o-2..o+1, stride 1, pad (2,1).
    Kills XLA's batch=1 stem layout copies: 113 -> 59 us for the full
    conv+bn+relu+maxpool stem on a v5e (tools/exp_rtm_stem_s2d.py).
    """
    kh, kw, cin, cout = w7.shape
    assert (kh, kw) == (7, 7), "ResNet stem conv expected"
    w8 = jnp.zeros((8, 8, cin, cout), w7.dtype).at[1:, 1:].set(w7)
    return (
        w8.reshape(4, 2, 4, 2, cin, cout)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(4, 4, 4 * cin, cout)
    )


def fold_stream_weights(
    params: Dict[str, Any], spec: Spec, dtype=jnp.float32,
    quantize_fold: bool = False, pack_stem: bool = True,
) -> Dict[str, Any]:
    """Derived weights for the batch=1 streaming fast path.

    At batch=1 the RTM forward is pure HBM weight traffic, and the profiler
    shows it dominated by three reads of the stacked [T, C, d] / [T, d, C]
    attention projections (~2/3 of the 1.08 ms/frame device time at the
    reference defaults d = C = 2048, T = 12):

      1. ``pq = proj_w @ q`` — input-INDEPENDENT, yet recomputed per frame
         inside the jitted step (XLA cannot hoist across calls: params are
         runtime inputs).  Precomputed here once, in f32 — bit-identical.
      2./3. ``h = pooled @ proj_w`` then ``out = h @ out_w`` — two full
         weight reads that associate into ONE: ``out = pooled @ (proj_w @
         out_w)``.  ``attn_fold[t] = proj_w[t] @ out_w[t]`` is computed in
         f32 and stored at ``dtype`` ([T, C, C] — same size as ONE of the
         original matrices, so the per-frame attention weight traffic drops
         3x (plus 2x more at bf16)).

    The fold is a floating-point reassociation (exact in infinite precision);
    tests/test_explain_stream.py bounds the drift and asserts argmax parity
    vs the generic path.  Backbone/classifier weights are cast to ``dtype``.
    Batch-eval (Engine) keeps the unfolded form: at batch 256 the projections
    are MXU-bound GEMMs and the extra read is amortized to noise.

    ``quantize_fold=True`` stores the folded matrix weight-only int8 with
    per-(task, output-column) symmetric scales: the remaining [T, C, C] read
    is still the frame's dominant HBM traffic, and XLA fuses the
    int8->bf16 dequant into the einsum's weight read (measured 68.8 vs
    134.8 us device time at T=12, C=2048 — tools/exp_rtm_int8_stream.py).
    Activations and accumulation stay >= bf16/f32; argmax parity on the RTM
    golden fixtures is gated by tools/tpu_checklist.py before the recorded
    selection may pick it.
    """
    if not spec.use_attention:
        raise ValueError("fold_stream_weights requires use_attention=True")
    from ..ops.nn import cast_tree

    attn = params["attn"]
    pq = jnp.einsum(
        "tcd,td->tc", attn["proj_w"], attn["q"],
        preferred_element_type=jnp.float32,
    )
    fold = jnp.einsum(
        "tcd,tde->tce", attn["proj_w"], attn["out_w"],
        preferred_element_type=jnp.float32,
    )
    out = {
        "backbone": cast_tree(params["backbone"], dtype),
        "attn_pq": pq,  # f32: scores stay exact
        "mlp": cast_tree(params["mlp"], dtype),
        "final": cast_tree(params["final"], dtype),
    }
    def _q8(w):
        """Weight-only int8 with per-(task, output-column) symmetric scales
        for a stacked [T, C, D] einsum weight (XLA fuses the dequant into
        the einsum's weight read — NOT true for conv operands, see
        tools/exp_rtm_trunk_int8.py)."""
        w = w.astype(jnp.float32)
        amax = jnp.max(jnp.abs(w), axis=1)  # [T, D]
        scale = jnp.maximum(amax, 1e-12) / 127.0
        q = jnp.clip(jnp.round(w / scale[:, None, :]), -127, 127)
        return q.astype(jnp.int8), scale.astype(dtype)

    if quantize_fold:
        out["attn_fold_q8"], out["attn_fold_scale"] = _q8(fold)
        # the stacked classifier MLP weights are the next-largest einsum
        # reads (e.g. [12, 2048, 512] ~ 25 MB bf16) — same treatment
        out["mlp_q8"] = []
        for lp in params["mlp"]:
            w8, s = _q8(lp["w"])
            out["mlp_q8"].append(
                {"w8": w8, "scale": s, "b": lp["b"].astype(dtype)}
            )
        del out["mlp"]
    else:
        out["attn_fold"] = fold.astype(dtype)
    if pack_stem:
        out["stem_w"] = pack_stem_weights(
            params["backbone"]["conv1"]["w"]
        ).astype(dtype)
    return out


def apply_stream(
    folded: Dict[str, Any], x: jnp.ndarray, spec: Spec
) -> jnp.ndarray:
    """Streaming forward on :func:`fold_stream_weights` output -> logits.

    Same math as :func:`apply` with the attention head's three stacked
    weight contractions collapsed to one (see fold_stream_weights).

    When the fold carries packed stem weights (``pack_stem``), ``x`` may be
    either NHWC (packed on device — the parity-test path) or already
    k=2 space-to-depth packed ``[B, H/2, W/2, 12]`` (the streaming path:
    the host packs the uint8 frame with the native C kernel and the device
    normalizes the packed layout directly).
    """
    import math

    if "stem_w" in folded:
        if x.shape[-1] == 3:  # NHWC -> packed on device (tests/parity)
            b, h, w_, c = x.shape
            x = (
                x.reshape(b, h // 2, 2, w_ // 2, 2, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(b, h // 2, w_ // 2, 4 * c)
            )
        a = jax.lax.conv_general_dilated(
            x.astype(folded["stem_w"].dtype), folded["stem_w"], (1, 1),
            [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        feats = resnet.apply_truncated_from_stem(
            folded["backbone"], a, spec.truncate_after_layer
        )
    else:
        feats = resnet.apply_truncated(
            folded["backbone"], x, spec.truncate_after_layer
        )
    b, h, w, c = feats.shape
    tokens = feats.reshape(b, h * w, c)
    scores = jnp.einsum(
        "bnc,tc->btn", tokens, folded["attn_pq"],
        preferred_element_type=jnp.float32,
    ) * (1.0 / math.sqrt(spec.token_dim))
    wts = jax.nn.softmax(scores, axis=-1)
    pooled = jnp.einsum(
        "btn,bnc->btc", wts, tokens, preferred_element_type=jnp.float32
    )
    if "attn_fold_q8" in folded:
        # weight-only int8: XLA fuses the dequant into the einsum's weight
        # read, so the dominant [T, C, C] HBM transfer happens at 1 byte/elt
        scale = folded["attn_fold_scale"]
        w = folded["attn_fold_q8"].astype(scale.dtype) * scale[:, None, :]
    else:
        w = folded["attn_fold"]
    emb = jnp.einsum(
        "btc,tce->bte", pooled.astype(w.dtype), w,
        preferred_element_type=jnp.float32,
    )
    return _classify(folded, emb)


def apply_train(
    params: Dict[str, Any], x: jnp.ndarray, spec: Spec, rng=None,
    dropout_rate: float = 0.0,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Training-mode forward: the ResNet backbone's BatchNorms use batch
    statistics and return updated running stats (torch train() semantics for
    the truncated encoder).  Returns (stacked_logits, {"backbone": updated}).
    """
    del rng, dropout_rate  # RTM has no dropout sites
    feats, new_backbone = resnet.apply_truncated_train(
        params["backbone"], x, spec.truncate_after_layer
    )
    logits, _ = head_apply(params, feats, spec)
    return logits, {"backbone": new_backbone}


def apply(
    params: Dict[str, Any],
    x: jnp.ndarray,
    spec: Spec,
    capture: Sequence[str] = (),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Forward -> (stacked logits [B,T,Kmax], aux).

    ``capture``: "features" (truncated-backbone output, the Grad-CAM target,
    Functions/RTM_evaluation.py:175-183), "shared_embedding" (GAP [B,C],
    models_RTM.py:95), "task_embeddings" ([B,T,C] attention outputs — the
    t-SNE tap, Functions/RTM_evaluation.py:668-749).
    """
    aux: Dict[str, jnp.ndarray] = {}
    feats = resnet.apply_truncated(params["backbone"], x, spec.truncate_after_layer)
    if "features" in capture:
        aux["features"] = feats
    b, h, w, c = feats.shape
    shared = jnp.mean(feats, axis=(1, 2))
    if "shared_embedding" in capture:
        aux["shared_embedding"] = shared
    if spec.use_attention:
        tokens = feats.reshape(b, h * w, c)
        emb = rtm_task_attention(tokens, params["attn"])  # [B, T, C]
    else:
        emb = jnp.broadcast_to(shared[:, None, :], (b, len(spec.tasks), c))
    if "task_embeddings" in capture:
        aux["task_embeddings"] = emb
    return _classify(params, emb), aux
