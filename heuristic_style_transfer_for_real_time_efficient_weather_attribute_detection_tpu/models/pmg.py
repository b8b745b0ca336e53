"""PMG — the flagship "PatchGAN-Multitask-Gram" model (~3M params).

Architecture (reference ``MultiTaskPatchGANGramModelNonOverlapV2``,
models_PMG.py:77-199): non-overlapping conv trunk (k4 s4 p0, doubling from
``ndf`` while rf > 4 and filters <= 512, then a 1x1 block) -> optional SE ->
1x1 ``chan_proj`` to ``gram_channels`` -> split into ``patch_div^2`` disjoint
patches (replicate-pad) -> per-patch Gram -> flatten to tokens ->
``token_proj`` Linear -> pre-norm TransformerEncoder -> per-task learned-query
pooling -> per-task Linear heads.

Shipped production config (Model_weights/PMG/hyperparameters_PMG.json:8-33):
ndf=32, patch_size=64, patch_div=3, gram_channels=96, d_model=192, 2 layers,
4 heads, norm=batch; 224px input -> 14x14 feats -> 15x15 pad -> 9 patches of
5x5 -> 9 Gram tokens of 96*96=9216 dims -> 192-d tokens; 12 tasks.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TaskSpec
from ..ops.attention import stacked_task_heads, task_query_pool, transformer_encoder
from ..ops.gram import patch_gram_tokens
from ..ops.nn import (
    conv2d, init_conv, init_linear, init_se, leaky_relu, linear, se_block,
)
from ..ops.norms import apply_norm
from .trunk import apply_trunk, apply_trunk_train, init_trunk, trunk_plan

# Reference builder defaults (utils/PMG/PMG_model_utils.py:135-172).
DEFAULTS = dict(
    ndf=64,
    patch_size=70,
    patch_div=4,
    gram_channels=64,
    d_model=256,
    transformer_layers=1,
    transformer_heads=4,
    use_token_attention=True,
    use_channel_attention=False,
    norm="batch",
)


@dataclasses.dataclass(frozen=True)
class Spec:
    tasks: TaskSpec
    ndf: int = 64
    norm: str = "batch"
    patch_size: int = 70
    patch_div: int = 4
    gram_channels: int = 64
    d_model: int = 256
    transformer_layers: int = 1
    transformer_heads: int = 4
    use_token_attention: bool = True
    use_channel_attention: bool = False
    input_nc: int = 3

    @property
    def plan(self):
        # k=s=4, p=0; final block is 1x1 s1 p0 (models_PMG.py:111-128).
        return trunk_plan(
            self.ndf, self.patch_size, 4, 4, 0, 1, 0, in_nc=self.input_nc
        )

    @property
    def trunk_channels(self) -> int:
        return self.plan[-1].cout

    @property
    def has_transformer(self) -> bool:
        return self.use_token_attention and self.transformer_layers > 0

    @property
    def token_dim_in(self) -> int:
        return self.gram_channels * self.gram_channels


def build_spec(tasks: Mapping[str, Any], hparams: Dict[str, Any]) -> Spec:
    """hparams dict (+reference defaults) -> Spec."""
    h = {**DEFAULTS, **{k: v for k, v in (hparams or {}).items() if k in DEFAULTS}}
    return Spec(
        tasks=TaskSpec.from_tasks(tasks),
        ndf=int(h["ndf"]),
        norm=str(h["norm"]),
        patch_size=int(h["patch_size"]),
        patch_div=int(h["patch_div"]),
        gram_channels=int(h["gram_channels"]),
        d_model=int(h["d_model"]),
        transformer_layers=int(h["transformer_layers"]),
        transformer_heads=int(h["transformer_heads"]),
        use_token_attention=bool(h["use_token_attention"]),
        use_channel_attention=bool(h["use_channel_attention"]),
    )


def init(key, spec: Spec) -> Dict[str, Any]:
    t = spec.tasks
    d = spec.d_model
    kt, kse, kcp, ktp, ktx, kq, kh = jax.random.split(key, 7)
    params: Dict[str, Any] = {
        # Trunk convs are bias-free (models_PMG.py:115 ``bias=False``).
        "trunk": init_trunk(kt, spec.plan, spec.norm, conv_bias=False),
        "chan_proj": init_conv(kcp, 1, 1, spec.trunk_channels, spec.gram_channels),
        "token_proj": init_linear(ktp, spec.token_dim_in, d),
        "queries": jax.random.normal(kq, (len(t), d), jnp.float32),
    }
    if spec.use_channel_attention:
        params["se"] = init_se(kse, spec.trunk_channels, bias=False)
    if spec.has_transformer:
        layers = []
        for k in jax.random.split(ktx, spec.transformer_layers):
            ka, ko, k1, k2 = jax.random.split(k, 4)
            kaq, kak, kav = jax.random.split(ka, 3)
            ff = 2 * d  # dim_feedforward = 2*d_model (models_PMG.py:146)
            layers.append(
                {
                    "attn": {
                        "wq": init_linear(kaq, d, d)["w"],
                        "wk": init_linear(kak, d, d)["w"],
                        "wv": init_linear(kav, d, d)["w"],
                        "bq": jnp.zeros((d,), jnp.float32),
                        "bk": jnp.zeros((d,), jnp.float32),
                        "bv": jnp.zeros((d,), jnp.float32),
                        "wo": init_linear(ko, d, d)["w"],
                        "bo": jnp.zeros((d,), jnp.float32),
                    },
                    "norm1": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
                    "norm2": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
                    "ffn1": init_linear(k1, d, ff),
                    "ffn2": init_linear(k2, ff, d),
                }
            )
        params["transformer"] = layers
    # Stacked per-task classifier, zero-padded to Kmax.
    kmax = t.max_classes
    hw = jnp.zeros((len(t), d, kmax), jnp.float32)
    hb = jnp.zeros((len(t), kmax), jnp.float32)
    for i, kk in enumerate(jax.random.split(kh, len(t))):
        p = init_linear(kk, d, t.num_classes[i])
        hw = hw.at[i, :, : t.num_classes[i]].set(p["w"])
        hb = hb.at[i, : t.num_classes[i]].set(p["b"])
    params["heads"] = {"w": hw, "b": hb}
    return params


def apply(
    params: Dict[str, Any],
    x: jnp.ndarray,
    spec: Spec,
    capture: Sequence[str] = (),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Forward: normalized NHWC images -> (stacked logits [B,T,Kmax], aux).

    ``capture`` may request: "features" (trunk output, the Grad-CAM target
    layer — last conv of feature_extractor, Functions/PMG_evaluation.py:59-64),
    "tokens" (post-transformer), "pooled" (per-task embeddings — the t-SNE
    tap uses final logits in the reference, utils/tsne_utils.py:54-70, but
    pooled embeddings are the richer native tap).
    """
    aux: Dict[str, jnp.ndarray] = {}
    feats = apply_trunk(params["trunk"], x, spec.plan, spec.norm)
    if "features" in capture:
        aux["features"] = feats
    logits, head_aux = head_apply(params, feats, spec, capture)
    aux.update(head_aux)
    return logits, aux


def head_apply(
    params: Dict[str, Any],
    feats: jnp.ndarray,
    spec: Spec,
    capture: Sequence[str] = (),
    dropout_rate: float = 0.0,
    rng=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Everything after the trunk: SE -> chan_proj -> Gram -> transformer ->
    task pooling -> heads.  Split out so Grad-CAM can differentiate logits
    w.r.t. trunk features (workloads/explain.py).  ``dropout_rate``/``rng``
    enable the transformer's train-mode dropout (apply_train)."""
    aux: Dict[str, jnp.ndarray] = {}
    h = se_block(feats, params["se"]) if spec.use_channel_attention else feats
    z = conv2d(h, params["chan_proj"])
    tokens = patch_gram_tokens(z, spec.patch_div)
    tokens = linear(tokens, params["token_proj"])
    if spec.has_transformer:
        tokens = transformer_encoder(
            tokens, params["transformer"], spec.transformer_heads,
            dropout_rate=dropout_rate, rng=rng,
        )
    if "tokens" in capture:
        aux["tokens"] = tokens
    pooled = task_query_pool(tokens, params["queries"])
    if "pooled" in capture:
        aux["pooled"] = pooled
    logits = stacked_task_heads(pooled, params["heads"])
    return logits, aux


def head_from_gram_tokens(
    params: Dict[str, Any], gram_tokens: jnp.ndarray, spec: Spec
) -> jnp.ndarray:
    """Raw per-patch Gram tokens [B, Np, gc*gc] -> stacked logits.

    Re-entry point for the fused trunk+gram streaming kernel
    (ops/pallas_kernels.fused_trunk_gram), which produces exactly the
    ``patch_gram_tokens`` output.  Accepts either the full param tree or a
    :func:`fold_head_weights` tree (bf16 / weight-only-int8 ``token_proj``,
    recognized by its ``w8`` key — the dequant multiplies inside the einsum
    weight read, which XLA fuses so the dominant [gc^2, d] HBM transfer
    happens at 1 byte/element).
    """
    tp = params["token_proj"]
    if "w8" in tp:
        w = tp["w8"].astype(jnp.float32) * tp["scale"]
        tokens = (
            jnp.einsum("bnd,dk->bnk", gram_tokens, w,
                       preferred_element_type=jnp.float32)
            + tp["b"]
        )
    else:
        tokens = linear(gram_tokens, tp)
    if spec.has_transformer:
        tokens = transformer_encoder(
            tokens, params["transformer"], spec.transformer_heads
        )
    pooled = task_query_pool(tokens, params["queries"])
    return stacked_task_heads(pooled, params["heads"])


def fold_head_weights(
    params: Dict[str, Any], spec: Spec, variant: str = "bf16"
) -> Dict[str, Any]:
    """Compressed head weights for the batch=1 streaming fast path.

    At batch=1 everything after the fused trunk+gram kernel is HBM
    weight-read bound, and ``token_proj`` ([gc^2, d] — 7.1 MB f32 at the
    shipped config, ~3/4 of the head's traffic) dominates:

    - ``"bf16"``: token_proj + transformer matrix weights stored bfloat16
      (biases, norms, queries, heads stay f32 — they are KBs).  All
      contractions keep f32 accumulation (``preferred_element_type`` /
      dtype promotion), so this halves the reads without changing the
      accumulate path.
    - ``"q8"``: token_proj stored weight-only int8 with per-output-column
      symmetric scales (the RTM attention-fold treatment —
      models/rtm.fold_stream_weights); transformer as in "bf16".  XLA fuses
      the dequant into the einsum's weight read (NOT true for conv
      operands — tools/exp_rtm_trunk_int8.py), so the dominant read drops
      to 1 byte/element.

    Selection is by recorded measurement (tools/bench_latency.py --record
    -> kernel_select "pmg_head_fold"), parity-gated on the golden fixtures
    at record time and at release check time (tools/tpu_checklist.py) via
    utils/goldens.pmg_head_fold_fixture_parity.
    """
    if variant not in ("bf16", "q8"):
        raise ValueError(f"unknown head fold variant {variant!r}")
    out: Dict[str, Any] = {
        "queries": params["queries"],
        "heads": params["heads"],
    }
    tp = params["token_proj"]
    if variant == "q8":
        w = tp["w"].astype(jnp.float32)
        amax = jnp.max(jnp.abs(w), axis=0)  # per output column
        scale = jnp.maximum(amax, 1e-12) / 127.0
        out["token_proj"] = {
            "w8": jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8),
            "scale": scale,
            "b": tp["b"],
        }
    else:
        out["token_proj"] = {"w": tp["w"].astype(jnp.bfloat16), "b": tp["b"]}
    if spec.has_transformer:
        bf = jnp.bfloat16
        out["transformer"] = [
            {
                "attn": {
                    "wq": lp["attn"]["wq"].astype(bf),
                    "wk": lp["attn"]["wk"].astype(bf),
                    "wv": lp["attn"]["wv"].astype(bf),
                    "wo": lp["attn"]["wo"].astype(bf),
                    "bq": lp["attn"]["bq"],
                    "bk": lp["attn"]["bk"],
                    "bv": lp["attn"]["bv"],
                    "bo": lp["attn"]["bo"],
                },
                "norm1": lp["norm1"],
                "norm2": lp["norm2"],
                "ffn1": {"w": lp["ffn1"]["w"].astype(bf), "b": lp["ffn1"]["b"]},
                "ffn2": {"w": lp["ffn2"]["w"].astype(bf), "b": lp["ffn2"]["b"]},
            }
            for lp in params["transformer"]
        ]
    return out


def apply_train(
    params: Dict[str, Any],
    x: jnp.ndarray,
    spec: Spec,
    rng=None,
    dropout_rate: float = 0.1,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Training-mode forward: BatchNorm batch statistics + running-stat
    updates, and the reference transformer's dropout=0.1
    (models_PMG.py:146) when ``rng`` is given (rng=None -> deterministic).
    Returns (stacked_logits, {param subtree name: updated subtree}) — the
    train step merges only the running statistics back.
    """
    feats, new_trunk = apply_trunk_train(params["trunk"], x, spec.plan, spec.norm)
    logits, _ = head_apply(params, feats, spec, dropout_rate=dropout_rate, rng=rng)
    return logits, {"trunk": new_trunk}


def supports_packed_input(spec: Spec) -> bool:
    """True when the first trunk block is non-overlapping (kernel == stride,
    pad 0) so the packed-uint8 fast path (``apply_packed``) is exact."""
    b0 = spec.plan[0]
    return b0.kernel == b0.stride and b0.pad == 0


def packed_trunk_features(
    params: Dict[str, Any], z8: jnp.ndarray, spec: Spec,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Trunk forward from s2d-packed uint8 -> feature map [B, h, w, C].

    The stem GEMM carries the normalize affine folded into its weights
    (see :func:`apply_packed` for the math and measurements); shared by
    apply_packed and the perf experiments so the fold has one owner.
    """
    from ..ops.preprocess import packed_affine

    b0 = spec.plan[0]
    assert supports_packed_input(spec), "first trunk block is overlapping"
    p0 = params["trunk"][0]
    w0 = p0["conv"]["w"].reshape(-1, b0.cout)
    scale, shift = (jnp.asarray(a) for a in packed_affine(b0.kernel))
    w0f = w0.astype(jnp.float32)
    wf = (scale[:, None] * w0f).astype(w0.dtype)
    bf = -(shift @ w0f)
    if p0["conv"].get("b") is not None:
        bf = bf + p0["conv"]["b"]
    u = (z8.astype(jnp.int32).astype(dtype) if z8.shape[0] >= 64
         else z8.astype(dtype))
    y = jnp.einsum("bhwc,cd->bhwd", u, wf, preferred_element_type=jnp.float32)
    y = y + bf
    y = y.astype(dtype)  # keep the activation chain in the run dtype
    y = leaky_relu(apply_norm(y, p0["norm"], spec.norm), 0.2)
    for pp, bk in zip(params["trunk"][1:], spec.plan[1:]):
        y = conv2d(y, pp["conv"], stride=bk.stride, padding=bk.pad)
        y = leaky_relu(apply_norm(y, pp["norm"], spec.norm), 0.2)
    return y


def apply_packed(
    params: Dict[str, Any], z8: jnp.ndarray, spec: Spec,
    capture: Sequence[str] = (),
    dtype: jnp.dtype = jnp.float32,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Latency-optimized forward from s2d-packed uint8 (the streaming path).

    z8: [B, H/k, W/k, k*k*3] from ``ops.preprocess.s2d_pack_uint8``.  The
    first non-overlapping conv becomes one GEMM over the packed channel axis
    — the same math as ``apply`` after ``normalize_uint8`` (<=1e-7 prob
    drift at f32 matmul precision; <=5e-4 conv-vs-GEMM reassociation noise
    at the fast default; asserted in tests/test_explain_stream.py and
    tools/tpu_checklist.py).  At batch=1 this avoids XLA's
    batch-minor conv layout copies: 20 vs 57 us/frame on one v5e.

    The device normalize affine is FOLDED into the stem GEMM:
    ``(u8*scale - shift) @ W == u8 @ (scale*W) + (b - shift@W)`` — exact
    (8e-08 prob drift at parity precision), and measured 5-11% faster
    full-forward at every batch size (tools/exp_pmg_normfold.py; the
    remaining u8->f32 convert lowers best via an int32 hop at batch >=64
    and directly below that — also measured there).
    """
    y = packed_trunk_features(params, z8, spec, dtype)
    aux: Dict[str, jnp.ndarray] = {}
    if "features" in capture:
        aux["features"] = y
    logits, head_aux = head_apply(params, y, spec, capture)
    aux.update(head_aux)
    return logits, aux


def trunk_features(params: Dict[str, Any], x: jnp.ndarray, spec: Spec) -> jnp.ndarray:
    """Trunk-only forward (style transfer taps raw ``feature_extractor``
    output — utils/PMG/PMG_style_transfer.py:21-23)."""
    return apply_trunk(params["trunk"], x, spec.plan, spec.norm)


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
