"""Pallas TPU kernels — the framework's native layer (SURVEY.md section 7:
"Pallas kernels ... fused patch-split + Gram einsum, and a fused preprocess
kernel").

Kernels here always have a pure-jnp reference implementation next to them
(ops/gram.py, ops/preprocess.py); correctness is asserted in
tests/test_pallas.py (interpret mode on CPU, compiled on TPU).  Selection is
by measurement, not faith: ``tools/bench_kernels.py --record`` A/Bs each
kernel against the XLA fusion and stores the winner per backend in
results/kernel_ab.json, which ops/kernel_select.py serves to the production
dispatch (ops/gram.patch_gram_tokens, workloads/stream.StreamPredictor).
On the current v5e + libtpu: the XLA fusions win the batch-throughput shapes
(recorded "xla" for patch_gram_tokens), while ``fused_trunk_gram`` wins the
batch=1 streaming step (recorded "pallas": 17.9 vs 20.6 us/frame) and
carries the camera path's trunk+gram FLOPs in production.  ``fused_stem``
depends on an in-kernel shape cast not every Mosaic version supports and
stays benchmark-only.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gram_kernel(z_ref, out_ref, *, h: int, w: int, c: int, div: int):
    """One image per program: replicate-pad -> div*div disjoint patches ->
    per-patch Gram -> flattened tokens.

    z_ref: [1, H, W, C] VMEM; out_ref: [1, div*div, C, C] VMEM (the caller
    flattens [C, C] -> C*C tokens outside the kernel — a free bitcast; Mosaic
    cannot shape-cast 2D->1D vectors in-kernel).  The replicate pad and patch
    loop are fully static; each Gram is a [N, C]^T [N, C] MXU contraction
    accumulated in f32.
    """
    z = z_ref[0]
    pad_h = (-h) % div
    pad_w = (-w) % div
    if pad_h:
        z = jnp.concatenate(
            [z, jnp.broadcast_to(z[h - 1 : h], (pad_h, z.shape[1], c))], axis=0
        )
    if pad_w:
        z = jnp.concatenate(
            [z, jnp.broadcast_to(z[:, w - 1 : w], (z.shape[0], pad_w, c))], axis=1
        )
    ph, pw = (h + pad_h) // div, (w + pad_w) // div
    inv_area = 1.0 / float(ph * pw)
    for p in range(div * div):
        r, cc = divmod(p, div)
        patch = z[r * ph : (r + 1) * ph, cc * pw : (cc + 1) * pw, :]
        patch = patch.reshape(ph * pw, c)
        g = jax.lax.dot_general(
            patch,
            patch,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, p] = (g * inv_area).astype(out_ref.dtype)


def patch_gram_tokens_pallas(
    x: jnp.ndarray, div: int, interpret: bool = False
) -> jnp.ndarray:
    """Fused pad+split+Gram+flatten: NHWC -> [B, div^2, C*C].

    Matches ops/gram.patch_gram_tokens (models_PMG.py:157-192 semantics).
    """
    b, h, w, c = x.shape
    kern = functools.partial(_gram_kernel, h=h, w=w, c=c, div=div)
    grams = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, div * div, c, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, div * div, c, c), x.dtype),
        interpret=interpret,
    )(x)
    return grams.reshape(b, div * div, c * c)


def _stem_kernel(x_ref, w_ref, scale_ref, shift_ref, out_ref, *,
                 hp: int, wp: int, k: int, cin: int, cout: int):
    """Fused uint8 normalize + space-to-depth patch-embed (k=s conv) + affine.

    One image per program.  A stride-k, kernel-k, pad-0 conv is exactly a
    reshape to [Hp, Wp, k*k*cin] followed by a dense [k*k*cin, cout] matmul —
    this kernel fuses the uint8->f32 ImageNet normalization into that matmul's
    operand read, so the f32 image is never materialized in HBM.  The
    post-conv inference BatchNorm is pre-folded into scale/shift by the
    caller; LeakyReLU(0.2) finishes in-register.
    """
    # Mosaic has no direct uint8->f32 cast; hop through int32.
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)  # [Hp*k, Wp*k, cin]
    # per-input-channel normalization constants are folded into the WEIGHT
    # and a bias term by the caller; here x is raw [0,255].
    x = x.reshape(hp, k, wp, k, cin)
    x = x.transpose(0, 2, 1, 3, 4).reshape(hp * wp, k * k * cin)
    y = jax.lax.dot_general(
        x, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Hp*Wp, cout]
    y = y * scale_ref[0] + shift_ref[0]
    y = jnp.where(y >= 0, y, y * 0.2)
    out_ref[0] = y.reshape(hp, wp, cout).astype(out_ref.dtype)


def fused_stem(
    images_u8: jnp.ndarray,
    conv_w: jnp.ndarray,
    norm_scale: jnp.ndarray,
    norm_shift: jnp.ndarray,
    mean: Tuple[float, ...],
    std: Tuple[float, ...],
    stride: int,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """First PMG trunk block directly from uint8: normalize + Conv(k=s,p=0)
    + folded inference-norm + LeakyReLU.

    conv_w: HWIO [k,k,cin,cout] with k == stride; norm_scale/shift: the
    pre-folded inference affine.

    NOTE: the in-kernel [H,W,C] -> [Hp,k,Wp,k,C] shape cast is not supported
    by every Mosaic/libtpu version (correct in interpret mode and covered by
    tests); tools/bench_kernels.py degrades gracefully when the backend
    rejects it, and the XLA fusion remains the production default.
    """
    b, h, w, cin = images_u8.shape
    k = stride
    hp, wp = h // k, w // k
    cout = conv_w.shape[-1]
    # Fold the per-channel ImageNet normalization INTO the conv weight and a
    # bias: conv((x/255 - m)/s, W) = conv(x, W/(255*s)) - conv(m/s, W).
    sarr = jnp.asarray(std, jnp.float32)
    marr = jnp.asarray(mean, jnp.float32)
    w_folded = conv_w / (255.0 * sarr[None, None, :, None])
    bias_fold = -jnp.einsum("hwio,i->o", conv_w, marr / sarr)
    w2d = w_folded.transpose(0, 1, 2, 3).reshape(k * k * cin, cout)
    shift = (norm_shift + norm_scale * bias_fold)[None, :]
    scale = norm_scale[None, :]

    kern = functools.partial(
        _stem_kernel, hp=hp, wp=wp, k=k, cin=cin, cout=cout
    )
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k * k * cin, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hp, wp, cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, cout), out_dtype),
        interpret=interpret,
    )(images_u8, w2d, scale, shift)


# ---------------------------------------------------------------------------
# Fused PMG trunk + patch-Gram (the streaming-latency kernel)
# ---------------------------------------------------------------------------
#
# Key identity: with the input space-to-depth packed at K = k1*k2 granularity
# (one KxK block = the receptive field of one second-conv output cell), the
# whole non-overlapping PMG trunk collapses to dense GEMMs at the final
# feature resolution — conv1 becomes a block-diagonal matrix over the k2 x k2
# grid, conv2/final/chan_proj are plain GEMMs — so trunk, replicate-pad and
# the patch-Gram contraction all fit ONE pallas program per image.  That
# removes ~40 XLA op launches from the batch=1 streaming step: measured 18.8
# vs 20.6 us/frame end-to-end on a v5e (kernel itself 7.1 us).  Per-image
# compute is ~16x the useful stem FLOPs (the block-diagonal zeros), so this
# only wins at tiny batches — selection is by measurement
# (tools/bench_latency.py --record -> kernel_select "fused_trunk_gram").


def supports_fused_trunk_gram(spec) -> bool:
    """True for trunk plans of exactly [k=s pad0, k=s pad0, 1x1] (the shipped
    PMG shape) with a transformer-facing gram head."""
    plan = spec.plan
    if len(plan) != 3:
        return False
    b0, b1, b2 = plan
    return (
        b0.kernel == b0.stride and b0.pad == 0 and b0.kernel > 1
        and b1.kernel == b1.stride and b1.pad == 0 and b1.kernel > 1
        and b2.kernel == 1 and b2.stride == 1 and b2.pad == 0
        and not spec.use_channel_attention
    )


def fold_trunk_gram_weights(params, spec):
    """Pre-fold normalize + inference-BN into the GEMM-chain weights.

    Returns (W0bd, B0, W2, B2, W3, B3, Wcp, Bcp): bf16 weight matrices with
    f32 biases.  W0bd is conv1 as a block-diagonal (K*K*cin, k2^2*cout0)
    matrix in the K-granular s2d channel order.
    """
    import numpy as np

    from ..config import IMAGENET_MEAN, IMAGENET_STD

    b0, b1, b2 = spec.plan
    k1, k2 = b0.kernel, b1.kernel
    K = k1 * k2

    def bn_affine(norm):
        if spec.norm == "batch":
            inv = np.asarray(norm["scale"]) / np.sqrt(np.asarray(norm["var"]) + 1e-5)
            return (inv.astype(np.float32),
                    (np.asarray(norm["bias"]) - np.asarray(norm["mean"]) * inv).astype(np.float32))
        raise NotImplementedError(
            "fused trunk kernel folds inference BatchNorm only; instance-norm "
            "trunks need per-image statistics (use the packed XLA path)"
        )

    p0, p1, p2 = params["trunk"]
    w0 = np.asarray(p0["conv"]["w"], np.float32)  # (k1,k1,cin,cout0)
    nscale = 1.0 / (255.0 * np.asarray(IMAGENET_STD, np.float32))
    nshift = np.asarray(IMAGENET_MEAN, np.float32) / np.asarray(IMAGENET_STD, np.float32)
    s0, sh0 = bn_affine(p0["norm"])
    w0n = (w0 * nscale[None, None, :, None]) * s0[None, None, None, :]
    bias0 = -np.einsum("hwio,i->o", w0, nshift) * s0 + sh0
    if p0["conv"].get("b") is not None:
        bias0 = bias0 + np.asarray(p0["conv"]["b"]) * s0
    cin, c0 = b0.cin, b0.cout
    W0bd = np.zeros((K * K * cin, k2 * k2 * c0), np.float32)
    for u in range(k2):
        for v in range(k2):
            col = (u * k2 + v) * c0
            for dy in range(k1):
                for dx in range(k1):
                    row = ((k1 * u + dy) * K + (k1 * v + dx)) * cin
                    W0bd[row:row + cin, col:col + c0] = w0n[dy, dx]
    B0 = np.tile(bias0, k2 * k2)

    s1, sh1 = bn_affine(p1["norm"])
    W2 = np.asarray(p1["conv"]["w"], np.float32).reshape(k2 * k2 * c0, b1.cout) * s1[None, :]
    B2 = sh1.copy()
    if p1["conv"].get("b") is not None:
        B2 = B2 + np.asarray(p1["conv"]["b"]) * s1

    s2, sh2 = bn_affine(p2["norm"])
    W3 = np.asarray(p2["conv"]["w"], np.float32)[0, 0] * s2[None, :]
    B3 = sh2.copy()
    if p2["conv"].get("b") is not None:
        B3 = B3 + np.asarray(p2["conv"]["b"]) * s2

    cp = params["chan_proj"]
    Wcp = np.asarray(cp["w"], np.float32)[0, 0]
    Bcp = (np.asarray(cp["b"], np.float32) if cp.get("b") is not None
           else np.zeros(Wcp.shape[1], np.float32))
    return (jnp.asarray(W0bd, jnp.bfloat16), jnp.asarray(B0),
            jnp.asarray(W2, jnp.bfloat16), jnp.asarray(B2),
            jnp.asarray(W3, jnp.bfloat16), jnp.asarray(B3),
            jnp.asarray(Wcp, jnp.bfloat16), jnp.asarray(Bcp))


def _trunk_gram_kernel(z_ref, w0_ref, b0_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                       wcp_ref, bcp_ref, out_ref, *, h: int, w: int, div: int):
    def lrelu(x):
        return jnp.where(x >= 0, x, 0.2 * x)

    dn = (((2,), (0,)), ((), ()))
    # Mosaic has no direct uint8->float cast; hop through int32.
    x = z_ref[0].astype(jnp.int32).astype(jnp.bfloat16)
    a = lrelu(jax.lax.dot_general(x, w0_ref[...], dn,
                                  preferred_element_type=jnp.float32)
              + b0_ref[...]).astype(jnp.bfloat16)
    b = lrelu(jax.lax.dot_general(a, w2_ref[...], dn,
                                  preferred_element_type=jnp.float32)
              + b2_ref[...]).astype(jnp.bfloat16)
    c = lrelu(jax.lax.dot_general(b, w3_ref[...], dn,
                                  preferred_element_type=jnp.float32)
              + b3_ref[...]).astype(jnp.bfloat16)
    z = (jax.lax.dot_general(c, wcp_ref[...], dn,
                             preferred_element_type=jnp.float32)
         + bcp_ref[...]).astype(jnp.float32)
    # replicate-pad to div-divisible (the model's _split_patches semantics)
    for _ in range((-h) % div):
        z = jnp.concatenate([z, z[z.shape[0] - 1:]], axis=0)
    for _ in range((-w) % div):
        z = jnp.concatenate([z, z[:, z.shape[1] - 1:]], axis=1)
    ph, pw = z.shape[0] // div, z.shape[1] // div
    gc = z.shape[-1]
    inv_area = 1.0 / float(ph * pw)
    for p in range(div * div):
        r, cc = divmod(p, div)
        patch = z[r * ph:(r + 1) * ph, cc * pw:(cc + 1) * pw, :].reshape(ph * pw, gc)
        g = jax.lax.dot_general(patch, patch, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out_ref[0, p] = g * inv_area


def fused_trunk_gram(z16: jnp.ndarray, weights, spec,
                     interpret: bool = False) -> jnp.ndarray:
    """K-packed uint8 [B, H/K, W/K, K*K*cin] -> per-patch Gram tokens
    [B, div^2, gc*gc] via one pallas program per image.

    ``weights`` from :func:`fold_trunk_gram_weights`; input from
    ``ops.preprocess.s2d_pack_uint8(images, K)`` with K = plan[0].kernel *
    plan[1].kernel.  Matches apply_packed's gram tokens to bf16-weight
    precision (~4e-4 on unit-scale logits).
    """
    bsz, hh, ww, cc = z16.shape
    gc = weights[-2].shape[1]
    div = spec.patch_div
    kern = functools.partial(_trunk_gram_kernel, h=hh, w=ww, div=div)
    grams = pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[pl.BlockSpec((1, hh, ww, cc), lambda i: (i, 0, 0, 0))]
        + [pl.BlockSpec(wt.shape, lambda i, _n=wt.ndim: (0,) * _n)
           for wt in weights],
        out_specs=pl.BlockSpec((1, div * div, gc, gc), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, div * div, gc, gc), jnp.float32),
        interpret=interpret,
    )(z16, *weights)
    return grams.reshape(bsz, div * div, gc * gc)

# ---------------------------------------------------------------------------
# Fused PMG head (token_proj -> transformer -> query pool -> task heads)
# ---------------------------------------------------------------------------
#
# Companion to fused_trunk_gram for the batch=1 streaming step: after the
# trunk kernel the step is head weight-read bound (token_proj [gc^2, d] is
# 7.1 MB f32 at the shipped config) plus ~25 small XLA ops.  This kernel
# runs the whole head as ONE program on a fold_head_weights tree (bf16 or
# weight-only-int8 token_proj), so the weights stream HBM->VMEM once with
# no inter-op gaps.  Mosaic constraints shape the implementation:
# - no dim-splitting vector shape casts -> multi-head attention never
#   reshapes [N, D] to [N, h, hd]; each head h is materialized by an iota
#   LANE MASK: scores_h = (q*mask_h) @ k^T and the per-head outputs
#   accumulate as sum_h softmax(scores_h) @ (v*mask_h), exact because the
#   masks are disjoint (the sum IS the concat);
# - no direct sub-32-bit int -> float casts -> int8 dequant hops via i32;
# - the [T, D, Kmax] stacked classifier contracts via broadcast-multiply +
#   axis-reduce (batched 3D dot_general support is version-dependent).
# Selection is by measurement like every kernel here (tools/bench_latency.py
# --record -> "pmg_head_fold" variants pallas_bf16/pallas_q8), parity-gated
# on the golden fixtures through the same utils/goldens walk as the XLA
# fold variants (utils/goldens.pmg_head_fold_fixture_parity).


def _flatten_head_weights(folded) -> Tuple[Tuple[str, ...], Tuple]:
    """fold_head_weights tree -> (names, flat arrays) for the kernel.

    1-D arrays are shipped as [1, n] so every ref is >= 2-D (TPU vector
    layout); the kernel broadcasts them back.
    """
    def row(a):
        return a[None, :] if a.ndim == 1 else a

    named = []
    tp = folded["token_proj"]
    if "w8" in tp:
        named += [("tp_w8", tp["w8"]), ("tp_scale", row(tp["scale"]))]
    else:
        named += [("tp_w", tp["w"])]
    named += [("tp_b", row(tp["b"]))]
    for li, lp in enumerate(folded.get("transformer", ())):
        p = f"l{li}_"
        named += [
            (p + "n1s", row(lp["norm1"]["scale"])),
            (p + "n1b", row(lp["norm1"]["bias"])),
            (p + "wq", lp["attn"]["wq"]), (p + "bq", row(lp["attn"]["bq"])),
            (p + "wk", lp["attn"]["wk"]), (p + "bk", row(lp["attn"]["bk"])),
            (p + "wv", lp["attn"]["wv"]), (p + "bv", row(lp["attn"]["bv"])),
            (p + "wo", lp["attn"]["wo"]), (p + "bo", row(lp["attn"]["bo"])),
            (p + "n2s", row(lp["norm2"]["scale"])),
            (p + "n2b", row(lp["norm2"]["bias"])),
            (p + "f1w", lp["ffn1"]["w"]), (p + "f1b", row(lp["ffn1"]["b"])),
            (p + "f2w", lp["ffn2"]["w"]), (p + "f2b", row(lp["ffn2"]["b"])),
        ]
    named += [
        ("queries", folded["queries"]),
        ("heads_w", folded["heads"]["w"]),
        ("heads_b", folded["heads"]["b"]),
    ]
    names, arrs = zip(*named)
    return names, arrs


def _head_kernel(*refs, names, spec, q8: bool, n_layers: int):
    tokens_ref, out_ref = refs[0], refs[-1]
    w = dict(zip(names, refs[1:-1]))

    def f32(r):
        return r[...].astype(jnp.float32)

    x_raw = tokens_ref[0]  # [N, gc*gc] f32
    n = x_raw.shape[0]
    d = w["queries"].shape[1]

    # token_proj: bf16 MXU dot (tokens cast down; parity-gated), f32 accum
    if q8:
        wp = (w["tp_w8"][...].astype(jnp.int32).astype(jnp.bfloat16)
              * w["tp_scale"][...].astype(jnp.bfloat16))
    else:
        wp = w["tp_w"][...]
    x = jax.lax.dot_general(
        x_raw.astype(jnp.bfloat16), wp, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + w["tp_b"][...]  # [N, d] f32

    heads = spec.transformer_heads
    hd = d // heads
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, d), 1)

    def dot(a, b_ref):
        return jax.lax.dot_general(
            a, f32(b_ref), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def softmax_rows(s):
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        return e / jnp.sum(e, axis=1, keepdims=True)

    def layer_norm(y, scale_ref, bias_ref):
        mu = jnp.mean(y, axis=1, keepdims=True)
        c = y - mu
        var = jnp.mean(c * c, axis=1, keepdims=True)
        return c * jax.lax.rsqrt(var + 1e-5) * scale_ref[...] + bias_ref[...]

    for li in range(n_layers):
        p = f"l{li}_"
        h = layer_norm(x, w[p + "n1s"], w[p + "n1b"])
        q = (dot(h, w[p + "wq"]) + w[p + "bq"][...]) * (1.0 / math.sqrt(hd))
        k = dot(h, w[p + "wk"]) + w[p + "bk"][...]
        v = dot(h, w[p + "wv"]) + w[p + "bv"][...]
        o = jnp.zeros_like(q)
        for hh in range(heads):
            mask = jnp.where(lane // hd == hh, 1.0, 0.0)
            s = jax.lax.dot_general(
                q * mask, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [N, N]
            o = o + jax.lax.dot_general(
                softmax_rows(s), v * mask, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        x = x + dot(o, w[p + "wo"]) + w[p + "bo"][...]
        h = layer_norm(x, w[p + "n2s"], w[p + "n2b"])
        h = jnp.maximum(dot(h, w[p + "f1w"]) + w[p + "f1b"][...], 0.0)
        x = x + dot(h, w[p + "f2w"]) + w[p + "f2b"][...]

    # task query pool (no 1/sqrt(d) — reference TaskAttentionPooling,
    # models_PMG.py:36-57): scores [T, N] = queries @ x^T
    qr = f32(w["queries"])
    s = jax.lax.dot_general(
        qr, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    pooled = jax.lax.dot_general(
        softmax_rows(s), x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, d]
    hw = f32(w["heads_w"])  # [T, d, kmax]
    out_ref[0] = jnp.sum(pooled[:, :, None] * hw, axis=1) + f32(w["heads_b"])


def fused_head(
    gram_tokens: jnp.ndarray, folded, spec, interpret: bool = False
) -> jnp.ndarray:
    """Gram tokens [B, Np, gc^2] + fold_head_weights tree -> stacked logits
    [B, T, Kmax], one pallas program per image.

    Same math as models/pmg.head_from_gram_tokens on the same folded tree
    (eval mode: no dropout); numerics differ only in the bf16 cast of the
    token_proj operands (parity-gated by the shared goldens walk).
    """
    b, npatch, _ = gram_tokens.shape
    names, arrs = _flatten_head_weights(folded)
    q8 = "tp_w8" in names
    tt = folded["heads"]["w"].shape
    kern = functools.partial(
        _head_kernel, names=names, spec=spec, q8=q8,
        n_layers=len(folded.get("transformer", ())),
    )
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec(
            (1,) + gram_tokens.shape[1:], lambda i: (i, 0, 0))]
        + [pl.BlockSpec(a.shape, lambda i, _n=a.ndim: (0,) * _n)
           for a in arrs],
        out_specs=pl.BlockSpec((1,) + tuple((tt[0], tt[2])),
                               lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, tt[0], tt[2]), jnp.float32),
        interpret=interpret,
    )(gram_tokens, *arrs)
