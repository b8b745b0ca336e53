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
