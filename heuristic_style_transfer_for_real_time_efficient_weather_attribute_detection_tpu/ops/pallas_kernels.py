"""Pallas TPU kernels — the framework's native layer (SURVEY.md section 7:
"Pallas kernels ... fused patch-split + Gram einsum, and a fused preprocess
kernel").

Kernels here always have a pure-jnp reference implementation next to them
(ops/gram.py, ops/preprocess.py); correctness is asserted in
tests/test_pallas.py (interpret mode on CPU, compiled on TPU).  Selection is
by measurement, not faith: ``tools/bench_kernels.py --record`` A/Bs each
kernel against the XLA fusion and stores the winner per backend in
results/kernel_ab.json, which ops/kernel_select.py serves to the production
dispatch (ops/gram.patch_gram_tokens).  On the current v5e + libtpu the XLA
fusions win at the shipped shapes (the per-image pallas grid is too
fine-grained for this tiny model), so the recorded winner is "xla" and these
kernels carry no production FLOPs there — a backend where they win flips the
dispatch with no code change.  ``fused_stem`` additionally depends on an
in-kernel shape cast not every Mosaic version supports and stays
benchmark-only.
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
