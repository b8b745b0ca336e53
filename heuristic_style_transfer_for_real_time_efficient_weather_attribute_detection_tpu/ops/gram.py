"""Patch-Gram ops — the signature computation of the PMG model family.

Reference semantics (models_PMG.py:157-192):
  1. replicate-pad the feature map on the bottom/right so H,W divide patch_div
     (``_pad_to_divisible``),
  2. split into ``patch_div**2`` disjoint patches, row-major over the patch
     grid (``F.unfold`` with kernel=stride=patch shape),
  3. per-patch Gram ``G = F F^T / N`` with N = patch area,
  4. flatten each Gram row-major into a token of size C*C.

These exact semantics (including the replicate pad) must hold or Gram values
drift (SURVEY.md section 7, hard parts).  Layout here is NHWC; the Gram is a
batched [N, C] x [N, C] -> [C, C] contraction that XLA maps straight onto the
MXU (C = gram_channels = 96 in the shipped config).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _accum_dtype(x: jnp.ndarray) -> jnp.dtype:
    """Gram accumulation dtype: f32 for f32/bf16 inputs (MXU accumulator),
    f64 when the caller runs the whole pipeline in f64 (the parity fuzz's
    ground-truth adjudication leg — pinning f32 there would silently round
    the one computation whose job is to be more accurate than f32)."""
    return jnp.float64 if x.dtype == jnp.float64 else jnp.float32


def pad_to_divisible(x: jnp.ndarray, div: int) -> jnp.ndarray:
    """Replicate-pad bottom/right of NHWC ``x`` so H and W divide ``div``.

    Matches ``F.pad(x, (0, pad_w, 0, pad_h), mode='replicate')``
    (models_PMG.py:158-164).
    """
    _, h, w, _ = x.shape
    pad_h = (-h) % div
    pad_w = (-w) % div
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="edge")
    return x


def split_patches(x: jnp.ndarray, div: int) -> Tuple[jnp.ndarray, int]:
    """Split NHWC ``x`` into disjoint patches -> ([B, Np, N, C], patch_area).

    Patch order is row-major over the (div x div) grid and pixels within a
    patch are row-major (h, then w) — identical to the reference's
    ``F.unfold`` ordering (models_PMG.py:166-174).
    """
    x = pad_to_divisible(x, div)
    b, h, w, c = x.shape
    ph, pw = h // div, w // div
    # [B, div, ph, div, pw, C] -> [B, div, div, ph, pw, C] -> [B, Np, N, C]
    x = x.reshape(b, div, ph, div, pw, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, div * div, ph * pw, c), ph * pw


def patch_gram_tokens(x: jnp.ndarray, div: int) -> jnp.ndarray:
    """NHWC feature map -> flattened per-patch Gram tokens [B, Np, C*C].

    ``G[p] = P[p]^T P[p] / N`` with P [N, C]; equals the reference's
    ``matmul(patches, patches.transpose(2,3)) / N`` (models_PMG.py:188) with
    matching row-major flattening (G is symmetric and index orders coincide).

    Dispatches to the Pallas kernel when the recorded A/B says it wins on
    this backend (ops/kernel_select.py; XLA fusion otherwise).
    """
    from .kernel_select import winner

    if winner("patch_gram_tokens") == "pallas":
        from .pallas_kernels import patch_gram_tokens_pallas

        return patch_gram_tokens_pallas(x, div)
    patches, area = split_patches(x, div)
    b, np_, n, c = patches.shape
    g = jnp.einsum(
        "bpnc,bpnd->bpcd", patches, patches, preferred_element_type=_accum_dtype(patches)
    ) * (1.0 / float(area))
    return g.reshape(b, np_, c * c).astype(x.dtype)


def style_patch_grams(x: jnp.ndarray, div: int) -> jnp.ndarray:
    """Per-patch Grams with the *style-transfer* split semantics -> [B,Np,C,C].

    The style path (utils/PMG/PMG_style_transfer.py:25-48) differs from the
    model's ``_split_patches`` in two ways we reproduce faithfully:
    (1) no replicate padding — patch size is floor(H/div) and trailing
    rows/cols are DROPPED; (2) its permute+reshape regroups the
    (nH, ph, nW, pw) axes in flat row-major order, which scrambles pixel->
    patch assignment whenever nH > 1.  Gram values depend on the grouping, so
    parity requires the exact same regroup (verified against frozen reference
    outputs in tests/test_parity.py::test_pmg_style_grams_match).
    """
    b, h, w, c = x.shape
    ph, pw = h // div, w // div
    if ph == 0 or pw == 0:
        raise ValueError(
            f"style-transfer patch split needs feature map >= patch_div "
            f"(got {h}x{w} features, patch_div={div}); the model's padded "
            f"split handles this, but the reference's unpadded style path "
            f"cannot (utils/PMG/PMG_style_transfer.py:29-32)"
        )
    nh, nw = h // ph, w // pw
    v = x.transpose(0, 3, 1, 2)[:, :, : nh * ph, : nw * pw]  # NCHW crop
    v = v.reshape(b, c, nh * nw, ph * pw)  # the reference's exact regroup
    return jnp.einsum(
        "bcpn,bdpn->bpcd", v, v, preferred_element_type=_accum_dtype(v)
    ) * (1.0 / float(ph * pw))


def patch_grams(x: jnp.ndarray, div: int) -> jnp.ndarray:
    """Unflattened per-patch Grams [B, Np, C, C] (style-transfer loss uses
    this form; reference utils/PMG/PMG_style_transfer.py:11-48)."""
    patches, area = split_patches(x, div)
    return jnp.einsum(
        "bpnc,bpnd->bpcd", patches, patches, preferred_element_type=_accum_dtype(patches)
    ) * (1.0 / float(area))
