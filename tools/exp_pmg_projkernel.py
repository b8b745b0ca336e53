#!/usr/bin/env python
"""Experiment: pallas token-projection kernel reading the gram row-major.

XLA lowers the PMG token projection ([512,9,9216] x [9216,192]) with its
batch-in-lanes dot emitter, which needs a 183 us layout copy of the 85 MB
gram tensor on top of an 89 us dot (results/roofline.json pmg_f32_b512
top_ops; the copy+dot pair is ~23% of the forward).  Every einsum/reshape
reformulation canonicalizes to the same HLO (tools/exp_pmg_gramproj.py).

This kernel does the projection directly from the gram's natural
{3,2,1,0} layout: tokens[m,k] = sum_cd G[m,c,d] W[c,d,k] accumulated as 96
rank-96 dots, slicing G on the SUBLANE axis (valid because G is symmetric:
G[m,:,d] == G[m,d,:]) — Mosaic cannot merge lanes ([96,96]->9216) or
contract two dims in one tpu.matmul, but sublane slicing + accumulation it
can do.

MEASURED (2026-08-17, one v5e) — DEAD END:
  f32 gram input, TB=16, KG=1:  kernel 307.9 us, full fwd 1517.7 (0.783x) —
      the opaque custom-call also forces the gram fusion to f32 (+155 us)
  bf16 gram input, TB=16, KG=1: kernel 429.0 us, full fwd 1486.8 (0.799x) —
      bf16's packed (2,1) sublane tiling makes the per-d single-sublane
      slice MORE expensive than f32's clean slice
  KG=8 (8 d-slices lane-concatenated per dot, K=768): Mosaic INTERNAL
      compile error (tpu_compile_helper exit 1), both TB=16 and TB=64
The 96 rank-96 accumulated dots can't beat XLA's copy+dot (272 us total);
structurally the projection wants the flattened-lane layout Mosaic cannot
reshape into.  Keep XLA's lowering.

Usage: python tools/exp_pmg_projkernel.py
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_proj_kernel(tile_b, np_, c, k, kgroup=1):
    """kgroup: number of d-slices concatenated along the contraction axis per
    dot — c/kgroup dots of K=kgroup*c instead of c dots of K=c (better MXU
    utilization at K=96)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(g_ref, w_ref, b_ref, o_ref, acc_ref):
        # g_ref: [TB, Np, C, C] bf16; w_ref: [C(d), C(c), K] bf16
        # (symmetry: slicing d on the sublane axis of g equals lane slicing)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        for d0 in range(0, c, kgroup):
            ad = jnp.concatenate(
                [g_ref[:, :, d0 + j, :].reshape(tile_b * np_, c)
                 for j in range(kgroup)], axis=1)
            wd = w_ref[d0 * c:(d0 + kgroup) * c]
            acc_ref[...] += jax.lax.dot_general(
                ad, wd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[...] = (acc_ref[...] + b_ref[...]).reshape(tile_b, np_, k)

    def proj(g, w2, bias):
        b = g.shape[0]
        return pl.pallas_call(
            kern,
            grid=(b // tile_b,),
            in_specs=[
                pl.BlockSpec((tile_b, np_, c, c), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((c * c, k), lambda i: (0, 0)),
                pl.BlockSpec((1, k), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tile_b, np_, k), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, np_, k), jnp.float32),
            scratch_shapes=[pltpu.VMEM((tile_b * np_, k), jnp.float32)],
        )(g, w2, bias)

    return proj


def main():
    import jax
    import jax.numpy as jnp

    import bench
    import wadt.models.pmg as pmg
    from wadt.config import enable_persistent_compilation_cache
    from wadt.ops.gram import split_patches
    from wadt.ops.preprocess import s2d_pack_uint8
    from wadt.utils.devtime import device_time_ms

    enable_persistent_compilation_cache()
    mod, spec, params = bench.build("pmg")
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 256, (512, 224, 224, 3), np.uint8)
    imgs = jax.device_put(s2d_pack_uint8(raw, spec.plan[0].kernel))

    def make_fwd():
        def fwd_v(p, z8):
            return pmg.apply_packed(p, z8, spec)[0]

        return fwd_v

    base = jax.jit(make_fwd())
    t_base, _ = device_time_ms(base, params, imgs, iters=20)
    print(f"baseline: {t_base*1e3:8.1f} us/batch")

    c = spec.gram_channels
    k = params["token_proj"]["w"].shape[1]
    np_ = spec.patch_div ** 2
    orig_tokens, orig_linear = pmg.patch_gram_tokens, pmg.linear

    # W[c*c, k] row-major over (c, d) -> d-major flat [c*c, k] so the kernel
    # slices contiguous d-rows (symmetry lets the kernel read G's d axis on
    # sublanes)
    w2 = jnp.asarray(
        np.asarray(params["token_proj"]["w"], np.float32)
        .reshape(c, c, k).transpose(1, 0, 2).reshape(c * c, k), jnp.bfloat16)
    bias = jnp.asarray(
        np.asarray(params["token_proj"]["b"], np.float32)[None, :])

    for tile_b, kgroup in ((16, 1), (16, 8), (64, 8)):
        proj = make_proj_kernel(tile_b, np_, c, k, kgroup)

        def tokens_g(z, div):
            patches, area = split_patches(z, div)
            g = jnp.einsum("bpnc,bpnd->bpcd", patches, patches,
                           preferred_element_type=jnp.float32) * (1.0/float(area))
            # bf16 gram: XLA hoists the projection's bf16 cast into the gram
            # fusion on the baseline path; an opaque custom-call can't, so
            # cast explicitly (first probe read f32 = 2x the bytes, 0.78x)
            return g.astype(jnp.bfloat16)

        def linear_k(x, p):
            if x.ndim == 4:
                return proj(x, w2, bias).astype(jnp.float32)
            return orig_linear(x, p)

        pmg.patch_gram_tokens, pmg.linear = tokens_g, linear_k
        try:
            jax.clear_caches()
            v = jax.jit(make_fwd())
            t_v, top = device_time_ms(v, params, imgs, iters=20)
            print(f"pallas-proj TB={tile_b:2d} KG={kgroup}: {t_v*1e3:8.1f} us "
                  f"({t_base/t_v:.3f}x)", flush=True)
            for ms, name in top[:4]:
                print(f"    {ms*1e3:8.1f} us  {name[:78]}")
            a = np.asarray(base(params, imgs), np.float32)
            bb = np.asarray(v(params, imgs), np.float32)
            print(f"    drift {np.abs(a-bb).max():.2e} argmax_eq "
                  f"{bool((a.argmax(-1)==bb.argmax(-1)).all())}")
        except Exception as e:
            print(f"pallas-proj TB={tile_b} KG={kgroup}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        finally:
            pmg.patch_gram_tokens, pmg.linear = orig_tokens, orig_linear


if __name__ == "__main__":
    main()
