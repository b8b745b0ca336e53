#!/usr/bin/env python
"""Experiment: fuse the PMG gram flatten into the token projection.

The roofline trace (results/roofline.json, pmg_f32_b512 top_ops) shows a
~183 us pure layout copy of the [512,9,96,96] gram tensor between the gram
einsum and the token-projection matmul — XLA re-lays the reshape-flattened
tokens for the dot.  Candidate: contract the UNflattened gram directly,
``einsum('bpcd,cdk->bpk', G, W.reshape(C,C,K))`` — mathematically the same
row-major contraction, but XLA is free to pick one consistent layout.

Measures full apply_packed device time (trace protocol) at the shipped
batch-512 config, both formulations, plus numeric drift.

MEASURED (2026-08-17, one v5e, trace protocol, iters=20) — DEAD END:
  baseline apply_packed    1187.6 us/batch (copy.24 182us + dot 89us + gram
                           fusion 160us are the gram+proj region)
  fused_cdk  (bpcd,cdk)    1955.9 us (0.607x) — the 2-einsum split keeps the
                           gram f32 (XLA can't hoist the projection's bf16
                           fast-default demotion across the astype), 600us
                           f32 copy
  one_einsum (bpnc,bpnd,cdk one jnp.einsum)  1157.3 us (1.026x) on the BARE
                           forward — but integrated into the ENGINE step it
                           measures 429-438k img/s vs 445-446k unfused
                           (bench.py differential, 3 runs vs 2): the +2.6%
                           forward win inverts to -2.5% once the post-logits
                           ops join the graph and XLA re-picks layouts.
                           Not shipped.
  gram_pcdb  (batch-minor) 1994.9 us (0.595x) — 597us copy anyway
All variants drift 0.00 / argmax-equal.  The 183us layout copy is XLA's
batch-in-lanes dot emitter pairing; no einsum reformulation removes it, and
the pallas route loses harder (exp_pmg_projkernel.py).

Usage: python tools/exp_pmg_gramproj.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import bench
    import wadt.models.pmg as pmg
    from wadt.config import enable_persistent_compilation_cache
    from wadt.ops.gram import patch_grams
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
    t_base, top_base = device_time_ms(base, params, imgs, iters=20)
    print(f"baseline apply_packed: {t_base*1e3:8.1f} us/batch")
    for ms, name in top_base[:4]:
        print(f"    {ms*1e3:8.1f} us  {name[:80]}")

    # --- fused variant via monkeypatch: gram stays [B,Np,C,C]; linear on a
    # 4D input contracts (c,d) against W reshaped [C,C,K] ---
    orig_tokens, orig_linear = pmg.patch_gram_tokens, pmg.linear

    def tokens_unflat(z, div):
        return patch_grams(z, div).astype(z.dtype)

    def linear_fused(x, p):
        if x.ndim == 4:  # [B,Np,C,C] gram
            c = x.shape[-1]
            w = p["w"].reshape(c, c, -1)
            y = jnp.einsum(
                "bpcd,cdk->bpk", x, w, preferred_element_type=jnp.float32
            )
            if p.get("b") is not None:
                y = y + p["b"]
            return y.astype(x.dtype)
        return orig_linear(x, p)

    from wadt.ops.gram import split_patches

    def make_variant(name):
        """Each returns (tokens_fn, linear_fn) producing identical math."""
        if name == "fused_cdk":
            return tokens_unflat, linear_fused
        if name == "one_einsum":
            # let XLA pick the contraction path for patches x patches x W
            def tok(z, div):
                patches, area = split_patches(z, div)
                tok._area = area
                return patches  # [B,Np,N,C]

            def lin(x, p):
                if x.ndim == 4 and x.shape[-1] != p["w"].shape[0]:
                    c = x.shape[-1]
                    w = p["w"].reshape(c, c, -1)
                    y = jnp.einsum(
                        "bpnc,bpnd,cdk->bpk", x, x, w,
                        preferred_element_type=jnp.float32,
                    ) * (1.0 / float(tok._area))
                    if p.get("b") is not None:
                        y = y + p["b"]
                    return y.astype(x.dtype)
                return orig_linear(x, p)

            return tok, lin
        if name == "gram_pcdb":
            # emit the gram with batch OUTERMOST-minor reversed axes
            def tok(z, div):
                patches, area = split_patches(z, div)
                g = jnp.einsum(
                    "bpnc,bpnd->pcdb", patches, patches,
                    preferred_element_type=jnp.float32,
                ) * (1.0 / float(area))
                return g.astype(z.dtype)  # [Np,C,C,B]

            def lin(x, p):
                if x.ndim == 4 and x.shape[0] != x.shape[1]:
                    c = x.shape[1]
                    w = p["w"].reshape(c, c, -1)
                    y = jnp.einsum(
                        "pcdb,cdk->bpk", x, w,
                        preferred_element_type=jnp.float32,
                    )
                    if p.get("b") is not None:
                        y = y + p["b"]
                    return y.astype(x.dtype)
                return orig_linear(x, p)

            return tok, lin
        raise ValueError(name)

    for vname in ("fused_cdk", "one_einsum", "gram_pcdb"):
        pmg.patch_gram_tokens, pmg.linear = make_variant(vname)
        try:
            jax.clear_caches()
            fused = jax.jit(make_fwd())
            t_fused, top_fused = device_time_ms(fused, params, imgs, iters=20)
            print(f"{vname:12s}:      {t_fused*1e3:8.1f} us/batch  "
                  f"({t_base/t_fused:.3f}x)")
            for ms, name in top_fused[:4]:
                print(f"    {ms*1e3:8.1f} us  {name[:80]}")
            a = np.asarray(base(params, imgs), np.float32)
            b = np.asarray(fused(params, imgs), np.float32)
            print(f"    max logit drift: {np.abs(a-b).max():.2e}  "
                  f"argmax equal: {bool((a.argmax(-1) == b.argmax(-1)).all())}")
        finally:
            pmg.patch_gram_tokens, pmg.linear = orig_tokens, orig_linear


if __name__ == "__main__":
    main()
