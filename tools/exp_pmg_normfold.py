#!/usr/bin/env python
"""Experiment: fold the device normalize affine into the PMG stem GEMM.

The packed forward (models/pmg.apply_packed) does
``x = u8 * scale - shift`` then ``x @ W0`` — the affine is linear, so it
can be folded into the stem weights exactly:

    W' = scale[:, None] * W0        b' = b0 - shift @ W0
    y  = u8.astype(dtype) @ W' + b'

If XLA materializes the normalized [512,56,56,48] f32 tensor (308 MB at
batch 512, a ~470 us HBM round-trip at the 819 GB/s peak) the fold wins
big; if the convert+affine already fuse into the GEMM operand read, it
measures ~1.0x and the fold is pointless complexity.

Measures full apply_packed device time (trace protocol, iters=20) at the
shipped batch-512 config, baseline vs folded, plus numeric drift and a
batch=1 streaming check.

MEASURED (2026-08-17, one v5e, trace protocol iters=20) — SHIPPED:
  batch 512: baseline 1131.2 us | i32hop 1070.8 (1.056x) | direct 1149.3 (0.984x)
  batch 128: baseline  264.8 us | i32hop  249.7 (1.061x) | direct  263.5 (1.005x)
  batch  64: baseline  198.3 us | i32hop  181.5 (1.092x) | direct  198.6 (0.998x)
  batch  32: baseline  193.3 us | i32hop  183.8 (1.052x) | direct  179.6 (1.077x)
  batch  16: baseline   76.3 us | i32hop   71.3 (1.070x) | direct   68.5 (1.112x)
  batch   1: baseline   17.6 us | i32hop   17.2 (1.022x) | direct   16.7 (1.055x)
  --parity (full-f32 matmul precision): drift 8.2e-08 / 6.0e-08, argmax equal
  (fast-default drift 5-7e-04 = the usual conv-vs-GEMM reassociation class).
The standalone normalize was NOT fused into the GEMM by XLA — folding it
wins at every batch.  The leftover u8->f32 convert lowers best via an int32
hop for batch >=64 and directly below that (crossover measured above); both
variants shipped in models/pmg.apply_packed switched on the static batch.
Full-engine confirmation: bench.py 456.2k -> 481.6k img/s (+5.6%) same
session, same relay conditions.

Usage: python tools/exp_pmg_normfold.py [--parity]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", action="store_true",
                    help="pin full-f32 matmul precision and check drift only")
    args = ap.parse_args()

    if args.parity:
        import wadt

        wadt.config.enable_parity_precision()

    import jax
    import jax.numpy as jnp

    import bench
    import wadt.models.pmg as pmg
    from wadt.config import enable_persistent_compilation_cache
    from wadt.ops.preprocess import packed_affine, s2d_pack_uint8
    from wadt.utils.devtime import device_time_ms

    enable_persistent_compilation_cache()
    mod, spec, params = bench.build("pmg")
    k = spec.plan[0].kernel
    b0 = spec.plan[0]

    def folded_params(params, dtype):
        """Exact normalize fold: W' = scale*W0, b' = b0 - shift@W0."""
        scale, shift = packed_affine(k)
        p0 = params["trunk"][0]
        w0 = np.asarray(p0["conv"]["w"], np.float32).reshape(-1, b0.cout)
        wf = (scale[:, None] * w0).astype(dtype)
        bias = np.asarray(p0["conv"]["b"], np.float32) if p0["conv"].get("b") is not None else 0.0
        bf = (bias - shift @ w0).astype(np.float32)
        return jnp.asarray(wf), jnp.asarray(bf)

    def make_folded(dtype, cast):
        wf, bf = folded_params(params, dtype)

        def fwd(z8):
            u = (z8.astype(jnp.int32).astype(dtype) if cast == "i32hop"
                 else z8.astype(dtype))
            y = jnp.einsum("bhwc,cd->bhwd", u, wf,
                           preferred_element_type=jnp.float32)
            y = (y + bf).astype(dtype)
            y = pmg.leaky_relu(pmg.apply_norm(y, params["trunk"][0]["norm"], spec.norm), 0.2)
            for pp, bk in zip(params["trunk"][1:], spec.plan[1:]):
                y = pmg.conv2d(y, pp["conv"], stride=bk.stride, padding=bk.pad)
                y = pmg.leaky_relu(pmg.apply_norm(y, pp["norm"], spec.norm), 0.2)
            logits, _ = pmg.head_apply(params, y, spec, ())
            return logits

        return jax.jit(fwd)

    def make_base():
        def fwd(z8):
            logits, _ = pmg.apply_packed(params, z8, spec)
            return logits

        return jax.jit(fwd)

    rng = np.random.RandomState(0)
    for batch in (512, 1):
        raw = rng.randint(0, 256, (batch, 224, 224, 3), np.uint8)
        z8 = jax.device_put(s2d_pack_uint8(raw, k))
        base = make_base()
        lb = np.asarray(base(z8))
        pb = np.asarray(jax.nn.softmax(lb, -1))
        if not args.parity:
            tb, _ = device_time_ms(base, z8, iters=20)
            print(f"[normfold] batch {batch}: baseline {tb*1e3:.1f} us")
        for cast in ("i32hop", "direct"):
            fold = make_folded(jnp.float32, cast)
            lf = np.asarray(fold(z8))
            pf = np.asarray(jax.nn.softmax(lf, -1))
            drift = float(np.max(np.abs(pb - pf)))
            am = bool(np.array_equal(np.argmax(lb, -1), np.argmax(lf, -1)))
            if args.parity:
                print(f"[normfold --parity] batch {batch} {cast}: drift "
                      f"{drift:.2e} argmax_equal={am}")
                continue
            tf, _ = device_time_ms(fold, z8, iters=20)
            print(f"[normfold] batch {batch} {cast}: {tf*1e3:.1f} us "
                  f"({tb/tf:.3f}x)  drift {drift:.2e} argmax_equal={am}")


if __name__ == "__main__":
    main()
