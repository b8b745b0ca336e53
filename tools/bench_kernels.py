#!/usr/bin/env python
"""A/B microbenchmarks: Pallas kernels vs the XLA-fused reference path.

Timing uses the device-side fori_loop chained-dependence protocol (see
bench.py's docstring: ``block_until_ready`` through this rig's TPU relay can
return before execution completes, so dispatch-loop timing is invalid).

Current verdict on the real v5e (recorded 2026-08-16, re-run to confirm):
the XLA fusion wins for both ops at production shapes — the per-image pallas
grid is too fine-grained for this tiny model.  The kernels stay available
(and parity-tested) as the native-layer substrate for larger configs.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INNER = 12  # unrolled — pallas_call inside lax.fori_loop compiles extremely
            # slowly through this rig's remote-compile service


def chained_time(make_step, *args, repeats=3):
    """make_step(*args) -> fn(salt)->salt; times INNER chained executions
    (unrolled inside one jit so a single dispatch covers all of them)."""
    import jax
    import jax.numpy as jnp

    def chain(*a):
        step = make_step(*a)
        salt = jnp.float32(0)
        for _ in range(INNER):
            salt = step(salt)
        return salt

    f = jax.jit(chain)
    float(f(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, (time.perf_counter() - t0) / INNER)
    return best


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--record", action="store_true",
                    help="store winners in results/kernel_ab.json (the "
                         "production dispatch table, ops/kernel_select.py)")
    args = ap.parse_args()

    # bounded relay-wedge probe (shared with bench.py) — after argparse so
    # --help / bad flags respond instantly even on a wedged relay
    import bench

    bench.wait_for_healthy_device(deadline_s=300.0)

    import jax
    import jax.numpy as jnp

    from wadt.config import IMAGENET_MEAN, IMAGENET_STD
    from wadt.ops import kernel_select
    from wadt.ops.gram import split_patches
    from wadt.ops.nn import conv2d, leaky_relu
    from wadt.ops.norms import batch_norm_infer
    from wadt.ops.pallas_kernels import fused_stem, patch_gram_tokens_pallas
    from wadt.ops.preprocess import normalize_uint8

    rng = np.random.RandomState(0)
    B = 512

    # ---- patch-Gram + token-proj consumer (shipped PMG shapes) ----
    z = jax.device_put(rng.randn(B, 14, 14, 96).astype(np.float32))
    w = jax.device_put(rng.randn(9216, 192).astype(np.float32) * 0.01)

    def gram_xla(x, div):
        # the XLA-fused reference path, inlined so the dispatch in
        # ops/gram.patch_gram_tokens cannot skew the A/B
        patches, area = split_patches(x, div)
        b, np_, n, c = patches.shape
        g = jnp.einsum("bpnc,bpnd->bpcd", patches, patches,
                       preferred_element_type=jnp.float32) * (1.0 / float(area))
        return g.reshape(b, np_, c * c).astype(x.dtype)

    def make_gram(gram_fn):
        def mk(z, w):
            def step(salt):
                tok = gram_fn(z + salt, 3)
                out = jnp.dot(tok, w, preferred_element_type=jnp.float32)
                return out[0, 0, 0] * 0.0

            return step

        return mk

    np.testing.assert_allclose(
        np.asarray(patch_gram_tokens_pallas(z, 3)),
        np.asarray(gram_xla(z, 3)),
        atol=2e-3, rtol=2e-3,
    )
    t_xla = chained_time(make_gram(gram_xla), z, w)
    t_pal = chained_time(make_gram(patch_gram_tokens_pallas), z, w)
    print(f"gram+proj  XLA: {t_xla*1e6:9.1f}us   pallas: {t_pal*1e6:9.1f}us   "
          f"XLA-relative x{t_xla/t_pal:.2f}")
    if args.record:
        kernel_select.record(
            "patch_gram_tokens", "pallas" if t_pal < t_xla else "xla",
            {"xla": t_xla * 1e6, "pallas": t_pal * 1e6}, f"b{B}x14x14x96 div3",
        )
        print(f"recorded -> {kernel_select.RECORD_PATH}")

    # ---- fused stem (uint8 -> s4 patch-embed, shipped ndf=32) ----
    imgs = jax.device_put(rng.randint(0, 256, (B, 224, 224, 3), np.uint8))
    k, cout = 4, 32
    conv_w = jax.device_put(rng.randn(k, k, 3, cout).astype(np.float32) * 0.1)
    bn = {
        "scale": jnp.ones((cout,), jnp.float32),
        "bias": jnp.zeros((cout,), jnp.float32),
        "mean": jnp.zeros((cout,), jnp.float32),
        "var": jnp.ones((cout,), jnp.float32),
    }
    inv = bn["scale"] / jnp.sqrt(bn["var"] + 1e-5)
    scale, shift = inv, bn["bias"] - bn["mean"] * inv

    def mk_xla(u8, cw):
        def step(salt):
            x = normalize_uint8(u8) + salt
            y = leaky_relu(batch_norm_infer(conv2d(x, {"w": cw}, stride=k), bn), 0.2)
            return y[0, 0, 0, 0] * 0.0

        return step

    def mk_pal(u8, cw):
        def step(salt):
            y = fused_stem(u8, cw, scale, shift, IMAGENET_MEAN, IMAGENET_STD, k)
            return y[0, 0, 0, 0] * 0.0 + salt * 0.0

        return step

    try:
        t_xla = chained_time(mk_xla, imgs, conv_w)
        t_pal = chained_time(mk_pal, imgs, conv_w)
        print(f"stem       XLA: {t_xla*1e6:9.1f}us   pallas: {t_pal*1e6:9.1f}us   "
              f"XLA-relative x{t_xla/t_pal:.2f}")
    except Exception as e:  # Mosaic feature gaps differ across libtpu versions
        print(f"stem pallas kernel unavailable on this backend: {type(e).__name__}")


if __name__ == "__main__":
    main()
