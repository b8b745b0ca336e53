#!/usr/bin/env python
"""Probe: can compiler options lift RTM bf16's STANDALONE-dispatch regime
toward the loop program's buffer placement?

tools/exp_rtm_regimes.py showed the one-shot program runs the layer1 conv
fusions ~20% slower than the same fusions inside a fori_loop, where XLA
places the [128,56,56,64] intermediates in VMEM (S(1)).  The only
user-level lever JAX exposes is per-jit ``compiler_options``; this probe
A/Bs the scoped-VMEM limit (and nothing else — other TPU flags are not
portable).  Outcome feeds the dead-end ledger either way.

Usage: python tools/exp_rtm_vmem.py [--batch 128]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    from wadt.config import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    import bench

    bench.wait_for_healthy_device(deadline_s=300.0)

    import jax
    import jax.numpy as jnp

    from wadt.ops.nn import cast_tree
    from wadt.ops.preprocess import normalize_uint8
    from wadt.utils.devtime import device_time_ms

    mod, spec, params = bench.build("rtm")
    params = cast_tree(params, jnp.bfloat16)
    rng = np.random.RandomState(0)
    imgs = jax.device_put(
        rng.randint(0, 256, (args.batch, 224, 224, 3), np.uint8))

    def fwd(p, u8):
        logits, _ = mod.apply(p, normalize_uint8(u8, jnp.bfloat16), spec)
        return logits

    cases = [
        ("default", None),
        ("vmem_96mib", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
        ("vmem_64mib", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ]
    for name, opts in cases:
        try:
            if opts is None:
                jitted = jax.jit(fwd)
            else:
                jitted = jax.jit(fwd, compiler_options=opts)
            t_ms, _ = device_time_ms(jitted, params, imgs, iters=20)
            print(f"{name:12s}: {t_ms:8.3f} ms/fwd = "
                  f"{args.batch / (t_ms/1e3):10,.0f} img/s")
        except Exception as e:
            print(f"{name:12s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
