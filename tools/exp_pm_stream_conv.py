"""Scratch experiment: PM batch=1 final-conv lowering A/B.

The PM streaming profile shows the final k4 s1 conv (512->1024 at 14x14,
fusion.100) taking 83.8 of 185 us/frame at ~34 TF/s — XLA's batch-1 conv
lowering underuses the MXU.  A/B it against an im2col GEMM
([169, 8192] @ [8192, 1024]) at the same math.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def chain_time(fn, *args, inner=100, repeats=3):
    def chain(*a):
        def one(i, salt):
            return fn(*a, salt)

        return jax.lax.fori_loop(0, inner, one, jnp.zeros((), jnp.float32))

    c = jax.jit(chain)
    float(c(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(c(*args))
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def main():
    rng = np.random.RandomState(0)
    for dt in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.randn(1, 14, 14, 512), dt)
        w = jnp.asarray(rng.randn(4, 4, 512, 1024) * 0.05, dt)
        w_gemm = w.reshape(16 * 512, 1024)

        def conv(x, w, salt):
            y = jax.lax.conv_general_dilated(
                x + salt.astype(x.dtype), w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return (y[0, 0, 0, 0] * 0).astype(jnp.float32)

        def gemm(x, wg, salt):
            xp = jnp.pad(x + salt.astype(x.dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
            patches = jax.lax.conv_general_dilated_patches(
                xp, (4, 4), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )  # [1, 13, 13, 16*512]
            y = jnp.dot(patches.reshape(169, -1), wg,
                        preferred_element_type=jnp.float32)
            return (y[0, 0] * 0).astype(jnp.float32)

        def gemm_shift(x, w, salt):
            # im2col via 16 shifted slices: avoids the patches op entirely
            xp = jnp.pad(x + salt.astype(x.dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = jnp.zeros((169, 1024), jnp.float32)
            for dy in range(4):
                for dx in range(4):
                    sl = xp[0, dy : dy + 13, dx : dx + 13, :].reshape(169, 512)
                    acc = acc + jnp.dot(sl, w[dy, dx],
                                        preferred_element_type=jnp.float32)
            return (acc[0, 0] * 0).astype(jnp.float32)

        t_c = chain_time(conv, x, w)
        t_g = chain_time(gemm, x, w_gemm)
        t_s = chain_time(gemm_shift, x, w)
        name = "bf16" if dt == jnp.bfloat16 else "f32 "
        print(f"[{name}] conv {t_c*1e6:6.1f} us | patches-gemm {t_g*1e6:6.1f} "
              f"us | shift-gemm {t_s*1e6:6.1f} us")


if __name__ == "__main__":
    main()
