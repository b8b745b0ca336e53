"""Scratch experiment: batch=1 ResNet stem maxpool formulations.

reduce_window(3x3 s2) over [1,112,112,64] bf16 costs 23.9 us in the RTM
streaming profile (~67 GB/s — far below roofline for a 1.6 MB read).
A/B against shifted-max compositions XLA can fuse better:

  A. reduce_window 3x3 s2 pad 1 (current)
  B. separable: reduce_window (3,1) then (1,3), strides split
  C. shifted strided slices: max of 9 slices x[dy::2, dx::2]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from wadt.config import enable_persistent_compilation_cache
    from wadt.utils.devtime import device_time_ms

    enable_persistent_compilation_cache()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 112, 112, 64), jnp.bfloat16)
    neg = -jnp.inf
    zero = jnp.zeros((), jnp.float32)

    def pool_rw(x, salt):
        y = jax.lax.reduce_window(
            x + salt.astype(x.dtype), neg, jax.lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
        return (y[0, 0, 0, 0] * 0).astype(jnp.float32)

    def pool_sep(x, salt):
        h = jax.lax.reduce_window(
            x + salt.astype(x.dtype), neg, jax.lax.max,
            (1, 3, 1, 1), (1, 2, 1, 1), [(0, 0), (1, 1), (0, 0), (0, 0)])
        y = jax.lax.reduce_window(
            h, neg, jax.lax.max,
            (1, 1, 3, 1), (1, 1, 2, 1), [(0, 0), (0, 0), (1, 1), (0, 0)])
        return (y[0, 0, 0, 0] * 0).astype(jnp.float32)

    def pool_shift(x, salt):
        xp = jnp.pad(x + salt.astype(x.dtype), ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=neg)
        acc = None
        for dy in range(3):
            for dx in range(3):
                sl = xp[:, dy : dy + 111 : 2, dx : dx + 111 : 2, :]
                acc = sl if acc is None else jnp.maximum(acc, sl)
        return (acc[0, 0, 0, 0] * 0).astype(jnp.float32)

    # numeric check of C vs A
    ya = jax.lax.reduce_window(x, neg, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                               [(0, 0), (1, 1), (1, 1), (0, 0)])
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    yc = None
    for dy in range(3):
        for dx in range(3):
            sl = xp[:, dy : dy + 111 : 2, dx : dx + 111 : 2, :]
            yc = sl if yc is None else jnp.maximum(yc, sl)
    print("shapes", ya.shape, yc.shape, "equal:",
          bool(jnp.all(ya == yc)))

    for name, fn in (("reduce_window", pool_rw), ("separable", pool_sep),
                     ("shifted-slices", pool_shift)):
        t, _ = device_time_ms(jax.jit(fn), x, zero, iters=30)
        print(f"{name:15s}: {t*1e3:6.1f} us")


if __name__ == "__main__":
    main()
