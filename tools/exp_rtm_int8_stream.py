"""Scratch experiment: RTM streaming weight-only int8 probe.

The folded RTM streaming path (models/rtm.fold_stream_weights) is still
HBM-weight-bound at batch=1: one stacked [12, 2048, 2048] read per frame
(~100 MB bf16 ~ 123 us at roofline) plus ~47 MB of trunk weights.  Weight-only
int8 with in-kernel dequant would halve the dominant read.  This probe
measures the stacked einsum 'btc,tcd->btd' (B=1) three ways:

  1. bf16 weights (current production path),
  2. XLA int8->bf16 convert + einsum (does XLA fuse the convert or
     materialize a bf16 copy?),
  3. Pallas kernel: int8 tiles dequantized in VMEM, bf16 dot.

Run on the chip; integrate ONLY if (2) or (3) clearly beats (1).
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

T, C, D = 12, 2048, 2048


def chain_time(fn, *args, inner=200, repeats=3):
    def chain(*a):
        def one(i, acc):
            return acc + fn(*a, acc)

        return jax.lax.fori_loop(0, inner, one, jnp.zeros((), jnp.float32))

    c = jax.jit(chain)
    float(c(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(c(*args))
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def bf16_einsum(x, w, salt):
    y = jnp.einsum("btc,tcd->btd", x + salt.astype(x.dtype), w,
                   preferred_element_type=jnp.float32)
    return y[0, 0, 0] * 0


def int8_xla(x, w8, scale, salt):
    w = w8.astype(jnp.bfloat16) * scale[:, None, :]
    y = jnp.einsum("btc,tcd->btd", x + salt.astype(x.dtype), w,
                   preferred_element_type=jnp.float32)
    return y[0, 0, 0] * 0


def _dequant_matvec_kernel(x_ref, w8_ref, scale_ref, o_ref):
    # one task per program: row t of x @ dequant(w8 rows t*C..) -> row t of o
    t = pl.program_id(0)
    # Mosaic has no direct int8 -> bf16 cast; hop through int32 (same gap as
    # the uint8 -> f32 normalize kernels, see CLAUDE.md)
    w = w8_ref[...].astype(jnp.int32).astype(jnp.bfloat16)  # [C, D]
    x = x_ref[pl.ds(t, 1), :]  # [1, C]
    y = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[pl.ds(t, 1), :] = y * scale_ref[pl.ds(t, 1), :]


def int8_pallas(x, w8, scale, salt):
    xs = (x + salt.astype(x.dtype))[0]  # [T, C]
    y = pl.pallas_call(
        _dequant_matvec_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((T, C), lambda t: (0, 0)),
            pl.BlockSpec((C, D), lambda t: (t, 0)),  # w8 flattened [T*C, D]
            pl.BlockSpec((T, D), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((T, D), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, D), jnp.float32),
    )(xs, w8.reshape(T * C, D), scale)
    return y[0, 0] * 0


def main():
    # NOTE: a fori-loop chain around pallas_call compiles >10 min on this rig
    # (CLAUDE.md); time all variants via the profiler's device timestamps.
    from wadt.utils.devtime import device_time_ms

    rng = np.random.RandomState(0)
    w = rng.randn(T, C, D).astype(np.float32) * 0.05
    # per-(task, output-column) symmetric scales
    amax = np.abs(w).max(axis=1)  # [T, D]
    scale = (amax / 127.0).astype(np.float32)
    w8 = np.clip(np.round(w / scale[:, None, :]), -127, 127).astype(np.int8)

    x = jnp.asarray(rng.randn(1, T, C), jnp.bfloat16)
    wb = jnp.asarray(w, jnp.bfloat16)
    w8j = jnp.asarray(w8)
    sj = jnp.asarray(scale, jnp.bfloat16)
    zero = jnp.zeros((), jnp.float32)

    t1, _ = device_time_ms(jax.jit(bf16_einsum), x, wb, zero, iters=30)
    t2, _ = device_time_ms(jax.jit(int8_xla), x, w8j, sj, zero, iters=30)
    print(f"bf16 einsum {t1*1e3:7.1f} us | int8-xla {t2*1e3:7.1f} us "
          f"(device time, 30 dispatches)")
    try:
        t3, _ = device_time_ms(
            jax.jit(int8_pallas), x, w8j,
            jnp.asarray(scale), zero, iters=30)
        print(f"int8-pallas {t3*1e3:7.1f} us")
    except Exception as e:
        print("int8-pallas failed:", str(e)[:200])

    # numeric sanity: relative error of the dequantized product
    yref = np.einsum("btc,tcd->btd", np.asarray(x, np.float32), w)
    yq = np.einsum("btc,tcd->btd", np.asarray(x, np.float32),
                   w8.astype(np.float32) * scale[:, None, :])
    rel = np.abs(yq - yref).max() / (np.abs(yref).max() + 1e-9)
    print(f"int8 dequant max rel err: {rel:.4f}")


if __name__ == "__main__":
    main()
