"""Scratch experiment: weight-only int8 for RTM's batch=1 trunk convs.

After the folded_q8 + s2d stem path (253 us/frame), the remaining HBM
weight traffic is the ResNet trunk (~47 MB bf16 ~ 57 us at roofline).
XLA fuses int8->bf16 dequant into einsum weight reads (measured, the
attention fold win); this probes whether the same holds for CONV weight
operands at batch=1 layer3/layer4 shapes, or whether the convert
materializes a bf16 copy (extra traffic).  Integrate only on a clear win.
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
    dn = ("NHWC", "HWIO", "NHWC")

    # batch=1 RTM trunc5 layer3 / layer4-ish conv shapes
    cases = [
        ("l3 3x3 256>256 @14", (1, 14, 14, 256), (3, 3, 256, 256)),
        ("l3 1x1 1024>256 @14", (1, 14, 14, 1024), (1, 1, 1024, 256)),
        ("l3 1x1 256>1024 @14", (1, 14, 14, 256), (1, 1, 256, 1024)),
    ]
    for name, xs, ws in cases:
        x = jnp.asarray(rng.randn(*xs), jnp.bfloat16)
        w = (rng.randn(*ws) * 0.05).astype(np.float32)
        amax = np.abs(w).max(axis=(0, 1, 2))
        scale = np.maximum(amax, 1e-12) / 127.0
        w8 = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        wb = jnp.asarray(w, jnp.bfloat16)
        w8j = jnp.asarray(w8)
        sj = jnp.asarray(scale, jnp.bfloat16)
        zero = jnp.zeros((), jnp.float32)

        def conv_bf16(x, w, salt):
            y = jax.lax.conv_general_dilated(
                x + salt.astype(x.dtype), w, (1, 1), "SAME",
                dimension_numbers=dn)
            return (y[0, 0, 0, 0] * 0).astype(jnp.float32)

        def conv_q8(x, w8, s, salt):
            w = w8.astype(jnp.bfloat16) * s
            y = jax.lax.conv_general_dilated(
                x + salt.astype(x.dtype), w, (1, 1), "SAME",
                dimension_numbers=dn)
            return (y[0, 0, 0, 0] * 0).astype(jnp.float32)

        tb, _ = device_time_ms(jax.jit(conv_bf16), x, wb, zero, iters=30)
        tq, _ = device_time_ms(jax.jit(conv_q8), x, w8j, sj, zero, iters=30)
        print(f"[{name}] bf16 {tb*1e3:6.1f} us | int8-dequant {tq*1e3:6.1f} us")


if __name__ == "__main__":
    main()
