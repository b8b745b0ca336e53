"""Feasibility probe: does XLA on this TPU lower int8 conv/dot to the MXU,
and what speedup does an int8 ResNet-50 stage shape get vs bf16?

Scratch experiment (not part of the shipped surface).  Uses the chained
device-loop protocol from bench.py.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def chain_time(fn, *args, inner=20, repeats=3):
    def chain(*a):
        def one(i, salt):
            out = fn(*a, salt)
            return out

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
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.RandomState(0)
    B = 256
    # layer2-ish shape: 28x28x512 input, 3x3 conv 128->128 is the heavy one;
    # use a bottleneck-middle conv shape: [B,28,28,128] * w[3,3,128,128]
    for (H, C, K) in [(56, 64, 64), (28, 128, 128), (14, 256, 256)]:
        x_f = jnp.asarray(rng.randn(B, H, H, C), jnp.bfloat16)
        w_f = jnp.asarray(rng.randn(3, 3, C, K) * 0.1, jnp.bfloat16)
        x_i = jnp.asarray(rng.randint(-127, 128, (B, H, H, C)), jnp.int8)
        w_i = jnp.asarray(rng.randint(-127, 128, (3, 3, C, K)), jnp.int8)

        def conv_bf16(x, w, salt):
            y = jax.lax.conv_general_dilated(
                x + salt.astype(jnp.bfloat16), w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return (y[0, 0, 0, 0] * 0).astype(jnp.float32)

        def conv_int8(x, w, salt):
            xs = jnp.bitwise_xor(x, salt.astype(jnp.int8))
            y = jax.lax.conv_general_dilated(
                xs, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            return (y[0, 0, 0, 0] * 0).astype(jnp.float32)

        t_bf = chain_time(conv_bf16, x_f, w_f)
        try:
            t_i8 = chain_time(conv_int8, x_i, w_i)
        except Exception as e:  # noqa
            t_i8 = float("nan")
            print(f"int8 conv failed at {H}x{H}x{C}: {type(e).__name__}: {e}",
                  file=sys.stderr)
        flops = 2 * B * H * H * C * K * 9
        print(
            f"[{H}x{H} {C}->{K} 3x3 B={B}] bf16 {t_bf*1e3:.3f} ms "
            f"({flops/t_bf/1e12:.1f} TF/s) | int8 {t_i8*1e3:.3f} ms "
            f"({flops/t_i8/1e12:.1f} TOP/s) | speedup {t_bf/t_i8:.2f}x"
        )


if __name__ == "__main__":
    main()
