"""Scratch experiment: RTM stem via space-to-depth at batch=1.

The folded_q8 RTM frame profile (308 us) shows ~100 us around the 7x7 s2
stem: the conv fusion (~49 us) plus layout copies (~26) plus maxpool (~24).
The MLPerf-style space-to-depth transform makes the stem a 4x4 s1 conv over
a host-packed [112,112,12] image (pad the kernel to 8x8 with a zero
top-left row/col; exact math):

    y[o] = sum_{k=0..6} w7[k] x[2o-3+k]  ==  sum_{k'=0..7} w8[k'] x[2o-4+k']
    with w8[0]=0, w8[1:]=w7 -> packed taps p = o-2..o+1, stride 1, pad (2, 1).

Measures the full stem (normalize -> conv -> scale/bias relu -> 3x3 s2
maxpool) both ways from uint8 input, with the device time from profiler
traces.  Integrate only on a clear win.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def pack_stem_weights(w7: np.ndarray) -> np.ndarray:
    """[7,7,3,64] -> [4,4,12,64] for k=2 s2d input (s2d_pack_uint8 channel
    order: ky*k*C + kx*C + ch)."""
    kh, kw, cin, cout = w7.shape
    assert (kh, kw) == (7, 7)
    w8 = np.zeros((8, 8, cin, cout), w7.dtype)
    w8[1:, 1:] = w7
    wp = np.zeros((4, 4, 4 * cin, cout), w7.dtype)
    for py in range(4):
        for px in range(4):
            for ky in range(2):
                for kx in range(2):
                    wp[py, px, ky * 2 * cin + kx * cin:(ky * 2 + kx + 1) * cin] = \
                        w8[2 * py + ky, 2 * px + kx]
    return wp


def main():
    from wadt.ops.preprocess import (
        normalize_uint8,
        normalize_uint8_packed,
        s2d_pack_uint8,
    )
    from wadt.utils.devtime import device_time_ms

    rng = np.random.RandomState(0)
    w7 = (rng.randn(7, 7, 3, 64) * 0.1).astype(np.float32)
    wp = pack_stem_weights(w7)
    gamma = rng.rand(64).astype(np.float32) + 0.5
    beta = rng.randn(64).astype(np.float32)

    u8 = rng.randint(0, 256, (1, 224, 224, 3), np.uint8)
    u8p = s2d_pack_uint8(u8, 2)  # [1, 112, 112, 12]

    dn = ("NHWC", "HWIO", "NHWC")

    def stem_generic(frame, w, salt):
        x = normalize_uint8(frame, jnp.bfloat16) + salt.astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            x, w, (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn)
        y = jnp.maximum(y * gamma + beta, 0.0)
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])
        return (y[0, 0, 0, 0] * 0).astype(jnp.float32)

    def stem_packed(packed, w, salt):
        x = normalize_uint8_packed(packed, 2, jnp.bfloat16)
        x = x + salt.astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(2, 1), (2, 1)], dimension_numbers=dn)
        y = jnp.maximum(y * gamma + beta, 0.0)
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])
        return (y[0, 0, 0, 0] * 0).astype(jnp.float32)

    # numeric equivalence at f32 (full outputs, not the timing scalar)
    def full_generic(frame):
        x = normalize_uint8(frame, jnp.float32)
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(w7), (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn)

    def full_packed(packed):
        x = normalize_uint8_packed(packed, 2, jnp.float32)
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(wp), (1, 1), [(2, 1), (2, 1)], dimension_numbers=dn)

    a = np.asarray(full_generic(jnp.asarray(u8)))
    b = np.asarray(full_packed(jnp.asarray(u8p)))
    print("shapes", a.shape, b.shape,
          "max abs diff", float(np.abs(a - b).max()))

    zero = jnp.zeros((), jnp.float32)
    tg, topg = device_time_ms(
        jax.jit(stem_generic), jnp.asarray(u8), jnp.asarray(w7, jnp.bfloat16),
        zero, iters=30)
    tp, topp = device_time_ms(
        jax.jit(stem_packed), jnp.asarray(u8p), jnp.asarray(wp, jnp.bfloat16),
        zero, iters=30)
    print(f"stem generic {tg*1e3:6.1f} us | s2d-packed {tp*1e3:6.1f} us")
    for ms, name in topg[:3]:
        print(f"  [gen] {ms*1e3:7.1f} us  {name[:100]}")
    for ms, name in topp[:3]:
        print(f"  [s2d] {ms*1e3:7.1f} us  {name[:100]}")


if __name__ == "__main__":
    main()
