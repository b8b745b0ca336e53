"""Basic functional NN ops: conv, linear, SE channel attention, initializers.

Layout: NHWC activations, HWIO conv kernels.  ``preferred_element_type`` is
pinned to float32 on every matmul/conv so the MXU accumulates in f32 even when
activations/weights are bf16.
"""

from __future__ import annotations

import contextlib
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

# Trace-time conv accumulation policy.  Default: pin the conv OUTPUT dtype to
# f32 (preferred_element_type) so bf16 inference keeps f32 accumulation all
# the way into the next op — this is what the bf16 parity bounds were
# measured under.  The mixed-precision TRAIN path clears it because jax's
# conv transpose rule cannot transpose a bf16 conv with an f32 cotangent
# (TypeError in jax 0.9.0); the TPU MXU still accumulates each conv in f32
# internally, the result is simply rounded to bf16 between layers.
_CONV_PET: Optional[jnp.dtype] = jnp.float32


@contextlib.contextmanager
def conv_accum(pet: Optional[jnp.dtype]):
    """Temporarily set (or clear, with None) the convs'
    ``preferred_element_type``.  Trace-time only — wrap the forward call."""
    global _CONV_PET
    old, _CONV_PET = _CONV_PET, pet
    try:
        yield
    finally:
        _CONV_PET = old


def conv2d(
    x: jnp.ndarray,
    p: Dict[str, jnp.ndarray],
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """2-D convolution, NHWC x HWIO -> NHWC, symmetric integer padding.

    Matches ``torch.nn.Conv2d(stride, padding)`` on converted weights.
    """
    dn = jax.lax.conv_dimension_numbers(x.shape, p["w"].shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=dn,
        preferred_element_type=_CONV_PET,
    )
    if "b" in p and p["b"] is not None:
        y = y + p["b"]
    return y.astype(x.dtype)


def linear(x: jnp.ndarray, p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """x: [..., in] @ w[in, out] + b[out]."""
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    if "b" in p and p["b"] is not None:
        y = y + p["b"]
    return y.astype(x.dtype)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * negative_slope)


def se_block(x: jnp.ndarray, p: Dict[str, Dict[str, jnp.ndarray]]) -> jnp.ndarray:
    """Squeeze-and-Excitation channel attention, NHWC.

    ``w = sigmoid(fc2(relu(fc1(mean_hw(x)))))``; matches both the reference's
    PMG ``SEBlock`` (models_PMG.py:15-30, bias-free Linears) and PM ``SE``
    (models_PM.py:11-23, biased Linears) — bias presence is a param question,
    not a code path.
    """
    s = jnp.mean(x, axis=(1, 2))  # [B, C]
    s = jax.nn.relu(linear(s, p["fc1"]))
    s = jax.nn.sigmoid(linear(s, p["fc2"]))
    return x * s[:, None, None, :]


# ---------------------------------------------------------------------------
# Initializers (torch-default-compatible shapes; used for from-scratch init,
# benchmarking and tests — parity with trained checkpoints goes through the
# converter, not through init).
# ---------------------------------------------------------------------------


def _kaiming_uniform(key, shape, fan_in: int, a: float = math.sqrt(5)):
    gain = math.sqrt(2.0 / (1 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_conv(
    key,
    kh: int,
    kw: int,
    cin: int,
    cout: int,
    bias: bool = False,
) -> Dict[str, jnp.ndarray]:
    """HWIO conv params with torch's default kaiming-uniform init."""
    kw_, kb = jax.random.split(key)
    fan_in = cin * kh * kw
    p = {"w": _kaiming_uniform(kw_, (kh, kw, cin, cout), fan_in)}
    if bias:
        bound = 1.0 / math.sqrt(fan_in)
        p["b"] = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    return p


def init_linear(key, cin: int, cout: int, bias: bool = True) -> Dict[str, jnp.ndarray]:
    kw_, kb = jax.random.split(key)
    p = {"w": _kaiming_uniform(kw_, (cin, cout), cin)}
    if bias:
        bound = 1.0 / math.sqrt(cin)
        p["b"] = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    return p


def init_norm(c: int, kind: str) -> Dict[str, jnp.ndarray]:
    p = {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}
    if kind == "batch":
        p["mean"] = jnp.zeros((c,), jnp.float32)
        p["var"] = jnp.ones((c,), jnp.float32)
    return p


def init_se(key, c: int, r: int = 16, bias: bool = False) -> Dict[str, Dict]:
    k1, k2 = jax.random.split(key)
    hid = max(1, c // r)
    return {
        "fc1": init_linear(k1, c, hid, bias=bias),
        "fc2": init_linear(k2, hid, c, bias=bias),
    }


def cast_tree(tree, dtype: Optional[jnp.dtype]):
    """Cast every floating-point leaf of a param pytree (None = no-op)."""
    if dtype is None:
        return tree
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )
