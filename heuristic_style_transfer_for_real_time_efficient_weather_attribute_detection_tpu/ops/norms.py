"""Normalization layers (functional, NHWC).

Numerical semantics match ``torch.nn`` with default eps=1e-5 so converted
checkpoints are bit-faithful:

- ``batch_norm_infer``: uses running stats (torch BatchNorm2d.eval()).
- ``instance_norm``: per-sample, per-channel stats over H,W; torch
  ``InstanceNorm2d(affine=True)`` has ``track_running_stats=False`` by
  default, so eval mode also uses instance statistics (models_PM.py:110).
- ``group_norm``: torch ``GroupNorm(num_groups=32)`` (models_PMG.py:103).
- ``layer_norm``: over the last dim (TransformerEncoderLayer norms).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

EPS = 1e-5


def batch_norm_infer(x: jnp.ndarray, p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """x: [..., C]; p: {scale, bias, mean, var} each [C]."""
    inv = p["scale"] * jnp.reciprocal(jnp.sqrt(p["var"] + EPS))
    return x * inv + (p["bias"] - p["mean"] * inv)


def batch_norm_train(
    x: jnp.ndarray, p: Dict[str, jnp.ndarray], reduce_axes=(0, 1, 2)
):
    """Batch statistics over N,H,W. Returns (y, batch_mean, batch_var).

    Caller is responsible for updating running stats (momentum 0.1, unbiased
    variance for the running update — torch semantics).
    """
    mean = jnp.mean(x, axis=reduce_axes)
    var = jnp.var(x, axis=reduce_axes)
    inv = p["scale"] * jnp.reciprocal(jnp.sqrt(var + EPS))
    return x * inv + (p["bias"] - mean * inv), mean, var


def instance_norm(x: jnp.ndarray, p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """x: [B, H, W, C]; per-(sample, channel) stats over spatial dims."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    y = (x - mean) * jnp.reciprocal(jnp.sqrt(var + EPS))
    return y * p["scale"] + p["bias"]


def group_norm(
    x: jnp.ndarray, p: Dict[str, jnp.ndarray], num_groups: int = 32
) -> jnp.ndarray:
    """x: [B, H, W, C]; stats per (sample, group) over H,W and channels-in-group."""
    b, h, w, c = x.shape
    g = num_groups
    xg = x.reshape(b, h, w, g, c // g)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    y = ((xg - mean) * jnp.reciprocal(jnp.sqrt(var + EPS))).reshape(b, h, w, c)
    return y * p["scale"] + p["bias"]


def layer_norm(x: jnp.ndarray, p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Normalize over the trailing dim; p: {scale, bias} each [D]."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jnp.reciprocal(jnp.sqrt(var + EPS)) * p["scale"] + p["bias"]


def apply_norm(x: jnp.ndarray, p: Dict[str, jnp.ndarray], kind: str) -> jnp.ndarray:
    """Dispatch used by conv trunks; ``kind`` in {batch, instance, group}."""
    if kind == "batch":
        return batch_norm_infer(x, p)
    if kind == "instance":
        return instance_norm(x, p)
    if kind == "group":
        return group_norm(x, p)
    raise ValueError(f"unknown norm kind {kind!r}")
