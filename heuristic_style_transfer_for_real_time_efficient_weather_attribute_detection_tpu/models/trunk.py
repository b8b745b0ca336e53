"""Shared PatchGAN-style conv trunk (used by both PM and PMG families).

Both trunks are built by the same doubling rule (models_PM.py:114-137,
models_PMG.py:107-129): starting at ``ndf`` filters, add
Conv(k, s, p) -> Norm -> LeakyReLU(0.2) blocks, doubling filters, while the
receptive-field counter (initialized to ``patch_size``) stays > 4 after
repeated division by the stride AND the *current* filter count is <= 512;
then one final block (1x1 s1 for PMG, k4 s1 p1 for PM) to ``num_filters``.

The plan is pure static Python — shapes are fixed at trace time.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.nn import conv2d, init_conv, init_norm, leaky_relu
from ..ops.norms import apply_norm


class ConvBlock(NamedTuple):
    cin: int
    cout: int
    kernel: int
    stride: int
    pad: int


def trunk_plan(
    ndf: int,
    patch_size: int,
    kernel: int,
    stride: int,
    pad: int,
    final_kernel: int,
    final_pad: int,
    in_nc: int = 3,
) -> Tuple[ConvBlock, ...]:
    """Static layer plan for the doubling trunk + its final s1 block."""
    blocks: List[ConvBlock] = []
    cin, nf, rf = in_nc, ndf, float(patch_size)
    while rf > 4 and nf <= 512:
        blocks.append(ConvBlock(cin, nf, kernel, stride, pad))
        cin, nf, rf = nf, nf * 2, rf / stride
    blocks.append(ConvBlock(cin, nf, final_kernel, 1, final_pad))
    return tuple(blocks)


def init_trunk(
    key, plan: Tuple[ConvBlock, ...], norm: str, conv_bias: bool
) -> List[Dict]:
    keys = jax.random.split(key, len(plan))
    return [
        {
            "conv": init_conv(k, b.kernel, b.kernel, b.cin, b.cout, bias=conv_bias),
            "norm": init_norm(b.cout, norm),
        }
        for k, b in zip(keys, plan)
    ]


def apply_trunk(
    params: List[Dict], x: jnp.ndarray, plan: Tuple[ConvBlock, ...], norm: str
) -> jnp.ndarray:
    """NHWC conv trunk: (Conv -> Norm -> LeakyReLU(0.2)) per planned block."""
    for p, b in zip(params, plan):
        x = conv2d(x, p["conv"], stride=b.stride, padding=b.pad)
        x = apply_norm(x, p["norm"], norm)
        x = leaky_relu(x, 0.2)
    return x


def apply_trunk_from_last_conv(
    params: List[Dict], last_conv_out: jnp.ndarray, plan: Tuple[ConvBlock, ...],
    norm: str,
) -> jnp.ndarray:
    """Finish the trunk from the LAST block's raw conv output (the tensor
    pytorch_grad_cam hooks — the Conv2d module's output, before its norm and
    LeakyReLU).  Used by Grad-CAM so attention maps match the reference's
    target layer exactly (Functions/PMG_evaluation.py:59-64)."""
    x = apply_norm(last_conv_out, params[-1]["norm"], norm)
    return leaky_relu(x, 0.2)


def trunk_last_conv(
    params: List[Dict], x: jnp.ndarray, plan: Tuple[ConvBlock, ...], norm: str
) -> jnp.ndarray:
    """Run the trunk up to and including the final block's convolution,
    returning the pre-norm conv output (the reference Grad-CAM target)."""
    for p, b in zip(params[:-1], plan[:-1]):
        x = conv2d(x, p["conv"], stride=b.stride, padding=b.pad)
        x = apply_norm(x, p["norm"], norm)
        x = leaky_relu(x, 0.2)
    return conv2d(x, params[-1]["conv"], stride=plan[-1].stride, padding=plan[-1].pad)


def apply_trunk_train(
    params: List[Dict],
    x: jnp.ndarray,
    plan: Tuple[ConvBlock, ...],
    norm: str,
    momentum: float = 0.1,
):
    """Training-mode trunk: BatchNorm uses batch statistics and returns
    updated running stats (torch semantics: momentum 0.1, unbiased variance
    in the running update).  Instance/group norms are stat-free, so train ==
    eval for them.  Returns (features, new_trunk_params).
    """
    from ..ops.norms import batch_norm_train

    new_params: List[Dict] = []
    for p, b in zip(params, plan):
        x = conv2d(x, p["conv"], stride=b.stride, padding=b.pad)
        if norm == "batch":
            x, mean, var = batch_norm_train(x, p["norm"])
            n = x.shape[0] * x.shape[1] * x.shape[2]
            unbiased = var * (n / max(n - 1, 1))
            new_norm = {
                "scale": p["norm"]["scale"],
                "bias": p["norm"]["bias"],
                "mean": (1 - momentum) * p["norm"]["mean"] + momentum * mean,
                "var": (1 - momentum) * p["norm"]["var"] + momentum * unbiased,
            }
        else:
            x = apply_norm(x, p["norm"], norm)
            new_norm = p["norm"]
        x = leaky_relu(x, 0.2)
        new_params.append({"conv": p["conv"], "norm": new_norm})
    return x, new_params
