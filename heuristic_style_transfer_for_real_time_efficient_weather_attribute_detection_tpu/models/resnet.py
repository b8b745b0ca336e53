"""ResNet-50 backbone in functional JAX (torchvision-layout-compatible).

The RTM family truncates a torchvision ResNet-50 after N top-level children
(conv1, bn1, relu, maxpool, layer1..layer4 — models_RTM.py:53-56).  We
implement the same stage structure so converted torchvision/RTM checkpoints
map 1:1; inference-mode BatchNorm uses running stats.

Param pytree:
  {"conv1": {"w"}, "bn1": {...},
   "layer1": [block, ...], ..., "layer4": [block, ...]}
  block = {"conv1","bn1","conv2","bn2","conv3","bn3", optional "downsample":
           {"conv","bn"}}
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..ops.nn import conv2d, init_conv, init_norm
from ..ops.norms import batch_norm_infer

# (num_blocks, planes) per stage; expansion 4 (ResNet-50).
STAGES: Tuple[Tuple[int, int], ...] = ((3, 64), (4, 128), (6, 256), (3, 512))
EXPANSION = 4

# Top-level "children" in torchvision order (avgpool/fc already dropped).
CHILDREN = ("conv1", "bn1", "relu", "maxpool", "layer1", "layer2", "layer3", "layer4")


def stage_out_channels(truncate_after_layer: int) -> int:
    """Output channels after truncating to the first N children.

    Replaces the reference's dummy-forward channel inference
    (models_RTM.py:58-63) with static arithmetic.
    """
    n = max(1, min(truncate_after_layer, len(CHILDREN)))
    kept = CHILDREN[:n]
    c = 3
    for child in kept:
        if child == "conv1":
            c = 64
        elif child.startswith("layer"):
            idx = int(child[-1]) - 1
            c = STAGES[idx][1] * EXPANSION
    return c


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """Torch ``MaxPool2d(3, stride=2, padding=1)`` on NHWC."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _init_block(key, cin: int, planes: int, stride: int) -> Dict[str, Any]:
    cout = planes * EXPANSION
    k1, k2, k3, kd = jax.random.split(key, 4)
    block = {
        "conv1": init_conv(k1, 1, 1, cin, planes),
        "bn1": init_norm(planes, "batch"),
        "conv2": init_conv(k2, 3, 3, planes, planes),
        "bn2": init_norm(planes, "batch"),
        "conv3": init_conv(k3, 1, 1, planes, cout),
        "bn3": init_norm(cout, "batch"),
    }
    if stride != 1 or cin != cout:
        block["downsample"] = {
            "conv": init_conv(kd, 1, 1, cin, cout),
            "bn": init_norm(cout, "batch"),
        }
    return block


def init(key) -> Dict[str, Any]:
    kc, *stage_keys = jax.random.split(key, 1 + len(STAGES))
    params: Dict[str, Any] = {
        "conv1": init_conv(kc, 7, 7, 3, 64),
        "bn1": init_norm(64, "batch"),
    }
    cin = 64
    for si, ((nblocks, planes), sk) in enumerate(zip(STAGES, stage_keys)):
        blocks: List[Dict[str, Any]] = []
        for bi, bk in enumerate(jax.random.split(sk, nblocks)):
            stride = 1 if (si == 0 or bi > 0) else 2
            blocks.append(_init_block(bk, cin, planes, stride))
            cin = planes * EXPANSION
        params[f"layer{si + 1}"] = blocks
    return params


def _apply_block(p: Dict[str, Any], x: jnp.ndarray, stride: int) -> jnp.ndarray:
    identity = x
    h = jax.nn.relu(batch_norm_infer(conv2d(x, p["conv1"]), p["bn1"]))
    h = jax.nn.relu(
        batch_norm_infer(conv2d(h, p["conv2"], stride=stride, padding=1), p["bn2"])
    )
    h = batch_norm_infer(conv2d(h, p["conv3"]), p["bn3"])
    if "downsample" in p:
        identity = batch_norm_infer(
            conv2d(x, p["downsample"]["conv"], stride=stride), p["downsample"]["bn"]
        )
    return jax.nn.relu(h + identity)


def _apply_children(
    params: Dict[str, Any], x: jnp.ndarray, children: Tuple[str, ...]
) -> jnp.ndarray:
    for child in children:
        if child == "conv1":
            x = conv2d(x, params["conv1"], stride=2, padding=3)
        elif child == "bn1":
            x = batch_norm_infer(x, params["bn1"])
        elif child == "relu":
            x = jax.nn.relu(x)
        elif child == "maxpool":
            x = max_pool_3x3_s2(x)
        else:
            si = int(child[-1]) - 1
            for bi, bp in enumerate(params[child]):
                stride = 1 if (si == 0 or bi > 0) else 2
                x = _apply_block(bp, x, stride)
    return x


def apply_truncated(
    params: Dict[str, Any], x: jnp.ndarray, truncate_after_layer: int
) -> jnp.ndarray:
    """Run the first ``truncate_after_layer`` children (clamped to [1, 8])."""
    n = max(1, min(truncate_after_layer, len(CHILDREN)))
    return _apply_children(params, x, CHILDREN[:n])


def stem_conv(params: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """conv1 output only (pre-bn, pre-relu).

    This is the activation the reference's shipped RTM Grad-CAM actually
    hooks: the ``reversed()`` scan over ``truncated_encoder``'s *top-level*
    children (Functions/RTM_evaluation.py:175-183) never descends into the
    ``layerN`` Sequentials, so the first ``nn.Conv2d`` it finds is the stem.
    """
    return conv2d(x, params["conv1"], stride=2, padding=3)


def apply_truncated_from_stem(
    params: Dict[str, Any], a: jnp.ndarray, truncate_after_layer: int
) -> jnp.ndarray:
    """Continue from ``stem_conv`` activations through the remaining
    truncated children (the re-entry point for stem-targeted Grad-CAM)."""
    n = max(1, min(truncate_after_layer, len(CHILDREN)))
    return _apply_children(params, a, CHILDREN[1:n])


# ---------------------------------------------------------------------------
# Training mode: BatchNorm batch statistics + running-stat updates
# ---------------------------------------------------------------------------


def _bn_train(x: jnp.ndarray, p: Dict[str, Any], momentum: float = 0.1):
    """(y, updated norm params) — torch semantics: momentum 0.1, unbiased
    variance in the running update."""
    from ..ops.norms import batch_norm_train

    y, mean, var = batch_norm_train(x, p)
    n = x.size // x.shape[-1]
    unbiased = var * (n / max(n - 1, 1))
    new = {
        "scale": p["scale"],
        "bias": p["bias"],
        "mean": (1 - momentum) * p["mean"] + momentum * mean,
        "var": (1 - momentum) * p["var"] + momentum * unbiased,
    }
    return y, new


def _apply_block_train(p: Dict[str, Any], x: jnp.ndarray, stride: int):
    new_p = dict(p)
    identity = x
    h = conv2d(x, p["conv1"])
    h, new_p["bn1"] = _bn_train(h, p["bn1"])
    h = jax.nn.relu(h)
    h = conv2d(h, p["conv2"], stride=stride, padding=1)
    h, new_p["bn2"] = _bn_train(h, p["bn2"])
    h = jax.nn.relu(h)
    h = conv2d(h, p["conv3"])
    h, new_p["bn3"] = _bn_train(h, p["bn3"])
    if "downsample" in p:
        identity = conv2d(x, p["downsample"]["conv"], stride=stride)
        identity, ds_bn = _bn_train(identity, p["downsample"]["bn"])
        new_p["downsample"] = {"conv": p["downsample"]["conv"], "bn": ds_bn}
    return jax.nn.relu(h + identity), new_p


def apply_truncated_train(
    params: Dict[str, Any], x: jnp.ndarray, truncate_after_layer: int
):
    """Training-mode truncated forward.  Returns (features, params with
    updated BN running stats — weights unchanged)."""
    n = max(1, min(truncate_after_layer, len(CHILDREN)))
    new_params = dict(params)
    for child in CHILDREN[:n]:
        if child == "conv1":
            x = conv2d(x, params["conv1"], stride=2, padding=3)
        elif child == "bn1":
            x, new_params["bn1"] = _bn_train(x, params["bn1"])
        elif child == "relu":
            x = jax.nn.relu(x)
        elif child == "maxpool":
            x = max_pool_3x3_s2(x)
        else:
            si = int(child[-1]) - 1
            blocks = []
            for bi, bp in enumerate(params[child]):
                stride = 1 if (si == 0 or bi > 0) else 2
                x, nb = _apply_block_train(bp, x, stride)
                blocks.append(nb)
            new_params[child] = blocks
    return x, new_params
