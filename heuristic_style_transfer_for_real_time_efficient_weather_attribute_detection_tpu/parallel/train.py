"""Sharded multi-task training step (dp batch sharding + tp task sharding).

The reference ships no trainer — only the hyperparameter record of one
(Model_weights/PMG/hyperparameters_PMG.json:34-51: AdamW-style lr/weight
decay, masked multi-task CE).  This module is the TPU-native additive
capability: a jitted train step over a ('data','model') mesh where

- the batch axis is sharded over ``data`` (pure DP; gradients all-reduce via
  jit's automatic psum from shardings),
- the stacked per-task head tensors (leading task axis T) are sharded over
  ``model`` (tensor parallelism of the 12 task heads — each device owns a
  slice of tasks; the scalar loss reduction inserts the cross-task psum).

Norm layers run in inference form (frozen running stats) — exact for
instance/group/layer norms; for BatchNorm this is the common frozen-stats
fine-tuning regime.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.executor import class_mask, masked_cross_entropy
from ..models import get_family

# Param-pytree keys whose leaves carry a leading task axis T (shardable over
# the 'model' mesh axis as head tensor-parallelism).
_TASK_AXIS_KEYS = (
    "queries", "heads", "attn", "final", "mlp",  # pmg / rtm stacks
    "se1_w", "se1_b", "se2_w", "se2_b", "attn_w", "attn_b", "cls_w",  # pm
)


def param_shardings(params, mesh: Mesh):
    """Replicate everything except stacked per-task tensors (task axis over
    'model' when that axis exists in the mesh)."""
    has_model = "model" in mesh.axis_names

    def one(path, leaf):
        if has_model:
            names = {getattr(p, "key", getattr(p, "name", None)) for p in path}
            if names & set(_TASK_AXIS_KEYS):
                return NamedSharding(mesh, P("model", *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, params)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float = 3e-4, weight_decay: float = 1e-4):
    """The recorded reference training recipe (hyperparameters_PMG.json:37-38)."""
    return optax.adamw(lr, weight_decay=weight_decay)


def make_train_step(
    family: str,
    spec,
    optimizer=None,
    mesh: Optional[Mesh] = None,
) -> Tuple[Callable, Callable]:
    """Returns (init_fn(key) -> TrainState, step_fn(state, images, labels)).

    images: normalized float NHWC [B,...]; labels: [B, T] int with
    IGNORE_INDEX for missing annotations (the dataset contract,
    utils/datasets_utils.py:150-183).  Batch sharded over 'data' when a mesh
    is given.
    """
    mod = get_family(family)
    optimizer = optimizer or make_optimizer()
    mask = jnp.asarray(class_mask(spec.tasks))

    def loss_fn(params, images, labels):
        logits, _ = mod.apply(params, images, spec)
        per_task, counts = masked_cross_entropy(logits, labels, mask)
        # Mean over tasks that have any labels in the batch (matches the
        # reference eval-loss accounting, Functions/PMG_evaluation.py:131-152).
        present = (counts > 0).astype(jnp.float32)
        return jnp.sum(per_task * present) / jnp.maximum(jnp.sum(present), 1.0)

    def step(state: TrainState, images, labels):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, images, labels)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def init_fn(key) -> TrainState:
        params = mod.init(key, spec)
        if mesh is not None:
            params = jax.device_put(params, param_shardings(params, mesh))
        return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))

    if mesh is not None:
        data_sh = NamedSharding(mesh, P("data"))
        step = jax.jit(step, in_shardings=(None, data_sh, data_sh))
    else:
        step = jax.jit(step)
    return init_fn, step
