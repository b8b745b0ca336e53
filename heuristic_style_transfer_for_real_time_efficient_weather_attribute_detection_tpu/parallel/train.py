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

Why dp + tp and nothing else (explicit statement, SURVEY section 2.5):
the largest family member is ~24 M params (~100 MB f32 with optimizer
state), hundreds of times below one chip's HBM, so pipeline parallelism
would trade ICI activation transfers and bubble time for memory headroom
nobody needs; there is no expert/MoE structure anywhere in the reference,
so ep has nothing to shard; and at 224 px the per-image conv activations
are far too small for spatial partitioning to beat its collective latency
(the non-overlapping PMG trunk WOULD shard spatially halo-free at
patch_div granularity — kernel == stride means no cross-shard taps, and
only the 9..16 gram tokens need an all_gather before the transformer — a
design that becomes profitable only if input resolution grows ~10x).
Batch (dp) and the stacked task axis (tp) are where this workload's real
parallelism lives.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.executor import class_mask
from ..models import get_family

# Param-pytree ROOT keys whose subtrees are stacked per-task tensors with a
# leading task axis T (shardable over the 'model' mesh axis as head
# tensor-parallelism): PMG's ``queries``/``heads``, PM's ``heads``, RTM's
# ``attn``/``mlp``/``final``.  The match is on the FIRST path component
# only — nested reuses of these names (e.g. PMG's ``transformer/[i]/attn``
# subtree, whose [d_model, d_model] weights carry no task axis) replicate.
_TASK_AXIS_ROOTS = frozenset({"queries", "heads", "attn", "final", "mlp"})


def param_shardings(params, mesh: Mesh):
    """Replicate everything except stacked per-task tensors (task axis over
    'model' when that axis exists in the mesh)."""
    has_model = "model" in mesh.axis_names

    def one(path, leaf):
        if has_model and path:
            root = getattr(path[0], "key", getattr(path[0], "name", None))
            if root in _TASK_AXIS_ROOTS:
                return NamedSharding(mesh, P("model", *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, params)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


_STATS_KEYS = {"mean", "var"}
_ENCODER_ROOTS = {"trunk", "backbone"}


def _path_names(path):
    return [getattr(p, "key", getattr(p, "name", None)) for p in path]


def _decay_mask(params):
    """AdamW weight decay everywhere except BatchNorm running statistics
    (they carry zero gradients and must not be decayed toward 0)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not (set(_path_names(path)) & _STATS_KEYS), params
    )


def make_optimizer(
    lr: float = 3e-4,
    weight_decay: float = 1e-4,
    accum_steps: int = 1,
    params_template=None,
):
    """The recorded reference training recipe
    (hyperparameters_PMG.json:34-51: AdamW lr 3e-4, wd 1e-4, accum_steps).

    The decay mask is passed as a CALLABLE (optax evaluates it lazily at
    ``opt.init``), so building the optimizer costs nothing — no eager param
    init is needed just to shape the mask.  ``params_template`` is accepted
    for backward compatibility and ignored (the mask depends only on tree
    paths, which the callable sees at init time).
    """
    del params_template
    opt = optax.adamw(lr, weight_decay=weight_decay, mask=_decay_mask)
    if accum_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accum_steps)
    return opt


def masked_cross_entropy_ex(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    mask: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    focal_gamma: Optional[float] = None,
):
    """Masked CE with optional per-class weights and focal modulation.

    class_weights: [T, Kmax] (zero-padded); torch ``CrossEntropyLoss(weight)``
    semantics — the per-task mean divides by the sum of selected weights.
    focal_gamma: multiplies each sample's NLL by (1 - p_target)^gamma
    (the recorded ``use_focal``/``focal_gamma`` option).
    Returns (per_task_loss [T], per_task_count [T]).
    """
    from ..config import IGNORE_INDEX

    neg = jnp.finfo(jnp.float32).min
    z = jnp.where(mask, logits.astype(jnp.float32), neg)
    logp = jax.nn.log_softmax(z, axis=-1)
    valid = labels != IGNORE_INDEX
    safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if focal_gamma is not None:
        p_t = jnp.exp(-nll)
        nll = nll * (1.0 - p_t) ** focal_gamma
    if class_weights is not None:
        w = jnp.take_along_axis(
            jnp.broadcast_to(class_weights, (labels.shape[0],) + class_weights.shape),
            safe[..., None],
            axis=-1,
        )[..., 0]
        w = jnp.where(valid, w, 0.0)
        denom = jnp.sum(w, axis=0)
        return jnp.sum(jnp.where(valid, nll, 0.0) * w, axis=0) / jnp.maximum(
            denom, 1e-9
        ), jnp.sum(valid, axis=0)
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.sum(valid, axis=0)
    return jnp.sum(nll, axis=0) / jnp.maximum(count, 1), count


def compute_class_weights(
    labels: "Any", num_classes, mode: str = "median", cap: float = 10.0
):
    """Per-task inverse-frequency class weights from the label matrix [N, T]
    (the recorded ``class_weight_mode: median`` / ``class_weight_cap: 10``
    options).  Returns a zero-padded [T, Kmax] float32 array."""
    import numpy as np

    from ..config import IGNORE_INDEX

    nt = len(num_classes)
    kmax = max(num_classes)
    out = np.zeros((nt, kmax), np.float32)
    for ti in range(nt):
        col = labels[:, ti]
        col = col[col != IGNORE_INDEX]
        counts = np.bincount(col, minlength=num_classes[ti]).astype(np.float64)
        freq = np.maximum(counts, 1e-9)
        if mode == "median":
            ref = np.median(freq[counts > 0]) if (counts > 0).any() else 1.0
        else:  # "mean" / fallback
            ref = freq[counts > 0].mean() if (counts > 0).any() else 1.0
        w = np.clip(ref / freq, 0.0, cap)
        w[counts == 0] = 0.0
        out[ti, : num_classes[ti]] = w
    return out


def _merge_stats(current, updated):
    """Adopt only BatchNorm running statistics from a train-mode forward's
    updated subtree, preserving the optimizer-updated weights/scales."""
    return jax.tree_util.tree_map_with_path(
        lambda path, cur, upd: upd.astype(cur.dtype)
        if (set(_path_names(path)) & _STATS_KEYS)
        else cur,
        current,
        updated,
    )


def _family_trains_bn(family: str, spec) -> bool:
    """PMG/PM carry BatchNorms only when spec.norm == 'batch'; RTM's ResNet
    backbone always does."""
    if family == "rtm":
        return True
    return getattr(spec, "norm", None) == "batch"


def make_train_step(
    family: str,
    spec,
    optimizer=None,
    mesh: Optional[Mesh] = None,
    *,
    use_focal: bool = False,
    focal_gamma: float = 2.0,
    class_weights=None,
    freeze_encoder: bool = False,
    bn_train: bool = True,
    dropout_rate: float = 0.1,
    dropout_seed: int = 1234,
    compute_dtype: Any = None,
    augment: Optional[dict] = None,
) -> Tuple[Callable, Callable]:
    """Returns (init_fn(key) -> TrainState, step_fn(state, images, labels)).

    images: normalized float NHWC [B,...]; labels: [B, T] int with
    IGNORE_INDEX for missing annotations (the dataset contract,
    utils/datasets_utils.py:150-183).  Batch sharded over 'data' when a mesh
    is given.  ``bn_train`` enables BatchNorm batch statistics + running-stat
    updates (PMG/PM with norm='batch'; RTM's backbone always);
    ``dropout_rate`` drives the PMG transformer's train-mode dropout
    (reference hardcodes 0.1, models_PMG.py:146; rng folds the step counter
    so every step draws fresh masks); ``freeze_encoder`` zeroes
    trunk/backbone gradients (the recorded ``freeze_encoder`` option).

    ``augment`` (a kwargs dict for :func:`ops.augment.augment_batch`, or
    ``True`` for :data:`ops.augment.DEFAULT_AUGMENT`) applies device-side
    random flip/translate/brightness/contrast inside the jitted step,
    keyed by the step counter so resumed runs replay the straight run's
    exact augmentation schedule.

    ``compute_dtype=jnp.bfloat16`` runs the forward/backward in bf16 against
    f32 master weights (the cast sits inside loss_fn, so gradients come back
    f32 and AdamW state stays full precision) — the standard TPU
    mixed-precision regime; loss is always reduced in f32, and in
    batch-stat BN mode the running statistics skip the cast so their
    exponential update also runs in f32 (batch stats themselves come from
    the bf16 activations).
    """
    mod = get_family(family)
    mask = jnp.asarray(class_mask(spec.tasks))
    cw = None if class_weights is None else jnp.asarray(class_weights, jnp.float32)
    gamma = focal_gamma if use_focal else None
    # PMG's transformer is the only dropout site; PM/RTM apply_train would
    # otherwise be forced into batch-stat BN against an explicit bn_train=False
    has_dropout_sites = family == "pmg" and getattr(spec, "has_transformer", False)
    train_mode = hasattr(mod, "apply_train") and (
        (bn_train and _family_trains_bn(family, spec))
        or (dropout_rate > 0 and has_dropout_sites)
    )
    drop_key = jax.random.PRNGKey(dropout_seed)
    aug_kwargs = None
    if augment is not None and augment is not False:
        from ..ops.augment import DEFAULT_AUGMENT, augment_batch

        if augment is True:
            aug_kwargs = dict(DEFAULT_AUGMENT)
        elif isinstance(augment, dict):
            # a dict names exactly the knobs to enable ({} -> full recipe,
            # matching the documented "True or a kwargs dict" contract)
            aug_kwargs = dict(augment) if augment else dict(DEFAULT_AUGMENT)
        else:
            raise TypeError(
                "augment must be True/False/None or a kwargs dict for "
                f"ops.augment.augment_batch, got {type(augment).__name__}"
            )
        # distinct stream from dropout: both fold the same step counter
        aug_key = jax.random.PRNGKey(dropout_seed ^ 0x5EED)

    cdt = compute_dtype
    # In batch-stat train mode the forward never READS the running stats (it
    # uses batch statistics), so they can stay f32 through the cast — their
    # exponential update (1-m)*stat + m*batch_stat then runs in f32 instead
    # of rounding away momentum-0.1 increments below bf16's ~2^-8
    # resolution.  In frozen-stats mode the stats feed the forward, so they
    # cast with everything else (keeping them f32 would promote every
    # post-BN activation back to f32).
    _stats_update_mode = bn_train and _family_trains_bn(family, spec)

    def _cast_compute(params):
        keep = _STATS_KEYS if _stats_update_mode else set()
        return jax.tree_util.tree_map_with_path(
            lambda path, x: x
            if (set(_path_names(path)) & keep)
            or not jnp.issubdtype(x.dtype, jnp.floating)
            else x.astype(cdt),
            params,
        )

    def loss_fn(params, images, labels, step_idx):
        import contextlib

        from ..ops import nn as nn_ops

        mixed = cdt is not None and cdt != jnp.float32
        if mixed:
            params = _cast_compute(params)
            images = images.astype(cdt)
        # Mixed precision clears the convs' f32 output pinning: jax 0.9's
        # conv transpose rule cannot take an f32 cotangent against bf16
        # operands, and the MXU accumulates in f32 internally either way.
        ctx = nn_ops.conv_accum(None) if mixed else contextlib.nullcontext()
        with ctx:
            return _forward_loss(params, images, labels, step_idx)

    def _forward_loss(params, images, labels, step_idx):
        if train_mode:
            rng = (
                jax.random.fold_in(drop_key, step_idx)
                if dropout_rate > 0
                else None
            )
            logits, stat_updates = mod.apply_train(
                params, images, spec, rng=rng, dropout_rate=dropout_rate
            )
            if not (bn_train and _family_trains_bn(family, spec)):
                stat_updates = None
        else:
            logits, _ = mod.apply(params, images, spec)
            stat_updates = None
        per_task, counts = masked_cross_entropy_ex(
            logits, labels, mask, class_weights=cw, focal_gamma=gamma
        )
        present = (counts > 0).astype(jnp.float32)
        loss = jnp.sum(per_task * present) / jnp.maximum(jnp.sum(present), 1.0)
        return loss, stat_updates

    def _zero_encoder(grads):
        return jax.tree_util.tree_map_with_path(
            lambda path, g: jnp.zeros_like(g)
            if (set(_path_names(path)) & _ENCODER_ROOTS)
            else g,
            grads,
        )

    def step(state: TrainState, images, labels):
        if aug_kwargs is not None:
            images = augment_batch(
                jax.random.fold_in(aug_key, state.step), images, **aug_kwargs
            )
        (loss, stat_updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images, labels, state.step
        )
        if freeze_encoder:
            grads = _zero_encoder(grads)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        if freeze_encoder:
            # zero the UPDATES too: AdamW's decoupled weight decay would
            # otherwise still shrink frozen weights despite zero gradients
            updates = _zero_encoder(updates)
        params = optax.apply_updates(state.params, updates)
        if stat_updates is not None:
            # Running stats are not gradient-updated; adopt the batch-stat
            # exponential update, preserving the optimizer-updated weights.
            params = {
                **params,
                **{
                    root: _merge_stats(params[root], upd)
                    for root, upd in stat_updates.items()
                },
            }
        return TrainState(params, opt_state, state.step + 1), loss

    opt = optimizer or make_optimizer()

    def init_fn(key) -> TrainState:
        params = mod.init(key, spec)
        if mesh is not None:
            params = jax.device_put(params, param_shardings(params, mesh))
        return TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    if mesh is not None:
        data_sh = NamedSharding(mesh, P("data"))
        step = jax.jit(step, in_shardings=(None, data_sh, data_sh))
    else:
        step = jax.jit(step)
    return init_fn, step


# ---------------------------------------------------------------------------
# Memoized step construction.  jax.jit caches traces PER FUNCTION OBJECT, so a
# fresh make_train_step closure re-traces (and on a cold XLA cache recompiles)
# an identical program.  Callers that rebuild the step with the same config —
# fit() resuming a run, a training service handling repeat jobs — get the
# previously traced step back instead.
_STEP_CACHE: dict = {}
_STEP_CACHE_MAX = 16  # compiled executables are not free; FIFO-evict


def _freeze_for_key(x):
    """Canonicalize a kwarg into something hashable, or raise TypeError."""
    if isinstance(x, dict):
        return tuple(sorted((k, _freeze_for_key(v)) for k, v in x.items()))
    if isinstance(x, (list, tuple)):
        return tuple(_freeze_for_key(v) for v in x)
    if hasattr(x, "tobytes"):  # ndarray-likes (class_weights)
        import numpy as np

        a = np.asarray(x)
        return (a.shape, str(a.dtype), a.tobytes())
    hash(x)
    return x


def cached_train_step(
    family: str,
    spec,
    *,
    lr: float = 3e-4,
    weight_decay: float = 1e-4,
    accum_steps: int = 1,
    mesh: Optional[Mesh] = None,
    **kwargs,
):
    """Memoized :func:`make_train_step` + its optimizer.

    Returns ``(optimizer, init_fn, step_fn)``.  Two calls with equal
    ``(family, spec, optimizer hyperparameters, kwargs)`` in one process
    return the SAME jitted step, so the second call skips tracing entirely
    (and the optimizer's decay mask, which depends only on the param
    STRUCTURE fixed by family+spec, is safely shared).  Meshes key by
    identity.  Unhashable custom kwargs fall back to an uncached build.
    """
    try:
        key = (
            family,
            spec,
            lr,
            weight_decay,
            accum_steps,
            None if mesh is None else id(mesh),
            _freeze_for_key(kwargs),
        )
        hash(key)  # an unhashable spec builds the tuple fine — probe eagerly
    except TypeError:
        key = None
    if key is not None and key in _STEP_CACHE:
        return _STEP_CACHE[key]
    optimizer = make_optimizer(
        lr=lr, weight_decay=weight_decay, accum_steps=accum_steps
    )
    bundle = (optimizer,) + tuple(
        make_train_step(family, spec, optimizer, mesh=mesh, **kwargs)
    )
    if key is not None:
        if len(_STEP_CACHE) >= _STEP_CACHE_MAX:
            _STEP_CACHE.pop(next(iter(_STEP_CACHE)))
        _STEP_CACHE[key] = bundle
    return bundle
