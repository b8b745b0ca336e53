"""Training loop ("fit") honoring the reference's recorded training recipe.

The reference repo ships no trainer, but its checkpoint sidecars record the
full recipe that produced the published weights
(Model_weights/PMG/hyperparameters_PMG.json:34-51): AdamW lr/weight-decay,
batch size, epochs, gradient accumulation, class-weight balancing
(median mode, cap), focal loss, validation split, encoder freezing.  This
module implements that recipe TPU-natively: jitted train step (optionally
dp/tp-sharded), BatchNorm train mode with running-stat updates, best-model
selection by validation overall-F1, Orbax checkpointing + optional
reference-loadable .pth export, and a sidecar hparams JSON in the
reference's own schema so the trained model round-trips through either
framework.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..config import IGNORE_INDEX
from ..data.dataset import BatchLoader, MultiTaskDataset
from ..engine import checkpoint
from ..engine.executor import Engine
from ..models import get_family
from ..ops.preprocess import normalize_uint8_host
from ..parallel.train import (
    TrainState,
    cached_train_step,
    compute_class_weights,
)

DEFAULT_OPTIONS: Dict[str, Any] = {
    "epochs": 10,
    "batch_size": 32,
    "lr": 3e-4,
    "weight_decay": 1e-4,
    "accum_steps": 1,
    "balance_loss": False,
    "use_focal": False,
    "focal_gamma": 2.0,
    "class_weight_mode": "median",
    "class_weight_cap": 10.0,
    "val_split": 0.2,
    "freeze_encoder": False,
    "seed": 0,
    "shuffle_each_epoch": True,
    "num_workers": 4,
    # reference transformer trains with dropout 0.1 (models_PMG.py:146);
    # 0.0 restores the deterministic round-1 behavior
    "dropout_rate": 0.1,
    # mid-training resume: save full TrainState (params + optimizer moments +
    # step) every save_every epochs; resume=True continues from it
    "save_every": 1,
    "resume": False,
    # None = auto (cache decoded images in host RAM when they fit the budget,
    # else stream-decode per batch each epoch)
    "cache_in_memory": None,
    "cache_budget_bytes": 4 << 30,
    # bf16 forward/backward against f32 master weights (mixed precision)
    "bf16": False,
    # device-side augmentation inside the jitted step (flip/translate/
    # brightness/contrast; True = ops.augment.DEFAULT_AUGMENT, or a kwargs
    # dict).  Keyed by the step counter, so resume replays it exactly.
    "augment": False,
}

# Validation engines shared across repeat fits with the same
# (family, spec, eval batch) — params are a traced argument, so swapping
# them per fit costs no retrace.  fit() is a sequential API; the cache is
# not for concurrent fits.
_EVAL_ENGINE_CACHE: Dict[Any, Engine] = {}


def _val_overall_f1(engine: Engine, images, labels) -> float:
    from sklearn.metrics import f1_score

    res = engine.run(images, labels, collect=("preds",))
    f1s = []
    for ti in range(len(engine.tasks)):
        m = labels[:, ti] != IGNORE_INDEX
        if not m.any():
            continue
        f1s.append(
            f1_score(labels[m, ti], res["preds"][m, ti], average="weighted",
                     zero_division=0)
        )
    return float(np.mean(f1s)) if f1s else 0.0


def fit(
    family: str,
    spec,
    data_json: str,
    classes_json,
    save_dir: str,
    options: Optional[Dict[str, Any]] = None,
    init_params=None,
    mesh=None,
) -> Dict[str, Any]:
    """Train a model; returns {"params", "history", "best_f1", "ckpt_dir"}.

    Artifacts under ``save_dir``: best_model/ (Orbax), best_model.pth
    (reference-loadable export), hyperparameters.json (reference sidecar
    schema), training_history.json.
    """
    import jax

    opts = {**DEFAULT_OPTIONS, **(options or {})}
    get_family(family)  # fail fast on an unknown family
    os.makedirs(save_dir, exist_ok=True)

    ds = MultiTaskDataset(data_json, classes_json)
    n = len(ds)
    rng = np.random.RandomState(opts["seed"])
    perm = rng.permutation(n)
    n_val = int(round(n * opts["val_split"]))
    val_idx, train_idx = perm[:n_val], perm[n_val:]
    if len(train_idx) == 0:
        raise ValueError("empty training split")

    # Pre-decode into a host cache when it fits (default budget 4 GB);
    # otherwise stream decode per batch from disk each epoch.
    img_bytes = ds.img_size * ds.img_size * 3
    cache = opts.get("cache_in_memory")
    if cache is None:
        cache = n * img_bytes <= opts.get("cache_budget_bytes", 4 << 30)
    all_labels = np.stack([lab for _, lab in ds.samples])
    cached_imgs = None
    decode_pool = None
    if cache:
        loader = BatchLoader(ds, batch_size=opts["batch_size"],
                             num_workers=opts["num_workers"])
        chunks = [imgs for imgs, _, _ in loader]
        cached_imgs = np.concatenate(chunks)
    else:
        from concurrent.futures import ThreadPoolExecutor

        decode_pool = ThreadPoolExecutor(max_workers=opts["num_workers"])
        # Streaming mode: the validation split must respect the RAM budget
        # too — cap how many images we hold resident for per-epoch eval.
        max_eval = max(1, opts["cache_budget_bytes"] // (4 * img_bytes))
        if n_val > max_eval:
            print(f"[fit] capping resident validation set {n_val} -> {max_eval} "
                  f"(streaming mode RAM budget)")
            val_idx = val_idx[:max_eval]
            n_val = max_eval

    def fetch(idx: np.ndarray) -> np.ndarray:
        if cached_imgs is not None:
            return cached_imgs[idx]
        return np.stack(
            list(decode_pool.map(lambda i: ds.load(int(i))[0], idx))
        )

    def fetch_async(idx: np.ndarray):
        """Overlap next-batch decode with the current device step."""
        if cached_imgs is not None:
            return lambda: cached_imgs[idx]
        futs = [decode_pool.submit(lambda i=i: ds.load(int(i))[0]) for i in idx]
        return lambda: np.stack([f.result() for f in futs])

    class_weights = None
    if opts["balance_loss"]:
        class_weights = compute_class_weights(
            all_labels[train_idx], spec.tasks.num_classes,
            mode=opts["class_weight_mode"], cap=opts["class_weight_cap"],
        )

    # Memoized: a resume (or any repeat fit with the same config in this
    # process) reuses the already-traced step instead of re-tracing it.
    optimizer, init_fn, step_fn = cached_train_step(
        family, spec, mesh=mesh,
        lr=opts["lr"], weight_decay=opts["weight_decay"],
        accum_steps=opts["accum_steps"],
        use_focal=opts["use_focal"], focal_gamma=opts["focal_gamma"],
        class_weights=class_weights, freeze_encoder=opts["freeze_encoder"],
        dropout_rate=opts["dropout_rate"], dropout_seed=opts["seed"] + 1234,
        compute_dtype=(jnp.bfloat16 if opts["bf16"] else None),
        augment=opts["augment"],
    )
    state = init_fn(jax.random.PRNGKey(opts["seed"]))
    if init_params is not None:
        state = TrainState(init_params, optimizer.init(init_params), state.step)

    bs = opts["batch_size"]
    history = []
    best_f1, best_params = -1.0, state.params
    start_epoch = 0
    last_dir = os.path.join(save_dir, "last_state")
    progress_path = os.path.join(save_dir, "train_progress.json")
    if opts["resume"] and os.path.exists(progress_path):
        with open(progress_path) as f:
            progress = json.load(f)
        state = checkpoint.load_native(last_dir, like=state)
        start_epoch = int(progress["next_epoch"])
        history = progress["history"]
        best_f1 = float(progress["best_f1"])
        best_dir = os.path.join(save_dir, "best_model")
        if os.path.exists(best_dir):
            best_params = checkpoint.load_native(best_dir, like=state.params)
        print(f"[fit] resumed from epoch {start_epoch} "
              f"(step {int(state.step)}, best_f1 {best_f1:.4f})")

    eval_idx = val_idx if n_val else train_idx[: min(64, len(train_idx))]
    val_imgs, val_labels = fetch(eval_idx), all_labels[eval_idx]
    # One compiled eval engine for all epochs AND across repeat fits of the
    # same config in this process (params swap without retrace: they are a
    # traced argument of the jitted step).
    try:
        eng_key = (family, spec, min(bs, 64))
        hash(eng_key)
    except TypeError:  # unhashable custom spec: skip caching
        eng_key = None
    eval_engine = (
        _EVAL_ENGINE_CACHE.get(eng_key) if eng_key is not None else None
    )
    if eval_engine is None:
        eval_engine = Engine(family, spec, state.params,
                             batch_size=min(bs, 64), prob_threshold=0.0)
        if eng_key is not None:
            if len(_EVAL_ENGINE_CACHE) >= 8:
                _EVAL_ENGINE_CACHE.pop(next(iter(_EVAL_ENGINE_CACHE)))
            _EVAL_ENGINE_CACHE[eng_key] = eval_engine

    for epoch in range(start_epoch, opts["epochs"]):
        # per-epoch seeded order -> identical schedule across resumes
        epoch_rng = np.random.RandomState(opts["seed"] * 100003 + 17 + epoch)
        order = (
            epoch_rng.permutation(train_idx)
            if opts["shuffle_each_epoch"]
            else train_idx
        )
        if len(order) < bs:
            order = np.resize(order, bs)  # tile small datasets to one batch
        losses = []
        t0 = time.perf_counter()
        starts = list(range(0, len(order) - bs + 1, bs))
        pending = fetch_async(order[starts[0] : starts[0] + bs]) if starts else None
        for si, s in enumerate(starts):
            idx = order[s : s + bs]
            images = normalize_uint8_host(pending())
            if si + 1 < len(starts):  # decode next batch during this step
                nxt = starts[si + 1]
                pending = fetch_async(order[nxt : nxt + bs])
            state, loss = step_fn(state, images, all_labels[idx])
            losses.append(float(loss))

        eval_engine.params = state.params
        val_f1 = _val_overall_f1(eval_engine, val_imgs, val_labels)
        entry = {
            "epoch": epoch,
            "train_loss": float(np.mean(losses)),
            "val_overall_f1": val_f1,
            "seconds": round(time.perf_counter() - t0, 3),
        }
        history.append(entry)
        print(f"[epoch {epoch}] loss={entry['train_loss']:.4f} "
              f"val_f1={val_f1:.4f} ({entry['seconds']}s)")
        if val_f1 >= best_f1:
            best_f1, best_params = val_f1, jax.device_get(state.params)
            checkpoint.save_native(best_params, os.path.join(save_dir, "best_model"))
        if opts["save_every"] and (epoch + 1) % opts["save_every"] == 0:
            # Full TrainState (params + optimizer moments + step): resuming
            # reproduces the exact run, not a warm restart
            checkpoint.save_native(state, last_dir)
            with open(progress_path, "w") as f:
                json.dump({"next_epoch": epoch + 1, "history": history,
                           "best_f1": best_f1}, f, indent=2)

    ckpt_dir = os.path.join(save_dir, "best_model")
    checkpoint.save_native(best_params, ckpt_dir)
    pth_path = os.path.join(save_dir, "best_model.pth")
    try:
        checkpoint.save_torch_checkpoint(family, best_params, spec, pth_path)
    except ImportError:
        pth_path = None
    sidecar = {
        "model_path_best": pth_path or ckpt_dir,
        "hparams": _spec_hparams(family, spec),
        "train_options": {k: opts[k] for k in DEFAULT_OPTIONS},
        "fitness_overall_f1": best_f1,
    }
    with open(os.path.join(save_dir, "hyperparameters.json"), "w") as f:
        json.dump(sidecar, f, indent=2)
    with open(os.path.join(save_dir, "training_history.json"), "w") as f:
        json.dump(history, f, indent=2)
    if decode_pool is not None:
        decode_pool.shutdown()
    return {"params": best_params, "history": history, "best_f1": best_f1,
            "ckpt_dir": ckpt_dir}


def _spec_hparams(family: str, spec) -> Dict[str, Any]:
    """Spec -> the reference's sidecar hparams schema."""
    if family == "pmg":
        return {
            "ndf": spec.ndf, "norm": spec.norm, "patch_size": spec.patch_size,
            "patch_div": spec.patch_div, "gram_channels": spec.gram_channels,
            "d_model": spec.d_model,
            "transformer_layers": spec.transformer_layers,
            "transformer_heads": spec.transformer_heads,
            "use_token_attention": spec.use_token_attention,
            "use_channel_attention": spec.use_channel_attention,
            "num_classes_per_task": {
                t: k for t, k in zip(spec.tasks.names, spec.tasks.num_classes)
            },
        }
    if family == "pm":
        return {
            "ndf": spec.ndf, "norm": spec.norm, "patch_size": spec.patch_size,
            "attn_tau": spec.attn_tau, "attn_use_se": spec.attn_use_se,
            "attn_softmax_spatial": spec.attn_softmax_spatial,
            "ablate_attention": spec.ablate_attention,
        }
    return {
        "truncate_layer": spec.truncate_after_layer,
        "use_attention": spec.use_attention,
        "attn_token_dim": spec.attn_token_dim,
        "cls_hidden_dims": list(spec.cls_hidden_dims),
        "cls_num_layers": spec.cls_num_layers,
    }
