"""Config / task-registry layer.

The universal contract across the framework (as in the reference, SURVEY.md
section 1 L4) is the *task registry*: an ordered mapping
``{task_name: [class_name, ...]}`` loaded from a JSON file
(reference: ``build_classifiers/Tasks.json``).  It parameterizes model heads,
dataset label encoding, metric reporting and overlays.

Hyperparameters come from JSON sidecar files discovered next to a checkpoint
(reference: ``utils/PMG/PMG_model_utils.py:109-132``) or an explicit
``--config_path`` whose ``{"hparams": {...}}`` wrapper is unwrapped
(reference: ``test_PMG.py:94-99``).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Mapping, Optional, Tuple

# Label conventions, normalized framework-wide.  The reference uses two ignore
# conventions (-100 via utils/datasets_utils.py:13 for PMG, -1 via
# collate_multitask for RTM); we standardize on -100 internally and accept
# both at the boundaries.  UNKNOWN_PRED is the below-threshold prediction
# marker (reference: Functions/PMG_evaluation.py:146 ``preds[max<thr] = -1``).
IGNORE_INDEX = -100
UNKNOWN_PRED = -1

# ImageNet preprocessing constants (reference: utils/datasets_utils.py:205-215).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
DEFAULT_IMG_SIZE = 224
DEFAULT_RESIZE = 256


def enable_parity_precision() -> None:
    """Switch XLA matmul/conv to full-f32 precision ("parity mode").

    JAX's default on CPU/TPU trades mantissa bits for speed (bf16 passes on
    the MXU); for bit-faithful comparison against the f32 PyTorch reference,
    call this first.  Production inference keeps the fast default (bf16-class
    accumulation is far inside the models' decision margins — verified by the
    bf16 argmax-parity sweep over every golden fixture, README Performance).
    """
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")


def enable_persistent_compilation_cache(path: Optional[str] = None) -> str:
    """Persist compiled XLA executables across processes.

    On this rig every distinct program costs ~25-40 s through the
    remote-compile service; the cache (which works through the axon relay)
    cuts reruns of the bench/checklist tools to minutes.  ``path`` defaults
    to $WADT_XLA_CACHE or ~/.cache/wadt/xla_cache.  Returns the directory.
    """
    import jax

    cache_dir = path or os.environ.get(
        "WADT_XLA_CACHE", os.path.expanduser("~/.cache/wadt/xla_cache")
    )
    os.makedirs(cache_dir, exist_ok=True)
    current = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every jitted step (the default 1s floor would skip small ones)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if current and current != cache_dir:
        # the cache backend latches its directory at first use; re-pointing
        # it (e.g. CLI --compilation_cache after the test harness set a
        # global cache) needs an explicit reset
        from jax.experimental.compilation_cache import compilation_cache

        compilation_cache.reset_cache()
    return cache_dir


def load_tasks(path: str) -> Dict[str, List[str]]:
    """Load the task registry ``{task: [class, ...]}`` from JSON."""
    with open(path, "r") as f:
        tasks = json.load(f)
    if not isinstance(tasks, dict):
        raise ValueError(f"Task registry {path} must be a JSON object")
    for t, classes in tasks.items():
        if not isinstance(classes, list) or not classes:
            raise ValueError(f"Task {t!r} must map to a non-empty class list")
    return tasks


def default_tasks_path() -> str:
    """Path of the bundled 12-task weather registry."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(here, "configs", "tasks.json")


def load_hparams(
    config_path: Optional[str] = None, model_path: Optional[str] = None
) -> Dict[str, Any]:
    """Resolve hyperparameters: explicit config file, else checkpoint sidecar.

    Mirrors the reference's precedence (test_PMG.py:94-107): an explicit
    ``config_path`` wins and may wrap the dict as ``{"hparams": {...}}``;
    otherwise sidecar JSONs are searched next to ``model_path``; otherwise
    empty (model-family defaults apply).
    """
    if config_path is not None:
        if not os.path.isfile(config_path):
            raise FileNotFoundError(f"No config file at {config_path}")
        with open(config_path, "r") as f:
            cfg = json.load(f)
        return cfg.get("hparams", cfg) if isinstance(cfg, dict) else cfg
    if model_path is not None:
        sidecar = find_sidecar_hparams(model_path)
        if sidecar is not None:
            return sidecar
    return {}


def find_sidecar_hparams(model_path: str) -> Optional[Dict[str, Any]]:
    """Search for an hparams JSON next to a checkpoint.

    Same candidate list and ``{"hparams": ...}`` unwrapping as the reference
    (utils/PMG/PMG_model_utils.py:109-132), plus the repo's shipped
    ``hyperparameters_*.json`` naming.
    """
    base_dir = os.path.dirname(os.path.abspath(model_path))
    stem = os.path.splitext(model_path)[0]
    candidates = [
        os.path.join(base_dir, "best_overall_hyperparameters.json"),
        os.path.join(base_dir, "best_hyperparameters.json"),
        stem + ".json",
    ]
    # Shipped sidecars: Model_weights/PMG/hyperparameters_PMG.json etc.
    for fn in sorted(os.listdir(base_dir)) if os.path.isdir(base_dir) else []:
        if fn.startswith("hyperparameters") and fn.endswith(".json"):
            candidates.append(os.path.join(base_dir, fn))
    for p in candidates:
        if os.path.isfile(p):
            try:
                with open(p, "r") as f:
                    data = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue
            if isinstance(data, dict):
                if isinstance(data.get("hparams"), dict):
                    return data["hparams"]
                return data
    return None


@dataclasses.dataclass(frozen=True)
class TaskSpec:
    """Static, hashable view of the task registry (usable as a jit static arg).

    ``names``/``num_classes`` keep the registry's insertion order — class
    index i == position in the registry list, exactly like the reference's
    ``class_to_idx`` maps (utils/datasets_utils.py:105).
    """

    names: Tuple[str, ...]
    num_classes: Tuple[int, ...]
    class_names: Tuple[Tuple[str, ...], ...]

    @classmethod
    def from_tasks(cls, tasks: Mapping[str, List[str]]) -> "TaskSpec":
        names = tuple(tasks.keys())
        first = tasks[names[0]] if names else []
        if names and isinstance(first, int):
            # Allow {task: n_classes} shorthand (reference models_RTM.py:47-50).
            return cls(
                names=names,
                num_classes=tuple(int(tasks[t]) for t in names),
                class_names=tuple(
                    tuple(f"class_{i}" for i in range(int(tasks[t]))) for t in names
                ),
            )
        return cls(
            names=names,
            num_classes=tuple(len(tasks[t]) for t in names),
            class_names=tuple(tuple(tasks[t]) for t in names),
        )

    def __len__(self) -> int:
        return len(self.names)

    @property
    def max_classes(self) -> int:
        return max(self.num_classes) if self.num_classes else 0

    def n_classes(self, task: str) -> int:
        return self.num_classes[self.names.index(task)]

    def classes(self, task: str) -> Tuple[str, ...]:
        return self.class_names[self.names.index(task)]

    def as_dict(self) -> Dict[str, List[str]]:
        return {t: list(c) for t, c in zip(self.names, self.class_names)}

    def split_logits(self, stacked) -> Dict[str, Any]:
        """Slice stacked per-task logits ``[B, T, Kmax]`` into ``{task: [B, K_t]}``."""
        return {
            t: stacked[:, i, : self.num_classes[i]] for i, t in enumerate(self.names)
        }
