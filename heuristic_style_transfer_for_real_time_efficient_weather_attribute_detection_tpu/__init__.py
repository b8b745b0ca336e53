"""TPU-native multi-task weather-attribute detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``Hamedkiri/Heuristic_Style_Transfer_for_Real-Time_Efficient_Weather_Attribute_Detection``
(reference mounted read-only at ``/root/reference``; see ``SURVEY.md`` for the
full structural analysis).  The reference is a PyTorch inference/eval toolkit
for three small multi-task image classifiers (PM / PMG / RTM) that label 12
weather attributes in one forward pass.  This package re-designs the same
surface TPU-first:

- pure-functional models (param pytrees + jitted ``apply``) with a single
  universal contract ``apply(params, images[B,H,W,3]) -> {task: logits}``,
- one workload layer (evaluate / benchmark / inference / stream / explain /
  embed / style-transfer) parameterized by the model interface instead of the
  reference's three copied pipelines (SURVEY.md section 1, layering note),
- a bit-faithful ``.pth`` -> pytree checkpoint converter,
- Pallas TPU kernels for the hot ops (patch-Gram, fused preprocess),
- ``jax.sharding`` data/tensor-parallel execution over a device mesh.

Import alias: ``import wadt`` (see repo-root ``wadt.py``).
"""

__version__ = "0.3.0"

from . import config  # noqa: F401

SHORT_NAME = "wadt"


def load_engine(
    family,
    model_path=None,
    tasks=None,
    hparams=None,
    **engine_kwargs,
):
    """One call from a checkpoint to a serving :class:`Engine`.

    The library-level equivalent of the CLI's build path (``cli.build_engine``)
    without the flag surface::

        eng = wadt.load_engine("pmg", "best_model_PMG.pth", "tasks.json")
        out = eng.run(images_u8)          # {"preds": [N,T], "probs": ...}

    - ``tasks``: registry dict ``{task: [class, ...]}`` or a JSON path;
      defaults to the bundled 12-task weather registry.
    - ``hparams``: dict or JSON path; when omitted, sidecar JSONs are
      discovered next to ``model_path`` (reference precedence,
      utils/PMG/PMG_model_utils.py:109-132).
    - ``model_path``: a torch ``.pth`` (any of the reference's three loader
      schemas; PM SE auto-probe applied) or an Orbax-native checkpoint
      directory.  ``None`` builds randomly initialized params.
    - ``engine_kwargs``: forwarded to :class:`Engine` (``batch_size``,
      ``dtype``, ``prob_threshold``, ``mesh``, ``packed`` ...).
    """
    import os

    import jax

    from .config import default_tasks_path, load_hparams, load_tasks
    from .engine import checkpoint
    from .engine.executor import Engine
    from .models import get_family

    # Falsy paths ("" from an unset shell var) mean "no checkpoint", same
    # as the CLI's truthiness checks — normalize before sidecar discovery.
    model_path = model_path or None
    if tasks is None:
        tasks = default_tasks_path()
    if isinstance(tasks, (str, os.PathLike)):
        tasks = load_tasks(os.fspath(tasks))
    if hparams is None:
        hparams = load_hparams(None, model_path)
    elif isinstance(hparams, (str, os.PathLike)):
        hparams = load_hparams(os.fspath(hparams), model_path)
    else:
        hparams = dict(hparams)

    state = None
    native_dir = model_path is not None and os.path.isdir(model_path)
    if model_path is not None and not native_dir:
        state = checkpoint.load_state_dict(model_path)
        if family == "pm":
            # SE auto-probe overrides config (test_PM.py:149-150).
            hparams["attn_use_se"] = checkpoint.checkpoint_has_se(state)

    mod = get_family(family)
    spec = mod.build_spec(tasks, hparams)
    if state is not None:
        params = checkpoint.convert(family, state, spec)
    elif native_dir:
        params = checkpoint.load_native(
            model_path, like=mod.init(jax.random.PRNGKey(0), spec)
        )
    else:
        params = mod.init(jax.random.PRNGKey(0), spec)
    return Engine(family, spec, params, **engine_kwargs)
