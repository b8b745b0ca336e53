"""Model families — three configs over one functional contract.

Every family module exposes the same surface (SURVEY.md section 7 design
stance: "three model families as configs, not codebases"):

- ``Spec``: frozen dataclass, hashable (usable as a jit static argument),
- ``build_spec(tasks, hparams)``: reference-default-compatible builder,
- ``init(key, spec) -> params``: fresh param pytree,
- ``apply(params, x, spec, capture=()) -> (stacked_logits, aux)``:
  pure forward on normalized NHWC images; ``stacked_logits`` is [B, T, Kmax]
  (slice per task via ``spec.tasks.split_logits``), ``aux`` holds requested
  intermediate activations (replaces the reference's forward-hook /
  ``return_full`` / ``return_*_embeddings`` variants with one mechanism).

Families: ``pmg`` (models_PMG.py:77), ``pm`` (models_PM.py:79),
``rtm`` (models_RTM.py:27).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

from . import pm, pmg, resnet, rtm  # noqa: F401

FAMILIES = {"pm": pm, "pmg": pmg, "rtm": rtm}


def get_family(name: str):
    try:
        return FAMILIES[name.lower()]
    except KeyError:
        raise ValueError(f"unknown model family {name!r}; choose from {sorted(FAMILIES)}")


def build_spec(family: str, tasks: Mapping[str, Any], hparams: Dict[str, Any]):
    return get_family(family).build_spec(tasks, hparams)
