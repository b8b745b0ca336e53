"""Measured kernel selection: XLA fusion vs Pallas, decided by benchmark.

Selection is by measurement, not faith.  ``tools/bench_kernels.py --record``
A/Bs each Pallas kernel against its XLA-fused reference at the shipped
production shapes and stores the winner per backend kind in
``results/kernel_ab.json``; ops that have a Pallas variant consult
:func:`winner` at trace time and dispatch to whichever implementation the
record says is faster on the running backend.  With no record (or off-TPU)
the XLA fusion is the default — on the current v5e + libtpu the XLA fusions
win at shipped shapes (recorded in the JSON), so the Pallas kernels are
production-wired but benched-out; a backend where they win flips the dispatch
with no code change.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, Optional

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
RECORD_PATH = os.path.join(_REPO, "results", "kernel_ab.json")


@functools.lru_cache(maxsize=None)
def _table() -> Dict:
    try:
        with open(RECORD_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


@functools.lru_cache(maxsize=None)
def backend_kind() -> str:
    import jax

    return jax.devices()[0].platform.lower()


def winner(op: str, default: str = "xla") -> str:
    """The recorded faster implementation ("xla" | "pallas") of ``op`` on
    this backend, or ``default`` when nothing is recorded."""
    entry = _table().get(backend_kind(), {}).get(op)
    return entry.get("winner", default) if isinstance(entry, dict) else default


def record(op: str, win: str, variants: Dict[str, float],
           shape: str, backend: Optional[str] = None) -> None:
    """Store one measured-selection outcome (called by
    tools/bench_kernels.py / tools/bench_latency.py ``--record``).

    ``variants`` maps each measured implementation name to its device time
    in microseconds; ``win`` must be one of its keys (the value consumers
    dispatch on via :func:`winner`)."""
    if win not in variants:
        raise ValueError(f"winner {win!r} not among variants {sorted(variants)}")
    backend = backend or backend_kind()
    data = {}
    try:
        with open(RECORD_PATH) as f:
            data = json.load(f)
    except (OSError, ValueError):
        pass
    data.setdefault(backend, {})[op] = {
        "winner": win,
        "variants": {k: round(v, 2) for k, v in variants.items()},
        "unit": "us",
        "shape": shape,
    }
    os.makedirs(os.path.dirname(RECORD_PATH), exist_ok=True)
    with open(RECORD_PATH, "w") as f:
        json.dump(data, f, indent=2)
    _table.cache_clear()
