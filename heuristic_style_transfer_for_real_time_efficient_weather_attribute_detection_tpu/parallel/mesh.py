"""Device mesh + sharding helpers.

Design (SURVEY.md 5.8): these models are 3M-25M params, so weights are
replicated and the *batch* axis is sharded over a 1-D ``data`` mesh riding
ICI; an optional ``model`` axis demonstrates tensor sharding of the wide
per-task head/FFN dims for the multi-chip dry-run.  Inference needs no
collectives at all; training all-reduces gradients via jit's automatic
psum insertion from shardings.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Tuple[str, ...] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    1-D ``('data',)`` by default; pass ``axes=('data','model')`` with an
    explicit ``shape`` for a 2-D data x tensor mesh.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axes)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim_spec: Sequence = ("data",)) -> NamedSharding:
    """Shard the leading (batch) axis over the ``data`` mesh axis."""
    return NamedSharding(mesh, P(*ndim_spec))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
