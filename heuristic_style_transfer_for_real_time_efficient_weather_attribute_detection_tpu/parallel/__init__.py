"""Parallel execution over TPU meshes (data/tensor sharding, training step).

The reference is strictly single-process, single-device (SURVEY.md 2.5);
this layer is the additive TPU-native capability scoped by SURVEY.md 5.8:
batch-axis data parallelism over ICI for throughput, plus a sharded training
step (the reference records training hyperparameters but ships no trainer).
"""

from . import mesh  # noqa: F401
from .mesh import batch_sharding, make_mesh, replicated  # noqa: F401
