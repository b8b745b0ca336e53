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
