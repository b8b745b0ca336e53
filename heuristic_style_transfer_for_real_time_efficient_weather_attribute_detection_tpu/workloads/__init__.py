"""Workload layer — ONE implementation of each mode, parameterized by the
Engine, replacing the reference's three near-duplicate per-model pipelines
(SURVEY.md section 1 layering note).

Modes (reference parity): evaluate (classifier), benchmark, inference /
folder / watch_folder, stream (camera), embed (tsne/clustering), explain
(grad-CAM / integrated gradients), style_transfer.
"""

from . import benchmark, evaluate, inference  # noqa: F401
