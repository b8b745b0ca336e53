"""TPU compute ops: functional layers, norms, attention, Gram, preprocessing.

All ops take/return NHWC activations (TPU-friendly layout; the PyTorch
reference is NCHW — the checkpoint converter transposes weights once at load).
Params are plain pytrees (nested dicts of jnp arrays).
"""

from . import attention, gram, kalman, nn, norms, preprocess  # noqa: F401
