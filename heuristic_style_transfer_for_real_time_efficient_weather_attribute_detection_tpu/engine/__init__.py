"""Execution engine: jitted executors, checkpoint I/O, loss/metrics kernels."""

from . import checkpoint, executor, export  # noqa: F401
