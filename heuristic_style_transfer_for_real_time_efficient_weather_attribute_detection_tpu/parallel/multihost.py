"""Multi-host (multi-process) data feeding for the sharded train step.

SURVEY.md §5.8's host-feeding path: in a multi-host TPU pod each process
sees only its local chips, so the host pipeline loads only its slice of the
global batch and ``jax.make_array_from_process_local_data`` assembles the
global jax.Array the jitted step consumes — no host ever materializes the
full batch, and the step function itself (parallel/train.make_train_step)
is unchanged: the same NamedShardings describe the global layout whether
the mesh spans one process or many.

Proven by ``tools/dryrun_multihost.py``: a 2-process CPU run (4 virtual
devices each, one 8-device ('data','model') mesh) whose per-process
half-batches reproduce the single-process loss exactly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_process(
    coordinator: str,
    num_processes: int,
    process_id: int,
    local_devices: Optional[int] = None,
) -> None:
    """Join the multi-process runtime.  Call BEFORE any backend use.

    On TPU pods ``local_devices`` stays None (the chips attached to this
    host).  For CPU validation runs it forces ``local_devices`` virtual
    host devices and pins the cpu platform (this rig's axon sitecustomize
    re-pins jax_platforms at interpreter start, so the env var alone is
    not enough — CLAUDE.md).
    """
    import os

    if local_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={local_devices}"
            ).strip()
        jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_local_batch(mesh: Mesh, *arrays, axis: str = "data") -> Tuple:
    """Assemble global batch Arrays from THIS process's local rows.

    Each array is this process's contiguous slice of the global batch
    (global_rows / num_processes); the returned jax.Arrays carry the
    ``P(axis)`` sharding the train step's ``in_shardings`` expect.
    """
    out = []
    for a in arrays:
        sh = NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))
        out.append(jax.make_array_from_process_local_data(sh, a))
    return tuple(out)
