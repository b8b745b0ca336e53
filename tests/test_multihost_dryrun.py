"""Opt-in multi-host dryrun proof: 2 CPU processes x 4 virtual devices over
one 8-device ('data','model') mesh must reproduce the single-process
per-step losses to fp tolerance (tools/dryrun_multihost.py — the SURVEY
§5.8 `jax.make_array_from_process_local_data` host-feeding path).

Spawns real OS processes that each initialize jax.distributed, so it is
opt-in like the reference-parity suite (subprocess startup + two full XLA
CPU inits is ~1 min):

    WADT_MULTIHOST=1 python -m pytest tests/test_multihost_dryrun.py

The recorded pass artifact lives at results/multihost_dryrun.json
(`python tools/dryrun_multihost.py --record`).
"""

import os
import subprocess
import sys

import pytest

from tests.conftest import REPO

pytestmark = pytest.mark.skipif(
    os.environ.get("WADT_MULTIHOST") != "1",
    reason="opt-in: set WADT_MULTIHOST=1 (spawns 2 jax.distributed processes)",
)


def test_multihost_matches_single_process():
    env = {
        k: v for k, v in os.environ.items()
        # children pick their own platform/device-count config; the test
        # suite's CPU pinning must not leak into their XLA_FLAGS
        if k not in ("XLA_FLAGS",)
    }
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dryrun_multihost.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dryrun_multihost: PASS" in proc.stdout, proc.stdout
