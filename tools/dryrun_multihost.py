#!/usr/bin/env python
"""Multi-host dryrun: 2 CPU processes x 4 virtual devices = one 8-device
('data','model') mesh, each process feeding only its HALF of the global
batch via jax.make_array_from_process_local_data (parallel/multihost.py),
through the same sharded train step the single-process path uses.

PASS = the 2-process run's per-step losses match a single-process
8-virtual-device run on the same global data to fp tolerance.

Usage:  python tools/dryrun_multihost.py [--record]
        (parent: spawns the pair, runs the reference, compares;
         --record writes a pass record to results/multihost_dryrun.json)
Internal child mode is selected via WADT_MH_PROC.
"""

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NUM_PROC = 2
LOCAL_DEVICES = 4
GLOBAL_BATCH = 16
STEPS = 3
PORT = 12355

TINY = dict(
    ndf=8, patch_size=16, patch_div=2, gram_channels=16, d_model=32,
    transformer_layers=1, transformer_heads=2, norm="batch",
)
TASKS = {"A": ["a0", "a1", "a2"], "B": ["b0", "b1"]}


def _global_data():
    """Deterministic global batch — every participant regenerates it and
    slices its own rows (a real loader would read only its slice)."""
    import numpy as np

    from wadt.config import IGNORE_INDEX

    rng = np.random.RandomState(0)
    images = rng.randn(GLOBAL_BATCH, 32, 32, 3).astype(np.float32)
    labels = rng.randint(0, 2, (GLOBAL_BATCH, 2)).astype(np.int32)
    labels[0, 0] = IGNORE_INDEX
    return images, labels


def _run_steps(step_fn, init_fn, images, labels):
    import jax

    state = init_fn(jax.random.PRNGKey(0))
    losses = []
    for _ in range(STEPS):
        state, loss = step_fn(state, images, labels)
        losses.append(float(loss))
    return losses


def child(proc_id: int, out_path: str):
    from wadt.parallel.multihost import host_local_batch, initialize_process

    initialize_process(
        f"localhost:{PORT}", NUM_PROC, proc_id, local_devices=LOCAL_DEVICES
    )

    import jax

    assert jax.device_count() == NUM_PROC * LOCAL_DEVICES, jax.device_count()
    assert jax.local_device_count() == LOCAL_DEVICES

    from wadt.models import pmg
    from wadt.parallel.mesh import make_mesh
    from wadt.parallel.train import make_train_step

    mesh = make_mesh(NUM_PROC * LOCAL_DEVICES, axes=("data", "model"), shape=(4, 2))
    spec = pmg.build_spec(TASKS, TINY)
    init_fn, step_fn = make_train_step("pmg", spec, mesh=mesh)

    images, labels = _global_data()
    rows = GLOBAL_BATCH // NUM_PROC
    lo = proc_id * rows
    g_images, g_labels = host_local_batch(
        mesh, images[lo : lo + rows], labels[lo : lo + rows]
    )
    # each process handed over only its local rows; the Arrays are global
    assert g_images.shape == (GLOBAL_BATCH, 32, 32, 3), g_images.shape

    losses = _run_steps(step_fn, init_fn, g_images, g_labels)
    if proc_id == 0:
        with open(out_path, "w") as f:
            json.dump({"losses": losses}, f)
    jax.distributed.shutdown()


def parent(record: bool = False):
    out_path = "/tmp/wadt_multihost_losses.json"
    if os.path.exists(out_path):
        os.remove(out_path)
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env={**env, "WADT_MH_PROC": str(i), "WADT_MH_OUT": out_path},
        )
        for i in range(NUM_PROC)
    ]
    rcs = [p.wait(timeout=600) for p in procs]
    assert all(rc == 0 for rc in rcs), f"child exit codes {rcs}"
    with open(out_path) as f:
        multi = json.load(f)["losses"]

    # single-process reference on the same global data (8 virtual devices)
    import jax

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={NUM_PROC * LOCAL_DEVICES}"
        ).strip()
    jax.config.update("jax_platforms", "cpu")

    from wadt.models import pmg
    from wadt.parallel.mesh import make_mesh
    from wadt.parallel.train import make_train_step

    mesh = make_mesh(NUM_PROC * LOCAL_DEVICES, axes=("data", "model"), shape=(4, 2))
    spec = pmg.build_spec(TASKS, TINY)
    init_fn, step_fn = make_train_step("pmg", spec, mesh=mesh)
    images, labels = _global_data()
    single = _run_steps(step_fn, init_fn, images, labels)

    worst = max(abs(a - b) for a, b in zip(multi, single))
    print(f"multi-process losses:  {multi}")
    print(f"single-process losses: {single}")
    assert worst < 1e-5, f"multihost diverged: max loss diff {worst}"
    print(f"dryrun_multihost: PASS ({NUM_PROC} processes x {LOCAL_DEVICES} "
          f"devices, {STEPS} steps, max loss diff {worst:.2e})")
    if record:
        rec_path = os.path.join(REPO, "results", "multihost_dryrun.json")
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            capture_output=True, text=True).stdout.strip()
        rec = {
            "date": datetime.date.today().isoformat(),
            "commit": commit,
            "processes": NUM_PROC,
            "local_devices": LOCAL_DEVICES,
            "mesh": {"data": 4, "model": 2},
            "steps": STEPS,
            "multi_process_losses": multi,
            "single_process_losses": single,
            "max_loss_diff": worst,
            "pass": True,
        }
        os.makedirs(os.path.dirname(rec_path), exist_ok=True)
        with open(rec_path, "w") as f:
            json.dump(rec, f, indent=2)
        print(f"recorded -> {rec_path}")


if __name__ == "__main__":
    pid = os.environ.get("WADT_MH_PROC")
    if pid is None:
        ap = argparse.ArgumentParser()
        ap.add_argument("--record", action="store_true",
                        help="write a pass record to results/multihost_dryrun.json")
        parent(record=ap.parse_args().record)
    else:
        child(int(pid), os.environ["WADT_MH_OUT"])
