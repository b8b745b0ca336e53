#!/usr/bin/env python
"""Style-transfer optimizer throughput on the real chip — the README's
s/image claim, recorded.

Measures the device-side ``lax.while_loop`` optimizer
(workloads/style_transfer.run_patch_gram_style_transfer_batch) at the
README config: shipped PMG weights, 224 px style images, 300 iterations,
batch 5, ``target_loss=0`` so no image early-stops (worst case — every
image runs the full budget).  Wall-clock includes the per-chunk dispatch
round-trips (6 chunks at log_every=50), excludes compile (one warm-up
chunk runs first).

A host-stepped leg (log_every=1 → one dispatch per iteration, the shape a
naive port of the reference's Python optimizer loop takes,
utils/PMG/PMG_style_transfer.py:89-98) is measured over a short prefix and
extrapolated to 300 iterations — running it in full would take ~10 s/image
by construction (300 x the ~35 ms relay round-trip).

--record writes results/bench_style.json (consumed by the doc-number guard
tests/test_docs_numbers.py).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERATIONS = 300
BATCH = 5
HOST_STEP_PREFIX = 20  # iterations measured for the host-stepped estimate


def main():
    from wadt.config import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--record", action="store_true",
                    help="write results/bench_style.json")
    args = ap.parse_args()

    import bench

    bench.wait_for_healthy_device(deadline_s=300.0)

    import __graft_entry__ as graft
    from wadt.ops.preprocess import normalize_uint8
    from wadt.workloads.style_transfer import (
        run_patch_gram_style_transfer_batch,
    )

    _, spec, params = graft._flagship()
    rng = np.random.RandomState(0)
    style_u8 = rng.randint(0, 256, (BATCH, 224, 224, 3), np.uint8)
    style_norm = np.asarray(normalize_uint8(style_u8, np.float32))

    common = dict(lr=0.05, init_type="noise", target_loss=0.0, seed=0)

    # warm-up: compile the chunk while_loop (same shapes as the timed run)
    run_patch_gram_style_transfer_batch(
        params, spec, style_norm, num_iterations=50, log_every=50, **common
    )

    t0 = time.perf_counter()
    _, losses, iters = run_patch_gram_style_transfer_batch(
        params, spec, style_norm,
        num_iterations=ITERATIONS, log_every=50, **common
    )
    wall = time.perf_counter() - t0
    assert int(iters.min()) == ITERATIONS, iters  # no early stop at target 0
    s_per_image = wall / BATCH
    print(f"device-loop: {wall:.2f} s wall for {BATCH} images x {ITERATIONS} "
          f"iters -> {s_per_image:.3f} s/image (final losses "
          f"{np.round(losses, 4).tolist()})")

    # host-stepped comparison: one dispatch per iteration, batch 1 (the
    # reference shape), measured prefix extrapolated to the full budget
    t0 = time.perf_counter()
    run_patch_gram_style_transfer_batch(
        params, spec, style_norm[:1],
        num_iterations=HOST_STEP_PREFIX, log_every=1, **common
    )
    host_prefix = time.perf_counter() - t0
    host_s_per_image = host_prefix / HOST_STEP_PREFIX * ITERATIONS
    print(f"host-stepped (log_every=1, batch 1): {host_prefix:.2f} s for "
          f"{HOST_STEP_PREFIX} iters -> ~{host_s_per_image:.1f} s/image "
          f"extrapolated to {ITERATIONS}")

    if args.record:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "results", "bench_style.json")
        rec = {
            "config": {
                "iterations": ITERATIONS, "batch": BATCH, "size": 224,
                "target_loss": 0.0, "weights": "shipped PMG",
                "protocol": "wall-clock incl. per-chunk dispatch, compile "
                            "excluded (warmed)",
            },
            "s_per_image": round(s_per_image, 3),
            "wall_s": round(wall, 3),
            "host_stepped_s_per_image_est": round(host_s_per_image, 2),
            "host_stepped_note": f"measured {HOST_STEP_PREFIX}-iteration "
                                 "prefix at log_every=1 batch 1, "
                                 "extrapolated",
            "date": time.strftime("%Y-%m-%d"),
        }
        with open(path, "w") as f:
            json.dump(rec, f, indent=2)
        print(f"recorded -> {path}")


if __name__ == "__main__":
    main()
