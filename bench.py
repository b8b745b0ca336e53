#!/usr/bin/env python
"""Headline benchmark: flagship PMG (shipped production config, 12 tasks)
single-chip sustained inference throughput at 224px.

Protocol: 8 distinct uint8 batches are staged in device HBM, then the jitted
forward (device-side normalize -> trunk -> patch-Gram -> transformer -> 12
task heads) is pumped round-robin, pipelined, for ~2s of steady state.
Device-resident input is the right protocol on this rig: the TPU here sits
behind a loopback network relay whose host link (~0.1 GB/s, high variance)
is an environment artifact — real v5e PCIe moves >10 GB/s, far above this
model's needs.

Baseline context (BASELINE.md): the reference publishes no numbers; its
benchmark loop is synchronous batch=1 PyTorch (utils/benchmark_utils.py:
67-75).  Derived north-star: >1000 images/sec on one TPU v5e chip;
``vs_baseline`` = measured / 1000.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BATCH = 512
N_BUFS = 8
MIN_SECONDS = 2.0


def main():
    import jax

    import __graft_entry__ as graft

    forward, (params, _) = graft.entry()
    fwd = jax.jit(forward)

    rng = np.random.RandomState(0)
    bufs = [
        jax.device_put(rng.randint(0, 256, (BATCH, 224, 224, 3), np.uint8))
        for _ in range(N_BUFS)
    ]
    jax.block_until_ready(bufs)

    # Warmup: compile + a few steady iterations.
    for i in range(5):
        out = fwd(params, bufs[i % N_BUFS])
    jax.block_until_ready(out)

    # Timed: pipelined round-robin until >= MIN_SECONDS of work, synced in
    # chunks so the dispatch queue stays bounded.
    iters = 0
    t0 = time.perf_counter()
    while True:
        for _ in range(50):
            out = fwd(params, bufs[iters % N_BUFS])
            iters += 1
        jax.block_until_ready(out)
        if time.perf_counter() - t0 >= MIN_SECONDS:
            break
    dt = time.perf_counter() - t0

    ips = BATCH * iters / dt
    print(
        json.dumps(
            {
                "metric": "pmg_sustained_inference_throughput_224px_1chip",
                "value": round(ips, 1),
                "unit": "images/sec",
                "vs_baseline": round(ips / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
