#!/usr/bin/env python
"""Headline benchmark: flagship PMG (shipped production config, 12 tasks)
single-chip sustained inference throughput at 224px.

Timing protocol — device-side loop with data dependence.  On this rig the
TPU sits behind a network relay where ``block_until_ready`` can return before
device execution finishes, so naive dispatch loops overstate throughput by
>10x (verified: batch-size sweeps came out flat).  Instead we jit ONE program
that runs the forward N times inside ``lax.fori_loop``, each iteration
data-dependent on the previous (its output perturbs the next input), and
fetch a scalar result to the host — the wall-clock then provably contains N
sequential executions.

The input batch is device-resident uint8 (device-side normalize is part of
the measured forward).  Host->device feeding is excluded: the relay's ~0.1
GB/s host link is an environment artifact (real v5e PCIe does >10 GB/s,
far above this model's ~40 MB per batch).

Baseline: the reference publishes no numbers; its benchmark loop is
synchronous batch=1 PyTorch (utils/benchmark_utils.py:67-75).  Derived
north-star (BASELINE.md): >1000 images/sec on one TPU v5e chip;
``vs_baseline`` = measured / 1000.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BATCH = 512
INNER = 100  # forwards per device loop
REPEATS = 4


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as graft
    from heuristic_style_transfer_for_real_time_efficient_weather_attribute_detection_tpu.models import pmg
    from heuristic_style_transfer_for_real_time_efficient_weather_attribute_detection_tpu.ops.preprocess import (
        normalize_uint8,
    )

    _, spec, params = graft._flagship()
    rng = np.random.RandomState(0)
    imgs = jax.device_put(rng.randint(0, 256, (BATCH, 224, 224, 3), np.uint8))

    def chain_fn(p, u8):
        def one(i, salt):
            x = normalize_uint8(u8, jnp.float32) + salt
            logits, _ = pmg.apply(p, x, spec)
            return logits[0, 0, 0] * 0.0  # device-side dependence, no host sync

        return jax.lax.fori_loop(0, INNER, one, jnp.float32(0))

    chain = jax.jit(chain_fn)
    float(chain(params, imgs))  # compile + first run

    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(chain(params, imgs))  # scalar fetch = true completion barrier
        best = min(best, (time.perf_counter() - t0) / INNER)

    ips = BATCH / best
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
