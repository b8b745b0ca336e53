#!/usr/bin/env python
"""Single-chip training-step throughput (img/s) per family.

Same chained device-loop protocol as bench.py, but the data dependence is
natural: ``lax.fori_loop`` carries the TrainState, so iteration i+1's
gradients depend on iteration i's weights.  Measures the full production
train step (fwd + bwd + AdamW update + BN running-stat merge + dropout where
the family has sites) on synthetic normalized batches.

    python tools/bench_train.py [--family pmg] [--batch 256] [--record]

--record appends the numbers to results/bench_train.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILY_BATCH = {"pmg": 256, "pm": 128, "rtm": 64}
INNER = {"pmg": 50, "pm": 10, "rtm": 5}
REPEATS = 3


def measure(family: str, batch: int) -> float:
    import jax
    import jax.numpy as jnp

    import bench
    from wadt.config import IGNORE_INDEX
    from wadt.parallel.train import make_train_step

    mod, spec, params = bench.build(family)
    del mod, params
    init_fn, step_fn = make_train_step(family, spec)
    state = init_fn(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    nt = len(spec.tasks)
    images = jnp.asarray(rng.randn(batch, 224, 224, 3), jnp.float32)
    labels_np = rng.randint(0, 2, (batch, nt)).astype(np.int32)
    labels_np[rng.rand(batch, nt) < 0.2] = IGNORE_INDEX  # missing annotations
    labels = jnp.asarray(labels_np)
    inner = INNER[family]

    def chain(state, images, labels):
        def one(i, st):
            st2, _ = step_fn(st, images, labels)
            return st2

        st = jax.lax.fori_loop(0, inner, one, state)
        # scalar that depends on the whole weight chain
        leaf = jax.tree_util.tree_leaves(st.params)[0]
        return jnp.sum(leaf).astype(jnp.float32)

    cchain = jax.jit(chain)
    float(cchain(state, images, labels))  # compile + warm
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(cchain(state, images, labels))
        best = min(best, (time.perf_counter() - t0) / inner)
    return batch / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=("pmg", "pm", "rtm", "all"), default="all")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--record", action="store_true",
                    help="write results/bench_train.json")
    args = ap.parse_args()

    fams = ("pmg", "pm", "rtm") if args.family == "all" else (args.family,)
    out = {}
    for fam in fams:
        batch = args.batch or FAMILY_BATCH[fam]
        ips = measure(fam, batch)
        out[fam] = {"train_images_per_sec": round(ips, 1), "batch": batch}
        print(f"[train] {fam} batch={batch}: {ips:,.0f} img/s")
    if args.record:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "results", "bench_train.json")
        try:
            with open(path) as f:
                prev = json.load(f)
        except (OSError, ValueError):
            prev = {}
        prev.update(out)
        with open(path, "w") as f:
            json.dump(prev, f, indent=2)
        print("recorded ->", path)


if __name__ == "__main__":
    main()
