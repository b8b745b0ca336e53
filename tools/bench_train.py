#!/usr/bin/env python
"""Single-chip training-step throughput (img/s) per family.

Same differential chained device-loop protocol as bench.py (N-vs-2N chains
cancel the fixed dispatch cost), with natural data dependence:
``lax.fori_loop`` carries the TrainState, so iteration i+1's gradients
depend on iteration i's weights.  Measures the full production train step
(fwd + bwd + AdamW update + BN running-stat merge + dropout where the
family has sites) on synthetic normalized batches.

    python tools/bench_train.py [--family pmg] [--batch 256] [--record]

--record appends the numbers to results/bench_train.json.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILY_BATCH = {"pmg": 256, "pm": 128, "rtm": 64}
# bf16 halves activation memory: RTM sustains (and prefers) batch 256
# (sweep 2026-08-16: 64 -> 1579, 128 -> 1880, 256 -> 2072 img/s; 512 -> 2031
# on 2026-08-18 — 256 is the peak.  pmg_bf16 512 -> 101k vs 110k at 256.)
BF16_FAMILY_BATCH = {"pmg": 256, "pm": 128, "rtm": 256}
INNER = {"pmg": 50, "pm": 20, "rtm": 10}  # short chain; 2x also timed
REPEATS = 3


def measure(family: str, batch: int, bf16: bool = False) -> float:
    import jax
    import jax.numpy as jnp

    import bench
    from wadt.config import IGNORE_INDEX
    from wadt.parallel.train import make_train_step

    mod, spec, params = bench.build(family)
    del mod, params
    cdt = jnp.bfloat16 if bf16 else None
    init_fn, step_fn = make_train_step(family, spec, compute_dtype=cdt)
    state = init_fn(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    nt = len(spec.tasks)
    images = jnp.asarray(rng.randn(batch, 224, 224, 3), jnp.float32)
    labels_np = rng.randint(0, 2, (batch, nt)).astype(np.int32)
    labels_np[rng.rand(batch, nt) < 0.2] = IGNORE_INDEX  # missing annotations
    labels = jnp.asarray(labels_np)
    inner = INNER[family]

    def make_chain(n):
        def chain(state, images, labels):
            def one(i, st):
                st2, _ = step_fn(st, images, labels)
                return st2

            st = jax.lax.fori_loop(0, n, one, state)
            # scalar that depends on the whole weight chain
            leaf = jax.tree_util.tree_leaves(st.params)[0]
            return jnp.sum(leaf).astype(jnp.float32)

        return jax.jit(chain)

    per_step = bench.differential_seconds_per_step(
        make_chain, (state, images, labels), inner,
        repeats=REPEATS, label=f"train/{family}",
    )
    return batch / per_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=("pmg", "pm", "rtm", "all"), default="all")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 forward/backward against f32 master weights")
    ap.add_argument("--record", action="store_true",
                    help="write results/bench_train.json")
    args = ap.parse_args()

    from wadt.config import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    # bounded relay-wedge probe (shared with bench.py): a wedged relay
    # otherwise hangs this tool silently with 0 CPU
    import bench

    bench.wait_for_healthy_device(deadline_s=300.0)

    fams = ("pmg", "pm", "rtm") if args.family == "all" else (args.family,)
    out = {}
    for fam in fams:
        table = BF16_FAMILY_BATCH if args.bf16 else FAMILY_BATCH
        batch = args.batch or table[fam]
        ips = measure(fam, batch, bf16=args.bf16)
        key = fam + ("_bf16" if args.bf16 else "")
        out[key] = {"train_images_per_sec": round(ips, 1), "batch": batch}
        print(f"[train] {key} batch={batch}: {ips:,.0f} img/s")
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
