#!/usr/bin/env python
"""Headline benchmark: single-chip sustained inference throughput at 224px.

Default invocation measures the flagship PMG (shipped production config,
12 tasks) in f32 and prints ONE JSON line — the driver contract.  Flags
extend the same protocol to every family and dtype:

    python bench.py --family rtm --dtype bf16 [--batch 256]
    python bench.py --all        # 3 families x 2 dtypes -> results/bench_matrix.json

Timing protocol — device-side loop with data dependence.  On this rig the
TPU sits behind a network relay where ``block_until_ready`` can return before
device execution finishes, so naive dispatch loops overstate throughput by
>10x (verified: batch-size sweeps came out flat).  Instead we jit programs
that run the forward N and 2N times inside ``lax.fori_loop``, each iteration
data-dependent on the previous (its output perturbs the next input), and
fetch a scalar result to the host — each wall-clock then provably contains
that many sequential executions, and the N-vs-2N difference cancels the
fixed per-dispatch cost (relay round-trip ~30-40ms), leaving a dispatch-free
per-forward time.

The input batch is device-resident uint8 (device-side normalize is part of
the measured forward).  Host->device feeding is excluded: the relay's ~0.1
GB/s host link is an environment artifact (real v5e PCIe does >10 GB/s,
far above this model's ~40 MB per batch).

Baseline: the reference publishes no numbers; its benchmark loop is
synchronous batch=1 PyTorch (utils/benchmark_utils.py:67-75).  Derived
north-star (BASELINE.md): >1000 images/sec on one TPU v5e chip;
``vs_baseline`` = measured / 1000.

stdout is always exactly ONE JSON line: {"metric", "value", "unit",
"vs_baseline"} (the PMG-f32 headline under --all; per-config details go to
stderr / the matrix file).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

# Per-family compiled batch — measured sweep winners, not memory limits:
# RTM peaks at 128 for BOTH dtypes (bf16: 13.5k recorded in
# bench_matrix.json — the sweep run itself read 13.7k, within the run
# spread — vs 12.6k at 256, with
# 64/96/160/192/512/1024 all lower; f32: 7.87k vs 7.69k same-day — 2026-08-18
# sweep via `bench.py --family rtm --batch N`).  PM: 128/512 measured
# -1.4%/-2.5% f32 (512 -2.6% bf16).  PMG: >512 loses (tools/exp_pmg_batch.py);
# 256 -0.5%, 384 +0.9% f32 — within the ~1% run spread, not worth the churn.
FAMILY_BATCH = {"pmg": 512, "pm": 256, "rtm": 128}
# Hook for winners that differ by dtype within a family (none currently).
DTYPE_BATCH = {}


def default_batch(family: str, dtype_name: str) -> int:
    return DTYPE_BATCH.get((family, dtype_name), FAMILY_BATCH[family])
# Forwards per device loop (the short chain; a 2x chain is also timed and
# the difference cancels the fixed per-dispatch relay round-trip — see
# measure()).  All >=20 per CLAUDE.md's honest-timing amortization rule.
INNER = {"pmg": 100, "pm": 40, "rtm": 20}
REPEATS = 4


def build(family):
    """(apply_closure, spec, params) for the family's headline config."""
    import jax

    import __graft_entry__ as graft
    from heuristic_style_transfer_for_real_time_efficient_weather_attribute_detection_tpu.models import (
        get_family,
    )

    if family == "pmg":
        mod, spec, params = graft._flagship()
        return mod, spec, params
    with open(os.path.join(REPO, "configs", "tasks.json")) as f:
        tasks = json.load(f)
    mod = get_family(family)
    # Headline configs: PM reference defaults (~13M params); RTM full
    # truncated ResNet-50 + attention heads (~24M params).
    spec = mod.build_spec(tasks, {})
    params = mod.init(jax.random.PRNGKey(0), spec)
    return mod, spec, params


def measure(family: str, dtype_name: str, batch: int, layout: str = "auto") -> float:
    """Sustained img/s via the chained device-loop protocol.

    ``layout="auto"`` measures the production wire format — for PMG that is
    the space-to-depth packed uint8 batch (the BatchLoader/Engine default,
    models/pmg.apply_packed; same bytes, same math, 1.6x faster at batch
    512); ``layout="raw"`` forces the raw-NHWC conv path.
    """
    import jax
    import jax.numpy as jnp

    from heuristic_style_transfer_for_real_time_efficient_weather_attribute_detection_tpu.ops.nn import (
        cast_tree,
    )
    from heuristic_style_transfer_for_real_time_efficient_weather_attribute_detection_tpu.ops.preprocess import (
        normalize_uint8,
        s2d_pack_uint8,
    )

    mod, spec, params = build(family)
    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    if dtype != jnp.float32:
        params = cast_tree(params, dtype)
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 256, (batch, 224, 224, 3), np.uint8)
    inner = INNER[family]

    packed = (
        layout == "auto"
        and family == "pmg"
        and mod.supports_packed_input(spec)
    )
    if packed:
        imgs = jax.device_put(s2d_pack_uint8(raw, spec.plan[0].kernel))

        def make_chain(n):
            def chain_fn(p, z8):
                def one(i, salt):
                    logits, _ = mod.apply_packed(
                        p, jnp.bitwise_xor(z8, salt), spec, dtype=dtype
                    )
                    return (logits[0, 0, 0] * 0.0).astype(jnp.uint8)

                return jax.lax.fori_loop(0, n, one, jnp.zeros((), jnp.uint8))

            return jax.jit(chain_fn)

    else:
        imgs = jax.device_put(raw)

        def make_chain(n):
            def chain_fn(p, u8):
                def one(i, salt):
                    x = normalize_uint8(u8, dtype) + salt
                    logits, _ = mod.apply(p, x, spec)
                    return (logits[0, 0, 0] * 0.0).astype(dtype)

                return jax.lax.fori_loop(0, n, one, jnp.zeros((), dtype))

            return jax.jit(chain_fn)

    per_forward = differential_seconds_per_step(
        make_chain, (params, imgs), inner, label=family
    )
    return batch / per_forward


def differential_seconds_per_step(make_chain, args, inner, *,
                                  repeats=None, label=""):
    """Differential chained-loop protocol: time chains of N and 2N steps;
    the fixed per-dispatch cost (relay round-trip + launch + scalar fetch,
    ~30-40ms here) appears once in EACH wall time and cancels in the
    difference, so per-step time carries zero dispatch bias at any chain
    length.  ``make_chain(n)`` must return a jitted callable over ``args``
    whose scalar result depends on all n steps."""
    chain1, chain2 = make_chain(inner), make_chain(2 * inner)
    float(chain1(*args))  # compile + first run
    float(chain2(*args))

    def best_wall(chain):
        best = float("inf")
        for _ in range(repeats or REPEATS):
            t0 = time.perf_counter()
            float(chain(*args))  # scalar fetch = completion barrier
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = best_wall(chain1), best_wall(chain2)
    # Sanity: the 2N chain must take meaningfully longer than the N chain
    # (ideally ~2x).  If relay jitter swamps the difference the quotient is
    # garbage — refuse to report a number rather than record noise.
    if t2 < 1.2 * t1:
        raise RuntimeError(
            f"differential timing unusable ({label}): wall(N)={t1:.4f}s "
            f"wall(2N)={t2:.4f}s — dispatch jitter exceeds the chain time; "
            "raise the chain length or rerun"
        )
    return (t2 - t1) / inner


def result_line(family: str, dtype_name: str, ips: float) -> dict:
    suffix = "" if dtype_name == "f32" else f"_{dtype_name}"
    return {
        "metric": f"{family}_sustained_inference_throughput_224px_1chip{suffix}",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(ips / 1000.0, 3),
    }


def wait_for_healthy_device(deadline_s: float = 900.0) -> None:
    """Bounded wait for the TPU relay to recover from a wedge.

    The rig's relay occasionally wedges: ``jax.devices()`` works but any
    execution hangs forever with 0 CPU (CLAUDE.md).  A hang here would
    leave the driver's end-of-round bench with no recorded number at all,
    so before building anything we probe with a tiny matmul in a
    SUBPROCESS (the only way to bound a hung execution) and retry until
    ``deadline_s``.  On a healthy device the first probe passes in ~10 s
    and we proceed immediately; if the deadline expires we proceed anyway
    and let the driver's own timeout make the call.
    """
    import subprocess

    probe = ("import jax, jax.numpy as jnp; "
             "print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()))")
    t0 = time.perf_counter()
    attempt = 0
    while True:
        attempt += 1
        try:
            subprocess.run(
                [sys.executable, "-c", probe], timeout=60,
                check=True, capture_output=True,
            )
            if attempt > 1:
                print(f"[bench] relay recovered after "
                      f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            waited = time.perf_counter() - t0
            if waited > deadline_s:
                print(f"[bench] device probe still failing after "
                      f"{waited:.0f}s; proceeding anyway", file=sys.stderr)
                return
            print(f"[bench] device probe failed (attempt {attempt}, "
                  f"{waited:.0f}s) — relay wedge? retrying in 30s",
                  file=sys.stderr)
            time.sleep(30)


def main():
    # persist compiled executables (~/.cache/wadt/xla_cache): the N/2N
    # chains are 2 programs per config and recompile-free on reruns
    from heuristic_style_transfer_for_real_time_efficient_weather_attribute_detection_tpu.config import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    wait_for_healthy_device()

    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=("pmg", "pm", "rtm"), default="pmg")
    ap.add_argument("--dtype", choices=("f32", "bf16"), default="f32")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--all", action="store_true",
                    help="run 3 families x 2 dtypes -> results/bench_matrix.json")
    ap.add_argument("--layout", choices=("auto", "raw"), default="auto",
                    help="auto = production wire format (packed for PMG); "
                         "raw = force the raw-NHWC conv path")
    ap.add_argument("--record", action="store_true",
                    help="merge this single-config measurement into "
                         "results/bench_matrix.json (key gains a _raw "
                         "suffix under --layout raw)")
    args = ap.parse_args()

    if args.all:
        # MERGE into the existing matrix (a full sweep must not drop
        # single-config rows like pmg_f32_raw) and stamp per-row
        # provenance — rows can legitimately come from different runs.
        path = os.path.join(REPO, "results", "bench_matrix.json")
        try:
            with open(path) as f:
                matrix = json.load(f)
        except (OSError, ValueError):
            matrix = {}
        for family in ("pmg", "pm", "rtm"):
            for dtype_name in ("f32", "bf16"):
                batch = args.batch or default_batch(family, dtype_name)
                ips = measure(family, dtype_name, batch, args.layout)
                matrix[f"{family}_{dtype_name}"] = {
                    "images_per_sec": round(ips, 1), "batch": batch,
                    **_provenance(),
                }
                print(f"[bench] {family} {dtype_name} batch={batch}: "
                      f"{ips:,.0f} img/s", file=sys.stderr)
        os.makedirs(os.path.join(REPO, "results"), exist_ok=True)
        with open(path, "w") as f:
            json.dump(matrix, f, indent=2)
        headline = matrix["pmg_f32"]["images_per_sec"]
        print(json.dumps(result_line("pmg", "f32", headline)))
        return

    batch = args.batch or default_batch(args.family, args.dtype)
    ips = measure(args.family, args.dtype, batch, args.layout)
    if args.record:
        key = f"{args.family}_{args.dtype}"
        if args.layout == "raw":
            key += "_raw"
        path = os.path.join(REPO, "results", "bench_matrix.json")
        try:
            with open(path) as f:
                matrix = json.load(f)
        except (OSError, ValueError):
            matrix = {}
        matrix[key] = {"images_per_sec": round(ips, 1), "batch": batch,
                       **_provenance()}
        if args.layout == "raw":
            matrix[key]["layout"] = "raw"
        with open(path, "w") as f:
            json.dump(matrix, f, indent=2)
        print(f"[bench] recorded {key} -> {path}", file=sys.stderr)
    print(json.dumps(result_line(args.family, args.dtype, ips)))


def _provenance():
    import datetime
    import subprocess

    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True).stdout.strip()
    return {"date": datetime.date.today().isoformat(), "commit": commit}


if __name__ == "__main__":
    main()
