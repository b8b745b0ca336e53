#!/usr/bin/env python
"""Reconcile the RTM bf16 evidence split (round-3 verdict weak #2).

results/roofline.json (trace of STANDALONE dispatches) records rtm_bf16_b128
at ~11.0k img/s while bench_matrix/bench_floor (differential N-vs-2N
fori_loop CHAINS) record 13.5k — a 22% gap that PMG/PM don't show (3-5%).

This tool measures the SAME forward in both regimes with the same
trace-derived protocol and attributes the difference per op KIND:

  A. standalone: jit(forward), 20 separate dispatches under one trace,
     per-forward = total device time / 20  (the roofline protocol)
  B. chained: ONE dispatch of a 20-iteration fori_loop chain (bench.py's
     chain construction, data-dependent salt), per-forward = total / 20

Hypothesis: the chain lets XLA hoist loop-invariant work (weight layout
conversions for the convs) out of the loop, so per-dispatch regime A pays
layout copies every call that regime B amortizes.  If so, ops of kind
copy/transpose/bitcast-convert dominate A-minus-B.

Usage: python tools/exp_rtm_regimes.py [--family rtm] [--dtype bf16]
       [--batch 128] [--inner 20]
"""

import argparse
import collections
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_KIND_RE = re.compile(r"=\s*\S+\s+([a-zA-Z-]+)\(")


def op_kind(name: str) -> str:
    m = _KIND_RE.search(name)
    kind = m.group(1) if m else name.split()[0].lstrip("%").split(".")[0]
    if kind == "fusion":
        # split fusions by what they wrap when the name hints at it
        if "convolution" in name:
            return "fusion(conv)"
        if "dot" in name or "einsum" in name:
            return "fusion(dot)"
        return "fusion(other)"
    return kind


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="rtm")
    ap.add_argument("--dtype", choices=("f32", "bf16"), default="bf16")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--inner", type=int, default=20)
    args = ap.parse_args()

    from wadt.config import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    import bench

    bench.wait_for_healthy_device(deadline_s=300.0)

    import jax
    import jax.numpy as jnp

    from wadt.ops.nn import cast_tree
    from wadt.ops.preprocess import normalize_uint8
    from wadt.utils.devtime import device_time_ms

    mod, spec, params = bench.build(args.family)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if dtype != jnp.float32:
        params = cast_tree(params, dtype)
    rng = np.random.RandomState(0)
    imgs = jax.device_put(
        rng.randint(0, 256, (args.batch, 224, 224, 3), np.uint8))

    def fwd(p, u8):
        logits, _ = mod.apply(p, normalize_uint8(u8, dtype), spec)
        return logits

    # A: standalone dispatches (roofline protocol); top_n covers ALL ops so
    # the per-kind sums below are complete, not top-12 truncated
    t_a, top_a = device_time_ms(
        jax.jit(fwd), params, imgs, iters=args.inner, top_n=10_000)
    ips_a = args.batch / (t_a / 1e3)

    # B: one chained dispatch of `inner` data-dependent forwards
    def chain_fn(p, u8):
        def one(i, salt):
            x = normalize_uint8(u8, dtype) + salt
            logits, _ = mod.apply(p, x, spec)
            return (logits[0, 0, 0] * 0.0).astype(dtype)

        return jax.lax.fori_loop(0, args.inner, one, jnp.zeros((), dtype))

    t_b_total, top_b = device_time_ms(
        jax.jit(chain_fn), params, imgs, iters=1, top_n=10_000)
    t_b = t_b_total / args.inner
    ips_b = args.batch / (t_b / 1e3)

    # C: the differential wall protocol (the recorded headline), for context
    def make_chain(n):
        def cf(p, u8):
            def one(i, salt):
                x = normalize_uint8(u8, dtype) + salt
                logits, _ = mod.apply(p, x, spec)
                return (logits[0, 0, 0] * 0.0).astype(dtype)

            return jax.lax.fori_loop(0, n, one, jnp.zeros((), dtype))

        return jax.jit(cf)

    per_fwd_c = bench.differential_seconds_per_step(
        make_chain, (params, imgs), args.inner, label="regimes")
    ips_c = args.batch / per_fwd_c

    print(f"A standalone-dispatch trace : {t_a:8.3f} ms/fwd = {ips_a:10,.0f} img/s")
    print(f"B chained trace (inner={args.inner:3d})  : {t_b:8.3f} ms/fwd = {ips_b:10,.0f} img/s")
    print(f"C differential wall (N vs 2N): {per_fwd_c*1e3:8.3f} ms/fwd = {ips_c:10,.0f} img/s")
    print(f"A/B per-forward ratio: {t_a/t_b:.3f}")

    # per-kind attribution (top_* carry (ms, name) pairs; B's are per-chain,
    # so scale to per-forward)
    by_a = collections.Counter()
    for ms, name in top_a:
        by_a[op_kind(name)] += ms
    by_b = collections.Counter()
    for ms, name in top_b:
        by_b[op_kind(name)] += ms / args.inner

    kinds = sorted(set(by_a) | set(by_b),
                   key=lambda k: -(by_a.get(k, 0) - by_b.get(k, 0)))
    print(f"\nper-forward device time by op kind (all ops), ms:")
    print(f"{'kind':24s} {'A standalone':>13s} {'B chained':>11s} {'A-B':>9s}")
    for k in kinds:
        a, b = by_a.get(k, 0.0), by_b.get(k, 0.0)
        print(f"{k:24s} {a:13.4f} {b:11.4f} {a-b:9.4f}")

    print("\ntop standalone ops:")
    for ms, name in top_a[:8]:
        print(f"  {ms*1e3:9.1f} us  {name[:140]}")
    print("\ntop chained ops (per forward):")
    for ms, name in top_b[:8]:
        print(f"  {ms/args.inner*1e3:9.1f} us  {name[:140]}")


if __name__ == "__main__":
    main()
