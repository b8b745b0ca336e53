#!/usr/bin/env python
"""Probe: does a lax.scan over K stacked micro-batches get the sustained
program?

docs/BENCHMARKING.md "The two regimes": per-batch `jit(forward)` dispatches
(what Engine.run pays today) run the single-dispatch program — for
rtm_bf16_b128 that is ~11.1k img/s vs the 13.6k sustained headline, because
XLA compiles a `fori_loop` BODY with VMEM-resident intermediates (S(1)
buffers) and pipelines across iterations.  bench.py's chains get that via a
data-dependent salt; production can't chain batches that way, but it CAN
stack K independent micro-batches [K, B, ...] and `lax.scan` the same
forward over them in ONE dispatch.  scan lowers to the same while-loop
machinery, so the body should compile the same way — this probe measures
whether it actually does, per family x dtype x K:

  A. standalone: jit(forward), `iters` separate dispatches (Engine.run today)
  S(K): jit(scan over K stacked batches), per-forward = trace total / K
  ref: the roofline "sustained" sub-record for context

Extra HBM traffic vs the chain protocol: each scan iteration reads its own
uint8 slice (~19 MB at B=128, ~23 us at HBM peak) and writes small per-batch
outputs — negligible against a ~9-16 ms forward, so a healthy scan should
land within a few percent of sustained.

Usage: python tools/exp_scan_chunk.py [--family rtm] [--dtype bf16]
       [--batch 128] [--ks 4,8] [--iters 8]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="rtm")
    ap.add_argument("--dtype", choices=("f32", "bf16"), default="bf16")
    ap.add_argument("--batch", type=int, default=None,
                    help="default: the family's production batch "
                    "(bench.FAMILY_BATCH)")
    ap.add_argument("--ks", default="4,8",
                    help="comma-separated scan lengths to probe")
    ap.add_argument("--iters", type=int, default=8,
                    help="standalone dispatches under the trace; scan "
                    "programs run max(2, iters*2//K) dispatches")
    ap.add_argument("--record", action="store_true",
                    help="store the fastest variant as the "
                    "eval_scan_chunk_<family> winner in results/"
                    "kernel_ab.json (consumed by Engine.resolve_scan_chunk"
                    "('auto'); numerics parity is pinned by "
                    "tests/test_misc_paths.py + test_parallel.py)")
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

    if args.batch is None:
        args.batch = bench.default_batch(args.family, args.dtype)

    mod, spec, params = bench.build(args.family)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if dtype != jnp.float32:
        params = cast_tree(params, dtype)
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 256, (args.batch, 224, 224, 3), np.uint8)

    # measure the PRODUCTION wire format: PMG runs the s2d-packed GEMM-stem
    # path (bench.py layout="auto"), PM/RTM the raw-NHWC conv path
    packed = args.family == "pmg" and mod.supports_packed_input(spec)
    if packed:
        from wadt.ops.preprocess import s2d_pack_uint8

        raw = s2d_pack_uint8(raw, spec.plan[0].kernel)

        def fwd(p, u8):
            logits, _ = mod.apply_packed(p, u8, spec, dtype=dtype)
            return logits

    else:

        def fwd(p, u8):
            logits, _ = mod.apply(p, normalize_uint8(u8, dtype), spec)
            return logits

    imgs = jax.device_put(raw)

    t_a, _ = device_time_ms(jax.jit(fwd), params, imgs,
                            iters=args.iters, top_n=1)
    ips_a = args.batch / (t_a / 1e3)
    print(f"A standalone dispatch        : {t_a:8.3f} ms/fwd = "
          f"{ips_a:10,.0f} img/s")

    rows = {"standalone": {"ms_per_fwd": round(t_a, 4),
                           "images_per_sec": round(ips_a, 1)}}
    def one_batch():
        b = rng.randint(0, 256, (args.batch, 224, 224, 3), np.uint8)
        if packed:
            from wadt.ops.preprocess import s2d_pack_uint8

            b = s2d_pack_uint8(b, spec.plan[0].kernel)
        return b

    for k in (int(s) for s in args.ks.split(",")):
        imgs_k = jax.device_put(np.stack([one_batch() for _ in range(k)]))

        def scan_fn(p, u8k):
            def body(c, u8):
                logits = fwd(p, u8)
                # keep the per-iteration output small so the probe isolates
                # the loop-program effect (production outputs are also small)
                return c, logits[:, 0, 0]

            _, outs = jax.lax.scan(body, 0, u8k)
            return outs

        n_disp = max(2, args.iters * 2 // k)
        t_total, _ = device_time_ms(jax.jit(scan_fn), params, imgs_k,
                                    iters=n_disp, top_n=1)
        t_k = t_total / k
        ips_k = args.batch / (t_k / 1e3)
        print(f"S scan over K={k:<2d} stacked     : {t_k:8.3f} ms/fwd = "
              f"{ips_k:10,.0f} img/s   ({ips_k / ips_a - 1:+.1%} vs standalone)")
        rows[f"scan_k{k}"] = {"ms_per_fwd": round(t_k, 4),
                              "images_per_sec": round(ips_k, 1)}

    # context: recorded sustained sub-record, if present
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "roofline.json")
    try:
        with open(path) as f:
            cfg = json.load(f)["configs"]
        key = f"{args.family}_{args.dtype}_b{args.batch}"
        sus = cfg.get(key, {}).get("sustained")
        if sus:
            print(f"recorded sustained ({key}): {sus['device_ms']:.3f} ms/fwd "
                  f"= {sus['images_per_sec']:,.0f} img/s")
    except (OSError, ValueError, KeyError):
        pass

    print(json.dumps({f"{args.family}_{args.dtype}_b{args.batch}": rows}))

    if args.record:
        from wadt.ops.kernel_select import record

        # variants in us/img so the record is shape-normalized
        variants = {
            name: 1e3 * r["ms_per_fwd"] / args.batch
            for name, r in rows.items()
        }
        win = min(variants, key=variants.get)
        # only flip the production dispatch for a >2% win — standalone is
        # the simpler program and run spread is ~1-2% on this rig
        if win != "standalone" and (
            variants["standalone"] / variants[win] < 1.02
        ):
            win = "standalone"
        record(
            f"eval_scan_chunk_{args.family}_{args.dtype}", win, variants,
            shape=f"b{args.batch} {args.dtype} 224px",
        )
        print(f"recorded eval_scan_chunk_{args.family}_{args.dtype} "
              f"winner={win}")


if __name__ == "__main__":
    main()
