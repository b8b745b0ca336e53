#!/usr/bin/env python
"""Per-frame (batch=1) streaming latency on the real chip — the BASELINE.md
camera/stream latency report.

Default (--family pmg, the flagship) reports:
- generic / packed / fused streaming-step device time (on-device trace
  timestamps — relay-proof; includes softmax + fused Kalman),
- chained device-loop generic forward (the legacy protocol, cross-check),
- end_to_end_p50: submit->result through the AsyncBatcher (includes relay
  round-trip — on this rig dominated by the network relay, on real hardware
  by PCIe + dispatch).

--family pm measures the generic streaming step (overlapping convs — no
packed wire format); --family rtm A/Bs generic vs the folded-attention
variants (exact fold and weight-only-int8 fold, both on the s2d-packed
stem wire).

--record stores the fused-vs-packed winner in results/kernel_ab.json
("fused_trunk_gram"), which StreamPredictor(trunk_kernel="auto") consults.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INNER = 200


def _rtm_q8_parity_ok(spec, dtype) -> bool:
    """Quantized-fold eligibility: argmax must match the frozen reference
    logits on every attention RTM golden fixture (the same walk
    tools/tpu_checklist.py applies at release check time)."""
    from wadt.utils.goldens import rtm_stream_fixture_parity

    del spec  # gate runs over the fixtures' own specs
    fixtures = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures")
    rows = rtm_stream_fixture_parity(fixtures, dtype, quantize_fold=True)
    return all(agree for _, agree, _ in rows)


def main():
    import jax
    import jax.numpy as jnp

    # persist compiled executables: a cold A/B sweep is ~10 distinct programs
    # x ~40 s through the remote-compile service (see CLAUDE.md)
    from wadt.config import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--record", action="store_true",
                    help="store the fused-vs-packed streaming winner in "
                         "results/kernel_ab.json")
    ap.add_argument("--family", choices=("pmg", "pm", "rtm"), default="pmg")
    ap.add_argument("--bf16", action="store_true",
                    help="pm/rtm: bfloat16 streaming step (halves the "
                         "weight-read traffic that dominates batch=1)")
    args = ap.parse_args()

    # bounded relay-wedge probe (shared with bench.py): a wedged relay
    # otherwise hangs this tool silently with 0 CPU; after argparse so
    # --help / bad flags respond instantly
    import bench

    bench.wait_for_healthy_device(deadline_s=300.0)

    import __graft_entry__ as graft
    from wadt.engine.executor import Engine
    from wadt.engine.serving import AsyncBatcher
    from wadt.models import pmg
    from wadt.ops import kernel_select
    from wadt.ops.preprocess import normalize_uint8, s2d_pack_uint8
    from wadt.workloads.stream import StreamPredictor

    rng = np.random.RandomState(0)
    if args.family != "pmg":
        # PM/RTM streaming step (batch=1 uint8 frame on device).  RTM A/Bs
        # the generic vs folded-attention variants (models/rtm.apply_stream).
        import bench

        mod, spec, params = bench.build(args.family)
        raw = rng.randint(0, 256, (224, 224, 3), np.uint8)
        frame = jax.device_put(raw)
        variants = (
            ("generic", "folded", "folded_q8")
            if args.family == "rtm" else ("generic",)
        )
        results = {}
        try:
            from wadt.utils.devtime import device_time_ms
        except ImportError:
            print("profiler protos unavailable; skipping device times")
            return
        dtype = jnp.bfloat16 if args.bf16 else jnp.float32
        for variant in variants:
            pred = StreamPredictor(args.family, spec, params, use_kalman=True,
                                   trunk_kernel=variant, dtype=dtype)
            inp = frame
            if pred._pack_k is not None:  # host-packed wire (RTM stem s2d)
                inp = jax.device_put(s2d_pack_uint8(raw[None], pred._pack_k))
            t, top = device_time_ms(
                lambda p, z, k: pred._step(p, z, k),
                pred.params, inp, pred.kstate, iters=20,
            )
            results[variant] = t * 1e3
            print(f"streaming step [{args.family} {variant:7s}]: {t*1e3:6.1f} "
                  f"us/frame (device, incl. softmax+kalman)")
            for ms, name in top[:4]:
                print(f"    {ms*1e3:8.1f} us  {name}")
        if args.record and {"generic", "folded"} <= set(results):
            win = min(results, key=results.get)
            # argmax parity vs the golden fixtures is the eligibility gate
            # for the quantized fold (weight-only int8 is an approximation;
            # folded/generic are reassociations)
            if win == "folded_q8" and not _rtm_q8_parity_ok(spec, dtype):
                print("folded_q8 fastest but FAILS fixture argmax parity; "
                      "recording next-best")
                win = min((k for k in results if k != "folded_q8"),
                          key=results.get)
            kernel_select.record(
                "rtm_stream_folded", win, results, "batch1 224px defaults",
            )
            print(f"recorded rtm_stream_folded winner={win} -> "
                  f"{kernel_select.RECORD_PATH}")
        return

    _, spec, params = graft._flagship()
    frame = jax.device_put(rng.randint(0, 256, (1, 224, 224, 3), np.uint8))

    # --- streaming-step variants, on-device trace time ---
    try:
        from wadt.utils.devtime import device_time_ms

        raw = rng.randint(0, 256, (224, 224, 3), np.uint8)
        results = {}
        # (variant key, StreamPredictor kwargs): the packed GEMM-stem XLA
        # path, and the fused pallas trunk+gram kernel with each head-weight
        # compression (f32 exact / bf16 / weight-only int8 token_proj —
        # models/pmg.fold_head_weights; batch=1 is head weight-read bound
        # after the trunk kernel).
        cases = [
            ("packed", dict(trunk_kernel="packed")),
            ("fused_f32", dict(trunk_kernel="fused", head_fold="f32")),
            ("fused_bf16", dict(trunk_kernel="fused", head_fold="bf16")),
            ("fused_q8", dict(trunk_kernel="fused", head_fold="q8")),
            ("fused_pallas_bf16",
             dict(trunk_kernel="fused", head_fold="pallas_bf16")),
            ("fused_pallas_q8",
             dict(trunk_kernel="fused", head_fold="pallas_q8")),
        ]
        for name, kw in cases:
            pred = StreamPredictor("pmg", spec, params, use_kalman=True, **kw)
            inp = jax.device_put(s2d_pack_uint8(raw[None], pred._pack_k))
            t, _ = device_time_ms(
                lambda p, z, k: pred._step(p, z, k),
                pred.params, inp, pred.kstate, iters=20,
            )
            results[name] = t * 1e3
            print(f"streaming step [{name:10s}]: {t*1e3:6.1f} us/frame "
                  f"(device, incl. softmax+kalman)")
        if args.record and set(results) >= {n for n, _ in cases}:
            # head-fold selection: fastest fused variant whose compressed
            # head keeps argmax parity AND bounded drift on every PMG
            # golden fixture (one walk covers all variants; an empty walk
            # gates NOTHING, so only the exact f32 head may be selected)
            from wadt.utils.goldens import (
                HEAD_FOLD_MAX_DRIFT,
                pmg_head_fold_fixture_parity,
            )

            fixtures = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "tests", "fixtures")
            fused = {k[len("fused_"):]: v for k, v in results.items()
                     if k.startswith("fused_")}
            walk = pmg_head_fold_fixture_parity(
                fixtures, [v for v in fused if v != "f32"]
            )
            for variant in sorted(fused, key=fused.get):
                rows = walk.get(variant, [])
                if variant == "f32" or (rows and all(
                    agree and drift <= HEAD_FOLD_MAX_DRIFT
                    for _, agree, drift in rows
                )):
                    head_win = variant
                    break
                print(f"head fold {variant} fastest but "
                      f"{'has NO fixtures to gate on' if not rows else 'FAILS the fixture parity gate'}"
                      f"; trying next")
            kernel_select.record(
                "pmg_head_fold", head_win, fused,
                "batch1 224px shipped, fused trunk+gram step by "
                "token_proj/transformer weight storage",
            )
            win = ("pallas" if fused[head_win] < results["packed"]
                   else "xla")
            kernel_select.record(
                "fused_trunk_gram", win,
                {"xla": results["packed"], "pallas": fused[head_win]},
                "batch1 224px shipped (xla=packed GEMM stem, pallas=fused "
                f"trunk+gram kernel at head_fold={head_win})",
            )
            print(f"recorded pmg_head_fold winner={head_win}, "
                  f"fused_trunk_gram winner={win} -> "
                  f"{kernel_select.RECORD_PATH}")
    except ImportError:
        print("profiler protos unavailable; skipping per-variant device times")

    def chain_fn(p, u8):
        def one(i, salt):
            x = normalize_uint8(u8, jnp.float32) + salt
            logits, _ = pmg.apply(p, x, spec)
            return logits[0, 0, 0] * 0.0

        return jax.lax.fori_loop(0, INNER, one, jnp.float32(0))

    chain = jax.jit(chain_fn)
    float(chain(params, frame))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(params, frame))
        best = min(best, (time.perf_counter() - t0) / INNER)
    print(f"generic forward, chained-loop bound (batch=1): {best*1e6:.1f} us "
          f"— NOTE: at these tiny shapes the loop carry adds ~3x overhead; "
          f"the trace-derived step times above are the honest per-frame "
          f"numbers")

    engine = Engine("pmg", spec, params, batch_size=8)
    engine.warmup()
    frames = [rng.randint(0, 256, (224, 224, 3), np.uint8) for _ in range(64)]
    with AsyncBatcher(engine, max_wait_ms=1.0) as ab:
        for f in frames:  # warm
            ab.predict(f, timeout=120)
        ab.latencies.clear()
        for f in frames:
            ab.predict(f, timeout=120)
        pct = ab.latency_percentiles()
    print("end-to-end (uint8 host frame -> preds, via AsyncBatcher): "
          + json.dumps({k: (round(v * 1e3, 2) if k != "n" else v)
                        for k, v in pct.items()}) + " (ms)")


if __name__ == "__main__":
    main()
