#!/usr/bin/env python
"""Perf regression gate (SURVEY.md section 7 step 7).

Re-measures every throughput config in ``results/bench_floor.json`` with
bench.py's chained device-loop protocol, plus every per-frame streaming
floor (``stream_floor_us``: the auto-selected StreamPredictor step, timed
from on-device trace timestamps), and exits non-zero when any lands more
than the recorded tolerance past its floor.  ``--train`` additionally gates
the train-step throughput records in ``results/bench_train.json`` (opt-in:
fwd+bwd compiles per family x dtype make it several minutes slower).  Skips
cleanly (exit 0) when no TPU is attached — the floors are single-v5e-chip
numbers and CPU runs would always "regress".

    python tools/bench_regression.py             # gate
    python tools/bench_regression.py --train     # + train-step floors
    python tools/bench_regression.py --update    # rewrite floors from a fresh run
    python tools/bench_regression.py --only rtm_bf16
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FLOOR_PATH = os.path.join(REPO, "results", "bench_floor.json")


def _measure_stream_us(family: str) -> float:
    """Device time of the auto-selected per-frame streaming step (same
    protocol as tools/bench_latency.py: on-device trace timestamps)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from wadt.ops.preprocess import s2d_pack_uint8
    from wadt.utils.devtime import device_time_ms
    from wadt.workloads.stream import StreamPredictor

    mod, spec, params = bench.build(family)
    del mod
    dtype = jnp.bfloat16 if family == "rtm" else jnp.float32
    pred = StreamPredictor(family, spec, params, use_kalman=True, dtype=dtype)
    raw = np.random.RandomState(0).randint(0, 256, (224, 224, 3), np.uint8)
    inp = jax.device_put(raw)
    if pred._pack_k is not None:
        inp = jax.device_put(s2d_pack_uint8(raw[None], pred._pack_k))
    t, _ = device_time_ms(
        lambda p, z, k: pred._step(p, z, k),
        pred.params, inp, pred.kstate, iters=20,
    )
    return t * 1e3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true",
                    help="rewrite floors from this run's measurements")
    ap.add_argument("--only", default=None,
                    help="gate a single config, e.g. rtm_bf16 / rtm_stream "
                         "/ rtm_bf16_train")
    ap.add_argument("--train", action="store_true",
                    help="also gate train-step throughput against "
                         "results/bench_train.json (slower: fwd+bwd compiles "
                         "per family x dtype)")
    args = ap.parse_args()

    import jax

    from wadt.config import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    # bounded relay-wedge probe (shared with bench.py): a wedged relay
    # otherwise hangs this tool silently with 0 CPU
    import bench

    bench.wait_for_healthy_device(deadline_s=300.0)

    kinds = {d.platform.lower() for d in jax.devices()}
    if not kinds & {"tpu", "axon"}:
        print(f"[bench_regression] no TPU attached (devices: {sorted(kinds)}) "
              "- skipping; floors are single-chip TPU numbers")
        return 0

    import bench

    with open(FLOOR_PATH) as f:
        spec = json.load(f)
    tol = float(spec["tolerance"])
    floors = spec["floors"]

    failures = []
    measured = {}
    for cfg, floor in floors.items():
        if args.only and cfg != args.only:
            continue
        family, dtype = cfg.rsplit("_", 1)
        batch = bench.default_batch(family, dtype)
        ips = bench.measure(family, dtype, batch)
        measured[cfg] = round(ips, 1)
        ratio = ips / floor
        verdict = "OK" if ratio >= 1.0 - tol else "REGRESSION"
        print(f"[bench_regression] {cfg:10s}: {ips:10,.0f} img/s  "
              f"floor {floor:10,.0f}  ({ratio:6.1%}) {verdict}")
        if ratio < 1.0 - tol:
            failures.append(cfg)

    stream_floors = spec.get("stream_floor_us", {})
    stream_measured = {}
    for family, floor_us in stream_floors.items():
        if args.only and args.only != f"{family}_stream":
            continue
        us = _measure_stream_us(family)
        stream_measured[family] = round(us, 1)
        ratio = us / floor_us
        verdict = "OK" if ratio <= 1.0 + tol else "REGRESSION"
        print(f"[bench_regression] {family + '_stream':10s}: {us:8.1f} us/frame  "
              f"floor {floor_us:8.1f}  ({ratio:6.1%}) {verdict}")
        if ratio > 1.0 + tol:
            failures.append(f"{family}_stream")

    train_measured = {}
    train_path = os.path.join(REPO, "results", "bench_train.json")
    train_spec = None
    # --only <cfg>_train implies the train leg; without this, an --only
    # value matching nothing would "pass" while measuring nothing.
    if args.train or (args.only and args.only.endswith("_train")):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from bench_train import measure as measure_train

        with open(train_path) as f:
            train_spec = json.load(f)
        for cfg, rec in train_spec.items():
            if args.only and args.only != f"{cfg}_train":
                continue
            family = cfg.replace("_bf16", "")
            ips = measure_train(family, int(rec["batch"]),
                                bf16=cfg.endswith("_bf16"))
            train_measured[cfg] = round(ips, 1)
            floor = float(rec["train_images_per_sec"])
            ratio = ips / floor
            verdict = "OK" if ratio >= 1.0 - tol else "REGRESSION"
            print(f"[bench_regression] {cfg + '_train':14s}: {ips:10,.0f} "
                  f"img/s  floor {floor:10,.0f}  ({ratio:6.1%}) {verdict}")
            if ratio < 1.0 - tol:
                failures.append(f"{cfg}_train")

    if args.only and not (measured or stream_measured or train_measured):
        print(f"[bench_regression] ERROR: --only {args.only!r} matched no "
              "config (nothing was measured)")
        return 1

    if args.update:
        import datetime
        import subprocess

        stamp = {
            "date": datetime.date.today().isoformat(),
            "commit": subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
                capture_output=True, text=True).stdout.strip(),
        }
        if train_measured:
            for cfg, ips in train_measured.items():
                train_spec[cfg]["train_images_per_sec"] = ips
                train_spec[cfg].update(stamp)
            with open(train_path, "w") as f:
                json.dump(train_spec, f, indent=2)
            print(f"[bench_regression] train floors updated -> {train_path}")
        spec["floors"].update(measured)
        spec.setdefault("stream_floor_us", {}).update(stream_measured)
        spec["updated"] = stamp  # whole-file stamp: --update re-measures all
        with open(FLOOR_PATH, "w") as f:
            json.dump(spec, f, indent=2)
        print(f"[bench_regression] floors updated -> {FLOOR_PATH}")
        return 0

    if failures:
        print(f"[bench_regression] FAILED: {', '.join(failures)} below "
              f"{1 - tol:.0%} of floor")
        return 1
    print("[bench_regression] all configs within tolerance")
    return 0


if __name__ == "__main__":
    sys.exit(main())
