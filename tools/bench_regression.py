#!/usr/bin/env python
"""Perf regression gate (SURVEY.md section 7 step 7).

Re-measures every config in ``results/bench_floor.json`` with bench.py's
chained device-loop protocol and exits non-zero when any config lands more
than the recorded tolerance below its floor.  Skips cleanly (exit 0) when no
TPU is attached — the floors are single-v5e-chip numbers and CPU runs would
always "regress".

    python tools/bench_regression.py             # gate
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true",
                    help="rewrite floors from this run's measurements")
    ap.add_argument("--only", default=None,
                    help="gate a single config, e.g. rtm_bf16")
    args = ap.parse_args()

    import jax

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
        batch = bench.FAMILY_BATCH[family]
        ips = bench.measure(family, dtype, batch)
        measured[cfg] = round(ips, 1)
        ratio = ips / floor
        verdict = "OK" if ratio >= 1.0 - tol else "REGRESSION"
        print(f"[bench_regression] {cfg:10s}: {ips:10,.0f} img/s  "
              f"floor {floor:10,.0f}  ({ratio:6.1%}) {verdict}")
        if ratio < 1.0 - tol:
            failures.append(cfg)

    if args.update:
        spec["floors"].update(measured)
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
