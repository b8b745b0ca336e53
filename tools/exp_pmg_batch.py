"""Scratch experiment: PMG packed-layout throughput vs batch size.

The shipped headline uses batch 512; past the stem the model is
op-overhead/HBM bound, so larger batches may amortize per-op fixed costs.
Chained device-loop protocol (see bench.py docstring).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.argv = [sys.argv[0]]
import bench  # noqa: E402


def main():
    for batch in (512, 1024, 2048):
        try:
            ips = bench.measure("pmg", "f32", batch, "auto")
            print(f"batch {batch}: {ips:,.0f} img/s", flush=True)
        except Exception as e:
            print(f"batch {batch}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
