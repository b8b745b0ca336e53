#!/usr/bin/env python
"""Per-frame (batch=1) latency of the flagship PMG forward on the real chip —
the BASELINE.md camera/stream latency report.

Two numbers:
- device_compute_p50: chained device-loop protocol (true serial device time
  per frame, excludes host round-trip),
- end_to_end_p50: submit->result through the AsyncBatcher (includes relay
  round-trip — on this rig dominated by the network relay, on real hardware
  by PCIe + dispatch).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INNER = 200


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as graft
    from wadt.engine.executor import Engine
    from wadt.engine.serving import AsyncBatcher
    from wadt.models import pmg
    from wadt.ops.preprocess import normalize_uint8

    _, spec, params = graft._flagship()
    rng = np.random.RandomState(0)
    frame = jax.device_put(rng.randint(0, 256, (1, 224, 224, 3), np.uint8))

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
    print(f"device compute per frame (batch=1): {best*1e6:.1f} us "
          f"({1/best:,.0f} FPS equivalent)")

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
