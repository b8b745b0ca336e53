#!/usr/bin/env python
"""TPU-run checklist: everything the CPU test suite cannot cover.

The pytest suite pins the CPU backend (tests/conftest.py), so the bf16
engine path, the packed streaming fast path, and the perf floors have no CI
coverage there.  Run this on a chip-attached host after any change touching
models/ops/engine:

    python tools/tpu_checklist.py            # parity checks (fast, ~2 min)
    python tools/tpu_checklist.py --perf     # + kernel A/B + regression gate

Exits non-zero on any failure.
"""

import argparse
import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURES = os.path.join(REPO, "tests", "fixtures")


def check_bf16_argmax_parity() -> bool:
    """bf16 params+activations must preserve the argmax prediction on every
    golden fixture (the basis for recommending Engine(dtype=bf16))."""
    import numpy as np
    import jax.numpy as jnp

    import wadt  # noqa: F401
    from wadt.engine import checkpoint
    from wadt.models import get_family
    from wadt.ops.nn import cast_tree

    ok = True
    for jf in sorted(glob.glob(os.path.join(FIXTURES, "*.json"))):
        name = os.path.splitext(os.path.basename(jf))[0]
        meta = json.load(open(jf))
        data = np.load(os.path.join(FIXTURES, f"{name}.npz"))
        mod = get_family(meta["family"])
        spec = mod.build_spec(meta["tasks"], meta["hparams"])
        params = checkpoint.load_torch_checkpoint(
            meta["family"], os.path.join(FIXTURES, f"{name}.pth"), spec
        )
        x = np.transpose(data["input"], (0, 2, 3, 1))
        lg, _ = mod.apply(cast_tree(params, jnp.bfloat16),
                          jnp.asarray(x, jnp.bfloat16), spec)
        lg = np.asarray(lg, np.float32)
        drift = 0.0
        agree = True
        for i, task in enumerate(spec.tasks.names):
            want = data[f"logits/{task}"]
            got = lg[:, i, : want.shape[1]]
            agree &= bool((got.argmax(-1) == want.argmax(-1)).all())
            drift = max(drift, float(np.abs(got - want).max()))
        print(f"  [bf16] {name}: argmax {'ok' if agree else 'DIFF'} "
              f"drift {drift:.4f}")
        ok &= agree
    return ok


def check_packed_stream_parity() -> bool:
    """Packed streaming fast path must equal the generic step on the shipped
    checkpoint (bit-exact contract of pmg.apply_packed)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    import wadt
    from wadt.engine import checkpoint
    from wadt.engine.executor import class_mask, masked_softmax
    from wadt.models import get_family
    from wadt.ops.preprocess import normalize_uint8
    from wadt.workloads.stream import StreamPredictor

    # correctness check, not a perf run: pin full-f32 matmuls so conv-vs-GEMM
    # reassociation noise (<=5e-4 at the fast default) cannot mask a real bug
    wadt.config.enable_parity_precision()

    meta = json.load(open(os.path.join(FIXTURES, "pmg_shipped.json")))
    mod = get_family("pmg")
    spec = mod.build_spec(meta["tasks"], meta["hparams"])
    params = checkpoint.load_torch_checkpoint(
        "pmg", os.path.join(FIXTURES, "pmg_shipped.pth"), spec
    )
    pred = StreamPredictor("pmg", spec, params)
    if pred._pack_k is None:
        print("  [stream] packed path inactive for shipped spec: FAIL")
        return False
    frame = np.random.RandomState(0).randint(0, 256, (224, 224, 3), np.uint8)
    got = pred(frame)
    mask = jnp.asarray(class_mask(spec.tasks))
    lg, _ = mod.apply(params, normalize_uint8(jnp.asarray(frame[None])), spec)
    want = np.asarray(masked_softmax(lg.astype(jnp.float32), mask)[0])
    diff = float(np.abs(got - want).max())
    print(f"  [stream] packed vs generic max prob diff: {diff:.2e}")
    return diff < 1e-6


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--perf", action="store_true",
                    help="also run kernel A/B recording + the perf "
                         "regression gate (slow)")
    args = ap.parse_args()

    import jax

    kinds = {d.platform.lower() for d in jax.devices()}
    if not kinds & {"tpu", "axon"}:
        print(f"tpu_checklist: no TPU attached ({sorted(kinds)}); aborting")
        return 1

    failures = []
    print("[1/3] bf16 argmax parity over golden fixtures")
    if not check_bf16_argmax_parity():
        failures.append("bf16_argmax_parity")
    print("[2/3] packed streaming path parity")
    if not check_packed_stream_parity():
        failures.append("packed_stream_parity")
    if args.perf:
        print("[3/3] kernel A/B record + perf regression gate")
        for cmd in (
            [sys.executable, os.path.join(REPO, "tools", "bench_kernels.py"),
             "--record"],
            [sys.executable, os.path.join(REPO, "tools", "bench_regression.py")],
        ):
            if subprocess.call(cmd) != 0:
                failures.append(os.path.basename(cmd[1]))
    else:
        print("[3/3] perf checks skipped (pass --perf)")

    if failures:
        print(f"tpu_checklist FAILED: {failures}")
        return 1
    print("tpu_checklist: all checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
