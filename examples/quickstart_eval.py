#!/usr/bin/env python
"""Quickstart: load a reference .pth checkpoint and run batch inference.

Runs on CPU or TPU (whatever JAX finds).  With no arguments it uses the
repo's frozen shipped-config fixture and random images; point it at real
weights + an image folder for actual use:

    python examples/quickstart_eval.py [checkpoint.pth tasks.json [folder]]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import wadt  # noqa: E402
from wadt.engine import checkpoint  # noqa: E402
from wadt.engine.executor import Engine  # noqa: E402
from wadt.models import get_family  # noqa: E402


def main():
    root = os.path.join(os.path.dirname(__file__), "..")
    ckpt = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        root, "tests", "fixtures", "pmg_shipped.pth")
    tasks = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        root, "tests", "fixtures", "pmg_shipped.json")

    with open(tasks) as f:
        meta = json.load(f)
    task_map = meta["tasks"] if isinstance(meta, dict) and "tasks" in meta else meta
    hparams = meta.get("hparams") if isinstance(meta, dict) else None
    spec = get_family("pmg").build_spec(task_map, hparams or {})
    params = checkpoint.load_torch_checkpoint("pmg", ckpt, spec)
    engine = Engine("pmg", spec, params, batch_size=8)

    if len(sys.argv) > 3:
        from wadt.data.dataset import collect_image_paths
        from wadt.ops.preprocess import load_image_uint8

        paths = collect_image_paths(sys.argv[3])
        images = np.stack([load_image_uint8(p) for p in paths])
    else:
        paths = [f"random_{i}" for i in range(5)]
        images = np.random.randint(0, 256, (5, 224, 224, 3), np.uint8)

    out = engine.run(images)
    preds = np.asarray(out["preds"])
    for row, path in enumerate(paths):
        labels = {
            t: (spec.tasks.class_names[i][preds[row, i]]
                if preds[row, i] >= 0 else "Unknown")
            for i, t in enumerate(spec.tasks.names)
        }
        print(path, "->", json.dumps(labels))


if __name__ == "__main__":
    main()
