#!/usr/bin/env python
"""AOT export: serialize the compiled forward and serve from the artifact.

Exports the engine's uint8→probs step (weights baked in as StableHLO
constants), then reloads it with ExportedPredictor and predicts — no model
code, no checkpoint, just the artifact directory.  The artifact is
multi-platform (cpu + tpu by default), so the same file serves on a TPU
worker and a CPU dev box.

    python examples/export_artifact.py [checkpoint.pth tasks.json [outdir]]
"""

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import wadt  # noqa: E402
from wadt.engine import checkpoint  # noqa: E402
from wadt.engine.executor import Engine  # noqa: E402
from wadt.engine.export import ExportedPredictor, export_engine  # noqa: E402
from wadt.models import get_family  # noqa: E402


def main():
    root = os.path.join(os.path.dirname(__file__), "..")
    ckpt = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        root, "tests", "fixtures", "pmg_shipped.pth")
    tasks = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        root, "tests", "fixtures", "pmg_shipped.json")
    out = sys.argv[3] if len(sys.argv) > 3 else tempfile.mkdtemp(
        prefix="wadt_artifact_")

    with open(tasks) as f:
        meta = json.load(f)
    spec = get_family("pmg").build_spec(meta["tasks"], meta.get("hparams") or {})
    params = checkpoint.load_torch_checkpoint("pmg", ckpt, spec)
    engine = Engine("pmg", spec, params, batch_size=8)
    info = export_engine(engine, out)
    print(f"exported {info['family']} (batch {info['batch_size']}, "
          f"platforms {info['platforms']}) -> {out}")

    # serving side: artifact only — no spec, no params, no family code
    pred = ExportedPredictor(out)
    imgs = np.random.randint(0, 256, (5, 224, 224, 3), np.uint8)
    live = engine.run(imgs)
    art = pred.run(imgs)
    same = bool((np.asarray(live["preds"]) == np.asarray(art["preds"])).all())
    print("artifact preds match live engine:", same)
    print("first row:", np.asarray(art["preds"])[0].tolist())


if __name__ == "__main__":
    main()
