#!/usr/bin/env python
"""Train a tiny PMG on a synthetic dataset end-to-end (CPU-friendly demo).

Generates a small class-labeled image tree, trains a few epochs with the
production trainer (AdamW, masked multi-task CE, BN stat merge, Orbax +
reference-loadable .pth export), then evaluates the best checkpoint.

    python examples/train_tiny.py [workdir]
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="wadt_train_tiny_")
    root = os.path.join(os.path.dirname(__file__), "..")

    # 1. synthetic dataset (class-named folders + dataset/tasks JSON)
    data_dir = os.path.join(work, "data")
    if not os.path.exists(os.path.join(data_dir, "dataset.json")):
        import subprocess

        subprocess.check_call(
            [sys.executable, os.path.join(root, "tools", "make_synth_dataset.py"),
             data_dir])

    # 2. train a small config for a few epochs
    from wadt.models import get_family
    from wadt.workloads.train import fit

    with open(os.path.join(data_dir, "tasks.json")) as f:
        tasks = json.load(f)
    spec = get_family("pmg").build_spec(
        tasks,
        dict(ndf=8, patch_size=64, patch_div=2, gram_channels=16,
             d_model=32, transformer_layers=1, transformer_heads=2,
             norm="batch"),
    )
    out = fit(
        "pmg", spec,
        data_json=os.path.join(data_dir, "dataset.json"),
        classes_json=os.path.join(data_dir, "tasks.json"),
        save_dir=os.path.join(work, "run"),
        options=dict(epochs=2, batch_size=16, num_workers=2),
    )
    print("best val F1:", round(out["best_f1"], 4))
    print("checkpoint dir:", out["ckpt_dir"])

    # 3. reload the exported reference-schema .pth and run inference with it
    import numpy as np

    from wadt.engine import checkpoint
    from wadt.engine.executor import Engine

    params = checkpoint.load_torch_checkpoint(
        "pmg", os.path.join(work, "run", "best_model.pth"), spec)
    engine = Engine("pmg", spec, params, batch_size=8)
    imgs = np.random.randint(0, 256, (4, 224, 224, 3), np.uint8)
    print("reloaded-checkpoint preds:", np.asarray(engine.run(imgs)["preds"]).tolist())


if __name__ == "__main__":
    main()
