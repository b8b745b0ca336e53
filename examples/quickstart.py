#!/usr/bin/env python
"""End-to-end API tour: build -> (convert|init) -> infer -> explain ->
serve -> train, on a generated synthetic dataset.

Run: python examples/quickstart.py   (uses a tiny config; ~a minute on TPU,
also runs on CPU via jax.config.update("jax_platforms", "cpu"))
"""

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import wadt  # noqa: E402
from wadt.data import BatchLoader, MultiTaskDataset  # noqa: E402
from wadt.engine import checkpoint  # noqa: E402
from wadt.engine.executor import Engine  # noqa: E402
from wadt.engine.serving import AsyncBatcher  # noqa: E402
from wadt.models import pmg  # noqa: E402
from wadt.workloads.evaluate import evaluate  # noqa: E402
from wadt.workloads.explain import Explainer  # noqa: E402
from wadt.workloads.train import fit  # noqa: E402

from tools.make_synth_dataset import make as make_synth  # noqa: E402

HPARAMS = dict(
    ndf=16, patch_size=64, patch_div=3, gram_channels=32, d_model=64,
    transformer_layers=1, transformer_heads=2, norm="batch",
)


def main():
    import jax

    work = tempfile.mkdtemp(prefix="wadt_quickstart_")
    synth = make_synth(os.path.join(work, "data"), n_per_class=4, size=96)
    tasks = json.load(open(os.path.join(synth, "tasks.json")))

    # 1. Build a spec + params (for real checkpoints, use
    #    checkpoint.load_torch_checkpoint("pmg", "best_model_PMG.pth", spec)).
    spec = pmg.build_spec(tasks, HPARAMS)
    params = pmg.init(jax.random.PRNGKey(0), spec)
    print(f"model: pmg, {pmg.count_params(params):,} params, "
          f"{len(spec.tasks)} tasks")

    # 2. Batched inference on uint8 images (device-side normalization).
    engine = Engine("pmg", spec, params, batch_size=8)
    imgs = np.random.randint(0, 256, (5, 224, 224, 3), np.uint8)
    probs = engine.predict_dict(imgs)
    print("predict_dict:", {t: v.shape for t, v in list(probs.items())[:2]}, "...")

    # 3. Dataset evaluation with the reference's artifact set.
    ds = MultiTaskDataset(os.path.join(synth, "dataset.json"),
                          os.path.join(synth, "tasks.json"))
    loader = BatchLoader(ds, batch_size=8, num_workers=2)
    _, metrics, overall_f1, _ = evaluate(engine, loader, os.path.join(work, "eval"))
    print(f"overall F1: {overall_f1:.3f} (artifacts in {work}/eval)")

    # 4. Explainability: Grad-CAM saliency for a task.
    ex = Explainer("pmg", spec, params)
    logits = ex.logits(imgs[:2])
    targets = ex.resolve_targets("Weather Type", None, logits)
    cam, _ = ex.gradcam(imgs[:2], "Weather Type", targets)
    print("grad-cam:", cam.shape, f"max={cam.max():.2f}")

    # 5. Async micro-batched serving (what `--mode serve` wraps in HTTP).
    with AsyncBatcher(engine, max_wait_ms=2) as ab:
        futures = [ab.submit(imgs[i]) for i in range(5)]
        results = [f.result(timeout=120) for f in futures]
    print("async serving p50:", f"{ab.latency_percentiles()['p50']*1e3:.1f} ms")

    # 6. Training with the recorded reference recipe.
    out = fit("pmg", spec, os.path.join(synth, "dataset.json"),
              os.path.join(synth, "tasks.json"), os.path.join(work, "train"),
              options=dict(epochs=2, batch_size=8, balance_loss=True),
              init_params=params)
    print(f"trained: best val F1 {out['best_f1']:.3f}; "
          f"exported {work}/train/best_model.pth (loads into the PyTorch reference)")


if __name__ == "__main__":
    main()
