#!/usr/bin/env python
"""End-to-end accuracy-parity check: run the PyTorch reference's own
evaluation pipeline (Functions/PMG_evaluation.test_model_optimized) and this
framework's ``evaluate()`` on the SAME dataset with the SAME weights, and
diff the metrics_test.json artifacts.

This is the accuracy-parity gate from BASELINE.md ("benchmark-mode accuracy
identical per class to the PyTorch reference").  Requires /root/reference;
missing reference-only deps (pytorch_grad_cam) are stubbed since Grad-CAM is
disabled for this run.

Usage: python tools/compare_with_reference.py [synth_dir]
Exits non-zero on any metric divergence beyond float tolerance.
"""

import json
import os
import sys
import tempfile
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("REFERENCE_DIR", "/root/reference")
sys.path.insert(0, REPO)

TINY = dict(
    ndf=16, patch_size=64, patch_div=3, gram_channels=32, d_model=48,
    transformer_layers=1, transformer_heads=2, norm="batch",
)


def _stub_missing_modules():
    """The reference imports pytorch_grad_cam and torchvision unconditionally;
    stub them.  Grad-CAM is disabled for this run; the torchvision.transforms
    stub reimplements Resize/CenterCrop/ToTensor/Normalize with the same PIL
    arithmetic (these transforms' parity is separately established — our
    preprocess module uses identical PIL calls)."""
    import torch
    from PIL import Image

    for name in ("pytorch_grad_cam", "pytorch_grad_cam.utils",
                 "pytorch_grad_cam.utils.model_targets"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["pytorch_grad_cam"].GradCAM = object
    sys.modules["pytorch_grad_cam.utils.model_targets"].ClassifierOutputTarget = object

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    class Resize:
        def __init__(self, size):
            self.size = size

        def __call__(self, img):
            w, h = img.size
            s = self.size
            if (w <= h and w == s) or (h <= w and h == s):
                return img
            if w < h:
                return img.resize((s, int(round(s * h / w))), Image.BILINEAR)
            return img.resize((int(round(s * w / h)), s), Image.BILINEAR)

    class CenterCrop:
        def __init__(self, size):
            self.size = size

        def __call__(self, img):
            w, h = img.size
            s = self.size
            left = int(round((w - s) / 2.0))
            top = int(round((h - s) / 2.0))
            return img.crop((left, top, left + s, top + s))

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, np.float32) / 255.0
            return torch.from_numpy(arr.transpose(2, 0, 1).copy())

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(3, 1, 1)
            self.std = torch.tensor(std).view(3, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    class ToPILImage:
        def __call__(self, t):
            arr = (t.numpy().transpose(1, 2, 0) * 255).astype(np.uint8)
            return Image.fromarray(arr)

    for cls in (Compose, Resize, CenterCrop, ToTensor, Normalize, ToPILImage):
        setattr(tr, cls.__name__, cls)
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr


def run_reference(synth, weights_pth, out_dir):
    sys.path.insert(0, REFERENCE)
    _stub_missing_modules()
    import torch
    import torch.nn as nn
    from torch.utils.data import DataLoader

    from Functions.PMG_evaluation import test_model_optimized
    from Models.models_PMG import MultiTaskPatchGANGramModelNonOverlapV2

    with open(os.path.join(synth, "tasks.json")) as f:
        tasks = json.load(f)
    model = MultiTaskPatchGANGramModelNonOverlapV2(
        input_nc=3,
        num_classes_per_task={t: len(c) for t, c in tasks.items()},
        **TINY,
    )
    model.load_state_dict(torch.load(weights_pth))
    model.eval()

    # Reference data pipeline (utils/datasets_utils.py).
    from utils.datasets_utils import MultiTaskDataset, build_default_transform, multitask_collate

    ds = MultiTaskDataset(
        os.path.join(synth, "dataset.json"), os.path.join(synth, "tasks.json"),
        transform=build_default_transform(224),
    )
    task_names = list(tasks.keys())
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=0,
                        collate_fn=lambda b: multitask_collate(b, task_names))
    criterions = {t: nn.CrossEntropyLoss() for t in tasks}
    test_model_optimized(model, loader, criterions, None, out_dir,
                         torch.device("cpu"), tasks, prob_threshold=0.5)
    return os.path.join(out_dir, "metrics_test.json")


def run_ours(synth, weights_pth, out_dir):
    import jax

    import wadt  # noqa: F401
    from wadt.config import enable_parity_precision, load_tasks
    from wadt.data import BatchLoader, MultiTaskDataset
    from wadt.engine import checkpoint
    from wadt.engine.executor import Engine
    from wadt.models import pmg
    from wadt.workloads.evaluate import evaluate

    enable_parity_precision()
    tasks = load_tasks(os.path.join(synth, "tasks.json"))
    spec = pmg.build_spec(tasks, TINY)
    params = checkpoint.load_torch_checkpoint("pmg", weights_pth, spec)
    engine = Engine("pmg", spec, params, batch_size=4, prob_threshold=0.5)
    ds = MultiTaskDataset(
        os.path.join(synth, "dataset.json"), os.path.join(synth, "tasks.json")
    )
    loader = BatchLoader(ds, batch_size=4, num_workers=2)
    evaluate(engine, loader, out_dir)
    return os.path.join(out_dir, "metrics_test.json")


def compare(ref_json, our_json, atol=1e-6):
    ref = json.load(open(ref_json))
    ours = json.load(open(our_json))
    fails = []

    def close(a, b):
        if a is None and b is None:
            return True
        if isinstance(a, list):
            return np.allclose(np.asarray(a, float), np.asarray(b, float), atol=atol)
        return abs(float(a) - float(b)) <= atol

    # test_loss accumulates across batches in different summation orders
    # (device f32 tree-reduce vs torch sequential) — allow relative 1e-5.
    if abs(ref["test_loss"] - ours["test_loss"]) > 1e-5 * max(abs(ref["test_loss"]), 1):
        fails.append(("test_loss", ref["test_loss"], ours["test_loss"]))
    if not close(ref["overall_f1"], ours["overall_f1"]):
        fails.append(("overall_f1", ref["overall_f1"], ours["overall_f1"]))
    for task, rm in ref["tasks"].items():
        om = ours["tasks"][task]
        for key in ("accuracy", "precision", "recall", "f1_score",
                    "confusion_matrix", "auc_macro", "auc_micro"):
            if not close(rm[key], om[key]):
                fails.append((f"{task}/{key}", rm[key], om[key]))
        if (rm["auc_per_class"] is None) != (om["auc_per_class"] is None):
            fails.append((f"{task}/auc_per_class", rm["auc_per_class"], om["auc_per_class"]))
        elif rm["auc_per_class"]:
            for cls, v in rm["auc_per_class"].items():
                if not close(v, om["auc_per_class"].get(cls)):
                    fails.append((f"{task}/auc/{cls}", v, om["auc_per_class"].get(cls)))
    return fails


def main():
    import torch

    from tools.make_synth_dataset import make as make_synth

    base = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="parity_")
    synth = make_synth(os.path.join(base, "synth"), n_per_class=5, size=96)

    # random reference weights, frozen
    sys.path.insert(0, REFERENCE)
    from Models.models_PMG import MultiTaskPatchGANGramModelNonOverlapV2

    with open(os.path.join(synth, "tasks.json")) as f:
        tasks = json.load(f)
    torch.manual_seed(7)
    m = MultiTaskPatchGANGramModelNonOverlapV2(
        input_nc=3, num_classes_per_task={t: len(c) for t, c in tasks.items()},
        **TINY,
    )
    for mod in m.modules():
        if hasattr(mod, "running_mean"):
            g = torch.Generator().manual_seed(11)
            mod.running_mean.copy_(torch.randn(mod.num_features, generator=g) * 0.2)
            mod.running_var.copy_(torch.rand(mod.num_features, generator=g) + 0.5)
    weights = os.path.join(base, "weights.pth")
    torch.save(m.state_dict(), weights)

    ref_json = run_reference(synth, weights, os.path.join(base, "ref_out"))
    our_json = run_ours(synth, weights, os.path.join(base, "our_out"))
    fails = compare(ref_json, our_json)
    if fails:
        print(f"PARITY FAILURES ({len(fails)}):")
        for name, a, b in fails[:20]:
            print(f"  {name}: ref={a} ours={b}")
        sys.exit(1)
    print("PARITY OK: metrics_test.json identical (loss, per-task acc/P/R/F1, "
          "confusion matrices, macro/micro/per-class AUC) between the PyTorch "
          "reference pipeline and this framework.")


if __name__ == "__main__":
    main()
