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

# The comparison is against the CPU torch reference and pins full-f32
# matmul precision anyway — run our side on CPU too so the gate never
# depends on TPU/relay availability (on this rig a wedged relay would hang
# it silently).  WADT_PARITY_ON_TPU=1 opts back into the attached device.
if not os.environ.get("WADT_PARITY_ON_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

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
                 "pytorch_grad_cam.utils.model_targets",
                 "captum", "captum.attr"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["pytorch_grad_cam"].GradCAM = object
    sys.modules["pytorch_grad_cam.utils.model_targets"].ClassifierOutputTarget = object
    sys.modules["captum.attr"].IntegratedGradients = object
    sys.modules["captum"].attr = sys.modules["captum.attr"]

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


# Benchmark-mode mapping (north-star parity leg): exercises class grouping
# ("wet" <- Rain+Snow), an unmapped model class (Weather Type "Fog" in the
# auto-map leg starts mapped; "Clear" grouping stays 1:1), bench classes
# absent from the folder, and a bench class no model class maps to
# ("rain" under Visibility) — every branch of the reference's
# mapping/inversion/projection pipeline (utils/benchmark_utils.py:16-208).
BENCH_MAPPING = {
    "Weather Type": {
        "sun": ["Clear"],
        "wet": ["Rain", "Snow"],
        "fog": ["Fog"],
    },
    "Visibility": {
        "fog": ["Low"],
        "sun": ["Good"],
        "rain": [],
    },
}


def run_reference_benchmark(synth, weights_pth, out_dir, mapping_path,
                            auto_mapping):
    import torch

    from Models.models_PMG import MultiTaskPatchGANGramModelNonOverlapV2
    from utils.benchmark_utils import test_benchmark_folder
    from utils.datasets_utils import build_default_transform

    with open(os.path.join(synth, "tasks.json")) as f:
        tasks = json.load(f)
    model = MultiTaskPatchGANGramModelNonOverlapV2(
        input_nc=3,
        num_classes_per_task={t: len(c) for t, c in tasks.items()},
        **TINY,
    )
    model.load_state_dict(torch.load(weights_pth))
    model.eval()
    test_benchmark_folder(
        model, torch.device("cpu"), os.path.join(synth, "images"),
        mapping_path, tasks, build_default_transform(224),
        out_dir, os.path.join(out_dir, "roc"), auto_mapping=auto_mapping,
    )
    return out_dir


def run_ours_benchmark(synth, weights_pth, out_dir, mapping_path,
                       auto_mapping):
    import wadt  # noqa: F401
    from wadt.config import enable_parity_precision, load_tasks
    from wadt.engine import checkpoint
    from wadt.engine.executor import Engine
    from wadt.models import pmg
    from wadt.workloads.benchmark import run_benchmark

    enable_parity_precision()
    tasks = load_tasks(os.path.join(synth, "tasks.json"))
    spec = pmg.build_spec(tasks, TINY)
    params = checkpoint.load_torch_checkpoint("pmg", weights_pth, spec)
    engine = Engine("pmg", spec, params, batch_size=4)
    run_benchmark(
        engine, os.path.join(synth, "images"), mapping_path,
        out_dir, os.path.join(out_dir, "roc"), auto_mapping=auto_mapping,
    )
    return out_dir


def _diff_json(a, b, path, fails, atol):
    """Recursive numeric-tolerant equality of two JSON trees."""
    if isinstance(a, dict) and isinstance(b, dict):
        if set(a) != set(b):
            fails.append((f"{path}/keys", sorted(a), sorted(b)))
            return
        for k in a:
            _diff_json(a[k], b[k], f"{path}/{k}", fails, atol)
    elif isinstance(a, list) and isinstance(b, list):
        if len(a) != len(b):
            fails.append((f"{path}/len", len(a), len(b)))
            return
        for i, (x, y) in enumerate(zip(a, b)):
            _diff_json(x, y, f"{path}[{i}]", fails, atol)
    elif a is None or b is None:
        if a is not b:
            fails.append((path, a, b))
    elif isinstance(a, bool) or isinstance(b, bool):
        if a != b:
            fails.append((path, a, b))
    elif isinstance(a, (int, float)) and isinstance(b, (int, float)):
        import math

        # NaN must not satisfy the tolerance check (abs(nan-x)>atol is
        # always False): NaN==NaN passes, NaN vs number fails.
        if math.isnan(float(a)) or math.isnan(float(b)):
            if math.isnan(float(a)) != math.isnan(float(b)):
                fails.append((path, a, b))
        elif abs(float(a) - float(b)) > atol:
            fails.append((path, a, b))
    elif a != b:
        fails.append((path, a, b))


def compare_benchmark(ref_dir, our_dir, atol=1e-6):
    """Diff best_mapping.json (exact) + benchmark_summary.json (numeric
    tolerance) between the reference's and our benchmark-mode runs."""
    fails = []
    for name, tol in (("best_mapping.json", 0.0),
                      ("benchmark_summary.json", atol)):
        ref = json.load(open(os.path.join(ref_dir, name)))
        ours = json.load(open(os.path.join(our_dir, name)))
        _diff_json(ref, ours, name, fails, tol)
    return fails


PM_TINY = dict(ndf=16, norm="instance", patch_size=32, attn_tau=0.7,
               attn_use_se=True, attn_softmax_spatial=True, ablate_attention=False)
RTM_TINY = dict(truncate_layer=5, use_attention=True, attn_token_dim=48,
                cls_hidden_dims=(32,), cls_num_layers=1)


def _loader_for_reference(synth, tasks):
    import torch
    from torch.utils.data import DataLoader

    from utils.datasets_utils import MultiTaskDataset, build_default_transform, multitask_collate

    ds = MultiTaskDataset(
        os.path.join(synth, "dataset.json"), os.path.join(synth, "tasks.json"),
        transform=build_default_transform(224),
    )
    names = list(tasks.keys())
    return DataLoader(ds, batch_size=4, shuffle=False, num_workers=0,
                      collate_fn=lambda b: multitask_collate(b, names, -1))


def run_reference_pm(synth, weights_pth, out_dir):
    import torch
    import torch.nn as nn

    from Functions.PM_evaluation import test_classifier
    from Models.models_PM import MultiTaskPatchGAN

    with open(os.path.join(synth, "tasks.json")) as f:
        tasks = json.load(f)
    model = MultiTaskPatchGAN(
        tasks_dict={t: len(c) for t, c in tasks.items()}, input_nc=3,
        device="cpu", **PM_TINY,
    )
    model.load_state_dict(torch.load(weights_pth))
    model.eval()
    criterions = {t: nn.CrossEntropyLoss() for t in tasks}
    test_classifier(model, _loader_for_reference(synth, tasks), criterions, None,
                    out_dir, torch.device("cpu"), tasks, prob_threshold=0.5)
    return os.path.join(out_dir, "test_metrics.json")


def run_reference_rtm(synth, weights_pth, out_dir):
    import torch
    import torch.nn as nn

    from Functions.RTM_evaluation import test as rtm_test
    from Models.models_RTM import MultiHeadAttentionPerTaskModel

    from tools.make_fixtures import ResNet50

    with open(os.path.join(synth, "tasks.json")) as f:
        tasks = json.load(f)
    model = MultiHeadAttentionPerTaskModel(
        base_encoder=ResNet50(), truncate_after_layer=RTM_TINY["truncate_layer"],
        tasks=tasks, device="cpu", use_attention=RTM_TINY["use_attention"],
        attn_token_dim=RTM_TINY["attn_token_dim"],
        cls_hidden_dims=list(RTM_TINY["cls_hidden_dims"]),
        cls_num_layers=RTM_TINY["cls_num_layers"],
    )
    model.load_state_dict(torch.load(weights_pth))
    model.eval()
    criterions = {t: nn.CrossEntropyLoss() for t in tasks}
    rtm_test(model, _loader_for_reference(synth, tasks), criterions, None, out_dir,
             torch.device("cpu"), tasks, 0.5, False, False, False, False)
    return os.path.join(out_dir, "test_metrics.json")


def run_ours_family(family, hparams, synth, weights_pth, out_dir):
    import wadt  # noqa: F401
    from wadt.config import enable_parity_precision, load_tasks
    from wadt.data import BatchLoader, MultiTaskDataset
    from wadt.engine import checkpoint
    from wadt.engine.executor import Engine
    from wadt.models import get_family
    from wadt.workloads.evaluate import evaluate

    enable_parity_precision()
    tasks = load_tasks(os.path.join(synth, "tasks.json"))
    mod = get_family(family)
    spec = mod.build_spec(tasks, hparams)
    params = checkpoint.load_torch_checkpoint(family, weights_pth, spec)
    engine = Engine(family, spec, params, batch_size=4, prob_threshold=0.5)
    ds = MultiTaskDataset(
        os.path.join(synth, "dataset.json"), os.path.join(synth, "tasks.json")
    )
    evaluate(engine, BatchLoader(ds, batch_size=4, num_workers=2), out_dir)
    # the family-schema artifact (same name/shape as the reference's), for
    # the full-JSON diff in compare_scalars
    return os.path.join(out_dir, "test_metrics.json")


def run_reference_inference(synth, weights_pth, out_dir, tasks):
    """Reference folder-inference mode (PM CLI path: test_PM.py:221 ->
    Functions/PM_evaluation.py:189 run_inference, Grad-CAM off) ->
    inference_results.json keyed by image path."""
    import torch

    from Functions.PM_evaluation import run_inference as ref_run_inference
    from Models.models_PM import MultiTaskPatchGAN
    from utils.datasets_utils import build_default_transform

    ncpt = {t: len(c) for t, c in tasks.items()}
    model = MultiTaskPatchGAN(tasks_dict=ncpt, input_nc=3, device="cpu",
                              **PM_TINY)
    model.load_state_dict(torch.load(weights_pth))
    model.eval()
    ref_run_inference(model, os.path.join(synth, "images"),
                      build_default_transform(224), torch.device("cpu"),
                      tasks, save_dir=out_dir)
    return os.path.join(out_dir, "inference_results.json")


def run_reference_folder_predictions(synth, weights_pth, out_dir, tasks):
    """Reference folder-predictions mode (test_PM.py:211 ->
    Functions/PM_evaluation.py:645 test_folder_predictions) ->
    folder_predictions.json + all_predictions.json."""
    import torch

    from Functions.PM_evaluation import test_folder_predictions as ref_tfp
    from Models.models_PM import MultiTaskPatchGAN
    from utils.datasets_utils import build_default_transform

    ncpt = {t: len(c) for t, c in tasks.items()}
    model = MultiTaskPatchGAN(tasks_dict=ncpt, input_nc=3, device="cpu",
                              **PM_TINY)
    model.load_state_dict(torch.load(weights_pth))
    model.eval()
    os.makedirs(out_dir, exist_ok=True)  # the reference CLI pre-creates it
    ref_tfp(model, tasks, os.path.join(synth, "images"),
            build_default_transform(224), torch.device("cpu"), out_dir)
    return out_dir


def _build_our_engine(family, hparams, synth, weights_pth, batch_size=4):
    import wadt  # noqa: F401
    from wadt.config import enable_parity_precision, load_tasks
    from wadt.engine import checkpoint
    from wadt.engine.executor import Engine
    from wadt.models import get_family

    enable_parity_precision()
    tasks = load_tasks(os.path.join(synth, "tasks.json"))
    spec = get_family(family).build_spec(tasks, hparams)
    params = checkpoint.load_torch_checkpoint(family, weights_pth, spec)
    return Engine(family, spec, params, batch_size=batch_size)


def run_ours_inference(synth, weights_pth, out_dir):
    from wadt.workloads.inference import run_inference

    engine = _build_our_engine("pm", PM_TINY, synth, weights_pth)
    run_inference(engine, os.path.join(synth, "images"), save_dir=out_dir)
    return os.path.join(out_dir, "inference_results.json")


def run_ours_folder_predictions(synth, weights_pth, out_dir):
    from wadt.workloads.inference import test_folder_predictions

    engine = _build_our_engine("pm", PM_TINY, synth, weights_pth)
    test_folder_predictions(engine, os.path.join(synth, "images"), out_dir)
    return out_dir


def compare_json_files(ref_path, our_path, atol=1e-6):
    fails = []
    _diff_json(json.load(open(ref_path)), json.load(open(our_path)),
               os.path.basename(ref_path), fails, atol)
    return fails


def compare_roc_csvs(ref_dir, our_dir, atol=1e-9):
    """Numeric diff of every <task>_roc_data.csv the PMG reference wrote
    (PMG_evaluation.py:212-216 schema: curve_type, class_name, fpr, tpr) —
    the full ROC curve points, not just the AUC scalars."""
    import csv

    fails = []
    for root, _, files in os.walk(ref_dir):
        for fn in files:
            if not fn.endswith("_roc_data.csv"):
                continue
            rel = os.path.relpath(os.path.join(root, fn), ref_dir)
            ours_path = os.path.join(our_dir, rel)
            if not os.path.exists(ours_path):
                fails.append((f"roc_csv:{rel}", "present", "MISSING"))
                continue
            with open(os.path.join(root, fn)) as fa, open(ours_path) as fb:
                ra, rb = list(csv.reader(fa)), list(csv.reader(fb))
            if len(ra) != len(rb):
                fails.append((f"roc_csv:{rel}/rows", len(ra), len(rb)))
                continue
            for i, (xa, xb) in enumerate(zip(ra, rb)):
                same = len(xa) == len(xb) and all(
                    a == b
                    or (_is_float(a) and _is_float(b)
                        and abs(float(a) - float(b)) <= atol)
                    for a, b in zip(xa, xb)
                )
                if not same:
                    fails.append((f"roc_csv:{rel}:row{i}", xa, xb))
                    break
    return fails


def compare_summary_csv(ref_csv, our_csv, atol=1e-9):
    """metrics_test_summary.csv content diff (PMG_evaluation.py:320-333
    schema: task + 6 metric columns + roc_png).  The roc_png column holds an
    absolute path under each run's own output dir — excluded, everything
    else numeric-or-exact."""
    import csv

    fails = []
    if not os.path.exists(our_csv):
        return [("summary_csv", "present", "MISSING")]
    with open(ref_csv) as fa, open(our_csv) as fb:
        ra, rb = list(csv.reader(fa)), list(csv.reader(fb))
    if len(ra) != len(rb):
        return [("summary_csv/rows", len(ra), len(rb))]
    path_cols = {i for i, name in enumerate(ra[0]) if name == "roc_png"}
    for i, (xa, xb) in enumerate(zip(ra, rb)):
        if len(xa) != len(xb):
            fails.append((f"summary_csv:row{i}/cols", len(xa), len(xb)))
            continue
        for j, (a, b) in enumerate(zip(xa, xb)):
            if j in path_cols:
                continue
            ok = a == b or (_is_float(a) and _is_float(b)
                            and abs(float(a) - float(b)) <= atol)
            if not ok:
                fails.append((f"summary_csv:row{i}col{j}", a, b))
    return fails


def _is_float(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def compare_artifact_names(ref_dir, our_dir):
    """Filename parity: every artifact the reference pipeline wrote must
    exist (same relative path) in our output tree (we may write extras).
    Returns the list of reference-only files."""
    def tree(d):
        return {
            os.path.relpath(os.path.join(r, f), d)
            for r, _, fs in os.walk(d) for f in fs
        }

    return sorted(tree(ref_dir) - tree(our_dir))


def compare_scalars(ref_json, our_json, atol=1e-6):
    """PM/RTM pipelines: FULL test_metrics.json diff — per-task
    acc/P/R/F1 + confusion_matrix + the family's 'average' block (PM:
    accuracy only, PM_evaluation.py:621; RTM: all four means,
    RTM_evaluation.py:499-509).  Our evaluate() emits the same family
    artifact alongside the unified metrics_test.json."""
    fails = []
    _diff_json(json.load(open(ref_json)), json.load(open(our_json)),
               "test_metrics.json", fails, atol)
    return fails


def main():
    import torch

    from tools.make_synth_dataset import make as make_synth

    base = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="parity_")
    families = (sys.argv[2].split(",") if len(sys.argv) > 2 else ["pmg", "pm", "rtm"])
    # fully labeled: the PM/RTM reference loops feed every label to
    # CrossEntropyLoss without masking
    synth = make_synth(os.path.join(base, "synth"), n_per_class=5, size=96,
                       full_labels=True)
    sys.path.insert(0, REFERENCE)
    _stub_missing_modules()
    with open(os.path.join(synth, "tasks.json")) as f:
        tasks = json.load(f)
    ncpt = {t: len(c) for t, c in tasks.items()}
    all_fails = []

    def _randomize_bn(m, seed):
        for mod in m.modules():
            if hasattr(mod, "running_mean"):
                g = torch.Generator().manual_seed(seed)
                mod.running_mean.copy_(torch.randn(mod.num_features, generator=g) * 0.2)
                mod.running_var.copy_(torch.rand(mod.num_features, generator=g) + 0.5)

    if "pmg" in families:
        from Models.models_PMG import MultiTaskPatchGANGramModelNonOverlapV2

        torch.manual_seed(7)
        m = MultiTaskPatchGANGramModelNonOverlapV2(
            input_nc=3, num_classes_per_task=ncpt, **TINY)
        _randomize_bn(m, 11)
        weights = os.path.join(base, "weights_pmg.pth")
        torch.save(m.state_dict(), weights)
        ref_json = run_reference(synth, weights, os.path.join(base, "pmg_ref"))
        our_json = run_ours(synth, weights, os.path.join(base, "pmg_ours"))
        fails = compare(ref_json, our_json)
        all_fails += [("pmg/" + n, a, b) for n, a, b in fails]
        missing = compare_artifact_names(
            os.path.join(base, "pmg_ref"), os.path.join(base, "pmg_ours")
        )
        all_fails += [(f"pmg/artifact:{f}", "present", "MISSING") for f in missing]
        print(f"[pmg] artifact filename diff: {len(missing)} reference-only files")
        print(f"[pmg] full metrics_test.json diff: {len(fails)} failures")
        roc_fails = compare_roc_csvs(
            os.path.join(base, "pmg_ref"), os.path.join(base, "pmg_ours")
        )
        all_fails += [("pmg/" + n, a, b) for n, a, b in roc_fails]
        print(f"[pmg] ROC curve CSV diff: {len(roc_fails)} failures")
        csv_fails = compare_summary_csv(
            os.path.join(base, "pmg_ref", "metrics_test_summary.csv"),
            os.path.join(base, "pmg_ours", "metrics_test_summary.csv"),
        )
        all_fails += [("pmg/" + n, a, b) for n, a, b in csv_fails]
        print(f"[pmg] summary CSV diff: {len(csv_fails)} failures")

        # Benchmark mode (the north star): same weights, same folder, same
        # mapping — diff benchmark_summary.json + best_mapping.json under
        # BOTH the JSON mapping and the exhaustive auto-map search.
        #
        # Seed 20/120 is chosen so the auto-map optimum does not collapse
        # any task's model classes into ONE bench class: a collapsed task
        # projects a constant 1.0-sum probability whose per-sample value is
        # last-ulp float noise, making its AUC nondeterministic even between
        # two runs of the reference itself (different summation orders) —
        # comparing it would test rounding noise, not parity.
        torch.manual_seed(20)
        mb = MultiTaskPatchGANGramModelNonOverlapV2(
            input_nc=3, num_classes_per_task=ncpt, **TINY)
        _randomize_bn(mb, 120)
        bench_weights = os.path.join(base, "weights_pmg_bench.pth")
        torch.save(mb.state_dict(), bench_weights)
        mapping_path = os.path.join(base, "bench_mapping.json")
        with open(mapping_path, "w") as f:
            json.dump(BENCH_MAPPING, f, indent=2)
        for label, auto in (("mapped", False), ("automap", True)):
            ref_dir = os.path.join(base, f"bench_{label}_ref")
            our_dir = os.path.join(base, f"bench_{label}_ours")
            run_reference_benchmark(synth, bench_weights, ref_dir,
                                    mapping_path, auto)
            run_ours_benchmark(synth, bench_weights, our_dir,
                               mapping_path, auto)
            fails = compare_benchmark(ref_dir, our_dir)
            all_fails += [(f"benchmark/{label}/" + n, a, b) for n, a, b in fails]
            missing = compare_artifact_names(ref_dir, our_dir)
            all_fails += [
                (f"benchmark/{label}/artifact:{f}", "present", "MISSING")
                for f in missing
            ]
            print(f"[benchmark {label}] summary+mapping diff: {len(fails)} "
                  f"failures, {len(missing)} reference-only artifacts")

    if "pm" in families:
        from Models.models_PM import MultiTaskPatchGAN

        torch.manual_seed(17)
        m = MultiTaskPatchGAN(tasks_dict=ncpt, input_nc=3, device="cpu", **PM_TINY)
        weights = os.path.join(base, "weights_pm.pth")
        torch.save(m.state_dict(), weights)
        ref_json = run_reference_pm(synth, weights, os.path.join(base, "pm_ref"))
        our_json = run_ours_family("pm", PM_TINY, synth, weights,
                                   os.path.join(base, "pm_ours"))
        fails = compare_scalars(ref_json, our_json)
        all_fails += [("pm/" + n, a, b) for n, a, b in fails]
        missing = compare_artifact_names(
            os.path.join(base, "pm_ref"), os.path.join(base, "pm_ours")
        )
        all_fails += [(f"pm/artifact:{f}", "present", "MISSING") for f in missing]
        print(f"[pm] artifact filename diff: {len(missing)} reference-only files")
        print(f"[pm] per-task acc/P/R/F1 diff: {len(fails)} failures")

        # Folder-inference mode: inference_results.json keyed by image path,
        # per-task {predicted_class, probability} — exact class + 1e-6 prob.
        ref_json = run_reference_inference(
            synth, weights, os.path.join(base, "inf_ref"), tasks)
        our_json = run_ours_inference(synth, weights,
                                      os.path.join(base, "inf_ours"))
        fails = compare_json_files(ref_json, our_json)
        all_fails += [("inference/" + n, a, b) for n, a, b in fails]
        print(f"[inference] inference_results.json diff: {len(fails)} failures")

        # Folder-predictions mode: per-class counts + F1 from folder-name GT
        # (folder_predictions.json) + per-image dump (all_predictions.json).
        ref_dir = os.path.join(base, "fp_ref")
        our_dir = os.path.join(base, "fp_ours")
        run_reference_folder_predictions(synth, weights, ref_dir, tasks)
        run_ours_folder_predictions(synth, weights, our_dir)
        fails = []
        for name in ("folder_predictions.json", "all_predictions.json"):
            fails += compare_json_files(os.path.join(ref_dir, name),
                                        os.path.join(our_dir, name))
        all_fails += [("folder_predictions/" + n, a, b) for n, a, b in fails]
        print(f"[folder_predictions] both JSONs diff: {len(fails)} failures")

    if "rtm" in families:
        from Models.models_RTM import MultiHeadAttentionPerTaskModel

        from tools.make_fixtures import ResNet50

        torch.manual_seed(27)
        m = MultiHeadAttentionPerTaskModel(
            base_encoder=ResNet50(),
            truncate_after_layer=RTM_TINY["truncate_layer"], tasks=tasks,
            device="cpu", use_attention=RTM_TINY["use_attention"],
            attn_token_dim=RTM_TINY["attn_token_dim"],
            cls_hidden_dims=list(RTM_TINY["cls_hidden_dims"]),
            cls_num_layers=RTM_TINY["cls_num_layers"],
        )
        _randomize_bn(m, 29)
        weights = os.path.join(base, "weights_rtm.pth")
        torch.save(m.state_dict(), weights)
        ref_json = run_reference_rtm(synth, weights, os.path.join(base, "rtm_ref"))
        our_json = run_ours_family("rtm", RTM_TINY, synth, weights,
                                   os.path.join(base, "rtm_ours"))
        fails = compare_scalars(ref_json, our_json)
        all_fails += [("rtm/" + n, a, b) for n, a, b in fails]
        missing = compare_artifact_names(
            os.path.join(base, "rtm_ref"), os.path.join(base, "rtm_ours")
        )
        all_fails += [(f"rtm/artifact:{f}", "present", "MISSING") for f in missing]
        print(f"[rtm] artifact filename diff: {len(missing)} reference-only files")
        print(f"[rtm] per-task acc/P/R/F1 diff: {len(fails)} failures")

    if all_fails:
        print(f"PARITY FAILURES ({len(all_fails)}):")
        for name, a, b in all_fails[:20]:
            print(f"  {name}: ref={a} ours={b}")
        sys.exit(1)
    print("PARITY OK across families "
          f"{families}: PMG full metrics_test.json identical (loss, per-task "
          "acc/P/R/F1, confusion, macro/micro/per-class AUC) plus every ROC "
          "curve CSV (fpr/tpr points); PM and RTM test_metrics.json "
          "identical in full (per-task acc/P/R/F1, full-k x k confusion, "
          "average block) vs their reference pipelines; "
          "benchmark mode benchmark_summary.json + best_mapping.json "
          "identical under JSON mapping AND auto-mapping; folder-inference "
          "inference_results.json and folder-predictions "
          "folder_predictions.json + all_predictions.json identical (PM).")


if __name__ == "__main__":
    main()
