#!/usr/bin/env python
"""Randomized classifier-EVAL parity fuzz vs the live PyTorch reference.

Complements tools/fuzz_benchmark_parity.py: same idea, for the batch-eval
pipelines (PMG test_model_optimized / PM test_classifier / RTM test vs our
workloads/evaluate).  Randomizes the TEST-SET shape — task registries,
label distributions (PMG: per-image missing labels exercising the masked-CE
and per-task-count paths), prob_threshold (the threshold->Unknown branch),
image sizes/formats — plus tiny random specs per family, then diffs the
metric artifacts (PMG: FULL metrics_test.json incl. loss/confusion/AUCs;
PM/RTM: per-task acc/P/R/F1 via their test_metrics.json schema).

Float-flip gates (same rationale as the benchmark fuzz): a case is skipped
when our probs put any sample's top-2 margin, or its distance to
prob_threshold, under 1e-4; PMG cases additionally gate per-class AUC rank
stability (any nonzero sorted gap < 1e-4 in a class's probability column).

Runs on CPU (relay-proof); WADT_PARITY_ON_TPU=1 opts back into the device.

Usage:
    python tools/fuzz_eval_parity.py [--n 4] [--seed 0] [--families pmg,pm,rtm]
"""

import argparse
import json
import os
import random
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if not os.environ.get("WADT_PARITY_ON_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import matplotlib  # noqa: E402

matplotlib.use("Agg")

import torch  # noqa: E402
from PIL import Image  # noqa: E402

import wadt  # noqa: E402
from wadt.config import load_tasks  # noqa: E402
from wadt.data import BatchLoader, MultiTaskDataset  # noqa: E402
from wadt.engine import checkpoint  # noqa: E402
from wadt.engine.executor import Engine  # noqa: E402
from wadt.models import get_family  # noqa: E402
from wadt.workloads.evaluate import evaluate  # noqa: E402

from compare_with_reference import (  # noqa: E402
    _loader_for_reference,
    _stub_missing_modules,
    compare,
    compare_scalars,
)
from fuzz_benchmark_parity import _min_top2_margin, sample_instance  # noqa: E402
from fuzz_reference_parity import build_torch  # noqa: E402

wadt.config.enable_parity_precision()

MARGIN = 1e-4


def build_dataset(base: str, tasks: dict, family: str, rng: random.Random) -> str:
    """Random image tree + manifest.  PMG tolerates missing labels (masked
    CE, per-task sample counts); PM/RTM reference loops feed every label to
    CrossEntropyLoss unmasked, so those get full labels."""
    nprng = np.random.RandomState(rng.randint(0, 2**31 - 1))
    img_dir = os.path.join(base, "images", "all")
    os.makedirs(img_dir)
    manifest = {"all": {}}
    for i in range(rng.randint(6, 14)):
        side = int(nprng.randint(40, 120))
        arr = nprng.randint(0, 256, (side, side, 3), np.uint8)
        name = f"im{i}" + rng.choice([".jpg", ".png", ".bmp"])
        path = os.path.join(img_dir, name)
        Image.fromarray(arr).save(path)
        entry = {"image_path": path}
        for t, classes in tasks.items():
            # Keep every 4-image batch (both runners use batch_size=4) at
            # least partly labeled: a batch with NO labeled sample for ANY
            # task CRASHES the reference — batch_loss stays the float 0.0
            # and `batch_loss.item()` raises (PMG_evaluation.py:152,
            # reference defect found by this fuzz).
            if family == "pmg" and i % 4 != 0 and rng.random() < 0.25:
                continue  # unlabeled for this task -> IGNORE_INDEX path
            entry[t] = rng.choice(classes)
        manifest["all"][name] = entry
    with open(os.path.join(base, "dataset.json"), "w") as f:
        json.dump(manifest, f)
    with open(os.path.join(base, "tasks.json"), "w") as f:
        json.dump(tasks, f)
    return base


def run_reference_eval(family, m, synth, tasks, out_dir, prob_threshold):
    import torch.nn as nn

    criterions = {t: nn.CrossEntropyLoss() for t in tasks}
    dev = torch.device("cpu")
    if family == "pmg":
        from Functions.PMG_evaluation import test_model_optimized
        from torch.utils.data import DataLoader
        from utils.datasets_utils import (
            MultiTaskDataset as RefDS,
            build_default_transform,
            multitask_collate,
        )

        ds = RefDS(os.path.join(synth, "dataset.json"),
                   os.path.join(synth, "tasks.json"),
                   transform=build_default_transform(224))
        names = list(tasks.keys())
        loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=0,
                            collate_fn=lambda b: multitask_collate(b, names))
        test_model_optimized(m, loader, criterions, None, out_dir, dev,
                             tasks, prob_threshold=prob_threshold)
        return os.path.join(out_dir, "metrics_test.json")
    loader = _loader_for_reference(synth, tasks)
    if family == "pm":
        from Functions.PM_evaluation import test_classifier

        test_classifier(m, loader, criterions, None, out_dir, dev, tasks,
                        prob_threshold=prob_threshold)
    else:
        from Functions.RTM_evaluation import test as rtm_test

        rtm_test(m, loader, criterions, None, out_dir, dev, tasks,
                 prob_threshold, False, False, False, False)
    return os.path.join(out_dir, "test_metrics.json")


def run_case(family: str, seed: int, base: str):
    rng = random.Random(f"eval-{family}-{seed}")
    hp, tasks, _mapping, _plan = sample_instance(rng, family)
    synth = build_dataset(base, tasks, family, rng)
    prob_threshold = rng.choice([0.0, 0.3, 0.5, 0.9])

    m = build_torch(family, hp, tasks, seed)
    pth = os.path.join(base, "w.pth")
    torch.save(m.state_dict(), pth)

    wadt.config.enable_parity_precision()
    spec = get_family(family).build_spec(load_tasks(os.path.join(synth, "tasks.json")), hp)
    params = checkpoint.load_torch_checkpoint(family, pth, spec)
    engine = Engine(family, spec, params, batch_size=4,
                    prob_threshold=prob_threshold)

    # Float-flip gates on OUR probs (== ref's within ~1e-7).
    ds = MultiTaskDataset(os.path.join(synth, "dataset.json"),
                          os.path.join(synth, "tasks.json"))
    probs = np.concatenate([
        engine.run(imgs, collect=("probs",))["probs"]
        for imgs, _l, _p in BatchLoader(ds, batch_size=4, num_workers=1)
    ])
    auc_unstable = set()
    for ti, t in enumerate(engine.tasks.names):
        p = probs[:, ti, : engine.tasks.num_classes[ti]]
        if _min_top2_margin(p) < MARGIN:
            return 0, [f"SKIP model-argmax near-tie in {t!r}"]
        if float(np.abs(p.max(axis=1) - prob_threshold).min()) < MARGIN:
            return 0, [f"SKIP threshold near-tie in {t!r}"]
        if family == "pmg":
            # AUC is rank-based; random tiny PMG specs cluster probs within
            # ~1e-4-1e-6 of each other (near-uniform softmax), so rank order
            # vs torch is noise.  Gate on the POOLED (sample, class) values:
            # per-class AUC ranks within a column, but auc_micro ranks the
            # flattened pool, so cross-column near-ties flip it too.
            # Neutralize the task's AUC fields rather than skipping the
            # case — loss/acc/P/R/F1/confusion stay.
            gaps = np.diff(np.sort(p.ravel()))
            if np.any((gaps > 0) & (gaps < MARGIN)):
                auc_unstable.add(t)

    ref_json = run_reference_eval(family, m, synth, tasks,
                                  os.path.join(base, "ref"), prob_threshold)
    our_dir = os.path.join(base, "ours")
    evaluate(engine, BatchLoader(ds, batch_size=4, num_workers=1), our_dir)
    # pmg: unified full-schema artifact; pm/rtm: the family-schema
    # test_metrics.json, diffed in FULL (incl. confusion + average block)
    our_json = os.path.join(
        our_dir, "metrics_test.json" if family == "pmg" else "test_metrics.json"
    )

    notes = [f"thr={prob_threshold}"]
    if auc_unstable:
        for path in (ref_json, our_json):
            doc = json.load(open(path))
            for t in auc_unstable:
                doc["tasks"][t]["auc_per_class"] = None
                doc["tasks"][t]["auc_macro"] = None
                doc["tasks"][t]["auc_micro"] = None
            with open(path, "w") as f:
                json.dump(doc, f)
        notes.append(f"AUC-neutralized (rank-unstable): {sorted(auc_unstable)}")
    fails = (compare(ref_json, our_json) if family == "pmg"
             else compare_scalars(ref_json, our_json))
    notes += [f"FAIL {n}: ref={a} ours={b}" for n, a, b in fails[:10]]
    return len(fails), notes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4, help="cases per family")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--families", default="pmg,pm,rtm")
    ap.add_argument("--record", action="store_true",
                    help="append a pass record to results/fuzz_parity.json")
    args = ap.parse_args()

    sys.path.insert(0, os.environ.get("REFERENCE_DIR", "/root/reference"))
    _stub_missing_modules()

    total_fails = cases = skips = 0
    for family in args.families.split(","):
        family = family.strip()
        for i in range(args.n):
            seed = args.seed * 10000 + i
            with tempfile.TemporaryDirectory(prefix="evalfuzz_") as base:
                try:
                    n_fails, notes = run_case(family, seed, base)
                except Exception as e:
                    n_fails, notes = 1, [f"ERROR {type(e).__name__}: {e}"]
            status = "ok" if n_fails == 0 else f"FAIL({n_fails})"
            print(f"[{family} #{i}] {status}", flush=True)
            for note in notes:
                print(f"    {note}", flush=True)
            cases += 1
            skips += sum(1 for x in notes if x.startswith("SKIP"))
            total_fails += n_fails

    if args.record:
        from fuzz_record import record

        path = record("eval", seed=args.seed, n=args.n,
                      families=args.families, cases=cases, skips=skips,
                      ties=0, failed=total_fails)
        print(f"recorded -> {path}")
    if total_fails:
        print(f"EVAL FUZZ PARITY FAILED: {total_fails} divergence(s)")
        return 1
    print("EVAL FUZZ PARITY OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
