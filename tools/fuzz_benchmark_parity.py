#!/usr/bin/env python
"""Randomized benchmark-MODE parity fuzz vs the live PyTorch reference.

tools/compare_with_reference.py proves the north-star benchmark mode on ONE
fixed folder/mapping/weights case.  This tool samples RANDOM instances —
folder trees (nested dirs, unknown dirs, case-mangled dirs, junk files,
dotfile images, absent bench classes), mapping JSONs (grouped / unlisted /
double-listed / ghost model classes, random bench-class order, tasks dropped
from the mapping), tiny random specs across all THREE families — and runs the
reference's ``test_benchmark_folder`` (utils/benchmark_utils.py:16-208)
against ``workloads/run_benchmark`` on identical weights, diffing
best_mapping.json (exact) + benchmark_summary.json (1e-6) + artifact names,
under BOTH the JSON mapping and the exhaustive auto-map search.

Float-flip gates (drift vs torch is ~1e-7; discrete outputs can flip only on
near-ties, which random continuous weights make rare but a fuzz WILL hit):
  * model/bench argmax margins < 1e-4  -> the case is skipped (counted);
  * per-class AUC is rank-based -> classes whose projected-probability column
    has a nonzero sorted gap < 1e-4 (incl. collapsed tasks' constant-sum
    columns, noise at the last ulp) are stripped from BOTH summaries;
  * auto-map ties: the two sides score assignments with different float
    expressions of the SAME rational macro-F1 (2pr/(p+r) at
    benchmark_utils.py:101-103 vs our 2tp/mass) — when they disagree on
    best_mapping, the fuzz recomputes ALL assignment scores in exact Fraction
    arithmetic and accepts iff both picks are exact co-optima.

Runs on CPU (relay-proof); WADT_PARITY_ON_TPU=1 opts back into the device.

Usage:
    python tools/fuzz_benchmark_parity.py [--n 6] [--seed 0] \
        [--families pmg,pm,rtm]

Exits non-zero on any divergence (skips/ties are reported, not failures).
"""

import argparse
import itertools
import json
import os
import random
import sys
import tempfile
from fractions import Fraction

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if not os.environ.get("WADT_PARITY_ON_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import matplotlib  # noqa: E402

matplotlib.use("Agg")  # the reference imports pyplot at module scope

import torch  # noqa: E402
from PIL import Image  # noqa: E402

import wadt  # noqa: E402
from wadt.data.dataset import BatchLoader  # noqa: E402
from wadt.engine import checkpoint  # noqa: E402
from wadt.engine.executor import Engine  # noqa: E402
from wadt.models import get_family  # noqa: E402
from wadt.workloads.benchmark import (  # noqa: E402
    _assignment_from_json,
    _one_hot,
    run_benchmark,
    walk_benchmark_folder,
)

# Reference model builders + the torch-side reference runner prerequisites.
from compare_with_reference import _stub_missing_modules  # noqa: E402
from compare_with_reference import _diff_json, compare_artifact_names  # noqa: E402
from fuzz_reference_parity import build_torch  # noqa: E402

wadt.config.enable_parity_precision()

MARGIN = 1e-4  # discrete-flip gate on argmax / AUC-rank near-ties


# ---------------------------------------------------------------------------
# Instance sampling
# ---------------------------------------------------------------------------

_WORDS = ["sun", "rain", "Snow", "fog", "Heavy Rain", "night", "CLEAR",
          "mist", "wet road", "dawn", "sleet", "Overcast"]


def sample_instance(rng: random.Random, family: str):
    """(hparams, tasks, mapping, folder_plan).  ``folder_plan`` is a list of
    (relative_path, kind) where kind is 'img' or 'junk'."""
    n_tasks = rng.randint(1, 3)
    tasks = {
        f"Fuzz Task {i}": [f"Cls {i}{chr(65 + j)}" for j in range(rng.randint(2, 5))]
        for i in range(n_tasks)
    }

    # Bench classes per task: drawn from a shared word pool so tasks overlap
    # on folder names (the reference resolves GT per task independently).
    mapping = {}
    mapped_tasks = list(tasks)
    if n_tasks > 1 and rng.random() < 0.3:  # a task absent from the mapping
        mapped_tasks.remove(rng.choice(mapped_tasks))
    for t in mapped_tasks:
        n_bench = 1 if rng.random() < 0.1 else rng.randint(2, 4)
        bench = rng.sample(_WORDS, n_bench)
        task_map = {b: [] for b in bench}
        for mc in tasks[t]:
            if rng.random() < 0.15:
                continue  # unlisted -> catch-all last bench class
            name = mc.upper() if rng.random() < 0.3 else mc.lower() \
                if rng.random() < 0.5 else mc
            task_map[rng.choice(bench)].append(name)
            if rng.random() < 0.1:  # double-listed: later bench index wins
                task_map[rng.choice(bench)].append(name)
        if rng.random() < 0.15:  # ghost model class in the mapping
            task_map[rng.choice(bench)].append("No Such Class")
        mapping[t] = task_map

    # Folder tree: known bench dirs (some absent), a junk dir, a case-mangled
    # dir (skipped: the reference's walk membership is case-SENSITIVE,
    # benchmark_utils.py:44), nested subdirs, junk + dotfile entries.
    known = sorted({b for m in mapping.values() for b in m})
    plan = []
    exts = [".jpg", ".png", ".bmp", ".jpeg", ".JPG"]
    for b in known:
        if rng.random() < 0.2:
            continue  # bench class with no folder at all
        for i in range(rng.randint(1, 3)):
            plan.append((os.path.join(b, f"im{i}{rng.choice(exts)}"), "img"))
        if rng.random() < 0.3:
            plan.append((os.path.join(b, "nested", f"deep{rng.choice(exts)}"), "img"))
        if rng.random() < 0.2:
            plan.append((os.path.join(b, "notes.txt"), "junk"))
        if rng.random() < 0.15:
            # dotfile named exactly like an extension — the reference's
            # endswith filter (benchmark_utils.py:47) treats it as an image
            plan.append((os.path.join(b, ".jpg"), "img"))
        mangled = b.swapcase()
        if rng.random() < 0.3 and mangled != b and mangled not in known:
            plan.append((os.path.join(mangled, f"skip{rng.choice(exts)}"), "img"))
    plan.append((os.path.join("unrelated_dir", "x.jpg"), "img"))
    plan.append(("rootfile.jpg", "img"))  # rel == "." -> skipped by both

    hp = {
        "pmg": lambda: {
            "ndf": rng.choice([8, 16]),
            "norm": rng.choice(["batch", "instance"]),
            "patch_size": rng.choice([40, 64]),
            "patch_div": rng.choice([2, 3]),
            "gram_channels": rng.choice([16, 32]),
            "d_model": rng.choice([32, 48]),
            "transformer_layers": rng.randint(0, 1),
            "transformer_heads": rng.choice([1, 2]),
            "use_token_attention": rng.random() < 0.8,
            "use_channel_attention": rng.random() < 0.5,
        },
        "pm": lambda: {
            "ndf": rng.choice([8, 16]),
            "norm": rng.choice(["instance", "batch"]),
            "patch_size": rng.choice([16, 32]),
            "attn_tau": rng.choice([0.5, 1.0]),
            "attn_use_se": rng.random() < 0.7,
            "attn_softmax_spatial": rng.random() < 0.7,
            "ablate_attention": rng.random() < 0.2,
        },
        "rtm": lambda: {
            "truncate_layer": rng.randint(4, 5),
            "use_attention": rng.random() < 0.75,
            "attn_token_dim": rng.choice([None, 16, 48]),
            "cls_hidden_dims": tuple(
                rng.choice([16, 32]) for _ in range(rng.randint(0, 1))
            ),
            "cls_num_layers": rng.randint(0, 1),
        },
    }[family]()
    return hp, tasks, mapping, plan


def build_folder(base: str, plan, seed: int) -> str:
    rng = np.random.RandomState(seed)
    root = os.path.join(base, "bench_folder")
    for rel, kind in plan:
        path = os.path.join(root, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        if kind == "junk":
            with open(path, "w") as f:
                f.write("not an image")
            continue
        side = int(rng.randint(40, 120))
        arr = rng.randint(0, 256, (side, side, 3), np.uint8)
        ext = os.path.splitext(rel)[1].lower() or os.path.basename(rel).lower()
        fmt = {"": "JPEG", ".jpg": "JPEG", ".jpeg": "JPEG",
               ".png": "PNG", ".bmp": "BMP"}[ext if ext.startswith(".") else ""]
        Image.fromarray(arr).save(path, format=fmt)
    return root


# ---------------------------------------------------------------------------
# Exact-arithmetic auto-map scoring (tie adjudication)
# ---------------------------------------------------------------------------


def exact_macro_f1(C: np.ndarray, vec) -> Fraction:
    """Macro-F1 of one assignment as an exact Fraction.  2pr/(p+r) with
    p = tp/P, r = tp/T reduces to 2tp/(P+T); F1 = 0 when the class carries
    no mass (reference semantics, benchmark_utils.py:93-104)."""
    M, B = C.shape
    A = np.zeros((B, B), dtype=np.int64)
    for mc in range(M):
        A[vec[mc]] += C[mc]
    total = Fraction(0)
    for b in range(B):
        mass = int(A[b].sum() + A[:, b].sum())
        if mass:
            total += Fraction(2 * int(A[b, b]), mass)
    return total / B


def exact_optima(C: np.ndarray):
    """All exactly-co-optimal assignment vectors (small B**M only)."""
    M, B = C.shape
    best, vecs = None, []
    for vec in itertools.product(range(B), repeat=M):
        s = exact_macro_f1(C, vec)
        if best is None or s > best:
            best, vecs = s, [vec]
        elif s == best:
            vecs.append(vec)
    return best, vecs


# ---------------------------------------------------------------------------
# Case runner
# ---------------------------------------------------------------------------


def _forward_state(engine, folder, mapping):
    """Recompute the discrete state both pipelines derive: per-task model
    probs / preds / GT / confusion, for margin gates and tie adjudication."""
    bench_classes = {t: list(mapping[t].keys()) for t in mapping}
    images = walk_benchmark_folder(folder, bench_classes)
    tasks = engine.tasks
    if images:
        loader = BatchLoader([p for p, _ in images], batch_size=engine.batch_size,
                             num_workers=1, pack_k=engine.pack_k)
        probs_all = np.concatenate(
            [engine.run(imgs, collect=("probs",))["probs"]
             for imgs, _l, _p in loader]
        )
    else:
        probs_all = np.zeros((0, len(tasks), tasks.max_classes))
    state = {}
    for t in mapping:
        ti = tasks.names.index(t)
        k = tasks.num_classes[ti]
        p = probs_all[:, ti, :k]
        lowers = [b.lower() for b in bench_classes[t]]
        gt = np.asarray(
            [lowers.index(bc.lower()) if bc.lower() in lowers else len(lowers) - 1
             for _, bc in images], np.int64,
        )
        preds = p.argmax(axis=1) if len(p) else np.zeros((0,), np.int64)
        B = len(bench_classes[t])
        C = (
            (_one_hot(preds, k).T @ _one_hot(gt, B)).astype(np.int64)
            if len(p) else np.zeros((k, B), np.int64)
        )
        state[t] = dict(probs=p, gt=gt, preds=preds, C=C,
                        bench=bench_classes[t])
    return state


def _min_top2_margin(p: np.ndarray) -> float:
    if p.shape[0] == 0 or p.shape[1] < 2:
        return np.inf
    s = np.sort(p, axis=1)
    return float((s[:, -1] - s[:, -2]).min())


def _risky_auc_classes(p_bench: np.ndarray, bench_names) -> set:
    """Bench classes whose AUC is rank-unstable under ~1e-7 drift: any
    nonzero sorted gap of the projected column below MARGIN (collapsed
    tasks' constant-sum columns show last-ulp gaps and land here)."""
    risky = set()
    for b, name in enumerate(bench_names):
        col = np.sort(p_bench[:, b])
        gaps = np.diff(col)
        if np.any((gaps > 0) & (gaps < MARGIN)):
            risky.add(name)
    return risky


def _strip_aucs(summary: dict, risky_by_task: dict):
    for t, risky in risky_by_task.items():
        if t not in summary or not risky:
            continue
        for cls in risky:
            summary[t]["per_class"]["auc"][cls] = "RANK-UNSTABLE-SKIPPED"
        summary[t]["global"]["auc_macro"] = "RANK-UNSTABLE-SKIPPED"


def run_case(family: str, seed: int, base: str):
    """Returns (n_fails, notes).  Raises on harness-level errors."""
    rng = random.Random(f"bench-{family}-{seed}")
    hp, tasks, mapping, plan = sample_instance(rng, family)
    folder = build_folder(base, plan, seed)
    mapping_path = os.path.join(base, "mapping.json")
    with open(mapping_path, "w") as f:
        json.dump(mapping, f, indent=2)

    # One torch model -> both sides share the weights via our converter.
    m = build_torch(family, hp, tasks, seed)
    pth = os.path.join(base, "w.pth")
    torch.save(m.state_dict(), pth)
    mod = get_family(family)
    spec = mod.build_spec(tasks, hp)
    params = checkpoint.load_torch_checkpoint(family, pth, spec)
    engine = Engine(family, spec, params, batch_size=4)

    state = _forward_state(engine, folder, mapping)
    for t, st in state.items():
        if _min_top2_margin(st["probs"]) < MARGIN:
            return 0, [f"SKIP model-argmax near-tie in {t!r}"]

    from utils.benchmark_utils import test_benchmark_folder
    from utils.datasets_utils import build_default_transform

    notes, fails = [], []
    for label, auto in (("mapped", False), ("automap", True)):
        ref_dir = os.path.join(base, f"{label}_ref")
        our_dir = os.path.join(base, f"{label}_ours")
        test_benchmark_folder(
            m, torch.device("cpu"), folder, mapping_path, tasks,
            build_default_transform(224), ref_dir,
            os.path.join(ref_dir, "roc"), auto_mapping=auto,
        )
        run_benchmark(engine, folder, mapping_path, our_dir,
                      os.path.join(our_dir, "roc"), auto_mapping=auto,
                      num_workers=1)

        ref_map = json.load(open(os.path.join(ref_dir, "best_mapping.json")))
        our_map = json.load(open(os.path.join(our_dir, "best_mapping.json")))
        tied_tasks = set()
        if ref_map != our_map:
            if not auto:
                fails.append((f"{label}/best_mapping", ref_map, our_map))
            else:
                # Adjudicate with exact arithmetic: both picks must be exact
                # co-optima of the SAME rational objective.
                for t, st in state.items():
                    rv = tuple(_assignment_from_json(
                        ref_map[t], list(tasks[t]), st["bench"]))
                    ov = tuple(_assignment_from_json(
                        our_map[t], list(tasks[t]), st["bench"]))
                    if rv == ov:
                        continue
                    best, optima = exact_optima(st["C"])
                    if rv in optima and ov in optima:
                        tied_tasks.add(t)
                        notes.append(
                            f"TIE {label}/{t!r}: {len(optima)} exact co-optima "
                            f"at macro-F1 {best}; ref={rv} ours={ov}")
                    else:
                        fails.append(
                            (f"{label}/best_mapping/{t}",
                             (rv, rv in optima), (ov, ov in optima)))

        ref_sum = json.load(open(os.path.join(ref_dir, "benchmark_summary.json")))
        our_sum = json.load(open(os.path.join(our_dir, "benchmark_summary.json")))
        risky_by_task, skip_summary = {}, False
        for t, st in state.items():
            if t in tied_tasks:
                # different (equally optimal) mappings -> summaries diverge
                # legitimately; drop the task from the diff
                ref_sum.pop(t, None)
                our_sum.pop(t, None)
                continue
            vec = _assignment_from_json(our_map[t], list(tasks[t]), st["bench"])
            p_bench = st["probs"] @ _one_hot(vec, len(st["bench"])) \
                if len(st["probs"]) else st["probs"]
            if _min_top2_margin(p_bench) < MARGIN:
                skip_summary = True
                notes.append(f"SKIP-SUMMARY {label}/{t!r} bench-argmax near-tie")
                break
            if len(p_bench):
                risky_by_task[t] = _risky_auc_classes(p_bench, st["bench"])
        if skip_summary:
            continue
        for s in (ref_sum, our_sum):
            _strip_aucs(s, risky_by_task)
        leg_fails = []
        _diff_json(ref_sum, our_sum, f"{label}/summary", leg_fails, 1e-6)
        fails.extend(leg_fails)
        missing = compare_artifact_names(ref_dir, our_dir)
        fails.extend((f"{label}/artifact:{f}", "present", "MISSING")
                     for f in missing)
    return len(fails), notes + [f"FAIL {n}: ref={a} ours={b}"
                                for n, a, b in fails[:10]]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6, help="cases per family")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--families", default="pmg,pm,rtm")
    ap.add_argument("--record", action="store_true",
                    help="append a pass record to results/fuzz_parity.json")
    args = ap.parse_args()

    sys.path.insert(0, os.environ.get("REFERENCE_DIR", "/root/reference"))
    _stub_missing_modules()

    total_fails = cases = skips = ties = 0
    for family in args.families.split(","):
        family = family.strip()
        for i in range(args.n):
            seed = args.seed * 10000 + i
            with tempfile.TemporaryDirectory(prefix="benchfuzz_") as base:
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
            ties += sum(1 for x in notes if x.startswith("TIE"))
            total_fails += n_fails

    if args.record:
        from fuzz_record import record

        path = record("benchmark", seed=args.seed, n=args.n,
                      families=args.families, cases=cases, skips=skips,
                      ties=ties, failed=total_fails)
        print(f"recorded -> {path}")
    if total_fails:
        print(f"BENCHMARK FUZZ PARITY FAILED: {total_fails} divergence(s)")
        return 1
    print("BENCHMARK FUZZ PARITY OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
