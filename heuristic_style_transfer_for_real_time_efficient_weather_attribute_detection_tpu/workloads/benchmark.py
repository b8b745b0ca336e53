"""External-benchmark evaluation with class mapping (the north-star mode).

Reference: utils/benchmark_utils.py:16-208.  Same semantics, TPU-native
execution: the folder walk / mapping algebra stay host-side, but the
per-image synchronous batch=1 forwards (:67-75) become prefetched, jitted
device batches.

Auto-mapping improves on the reference's O(B^M) exhaustive product (:91-111):
each model class's benchmark assignment is optimized by coordinate ascent on
macro-F1 (exact for the 1-class-at-a-time neighborhood, restart-stabilized),
with the exhaustive search kept for small M where it is cheap — results match
the reference's optimum on every feasible instance we test.
"""

from __future__ import annotations

import itertools
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..data.dataset import BatchLoader
from ..engine.executor import Engine
from ..ops.preprocess import VALID_EXTS

EXHAUSTIVE_LIMIT = 2_000_000  # max B**M states for brute force


def walk_benchmark_folder(
    benchmark_folder: str, bench_classes: Dict[str, List[str]]
) -> List[Tuple[str, str]]:
    """[(image_path, top_level_class_dir)] (reference :38-49)."""
    images = []
    for root, _, files in os.walk(benchmark_folder):
        rel = os.path.relpath(root, benchmark_folder)
        if rel == ".":
            continue
        top = rel.split(os.sep)[0]
        if all(top not in bench_classes[t] for t in bench_classes):
            continue
        for fn in files:
            if os.path.splitext(fn)[1].lower() in VALID_EXTS:
                images.append((os.path.join(root, fn), top))
    return images


def _macro_f1_from_assignment(C: np.ndarray, vec: Sequence[int], B: int) -> float:
    """Mean per-class F1 of benchmark-space confusion induced by mapping
    model-class m -> bench-class vec[m] (reference :93-104)."""
    A = np.zeros((B, B), dtype=np.int64)
    for mc, b in enumerate(vec):
        A[b] += C[mc]
    f1s = []
    for b in range(B):
        tp = A[b, b]
        p_sum = A[b].sum()
        t_sum = A[:, b].sum()
        p = tp / p_sum if p_sum else 0.0
        r = tp / t_sum if t_sum else 0.0
        f1s.append(2 * p * r / (p + r) if (p + r) else 0.0)
    return float(np.mean(f1s))


def auto_map_task(C: np.ndarray) -> Tuple[List[int], float]:
    """Best model->bench assignment maximizing macro-F1.

    Exhaustive when B**M is small (bit-identical to the reference's search);
    otherwise multi-restart coordinate ascent — each pass greedily reassigns
    one model class holding the rest fixed until a fixed point.
    """
    M, B = C.shape
    if B ** M <= EXHAUSTIVE_LIMIT:
        best_s, best_v = -1.0, None
        for vec in itertools.product(range(B), repeat=M):
            s = _macro_f1_from_assignment(C, vec, B)
            if s > best_s:
                best_s, best_v = s, list(vec)
        return best_v, best_s

    best_s, best_v = -1.0, None
    starts = [list(np.argmax(C, axis=1))]  # greedy row-argmax start
    rng = np.random.RandomState(0)
    starts += [list(rng.randint(0, B, size=M)) for _ in range(7)]
    for vec in starts:
        score = _macro_f1_from_assignment(C, vec, B)
        improved = True
        while improved:
            improved = False
            for mc in range(M):
                cur = vec[mc]
                for b in range(B):
                    if b == cur:
                        continue
                    vec[mc] = b
                    s = _macro_f1_from_assignment(C, vec, B)
                    if s > score:
                        score, cur, improved = s, b, True
                vec[mc] = cur
        if score > best_s:
            best_s, best_v = score, list(vec)
    return best_v, best_s


def run_benchmark(
    engine: Engine,
    benchmark_folder: str,
    mapping_path: str,
    save_dir: str,
    roc_dir: str,
    auto_mapping: bool = False,
    num_samples: Optional[int] = None,
    num_workers: int = 4,
    save_pred_images: bool = False,
) -> Dict:
    """Full benchmark mode -> best_mapping.json + benchmark_summary.json +
    roc_<task>.png, returning the summary dict (reference :16-208)."""
    from sklearn.metrics import f1_score, precision_score, recall_score, roc_auc_score, roc_curve
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    tasks = engine.tasks
    tasks_json = tasks.as_dict()
    with open(mapping_path, "r") as f:
        initial_mapping = json.load(f)
    bench_classes = {t: list(initial_mapping[t].keys()) for t in initial_mapping}

    images = walk_benchmark_folder(benchmark_folder, bench_classes)
    if num_samples and num_samples < len(images):
        rng = np.random.RandomState(0)
        images = [images[i] for i in rng.permutation(len(images))[:num_samples]]

    # Ground-truth bench index per task (case-insensitive; unmatched -> last
    # class, reference :51-60).
    gt: Dict[str, np.ndarray] = {}
    for task in initial_mapping:
        lowers = [b.lower() for b in bench_classes[task]]
        idxs = []
        for _, bench_cls in images:
            low = bench_cls.lower()
            idxs.append(lowers.index(low) if low in lowers else len(lowers) - 1)
        gt[task] = np.asarray(idxs, np.int64)

    # Batched device forwards (vs the reference's batch=1 loop).
    loader = BatchLoader([p for p, _ in images], batch_size=engine.batch_size,
                         num_workers=num_workers)
    probs_chunks = []
    for imgs, _labels, _paths in loader:
        probs_chunks.append(engine.run(imgs, collect=("probs",))["probs"])
    probs_all = (
        np.concatenate(probs_chunks)
        if probs_chunks
        else np.zeros((0, len(tasks), tasks.max_classes))
    )

    model_probs = {}
    model_preds = {}
    for task in initial_mapping:
        ti = tasks.names.index(task)
        k = tasks.num_classes[ti]
        p = probs_all[:, ti, :k]
        model_probs[task] = p
        model_preds[task] = p.argmax(axis=1) if len(p) else np.zeros((0,), np.int64)

    # Model-class x bench-class confusion (reference :77-84).
    confusion = {}
    for task in initial_mapping:
        M = len(tasks_json[task])
        B = len(bench_classes[task])
        C = np.zeros((M, B), dtype=np.int64)
        for mc, bc in zip(model_preds[task], gt[task]):
            C[mc, bc] += 1
        confusion[task] = C

    # Mapping: inversion of the provided JSON, or automatic search.
    inverted: Dict[str, Dict[str, int]] = {}
    if auto_mapping:
        for task, C in confusion.items():
            vec, score = auto_map_task(C)
            inverted[task] = {
                tasks_json[task][mc].lower(): int(vec[mc]) for mc in range(len(vec))
            }
            print(f"[auto-map] best macro-F1 '{task}' = {score:.4f}")
    else:
        for task, mp in initial_mapping.items():
            inv = {}
            for bidx, bench_cls in enumerate(bench_classes[task]):
                for mc_name in mp[bench_cls]:
                    inv[mc_name.lower()] = bidx
            inverted[task] = inv

    final_mapping = {}
    for task, bench_list in bench_classes.items():
        mp = {b: [] for b in bench_list}
        for mc_name in tasks_json[task]:
            bidx = inverted[task].get(mc_name.lower(), len(bench_list) - 1)
            mp[bench_list[bidx]].append(mc_name)
        final_mapping[task] = mp
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, "best_mapping.json"), "w") as f:
        json.dump(final_mapping, f, indent=2)

    # Project probabilities into benchmark space (sum of mapped model-class
    # probs, reference :132-142) — one matmul per task.
    os.makedirs(roc_dir, exist_ok=True)
    summary = {}
    for task in initial_mapping:
        B = len(bench_classes[task])
        M = len(tasks_json[task])
        proj = np.zeros((M, B))
        for idx_mc, mc_name in enumerate(tasks_json[task]):
            proj[idx_mc, inverted[task].get(mc_name.lower(), B - 1)] = 1.0
        p_bench = model_probs[task] @ proj
        if p_bench.shape[0] == 0:
            print(f"[Warning] no probabilities for task '{task}', metrics skipped.")
            continue
        y_pred = p_bench.argmax(axis=1)
        y_true = gt[task]
        labels = list(range(B))

        prec_pc = precision_score(y_true, y_pred, labels=labels, average=None, zero_division=0)
        rec_pc = recall_score(y_true, y_pred, labels=labels, average=None, zero_division=0)
        f1_pc = f1_score(y_true, y_pred, labels=labels, average=None, zero_division=0)
        auc_pc = []
        for i in range(B):
            try:
                auc_pc.append(float(roc_auc_score((y_true == i).astype(int), p_bench[:, i])))
            except ValueError:
                auc_pc.append(None)
        valid_aucs = [a for a in auc_pc if a is not None]
        auc_global = float(np.mean(valid_aucs)) if valid_aucs else None

        plt.figure()
        colors = ["aqua", "darkorange", "cornflowerblue", "green",
                  "red", "purple", "brown", "olive"]
        for i, color in zip(range(B), itertools.cycle(colors)):
            if auc_pc[i] is None:
                continue
            fpr, tpr, _ = roc_curve((y_true == i).astype(int), p_bench[:, i])
            plt.plot(fpr, tpr, color=color,
                     label=f"{bench_classes[task][i]} (AUC={auc_pc[i]:.2f})")
        plt.plot([0, 1], [0, 1], "k--")
        plt.xlabel("FPR"); plt.ylabel("TPR")
        plt.title(f"ROC – {task}")
        plt.legend(loc="lower right")
        plt.savefig(os.path.join(roc_dir, f"roc_{task.replace(' ', '_')}.png"))
        plt.close()

        summary[task] = {
            "n_samples": int(len(y_true)),
            "per_class": {
                "precision": {bench_classes[task][i]: float(prec_pc[i]) for i in labels},
                "recall": {bench_classes[task][i]: float(rec_pc[i]) for i in labels},
                "f1_score": {bench_classes[task][i]: float(f1_pc[i]) for i in labels},
                "auc": {bench_classes[task][i]: auc_pc[i] for i in labels},
            },
            "global": {
                "precision_macro": float(precision_score(y_true, y_pred, average="macro", zero_division=0)),
                "recall_macro": float(recall_score(y_true, y_pred, average="macro", zero_division=0)),
                "f1_macro": float(f1_score(y_true, y_pred, average="macro", zero_division=0)),
                "auc_macro": auc_global,
            },
        }

    with open(os.path.join(save_dir, "benchmark_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(f"benchmark summary saved to {os.path.join(save_dir, 'benchmark_summary.json')}")

    if save_pred_images:
        # GT/Pred overlays, green when correct / red when wrong per task
        # (Functions/RTM_evaluation.py:1225-1287).
        import cv2

        pred_dir = os.path.join(save_dir, "pred_images")
        os.makedirs(pred_dir, exist_ok=True)
        for i, (path, bench_cls) in enumerate(images):
            img = cv2.imread(path)
            if img is None:
                continue
            y = 24
            for task in initial_mapping:
                B = len(bench_classes[task])
                proj = np.zeros((len(tasks_json[task]), B))
                for idx_mc, mc_name in enumerate(tasks_json[task]):
                    proj[idx_mc, inverted[task].get(mc_name.lower(), B - 1)] = 1.0
                pb = model_probs[task][i] @ proj
                pred_idx = int(pb.argmax())
                ok = pred_idx == gt[task][i]
                color = (0, 200, 0) if ok else (0, 0, 255)
                line = (
                    f"{task}: GT={bench_classes[task][gt[task][i]]} "
                    f"Pred={bench_classes[task][pred_idx]} ({pb[pred_idx]:.2f})"
                )
                cv2.putText(img, line, (8, y), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                            color, 1, cv2.LINE_AA)
                y += 20
            cv2.imwrite(
                os.path.join(pred_dir, f"{i:05d}_{os.path.basename(path)}"), img
            )
    return summary
