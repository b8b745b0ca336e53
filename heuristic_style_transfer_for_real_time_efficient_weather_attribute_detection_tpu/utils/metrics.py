"""Host-side metrics + ROC reporting, byte-compatible with the reference's
output schemas (SURVEY.md 2.4): per-task accuracy / weighted P/R/F1 /
confusion matrix, macro+micro+per-class ROC-AUC with binary and multiclass
branches robust to absent classes, JSON + CSV + PNG artifacts.

Mirrors Functions/PMG_evaluation.py:183-351 — kept host-side on sklearn (the
arrays are tiny; the TPU's job ended at logits/probs).
"""

from __future__ import annotations

import csv
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import IGNORE_INDEX, UNKNOWN_PRED


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def task_metrics_and_roc(
    task: str,
    class_names: Sequence[str],
    preds: np.ndarray,
    labels: np.ndarray,
    probs: np.ndarray,
    roc_dir: Optional[str] = None,
) -> Dict:
    """One task's metric dict (reference metrics_test.json per-task schema).

    preds may contain UNKNOWN_PRED (-1, below threshold) — discrete scores
    are computed on the non-Unknown subset (PMG_evaluation.py:194-204); ROC
    uses all labeled samples.
    """
    from sklearn.metrics import (
        confusion_matrix,
        f1_score,
        precision_score,
        recall_score,
    )

    class_names = list(class_names)
    valid = preds != UNKNOWN_PRED
    if valid.sum() > 0:
        acc = float(np.mean(preds[valid] == labels[valid]))
        prec = float(precision_score(labels[valid], preds[valid], average="weighted", zero_division=0))
        rec = float(recall_score(labels[valid], preds[valid], average="weighted", zero_division=0))
        f1 = float(f1_score(labels[valid], preds[valid], average="weighted", zero_division=0))
        conf = confusion_matrix(labels[valid], preds[valid]).tolist()
    else:
        acc = prec = rec = f1 = 0.0
        conf = []

    auc_macro, auc_micro, auc_per_class, roc_png = _roc_analysis(
        task, class_names, labels, probs, roc_dir
    )
    return {
        "accuracy": acc,
        "precision": prec,
        "recall": rec,
        "f1_score": f1,
        "confusion_matrix": conf,
        "auc_macro": auc_macro,
        "auc_micro": auc_micro,
        "auc_per_class": auc_per_class if auc_per_class else None,
        "roc_png": roc_png,
        "class_names": class_names,
    }


def _roc_analysis(
    task: str,
    class_names: List[str],
    labels: np.ndarray,
    probs: np.ndarray,
    roc_dir: Optional[str],
) -> Tuple[Optional[float], Optional[float], Dict[str, float], Optional[str]]:
    """Binary/multiclass ROC with CSV + PNG artifacts, robust to absent
    classes (PMG_evaluation.py:206-295)."""
    from sklearn.metrics import auc as sk_auc
    from sklearn.metrics import roc_curve
    from sklearn.preprocessing import label_binarize

    auc_macro = auc_micro = None
    auc_per_class: Dict[str, float] = {}
    roc_png = None
    if roc_dir:
        os.makedirs(roc_dir, exist_ok=True)  # before any savefig below
    if probs.shape[0] == 0:
        return auc_macro, auc_micro, auc_per_class, roc_png

    rows: List[List] = []
    keep = labels != IGNORE_INDEX
    y_true, p = labels[keep], probs[keep]
    n_classes = len(class_names)
    present = np.unique(y_true)

    if len(present) >= 2 and p.shape[1] == n_classes:
        if n_classes == 2:
            if {0, 1}.issubset(set(present.tolist())):
                pos_name = class_names[1]
                fpr, tpr, _ = roc_curve((y_true == 1).astype(int), p[:, 1])
                a = float(sk_auc(fpr, tpr))
                auc_per_class[pos_name] = a
                auc_macro = auc_micro = a
                rows += [["binary", pos_name, float(x), float(y)] for x, y in zip(fpr, tpr)]
                if roc_dir:
                    plt = _plt()
                    plt.figure(figsize=(7, 6))
                    plt.plot(fpr, tpr, lw=2, label=f"{pos_name} (AUC={a:.3f})")
                    plt.plot([0, 1], [0, 1], "--", color="gray", lw=1)
                    plt.xlim([0, 1]); plt.ylim([0, 1.05])
                    plt.xlabel("False Positive Rate"); plt.ylabel("True Positive Rate")
                    plt.title(f"ROC - Task: {task} (binary)")
                    plt.legend(loc="lower right", fontsize=9)
                    roc_png = os.path.join(roc_dir, f"{task}_roc.png")
                    plt.tight_layout(); plt.savefig(roc_png, dpi=150); plt.close()
        else:
            y_bin = label_binarize(y_true, classes=list(range(n_classes)))
            curves, aucs, valid_idx = {}, {}, []
            for c in range(n_classes):
                y_c = y_bin[:, c]
                if 0 < y_c.sum() < y_c.shape[0]:
                    fpr, tpr, _ = roc_curve(y_c, p[:, c])
                    curves[c], aucs[c] = (fpr, tpr), float(sk_auc(fpr, tpr))
                    auc_per_class[class_names[c]] = aucs[c]
                    valid_idx.append(c)
                    rows += [
                        ["ovr", class_names[c], float(x), float(y)]
                        for x, y in zip(fpr, tpr)
                    ]
            if valid_idx:
                auc_macro = float(np.mean([aucs[c] for c in valid_idx]))
                y_mi = y_bin[:, valid_idx].ravel()
                p_mi = p[:, valid_idx].ravel()
                fpr_mi, tpr_mi, _ = roc_curve(y_mi, p_mi)
                auc_micro = float(sk_auc(fpr_mi, tpr_mi))
                rows += [["micro", "micro", float(x), float(y)] for x, y in zip(fpr_mi, tpr_mi)]
                if roc_dir:
                    plt = _plt()
                    plt.figure(figsize=(9, 7))
                    for c in valid_idx:
                        fpr, tpr = curves[c]
                        plt.plot(fpr, tpr, lw=1.2, alpha=0.8,
                                 label=f"{class_names[c]} (AUC={aucs[c]:.3f})")
                    plt.plot(fpr_mi, tpr_mi, lw=2.0, color="black",
                             label=f"micro-avg (AUC={auc_micro:.3f})")
                    plt.plot([0, 1], [0, 1], "--", color="gray", lw=1)
                    plt.xlim([0, 1]); plt.ylim([0, 1.05])
                    plt.xlabel("False Positive Rate"); plt.ylabel("True Positive Rate")
                    plt.title(f"ROC - Task: {task} (multiclass)")
                    plt.legend(loc="lower right", fontsize=8)
                    roc_png = os.path.join(roc_dir, f"{task}_roc.png")
                    plt.tight_layout(); plt.savefig(roc_png, dpi=150); plt.close()

    if roc_dir:
        with open(os.path.join(roc_dir, f"{task}_roc_data.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["curve_type", "class_name", "fpr", "tpr"])
            w.writerows(rows)
    return auc_macro, auc_micro, auc_per_class, roc_png


def write_metrics_summary_csv(path: str, metrics: Dict[str, Dict]) -> None:
    """metrics_test_summary.csv (PMG_evaluation.py:344-351 schema)."""
    fieldnames = [
        "task", "accuracy", "precision", "recall", "f1_score",
        "auc_macro", "auc_micro", "roc_png",
    ]
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fieldnames)
        w.writeheader()
        for task, m in metrics.items():
            w.writerow(
                {
                    "task": task,
                    "accuracy": m["accuracy"],
                    "precision": m["precision"],
                    "recall": m["recall"],
                    "f1_score": m["f1_score"],
                    "auc_macro": m["auc_macro"] if m["auc_macro"] is not None else "",
                    "auc_micro": m["auc_micro"] if m["auc_micro"] is not None else "",
                    "roc_png": m["roc_png"] or "",
                }
            )
