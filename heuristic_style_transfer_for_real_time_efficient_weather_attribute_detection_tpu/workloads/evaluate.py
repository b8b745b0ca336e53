"""Batch dataset evaluation ("classifier" mode).

Replaces the reference's three copied eval loops (Functions/PMG_evaluation.py
:27-353, PM_evaluation.py:325-641, RTM_evaluation.py:145-538) with one
engine-driven pass: prefetched uint8 batches, on-device masked CE +
softmax/threshold, host-side sklearn metrics, and the reference's exact
artifact set: metrics_test.json, metrics_test_summary.csv,
roc/<task>_roc.png + <task>_roc_data.csv, optional times JSON.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional, Tuple

import numpy as np

from ..config import IGNORE_INDEX
from ..engine.executor import Engine
from ..utils.metrics import task_metrics_and_roc, write_metrics_summary_csv


def evaluate(
    engine: Engine,
    loader,
    save_dir: str,
    measure_time: bool = False,
    tensorboard_writer=None,
) -> Tuple[float, Dict, float, list]:
    """Returns (avg_loss, metrics, overall_f1, per_batch_times) — the
    reference's ``test_model_optimized`` contract."""
    tasks = engine.tasks
    os.makedirs(save_dir, exist_ok=True)
    roc_dir = os.path.join(save_dir, "roc")
    os.makedirs(roc_dir, exist_ok=True)

    nt = len(tasks)
    all_preds = [[] for _ in range(nt)]
    all_labels = [[] for _ in range(nt)]
    all_probs = [[] for _ in range(nt)]
    loss_sum = 0.0
    total = 0
    times = []

    for images, labels, _paths in loader:
        t0 = time.perf_counter()
        res = engine.run(images, labels, collect=("probs", "preds"))
        times.append(time.perf_counter() - t0)
        b = images.shape[0]
        # Reference loss accounting: batch_loss = sum over labeled tasks of
        # their mean CE; total_loss += batch_loss * batch_size
        # (PMG_evaluation.py:131-153).
        counts = res["count_per_task"]
        batch_loss = float(np.sum(res["loss_per_task"][counts > 0]))
        loss_sum += batch_loss * b
        total += b
        for ti in range(nt):
            m = labels[:, ti] != IGNORE_INDEX
            if not m.any():
                continue
            k = tasks.num_classes[ti]
            all_preds[ti].extend(res["preds"][m, ti].tolist())
            all_labels[ti].extend(labels[m, ti].tolist())
            all_probs[ti].extend(res["probs"][m, ti, :k].tolist())

    avg_loss = loss_sum / total if total else 0.0
    metrics: Dict[str, Dict] = {}
    for ti, task in enumerate(tasks.names):
        k = tasks.num_classes[ti]
        preds = np.asarray(all_preds[ti], np.int64)
        labels_arr = np.asarray(all_labels[ti], np.int64)
        probs = (
            np.asarray(all_probs[ti], np.float64)
            if all_probs[ti]
            else np.zeros((0, k))
        )
        m = task_metrics_and_roc(
            task, tasks.class_names[ti], preds, labels_arr, probs, roc_dir
        )
        metrics[task] = m
        msg = (
            f"[Task {task}] Acc={m['accuracy']:.4f}, Prec={m['precision']:.4f}, "
            f"Recall={m['recall']:.4f}, F1={m['f1_score']:.4f}"
        )
        if m["auc_macro"] is not None:
            msg += f", AUC_macro={m['auc_macro']:.4f}"
        if m["auc_micro"] is not None:
            msg += f", AUC_micro={m['auc_micro']:.4f}"
        print(msg)

    f1s = [m["f1_score"] for m in metrics.values() if m["f1_score"] is not None]
    overall_f1 = float(np.mean(f1s)) if f1s else 0.0
    print(f"Overall F1: {overall_f1:.4f}")

    if tensorboard_writer is not None:
        tensorboard_writer.add_scalar("Test/Loss", avg_loss)
        tensorboard_writer.add_scalar("Test/Overall_F1", overall_f1)
        for task, m in metrics.items():
            for key in ("accuracy", "precision", "recall", "f1_score"):
                tensorboard_writer.add_scalar(f"Test/{task}/{key}", m[key])

    with open(os.path.join(save_dir, "metrics_test.json"), "w") as f:
        json.dump(
            {"test_loss": float(avg_loss), "overall_f1": overall_f1, "tasks": metrics},
            f,
            indent=2,
        )
    write_metrics_summary_csv(
        os.path.join(save_dir, "metrics_test_summary.csv"), metrics
    )
    if measure_time:
        with open(os.path.join(save_dir, "times_classifier.json"), "w") as f:
            json.dump(times, f, indent=2)
    return avg_loss, metrics, overall_f1, times
