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

from ..config import IGNORE_INDEX, UNKNOWN_PRED
from ..engine.executor import Engine
from ..utils.metrics import task_metrics_and_roc, write_metrics_summary_csv


def evaluate(
    engine: Engine,
    loader,
    save_dir: str,
    measure_time: bool = False,
    tensorboard_writer=None,
    save_test_images: bool = False,
    group_task: Optional[str] = None,
    profile: bool = False,
    show_gt_labels: bool = True,
    scan_chunk="off",
) -> Tuple[float, Dict, float, list]:
    """Returns (avg_loss, metrics, overall_f1, per_batch_times) — the
    reference's ``test_model_optimized`` contract.

    ``save_test_images`` writes annotated copies grouped into subfolders
    named by the ground-truth class of ``group_task`` (default: the first
    task, i.e. "Weather Type" — Functions/PM_evaluation.py:497-539).
    ``profile`` captures a jax.profiler device trace of the first few batches
    under <save_dir>/profile (the TPU-native upgrade of the reference's
    wall-clock-only telemetry, SURVEY.md 5.1).  ``show_gt_labels=False``
    (CLI ``--no_gt_labels``) drops the "True:" parts from RTM overlay
    lines (RTM_evaluation.py:307-312).

    ``scan_chunk`` ("off" default; "auto" or an int k) stacks k consecutive
    full micro-batches into ONE ``lax.scan`` dispatch — the sustained
    loop-program regime benchmark/folder modes already use via
    ``Engine.run_stream`` (recorded ~+22% RTM bf16 device throughput,
    docs/BENCHMARKING.md "The two regimes").  Metrics are bit-identical to
    the per-batch path (the scanned step IS the per-batch step as a scan
    body).  ``measure_time`` forces per-batch dispatch: the times_*.json
    telemetry contract is one wall-time per batch, which a k-batch fused
    dispatch cannot honor.
    """
    tasks = engine.tasks
    os.makedirs(save_dir, exist_ok=True)
    roc_dir = os.path.join(save_dir, "roc")
    os.makedirs(roc_dir, exist_ok=True)
    if save_test_images:
        from .inference import annotate_and_save
        from PIL import Image

        group_task = group_task or tasks.names[0]
        gi = tasks.names.index(group_task)
        img_dir = os.path.join(save_dir, "test_images")
    if profile:
        import jax

        prof_dir = os.path.join(save_dir, "profile")
        jax.profiler.start_trace(prof_dir)

    nt = len(tasks)
    all_preds = [[] for _ in range(nt)]
    all_labels = [[] for _ in range(nt)]
    all_probs = [[] for _ in range(nt)]
    loss_sum = 0.0
    total = 0
    times = []

    from collections import deque

    inflight = deque()
    _last_done = [time.perf_counter()]
    # measure_time needs one wall-time per batch -> per-batch dispatch only
    k_scan = 1 if measure_time else engine.resolve_scan_chunk(scan_chunk)
    if measure_time and engine.resolve_scan_chunk(scan_chunk) > 1:
        print("[evaluate] --measure_time needs per-batch telemetry; "
              "scan_chunk disabled for this run")

    def _resolve():
        """Pop the oldest in-flight dispatch -> list of per-micro-batch
        (imgs, labs, batch_idx, result) tuples (one for a per-batch
        dispatch, k for a scanned one, sliced back to per-batch leaves)."""
        kind, payload = inflight.popleft()
        now = time.perf_counter()
        interval = now - _last_done[0]
        _last_done[0] = now
        if kind == "batch":
            imgs, labs, bidx, handle = payload
            # per-batch time = completion interval (sum ~= wall; the first
            # entry includes the pipeline fill) — the reference's telemetry
            times.append(interval)
            return [(imgs, labs, bidx, engine.fetch(handle))]
        pairs, bidx0, res = payload  # scanned: leaves are [k, bs, ...]
        import jax

        host = jax.device_get(res)
        times.extend([interval / len(pairs)] * len(pairs))
        return [
            (ci, cl, bidx0 + j, {key: v[j] for key, v in host.items()})
            for j, (ci, cl) in enumerate(pairs)
        ]

    def _completed():
        """Dispatch batches with up to 3 in flight; yield results in order.
        engine.dispatch starts each result's device->host copy at enqueue
        time, so the fixed per-fetch latency overlaps across batches instead
        of serializing the eval loop (see Engine.run docstring).  Loader
        batches larger than the engine batch are split into micro-batches
        (matching Engine.run's chunking).  With ``scan_chunk`` active,
        consecutive FULL micro-batches go k at a time through ONE
        ``engine.step_scan`` dispatch; short/tail batches flush the buffer
        first so row order is preserved (mirrors Engine.run_stream)."""
        bidx = -1
        bs = engine.batch_size
        buf = []

        def _dispatch_one(ci, cl):
            nonlocal bidx
            bidx += 1
            inflight.append(("batch", (ci, cl, bidx, engine.dispatch(ci, cl))))

        def _flush_buf():
            while buf:
                ci, cl = buf.pop(0)
                _dispatch_one(ci, cl)

        def _dispatch_scan():
            nonlocal bidx
            pairs = list(buf)
            buf.clear()
            stack = np.stack(
                [engine._validate_and_pack(ci) for ci, _ in pairs]
            )
            lstack = np.stack([cl for _, cl in pairs]).astype(np.int32)
            res = engine.step_scan(stack, lstack)
            res = {key: res[key] for key in
                   ("probs", "preds", "loss_per_task", "count_per_task")}
            for v in res.values():
                try:
                    v.copy_to_host_async()
                except AttributeError:  # non-Array backends/mocks
                    pass
            inflight.append(("scan", (pairs, bidx + 1, res)))
            bidx += len(pairs)

        for imgs, labs, _paths in loader:
            for s in range(0, imgs.shape[0], bs):
                ci, cl = imgs[s : s + bs], labs[s : s + bs]
                if k_scan > 1 and ci.shape[0] == bs:
                    buf.append((ci, cl))
                    if len(buf) == k_scan:
                        _dispatch_scan()
                else:
                    _flush_buf()
                    _dispatch_one(ci, cl)
                if len(inflight) >= 3:
                    yield from _resolve()
        _flush_buf()
        while inflight:
            yield from _resolve()

    for images, labels, batch_idx, res in _completed():
        if profile and batch_idx == 2:
            import jax

            jax.profiler.stop_trace()
            profile = False
            print(f"profiler trace written under {os.path.join(save_dir, 'profile')}")
        b = images.shape[0]
        if save_test_images:
            if images.shape[-1] != 3:  # packed wire format -> pixels back
                from ..ops.preprocess import s2d_unpack_uint8

                images_px = s2d_unpack_uint8(images, engine.pack_k)
            else:
                images_px = images
            for i in range(b):
                gt = labels[i, gi]
                gt_name = (
                    tasks.class_names[gi][gt]
                    if 0 <= gt < tasks.num_classes[gi]
                    else "Unlabeled"
                )
                out_path = os.path.join(
                    img_dir, gt_name, f"b{batch_idx:04d}_i{i:03d}.png"
                )
                if engine.family == "rtm":
                    # RTM writes "True/Pred/Prob" lines through the
                    # auto-layout multi-column bar (RTM_evaluation.py:280-403)
                    from .inference import render_task_overlay

                    lines = []
                    for ti, t in enumerate(tasks.names):
                        k = tasks.num_classes[ti]
                        p = res["probs"][i, ti, :k]
                        pi = int(res["preds"][i, ti])
                        li = int(labels[i, ti])
                        tl = tasks.class_names[ti][li] if 0 <= li < k else "Unknown"
                        pl = tasks.class_names[ti][pi] if 0 <= pi < k else "Unknown"
                        if show_gt_labels:
                            lines.append(
                                f"{t} - True: {tl}, Pred: {pl}, "
                                f"Prob: {p.max():.2f} "
                            )
                        else:
                            # --no_gt_labels (RTM_evaluation.py:307-312)
                            lines.append("")
                            lines.append(f"{t} - Pred: {pl} ({p.max():.2f})")
                    import cv2

                    os.makedirs(os.path.dirname(out_path), exist_ok=True)
                    cv2.imwrite(
                        out_path,
                        cv2.cvtColor(
                            render_task_overlay(images_px[i], lines),
                            cv2.COLOR_RGB2BGR,
                        ),
                    )
                    continue
                lines = []
                for ti, t in enumerate(tasks.names):
                    k = tasks.num_classes[ti]
                    p = res["probs"][i, ti, :k]
                    idx = int(p.argmax())
                    lines.append(f"{t}: {tasks.class_names[ti][idx]} ({p[idx]:.2f})")
                annotate_and_save(
                    Image.fromarray(images_px[i]),
                    lines,
                    out_path,
                )
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

    if profile:  # fewer than 3 batches: close the trace now
        import jax

        jax.profiler.stop_trace()

    avg_loss = loss_sum / total if total else 0.0
    metrics: Dict[str, Dict] = {}
    raw_preds: Dict[str, tuple] = {}
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
        raw_preds[task] = (preds, labels_arr, k)
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
    if engine.family in ("pm", "rtm"):
        # The PM/RTM reference evals write their own artifact names and
        # schema alongside the unified set: test_metrics.json =
        # {task: {..., "confusion_matrix"}, "average": ...} and
        # times_test.json (Functions/PM_evaluation.py:595-641,
        # RTM_evaluation.py:449-537).  Differences from the unified (PMG-
        # semantics) block: their confusion_matrix passes
        # ``labels=range(k)`` (full k x k even when classes are absent —
        # PM_evaluation.py:595, RTM_evaluation.py:465), the all-Unknown
        # case writes a zero k x k matrix not [], and a task with no
        # samples at all records None for every field.  The average block
        # differs too: PM records accuracy only; RTM all four means.
        from sklearn.metrics import confusion_matrix as _sk_confusion

        fam_metrics: Dict[str, Dict] = {}
        for t, m in metrics.items():
            preds, labels_arr, k = raw_preds[t]
            if len(preds) == 0:
                fam_metrics[t] = {
                    key: None
                    for key in ("accuracy", "precision", "recall",
                                "f1_score", "confusion_matrix")
                }
                continue
            valid = preds != UNKNOWN_PRED
            conf = (
                _sk_confusion(labels_arr[valid], preds[valid],
                              labels=list(range(k))).tolist()
                if valid.sum() > 0
                else np.zeros((k, k)).tolist()
            )
            fam_metrics[t] = {
                key: m[key]
                for key in ("accuracy", "precision", "recall", "f1_score")
            }
            fam_metrics[t]["confusion_matrix"] = conf

        def _mean(key):
            vals = [m[key] for m in fam_metrics.values() if m[key] is not None]
            return float(np.mean(vals)) if vals else 0.0

        if engine.family == "pm":
            fam_metrics["average"] = {"accuracy": _mean("accuracy")}
        else:
            fam_metrics["average"] = {
                k: _mean(k) for k in ("accuracy", "precision", "recall", "f1_score")
            }
        with open(os.path.join(save_dir, "test_metrics.json"), "w") as f:
            json.dump(fam_metrics, f, indent=4)
        if measure_time:
            with open(os.path.join(save_dir, "times_test.json"), "w") as f:
                json.dump(times, f, indent=4)
    return avg_loss, metrics, overall_f1, times
