"""Real-time streaming inference (camera / video modes).

Reference: utils/camera_utils.py:17-177 — a synchronous batch=1 loop where
preprocessing, inference, Kalman smoothing, UI and video writing all share
one thread.  Here the TPU path is a compiled single-frame step (device-side
normalize + forward + masked softmax + stacked Kalman update, ONE dispatch
per frame), and the host loop only decodes/overlays.

Parity features: probability Kalman smoothing (jitted identity-dynamics
filter, ops/kalman.py — pykalman-default-equivalent), threshold->Unknown
labels, translucent text box overlay, XVID video recording at 20 FPS,
per-frame latency telemetry -> times_camera.json.  The Tk control panel is
replaced by keyboard controls (r=record, f=fullscreen, q=quit) so the mode
also runs over X-less SSH with --no-display.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TaskSpec
from ..engine.executor import class_mask, masked_softmax
from ..models import get_family
from ..ops import kalman
from ..ops.preprocess import normalize_uint8

# Valid pmg head-weight treatments on the fused streaming path (see
# models/pmg.fold_head_weights and ops/pallas_kernels.fused_head).
_HEAD_FOLDS = frozenset({"f32", "bf16", "q8", "pallas_bf16", "pallas_q8"})


class StreamPredictor:
    """Compiled per-frame predictor with optional fused Kalman smoothing.

    For PMG specs whose first trunk block is non-overlapping, the frame is
    space-to-depth packed on the host (~90 us of numpy) and the device step
    runs ``pmg.apply_packed`` — 20 vs 57 us/frame device compute on a v5e,
    numerically identical math (XLA's batch=1 conv lowering burns the difference in layout
    copies).  Other families use the generic uint8 step.
    """

    def __init__(self, family: str, spec, params, use_kalman: bool = False,
                 dtype=jnp.float32, trunk_kernel: str = "auto",
                 head_fold: str = "auto"):
        self.tasks: TaskSpec = spec.tasks
        self.use_kalman = use_kalman
        mod = get_family(family)
        mask = jnp.asarray(class_mask(self.tasks))
        self._pack_k = None
        self._fused = False
        self._rtm_folded = False
        self._rtm_fold_q8 = False
        if family == "rtm" and getattr(spec, "use_attention", False):
            from ..ops.kernel_select import winner

            # Folded attention weights: the batch=1 step is HBM weight-read
            # bound and the fold cuts the attention traffic 3x (see
            # models/rtm.fold_stream_weights); "folded_q8" additionally
            # stores the folded matrix weight-only int8 (halves the dominant
            # read again).  Selection by recorded measurement
            # (tools/bench_latency.py --family rtm --record; argmax parity
            # gated by tools/tpu_checklist.py); "generic" forces the
            # unfolded exact path.
            sel = (trunk_kernel if trunk_kernel != "auto"
                   else winner("rtm_stream_folded", default="folded"))
            if sel in ("folded", "folded_q8"):
                self._rtm_folded = True
                self._rtm_fold_q8 = sel == "folded_q8"
        if family == "pmg":
            from ..models import pmg
            from ..ops.kernel_select import winner
            from ..ops.pallas_kernels import supports_fused_trunk_gram

            if pmg.supports_packed_input(spec):
                self._pack_k = spec.plan[0].kernel
            # Fused pallas trunk+gram: one program replaces ~40 XLA launches
            # (measured 18.8 vs 20.6 us/frame); selection by recorded
            # measurement like every kernel (tools/bench_latency.py --record).
            if (
                trunk_kernel != "packed"
                and supports_fused_trunk_gram(spec)
                and spec.norm == "batch"
                and (trunk_kernel == "fused"
                     or winner("fused_trunk_gram") == "pallas")
            ):
                self._fused = True
                self._pack_k = spec.plan[0].kernel * spec.plan[1].kernel

        if self._fused:
            from ..models import pmg
            from ..ops.kernel_select import winner
            from ..ops.pallas_kernels import fold_trunk_gram_weights, fused_trunk_gram

            folded = fold_trunk_gram_weights(params, spec)
            # After the fused trunk+gram kernel the step is head weight-read
            # bound (token_proj alone is 7.1 MB f32 at the shipped config);
            # fold_head_weights compresses those reads (bf16 / weight-only
            # int8), and the pallas_* variants additionally run the whole
            # head as one kernel (ops/pallas_kernels.fused_head).  Selection
            # by recorded measurement, parity-gated at record time
            # (tools/bench_latency.py --record -> "pmg_head_fold"); "f32"
            # forces the uncompressed exact head.
            hsel = (head_fold if head_fold != "auto"
                    else winner("pmg_head_fold", default="f32"))
            if hsel not in _HEAD_FOLDS:
                if head_fold != "auto":
                    raise ValueError(
                        f"unknown head_fold {hsel!r}; expected one of "
                        f"{sorted(_HEAD_FOLDS)} or 'auto'"
                    )
                # a hand-edited/foreign record must not crash production;
                # fall back to the exact head
                print(f"[stream] unrecognized recorded pmg_head_fold "
                      f"winner {hsel!r}; using the exact f32 head")
                hsel = "f32"
            if hsel.startswith("pallas_"):
                from ..ops.pallas_kernels import fused_head as _fused_head

                params = pmg.fold_head_weights(
                    params, spec, hsel[len("pallas_"):]
                )
                head_fn = _fused_head
            else:
                if hsel in ("bf16", "q8"):
                    params = pmg.fold_head_weights(params, spec, hsel)

                def head_fn(tokens, p, spec):
                    return pmg.head_from_gram_tokens(p, tokens, spec)

            @jax.jit
            def step(params, packed_u8, kstate):
                tokens = fused_trunk_gram(packed_u8, folded, spec)
                logits = head_fn(tokens, params, spec)
                probs = masked_softmax(logits.astype(jnp.float32), mask)[0]
                kstate, smoothed = kalman.filter_update(kstate, probs)
                return smoothed if use_kalman else probs, kstate

        elif self._pack_k is not None:
            from ..models import pmg

            @jax.jit
            def step(params, packed_u8, kstate):
                logits, _ = pmg.apply_packed(params, packed_u8, spec, dtype=dtype)
                probs = masked_softmax(logits.astype(jnp.float32), mask)[0]
                kstate, smoothed = kalman.filter_update(kstate, probs)
                return smoothed if use_kalman else probs, kstate

        elif self._rtm_folded:
            from ..models import rtm
            from ..ops.preprocess import normalize_uint8_packed

            folded = rtm.fold_stream_weights(
                params, spec, dtype=dtype, quantize_fold=self._rtm_fold_q8
            )
            # the stem runs on k=2 space-to-depth input (exact; kills XLA's
            # batch=1 stem layout copies) — the host packs each uint8 frame
            # with the native C kernel, like the PMG packed wire format
            self._pack_k = 2

            @jax.jit
            def step(folded, packed_u8, kstate):
                x = normalize_uint8_packed(packed_u8, 2, dtype)
                logits = rtm.apply_stream(folded, x, spec)
                probs = masked_softmax(logits.astype(jnp.float32), mask)[0]
                kstate, smoothed = kalman.filter_update(kstate, probs)
                return smoothed if use_kalman else probs, kstate

            params = folded

        else:

            @jax.jit
            def step(params, frame_u8, kstate):
                x = normalize_uint8(frame_u8[None], dtype)
                logits, _ = mod.apply(params, x, spec)
                probs = masked_softmax(logits.astype(jnp.float32), mask)[0]  # [T,K]
                kstate, smoothed = kalman.filter_update(kstate, probs)
                out = smoothed if use_kalman else probs
                return out, kstate

        if head_fold != "auto" and not self._fused:
            raise ValueError(
                "head_fold applies only to the PMG fused streaming path "
                "(trunk_kernel='fused' on a supported batch-norm spec); "
                f"this predictor is family={family!r}, fused={self._fused}"
            )
        if dtype != jnp.float32 and not (self._fused or self._rtm_folded):
            # Weight reads dominate batch=1 (HBM-bound); cast like Engine
            # does.  Fused/folded paths already derive dtype-cast weights.
            from ..ops.nn import cast_tree

            params = cast_tree(params, dtype)
        self._step = step
        self.params = params
        self.kstate = kalman.init_state(len(self.tasks), self.tasks.max_classes)

    def reset(self):
        self.kstate = kalman.init_state(len(self.tasks), self.tasks.max_classes)

    def submit(self, frame_u8: np.ndarray):
        """Enqueue one frame; returns the in-flight device probs [T, Kmax]
        with its host copy already started.  ``np.asarray`` (or
        :meth:`__call__`) materializes it.  A camera loop submits frame i+1
        before materializing frame i so preprocessing and display overlap
        the device step + result transfer (depth-1 pipelining)."""
        if self._pack_k is not None:
            from ..ops.preprocess import s2d_pack_uint8

            frame_u8 = s2d_pack_uint8(frame_u8[None], self._pack_k)
        probs, self.kstate = self._step(self.params, frame_u8, self.kstate)
        try:
            probs.copy_to_host_async()
        except AttributeError:  # non-Array backends/mocks
            pass
        return probs

    def __call__(self, frame_u8: np.ndarray) -> np.ndarray:
        """frame_u8: [H,W,3] uint8 (224px) -> per-task probs [T, Kmax]."""
        return np.asarray(self.submit(frame_u8))

    def labels(self, probs: np.ndarray, prob_threshold: float):
        """[(task, label, prob)] with threshold->"Unknown" semantics
        (camera_utils.py:132-134)."""
        out = []
        for ti, t in enumerate(self.tasks.names):
            k = self.tasks.num_classes[ti]
            p = probs[ti, :k]
            idx = int(p.argmax())
            label = (
                "Unknown" if p[idx] < prob_threshold
                else self.tasks.class_names[ti][idx]
            )
            out.append((t, label, float(p[idx])))
        return out


def _screen_size() -> Optional[tuple]:
    """Primary-display resolution, or None when undeterminable.  The
    reference scales every preview frame to the monitor via screeninfo
    (utils/camera_utils.py:37-38,136); screeninfo is optional here, with the
    stdlib Tk query as fallback so the behavior survives without the extra
    dependency."""
    try:
        from screeninfo import get_monitors

        m = get_monitors()[0]
        return int(m.width), int(m.height)
    except Exception:
        pass
    try:
        import tkinter as tk

        root = tk.Tk()
        root.withdraw()
        size = (root.winfo_screenwidth(), root.winfo_screenheight())
        root.destroy()
        return size
    except Exception:
        return None


def run_camera(
    family: str,
    spec,
    params,
    save_dir: str,
    prob_threshold: float = 0.5,
    measure_time: bool = False,
    camera_index: int = 0,
    kalman_filter: bool = False,
    save_camera_video: bool = False,
    video_path: Optional[str] = None,
    display: bool = True,
    max_frames: Optional[int] = None,
    record: bool = False,
    dtype=jnp.float32,
) -> list:
    """Camera/video streaming loop.  ``video_path`` replaces the webcam with
    a file (testable headless); returns per-frame latencies."""
    import cv2

    predictor = StreamPredictor(family, spec, params, use_kalman=kalman_filter,
                                dtype=dtype)
    cap = cv2.VideoCapture(video_path if video_path else camera_index)
    if not cap.isOpened():
        print("Error: cannot open camera/video source")
        return []

    os.makedirs(save_dir, exist_ok=True)
    font = cv2.FONT_HERSHEY_SIMPLEX
    font_scale, thickness = 1.0, 2
    y0, y_step, pad_x, pad_y = 40, 40, 10, 10
    tasks_dict = predictor.tasks.as_dict()
    sample = [
        f"{t}: {max(cls + ['Unknown'], key=len)} (1.00)" for t, cls in tasks_dict.items()
    ]
    sizes = [cv2.getTextSize(s, font, font_scale, thickness)[0] for s in sample]
    box_right = max(w for w, _ in sizes) + 2 * pad_x
    box_top = y0 - max(h for _, h in sizes) - pad_y
    box_bottom = y0 + (len(tasks_dict) - 1) * y_step + pad_y

    if display and sys.platform.startswith("linux") and not (
        os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY")
    ):
        # cv2's Qt backend ABORTS the process (not a catchable cv2.error) on
        # X-less Linux — detect headless up front instead of trying the window.
        print("[camera] no display server detected; running headless")
        display = False
    screen = None
    if display:
        try:
            cv2.namedWindow("Camera", cv2.WINDOW_NORMAL)
        except cv2.error:
            display = False
    if display:
        # Scale the preview to the primary display like the reference
        # (utils/camera_utils.py:37-38,136 — frames are resized to the
        # monitor resolution before overlay/record/display).
        screen = _screen_size()

    # Without a display there is no 'r' key: if the user asked for video,
    # record from the start.  Decided here (after the namedWindow fallback)
    # so an X-less box without --no_display still records.
    recording = record or (save_camera_video and not display)
    writer = None
    fullscreen = False
    times = []
    quit_requested = False

    def present(frame, probs) -> None:
        """Annotate + record + display one frame with ITS OWN predictions."""
        nonlocal writer, recording, fullscreen, quit_requested
        if screen is not None:
            frame = cv2.resize(frame, screen)
        lines = [
            f"{t}: {label} ({p:.2f})"
            for t, label, p in predictor.labels(probs, prob_threshold)
        ]
        overlay = frame.copy()
        cv2.rectangle(overlay, (0, box_top), (box_right, box_bottom),
                      (255, 255, 255), thickness=-1)
        cv2.addWeighted(overlay, 0.4, frame, 0.6, 0, frame)
        for i, line in enumerate(lines):
            cv2.putText(frame, line, (pad_x, y0 + i * y_step), font, font_scale,
                        (0, 255, 0), thickness, cv2.LINE_AA)

        if save_camera_video and recording:
            if writer is None:
                path = os.path.join(save_dir, f"video_{int(time.time())}.avi")
                writer = cv2.VideoWriter(
                    path, cv2.VideoWriter_fourcc(*"XVID"), 20.0,
                    (frame.shape[1], frame.shape[0]),
                )
                print("recording started:", path)
            writer.write(frame)

        if display:
            cv2.imshow("Camera", frame)
            key = cv2.waitKey(1) & 0xFF
            if key == ord("q"):
                quit_requested = True
            if key == ord("r"):
                recording = not recording
                if not recording and writer is not None:
                    writer.release()
                    writer = None
            if key == ord("f"):
                fullscreen = not fullscreen
                cv2.setWindowProperty(
                    "Camera", cv2.WND_PROP_FULLSCREEN,
                    cv2.WINDOW_FULLSCREEN if fullscreen else cv2.WINDOW_NORMAL,
                )

    # Depth-1 pipelined loop: frame i+1's capture + preprocess overlap
    # frame i's device step + result transfer (the stream never blocks on
    # dispatch); each frame is still shown with its OWN predictions, one
    # capture interval later.  Per-frame telemetry subtracts the NEXT
    # frame's capture+preprocess span, so times_camera.json records each
    # frame's own preprocess + residual device wait (not the camera frame
    # interval the pipelining hides it behind).
    pending = None  # (original frame, in-flight probs, submit time)
    captured = 0
    while True:
        t_cap0 = time.time()
        ret, frame = cap.read()
        if not ret:
            break
        t0 = time.time()
        # Aspect-preserving Resize(256)+CenterCrop(224), matching the
        # reference's camera transform (test_PMG.py:206,
        # build_default_transform) - NOT a distorting direct resize.
        h0, w0 = frame.shape[:2]
        scale = 256.0 / min(h0, w0)
        rs = cv2.resize(frame, (int(round(w0 * scale)), int(round(h0 * scale))),
                        interpolation=cv2.INTER_LINEAR)
        top = int(round((rs.shape[0] - 224) / 2.0))
        left = int(round((rs.shape[1] - 224) / 2.0))
        crop = rs[top : top + 224, left : left + 224]
        rgb = cv2.cvtColor(crop, cv2.COLOR_BGR2RGB)
        handle = predictor.submit(rgb)
        t_sub = time.time()
        if pending is not None:
            pframe, ph, pt0 = pending
            probs = np.asarray(ph)
            times.append(max(time.time() - pt0 - (t_sub - t_cap0), 0.0))
            present(pframe, probs)
        pending = (frame, handle, t0)
        captured += 1
        if quit_requested or (max_frames is not None and captured >= max_frames):
            break
    if pending is not None and not quit_requested:
        pframe, ph, pt0 = pending
        probs = np.asarray(ph)
        times.append(time.time() - pt0)
        present(pframe, probs)

    cap.release()
    if writer is not None:
        writer.release()
    if display:
        cv2.destroyAllWindows()
    if measure_time and times:
        with open(os.path.join(save_dir, "times_camera.json"), "w") as f:
            json.dump(times, f, indent=2)
        print(f"mean latency: {np.mean(times):.4f}s - total: {np.sum(times):.1f}s")
    return times
