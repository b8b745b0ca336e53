#!/usr/bin/env python
"""Real-time streaming: per-frame prediction with Kalman smoothing.

Drives the compiled per-frame StreamPredictor (one device dispatch per
frame, fast path auto-selected from the measured kernel record) over a
video file — or, with no arguments, over a small synthesized clip — and
prints smoothed per-task labels every few frames.  The CLI equivalent is
``weather.py pmg --mode camera --video_path ...``.

    python examples/stream_video.py [video.avi [checkpoint.pth tasks.json]]
"""

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import wadt  # noqa: E402
from wadt.engine import checkpoint  # noqa: E402
from wadt.models import get_family  # noqa: E402
from wadt.workloads.stream import StreamPredictor  # noqa: E402


def main():
    import cv2

    root = os.path.join(os.path.dirname(__file__), "..")
    if len(sys.argv) > 1:
        vid = sys.argv[1]
    else:
        vid = os.path.join(tempfile.mkdtemp(prefix="wadt_stream_"), "in.avi")
        w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"XVID"), 10.0,
                            (320, 240))
        rng = np.random.RandomState(0)
        for _ in range(30):
            w.write(rng.randint(0, 256, (240, 320, 3), np.uint8))
        w.release()
        print(f"(no video given — synthesized 30 random frames at {vid})")

    ckpt = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        root, "tests", "fixtures", "pmg_shipped.pth")
    tasks = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        root, "tests", "fixtures", "pmg_shipped.json")
    with open(tasks) as f:
        meta = json.load(f)
    spec = get_family("pmg").build_spec(meta["tasks"], meta.get("hparams") or {})
    params = checkpoint.load_torch_checkpoint("pmg", ckpt, spec)
    pred = StreamPredictor("pmg", spec, params, use_kalman=True)

    cap = cv2.VideoCapture(vid)
    n = 0
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            rgb = cv2.cvtColor(
                cv2.resize(frame, (224, 224)), cv2.COLOR_BGR2RGB)
            probs = pred(rgb)  # [T, Kmax], Kalman-smoothed
            n += 1
            if n % 10 == 1:
                labels = pred.labels(probs, prob_threshold=0.5)
                shown = ", ".join(f"{t}={c}" for t, c, _ in labels[:3])
                print(f"frame {n:4d}: {shown}, ...")
    finally:
        cap.release()
    if n == 0:
        sys.exit("no frames decoded — the video is empty or this OpenCV "
                 "build lacks a codec for it")
    print(f"processed {n} frames (one compiled dispatch each, "
          f"Kalman smoothing fused into the step)")


if __name__ == "__main__":
    main()
