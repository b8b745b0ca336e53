#!/usr/bin/env python
"""Serve a model over HTTP and query it — the production serving loop in
~40 lines.  Starts the micro-batching InferenceServer on a free port,
POSTs a JPEG, prints the per-task prediction JSON, and shuts down.

    python examples/serve_and_query.py [checkpoint.pth tasks.json]
"""

import io
import json
import os
import sys
import urllib.request

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import wadt  # noqa: E402
from wadt.engine import checkpoint  # noqa: E402
from wadt.engine.executor import Engine  # noqa: E402
from wadt.models import get_family  # noqa: E402
from wadt.workloads.serve import InferenceServer  # noqa: E402


def main():
    root = os.path.join(os.path.dirname(__file__), "..")
    ckpt = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        root, "tests", "fixtures", "pmg_shipped.pth")
    tasks = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        root, "tests", "fixtures", "pmg_shipped.json")
    with open(tasks) as f:
        meta = json.load(f)
    spec = get_family("pmg").build_spec(meta["tasks"], meta.get("hparams") or {})
    params = checkpoint.load_torch_checkpoint("pmg", ckpt, spec)
    engine = Engine("pmg", spec, params, batch_size=8)

    server = InferenceServer(engine, host="127.0.0.1", port=0).start()
    try:
        from PIL import Image

        img = Image.fromarray(
            np.random.randint(0, 256, (224, 224, 3), np.uint8))
        buf = io.BytesIO()
        img.save(buf, "JPEG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/predict", data=buf.getvalue(),
            headers={"Content-Type": "image/jpeg"})
        with urllib.request.urlopen(req, timeout=120) as r:
            print(json.dumps(json.load(r), indent=2)[:800])
        with urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}/stats", timeout=30) as r:
            print("stats:", r.read().decode())
    finally:
        server.stop()


if __name__ == "__main__":
    main()
