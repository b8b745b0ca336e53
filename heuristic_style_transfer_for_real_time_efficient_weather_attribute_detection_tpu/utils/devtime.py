"""Honest per-call device time from the profiler's on-device op timestamps.

On this rig the TPU sits behind a relay whose acks make dispatch-loop timing
unusable and whose ~30-40 ms round-trips swamp short chained loops; the
device's own trace timestamps are relay-proof.  Requires the tensorflow
profiler protos (present in this image); raises ImportError otherwise —
callers on the chained-loop protocol don't need this module.
"""

from __future__ import annotations

import collections
import glob
import os
import shutil
import tempfile
from typing import List, Tuple


def device_time_ms(fn, *args, iters: int = 10, top_n: int = 12) -> Tuple[float, List[Tuple[float, str]]]:
    """Run jitted ``fn(*args)`` ``iters`` times under a profiler trace and
    return (device_ms_per_iter, [(ms_per_iter, op_name) top ops]).

    Wrapper/while ops are excluded so nested events are not double-counted.
    """
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    import jax
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    fn(*args)  # warm/compile outside the trace
    d = tempfile.mkdtemp(prefix="devtime_")
    try:
        jax.profiler.start_trace(d)
        r = fn(*args)
        for _ in range(iters - 1):
            r = fn(*args)
        jax.block_until_ready(r)
        jax.profiler.stop_trace()
        path = glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True)[0]
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
    finally:
        shutil.rmtree(d, ignore_errors=True)
    # TPU plane preferred; otherwise aggregate over EVERY device plane
    # carrying an "XLA Ops" line (virtual-device CPU runs spread ops across
    # /device:CPU:n planes — counting just one would report a fraction).
    def has_ops(p):
        return any(l.name == "XLA Ops" for l in p.lines)

    candidates = [
        p for p in xs.planes if p.name == "/device:TPU:0" and has_ops(p)
    ] or [p for p in xs.planes if has_ops(p)]
    if not candidates:
        raise RuntimeError(
            f"no XLA Ops plane in trace (planes: {[p.name for p in xs.planes]})"
        )
    agg: collections.Counter = collections.Counter()
    for plane in candidates:
        md = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = md[ev.metadata_id].name
                if name.startswith(("jit_", "%while")):
                    continue
                agg[name] += ev.duration_ps
    if not agg:
        # an empty trace means execution never landed on-device (the relay's
        # early block_until_ready return) — 0.0 here would get recorded as a
        # bogus winner by bench_latency --record / divided by in roofline.py
        raise RuntimeError(
            "trace has an XLA Ops plane but no op events; device execution "
            "did not complete inside the trace window"
        )
    total_ms = sum(agg.values()) / 1e9 / iters
    top = [(t / 1e9 / iters, n) for n, t in agg.most_common(top_n)]
    return total_ms, top
