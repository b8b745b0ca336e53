"""AOT export of the compiled serving forward (``jax.export`` / StableHLO).

Production-deployment path the reference does not have: the engine's jitted
uint8 -> probs/preds step is lowered once, with the run-precision weights
baked in as module constants, serialized to a self-describing artifact
directory, and reloaded WITHOUT the model code or a checkpoint — the
serialized StableHLO module plus a small JSON sidecar is everything a
serving box needs.  Multi-platform lowering (``platforms=("cpu","tpu")`` by
default) makes one artifact loadable on a TPU worker and on a CPU dev
machine alike; ``jax.export`` guarantees forward compatibility across jax
releases for serialized modules.

The reference's closest workflow is re-instantiating the torch model from
source and loading a ``.pth`` every time (Weather_Detection.py:24-44); this
replaces both steps for inference fleets.

Artifact layout (``export_engine``):
    <dir>/forward.jaxexport   serialized jax.export module (weights inline)
    <dir>/export_meta.json    wire format, batch size, tasks, thresholds

Usage:
    export_engine(engine, "artifact/")                     # build side
    pred = ExportedPredictor("artifact/")                  # serving side
    out = pred.run(images_uint8)                           # probs/preds
"""

from __future__ import annotations

import json
import os
from typing import Dict, Sequence

import numpy as np

from ..config import IGNORE_INDEX

_FORMAT_VERSION = 1
_BLOB = "forward.jaxexport"
_META = "export_meta.json"

# the exported step returns exactly these (label-dependent outputs like
# loss_per_task need labels and stay engine-only); capture taps the engine
# was built with ride along
_SERVE_KEYS = ("logits", "probs", "max_probs", "preds")


def export_engine(
    engine,
    out_dir: str,
    platforms: Sequence[str] = ("cpu", "tpu"),
    img_size: int = 224,
) -> Dict[str, object]:
    """Serialize ``engine``'s compiled forward to ``out_dir``.

    The engine's run-precision params become constants of the exported
    module.  Mesh-sharded engines are refused — an exported module pins the
    device topology, so export the single-device engine and shard at the
    serving layer instead.
    """
    import jax
    import jax.numpy as jnp

    if engine.mesh is not None:
        raise ValueError(
            "export_engine needs a single-device engine (mesh=None); "
            "exported modules pin the topology they were lowered for"
        )

    run_params = engine._run_params
    jitted = engine._jit
    bs = engine.batch_size
    n_tasks = len(engine.tasks)
    ignore = np.full((bs, n_tasks), IGNORE_INDEX, np.int32)
    keep = _SERVE_KEYS + engine.capture

    # a capture tap may be absent from the family's aux dict, so the traced
    # module can return FEWER keys than ``keep`` — record what it actually
    # returns (out_keys) so meta["outputs"] is trustworthy for consumers
    # asking for "everything the artifact provides"
    out_keys: list = []

    def serve_step(images):
        out = jitted(run_params, images, ignore)
        picked = {k: out[k] for k in keep if k in out}
        if not out_keys:
            out_keys.extend(picked)
        return picked

    if engine.pack_k is not None:
        k = engine.pack_k
        in_shape = (bs, img_size // k, img_size // k, k * k * 3)
    else:
        in_shape = (bs, img_size, img_size, 3)
    arg = jax.ShapeDtypeStruct(in_shape, jnp.uint8)
    exported = jax.export.export(
        jax.jit(serve_step), platforms=list(platforms)
    )(arg)

    meta = {
        "format_version": _FORMAT_VERSION,
        "family": engine.family,
        "batch_size": bs,
        "input_shape": list(in_shape),
        "pack_k": engine.pack_k,
        "prob_threshold": engine.prob_threshold,
        "dtype": np.dtype(engine.dtype).name,
        "outputs": out_keys,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "tasks": {
            "names": list(engine.tasks.names),
            "num_classes": list(engine.tasks.num_classes),
            "class_names": [list(c) for c in engine.tasks.class_names],
        },
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _BLOB), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class ExportedPredictor:
    """Serving-side loader for an :func:`export_engine` artifact.

    Mirrors the host-side contract of ``Engine`` — ``run`` (uint8 NHWC in,
    host numpy out, tail batch padded) plus the pipelined
    ``dispatch``/``fetch`` pair the AsyncBatcher drives — without needing
    the model family code or a checkpoint, only the artifact directory.
    ``InferenceServer(ExportedPredictor(dir))`` therefore serves straight
    from the artifact (CLI: ``--mode serve --exported <dir>``).
    """

    def __init__(self, artifact_dir: str):
        import jax

        from ..config import TaskSpec

        with open(os.path.join(artifact_dir, _META)) as f:
            self.meta = json.load(f)
        if self.meta.get("format_version") != _FORMAT_VERSION:
            raise ValueError(
                f"unsupported export format {self.meta.get('format_version')} "
                f"(this build reads {_FORMAT_VERSION})"
            )
        with open(os.path.join(artifact_dir, _BLOB), "rb") as f:
            self._exported = jax.export.deserialize(f.read())
        self.batch_size = int(self.meta["batch_size"])
        self.pack_k = self.meta["pack_k"]
        self.family = self.meta["family"]
        t = self.meta["tasks"]
        self.tasks = TaskSpec(
            names=tuple(t["names"]),
            num_classes=tuple(int(k) for k in t["num_classes"]),
            class_names=tuple(tuple(c) for c in t["class_names"]),
        )
        self.task_names = list(t["names"])
        self.class_names = [list(c) for c in t["class_names"]]
        self._call = self._exported.call

    def warmup(self, img_size: int = 224) -> None:
        """Force the first (compiling) execution to FINISH before serving.

        Must fetch the result synchronously: on the axon relay
        ``block_until_ready`` can return before device execution completes
        (CLAUDE.md), which would leave the remote compile to land on the
        first real request and blow the batcher's result timeout.
        """
        import jax

        shape = tuple(self.meta["input_shape"])
        jax.device_get(self._call(np.zeros(shape, np.uint8)))

    def _pack(self, images: np.ndarray) -> np.ndarray:
        from .executor import validate_and_pack

        images = validate_and_pack(images, self.pack_k)
        # stricter than the live Engine: the exported module pins H/W too
        expect = tuple(self.meta["input_shape"][1:])
        if tuple(images.shape[1:]) != expect:
            raise ValueError(
                f"exported module takes [N,{','.join(map(str, expect))}] "
                f"uint8 (raw [N,224,224,3] accepted when packed); got "
                f"{images.shape}"
            )
        return images

    def dispatch(
        self,
        images: np.ndarray,
        labels=None,
        collect: Sequence[str] = ("probs", "preds"),
    ):
        """Engine.dispatch-compatible: enqueue one micro-batch and start its
        device->host result copy asynchronously; returns a handle for
        :meth:`fetch`.  Labels are not part of the exported module (it bakes
        ignore-labels in); passing any raises."""
        if labels is not None:
            raise ValueError(
                "exported modules carry no label inputs; evaluate with the "
                "live Engine instead"
            )
        from .executor import pad_batch

        images = self._pack(images)
        n = images.shape[0]
        bs = self.batch_size
        if n > bs:
            raise ValueError(f"micro-batch {n} > exported batch {bs}")
        images, _ = pad_batch(images, bs)
        res = self._call(images)
        picked = {k: res[k] for k in collect}
        for v in picked.values():
            try:
                v.copy_to_host_async()
            except AttributeError:
                pass
        return n, picked

    def fetch(self, handle) -> Dict[str, np.ndarray]:
        """Materialize a :meth:`dispatch` handle -> host arrays [n, ...]."""
        import jax

        take, res = handle
        host = jax.device_get(res)
        return {k: np.asarray(v)[:take] for k, v in host.items()}

    def run(
        self,
        images: np.ndarray,
        collect: Sequence[str] = ("probs", "preds"),
    ) -> Dict[str, np.ndarray]:
        """Forward N images (any N) -> host dict of stacked arrays [N, ...].

        Pipelined like ``Engine.run``: each batch's D2H result copy starts
        asynchronously at dispatch and up to 4 batches stay in flight, so
        the fixed per-fetch result latency (~250 ms over this rig's relay,
        PCIe on real hardware) overlaps across batches instead of
        serializing per chunk."""
        images = self._pack(images)
        n = images.shape[0]
        bs = self.batch_size
        outs = {k: [] for k in collect}
        inflight = []

        def _drain_one() -> None:
            host = self.fetch(inflight.pop(0))
            for k in collect:
                outs[k].append(host[k])

        for i in range(0, n, bs):
            inflight.append(self.dispatch(images[i : i + bs], collect=collect))
            if len(inflight) >= 4:
                _drain_one()
        while inflight:
            _drain_one()
        return {k: np.concatenate(v) if v else np.empty((0,)) for k, v in outs.items()}
