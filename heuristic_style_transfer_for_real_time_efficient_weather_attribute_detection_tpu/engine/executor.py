"""Jitted execution engine.

The reference runs synchronous, per-batch (or per-image!) eager forwards
(utils/benchmark_utils.py:67-75 is batch=1).  Here every mode shares one
engine: a fixed-shape jitted forward taking **uint8** NHWC images (normalized
on device), emitting stacked logits plus device-side softmax / threshold /
argmax, with host-side batch padding so arbitrary N never retriggers
compilation.  Optionally shards the batch axis over a device mesh
(parallel/mesh.py).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import IGNORE_INDEX, UNKNOWN_PRED, TaskSpec
from ..models import get_family
from ..ops.preprocess import normalize_uint8


def validate_and_pack(images: np.ndarray, pack_k: Optional[int]) -> np.ndarray:
    """Shared uint8 wire contract for ``Engine`` and ``ExportedPredictor``:
    uint8 NHWC (device-side normalize), raw [N,H,W,3] space-to-depth packed
    here when the compiled step takes the packed format, or already-packed
    channels passed through unchanged."""
    if images.ndim != 4:
        raise ValueError(
            f"expected uint8 NHWC images, got {getattr(images, 'shape', None)}"
        )
    if images.dtype != np.uint8:
        raise ValueError(
            f"expected uint8 images (device-side normalize); got "
            f"{images.dtype} — use ops.preprocess.load_image_uint8"
        )
    if pack_k is not None:
        expect_c = pack_k * pack_k * 3
        if images.shape[-1] == 3:
            # raw frames: pack here (the BatchLoader's pack_k does this
            # off-thread in the prefetch workers for the loader paths)
            from ..ops.preprocess import s2d_pack_uint8

            images = s2d_pack_uint8(images, pack_k)
        elif images.shape[-1] != expect_c:
            raise ValueError(
                f"packed step expects [N,H/{pack_k},W/{pack_k},{expect_c}] "
                f"or raw [N,H,W,3]; got {images.shape}"
            )
    elif images.shape[-1] != 3:
        raise ValueError(
            f"expected uint8 NHWC images [N,H,W,3], got {images.shape}"
        )
    return images


def pad_batch(
    images: np.ndarray, batch_size: int, labels: Optional[np.ndarray] = None
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Zero-pad a tail micro-batch (IGNORE-pad its labels) to ``batch_size``
    rows so arbitrary N never retriggers compilation."""
    n = images.shape[0]
    if n < batch_size:
        pad = batch_size - n
        images = np.concatenate(
            [images, np.zeros((pad,) + images.shape[1:], images.dtype)]
        )
        if labels is not None:
            labels = np.concatenate(
                [labels,
                 np.full((pad, labels.shape[1]), IGNORE_INDEX, labels.dtype)]
            )
    return images, labels


def class_mask(tasks: TaskSpec) -> np.ndarray:
    """[T, Kmax] bool — True where a class slot is real for the task."""
    m = np.zeros((len(tasks), tasks.max_classes), bool)
    for i, k in enumerate(tasks.num_classes):
        m[i, :k] = True
    return m


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Softmax over each task's real classes; padded slots get probability 0.

    logits: [..., T, Kmax]; mask: [T, Kmax].
    """
    neg = jnp.finfo(logits.dtype).min
    z = jnp.where(mask, logits, neg)
    p = jax.nn.softmax(z, axis=-1)
    return jnp.where(mask, p, 0.0)


def masked_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-task mean CE over samples whose label != IGNORE_INDEX.

    logits: [B, T, Kmax]; labels: [B, T] int (IGNORE_INDEX = missing).
    Returns (per_task_loss [T], per_task_count [T]).  Matches the reference's
    per-task ``CrossEntropyLoss`` over the valid mask
    (Functions/PMG_evaluation.py:134-141).
    """
    neg = jnp.finfo(jnp.float32).min
    z = jnp.where(mask, logits.astype(jnp.float32), neg)
    logp = jax.nn.log_softmax(z, axis=-1)
    valid = labels != IGNORE_INDEX
    safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.sum(valid, axis=0)
    return jnp.sum(nll, axis=0) / jnp.maximum(count, 1), count


class Engine:
    """Compiled multi-task vision engine for one (family, spec, params).

    Single entry for every workload: ``run(images_uint8)`` returns probs /
    preds / logits for N images (host numpy), padding N up to the compiled
    batch size internally.
    """

    def __init__(
        self,
        family: str,
        spec,
        params,
        *,
        batch_size: int = 32,
        prob_threshold: float = 0.5,
        dtype: jnp.dtype = jnp.float32,
        capture: Sequence[str] = (),
        mesh=None,
        packed: str = "auto",
    ):
        self.family = family
        self.spec = spec
        self.tasks: TaskSpec = spec.tasks
        self.batch_size = batch_size
        self.prob_threshold = float(prob_threshold)
        self.dtype = dtype
        self.capture = tuple(capture)
        self._mod = get_family(family)
        self._mask = jnp.asarray(class_mask(self.tasks))
        self.mesh = mesh

        # Packed wire format (PMG): space-to-depth uint8 so the
        # non-overlapping first conv runs as a GEMM — 1.2-3.3x faster device
        # forward at every batch size measured.  apply_packed supports the
        # same capture taps as apply; ``packed="off"`` forces the raw path.
        self.pack_k = None
        if packed != "off" and family == "pmg":
            from ..models import pmg

            if pmg.supports_packed_input(spec):
                self.pack_k = spec.plan[0].kernel

        def _step(params, images, labels):
            if self.pack_k is not None:
                from ..models import pmg

                logits, aux = pmg.apply_packed(
                    params, images, spec, self.capture, dtype=dtype
                )
            else:
                x = normalize_uint8(images, dtype)
                logits, aux = self._mod.apply(params, x, spec, self.capture)
            logits = logits.astype(jnp.float32)
            probs = masked_softmax(logits, self._mask)
            maxp = jnp.max(probs, axis=-1)
            preds = jnp.argmax(probs, axis=-1).astype(jnp.int32)
            preds = jnp.where(maxp < self.prob_threshold, UNKNOWN_PRED, preds)
            loss_t, count_t = masked_cross_entropy(logits, labels, self._mask)
            out = {
                "logits": logits,
                "probs": probs,
                "max_probs": maxp,
                "preds": preds,
                "loss_per_task": loss_t,
                "count_per_task": count_t,
            }
            out.update(aux)
            return out

        self._step_fn = _step
        self._scan_jits: Dict[int, object] = {}
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, replicated

            self._jit = jax.jit(
                _step,
                in_shardings=(replicated(mesh), batch_sharding(mesh), batch_sharding(mesh)),
            )
            params = jax.device_put(params, replicated(mesh))
        else:
            self._jit = jax.jit(_step)
        self.params = params  # property setter derives the run-precision copy

    # ``params`` stays at the caller's precision (Explainer / StreamPredictor
    # / train warm-start all consume it as f32); a low-precision run copy is
    # derived for the compiled step only.  Re-assigning params (the trainer
    # swaps in fresh weights each epoch) re-derives it without retracing.
    @property
    def params(self):
        return self._params

    @params.setter
    def params(self, p):
        self._params = p
        if self.dtype != jnp.float32:
            from ..ops.nn import cast_tree

            self._run_params = cast_tree(p, self.dtype)
        else:
            self._run_params = p

    # -- low-level -------------------------------------------------------

    def step(self, images: np.ndarray, labels: Optional[np.ndarray] = None):
        """One compiled step on exactly ``batch_size`` uint8 images."""
        if labels is None:
            labels = np.full(
                (images.shape[0], len(self.tasks)), IGNORE_INDEX, np.int32
            )
        return self._jit(self._run_params, images, labels)

    def _scan_jit(self, k: int):
        """Compiled scan of the step over ``k`` stacked micro-batches.

        One dispatch runs k forwards as a ``lax.scan`` body — the same
        loop-program compilation the sustained benchmark regime gets
        (docs/BENCHMARKING.md "The two regimes": XLA keeps the body's
        intermediates VMEM-resident and pipelines across iterations; the
        recorded regime split is ~+22% for rtm_bf16_b128).  Measured per
        family x dtype by tools/exp_scan_chunk.py.  Cached per k.
        """
        fn = self._scan_jits.get(k)
        if fn is None:
            step = self._step_fn

            def scanned(params, images, labels):
                def body(carry, xs):
                    return carry, step(params, xs[0], xs[1])

                _, outs = jax.lax.scan(
                    body, jnp.zeros((), jnp.int32), (images, labels)
                )
                return outs

            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                from ..parallel.mesh import replicated

                stacked = NamedSharding(self.mesh, PartitionSpec(None, "data"))
                fn = jax.jit(
                    scanned,
                    in_shardings=(replicated(self.mesh), stacked, stacked),
                )
            else:
                fn = jax.jit(scanned)
            self._scan_jits[k] = fn
        return fn

    def step_scan(self, images: np.ndarray, labels: Optional[np.ndarray] = None):
        """One compiled dispatch over ``[k, batch_size, ...]`` stacked
        micro-batches -> result leaves shaped [k, batch_size, ...]
        (per-task aggregates [k, T])."""
        k = images.shape[0]
        if labels is None:
            labels = np.full(
                (k, images.shape[1], len(self.tasks)), IGNORE_INDEX, np.int32
            )
        return self._scan_jit(k)(self._run_params, images, labels)

    def warmup(self, img_size: int = 224) -> None:
        if self.pack_k is not None:
            k = self.pack_k
            z = np.zeros(
                (self.batch_size, img_size // k, img_size // k, k * k * 3),
                np.uint8,
            )
        else:
            z = np.zeros((self.batch_size, img_size, img_size, 3), np.uint8)
        jax.block_until_ready(self.step(z))

    # -- pipelined micro-batch API (serving) -----------------------------

    def _validate_and_pack(self, images: np.ndarray) -> np.ndarray:
        return validate_and_pack(images, self.pack_k)

    def dispatch(
        self,
        images: np.ndarray,
        labels: Optional[np.ndarray] = None,
        collect: Sequence[str] = ("probs", "preds"),
    ):
        """Enqueue ONE micro-batch (<= batch_size uint8 frames, raw or
        packed) and start copying its results to the host asynchronously.

        Returns an opaque handle for :meth:`fetch`.  A serving loop keeps
        several handles in flight so the fixed per-fetch result latency
        (~250 ms over this rig's relay; PCIe/dispatch on real hardware)
        overlaps across batches instead of serializing.
        """
        images = self._validate_and_pack(images)
        n = images.shape[0]
        if n > self.batch_size:
            raise ValueError(f"micro-batch {n} > engine batch {self.batch_size}")
        images, labels = pad_batch(images, self.batch_size, labels)
        res = self.step(images, labels)
        keys = set(collect)
        if labels is not None:
            keys |= {"loss_per_task", "count_per_task"}
        picked = {k: res[k] for k in keys}
        for v in picked.values():
            try:
                v.copy_to_host_async()
            except AttributeError:  # non-Array backends/mocks
                pass
        return n, picked

    def fetch(self, handle) -> Dict[str, np.ndarray]:
        """Materialize a :meth:`dispatch` handle -> host arrays [n, ...]
        (per-task aggregates like loss_per_task stay unsliced)."""
        take, res = handle
        host = jax.device_get(res)
        unbatched = {"loss_per_task", "count_per_task"}
        return {
            k: (v if k in unbatched else v[:take]) for k, v in host.items()
        }

    # -- high-level ------------------------------------------------------

    def run(
        self,
        images: np.ndarray,
        labels: Optional[np.ndarray] = None,
        collect: Sequence[str] = ("probs", "preds"),
        measure_time: bool = False,
        scan_chunk: Optional[int] = None,
    ) -> Dict[str, np.ndarray]:
        """Forward N images (any N) -> host dict of stacked arrays [N, ...].

        Dispatch is pipelined: each batch's results start copying to the
        host asynchronously the moment the step is enqueued
        (``copy_to_host_async``), and up to 4 batches stay in flight before
        the oldest is drained — so neither the chip nor the host link idles
        on a tail D2H (the reference synchronizes every batch; on this rig
        the D2H result path carries a ~250 ms fixed relay cost per
        synchronous fetch, and pipelining measures 2.4x end-to-end).  Pads
        the tail batch; per-batch wall-times returned under "times" when
        ``measure_time`` (parity with the reference's times_*.json telemetry
        — timing forces per-batch synchronization).

        ``scan_chunk=k`` stacks k full micro-batches and runs them as ONE
        compiled ``lax.scan`` dispatch (:meth:`step_scan`) — the sustained
        loop-program regime (recorded ~+22% RTM bf16 device throughput)
        and 1/k the dispatch/fetch overhead; the tail still goes through
        the per-batch path, and ``measure_time`` disables it (the
        times_*.json telemetry contract is per-batch).
        """
        images = self._validate_and_pack(images)
        n = images.shape[0]
        bs = self.batch_size
        outs: Dict[str, List[np.ndarray]] = {k: [] for k in collect}
        loss_sums = np.zeros(len(self.tasks), np.float64)
        counts = np.zeros(len(self.tasks), np.int64)
        times: List[float] = []
        fetch_keys = set(collect)
        if labels is not None:
            fetch_keys |= {"loss_per_task", "count_per_task"}
        inflight: List[Tuple[int, Dict, bool]] = []

        def _drain_one() -> None:
            take, res, scanned = inflight.pop(0)
            host = jax.device_get({k: res[k] for k in fetch_keys})
            for k in collect:
                v = host[k]
                if scanned:  # [k, bs, ...] -> [k*bs, ...]
                    v = v.reshape((-1,) + v.shape[2:])
                outs[k].append(v[:take])
            if labels is not None:
                cnt = host["count_per_task"].astype(np.int64)
                contrib = host["loss_per_task"] * cnt
                if scanned:  # per-task aggregates come back [k, T]
                    cnt, contrib = cnt.sum(axis=0), contrib.sum(axis=0)
                np.add(loss_sums, contrib, out=loss_sums)
                np.add(counts, cnt, out=counts)

        start = 0
        k = self.resolve_scan_chunk(scan_chunk)
        if k > 1 and not measure_time and n >= k * bs:
            for s in range(0, (n // (k * bs)) * k * bs, k * bs):
                e = s + k * bs
                stack = images[s:e].reshape((k, bs) + images.shape[1:])
                lab = (
                    labels[s:e].reshape(k, bs, -1)
                    if labels is not None else None
                )
                res = self.step_scan(stack, lab)
                for kk in fetch_keys:
                    try:
                        res[kk].copy_to_host_async()
                    except AttributeError:  # non-Array backends/mocks
                        pass
                inflight.append((k * bs, res, True))
                if len(inflight) >= 4:
                    _drain_one()
                start = e

        for s in range(start, n, bs):
            e = min(s + bs, n)
            chunk, lab = pad_batch(
                images[s:e], bs, labels[s:e] if labels is not None else None
            )
            t0 = time.perf_counter()
            res = self.step(chunk, lab)
            for k in fetch_keys:
                try:
                    res[k].copy_to_host_async()
                except AttributeError:  # non-Array backends/mocks
                    pass
            if measure_time:
                jax.block_until_ready(res)
                times.append(time.perf_counter() - t0)
            inflight.append((e - s, res, False))
            if len(inflight) >= 4:
                _drain_one()
        while inflight:
            _drain_one()
        result = {k: np.concatenate(v, axis=0) for k, v in outs.items() if v}
        if labels is not None:
            result["loss_per_task"] = loss_sums / np.maximum(counts, 1)
            result["count_per_task"] = counts
        if measure_time:
            result["times"] = np.asarray(times)
        return result

    def resolve_scan_chunk(self, scan_chunk) -> int:
        """``"auto"`` -> the recorded per-family-and-dtype winner from the
        measured A/B (results/kernel_ab.json, op
        ``eval_scan_chunk_<family>_<f32|bf16>``, recorded by
        tools/exp_scan_chunk.py --record; the regimes differ by dtype —
        RTM's sustained program wins bf16 but not f32); ints pass through.
        No record / off-TPU -> 1 (per-batch dispatch).  ``"off"``/``None``
        -> 1 explicitly (the classifier-mode CLI default)."""
        if scan_chunk == "auto":
            from ..ops.kernel_select import winner

            dt = "bf16" if self.dtype == jnp.bfloat16 else "f32"
            w = winner(f"eval_scan_chunk_{self.family}_{dt}",
                       default="standalone")
            return int(w[len("scan_k"):]) if w.startswith("scan_k") else 1
        if scan_chunk in (None, "off"):
            return 1
        return int(scan_chunk)

    def run_stream(
        self,
        batches,
        collect: Sequence[str] = ("probs",),
        scan_chunk="auto",
        depth: int = 3,
    ) -> Tuple[Dict[str, np.ndarray], List]:
        """Drive a loader's ``(imgs, labels, extra)`` batches through the
        scan-chunk path: consecutive FULL micro-batches are stacked k at a
        time into ONE ``lax.scan`` dispatch (the sustained loop program —
        docs/BENCHMARKING.md), with up to ``depth`` dispatches in flight;
        short/tail batches fall back to the per-batch pipeline in order.
        Returns ``(stacked result dict, flattened extras)`` — row order
        matches the input order, so extras (e.g. kept paths from a
        ``skip_errors`` loader) stay aligned with the result rows.

        On an EMPTY stream the standard keys come back with their real
        trailing shapes (``probs``/``logits`` [0, T, Kmax],
        ``preds``/``max_probs`` [0, T]); capture-tap keys, whose shapes are
        model-internal, fall back to a bare ``[0]`` float32 array.
        """
        k = self.resolve_scan_chunk(scan_chunk)
        outs: Dict[str, List[np.ndarray]] = {c: [] for c in collect}
        extras: List = []
        inflight: List[Tuple[int, Dict, bool]] = []

        def _drain_one() -> None:
            take, res, scanned = inflight.pop(0)
            host = jax.device_get(res)
            for c in collect:
                v = host[c]
                if scanned:  # [k, bs, ...] -> [k*bs, ...]
                    v = v.reshape((-1,) + v.shape[2:])
                outs[c].append(v[:take])

        def _submit(take: int, picked: Dict, scanned: bool) -> None:
            for v in picked.values():
                try:
                    v.copy_to_host_async()
                except AttributeError:  # non-Array backends/mocks
                    pass
            inflight.append((take, picked, scanned))
            if len(inflight) >= depth:
                _drain_one()

        buf: List[np.ndarray] = []

        def _flush_buf() -> None:
            while buf:
                imgs = buf.pop(0)
                n, picked = self.dispatch(imgs, collect=collect)
                _submit(n, picked, False)

        for item in batches:
            imgs = item[0]
            if len(item) > 2 and item[2] is not None:
                extras.extend(item[2])
            imgs = self._validate_and_pack(imgs)
            if k > 1 and imgs.shape[0] == self.batch_size:
                buf.append(imgs)
                if len(buf) == k:
                    stack = np.stack(buf)
                    buf.clear()
                    res = self.step_scan(stack)
                    _submit(k * self.batch_size,
                            {c: res[c] for c in collect}, True)
            else:
                # a short batch mid-stream (skip_errors loader) or tail:
                # flush buffered fulls first so row order is preserved
                _flush_buf()
                n, picked = self.dispatch(imgs, collect=collect)
                _submit(n, picked, False)
        _flush_buf()
        while inflight:
            _drain_one()
        result = {
            c: (np.concatenate(v, axis=0) if v else self._empty_result(c))
            for c, v in outs.items()
        }
        return result, extras

    def _empty_result(self, key: str) -> np.ndarray:
        """[0, ...]-shaped empty matching the step's output layout for the
        standard keys, so callers indexing e.g. ``probs[:, t]`` on an empty
        stream get an empty slice, not an IndexError.  Capture-tap keys have
        model-internal shapes -> bare [0] float32 (documented fallback)."""
        t, kmax = self._mask.shape
        if key in ("probs", "logits"):
            return np.zeros((0, t, kmax), np.float32)
        if key in ("preds",):
            return np.zeros((0, t), np.int32)
        if key in ("max_probs",):
            return np.zeros((0, t), np.float32)
        if key in ("loss_per_task", "count_per_task"):
            return np.zeros((t,), np.float32)
        return np.zeros((0,), np.float32)

    def predict_dict(self, images: np.ndarray) -> Dict[str, np.ndarray]:
        """{task: probs [N, K_t]} — the reference's per-task dict contract."""
        probs = self.run(images, collect=("probs",))["probs"]
        return {
            t: probs[:, i, : self.tasks.num_classes[i]]
            for i, t in enumerate(self.tasks.names)
        }
