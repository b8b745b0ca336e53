"""Explainability: Grad-CAM + Integrated Gradients, natively on the jitted
forward (no external library — SURVEY.md 5.9).

Grad-CAM (reference: pytorch_grad_cam targeting the last trunk Conv2d,
Functions/PMG_evaluation.py:59-64,107-181): channel weights = spatial mean of
d(logit)/d(features); cam = ReLU(sum_c w_c * F_c), min-max normalized,
resized to input, colormapped, alpha-blended (0.45), saved as
original|overlay hstack.  Implemented as one jitted vjp through
``head_apply`` — per-image backward loops (reference :170) become one batched
pass.

Integrated Gradients (reference: captum.attr.IntegratedGradients, zero
baseline — Functions/PM_evaluation.py:358-373): Riemann-sum of input grads
along the interpolation path, computed with lax.scan over steps.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import IGNORE_INDEX
from ..models import get_family
from ..ops.preprocess import normalize_uint8


def gradcam_split(family: str, spec, rtm_target: str = "stem_conv"):
    """(target_feats(params, x), head_from(params, acts)) — the forward split
    at the Grad-CAM target activation.

    The reference hooks the LAST top-level Conv2d module's output — pre-norm,
    pre-activation (PMG_evaluation.py:59-64, PM_evaluation.py:235-242).
    PM/PMG trunks are flat Sequentials so that is the last trunk conv.  For
    RTM, ``rtm_target`` picks the activation:

      - ``"stem_conv"`` (default): the stem conv1 output — what the
        reference's shipped code actually hooks, because its ``reversed()``
        scan over ``truncated_encoder``'s top-level children
        (Functions/RTM_evaluation.py:175-183) never descends into the
        ``layerN`` Sequentials.  Exact parity with the reference.
      - ``"backbone_out"``: the truncated-backbone output — semantically the
        "last deep features" a textbook Grad-CAM would want; kept as an
        opt-in improvement over the reference quirk.
    """
    mod = get_family(family)
    if family in ("pm", "pmg"):
        from ..models.trunk import apply_trunk_from_last_conv, trunk_last_conv

        def target_feats(p, x):
            return trunk_last_conv(p["trunk"], x, spec.plan, spec.norm)

        def head_from(p, f):
            feats = apply_trunk_from_last_conv(p["trunk"], f, spec.plan, spec.norm)
            return mod.head_apply(p, feats, spec)[0]

    elif rtm_target == "stem_conv":
        from ..models import resnet

        def target_feats(p, x):
            return resnet.stem_conv(p["backbone"], x)

        def head_from(p, a):
            feats = resnet.apply_truncated_from_stem(
                p["backbone"], a, spec.truncate_after_layer
            )
            return mod.head_apply(p, feats, spec)[0]

    else:

        def target_feats(p, x):
            return mod.apply(p, x, spec, capture=("features",))[1]["features"]

        def head_from(p, f):
            return mod.head_apply(p, f, spec)[0]

    return target_feats, head_from


class Explainer:
    """Jitted Grad-CAM / IG for one (family, spec, params).

    ``rtm_target``: see :func:`gradcam_split`.
    """

    def __init__(self, family: str, spec, params, dtype=jnp.float32,
                 rtm_target: str = "stem_conv"):
        self.mod = get_family(family)
        self.spec = spec
        self.params = params
        self.dtype = dtype
        _target_feats, _head_from = gradcam_split(family, spec, rtm_target)

        @partial(jax.jit, static_argnames=("task_idx",))
        def _gradcam(params, images_u8, class_idx, task_idx):
            x = normalize_uint8(images_u8, dtype)
            feats = _target_feats(params, x)

            def head_target(f):
                lg = _head_from(params, f)
                sel = jnp.take_along_axis(
                    lg[:, task_idx, :], class_idx[:, None], axis=-1
                )
                return jnp.sum(sel)

            logits = _head_from(params, feats)
            grads = jax.grad(head_target)(feats)  # [B, h, w, C]
            w = jnp.mean(grads, axis=(1, 2), keepdims=True)
            cam = jax.nn.relu(jnp.sum(feats * w, axis=-1))  # [B, h, w]
            lo = jnp.min(cam, axis=(1, 2), keepdims=True)
            hi = jnp.max(cam, axis=(1, 2), keepdims=True)
            cam = (cam - lo) / jnp.maximum(hi - lo, 1e-7)
            return cam, logits

        self._gradcam = _gradcam

        @partial(jax.jit, static_argnames=("task_idx", "steps", "method"))
        def _intgrads(params, images_u8, class_idx, task_idx, steps, method):
            x = normalize_uint8(images_u8, dtype)
            baseline = jnp.zeros_like(x)

            def target(z):
                lg, _ = self.mod.apply(params, z, spec)
                sel = jnp.take_along_axis(
                    lg[:, task_idx, :], class_idx[:, None], axis=-1
                )
                return jnp.sum(sel)

            gfn = jax.grad(target)

            # captum's IntegratedGradients defaults to Gauss-Legendre
            # quadrature over [0,1] (method='gausslegendre', n_steps=50);
            # 'riemann_right' matches its riemann_trapezoid-free variant.
            if method == "gausslegendre":
                nodes, weights = np.polynomial.legendre.leggauss(steps)
                alphas = jnp.asarray((nodes + 1.0) / 2.0, dtype)
                wts = jnp.asarray(weights / 2.0, dtype)
            else:  # right Riemann
                alphas = jnp.arange(1, steps + 1, dtype=dtype) / steps
                wts = jnp.full((steps,), 1.0 / steps, dtype)

            def body(acc, aw):
                alpha, w = aw
                z = baseline + alpha * (x - baseline)
                return acc + w * gfn(z), None

            total, _ = jax.lax.scan(body, jnp.zeros_like(x), (alphas, wts))
            return (x - baseline) * total

        self._intgrads = _intgrads

        @jax.jit
        def _logits(params, images_u8):
            x = normalize_uint8(images_u8, dtype)
            lg, _ = self.mod.apply(params, x, spec)
            return lg

        self._logits = _logits

    # -- public ------------------------------------------------------------

    def resolve_targets(
        self, task: str, labels: Optional[np.ndarray], logits: np.ndarray,
        default_argmax: bool = True,
    ) -> np.ndarray:
        """Target class per image: GT when valid, else argmax (Grad-CAM rule,
        PMG_evaluation.py:162-166) or 0 (IG rule, PM_evaluation.py:368)."""
        ti = self.spec.tasks.names.index(task)
        k = self.spec.tasks.num_classes[ti]
        fallback = logits[:, ti, :k].argmax(-1) if default_argmax else np.zeros(
            logits.shape[0], np.int64
        )
        if labels is None:
            return fallback.astype(np.int32)
        lab = labels[:, ti]
        valid = (lab != IGNORE_INDEX) & (lab >= 0)
        return np.where(valid, lab, fallback).astype(np.int32)

    def logits(self, images_u8: np.ndarray) -> np.ndarray:
        """Plain forward [B, T, Kmax] (no gradient work) — for resolving
        Grad-CAM/IG target classes."""
        return np.asarray(self._logits(self.params, images_u8))

    def gradcam(
        self, images_u8: np.ndarray, task: str, class_idx: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(cam [B, h, w] in [0,1], logits [B, T, Kmax])."""
        ti = self.spec.tasks.names.index(task)
        cam, logits = self._gradcam(
            self.params, images_u8, jnp.asarray(class_idx), ti
        )
        return np.asarray(cam), np.asarray(logits)

    def integrated_gradients(
        self,
        images_u8: np.ndarray,
        task: str,
        class_idx: np.ndarray,
        steps: int = 50,
        method: str = "gausslegendre",
    ) -> np.ndarray:
        ti = self.spec.tasks.names.index(task)
        return np.asarray(
            self._intgrads(
                self.params, images_u8, jnp.asarray(class_idx), ti, steps, method
            )
        )


# ---------------------------------------------------------------------------
# Overlay rendering (host side)
# ---------------------------------------------------------------------------


def apply_colormap(gray: np.ndarray, cmap_name: str = "hot") -> np.ndarray:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cm = plt.get_cmap(cmap_name)
    return cm(np.clip(gray, 0, 1))[:, :, :3]


def overlay_cam(
    image_u8: np.ndarray, cam: np.ndarray, cmap: str = "hot", alpha: float = 0.45
) -> np.ndarray:
    """cam [h,w] (feature resolution) -> [H,W,3] uint8 overlay on the image."""
    import cv2

    H, W = image_u8.shape[:2]
    cam_big = cv2.resize(cam.astype(np.float32), (W, H), interpolation=cv2.INTER_LINEAR)
    heat = apply_colormap(cam_big, cmap)
    img01 = image_u8.astype(np.float32) / 255.0
    over = np.clip((1 - alpha) * img01 + alpha * heat, 0, 1)
    return (over * 255).astype(np.uint8)


def save_gradcam_batch(
    explainer: Explainer,
    images_u8: np.ndarray,
    labels: Optional[np.ndarray],
    task: str,
    out_dir: str,
    batch_idx: int = 0,
    cmap: str = "hot",
) -> None:
    """Reference-named hstack(original|overlay) dumps
    (PMG_evaluation.py:178-181 naming scheme)."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    # Plain forward for target resolution (no throwaway gradient pass).
    ti = explainer.spec.tasks.names.index(task)
    names = explainer.spec.tasks.class_names[ti]
    logits = explainer.logits(images_u8)
    targets = explainer.resolve_targets(task, labels, logits)
    cam, _ = explainer.gradcam(images_u8, task, targets)
    for i in range(images_u8.shape[0]):
        cls = int(targets[i])
        cls_name = names[cls] if 0 <= cls < len(names) else str(cls)
        over = overlay_cam(images_u8[i], cam[i], cmap)
        cat = np.hstack([images_u8[i], over])
        out = os.path.join(
            out_dir,
            f"gradcam_b{batch_idx:04d}_i{i:03d}_task-{task}_class-{cls}-{cls_name}.png",
        )
        cv2.imwrite(out, cv2.cvtColor(cat, cv2.COLOR_RGB2BGR))


def ig_heatmap(attr: np.ndarray) -> np.ndarray:
    """IG attribution [H,W,3] -> normalized magnitude heatmap [H,W] in [0,1]."""
    mag = np.abs(attr).sum(-1)
    hi = mag.max()
    return mag / hi if hi > 0 else mag
