"""Device-side training augmentation (jit-fused, statically shaped).

The reference ships no trainer and therefore no augmentation; this is
additive capability for the production training story (SURVEY section 2.5's
"additive" rule).  Design is TPU-first:

- Everything runs INSIDE the jitted train step on device — no host-side
  per-image Python, no dynamic shapes, so XLA fuses the whole stage into
  the stem's input pipeline.
- Randomness is ``jax.random`` keyed by the train-step counter
  (``fold_in(key, state.step)`` in ``parallel.train.make_train_step``), so
  a resumed run replays the exact augmentation schedule of the straight
  run — the trainer's exact-resume invariant survives augmentation.
- Random translation uses edge padding + per-image ``dynamic_slice`` under
  ``vmap`` (lowers to one gather): shapes stay static for the compiler and
  the batch axis stays shardable over the ``data`` mesh axis.

Augments operate on the NORMALIZED float images the train step receives
(brightness/contrast amplitudes are therefore in normalized-std units; the
geometric ops commute with per-channel normalization, so flipping after
normalize equals the conventional flip-then-normalize order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# fit()/CLI recipe for ``--augment``/``augment=True``: flip + up-to-8px
# translation + mild photometric jitter — the standard light recipe for
# 224px classification.  This dict is the ONE place the recipe lives; the
# ``augment_batch`` signature defaults are all OFF, so a partial kwargs dict
# enables exactly the knobs it names and nothing else.
DEFAULT_AUGMENT = {
    "flip": True,
    "translate": 8,
    "brightness": 0.1,
    "contrast": 0.1,
}


def augment_batch(
    key,
    images: jnp.ndarray,
    *,
    flip: bool = False,
    translate: int = 0,
    brightness: float = 0.0,
    contrast: float = 0.0,
) -> jnp.ndarray:
    """Randomly augment a normalized NHWC float batch, preserving shape/dtype.

    - ``flip``: horizontal flip with p=0.5 per image.
    - ``translate``: uniform shift in [-translate, +translate] pixels on both
      axes (edge-padded crop — no black borders leaking into the normalize
      statistics).
    - ``contrast``: per-image scale in [1-c, 1+c] around the image mean.
    - ``brightness``: per-image additive offset in [-b, b] (normalized units).

    Every knob defaults to OFF (identity): pass :data:`DEFAULT_AUGMENT` (or
    ``augment=True`` upstream) for the standard recipe, or name only the
    knobs you want.  Deterministic per ``key``.
    """
    b, h, w, c = images.shape
    kf, kt, kb, kc = jax.random.split(key, 4)
    if flip:
        do = jax.random.bernoulli(kf, 0.5, (b,))
        images = jnp.where(do[:, None, None, None], images[:, :, ::-1, :], images)
    if translate:
        pad = int(translate)
        padded = jnp.pad(
            images, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge"
        )
        off = jax.random.randint(kt, (b, 2), 0, 2 * pad + 1)
        images = jax.vmap(
            lambda img, o: jax.lax.dynamic_slice(img, (o[0], o[1], 0), (h, w, c))
        )(padded, off)
    if contrast:
        scale = jax.random.uniform(
            kc, (b, 1, 1, 1), minval=1.0 - contrast, maxval=1.0 + contrast
        ).astype(images.dtype)
        mean = jnp.mean(images, axis=(1, 2, 3), keepdims=True)
        images = (images - mean) * scale + mean
    if brightness:
        delta = jax.random.uniform(
            kb, (b, 1, 1, 1), minval=-brightness, maxval=brightness
        ).astype(images.dtype)
        images = images + delta
    return images
