"""Patch-Gram style transfer — the reference's one gradient-optimization loop
(utils/PMG/PMG_style_transfer.py:11-106).

Semantics preserved exactly:
- style signature = per-patch Grams of the PMG trunk's features using the
  style path's *unpadded* unfold split (ops/gram.style_patch_grams — NOT the
  model's padded split; see that docstring),
- the generated image is raw pixels in [0,1] fed straight into the trunk
  WITHOUT ImageNet normalization (reference :81-86 initializes rand/0.5 and
  never applies the transform to the generated tensor),
- loss = mean over patches of MSE between Gram matrices (:51-59),
- Adam on pixels, early stop at ``target_loss``, final clamp to [0,1].

TPU-native: the whole (forward + backward + Adam update) is ONE jitted step;
the reference pays a Python-level optimizer step plus ``retain_graph=True``
re-backwards per iteration.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from PIL import Image

from ..models import pmg
from ..ops.gram import style_patch_grams


def extract_style_grams(params, spec: pmg.Spec, img_norm: jnp.ndarray) -> jnp.ndarray:
    """Style image (already transform-normalized, NHWC [1,...]) -> target
    Grams [1, Np, C, C] from trunk features."""
    feats = pmg.trunk_features(params, img_norm, spec)
    return style_patch_grams(feats, spec.patch_div)


def run_patch_gram_style_transfer(
    params,
    spec: pmg.Spec,
    style_img_norm: np.ndarray,
    num_iterations: int = 300,
    lr: float = 0.05,
    init_type: str = "noise",
    target_loss: float = 1e-3,
    seed: int = 0,
    log_every: int = 50,
) -> Tuple[Image.Image, float, int]:
    """Optimize a generated image to match the style image's patch-Gram
    signature.  Returns (PIL image, final_loss, iterations_run)."""
    style_img_norm = jnp.asarray(style_img_norm[:1])
    style_grams = extract_style_grams(params, spec, style_img_norm)

    shape = style_img_norm.shape
    if init_type == "noise":
        gen = jax.random.uniform(jax.random.PRNGKey(seed), shape, jnp.float32)
    else:
        gen = jnp.full(shape, 0.5, jnp.float32)

    opt = optax.adam(lr)
    opt_state = opt.init(gen)

    def loss_fn(g):
        feats = pmg.trunk_features(params, g, spec)
        grams = style_patch_grams(feats, spec.patch_div)
        return jnp.mean((grams - style_grams) ** 2)

    @jax.jit
    def step(g, s):
        loss, grad = jax.value_and_grad(loss_fn)(g)
        updates, s = opt.update(grad, s)
        return optax.apply_updates(g, updates), s, loss

    loss_val = float("inf")
    it = 0
    for it in range(1, num_iterations + 1):
        gen, opt_state, loss = step(gen, opt_state)
        loss_val = float(loss)
        if log_every and it % log_every == 0:
            print(f"[{it}/{num_iterations}] style loss = {loss_val:.6f}")
        if loss_val < target_loss:
            print(f"Target style loss reached: {loss_val:.6f} < {target_loss}")
            break

    out = np.asarray(jnp.clip(gen, 0.0, 1.0))[0]
    img = Image.fromarray((out * 255).astype(np.uint8))
    return img, loss_val, it


def style_transfer_composite(
    original: Image.Image, generated: Image.Image, size: int = 256
) -> Image.Image:
    """Side-by-side original|generated at ``size`` px (test_PMG.py:173-177)."""
    left = original.resize((size, size), Image.LANCZOS)
    right = generated.resize((size, size), Image.LANCZOS)
    combined = Image.new("RGB", (size * 2, size))
    combined.paste(left, (0, 0))
    combined.paste(right, (size, 0))
    return combined
