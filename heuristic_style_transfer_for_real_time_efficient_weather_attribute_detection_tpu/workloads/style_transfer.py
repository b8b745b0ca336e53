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

TPU-native: the optimization runs as a device-side ``lax.while_loop``
(forward + backward + Adam + early-stop test all on device), dispatched once
per ``log_every`` chunk — the reference pays a Python-level optimizer step
plus ``retain_graph=True`` re-backwards per iteration, and a naive JAX port
would pay one host round-trip per iteration just to test ``target_loss``.
A batched entry point optimizes a whole folder of style images in one loop,
freezing each image the iteration after its own loss crosses the target, so
every image's trajectory is identical to a solo run.
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


def run_patch_gram_style_transfer_batch(
    params,
    spec: pmg.Spec,
    style_imgs_norm: np.ndarray,
    num_iterations: int = 300,
    lr: float = 0.05,
    init_type: str = "noise",
    target_loss: float = 1e-3,
    seed: int = 0,
    log_every: int = 50,
    seed_offset: int = 0,
) -> Tuple[list, np.ndarray, np.ndarray]:
    """Optimize one generated image per style image, all in ONE device loop.

    Per-image semantics match the reference exactly (PMG_style_transfer.py:89-98):
    each iteration computes the loss at the current pixels, applies the Adam
    step, and stops the first time its own loss drops below ``target_loss``
    (the final step IS applied, as in the reference's post-step ``break``).
    Images that finish early are frozen (their updates masked) while the rest
    continue — Adam is elementwise and the per-image losses are independent,
    so each trajectory is identical to running that image alone.

    Returns (list of PIL images, final per-image losses [B], iterations [B]).
    """
    style = jnp.asarray(style_imgs_norm, jnp.float32)
    style_grams = extract_style_grams(params, spec, style)  # [B, Np, C, C]
    batch = style.shape[0]

    if init_type == "noise":
        # one key per image, folded on its GLOBAL index (seed_offset + i):
        # the same image gets the same noise whether it runs solo, in a
        # different chunk, or at a different position within the batch
        keys = jax.vmap(
            lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i)
        )(jnp.arange(seed_offset, seed_offset + batch))
        gen = jax.vmap(
            lambda k: jax.random.uniform(k, style.shape[1:], jnp.float32)
        )(keys)
    else:
        gen = jnp.full(style.shape, 0.5, jnp.float32)

    opt = optax.adam(lr)
    opt_state = opt.init(gen)

    def per_image_loss(g):
        feats = pmg.trunk_features(params, g, spec)
        grams = style_patch_grams(feats, spec.patch_div)
        return jnp.mean((grams - style_grams) ** 2, axis=(1, 2, 3))  # [B]

    def chunk(carry, it_end, target):
        # while any image is live and the global iteration budget remains:
        # one fused fwd+bwd+Adam+mask step per trip, entirely on device.
        def cond(c):
            g, s, it, loss, iters = c
            return (it < it_end) & jnp.any(loss >= target)

        def summed_loss(x):
            li = per_image_loss(x)
            return li.sum(), li

        def body(c):
            g, s, it, loss, iters = c
            live = (loss >= target)[:, None, None, None].astype(g.dtype)
            (_, li), grad = jax.value_and_grad(summed_loss, has_aux=True)(g)
            updates, s = opt.update(grad, s)
            g = optax.apply_updates(g, jax.tree.map(lambda u: u * live, updates))
            iters = iters + (loss >= target).astype(jnp.int32)
            return g, s, it + 1, jnp.where(loss >= target, li, loss), iters

        return jax.lax.while_loop(cond, body, carry)

    run_chunk = jax.jit(chunk)

    loss_vec = jnp.full((batch,), jnp.inf, jnp.float32)
    iters_vec = jnp.zeros((batch,), jnp.int32)
    carry = (gen, opt_state, jnp.zeros((), jnp.int32), loss_vec, iters_vec)
    step_size = log_every if log_every and log_every > 0 else num_iterations
    it_host = 0
    while it_host < num_iterations:
        it_end = min(it_host + step_size, num_iterations)
        carry = run_chunk(carry, jnp.int32(it_end), jnp.float32(target_loss))
        it_host = int(carry[2])
        losses = np.asarray(carry[3])
        if log_every:
            print(
                f"[{it_host}/{num_iterations}] style loss = "
                f"{float(np.max(losses)):.6f} (worst of {batch})"
            )
        if bool(np.all(losses < target_loss)):
            print(
                f"Target style loss reached: {float(np.max(losses)):.6f} "
                f"< {target_loss}"
            )
            break

    gen = np.asarray(jnp.clip(carry[0], 0.0, 1.0))
    images = [
        Image.fromarray((gen[i] * 255).astype(np.uint8)) for i in range(batch)
    ]
    return images, np.asarray(carry[3]), np.asarray(carry[4])


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
    seed_offset: int = 0,
) -> Tuple[Image.Image, float, int]:
    """Optimize a generated image to match the style image's patch-Gram
    signature.  Returns (PIL image, final_loss, iterations_run).
    ``seed_offset`` reproduces a specific image's noise init from a batched
    run (its global index there)."""
    images, losses, iters = run_patch_gram_style_transfer_batch(
        params, spec, np.asarray(style_img_norm)[:1],
        num_iterations=num_iterations, lr=lr, init_type=init_type,
        target_loss=target_loss, seed=seed, log_every=log_every,
        seed_offset=seed_offset,
    )
    return images[0], float(losses[0]), int(iters[0])


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
