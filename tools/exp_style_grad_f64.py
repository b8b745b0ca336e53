#!/usr/bin/env python
"""Adjudicate marginal style-gradient fuzz drifts against torch-f64 truth.

tools/fuzz_reference_parity.py's PMG leg diffs the style-transfer pixel
gradient (reference autograd: utils/PMG/PMG_style_transfer.py:11-59) between
torch f32 and our JAX f32 path at REL_TOL=5e-4.  On unlucky random specs the
patch-Gram loss gradient is ill-conditioned enough that f32 reassociation
alone exceeds that bound (first seen: seed 820 case #1, drift 9.15e-04 with
forward logits matching to 1e-7).  This probe settles whether such a drift
is a real divergence or shared f32 noise: it recomputes the SAME case's
gradient with the reference model cast to float64 (ground truth), then
measures BOTH f32 implementations against it.

    err(torch_f32 vs f64)  ~ err(jax_f32 vs f64)  -> reassociation noise
    err(jax_f32 vs f64)   >> err(torch_f32 vs f64) -> a real bug on our side

Usage:
    python tools/exp_style_grad_f64.py [--seed 820] [--n 5] [--index I]
"""

import argparse
import os
import random
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")

import torch  # noqa: E402

import wadt  # noqa: E402
from wadt.engine import checkpoint  # noqa: E402
from wadt.models import get_family  # noqa: E402

from fuzz_reference_parity import build_torch, sample_pmg, sample_tasks  # noqa: E402
from compare_with_reference import _stub_missing_modules  # noqa: E402

wadt.config.enable_parity_precision()


def grads_for_case(seed: int, hp: dict, tasks: dict):
    import jax.numpy as jnp

    from wadt.models.pmg import trunk_features
    from wadt.ops.gram import style_patch_grams
    from wadt.workloads.style_transfer import extract_style_grams

    _stub_missing_modules()
    from utils.PMG.PMG_style_transfer import (
        extract_patch_grams_for_image,
        patch_gram_style_loss,
    )

    m = build_torch("pmg", hp, tasks, seed)
    rng = np.random.RandomState(seed + 5)  # same stream as _style_grad_drift
    style_nchw = rng.rand(1, 3, 224, 224).astype(np.float32)
    gen_nchw = rng.rand(1, 3, 224, 224).astype(np.float32)

    def torch_grad(model, dtype):
        style_t = torch.from_numpy(style_nchw).to(dtype)
        gen_t = torch.from_numpy(gen_nchw).to(dtype).clone().requires_grad_(True)
        sg = extract_patch_grams_for_image(model, style_t, detach=True)
        gg = extract_patch_grams_for_image(model, gen_t, detach=False)
        loss = patch_gram_style_loss(gg, sg)
        loss.backward()
        return gen_t.grad.numpy()[0].astype(np.float64), float(loss.item())

    g32, l32 = torch_grad(m, torch.float32)
    g64, l64 = torch_grad(m.double(), torch.float64)

    with tempfile.TemporaryDirectory() as td:
        pth = os.path.join(td, "ckpt.pth")
        torch.save(m.float().state_dict(), pth)
        mod = get_family("pmg")
        spec = mod.build_spec(tasks, hp)
        params = checkpoint.load_torch_checkpoint("pmg", pth, spec)

    style_j = jnp.asarray(np.transpose(style_nchw, (0, 2, 3, 1)))
    gen_j = jnp.asarray(np.transpose(gen_nchw, (0, 2, 3, 1)))
    style_grams_j = extract_style_grams(params, spec, style_j)

    def loss_fn(g):
        feats = trunk_features(params, g, spec)
        grams = style_patch_grams(feats, spec.patch_div)
        return jnp.mean((grams - style_grams_j) ** 2)

    lj, gj = jax.value_and_grad(loss_fn)(gen_j)
    gjax = np.transpose(np.asarray(gj[0]), (2, 0, 1)).astype(np.float64)

    scale = max(float(np.abs(g64).max()), 1e-300)
    return {
        "err_torch_f32": float(np.abs(g32 - g64).max()) / scale,
        "err_jax_f32": float(np.abs(gjax - g64).max()) / scale,
        "err_f32_vs_f32": float(np.abs(gjax - g32).max()) / scale,
        "loss_torch_f32": l32,
        "loss_f64": l64,
        "loss_jax_f32": float(lj),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=820)
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--index", type=int, default=None,
                    help="only this case index (default: all n)")
    args = ap.parse_args()

    for i in range(args.n):
        if args.index is not None and i != args.index:
            continue
        seed = args.seed * 10000 + i
        rng = random.Random(f"pmg-{seed}")
        hp, tasks = sample_pmg(rng), sample_tasks(rng)
        r = grads_for_case(seed, hp, tasks)
        verdict = ("SHARED f32 NOISE" if r["err_jax_f32"] < 4 * r["err_torch_f32"]
                   else "OURS DIVERGES")
        print(f"[pmg #{i}] torch_f32 vs f64: {r['err_torch_f32']:.2e}  "
              f"jax_f32 vs f64: {r['err_jax_f32']:.2e}  "
              f"f32 vs f32: {r['err_f32_vs_f32']:.2e}  -> {verdict}")
        print(f"          loss f64={r['loss_f64']:.6e} "
              f"torch_f32={r['loss_torch_f32']:.6e} jax_f32={r['loss_jax_f32']:.6e}  "
              f"hp={hp}")


if __name__ == "__main__":
    main()
