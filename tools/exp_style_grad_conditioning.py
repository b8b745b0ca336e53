#!/usr/bin/env python
"""Conditioning analysis of the fuzz seed-820 case-1 style-gradient drift.

tools/fuzz_reference_parity.py seed 820 case pmg#1 (ndf=32, GROUP norm,
patch_size=70 -> 3 doubling blocks, trunk out 3x3) showed style-gradient
drift 9.15e-04 vs torch-f32 while forward logits matched to 1e-7.  This
probe pins down why, on the 2-block sub-chain whose input gradient already
diverges (loss = mean(conv2(lrelu(gn1(conv1 x)))**2)):

1. OUR MATH IS EXACT: jax-f64 gradient == torch-f64 to ~1e-15.
2. Every f32 VJP STAGE is accurate: feeding each stage's f32 vjp the exact
   f64 primal+cotangent gives <= 3e-7 error (conv1/gn1/lrelu1/conv2).
3. The error is FORWARD-PRIMAL AMPLIFICATION: f32 primals (rel err ~9e-7)
   + an exact f64 backward reproduce the full 3.3e-02 error; f64 primals +
   f32 backward give 2.6e-07.  The loss curvature amplifies ulp-level
   forward rounding by >1e4.
4. torch-f32 escapes (4.7e-07) only because its CPU norm kernels accumulate
   in DOUBLE (at::acc_type<float, CPU>=double), i.e. its f32 "forward" is
   the correctly-rounded f64 result.  Its own f32-vs-f64 drift at a
   gn-output tap is 1.7e-03 — same conditioning, exposed.

Consequence: no pure-f32 implementation can reliably meet REL_TOL=5e-4 on
such specs; the fuzz adjudicates marginal style-grad drifts against f64
ground truth instead (fuzz_reference_parity._style_grad_drift).  Note the
reference itself CANNOT build group-norm PMG models (GroupNorm arg-order
defect, models_PMG.py:103); this path exists only under the fuzz's
intent-shim.
"""

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
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

import wadt  # noqa: E402
from wadt.engine import checkpoint  # noqa: E402
from wadt.models import get_family  # noqa: E402
from wadt.ops.nn import conv2d, conv_accum, leaky_relu  # noqa: E402
from wadt.ops.norms import apply_norm  # noqa: E402

from fuzz_reference_parity import build_torch, sample_pmg, sample_tasks  # noqa: E402

SEED = 820 * 10000 + 1
rng = random.Random(f"pmg-{SEED}")
hp, tasks = sample_pmg(rng), sample_tasks(rng)
m = build_torch("pmg", hp, tasks, SEED)
rs = np.random.RandomState(SEED + 5)
_ = rs.rand(1, 3, 224, 224)  # style image (same stream position as the fuzz)
gen_nchw = rs.rand(1, 3, 224, 224).astype(np.float32)

with tempfile.TemporaryDirectory() as td:
    pth = os.path.join(td, "ckpt.pth")
    torch.save(m.state_dict(), pth)
    mod = get_family("pmg")
    spec = mod.build_spec(tasks, hp)
    params = checkpoint.load_torch_checkpoint("pmg", pth, spec)

layers = list(m.feature_extractor.children())
p0, p1 = params["trunk"][0], params["trunk"][1]
b0, b1 = spec.plan[0], spec.plan[1]

# torch f64 truth for the 2-block sub-chain
mm = m.to(torch.float64)
x = torch.from_numpy(gen_nchw).to(torch.float64).clone().requires_grad_(True)
out = x
for layer in layers[:4]:
    out = layer(out)
(out ** 2).mean().backward()
torch64 = np.transpose(x.grad.numpy()[0], (1, 2, 0))[None]  # NHWC


def stages(dtype):
    cast = lambda t: jax.tree_util.tree_map(lambda a: jnp.asarray(np.asarray(a), dtype), t)
    q0, q1 = cast(p0), cast(p1)
    return [
        ("conv1", lambda g: conv2d(g, q0["conv"], stride=b0.stride, padding=b0.pad)),
        ("gn1", lambda a: apply_norm(a, q0["norm"], spec.norm)),
        ("lrelu1", lambda a: leaky_relu(a, 0.2)),
        ("conv2", lambda a: conv2d(a, q1["conv"], stride=b1.stride, padding=b1.pad)),
    ]


def forward(dtype):
    prim = [jnp.asarray(np.transpose(gen_nchw, (0, 2, 3, 1)), dtype)]
    for _, f in stages(dtype):
        prim.append(f(prim[-1]))
    return prim


def backward(prims, dtype):
    prims = [p.astype(dtype) for p in prims]
    ct = jax.grad(lambda y: jnp.mean(y ** 2))(prims[-1])
    for (_, f), prim in zip(reversed(stages(dtype)), reversed(prims[:-1])):
        _, vjp = jax.vjp(f, prim)
        ct = vjp(ct)[0]
    return np.asarray(ct, np.float64)


with conv_accum(None):
    prim64 = forward(jnp.float64)
    prim32 = forward(jnp.float32)
    truth = backward(prim64, jnp.float64)
    scale = np.abs(truth).max()

    print(f"(1) jax-f64 vs torch-f64:      {np.abs(truth - torch64).max()/scale:.2e}"
          "   <- our math is exact")

    # (2) per-stage f32 vjp with exact f64 inputs
    ct64 = [jax.grad(lambda y: jnp.mean(y ** 2))(prim64[-1])]
    for (_, f), prim in zip(reversed(stages(jnp.float64)), reversed(prim64[:-1])):
        _, vjp = jax.vjp(f, prim)
        ct64.append(vjp(ct64[-1])[0])
    ct64 = list(reversed(ct64))
    for i, (name, f) in enumerate(stages(jnp.float32)):
        _, vjp = jax.vjp(f, prim64[i].astype(jnp.float32))
        got = np.asarray(vjp(ct64[i + 1].astype(jnp.float32))[0], np.float64)
        tr = np.asarray(ct64[i])
        print(f"(2) stage {name:6s} f32 vjp err:  "
              f"{np.abs(got - tr).max()/np.abs(tr).max():.2e}")

    for tag, prims, bdt in [("(3) f32 fwd + f64 bwd", prim32, jnp.float64),
                            ("    f64 fwd + f32 bwd", prim64, jnp.float32),
                            ("    all-f32 (observed)", prim32, jnp.float32)]:
        got = backward(prims, bdt)
        print(f"{tag}:     {np.abs(got - truth).max()/scale:.2e}")
