#!/usr/bin/env python
"""Randomized-architecture parity fuzz vs the live PyTorch reference.

The golden fixtures (tools/make_fixtures.py) pin a dozen hand-picked specs.
This tool samples RANDOM valid architectures per family — trunk depth via
patch_size/truncation, every norm flavor (batch/instance/group), head
options, and task registries with uneven class counts — builds the torch
reference model (Models/models_{PM,PMG,RTM}.py), pushes its randomly
initialized state_dict through our checkpoint converter, and diffs logits on
random inputs.  PMG cases additionally diff the style-transfer LOSS and
pixel GRADIENT against the reference's own autograd
(PMG_style_transfer.py:11-59) — the one optimization loop's math.  It probes the spec-arithmetic / layout / padding edge cases
(channel-doubling loop boundaries, replicate-pad patch grids, stacked-head
class padding, packed-qkv splits at odd d_model) that fixed fixtures cannot
cover exhaustively.

Runs on CPU (relay-proof) like tools/compare_with_reference.py; set
WADT_PARITY_ON_TPU=1 to opt back into the attached device.

Usage:
    python tools/fuzz_reference_parity.py [--n 6] [--seed 0] \
        [--families pmg,pm,rtm]

Exits non-zero on any divergence beyond tolerance.
"""

import argparse
import os
import random
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# The reference checkout location is controlled by REFERENCE_DIR, consumed
# by make_fixtures (imported below), which sys.path-inserts it.
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if not os.environ.get("WADT_PARITY_ON_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import torch  # noqa: E402

import wadt  # noqa: E402
from wadt.engine import checkpoint  # noqa: E402
from wadt.models import get_family  # noqa: E402

# Reuse make_fixtures' reference imports + the plain-torch ResNet-50 clone
# (torchvision is absent here; the clone reproduces its module layout).
from make_fixtures import (  # noqa: E402
    ResNet50,
    gradcam_reference,
    randomize_bn_stats,
    MultiTaskPatchGAN,
    MultiTaskPatchGANGramModelNonOverlapV2,
    MultiHeadAttentionPerTaskModel,
)

wadt.config.enable_parity_precision()

# f32 CPU torch vs full-precision XLA: reassociation-level drift only.  The
# bound is relative to the logit scale (random deep trunks with randomized
# BN stats can produce large-magnitude logits).
REL_TOL = 5e-4


def sample_tasks(rng: random.Random):
    """1-5 tasks with UNEVEN class counts (2-7) — exercises the stacked-head
    kmax padding and per-task class masks."""
    n_tasks = rng.randint(1, 5)
    return {
        f"Fuzz Task {i}": [f"class_{i}_{j}" for j in range(rng.randint(2, 7))]
        for i in range(n_tasks)
    }


def sample_pmg(rng: random.Random):
    norm = rng.choice(["batch", "instance", "group"])
    # GroupNorm(num_groups=32) needs every trunk channel divisible by 32
    # (models_PMG.py:103); channels are ndf, 2ndf, ... so constrain ndf.
    ndf = rng.choice([32, 64]) if norm == "group" else rng.choice([8, 16, 24, 32, 64])
    heads = rng.choice([1, 2, 4])
    patch_size = rng.choice([16, 40, 64, 70, 128, 256])
    # Trunk output H for 224 input: k4 s4 p0 convs while rf>4 and filters<=512.
    h, rf, filters = 224, patch_size, ndf
    while rf > 4 and filters <= 512:
        h, rf, filters = (h - 4) // 4 + 1, rf / 4, filters * 2
    patch_div = rng.randint(2, min(5, max(2, h)))
    return {
        "ndf": ndf,
        "norm": norm,
        "patch_size": patch_size,
        "patch_div": patch_div,
        "gram_channels": rng.choice([16, 24, 32, 64, 96]),
        "d_model": heads * rng.choice([16, 24, 48, 64]),
        "transformer_layers": rng.randint(0, 3),
        "transformer_heads": heads,
        "use_token_attention": rng.random() < 0.8,
        "use_channel_attention": rng.random() < 0.5,
    }


def sample_pm(rng: random.Random):
    return {
        "ndf": rng.choice([8, 16, 32, 64]),
        "norm": rng.choice(["instance", "batch"]),
        # >140 would shrink the 224 input below the final k4 s1 conv.
        "patch_size": rng.choice([16, 32, 70, 140]),
        "attn_tau": rng.choice([0.5, 0.7, 1.0]),
        "attn_use_se": rng.random() < 0.7,
        "attn_softmax_spatial": rng.random() < 0.7,
        "ablate_attention": rng.random() < 0.2,
    }


def sample_rtm(rng: random.Random):
    n_hidden = rng.randint(0, 2)
    return {
        "truncate_layer": rng.randint(3, 8),
        "use_attention": rng.random() < 0.75,
        "attn_token_dim": rng.choice([None, 16, 48, 64]),
        "cls_hidden_dims": tuple(rng.choice([16, 32, 64]) for _ in range(n_hidden)),
        "cls_num_layers": rng.randint(0, n_hidden),
    }


class _IntendedGroupNorm(torch.nn.GroupNorm):
    """REFERENCE DEFECT (found by this fuzz): models_PMG.py:103 builds
    ``functools.partial(nn.GroupNorm, num_groups=32)`` and then calls
    ``norm_layer(num_filters)`` — the positional arg collides with the
    ``num_groups`` kwarg (GroupNorm's first positional IS num_groups), so
    every ``norm="group"`` PMG crashes at construction in the reference.
    This shim reorders to the evident intent, GroupNorm(32, num_channels),
    so our ``ops/norms.group_norm`` still gets live-torch parity coverage."""

    def __init__(self, num_channels, num_groups=32, **kw):
        super().__init__(num_groups, num_channels, **kw)


def build_torch(family: str, hp: dict, tasks: dict, seed: int):
    torch.manual_seed(seed)
    counts = {t: len(c) for t, c in tasks.items()}
    if family == "pmg":
        import Models.models_PMG as ref_pmg

        saved = ref_pmg.nn.GroupNorm
        ref_pmg.nn.GroupNorm = _IntendedGroupNorm
        try:
            m = MultiTaskPatchGANGramModelNonOverlapV2(
                input_nc=3, num_classes_per_task=counts, **hp
            )
        finally:
            ref_pmg.nn.GroupNorm = saved
    elif family == "pm":
        m = MultiTaskPatchGAN(tasks_dict=counts, input_nc=3, device="cpu", **hp)
    else:
        torch.manual_seed(seed)  # encoder and wrapper share the stream
        m = MultiHeadAttentionPerTaskModel(
            base_encoder=ResNet50(),
            truncate_after_layer=hp["truncate_layer"],
            tasks=tasks,
            device="cpu",
            use_attention=hp["use_attention"],
            attn_token_dim=hp["attn_token_dim"],
            cls_hidden_dims=list(hp["cls_hidden_dims"]),
            cls_num_layers=hp["cls_num_layers"],
        )
    randomize_bn_stats(m, seed + 1)
    m.eval()
    return m


def _rel_drift(got, want) -> float:
    want = np.asarray(want)
    scale = max(1.0, float(np.abs(want).max()))
    return float(np.abs(np.asarray(got) - want).max()) / scale


def _aux_drift(family: str, m, mod, params, spec, x_nchw, x_nhwc) -> float:
    """Capture-tap parity beyond logits: PM attention maps + attention-
    weighted task embeddings (models_PM.py:183-187 return_full contract),
    RTM shared/task embeddings (models_RTM.py:113-118), PMG style-transfer
    patch grams (PMG_style_transfer.py:25-48 unpadded-unfold semantics)."""
    worst = 0.0
    if family == "pm":
        with torch.no_grad():
            full = m(torch.from_numpy(x_nchw), return_full=True)
            feats = m.trunk(torch.from_numpy(x_nchw))
        _, aux = mod.apply(params, x_nhwc, spec,
                           capture=("attn", "task_embeddings"))
        attn, emb = np.asarray(aux["attn"]), np.asarray(aux["task_embeddings"])
        for i, task in enumerate(spec.tasks.names):
            A = full[task]["attn"]
            worst = max(worst, _rel_drift(attn[:, i], A.numpy()[:, 0]))
            num = (feats * A).sum(dim=(2, 3))
            den = A.sum(dim=(2, 3)) + 1e-6
            worst = max(worst, _rel_drift(emb[:, i], (num / den).numpy()))
    elif family == "rtm":
        with torch.no_grad():
            _, temb, shared = m(
                torch.from_numpy(x_nchw),
                return_task_embeddings=True, return_shared_embedding=True,
            )
        _, aux = mod.apply(params, x_nhwc, spec,
                           capture=("shared_embedding", "task_embeddings"))
        worst = _rel_drift(aux["shared_embedding"], shared.numpy())
        emb = np.asarray(aux["task_embeddings"])
        for i, task in enumerate(spec.tasks.names):
            worst = max(worst, _rel_drift(emb[:, i], temb[task].numpy()))
    else:  # pmg: style grams via the reference's unpadded torch.unfold math
        from wadt.models.pmg import trunk_features
        from wadt.ops.gram import style_patch_grams

        with torch.no_grad():
            feats = m.feature_extractor(torch.from_numpy(x_nchw[:1]))
        _, C, H, W = feats.shape
        ph, pw = H // m.patch_div, W // m.patch_div
        p = feats.unfold(2, ph, ph).unfold(3, pw, pw)
        nH, nW = p.size(2), p.size(3)
        p = p.permute(0, 1, 2, 4, 3, 5).reshape(1, C, nH * nW, ph, pw)
        p = p.permute(0, 2, 1, 3, 4).contiguous().reshape(1, nH * nW, C, ph * pw)
        want = np.stack([
            (p[0, i] @ p[0, i].t() / float(ph * pw)).numpy()
            for i in range(nH * nW)
        ])
        got = np.asarray(
            style_patch_grams(trunk_features(params, x_nhwc[:1], spec),
                              spec.patch_div)
        )[0]
        worst = _rel_drift(got, want)
    return worst


def _mutate_rtm_keys(sd, schema: str):
    """Rewrite an RTM state dict into one of the reference's accepted
    checkpoint key schemas (Functions/RTM_evaluation.py:545-620):
    ``module.``-prefixed (DataParallel), ``backbone.<root>`` names, or raw
    torchvision root names."""
    from wadt.engine.checkpoint import _SEQ_TO_NAME

    out = {}
    for k, v in sd.items():
        if k.startswith("truncated_encoder.") and schema in ("backbone", "raw"):
            seq, _, tail = k[len("truncated_encoder."):].partition(".")
            name = _SEQ_TO_NAME[int(seq)]
            out[f"{name}.{tail}" if schema == "raw" else f"backbone.{name}.{tail}"] = v
        elif schema == "module":
            out[f"module.{k}"] = v
        else:
            out[k] = v
    return out


def _gradcam_drift(family, m, spec, params, x_nchw, x_nhwc, tasks) -> float:
    """Grad-CAM parity per random spec: the reference's target layer is the
    last top-level Conv2d found by a reversed scan (the last trunk conv for
    PM/PMG at ANY random depth, the stem conv1 for RTM — the scan never
    enters the layerN Sequentials).  gradcam_split must land on the same
    layer and reproduce the normalized CAM."""
    import jax
    import jax.numpy as jnp

    from wadt.workloads.explain import gradcam_split

    trunk = {"pm": getattr(m, "trunk", None),
             "pmg": getattr(m, "feature_extractor", None),
             "rtm": getattr(m, "truncated_encoder", None)}[family]
    task0 = list(tasks)[0]
    cls = [0, min(1, len(tasks[task0]) - 1)]
    # Raw (pre-normalization) torch CAM + its cancellation-free magnitude
    # bound, to detect DEGENERATE cams: when the class-gradient channel sum
    # cancels to ~0 (common for 2-class heads summing both class grads),
    # the per-image min-max normalization divides float noise by float
    # noise and the map is unverifiable — skip the normalized diff there.
    want, raw_t, bound = gradcam_reference(
        m, trunk, x_nchw, task0, cls, return_raw=True)

    target_feats, head_from = gradcam_split(family, spec)
    feats = target_feats(params, jnp.asarray(x_nhwc))
    ti = spec.tasks.names.index(task0)
    cls_j = jnp.asarray(np.asarray(cls, np.int32))

    def head_target(f):
        lg = head_from(params, f)
        return jnp.sum(jnp.take_along_axis(lg[:, ti, :], cls_j[:, None], axis=-1))

    grads = jax.grad(head_target)(feats)
    w = jnp.mean(grads, axis=(1, 2), keepdims=True)
    raw = np.asarray(jax.nn.relu(jnp.sum(feats * w, axis=-1)))

    if raw_t.max() < 1e-2 * bound:  # degenerate: cam cancels below noise
        # Symmetric check with hysteresis: ours must also be near the noise
        # floor, but under a LOOSER ceiling (1e-1 vs 1e-2) so reassociation
        # drift on an already-cancelled sum can't trip a false failure.
        assert raw.max() < 1e-1 * bound, \
            f"torch cam ~0 ({raw_t.max():.1e} of bound {bound:.1e}) but ours isn't ({raw.max():.1e})"
        return 0.0
    lo = raw.min(axis=(1, 2), keepdims=True)
    hi = raw.max(axis=(1, 2), keepdims=True)
    cam = (raw - lo) / np.maximum(hi - lo, 1e-7)
    drift = float(np.abs(cam - want).max())
    if raw_t.max() < 5e-2 * bound and drift <= 5e-2:
        # Near-degenerate band: the CAM survives the 1e-2 gate but is still
        # mostly cancelled, so min-max normalization amplifies float noise
        # beyond the strict 5e-3 tolerance on unlucky seeds.  Accept a
        # looser 5e-2 there instead of failing on noise (a REAL mismatch —
        # wrong layer, wrong algorithm — shows drift ~O(1), still caught).
        return 0.0
    return drift


def _style_grad_once(m, params, spec, seed: int, f64: bool):
    """One style-loss + pixel-gradient evaluation of both implementations.

    Returns (torch_grad CHW, jax_grad CHW, torch_loss, jax_loss), computed
    in f32 (the parity comparison proper) or in f64 (the ground-truth
    adjudication leg — ``m`` is cast to double and restored, jax runs under
    ``jax_enable_x64`` with f64-cast params)."""
    import contextlib

    import jax
    import jax.numpy as jnp

    from compare_with_reference import _stub_missing_modules
    from wadt.models.pmg import trunk_features
    from wadt.ops.gram import style_patch_grams
    from wadt.ops.nn import conv_accum
    from wadt.workloads.style_transfer import extract_style_grams

    _stub_missing_modules()  # PMG_style_transfer imports torchvision
    from utils.PMG.PMG_style_transfer import (
        extract_patch_grams_for_image,
        patch_gram_style_loss,
    )

    rng = np.random.RandomState(seed + 5)
    style_nchw = rng.rand(1, 3, 224, 224).astype(np.float32)
    gen_nchw = rng.rand(1, 3, 224, 224).astype(np.float32)
    tdtype = torch.float64 if f64 else torch.float32

    try:
        mm = m.double() if f64 else m
        style_t = torch.from_numpy(style_nchw).to(tdtype)
        gen_t = torch.from_numpy(gen_nchw).to(tdtype).clone().requires_grad_(True)
        style_grams_t = extract_patch_grams_for_image(mm, style_t, detach=True)
        grams_gen = extract_patch_grams_for_image(mm, gen_t, detach=False)
        loss_t = patch_gram_style_loss(grams_gen, style_grams_t)
        loss_t.backward()
        want_grad = gen_t.grad.numpy()[0].astype(np.float64)  # CHW
    finally:
        if f64:
            m.float()  # f32->f64->f32 roundtrip is exact

    @contextlib.contextmanager
    def _x64():
        if not f64:
            yield
            return
        import jax as _jax

        _jax.config.update("jax_enable_x64", True)
        try:
            # conv2d pins preferred_element_type=f32; unpin so the f64 leg
            # really accumulates in f64 (gram einsums adapt via _accum_dtype)
            with conv_accum(None):
                yield
        finally:
            _jax.config.update("jax_enable_x64", False)

    jdtype = np.float64 if f64 else np.float32
    with _x64():
        jparams = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a, jdtype)), params
        ) if f64 else params
        style_j = jnp.asarray(np.transpose(style_nchw, (0, 2, 3, 1)).astype(jdtype))
        gen_j = jnp.asarray(np.transpose(gen_nchw, (0, 2, 3, 1)).astype(jdtype))
        style_grams_j = extract_style_grams(jparams, spec, style_j)

        def loss_fn(g):
            feats = trunk_features(jparams, g, spec)
            grams = style_patch_grams(feats, spec.patch_div)
            return jnp.mean((grams - style_grams_j) ** 2)

        loss_j, grad_j = jax.value_and_grad(loss_fn)(gen_j)
        got_grad = np.transpose(np.asarray(grad_j[0]), (2, 0, 1)).astype(np.float64)

    return want_grad, got_grad, float(loss_t.item()), float(loss_j)


def _style_grad_drift(m, params, spec, seed: int) -> float:
    """Style-transfer OPTIMIZATION parity (PMG only): the loss value and the
    pixel gradient of the patch-Gram style loss must match the reference's
    autograd (utils/PMG/PMG_style_transfer.py:11-59 extract_patch_grams_for_
    image + patch_gram_style_loss — imported and run, not reimplemented).
    Gradient drift is scaled to the gradient's own magnitude.

    Marginal drifts are ADJUDICATED against f64 ground truth: the style
    gradient of some random specs is intrinsically ill-conditioned in f32 —
    ulp-level forward rounding is amplified >1e4x by the loss curvature
    (first seen at fuzz seed 820 case 1, a group-norm trunk: drift 9.2e-04
    while torch-f32 matched f64 only thanks to its CPU kernels' double
    accumulators; our composition is semantically exact — jax-f64 == torch-
    f64 to 1.4e-15, tools/exp_style_grad_conditioning.py).  When the f32
    drift is above tolerance but both f64 implementations agree to 1e-9,
    the divergence is f32 conditioning, not a parity break — accept it up
    to a 5e-2 cap (a REAL mismatch shows up in f64 and at O(1))."""
    want_grad, got_grad, loss_t, loss_j = _style_grad_once(
        m, params, spec, seed, f64=False
    )
    loss_drift = _rel_drift(loss_j, loss_t)
    gscale = max(float(np.abs(want_grad).max()), 1e-12)
    grad_drift = float(np.abs(got_grad - want_grad).max()) / gscale
    drift = max(loss_drift, grad_drift)
    if REL_TOL < drift <= 5e-2:
        w64, g64, lt64, lj64 = _style_grad_once(m, params, spec, seed, f64=True)
        s64 = max(float(np.abs(w64).max()), 1e-12)
        err64 = max(float(np.abs(g64 - w64).max()) / s64, _rel_drift(lj64, lt64))
        if err64 < 1e-9:
            print(f"    [style-grad] f32 drift {drift:.2e} adjudicated: "
                  f"f64 implementations agree to {err64:.1e} -> f32 "
                  f"conditioning, not a parity break")
            return 0.0
        print(f"    [style-grad] f32 drift {drift:.2e} and f64 err {err64:.2e} "
              f"-> REAL divergence")
    return drift


def _trees_equal(a, b) -> bool:
    import jax

    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return len(leaves_a) == len(leaves_b) and all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(leaves_a, leaves_b)
    )


def run_case(family: str, hp: dict, tasks: dict, seed: int) -> float:
    m = build_torch(family, hp, tasks, seed)
    rng = np.random.RandomState(seed + 2)
    x_nchw = rng.randn(2, 3, 224, 224).astype(np.float32) * 0.7
    x_nhwc = np.transpose(x_nchw, (0, 2, 3, 1))
    with torch.no_grad():
        want = {t: v.numpy() for t, v in m(torch.from_numpy(x_nchw)).items()}

    with tempfile.TemporaryDirectory() as td:
        pth = os.path.join(td, "ckpt.pth")
        torch.save(m.state_dict(), pth)
        mod = get_family(family)
        spec = mod.build_spec(tasks, hp)
        params = checkpoint.load_torch_checkpoint(family, pth, spec)
        if family == "rtm":
            # every accepted key schema must convert to the SAME pytree
            for schema in ("module", "backbone", "raw"):
                torch.save(_mutate_rtm_keys(m.state_dict(), schema), pth)
                p2 = checkpoint.load_torch_checkpoint(family, pth, spec)
                if not _trees_equal(params, p2):
                    raise AssertionError(f"key schema {schema!r} converts differently")

    logits, _ = mod.apply(params, x_nhwc, spec)
    logits = np.asarray(logits)
    worst = 0.0
    for i, task in enumerate(spec.tasks.names):
        got = logits[:, i, : want[task].shape[1]]
        worst = max(worst, _rel_drift(got, want[task]))
    worst = max(worst, _aux_drift(family, m, mod, params, spec, x_nchw, x_nhwc))
    if family == "pmg":
        worst = max(worst, _style_grad_drift(m, params, spec, seed))
    cam_drift = _gradcam_drift(family, m, spec, params, x_nchw, x_nhwc, tasks)
    if cam_drift > 5e-3:  # CAMs are per-image min-max normalized to [0,1]
        raise AssertionError(f"gradcam drift {cam_drift:.2e} > 5e-3")
    return worst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6, help="draws per family")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--families", default="pmg,pm,rtm")
    ap.add_argument("--record", action="store_true",
                    help="append a pass record to results/fuzz_parity.json")
    args = ap.parse_args()

    samplers = {"pmg": sample_pmg, "pm": sample_pm, "rtm": sample_rtm}
    failures, cases = [], 0
    for family in args.families.split(","):
        family = family.strip()
        for i in range(args.n):
            seed = args.seed * 10000 + i
            rng = random.Random(f"{family}-{seed}")
            hp, tasks = samplers[family](rng), sample_tasks(rng)
            try:
                drift = run_case(family, hp, tasks, seed)
                status = "ok" if drift <= REL_TOL else "FAIL"
            except Exception as e:  # converter/build crash = a real finding
                drift, status = float("nan"), f"ERROR {type(e).__name__}: {e}"
            print(f"[{family} #{i}] drift={drift:.2e} {status}  hp={hp} "
                  f"tasks={ {t: len(c) for t, c in tasks.items()} }", flush=True)
            cases += 1
            if status != "ok":
                failures.append((family, i, hp, status))

    if args.record:
        from fuzz_record import record

        path = record("arch", seed=args.seed, n=args.n,
                      families=args.families, cases=cases, skips=0, ties=0,
                      failed=len(failures))
        print(f"recorded -> {path}")
    if failures:
        print(f"FUZZ PARITY FAILED: {len(failures)} case(s)")
        return 1
    print("FUZZ PARITY OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
