#!/usr/bin/env python
"""Generate golden parity fixtures by RUNNING the PyTorch reference.

This script imports the reference repo (read-only at /root/reference) to build
randomly-initialized torch models for each family/config, and freezes:

  tests/fixtures/<case>.pth   — the torch state_dict (input to our converter)
  tests/fixtures/<case>.npz   — input images + golden per-task logits (+ aux)
  tests/fixtures/<case>.json  — family, hparams, task registry

The test suite (tests/test_parity.py) then loads the .pth through the
framework's converter and asserts logits match — end-to-end converter + model
numerics, with no torch or reference code needed at test time.

Run once on a machine with the reference checked out:
    python tools/make_fixtures.py
"""

import json
import os
import sys

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("REFERENCE_DIR", "/root/reference")
OUT = os.path.join(REPO, "tests", "fixtures")

sys.path.insert(0, REFERENCE)

from Models.models_PM import MultiTaskPatchGAN  # noqa: E402
from Models.models_PMG import MultiTaskPatchGANGramModelNonOverlapV2  # noqa: E402
from Models.models_RTM import MultiHeadAttentionPerTaskModel  # noqa: E402

with open(os.path.join(REPO, "configs", "tasks.json")) as f:
    FULL_TASKS = json.load(f)

TASKS_3 = {k: FULL_TASKS[k] for k in ["Weather Type", "Visibility", "Glare or Reflections"]}


# ----------------------------------------------------------------------------
# Plain-torch ResNet-50 with torchvision's exact module layout & state-dict
# keys (torchvision is not installed here; RTM only needs the children order:
# conv1, bn1, relu, maxpool, layer1..layer4, avgpool, fc).
# ----------------------------------------------------------------------------
import torch.nn as nn


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet50(nn.Module):
    def __init__(self):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, 3)
        self.layer2 = self._make_layer(128, 4, stride=2)
        self.layer3 = self._make_layer(256, 6, stride=2)
        self.layer4 = self._make_layer(512, 3, stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(2048, 1000)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [Bottleneck(self.inplanes, planes) for _ in range(blocks - 1)]
        return nn.Sequential(*layers)


def randomize_bn_stats(model, seed):
    """Give BatchNorms non-trivial running stats so parity actually tests them."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm2d,)):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) * 1.5 + 0.2)


def gradcam_reference(model, trunk_module, x_nchw, task, class_idx,
                      return_raw=False):
    """Manual Grad-CAM with pytorch_grad_cam's algorithm: hook the LAST
    Conv2d of the trunk, weights = spatial mean of d(logit)/d(act),
    cam = relu(sum_c w_c act_c), per-image min-max normalized.

    ``return_raw=True`` also returns the pre-normalization CAM and a
    cancellation-free magnitude bound (max |act| * max mean|grad| * C) so
    callers (the parity fuzz) can detect DEGENERATE cams — where the
    class-gradient channel sum cancels to ~0 and min-max normalization
    divides float noise by float noise — without re-running the torch
    forward/backward."""
    convs = [l for l in trunk_module if isinstance(l, nn.Conv2d)]
    acts = {}
    h = convs[-1].register_forward_hook(lambda m, i, o: acts.__setitem__("a", o))
    try:
        x = torch.from_numpy(x_nchw).requires_grad_(True)
        out = model(x)[task]
        sel = out.gather(1, torch.as_tensor(class_idx)[:, None]).sum()
        grads = torch.autograd.grad(sel, acts["a"])[0]
    finally:
        h.remove()
    w = grads.mean(dim=(2, 3), keepdim=True)
    raw = torch.relu((acts["a"] * w).sum(1)).detach().numpy()
    lo = raw.min(axis=(1, 2), keepdims=True)
    hi = raw.max(axis=(1, 2), keepdims=True)
    cam = (raw - lo) / np.maximum(hi - lo, 1e-7)
    if not return_raw:
        return cam
    bound = float(
        acts["a"].detach().abs().max()
        * grads.abs().mean(dim=(2, 3)).max()
        * acts["a"].shape[1])
    return cam, raw, bound


def make_input(seed, batch=2, size=224):
    rng = np.random.RandomState(seed)
    return rng.randn(batch, 3, size, size).astype(np.float32) * 0.7


def save_case(name, family, hparams, tasks, model, x_nchw, aux=None):
    model.eval()
    with torch.no_grad():
        out = model(torch.from_numpy(x_nchw))
    arrays = {"input": x_nchw}
    for t, v in out.items():
        arrays[f"logits/{t}"] = v.numpy()
    for k, v in (aux or {}).items():
        arrays[k] = v
    torch.save(model.state_dict(), os.path.join(OUT, f"{name}.pth"))
    np.savez_compressed(os.path.join(OUT, f"{name}.npz"), **arrays)
    with open(os.path.join(OUT, f"{name}.json"), "w") as f:
        json.dump({"family": family, "hparams": hparams, "tasks": tasks}, f, indent=2)
    n = sum(p.numel() for p in model.parameters())
    print(f"[{name}] params={n:,} tasks={len(tasks)} saved")


def main():
    os.makedirs(OUT, exist_ok=True)

    # ---------------- PMG ----------------
    shipped = {
        "ndf": 32, "patch_size": 64, "patch_div": 3, "gram_channels": 96,
        "d_model": 192, "transformer_layers": 2, "transformer_heads": 4,
        "norm": "batch", "use_token_attention": True, "use_channel_attention": False,
    }
    torch.manual_seed(0)
    m = MultiTaskPatchGANGramModelNonOverlapV2(
        input_nc=3,
        num_classes_per_task={t: len(c) for t, c in FULL_TASKS.items()},
        **{k: v for k, v in shipped.items()},
    )
    randomize_bn_stats(m, 100)
    x = make_input(1)
    # Also freeze the style-transfer trunk patch-grams for this input.
    # NOTE: the style path (utils/PMG/PMG_style_transfer.py:25-48) splits via
    # unpadded torch.unfold — floor-divided patch size, edge pixels DROPPED —
    # unlike the model's replicate-padded _split_patches.  We freeze the
    # reference's exact numbers here (cannot import that module: it pulls in
    # torchvision, absent in this env), computed with the same unfold calls.
    m.eval()
    with torch.no_grad():
        feats = m.feature_extractor(torch.from_numpy(x[0:1]))
    _, C, H, W = feats.shape
    ph, pw = H // m.patch_div, W // m.patch_div
    p = feats.unfold(2, ph, ph).unfold(3, pw, pw)
    nH, nW = p.size(2), p.size(3)
    p = p.permute(0, 1, 2, 4, 3, 5).reshape(1, C, nH * nW, ph, pw)
    p = p.permute(0, 2, 1, 3, 4).contiguous().reshape(1, nH * nW, C, ph * pw)
    grams = [p[0, i] @ p[0, i].t() / float(ph * pw) for i in range(nH * nW)]
    aux = {"style_grams": torch.stack(grams).numpy()}
    save_case("pmg_shipped", "pmg", shipped, FULL_TASKS, m, x, aux)

    pmg_tiny = {
        "ndf": 16, "patch_size": 16, "patch_div": 4, "gram_channels": 32,
        "d_model": 64, "transformer_layers": 1, "transformer_heads": 2,
        "norm": "instance", "use_token_attention": True, "use_channel_attention": True,
    }
    torch.manual_seed(2)
    m = MultiTaskPatchGANGramModelNonOverlapV2(
        input_nc=3,
        num_classes_per_task={t: len(c) for t, c in TASKS_3.items()},
        **pmg_tiny,
    )
    x3 = make_input(3)
    m.eval()
    task0 = list(TASKS_3)[0]
    cam = gradcam_reference(m, m.feature_extractor, x3, task0, [0, 1])
    save_case("pmg_tiny_instance_se", "pmg", pmg_tiny, TASKS_3, m, x3,
              {"gradcam/task": np.array(task0), "gradcam/classes": np.array([0, 1]),
               "gradcam/cam": cam})

    pmg_notx = {
        "ndf": 16, "patch_size": 64, "patch_div": 2, "gram_channels": 24,
        "d_model": 48, "transformer_layers": 0, "transformer_heads": 4,
        "norm": "batch", "use_token_attention": False, "use_channel_attention": False,
    }
    torch.manual_seed(4)
    m = MultiTaskPatchGANGramModelNonOverlapV2(
        input_nc=3,
        num_classes_per_task={t: len(c) for t, c in TASKS_3.items()},
        **pmg_notx,
    )
    randomize_bn_stats(m, 104)
    save_case("pmg_no_transformer", "pmg", pmg_notx, TASKS_3, m, make_input(5))

    # three strided layers (patch_size=256 -> rf 256/64/16/4) + final 1x1
    pmg_deep = {
        "ndf": 8, "patch_size": 256, "patch_div": 2, "gram_channels": 16,
        "d_model": 32, "transformer_layers": 1, "transformer_heads": 2,
        "norm": "batch", "use_token_attention": True, "use_channel_attention": False,
    }
    torch.manual_seed(6)
    m = MultiTaskPatchGANGramModelNonOverlapV2(
        input_nc=3,
        num_classes_per_task={t: len(c) for t, c in TASKS_3.items()},
        **pmg_deep,
    )
    randomize_bn_stats(m, 106)
    save_case("pmg_deep_plan", "pmg", pmg_deep, TASKS_3, m, make_input(7))

    # ---------------- PM ----------------
    def pm_case(name, seed, hp, tasks):
        torch.manual_seed(seed)
        m = MultiTaskPatchGAN(
            tasks_dict={t: len(c) for t, c in tasks.items()},
            input_nc=3, device="cpu",
            ndf=hp["ndf"], norm=hp["norm"], patch_size=hp["patch_size"],
            attn_tau=hp["attn_tau"], attn_use_se=hp["attn_use_se"],
            attn_softmax_spatial=hp["attn_softmax_spatial"],
            ablate_attention=hp["ablate_attention"],
        )
        if hp["norm"] == "batch":
            randomize_bn_stats(m, seed + 100)
        xs = make_input(seed + 50)
        # Freeze attention maps + task embeddings too (return_full contract,
        # models_PM.py:183-187).
        m.eval()
        aux = {}
        with torch.no_grad():
            full = m(torch.from_numpy(xs), return_full=True)
            feats = m.trunk(torch.from_numpy(xs))
            for t, d in full.items():
                aux[f"attn/{t}"] = d["attn"].numpy()
                A = d["attn"]
                num = (feats * A).sum(dim=(2, 3))  # [B, C]
                den = A.sum(dim=(2, 3)) + 1e-6  # [B, 1]
                aux[f"task_emb/{t}"] = (num / den).numpy()
        task0 = list(tasks)[0]
        aux["gradcam/task"] = np.array(task0)
        aux["gradcam/classes"] = np.array([0, 1])
        aux["gradcam/cam"] = gradcam_reference(m, m.trunk, xs, task0, [0, 1])
        save_case(name, "pm", hp, tasks, m, xs, aux)

    base_pm = {
        "ndf": 16, "norm": "instance", "patch_size": 32, "attn_tau": 0.7,
        "attn_use_se": True, "attn_softmax_spatial": True, "ablate_attention": False,
    }
    pm_case("pm_small", 10, base_pm, TASKS_3)
    # default patch_size=70 -> FOUR strided layers + final (deep-plan path)
    pm_case("pm_deep_plan", 14, {**base_pm, "ndf": 8, "patch_size": 70}, TASKS_3)
    pm_case("pm_batchnorm_sigmoid", 11,
            {**base_pm, "norm": "batch", "attn_softmax_spatial": False}, TASKS_3)
    pm_case("pm_no_se", 12, {**base_pm, "attn_use_se": False}, TASKS_3)
    pm_case("pm_ablate", 13, {**base_pm, "ablate_attention": True}, TASKS_3)

    # ---------------- RTM ----------------
    def rtm_case(name, seed, hp, tasks):
        torch.manual_seed(seed)
        enc = ResNet50()
        m = MultiHeadAttentionPerTaskModel(
            base_encoder=enc,
            truncate_after_layer=hp["truncate_layer"],
            tasks=tasks, device="cpu",
            use_attention=hp["use_attention"],
            attn_token_dim=hp["attn_token_dim"],
            cls_hidden_dims=list(hp["cls_hidden_dims"]),
            cls_num_layers=hp["cls_num_layers"],
        )
        randomize_bn_stats(m, seed + 100)
        xs = make_input(seed + 50)
        m.eval()
        with torch.no_grad():
            _, task_emb, shared = m(
                torch.from_numpy(xs),
                return_task_embeddings=True, return_shared_embedding=True,
            )
        aux = {"shared_embedding": shared.numpy()}
        for t, v in task_emb.items():
            aux[f"task_emb/{t}"] = v.numpy()
        # Shipped RTM Grad-CAM quirk: the reversed() scan over
        # truncated_encoder's TOP-LEVEL children (RTM_evaluation.py:175-183)
        # skips the layerN Sequentials and lands on the stem conv1 — the
        # only top-level nn.Conv2d, which is exactly what gradcam_reference
        # selects when given the truncated_encoder as the module list.
        task0 = list(tasks)[0]
        aux["gradcam/task"] = np.array(task0)
        aux["gradcam/classes"] = np.array([0, 1])
        aux["gradcam/cam"] = gradcam_reference(
            m, m.truncated_encoder, xs, task0, [0, 1]
        )
        save_case(name, "rtm", hp, tasks, m, xs, aux)

    rtm_case("rtm_trunc5_attn", 20, {
        "truncate_layer": 5, "use_attention": True, "attn_token_dim": 64,
        "cls_hidden_dims": (32,), "cls_num_layers": 1,
    }, TASKS_3)
    # default attn_token_dim=None -> d == C (the reference's default head)
    rtm_case("rtm_trunc5_default_dim", 22, {
        "truncate_layer": 5, "use_attention": True, "attn_token_dim": None,
        "cls_hidden_dims": (), "cls_num_layers": 0,
    }, TASKS_3)
    rtm_case("rtm_trunc6_gap", 21, {
        "truncate_layer": 6, "use_attention": False, "attn_token_dim": None,
        "cls_hidden_dims": (), "cls_num_layers": 0,
    }, TASKS_3)

    print("done ->", OUT)


if __name__ == "__main__":
    main()
