#!/usr/bin/env python
"""Checkpoint inspector: key manifest, family detection, architecture probes.

Prints what the reference records in ``pretrained_load_report``
(hyperparameters_PMG.json:52-135) plus the introspection its loaders perform
(SE probe, backbone prefix form, transformer depth, inferred hparams).

Usage: python tools/inspect_checkpoint.py <ckpt.pth|ckpt.npz> [--json]
"""

import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def detect_family(keys):
    if any(k.startswith("feature_extractor.") for k in keys):
        return "pmg"
    if any(k.startswith("trunk.") or k.startswith("task_heads.") for k in keys):
        return "pm"
    if any(k.startswith(("truncated_encoder.", "attentions.", "backbone.",
                         "layer1.")) for k in keys):
        return "rtm"
    return "unknown"


def infer_pmg_hparams(state):
    """Recover buildable hparams from tensor shapes (mirrors what
    checkpoint_has_se-style introspection does for PM)."""
    h = {}
    if "feature_extractor.0.weight" in state:
        w0 = state["feature_extractor.0.weight"]
        h["ndf"] = int(w0.shape[0])
        h["kernel"] = int(w0.shape[-1])
    if "chan_proj.weight" in state:
        h["gram_channels"] = int(state["chan_proj.weight"].shape[0])
    if "token_proj.weight" in state:
        d, tin = state["token_proj.weight"].shape
        h["d_model"] = int(d)
        h["token_dim_in"] = int(tin)
    h["transformer_layers"] = len(
        {k.split(".")[3] for k in state if k.startswith("transformer.encoder.layers.")}
    )
    tasks = {}
    for k in state:
        if k.startswith("classifiers.") and k.endswith(".weight"):
            tasks[k[len("classifiers."):-len(".weight")]] = int(state[k].shape[0])
    h["num_classes_per_task"] = tasks
    return h


def main():
    from wadt.engine.checkpoint import checkpoint_has_se, load_state_dict

    path = sys.argv[1]
    as_json = "--json" in sys.argv
    state = load_state_dict(path)
    keys = list(state)
    family = detect_family(keys)
    groups = defaultdict(lambda: [0, 0])
    for k, v in state.items():
        root = k.split(".")[0]
        groups[root][0] += 1
        groups[root][1] += int(getattr(v, "size", 0))
    total = sum(int(getattr(v, "size", 0)) for v in state.values())

    report = {
        "path": path,
        "family_guess": family,
        "num_tensors": len(keys),
        "total_params": total,
        "approx_size_mb": round(total * 4 / 1e6, 1),
        "has_se": checkpoint_has_se(state),
        "groups": {g: {"tensors": c, "params": p} for g, (c, p) in sorted(groups.items())},
    }
    if family == "pmg":
        report["inferred_hparams"] = infer_pmg_hparams(state)
    if as_json:
        print(json.dumps(report, indent=2))
        return
    print(f"{path}: {family} checkpoint, {len(keys)} tensors, "
          f"{total:,} params (~{report['approx_size_mb']} MB f32)")
    print(f"  SE probe (.se.mlp.): {report['has_se']}")
    for g, d in report["groups"].items():
        print(f"  {g:>24}: {d['tensors']:3d} tensors, {d['params']:>10,} params")
    if "inferred_hparams" in report:
        print("  inferred hparams:", json.dumps(report["inferred_hparams"]))


if __name__ == "__main__":
    main()
