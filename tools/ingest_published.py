#!/usr/bin/env python
"""One-command ingestion + verification of the PUBLISHED reference
checkpoints.

The reference publishes ``best_model_PM.pth`` / ``best_model_PMG.pth``
(<50 MB, /root/reference/README.md:5-6 Google Drive link); the snapshot on
this rig strips the blobs (``.MISSING_LARGE_BLOBS``), so loading the REAL
files is the one unproven link in the parity chain.  Given a downloaded
file, this tool runs every gate that can run without network access:

  1. size sanity vs the README's "<50 MB" claim,
  2. state-dict load + canonicalization (``module.`` strip, wrapper unwrap —
     engine/checkpoint.load_state_dict, mirrors Models/models_PM.py:219-224),
  3. key-manifest diff against the published ``pretrained_load_report``
     (Model_weights/PMG/hyperparameters_PMG.json:52-135) when one is found,
  4. spec build from the sidecar hparams (reference precedence,
     utils/PMG/PMG_model_utils.py:109-132) + full conversion,
  5. reverse-export round-trip: params -> export_state_dict must reproduce
     the input tensors bit-for-bit (the converter-fidelity gate,
     tests/test_checkpoint_roundtrip.py),
  6. LIVE logit gate when /root/reference + torch are importable: the
     reference model built from the same hparams, loaded with the same
     weights (strict), forwarded on a fixed probe batch, diffed against our
     converted forward at the fuzz-harness bound (rel 5e-4),
  7. a conversion report JSON (+ optional Orbax-native copy for fast
     reload).

Usage:
    python tools/ingest_published.py /path/to/best_model_PMG.pth \
        [--family pmg] [--hparams HP.json] [--tasks TASKS.json] \
        [--report OUT.json] [--save_native DIR] [--expect_max_mb 50]

Until the real weights are reachable, the tool is proven on the generated
fixture checkpoints (tests/fixtures/pmg_shipped.pth is structurally
identical to the published PMG file — same hparams, same 81-key manifest):
the opt-in parity suite runs it end-to-end
(tests/test_reference_parity.py::test_ingest_published_on_shipped_fixture).
"""

import argparse
import datetime
import inspect
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE = os.environ.get("REFERENCE_DIR", "/root/reference")

if not os.environ.get("WADT_PARITY_ON_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import wadt  # noqa: E402
from wadt.config import load_hparams, load_tasks, default_tasks_path  # noqa: E402
from wadt.engine import checkpoint  # noqa: E402
from wadt.models import get_family  # noqa: E402

wadt.config.enable_parity_precision()

REL_TOL = 5e-4  # fuzz-harness bound: f32 CPU torch vs full-precision XLA


def infer_family(path: str) -> str:
    base = os.path.basename(path).lower()
    for fam in ("pmg", "rtm", "pm"):  # pmg before pm: substring
        if fam in base:
            return fam
    raise SystemExit(
        f"cannot infer family from {base!r}; pass --family {{pm,pmg,rtm}}"
    )


def find_load_report(family: str, model_path: str, hparams_path):
    """The published key manifest, searched like sidecar hparams: explicit
    --hparams file, JSONs next to the checkpoint, then the reference's
    Model_weights copy."""
    candidates = []
    if hparams_path:
        candidates.append(hparams_path)
    d = os.path.dirname(os.path.abspath(model_path))
    candidates += [
        os.path.join(d, f"hyperparameters_{family.upper()}.json"),
        os.path.join(d, "hyperparameters.json"),
        os.path.join(
            REFERENCE, "Model_weights", family.upper(),
            f"hyperparameters_{family.upper()}.json",
        ),
    ]
    for c in candidates:
        try:
            with open(c) as f:
                j = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(j, dict) and "pretrained_load_report" in j:
            return j["pretrained_load_report"], c
    return None, None


def manifest_diff(state, report):
    """Diff the checkpoint's canonical keys against the published
    ``pretrained_load_report`` {loaded, skipped, missing} manifest."""
    have = set(state)
    want = set(report.get("loaded", []))
    return {
        "expected_keys": len(want),
        "checkpoint_keys": len(have),
        "missing_from_checkpoint": sorted(want - have),
        "unexpected_in_checkpoint": sorted(have - want),
    }


def roundtrip_check(family, state, params, spec):
    """Bit-exact reverse export (tests/test_checkpoint_roundtrip.py gate)."""
    exported = checkpoint.export_state_dict(family, params, spec)
    skip = ("num_batches_tracked",)
    lost = [k for k in state
            if k not in exported and not any(s in k for s in skip)]
    worst_key, mismatched = None, []
    for k, v in exported.items():
        if any(s in k for s in skip) or k not in state:
            continue
        a = np.asarray(v, np.float32)
        b = np.asarray(state[k], np.float32)
        if a.shape != b.shape or not np.array_equal(a, b):
            mismatched.append(k)
            worst_key = worst_key or k
    return {
        "keys_lost": lost,
        "keys_mismatched": mismatched,
        "bitexact": not lost and not mismatched,
    }


def live_reference_gate(family, state, hparams, tasks, params, spec):
    """Forward the LIVE torch reference with the published weights and diff
    logits vs our converted forward (the strongest available proof)."""
    if not os.path.isdir(REFERENCE):
        return {"ran": False, "reason": f"no reference at {REFERENCE}"}
    try:
        import torch

        sys.path.insert(0, REFERENCE)
        sys.path.insert(0, os.path.join(REPO, "tools"))
        if family == "pmg":
            from Models.models_PMG import (
                MultiTaskPatchGANGramModelNonOverlapV2 as Ref,
            )

            kw = {k: v for k, v in hparams.items()
                  if k in inspect.signature(Ref.__init__).parameters}
            # hparams without the counts (e.g. a bare training sidecar)
            # would silently build EMPTY task heads — derive from the registry
            kw.setdefault("num_classes_per_task",
                          {t: len(c) for t, c in tasks.items()})
            m = Ref(input_nc=3, **kw)
        elif family == "pm":
            from Models.models_PM import MultiTaskPatchGAN as Ref

            kw = {k: v for k, v in hparams.items()
                  if k in inspect.signature(Ref.__init__).parameters}
            counts = {t: len(c) for t, c in tasks.items()}
            m = Ref(tasks_dict=counts, input_nc=3, device="cpu", **kw)
        else:
            from make_fixtures import ResNet50
            from Models.models_RTM import MultiHeadAttentionPerTaskModel as Ref

            m = Ref(
                base_encoder=ResNet50(),
                truncate_after_layer=hparams["truncate_layer"],
                tasks=tasks,
                device="cpu",
                use_attention=hparams.get("use_attention", True),
                attn_token_dim=hparams.get("attn_token_dim", 256),
                cls_hidden_dims=list(hparams.get("cls_hidden_dims", [512])),
                cls_num_layers=hparams.get("cls_num_layers", 2),
            )
        missing, unexpected = m.load_state_dict(
            {k: torch.as_tensor(np.asarray(v)) for k, v in state.items()},
            strict=False,
        )
        missing = [k for k in missing if "num_batches_tracked" not in k]
        if missing or unexpected:
            return {"ran": True, "ok": False,
                    "missing": list(missing)[:20],
                    "unexpected": list(unexpected)[:20]}
        m.eval()
        rng = np.random.RandomState(0)
        x_nchw = rng.randn(4, 3, 224, 224).astype(np.float32) * 0.7
        with torch.no_grad():
            want = m(torch.from_numpy(x_nchw))
        mod = get_family(family)
        logits, _ = mod.apply(params, np.transpose(x_nchw, (0, 2, 3, 1)), spec)
        logits = np.asarray(logits)
        worst = 0.0
        for i, t in enumerate(spec.tasks.names):
            w = want[t].numpy()
            k = w.shape[-1]
            scale = max(1.0, float(np.abs(w).max()))
            worst = max(worst,
                        float(np.abs(logits[:, i, :k] - w).max()) / scale)
        return {"ran": True, "ok": worst <= REL_TOL,
                "logit_rel_drift": worst, "rel_tol": REL_TOL}
    except Exception as e:  # report, don't crash the ingestion
        return {"ran": False, "reason": f"{type(e).__name__}: {e}"}


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("checkpoint", help="downloaded best_model_*.pth")
    ap.add_argument("--family", choices=("pm", "pmg", "rtm"), default=None)
    ap.add_argument("--hparams", default=None, help="hparams JSON "
                    "(default: sidecar discovery next to the checkpoint, "
                    "then the reference's Model_weights copy)")
    ap.add_argument("--tasks", default=None, help="task registry JSON "
                    "(default: bundled 12-task weather registry)")
    ap.add_argument("--report", default=None,
                    help="report path (default: <ckpt>.ingest_report.json)")
    ap.add_argument("--save_native", default=None,
                    help="also save the converted params as an Orbax dir")
    ap.add_argument("--expect_max_mb", type=float, default=50.0)
    args = ap.parse_args()

    path = args.checkpoint
    if not os.path.isfile(path):
        raise SystemExit(f"no file at {path}")
    family = args.family or infer_family(path)
    size_mb = os.path.getsize(path) / 1e6

    report = {
        "date": datetime.date.today().isoformat(),
        "commit": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            capture_output=True, text=True).stdout.strip(),
        "checkpoint": os.path.abspath(path),
        "family": family,
        "size_mb": round(size_mb, 2),
        "size_ok": size_mb <= args.expect_max_mb,
    }
    if not report["size_ok"]:
        print(f"[warn] {size_mb:.1f} MB exceeds the README's "
              f"<{args.expect_max_mb:.0f} MB claim — wrong file?")

    # 2. canonical state dict
    state = checkpoint.load_state_dict(path)
    report["n_keys"] = len(state)

    # 3. key manifest vs the published load report
    lr, lr_path = find_load_report(family, path, args.hparams)
    if lr is not None:
        report["manifest"] = manifest_diff(state, lr)
        report["manifest"]["report_source"] = lr_path
        ok = (not report["manifest"]["missing_from_checkpoint"]
              and not report["manifest"]["unexpected_in_checkpoint"])
        report["manifest"]["match"] = ok
        print(f"key manifest vs {lr_path}: "
              f"{'MATCH' if ok else 'MISMATCH'} "
              f"({report['manifest']['checkpoint_keys']} keys)")
    else:
        report["manifest"] = {"match": None,
                              "note": "no pretrained_load_report found "
                                      "(the reference publishes one for PMG "
                                      "only)"}

    # 4. spec + conversion (hparams: reference sidecar precedence)
    hparams = load_hparams(args.hparams, path)
    if not hparams:
        ref_hp = os.path.join(REFERENCE, "Model_weights", family.upper(),
                              f"hyperparameters_{family.upper()}.json")
        hparams = load_hparams(ref_hp, None) if os.path.isfile(ref_hp) else {}
    if family == "pm":
        # the reference decides SE from the checkpoint itself (test_PM.py:149)
        hparams.setdefault("attn_use_se", checkpoint.checkpoint_has_se(state))
    tasks = load_tasks(args.tasks or default_tasks_path())
    counts = {t: len(c) for t, c in tasks.items()}
    declared = hparams.get("num_classes_per_task")
    if declared and dict(declared) != counts:
        report["task_counts_match"] = False
        print(f"[warn] hparams num_classes_per_task != registry: "
              f"{declared} vs {counts}")
    elif declared:
        report["task_counts_match"] = True

    mod = get_family(family)
    spec = mod.build_spec(tasks, hparams)
    params = checkpoint.convert(family, state, spec)
    report["convert_ok"] = True
    print(f"converted {len(state)} keys -> {family} params")

    # 5. bit-exact reverse export
    report["roundtrip"] = roundtrip_check(family, state, params, spec)
    print(f"reverse-export round-trip: "
          f"{'bit-exact' if report['roundtrip']['bitexact'] else 'MISMATCH'}")

    # 6. live reference logit gate
    report["live_gate"] = live_reference_gate(
        family, state, hparams, tasks, params, spec
    )
    if report["live_gate"].get("ran"):
        print(f"live reference logit gate: "
              f"{'PASS' if report['live_gate'].get('ok') else 'FAIL'} "
              f"(rel drift {report['live_gate'].get('logit_rel_drift')})")
    else:
        print(f"live reference gate skipped: "
              f"{report['live_gate'].get('reason')}")

    if args.save_native:
        checkpoint.save_native(params, args.save_native)
        report["native_copy"] = os.path.abspath(args.save_native)
        print(f"Orbax-native copy -> {args.save_native}")

    gates = [report.get("size_ok"), report["roundtrip"]["bitexact"]]
    if report["manifest"]["match"] is not None:
        gates.append(report["manifest"]["match"])
    if report["live_gate"].get("ran"):
        gates.append(report["live_gate"].get("ok"))
    report["pass"] = all(gates)

    out = args.report or path + ".ingest_report.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report -> {out}")
    print(f"ingestion: {'PASS' if report['pass'] else 'FAIL'}")
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
