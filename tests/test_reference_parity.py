"""Full-pipeline accuracy parity vs the live PyTorch reference.

Runs the reference's own loops and ours on identical data+weights and diffs
the artifacts (tools/compare_with_reference.py), covering six modes:
pmg/pm/rtm classifier eval (metrics_test.json), benchmark mode
(utils/benchmark_utils.py:16-208 `test_benchmark_folder` vs
workloads/run_benchmark — benchmark_summary.json + best_mapping.json under
both the JSON mapping and auto-mapping), folder inference
(Functions/PM_evaluation.py:189 `run_inference` — inference_results.json),
and folder predictions (Functions/PM_evaluation.py:645
`test_folder_predictions` — folder_predictions.json + all_predictions.json),
plus a randomized-architecture logit-parity fuzz
(tools/fuzz_reference_parity.py) and a randomized benchmark-mode pipeline
fuzz (tools/fuzz_benchmark_parity.py).
Slow (~3 min: the reference
evaluates eagerly on CPU) and needs /root/reference, so it is opt-in:
WADT_REFERENCE_PARITY=1 python -m pytest tests/test_reference_parity.py
"""

import os
import subprocess
import sys

import pytest

from tests.conftest import REPO

pytestmark = pytest.mark.skipif(
    os.environ.get("WADT_REFERENCE_PARITY") != "1"
    or not os.path.isdir("/root/reference"),
    reason="opt-in: set WADT_REFERENCE_PARITY=1 (requires /root/reference)",
)


def test_metrics_identical(tmp_path):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "compare_with_reference.py"),
         str(tmp_path)],
        capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "PARITY OK" in proc.stdout


def test_fuzz_benchmark_mode():
    """Randomized benchmark-MODE parity (tools/fuzz_benchmark_parity.py):
    random folder trees / mapping JSONs / tiny specs, the reference's
    test_benchmark_folder vs workloads/run_benchmark on identical weights,
    best_mapping.json + benchmark_summary.json + artifact names diffed under
    both mapping legs, with exact-Fraction tie adjudication for auto-map."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "fuzz_benchmark_parity.py"),
         "--n", "2", "--seed", "11"],
        capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "BENCHMARK FUZZ PARITY OK" in proc.stdout


def test_fuzz_eval_mode():
    """Randomized classifier-eval parity (tools/fuzz_eval_parity.py):
    random test sets (missing-label patterns, thresholds, tiny specs),
    the reference's eval loops vs workloads/evaluate, metric artifacts
    diffed with rank-instability gates on PMG AUCs."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "fuzz_eval_parity.py"),
         "--n", "2", "--seed", "9"],
        capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "EVAL FUZZ PARITY OK" in proc.stdout


def test_fuzz_random_architectures():
    """Randomized-spec logit parity (tools/fuzz_reference_parity.py): random
    valid architectures per family, reference state_dict through our
    converter, logits diffed.  A small fixed-seed slice here; run the tool
    directly with a fresh --seed for a wider hunt."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "fuzz_reference_parity.py"),
         "--n", "3", "--seed", "7"],
        capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "FUZZ PARITY OK" in proc.stdout


def test_fuzz_style_grad_f64_adjudication():
    """Regression pin for fuzz seed 820 case pmg#1 (group-norm trunk,
    patch_size=70): its style-transfer pixel gradient is intrinsically
    ill-conditioned in f32 — ulp-level forward rounding is amplified >1e4x
    by the loss curvature, so NO pure-f32 implementation can meet the 5e-4
    tolerance (torch-f32 only does via its CPU kernels' double
    accumulators; analysis in tools/exp_style_grad_conditioning.py).  The
    harness must adjudicate such marginal drifts against f64 ground truth
    (both implementations agree to ~5e-15 there) and pass the case."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "fuzz_reference_parity.py"),
         "--families", "pmg", "--n", "2", "--seed", "820"],
        capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "FUZZ PARITY OK" in proc.stdout
    # the adjudication path must actually have run (case #1 drifts 9.2e-04
    # in f32) and resolved it as conditioning, not a parity break
    assert "adjudicated" in proc.stdout and "f32 conditioning" in proc.stdout


def test_ingest_published_on_shipped_fixture(tmp_path):
    """tools/ingest_published.py — the one-command published-checkpoint
    ingestion — must PASS end-to-end on tests/fixtures/pmg_shipped.pth,
    which is structurally identical to the published best_model_PMG.pth
    (same hparams, same 81-key manifest as pretrained_load_report): key
    manifest MATCH, strict convert, bit-exact reverse export, and the live
    reference logit gate.  The real <50 MB blobs are unreachable on this
    rig; given a downloaded file this same command is the proof."""
    report = tmp_path / "ingest_report.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "ingest_published.py"),
         os.path.join(REPO, "tests", "fixtures", "pmg_shipped.pth"),
         "--report", str(report)],
        capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    import json

    rec = json.loads(report.read_text())
    assert rec["pass"] is True
    assert rec["manifest"]["match"] is True
    assert rec["roundtrip"]["bitexact"] is True
    assert rec["live_gate"]["ok"] is True
