"""Unit tests for the parity-harness diff helpers (tools/).

These helpers are the load-bearing comparison layer of the live
reference-parity gate and the fuzz harnesses; a helper that silently
passes on corrupt input would turn every "identical" verdict into noise,
so each one gets a negative control here.  Pure functions — no
/root/reference, no torch model builds, safe for the always-on CPU suite.
"""

import json
import os

import numpy as np
import pytest

from tests.conftest import REPO

import sys

sys.path.insert(0, os.path.join(REPO, "tools"))


# --------------------------------------------------------------------------
# _diff_json (compare_with_reference)
# --------------------------------------------------------------------------


def _diff(a, b, atol=1e-6):
    from compare_with_reference import _diff_json

    fails = []
    _diff_json(a, b, "r", fails, atol)
    return fails


def test_diff_json_tolerant_and_strict():
    assert _diff({"x": 1.0}, {"x": 1.0 + 1e-9}) == []
    assert _diff({"x": 1.0}, {"x": 1.1}) != []
    assert _diff({"x": [1, 2]}, {"x": [1, 2, 3]}) != []  # length
    assert _diff({"x": {"y": 1}}, {"x": {"z": 1}}) != []  # key set


def test_diff_json_none_bool_nan_semantics():
    # None is not 0; bools compare strictly (no float tolerance);
    # NaN==NaN passes, NaN vs number fails
    assert _diff({"x": None}, {"x": 0.0}) != []
    assert _diff({"x": True}, {"x": False}) != []
    assert _diff({"x": True}, {"x": 1.0000001}) != []  # no atol for bools
    assert _diff({"x": float("nan")}, {"x": float("nan")}) == []
    assert _diff({"x": float("nan")}, {"x": 0.0}) != []


# --------------------------------------------------------------------------
# CSV comparators (compare_with_reference)
# --------------------------------------------------------------------------


def _write(path, text):
    with open(path, "w") as f:
        f.write(text)
    return str(path)


def test_compare_summary_csv_detects_corruption(tmp_path):
    from compare_with_reference import compare_summary_csv

    hdr = "task,accuracy,roc_png\n"
    a = _write(tmp_path / "a.csv", hdr + "T,0.5,/ref/roc.png\n")
    ok = _write(tmp_path / "b.csv", hdr + "T,0.5,/ours/roc.png\n")
    assert compare_summary_csv(a, ok) == []  # path column excluded
    bad_val = _write(tmp_path / "c.csv", hdr + "T,0.6,/ours/roc.png\n")
    assert compare_summary_csv(a, bad_val) != []
    short_row = _write(tmp_path / "d.csv", hdr + "T,0.5\n")
    assert compare_summary_csv(a, short_row) != []  # no zip truncation
    assert compare_summary_csv(a, str(tmp_path / "missing.csv")) != []


def test_compare_roc_csvs_detects_corruption(tmp_path):
    from compare_with_reference import compare_roc_csvs

    ref = tmp_path / "ref"
    ours = tmp_path / "ours"
    ref.mkdir()
    ours.mkdir()
    rows = "curve_type,class_name,fpr,tpr\nclass,sun,0.0,1.0\n"
    _write(ref / "T_roc_data.csv", rows)
    _write(ours / "T_roc_data.csv", rows)
    assert compare_roc_csvs(str(ref), str(ours)) == []
    _write(ours / "T_roc_data.csv", rows.replace("1.0", "0.9"))
    assert compare_roc_csvs(str(ref), str(ours)) != []
    os.remove(ours / "T_roc_data.csv")
    assert compare_roc_csvs(str(ref), str(ours)) != []


# --------------------------------------------------------------------------
# Exact-Fraction auto-map scorer (fuzz_benchmark_parity) — must agree with
# the production float scorer, since it adjudicates auto-map ties.
# --------------------------------------------------------------------------


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="fuzz module imports the reference at load time")
def test_exact_macro_f1_matches_float_scorer():
    pytest.importorskip("torch")  # fuzz module imports torch at top level
    from fuzz_benchmark_parity import exact_macro_f1

    from wadt.workloads.benchmark import _batch_macro_f1

    rng = np.random.RandomState(0)
    for _ in range(20):
        M, B = rng.randint(2, 6), rng.randint(2, 5)
        C = rng.randint(0, 15, size=(M, B))
        vec = rng.randint(0, B, size=M)
        exact = float(exact_macro_f1(C, list(vec)))
        approx = float(_batch_macro_f1(C, vec[None, :])[0])
        assert abs(exact - approx) < 1e-12


def test_fuzz_record_appends_and_caps(tmp_path, monkeypatch):
    import fuzz_record

    monkeypatch.setattr(fuzz_record, "RECORD_PATH",
                        str(tmp_path / "fuzz_parity.json"))
    for i in range(15):
        fuzz_record.record("toolx", seed=i, n=1, families="pmg", cases=3,
                           skips=0, ties=0, failed=0)
    doc = json.load(open(tmp_path / "fuzz_parity.json"))
    assert len(doc["toolx"]) == fuzz_record._KEEP
    assert doc["toolx"][-1]["seed"] == 14
    assert doc["toolx"][-1]["status"] == "pass"


def test_wrong_family_checkpoint_names_the_right_one(tmp_path):
    """Loading a checkpoint with the wrong --family must say which family
    the key schema actually matches, not raise a bare KeyError."""
    import jax

    from wadt.engine import checkpoint
    from wadt.models import pmg, rtm

    spec = pmg.build_spec({"A": ["a", "b"]},
                          dict(ndf=8, patch_size=64, patch_div=2,
                               gram_channels=16, d_model=32,
                               transformer_layers=0))
    params = pmg.init(jax.random.PRNGKey(0), spec)
    pth = str(tmp_path / "w.pth")
    checkpoint.save_torch_checkpoint("pmg", params, spec, pth)
    assert checkpoint.sniff_family(checkpoint.load_state_dict(pth)) == "pmg"
    rspec = rtm.build_spec({"A": ["a", "b"]},
                           dict(truncate_layer=5, use_attention=False))
    with pytest.raises(ValueError, match="matches PMG"):
        checkpoint.load_torch_checkpoint("rtm", pth, rspec)


def test_gram_f64_accumulation_for_adjudication():
    """The fuzz's f64 adjudication leg (fuzz_reference_parity._style_grad_
    once) runs the gram einsums on f64 inputs; ops/gram._accum_dtype must
    then accumulate in f64 (not the pinned-f32 MXU path) or the "ground
    truth" would be quietly rounded.  f32/bf16 inputs keep f32 accumulation
    — the measured TPU behavior the A/B records were taken under."""
    import jax
    import jax.numpy as jnp

    from wadt.ops.gram import patch_grams, style_patch_grams, _accum_dtype

    assert _accum_dtype(jnp.zeros((1,), jnp.float32)) == jnp.float32
    assert _accum_dtype(jnp.zeros((1,), jnp.bfloat16)) == jnp.float32

    x32 = np.random.RandomState(0).randn(1, 6, 6, 4).astype(np.float32)
    jax.config.update("jax_enable_x64", True)
    try:
        x64 = jnp.asarray(x32.astype(np.float64))
        assert _accum_dtype(x64) == jnp.float64
        for fn in (style_patch_grams, patch_grams):
            g64 = fn(x64, 2)
            assert g64.dtype == jnp.float64
            # numpy f64 reference for the style split (no padding at 6%2==0)
            np.testing.assert_allclose(
                np.asarray(g64), np.asarray(fn(jnp.asarray(x32), 2), np.float64),
                rtol=1e-6)
    finally:
        jax.config.update("jax_enable_x64", False)
