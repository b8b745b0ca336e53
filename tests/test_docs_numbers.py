"""Doc-rot guard: every quoted headline number in README.md / CLAUDE.md /
docs/BENCHMARKING.md / docs/TRAINING.md must match its checked-in results/
artifact (round-3 verdict: the README cited roofline/sweep numbers that no
artifact contained; round-4 verdict: CLAUDE.md's hand-maintained matrix and
BENCHMARKING's regime quotes were unguarded).

Each claim is a regex with one or more capture groups anchored to the prose
around the number.  A missing match FAILS: if the wording changes, update the
claim here in the same commit — that is the point of the guard.
"""

import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _art(name):
    with open(os.path.join(REPO, "results", name)) as f:
        return json.load(f)


def _num(s):
    return float(s.replace(",", ""))


def _doc(name):
    with open(os.path.join(REPO, name)) as f:
        return f.read()


# (doc, description, regex, expected-values fn, rel tolerance)
# Tolerances are loose where the doc rounds (~473,000 vs 473,283.4) and tight
# where it quotes the artifact verbatim.
CLAIMS = [
    (
        "README.md",
        "throughput table: PMG f32/bf16 img/s",
        r"\| PMG \|[^|]*\| \*\*~([\d,]+) img/s\*\* \| ~([\d,]+) img/s",
        lambda: [
            _art("bench_matrix.json")["pmg_f32"]["images_per_sec"],
            _art("bench_matrix.json")["pmg_bf16"]["images_per_sec"],
        ],
        0.02,
    ),
    (
        "README.md",
        "throughput table: PM f32/bf16 img/s",
        r"\| PM \|[^|]*\| ~([\d,]+) img/s \| ~([\d,]+) img/s",
        lambda: [
            _art("bench_matrix.json")["pm_f32"]["images_per_sec"],
            _art("bench_matrix.json")["pm_bf16"]["images_per_sec"],
        ],
        0.02,
    ),
    (
        "README.md",
        "throughput table: RTM f32/bf16 img/s",
        r"\| RTM \|[^|]*\| ~([\d,]+) img/s \| ~([\d,]+) img/s",
        lambda: [
            _art("bench_matrix.json")["rtm_f32"]["images_per_sec"],
            _art("bench_matrix.json")["rtm_bf16"]["images_per_sec"],
        ],
        0.02,
    ),
    (
        "README.md",
        "throughput table: per-frame stream latencies (PMG/PM/RTM)",
        r"\| PMG \|[^|\n]*\|[^|\n]*\|[^|\n]*\| \*\*([\d.]+) µs\*\*.*?"
        r"\| PM \|[^|\n]*\|[^|\n]*\|[^|\n]*\| ~([\d.]+) µs.*?"
        r"\| RTM \|[^|\n]*\|[^|\n]*\|[^|\n]*\| \*\*([\d.]+) µs\*\*",
        lambda: [
            _art("bench_floor.json")["stream_floor_us"]["pmg"],
            _art("bench_floor.json")["stream_floor_us"]["pm"],
            _art("bench_floor.json")["stream_floor_us"]["rtm"],
        ],
        0.01,
    ),
    (
        "README.md",
        "RTM bf16 lever vs floors",
        r"\+72%, ([\d,]+) → ([\d,]+) img/s",
        lambda: [
            _art("bench_floor.json")["floors"]["rtm_f32"],
            _art("bench_floor.json")["floors"]["rtm_bf16"],
        ],
        0.01,
    ),
    (
        "README.md",
        "RTM roofline utilizations at batch 128",
        r"rtm_f32's XLA bytes estimate\s*sits at ([\d.]+)× the v5e's 819 GB/s "
        r"HBM peak and rtm_bf16 at ([\d.]+)\s*single-dispatch — and at "
        r"([\d.]+) in the sustained regime",
        lambda: [
            _art("roofline.json")["configs"]["rtm_f32_b128"]["hbm_utilization"],
            _art("roofline.json")["configs"]["rtm_bf16_b128"]["hbm_utilization"],
            _art("roofline.json")["configs"]["rtm_bf16_b128"]["sustained"][
                "hbm_utilization"],
        ],
        0.015,
    ),
    (
        "README.md",
        "PM bf16 MXU utilization",
        r"PM bf16 batch is MXU-bound \(roofline: (?:[\d.]+ TF/s aggregate = )?([\d.]+) of\s*(?:the\s*)?peak",
        lambda: [
            _art("roofline.json")["configs"]["pm_bf16_b256"]["mxu_utilization"],
        ],
        0.01,
    ),
    (
        "README.md",
        "train-step throughput f32 (PMG/PM/RTM)",
        r"\*\*([\d,]+) img/s\*\* for PMG \(batch 256\), ([\d,]+) for PM \(batch 128[^)]*\)\s*and ([\d,]+) for RTM",
        lambda: [
            _art("bench_train.json")["pmg"]["train_images_per_sec"],
            _art("bench_train.json")["pm"]["train_images_per_sec"],
            _art("bench_train.json")["rtm"]["train_images_per_sec"],
        ],
        0.01,
    ),
    (
        "README.md",
        "train-step throughput bf16 (PMG/PM/RTM)",
        r"\*\*([\d,]+) / ([\d,]+) / ([\d,]+) img/s\*\*",
        lambda: [
            _art("bench_train.json")["pmg_bf16"]["train_images_per_sec"],
            _art("bench_train.json")["pm_bf16"]["train_images_per_sec"],
            _art("bench_train.json")["rtm_bf16"]["train_images_per_sec"],
        ],
        0.01,
    ),
    (
        "README.md",
        "PMG raw-layout headline img/s",
        r"the raw-layout headline \(([\d,]+) img/s, `bench\.py --layout raw`\)",
        lambda: [
            _art("bench_matrix.json")["pmg_f32_raw"]["images_per_sec"],
        ],
        0.02,
    ),
    (
        "README.md",
        "scan-chunk vs per-batch RTM bf16 img/s",
        r"measured ([\d.]+)k img/s for rtm bf16 vs ([\d.]+)k per-batch",
        lambda: [
            1e3 / _art("kernel_ab.json")["tpu"]["eval_scan_chunk_rtm_bf16"][
                "variants"]["scan_k8"],
            1e3 / _art("kernel_ab.json")["tpu"]["eval_scan_chunk_rtm_bf16"][
                "variants"]["standalone"],
        ],
        0.01,
    ),
    (
        "README.md",
        "serving wire req/s range at 32 clients",
        r"([\d.]+)-([\d.]+) req/s\s*at ([\d]+) clients \(([\d]+) recorded "
        r"runs, median ([\d.]+)",
        lambda: [
            _art("bench_serve.json")["pmg"]["range_req_per_sec"]["min"],
            _art("bench_serve.json")["pmg"]["range_req_per_sec"]["max"],
            _art("bench_serve.json")["pmg"]["clients"],
            _art("bench_serve.json")["pmg"]["range_req_per_sec"]["n"],
            _art("bench_serve.json")["pmg"]["range_req_per_sec"]["median"],
        ],
        0.025,
    ),
    (
        "README.md",
        "RTM folded_q8 stream winner µs",
        r"and \*\*([\d.]+) µs\*\* with the ResNet stem run on k=2",
        lambda: [
            _art("bench_floor.json")["stream_floor_us"]["rtm"],
        ],
        0.01,
    ),
    (
        "README.md",
        "fused pallas trunk+gram per-frame µs",
        r"\*\*([\d.]+) µs\*\* with the fused Pallas trunk\+gram kernel",
        lambda: [
            _art("kernel_ab.json")["tpu"]["fused_trunk_gram"]["variants"]["pallas"],
        ],
        0.01,
    ),
    (
        "README.md",
        "style-transfer s/image (device loop vs host-stepped)",
        r"\*\*([\d.]+) s/image\*\* for 300 iterations.*?~([\d,]+) s/image "
        r"for a host-stepped\s*loop",
        lambda: [
            _art("bench_style.json")["s_per_image"],
            _art("bench_style.json")["host_stepped_s_per_image_est"],
        ],
        0.01,
    ),
    (
        "CLAUDE.md",
        "headline matrix: PMG packed f32/bf16 + raw layout (k img/s)",
        r"PMG shipped: ([\d.]+)k f32 / ([\d.]+)k bf16 img/s at batch 512"
        r".*?Raw layout: ([\d.]+)k",
        lambda: [
            _art("bench_matrix.json")["pmg_f32"]["images_per_sec"] / 1e3,
            _art("bench_matrix.json")["pmg_bf16"]["images_per_sec"] / 1e3,
            _art("bench_matrix.json")["pmg_f32_raw"]["images_per_sec"] / 1e3,
        ],
        0.015,
    ),
    (
        "CLAUDE.md",
        "headline matrix: PM f32/bf16 (k img/s)",
        r"PM defaults: ([\d.]+)k f32 / ([\d.]+)k bf16 img/s at batch 256",
        lambda: [
            _art("bench_matrix.json")["pm_f32"]["images_per_sec"] / 1e3,
            _art("bench_matrix.json")["pm_bf16"]["images_per_sec"] / 1e3,
        ],
        0.015,
    ),
    (
        "CLAUDE.md",
        "headline matrix: RTM f32/bf16 (k img/s)",
        r"RTM full ResNet-50: ([\d.]+)k f32 / ([\d.]+)k bf16 img/s at batch 128",
        lambda: [
            _art("bench_matrix.json")["rtm_f32"]["images_per_sec"] / 1e3,
            _art("bench_matrix.json")["rtm_bf16"]["images_per_sec"] / 1e3,
        ],
        0.015,
    ),
    (
        "CLAUDE.md",
        "train-step throughput f32 + bf16 (k img/s)",
        r"f32: PMG ([\d.]+)k / PM ([\d.]+)k / RTM ([\d.]+)k; bf16 mixed\s*"
        r"precision: ([\d.]+)k / ([\d.]+)k / ([\d.]+)k img/s",
        lambda: [
            _art("bench_train.json")["pmg"]["train_images_per_sec"] / 1e3,
            _art("bench_train.json")["pm"]["train_images_per_sec"] / 1e3,
            _art("bench_train.json")["rtm"]["train_images_per_sec"] / 1e3,
            _art("bench_train.json")["pmg_bf16"]["train_images_per_sec"] / 1e3,
            _art("bench_train.json")["pm_bf16"]["train_images_per_sec"] / 1e3,
            _art("bench_train.json")["rtm_bf16"]["train_images_per_sec"] / 1e3,
        ],
        0.02,
    ),
    (
        "CLAUDE.md",
        "per-frame stream floors: PMG fused / PM / RTM packed-stem (µs)",
        r"\*\*([\d.]+) us/frame\*\* via the fused pallas trunk\+gram"
        r".*?batch=1 PM: ([\d.]+) us/frame"
        r".*?\*\*([\d.]+) us\*\* with the s2d-packed stem",
        lambda: [
            _art("bench_floor.json")["stream_floor_us"]["pmg"],
            _art("bench_floor.json")["stream_floor_us"]["pm"],
            _art("bench_floor.json")["stream_floor_us"]["rtm"],
        ],
        0.015,
    ),
    (
        "docs/BENCHMARKING.md",
        "scan-chunk production quote: standalone vs scan_k8 rtm_bf16",
        r"standalone ([\d.]+) ms/fwd = ([\d.]+)k img/s,\s*"
        r"scan_k8 ([\d.]+) ms/fwd = \*\*([\d.]+)k img/s\*\*",
        lambda: [
            _art("kernel_ab.json")["tpu"]["eval_scan_chunk_rtm_bf16"][
                "variants"]["standalone"] * 128 / 1e3,
            1e3 / _art("kernel_ab.json")["tpu"]["eval_scan_chunk_rtm_bf16"][
                "variants"]["standalone"],
            _art("kernel_ab.json")["tpu"]["eval_scan_chunk_rtm_bf16"][
                "variants"]["scan_k8"] * 128 / 1e3,
            1e3 / _art("kernel_ab.json")["tpu"]["eval_scan_chunk_rtm_bf16"][
                "variants"]["scan_k8"],
        ],
        0.01,
    ),
    (
        "docs/BENCHMARKING.md",
        "regime table rows: single-dispatch vs sustained rtm_bf16_b128",
        r"\| single-dispatch \|[^|]*\| ([\d.]+) ms/fwd → ([\d.]+)k img/s \|\s*"
        r"\| sustained \|[^|]*\| ([\d.]+) ms/fwd → ([\d.]+)k img/s \|",
        lambda: [
            _art("kernel_ab.json")["tpu"]["eval_scan_chunk_rtm_bf16"][
                "variants"]["standalone"] * 128 / 1e3,
            1e3 / _art("kernel_ab.json")["tpu"]["eval_scan_chunk_rtm_bf16"][
                "variants"]["standalone"],
            128e3 / _art("bench_matrix.json")["rtm_bf16"]["images_per_sec"],
            _art("bench_matrix.json")["rtm_bf16"]["images_per_sec"] / 1e3,
        ],
        0.025,
    ),
    (
        "docs/TRAINING.md",
        "train-step bound attribution (PM f32/bf16 rows)",
        r"f32 ([\d.]+) TF/s at ([\d.]+) of the 819 GB/s peak;\s*"
        r"bf16 ([\d.]+) TF/s, ([\d.]+) MXU / ([\d.]+) HBM",
        lambda: [
            _art("roofline.json")["configs"]["train_pm_f32_b128"]["achieved_tflops"],
            _art("roofline.json")["configs"]["train_pm_f32_b128"]["hbm_utilization"],
            _art("roofline.json")["configs"]["train_pm_bf16_b128"]["achieved_tflops"],
            _art("roofline.json")["configs"]["train_pm_bf16_b128"]["mxu_utilization"],
            _art("roofline.json")["configs"]["train_pm_bf16_b128"]["hbm_utilization"],
        ],
        0.015,
    ),
]


@pytest.mark.parametrize(
    "doc,desc,pattern,expected_fn,tol",
    CLAIMS,
    ids=[c[1] for c in CLAIMS],
)
def test_doc_number_matches_artifact(doc, desc, pattern, expected_fn, tol):
    text = _doc(doc)
    m = re.search(pattern, text, flags=re.S)
    assert m, (
        f"{doc}: claim not found ({desc}). If the wording changed, update the "
        f"guard regex in the same commit. Pattern: {pattern}"
    )
    expected = expected_fn()
    got = [_num(g) for g in m.groups()]
    assert len(got) == len(expected), (desc, got, expected)
    for g, e in zip(got, expected):
        assert abs(g - e) <= tol * max(abs(e), 1e-9), (
            f"{doc} claims {g} but the artifact records {e} ({desc}); "
            f"re-record the artifact or fix the doc."
        )


def test_no_unguarded_stale_rtm_b256_claims():
    """The specific round-3 rot (stale RTM b256 roofline/sweep numbers) must
    not reappear: roofline.json has no b256 RTM rows."""
    text = _doc("README.md")
    assert "rtm_f32_b256" not in text
    roof = _art("roofline.json")["configs"]
    for key in ("rtm_f32_b256", "rtm_bf16_b256"):
        assert key not in roof or "rtm" not in text  # rows absent today
