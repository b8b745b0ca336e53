"""Test harness config: force CPU backend with 8 virtual devices so sharding
tests run anywhere (no TPU needed for correctness, SURVEY.md section 4)."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

FIXTURES = os.path.join(REPO, "tests", "fixtures")

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-updates jax_platforms to
# "axon,cpu" at interpreter start (env JAX_PLATFORMS is ignored); re-force
# CPU via config so the suite runs on 8 virtual host devices everywhere.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: identical HLO compiles once — this
# dedupes the suite's repeated train-step/engine compiles even within one
# cold run (e.g. the resume test's three identical fits) and makes warm
# dev-loop runs nearly compile-free (round-3 verdict: suite crept to 10 min,
# almost all XLA compile time on this 1-core rig).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/wadt/xla_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import heuristic_style_transfer_for_real_time_efficient_weather_attribute_detection_tpu as _pkg  # noqa: E402

_pkg.config.enable_parity_precision()

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run slow-marked exhaustive variants (also WADT_RUNSLOW=1); "
             "the default run keeps a fast sibling of each",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("WADT_RUNSLOW"):
        return
    skip = pytest.mark.skip(
        reason="slow exhaustive variant; run with --runslow (full pass "
               "recorded in results/test_full_pass.json)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
