"""The ``wadt`` alias must resolve to the SAME module objects as the real
package name — never duplicates (wadt.py meta-path redirect).

Regression guard for an order-dependent ImportError: without the redirect,
``from wadt.ops import x`` re-executed package files under the alias name,
forking module state (a second config with its own precision flag, a second
kernel_select with its own record cache) and breaking later alias imports.
"""

import importlib
import sys

import wadt

REAL = "heuristic_style_transfer_for_real_time_efficient_weather_attribute_detection_tpu"


def test_alias_is_real_package():
    assert wadt.__name__ == REAL
    assert sys.modules["wadt"] is sys.modules[REAL]


def test_submodule_imports_are_singletons():
    import wadt.ops.pallas_kernels as pk_alias
    from wadt.ops import gram as gram_alias
    from wadt.workloads import evaluate as ev_alias

    for alias_mod, real_name in (
        (pk_alias, f"{REAL}.ops.pallas_kernels"),
        (gram_alias, f"{REAL}.ops.gram"),
        (ev_alias, f"{REAL}.workloads.evaluate"),
    ):
        real_mod = importlib.import_module(real_name)
        assert alias_mod is real_mod, real_name
        # metadata stays real: relative imports inside keep resolving the
        # real names (no __spec__/__package__ clobbering by the redirect)
        assert alias_mod.__name__ == real_name
        assert alias_mod.__package__ == alias_mod.__spec__.parent


def test_alias_config_state_is_shared():
    from wadt import config as cfg_alias

    real_cfg = importlib.import_module(f"{REAL}.config")
    assert cfg_alias is real_cfg


def test_find_spec_rejects_missing_submodules():
    # The redirect must only claim names whose real counterpart exists:
    # optional-dependency probes rely on find_spec returning None.
    assert importlib.util.find_spec("wadt.no_such_submodule_xyz") is None
    assert importlib.util.find_spec("wadt.ops.no_such_kernel_xyz") is None
    # ... while existing ones still resolve through the redirect.
    assert importlib.util.find_spec("wadt.ops.gram") is not None
