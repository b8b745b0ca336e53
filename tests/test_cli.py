"""End-to-end CLI smoke tests (the ``weather.py`` surface) on the synthetic
tree with a tiny PMG config, plus jit determinism."""

import json
import os

import numpy as np
import pytest

import wadt  # noqa: F401
from wadt.cli import main

from tools.make_synth_dataset import make as make_synth

TINY = {
    "hparams": dict(
        ndf=8, patch_size=16, patch_div=2, gram_channels=16, d_model=32,
        transformer_layers=1, transformer_heads=2, norm="batch",
    )
}


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    synth = make_synth(str(root / "synth"), n_per_class=2, size=64)
    cfg = str(root / "hparams.json")
    with open(cfg, "w") as f:
        json.dump(TINY, f)
    return synth, cfg, str(root)


def _base(env):
    synth, cfg, root = env
    return [
        "pmg", "--build_classifier", os.path.join(synth, "tasks.json"),
        "--config_path", cfg, "--batch_size", "4",
    ], synth, root


def test_cli_classifier_with_test_images_and_export(env):
    base, synth, root = _base(env)
    save = os.path.join(root, "eval")
    exported = os.path.join(root, "exported.pth")
    rc = main(base + [
        "--mode", "classifier", "--data", os.path.join(synth, "dataset.json"),
        "--save_dir", save, "--save_test_images", "--export_torch", exported,
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(save, "metrics_test.json"))
    img_dir = os.path.join(save, "test_images")
    # grouped by GT Weather Type class name
    groups = os.listdir(img_dir)
    assert set(groups) <= {"Clear", "Rain", "Snow", "Fog", "Unlabeled"}
    assert sum(len(os.listdir(os.path.join(img_dir, g))) for g in groups) == 8
    assert os.path.getsize(exported) > 1000


def test_cli_benchmark_pred_images(env):
    base, synth, root = _base(env)
    save = os.path.join(root, "bench")
    rc = main(base + [
        "--mode", "benchmark",
        "--benchmark_folder", os.path.join(synth, "images"),
        "--benchmark_mapping", os.path.join(synth, "mapping.json"),
        "--save_dir", save, "--roc_output", os.path.join(save, "roc"),
        "--save_pred_images",
    ])
    assert rc == 0
    preds = os.listdir(os.path.join(save, "pred_images"))
    assert len(preds) == 8


def test_cli_compilation_cache(env):
    """--compilation_cache persists compiled executables to the given dir."""
    base, synth, root = _base(env)
    cache = os.path.join(root, "xla_cache")
    rc = main(base + [
        "--mode", "inference", "--image_folder", os.path.join(synth, "images"),
        "--save_dir", os.path.join(root, "cache_run"),
        "--compilation_cache", cache,
    ])
    assert rc == 0
    assert os.path.isdir(cache) and len(os.listdir(cache)) > 0


def test_jit_determinism(env):
    """Same params+input -> bit-identical logits across separate jitted calls
    (SURVEY.md section 4 recommended determinism gate)."""
    import jax

    from wadt.engine.executor import Engine
    from wadt.models import pmg

    base, synth, root = _base(env)
    with open(os.path.join(synth, "tasks.json")) as f:
        tasks = json.load(f)
    spec = pmg.build_spec(tasks, TINY["hparams"])
    params = pmg.init(jax.random.PRNGKey(0), spec)
    eng = Engine("pmg", spec, params, batch_size=4)
    imgs = np.random.RandomState(0).randint(0, 256, (4, 64, 64, 3), np.uint8)
    a = eng.run(imgs, collect=("logits",))["logits"]
    b = eng.run(imgs, collect=("logits",))["logits"]
    np.testing.assert_array_equal(a, b)


def test_cli_missing_build_classifier_is_usage_error(env, tmp_path):
    """Omitting --build_classifier is a CLI usage mistake: argparse usage
    message + exit code 2, not a Python traceback."""
    with pytest.raises(SystemExit) as e:
        main(["pmg", "--mode", "classifier", "--save_dir", str(tmp_path)])
    assert e.value.code == 2


def test_cli_export_mode(env):
    base, synth, root = _base(env)
    save = os.path.join(root, "aot")
    rc = main(base + ["--mode", "export", "--save_dir", save,
                      "--export_platforms", "cpu"])
    assert rc == 0
    out = os.path.join(save, "exported")
    assert os.path.exists(os.path.join(out, "forward.jaxexport"))
    from wadt.engine.export import ExportedPredictor

    pred = ExportedPredictor(out)
    res = pred.run(np.zeros((2, 224, 224, 3), np.uint8))
    assert res["preds"].shape == (2, len(pred.task_names))


def test_cli_train_data_parallel_passes_mesh(env, tmp_path, monkeypatch):
    """`--mode train --data_parallel` must hand the device mesh to fit
    (regression: the CLI built a mesh engine but never passed the mesh,
    silently training single-device).  Fast guard: fit is stubbed, only the
    CLI plumbing runs — the real sharded epoch is the slow variant below."""
    import wadt.workloads.train as train_mod

    seen = {}
    monkeypatch.setattr(
        train_mod, "fit",
        lambda *a, **kw: seen.update(mesh=kw.get("mesh")) or {"history": []},
    )
    base, synth, root = _base(env)
    rc = main(base + [
        "--mode", "train", "--data", os.path.join(synth, "dataset.json"),
        "--save_dir", os.path.join(str(tmp_path), "t"), "--epochs", "1",
        "--batch_size", "8", "--data_parallel", "--num_workers", "2",
    ])
    assert rc == 0
    assert seen["mesh"] is not None and "data" in seen["mesh"].axis_names


@pytest.mark.slow
def test_cli_train_data_parallel_smoke(env, tmp_path):
    """One REAL epoch through the CLI on the 8-virtual-device mesh, checking
    the artifacts.  slow: fast siblings are
    test_cli_train_data_parallel_passes_mesh (the CLI plumbing) and
    test_parallel.py's step-level sharding equivalence."""
    base, synth, root = _base(env)
    save = os.path.join(str(tmp_path), "train_dp")
    rc = main(base + [
        "--mode", "train", "--data", os.path.join(synth, "dataset.json"),
        "--save_dir", save, "--epochs", "1", "--batch_size", "8",
        "--data_parallel", "--num_workers", "2",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(save, "best_model.pth"))
    hist = json.load(open(os.path.join(save, "training_history.json")))
    assert len(hist) == 1 and np.isfinite(hist[0]["train_loss"])


def test_example_quickstart_runs(capsys):
    """examples/quickstart_eval.py must keep working against the shipped
    fixture (the README points reference users at it)."""
    import runpy
    import sys

    argv, sys.argv = sys.argv, ["quickstart_eval.py"]
    try:
        runpy.run_path(
            os.path.join(os.path.dirname(__file__), "..", "examples",
                         "quickstart_eval.py"),
            run_name="__main__",
        )
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert out.count("->") == 5 and "Weather Type" in out


def test_examples_compile():
    """Every example script must at least parse (quickstart also runs in
    test_example_quickstart_runs)."""
    import py_compile

    ex_dir = os.path.join(os.path.dirname(__file__), "..", "examples")
    scripts = [f for f in os.listdir(ex_dir) if f.endswith(".py")]
    assert len(scripts) >= 5
    for f in scripts:
        py_compile.compile(os.path.join(ex_dir, f), doraise=True)


def test_launch_cheatsheet_commands_parse():
    """Every example invocation in the repo-root `launch` cheat-sheet must
    parse against the current argparser (doc-rot guard)."""
    import shlex

    from wadt.cli import build_argparser

    txt = open(os.path.join(os.path.dirname(__file__), "..", "launch")).read()
    txt = txt.replace("\\\n", " ")
    cmds = [l.strip() for l in txt.splitlines()
            if l.strip().startswith("python weather.py")]
    assert len(cmds) >= 10
    p = build_argparser()
    for c in cmds:
        p.parse_args(shlex.split(c)[2:])


def test_pyproject_metadata_consistent():
    """Packaging doc-rot guard: pyproject.toml must parse, its console-script
    target must resolve, its version must match the package, and its core
    dependency list must stay within what the package actually imports."""
    import importlib
    import tomllib

    import wadt
    from tests.conftest import REPO

    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    proj = meta["project"]
    assert proj["version"] == wadt.__version__

    target = proj["scripts"]["weather"]
    mod_name, func = target.split(":")
    assert getattr(importlib.import_module(mod_name), func).__call__

    core = {d.split(">=")[0].split("[")[0].lower() for d in proj["dependencies"]}
    assert core == {"jax", "numpy", "pillow", "optax"}
