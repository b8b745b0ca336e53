"""AOT export (engine/export.py): serialize -> reload -> numeric equality
with the live engine, metadata contract, and input validation."""

import json
import os

import numpy as np
import pytest

import wadt  # noqa: F401
from wadt.engine.executor import Engine
from wadt.engine.export import ExportedPredictor, export_engine
from wadt.models import pmg

TINY = dict(
    ndf=8, patch_size=16, patch_div=2, gram_channels=16, d_model=32,
    transformer_layers=1, transformer_heads=2, norm="batch",
)
TASKS = {"A": ["a0", "a1", "a2"], "B": ["b0", "b1"]}


@pytest.fixture(scope="module")
def engine():
    import jax

    spec = pmg.build_spec(TASKS, TINY)
    params = pmg.init(jax.random.PRNGKey(0), spec)
    return Engine("pmg", spec, params, batch_size=4)


@pytest.fixture(scope="module")
def artifact(engine, tmp_path_factory):
    out = tmp_path_factory.mktemp("export")
    meta = export_engine(engine, str(out), platforms=("cpu",))
    return str(out), meta


def test_export_writes_artifact(artifact, engine):
    out, meta = artifact
    assert os.path.exists(os.path.join(out, "forward.jaxexport"))
    with open(os.path.join(out, "export_meta.json")) as f:
        on_disk = json.load(f)
    assert on_disk == meta
    assert meta["family"] == "pmg"
    assert meta["batch_size"] == 4
    assert meta["tasks"]["names"] == ["A", "B"]
    assert meta["tasks"]["num_classes"] == [3, 2]
    # PMG engines default to the packed wire format
    assert meta["pack_k"] == engine.pack_k


def test_exported_matches_engine(artifact, engine):
    out, _ = artifact
    pred = ExportedPredictor(out)
    rng = np.random.RandomState(0)
    # 6 images: exercises an exact batch + a padded tail batch
    imgs = rng.randint(0, 256, (6, 224, 224, 3), np.uint8)
    want = engine.run(imgs, collect=("probs", "preds", "logits"))
    got = pred.run(imgs, collect=("probs", "preds", "logits"))
    np.testing.assert_allclose(got["logits"], want["logits"], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(got["probs"], want["probs"], atol=1e-6, rtol=1e-5)
    np.testing.assert_array_equal(got["preds"], want["preds"])
    assert got["preds"].shape == (6, 2)


def test_exported_rejects_bad_input(artifact):
    out, _ = artifact
    pred = ExportedPredictor(out)
    with pytest.raises(ValueError, match="uint8"):
        pred.run(np.zeros((2, 224, 224, 3), np.float32))
    with pytest.raises(ValueError, match="got"):
        pred.run(np.zeros((2, 64, 64, 3), np.uint8))


def test_exported_rejects_future_format(artifact, tmp_path):
    out, _ = artifact
    import shutil

    dst = tmp_path / "fut"
    shutil.copytree(out, dst)
    meta = json.loads((dst / "export_meta.json").read_text())
    meta["format_version"] = 999
    (dst / "export_meta.json").write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="unsupported export format"):
        ExportedPredictor(str(dst))


def test_export_meta_outputs_match_module(engine, tmp_path):
    """meta["outputs"] records what the exported module actually returns —
    a capture tap the family never emits must not be advertised, and asking
    for exactly meta["outputs"] must succeed (the 'everything the artifact
    provides' idiom)."""
    eng = Engine(
        "pmg", engine.spec, engine.params, batch_size=2,
        capture=("features", "no_such_tap"),
    )
    meta = export_engine(eng, str(tmp_path), platforms=("cpu",))
    assert "features" in meta["outputs"]
    assert "no_such_tap" not in meta["outputs"]
    pred = ExportedPredictor(str(tmp_path))
    imgs = np.zeros((2, 224, 224, 3), np.uint8)
    out = pred.run(imgs, collect=tuple(pred.meta["outputs"]))
    assert set(out) == set(meta["outputs"])


def test_export_refuses_mesh_engine(engine):
    class _FakeMesh:
        pass

    mesh_engine = object.__new__(Engine)
    mesh_engine.mesh = _FakeMesh()
    with pytest.raises(ValueError, match="single-device"):
        export_engine(mesh_engine, "/tmp/never")
