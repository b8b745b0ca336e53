"""Dataset-layer unit tests: path rewriting, label normalization, TaskSpec
shorthand, Engine input validation, CLI native-checkpoint loading."""

import json
import os

import numpy as np
import pytest
from PIL import Image

import wadt  # noqa: F401
from wadt.config import IGNORE_INDEX, TaskSpec
from wadt.data import MultiTaskDataset


def _write_manifest(tmp_path, image_path):
    manifest = {
        "folderA": {
            "img0.jpg": {
                "image_path": image_path,
                "Weather Type": "RAIN",  # case-insensitive match
                "Visibility": "nope-not-a-class",  # unknown -> IGNORE + warning
            }
        }
    }
    tasks = {"Weather Type": ["Clear", "Rain"], "Visibility": ["Low", "Good"]}
    mp, tp = str(tmp_path / "m.json"), str(tmp_path / "t.json")
    json.dump(manifest, open(mp, "w"))
    json.dump(tasks, open(tp, "w"))
    return mp, tp


def test_label_normalization_and_unknown_label(tmp_path, capsys):
    img_dir = tmp_path / "orig" / "sub"
    img_dir.mkdir(parents=True)
    p = str(img_dir / "img0.jpg")
    Image.new("RGB", (32, 32)).save(p)
    mp, tp = _write_manifest(tmp_path, p)
    ds = MultiTaskDataset(mp, tp)
    path, labels = ds.samples[0]
    assert labels[0] == 1  # "RAIN" -> Rain (case-insensitive)
    assert labels[1] == IGNORE_INDEX  # unknown label warned + ignored
    assert "not found" in capsys.readouterr().out


def test_search_folder_rewrite(tmp_path):
    flat = tmp_path / "flat"
    flat.mkdir()
    Image.new("RGB", (32, 32)).save(str(flat / "img0.jpg"))
    mp, tp = _write_manifest(tmp_path, "/nonexistent/deep/tree/img0.jpg")
    ds = MultiTaskDataset(mp, tp, search_folder=str(flat))
    assert ds.samples[0][0] == str(flat / "img0.jpg")
    img, labels = ds.load(0)
    assert img.shape == (224, 224, 3)


def test_find_images_by_sub_folder_rewrite(tmp_path):
    root = tmp_path / "byclass"
    (root / "tree").mkdir(parents=True)
    Image.new("RGB", (32, 32)).save(str(root / "tree" / "img0.jpg"))
    mp, tp = _write_manifest(tmp_path, "/elsewhere/tree/img0.jpg")
    ds = MultiTaskDataset(mp, tp, find_images_by_sub_folder=str(root))
    assert ds.samples[0][0] == str(root / "tree" / "img0.jpg")


def test_missing_file_raises(tmp_path):
    mp, tp = _write_manifest(tmp_path, "/definitely/not/here.jpg")
    ds = MultiTaskDataset(mp, tp)
    with pytest.raises(FileNotFoundError):
        ds.load(0)


def test_taskspec_int_shorthand():
    spec = TaskSpec.from_tasks({"A": 3, "B": 2})
    assert spec.num_classes == (3, 2)
    assert spec.class_names[0] == ("class_0", "class_1", "class_2")


def test_engine_input_validation():
    import jax

    from wadt.engine.executor import Engine
    from wadt.models import pmg

    spec = pmg.build_spec({"A": ["x", "y"]}, dict(
        ndf=8, patch_size=16, patch_div=2, gram_channels=16, d_model=32,
        transformer_layers=0, transformer_heads=2, norm="batch",
        use_token_attention=False,
    ))
    eng = Engine("pmg", spec, pmg.init(jax.random.PRNGKey(0), spec), batch_size=2)
    with pytest.raises(ValueError, match="uint8"):
        eng.run(np.zeros((2, 32, 32, 3), np.float32))
    with pytest.raises(ValueError, match="NHWC"):
        eng.run(np.zeros((2, 3, 32, 32, 1), np.uint8))


def test_cli_loads_orbax_dir(tmp_path):
    import jax

    from wadt.cli import main
    from wadt.engine import checkpoint
    from wadt.models import pmg

    from tools.make_synth_dataset import make as make_synth

    synth = make_synth(str(tmp_path / "s"), n_per_class=2, size=64)
    tasks = json.load(open(os.path.join(synth, "tasks.json")))
    hp = dict(ndf=8, patch_size=16, patch_div=2, gram_channels=16, d_model=32,
              transformer_layers=1, transformer_heads=2, norm="batch")
    spec = pmg.build_spec(tasks, hp)
    params = pmg.init(jax.random.PRNGKey(3), spec)
    ck = str(tmp_path / "native_ckpt")
    checkpoint.save_native(params, ck)
    cfg = str(tmp_path / "hp.json")
    json.dump({"hparams": hp}, open(cfg, "w"))
    rc = main([
        "pmg", "--mode", "inference", "--image_folder",
        os.path.join(synth, "images"), "--build_classifier",
        os.path.join(synth, "tasks.json"), "--config_path", cfg,
        "--model_path", ck, "--save_dir", str(tmp_path / "out"),
        "--batch_size", "4",
    ])
    assert rc == 0
    assert os.path.exists(tmp_path / "out" / "inference_results.json")
