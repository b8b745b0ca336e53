"""Workload-layer integration tests on a tiny synthetic dataset + tiny PMG.

Asserts the reference's artifact schemas (SURVEY.md 2.4): metrics_test.json,
metrics_test_summary.csv, roc data, inference_results.json,
folder_predictions.json, benchmark_summary.json, best_mapping.json,
watch-folder last_prediction.json + prediction_history.csv.
"""

import json
import os
import time

import numpy as np
import pytest

from tests.conftest import REPO

import wadt  # noqa: F401
from wadt.data import BatchLoader, MultiTaskDataset
from wadt.engine.executor import Engine
from wadt.models import pmg

from tools.make_synth_dataset import make as make_synth

TINY_HPARAMS = dict(
    ndf=8, patch_size=16, patch_div=2, gram_channels=16, d_model=32,
    transformer_layers=1, transformer_heads=2, norm="batch",
)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth")
    return make_synth(str(out), n_per_class=3, size=96)


@pytest.fixture(scope="module")
def engine(synth):
    import jax

    with open(os.path.join(synth, "tasks.json")) as f:
        tasks = json.load(f)
    spec = pmg.build_spec(tasks, TINY_HPARAMS)
    params = pmg.init(jax.random.PRNGKey(0), spec)
    return Engine("pmg", spec, params, batch_size=4, prob_threshold=0.0)


def test_engine_dispatch_validates_input(engine):
    """dispatch applies run's input contract: float images are rejected, not
    silently double-normalized."""
    bad = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    with pytest.raises(ValueError, match="uint8"):
        engine.dispatch(bad)
    with pytest.raises(ValueError, match="uint8|NHWC"):
        engine.dispatch(np.zeros((64, 64, 3), np.uint8))  # missing batch dim


def test_evaluate_loader_batch_larger_than_engine(synth, engine, tmp_path):
    """Loader batches above engine.batch_size are split into micro-batches
    (Engine.run's old chunking, kept by the pipelined loop)."""
    from wadt.data.dataset import BatchLoader, MultiTaskDataset
    from wadt.workloads.evaluate import evaluate

    ds = MultiTaskDataset(
        os.path.join(synth, "dataset.json"), os.path.join(synth, "tasks.json")
    )
    big_loader = BatchLoader(ds, batch_size=4 * engine.batch_size)
    out_dir = tmp_path / "big_batch"
    avg_loss, metrics, overall_f1, _ = evaluate(engine, big_loader, str(out_dir))
    assert np.isfinite(avg_loss) and metrics


def test_engine_dispatch_fetch_matches_run(engine):
    """The pipelined micro-batch API (dispatch + async host copy + fetch)
    returns exactly what Engine.run does, including tail padding removal."""
    imgs = np.random.RandomState(7).randint(0, 256, (3, 64, 64, 3), np.uint8)
    want = engine.run(imgs, collect=("probs", "preds"))
    h1 = engine.dispatch(imgs)
    got = engine.fetch(h1)
    np.testing.assert_array_equal(got["preds"], want["preds"])
    np.testing.assert_allclose(got["probs"], want["probs"], atol=1e-6)
    assert got["probs"].shape[0] == 3  # padding stripped
    # several handles may be in flight at once
    handles = [engine.dispatch(imgs[i : i + 1]) for i in range(3)]
    for i, h in enumerate(handles):
        out = engine.fetch(h)
        np.testing.assert_array_equal(out["preds"][0], want["preds"][i])


def test_evaluate_artifacts(synth, engine, tmp_path):
    from wadt.workloads.evaluate import evaluate

    ds = MultiTaskDataset(
        os.path.join(synth, "dataset.json"), os.path.join(synth, "tasks.json")
    )
    loader = BatchLoader(ds, batch_size=4, num_workers=2)
    save = str(tmp_path / "eval")
    avg_loss, metrics, overall_f1, times = evaluate(
        engine, loader, save, measure_time=True
    )
    assert avg_loss > 0 and len(times) == len(loader)
    m = json.load(open(os.path.join(save, "metrics_test.json")))
    assert set(m) == {"test_loss", "overall_f1", "tasks"}
    for task in engine.tasks.names:
        tm = m["tasks"][task]
        assert {"accuracy", "precision", "recall", "f1_score",
                "confusion_matrix", "auc_macro", "auc_micro",
                "auc_per_class", "roc_png", "class_names"} <= set(tm)
    assert os.path.exists(os.path.join(save, "metrics_test_summary.csv"))
    assert os.path.exists(os.path.join(save, "times_classifier.json"))
    # ROC CSVs exist per task
    for task in engine.tasks.names:
        assert os.path.exists(os.path.join(save, "roc", f"{task}_roc_data.csv"))


def test_evaluate_scan_chunk_matches_per_batch(synth, engine, tmp_path):
    """classifier-mode scan_chunk (k stacked batches -> one lax.scan
    dispatch) must produce IDENTICAL metrics to the per-batch path — the
    scanned step is the per-batch step as a scan body — and the
    measure_time times-per-batch contract must force per-batch dispatch."""
    from wadt.workloads.evaluate import evaluate

    ds = MultiTaskDataset(
        os.path.join(synth, "dataset.json"), os.path.join(synth, "tasks.json")
    )

    def run(save, **kw):
        loader = BatchLoader(ds, batch_size=4, num_workers=2)
        return evaluate(engine, loader, save, **kw)

    loss_pb, metrics_pb, f1_pb, _ = run(str(tmp_path / "pb"))
    loss_sc, metrics_sc, f1_sc, _ = run(str(tmp_path / "sc"), scan_chunk=2)
    assert loss_sc == pytest.approx(loss_pb, abs=1e-6)
    assert f1_sc == f1_pb
    for task in engine.tasks.names:
        for key in ("accuracy", "precision", "recall", "f1_score"):
            assert metrics_sc[task][key] == metrics_pb[task][key], (task, key)
    j_pb = json.load(open(os.path.join(tmp_path, "pb", "metrics_test.json")))
    j_sc = json.load(open(os.path.join(tmp_path, "sc", "metrics_test.json")))
    for tasks in (j_pb["tasks"], j_sc["tasks"]):
        for m in tasks.values():
            m.pop("roc_png", None)  # embeds the differing save_dir
    assert j_sc["tasks"] == j_pb["tasks"]

    # measure_time needs one wall-time per batch -> scan_chunk is disabled
    loader = BatchLoader(ds, batch_size=4, num_workers=2)
    n_batches = len(loader)
    _, _, _, times = evaluate(engine, loader, str(tmp_path / "mt"),
                              measure_time=True, scan_chunk=2)
    assert len(times) == n_batches


def test_run_stream_empty_stream_shapes(engine):
    """An empty stream returns shaped empties for the standard keys
    (probs/logits [0,T,Kmax], preds/max_probs [0,T]) so callers indexing
    res['probs'][:, t] get an empty slice, not an IndexError; capture-tap
    keys fall back to [0] float32 (documented contract)."""
    t, kmax = len(engine.tasks), engine.tasks.max_classes
    res, extras = engine.run_stream(
        iter([]), collect=("probs", "logits", "preds", "max_probs")
    )
    assert extras == []
    assert res["probs"].shape == (0, t, kmax)
    assert res["logits"].shape == (0, t, kmax)
    assert res["preds"].shape == (0, t)
    assert res["max_probs"].shape == (0, t)
    _ = res["probs"][:, 0]  # the failure mode the shapes exist to prevent


def test_watch_csv_rotates_on_header_mismatch(tmp_path):
    """Resuming a watch folder onto a history CSV written with a DIFFERENT
    task set must not append misaligned rows: the stale file is rotated
    aside and a fresh one started with the current header."""
    import csv

    from wadt.workloads.inference import WatchFolderService

    p = str(tmp_path / "prediction_history.csv")
    ap = WatchFolderService._append_csv_row
    ap(p, ["timestamp", "image", "A_pred"], {"timestamp": 1, "image": "x", "A_pred": "y"})
    ap(p, ["timestamp", "image", "B_pred"], {"timestamp": 2, "image": "z", "B_pred": "w"})
    assert os.path.exists(p + ".stale-0")
    rows = list(csv.reader(open(p)))
    assert rows[0] == ["timestamp", "image", "B_pred"]
    assert len(rows) == 2
    # same header appends without another rotation
    ap(p, ["timestamp", "image", "B_pred"], {"timestamp": 3, "image": "q", "B_pred": "v"})
    assert len(list(csv.reader(open(p)))) == 3
    assert not os.path.exists(p + ".stale-1")


def test_run_inference_schema(synth, engine, tmp_path):
    from wadt.workloads.inference import run_inference

    save = str(tmp_path / "inf")
    res = run_inference(engine, os.path.join(synth, "images"), save_dir=save,
                        save_test_images=True)
    assert len(res) == 12
    j = json.load(open(os.path.join(save, "inference_results.json")))
    first = next(iter(j.values()))
    for task in engine.tasks.names:
        assert set(first[task]) == {"predicted_class", "probability"}
        assert 0.0 <= first[task]["probability"] <= 1.0
    # annotated copies mirror the tree
    assert any(f.endswith(".jpg") for _, _, fs in os.walk(save) for f in fs)


def test_folder_predictions_schema(synth, engine, tmp_path):
    from wadt.workloads.inference import test_folder_predictions

    save = str(tmp_path / "folder")
    res = test_folder_predictions(engine, os.path.join(synth, "images"), save)
    assert set(res) == set(engine.tasks.names)
    for t, d in res.items():
        assert set(d) == {"by_class", "f1_score", "global_f1"}
        assert set(d["by_class"]) == set(engine.tasks.classes(t))
    assert os.path.exists(os.path.join(save, "all_predictions.json"))


def test_folder_predictions_includes_dotfile_images(engine, tmp_path):
    """test_folder_predictions' reference counterpart filters by name suffix
    (PM_evaluation.py:691-695): a dotfile named '.jpg' is a valid image."""
    from PIL import Image as PILImage

    from wadt.workloads.inference import test_folder_predictions

    d = tmp_path / "tree" / "sun"
    d.mkdir(parents=True)
    arr = np.random.RandomState(0).randint(0, 256, (64, 64, 3), np.uint8)
    PILImage.fromarray(arr).save(d / "a.jpg")
    PILImage.fromarray(arr).save(str(d / ".jpg"), format="JPEG")
    (d / "b.txt").write_text("junk")
    test_folder_predictions(engine, str(tmp_path / "tree"),
                            str(tmp_path / "out"))
    allp = json.load(open(tmp_path / "out" / "all_predictions.json"))
    assert sorted(os.path.basename(p) for p in allp) == [".jpg", "a.jpg"]


def test_benchmark_mode(synth, engine, tmp_path):
    from wadt.workloads.benchmark import run_benchmark

    save = str(tmp_path / "bench")
    summary = run_benchmark(
        engine,
        os.path.join(synth, "images"),
        os.path.join(synth, "mapping.json"),
        save,
        os.path.join(save, "roc"),
        auto_mapping=False,
    )
    assert "Weather Type" in summary
    s = summary["Weather Type"]
    assert s["n_samples"] == 12
    assert set(s["per_class"]) == {"precision", "recall", "f1_score", "auc"}
    assert set(s["global"]) == {"precision_macro", "recall_macro", "f1_macro", "auc_macro"}
    bm = json.load(open(os.path.join(save, "best_mapping.json")))
    assert set(bm["Weather Type"]) == {"sun", "rain", "snow", "fog"}
    # every model class appears exactly once across the mapping
    mapped = [c for lst in bm["Weather Type"].values() for c in lst]
    assert sorted(mapped) == sorted(engine.tasks.classes("Weather Type"))


def test_benchmark_auto_mapping(synth, engine, tmp_path):
    from wadt.workloads.benchmark import run_benchmark

    save = str(tmp_path / "bench_auto")
    summary = run_benchmark(
        engine,
        os.path.join(synth, "images"),
        os.path.join(synth, "mapping.json"),
        save,
        os.path.join(save, "roc"),
        auto_mapping=True,
    )
    assert os.path.exists(os.path.join(save, "best_mapping.json"))
    assert "Weather Type" in summary


def test_walk_filter_matches_reference_suffix_semantics(tmp_path):
    """The walk's image filter is a name-SUFFIX match (benchmark_utils.py:47):
    a dotfile named exactly '.jpg' is an image; junk extensions and
    case-mangled top dirs are skipped (membership is case-sensitive)."""
    from wadt.workloads.benchmark import walk_benchmark_folder

    d = tmp_path / "bench" / "sun"
    d.mkdir(parents=True)
    for name in (".jpg", "a.JPG", "b.txt", "noext"):
        (d / name).write_bytes(b"x")
    (tmp_path / "bench" / "SUN").mkdir()
    (tmp_path / "bench" / "SUN" / "c.jpg").write_bytes(b"x")
    found = walk_benchmark_folder(str(tmp_path / "bench"), {"T": ["sun"]})
    names = sorted(os.path.basename(p) for p, _ in found)
    assert names == [".jpg", "a.JPG"]
    assert all(top == "sun" for _, top in found)


def test_auc_macro_truthiness_quirk(tmp_path):
    """Reference parity (benchmark_utils.py:170 ``if any(auc_pc)``): when
    every DEFINED per-class AUC is exactly 0.0, auc_macro is None, not 0.0.
    Found by tools/fuzz_benchmark_parity.py."""
    from wadt.workloads.benchmark import _task_summary

    y_true = np.array([0, 1])
    p_bench = np.array([[0.1, 0.9], [0.9, 0.1]])  # both one-vs-rest AUCs 0.0
    s = _task_summary("T", ["a", "b"], y_true, p_bench, str(tmp_path))
    assert s["per_class"]["auc"] == {"a": 0.0, "b": 0.0}
    assert s["global"]["auc_macro"] is None


def test_auto_map_matches_exhaustive():
    """Coordinate-ascent auto-map must equal brute force on random instances."""
    from wadt.workloads.benchmark import EXHAUSTIVE_LIMIT, _macro_f1_from_assignment, auto_map_task
    import itertools
    import wadt.workloads.benchmark as bench

    rng = np.random.RandomState(0)
    for trial in range(10):
        M, B = rng.randint(2, 6), rng.randint(2, 4)
        C = rng.randint(0, 20, size=(M, B))
        # exhaustive truth
        best = max(
            (_macro_f1_from_assignment(C, v, B) for v in itertools.product(range(B), repeat=M))
        )
        # force the heuristic path
        old = bench.EXHAUSTIVE_LIMIT
        bench.EXHAUSTIVE_LIMIT = 0
        try:
            _, score = auto_map_task(C)
        finally:
            bench.EXHAUSTIVE_LIMIT = old
        assert score >= best - 1e-9, (trial, score, best)


def _atomic_save(img, dest):
    """Write-temp-then-rename so the watcher never sees a half-written frame
    (temp name has no timestamp stem, so _latest_valid ignores it)."""
    tmp = dest.parent / (".tmp_" + dest.name)
    img.save(tmp, format="JPEG")
    os.replace(tmp, dest)


def test_watch_folder_service(synth, engine, tmp_path):
    from wadt.workloads.inference import WatchFolderService

    watch = tmp_path / "watch"
    watch.mkdir()
    save = tmp_path / "watch_out"
    svc = WatchFolderService(engine, [str(watch)], [0.1], str(save))
    svc.start(block=False)
    # drop a timestamped frame
    from PIL import Image

    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 256, (64, 64, 3), np.uint8)
    )
    _atomic_save(img, watch / "2026-08-16_12-00-00.jpg")
    sub = save / "watch"
    deadline = time.time() + 20
    while time.time() < deadline and not (sub / "last_prediction.json").exists():
        time.sleep(0.2)
    svc.stop()
    assert (sub / "last_prediction.json").exists()
    j = json.load(open(sub / "last_prediction.json"))
    assert j["timestamp"] == "2026-08-16_12-00-00"
    assert set(j["prediction"]) == set(engine.tasks.names)
    assert (sub / "prediction_history.csv").exists()
    # ignores non-timestamp names
    img.save(watch / "notatimestamp.jpg")
    time.sleep(0.3)


def test_sensor_truth_rules():
    from wadt.workloads.inference import derive_truth

    rules = {
        "Weather Type": {
            "default": "Clear",
            "rules": [
                {"class": "Rain", "when": [{"sensor": "rain_mm", "op": "gt", "value": 0.5}]},
                {"class": "Fog", "when": [{"sensor": "visibility_m", "op": "lt", "value": 200},
                                           {"sensor": "rain_mm", "op": "lte", "value": 0.5}]},
            ],
        }
    }
    assert derive_truth(rules, "Weather Type", {"rain_mm": 1.0}) == "Rain"
    assert derive_truth(rules, "Weather Type", {"rain_mm": 0.0, "visibility_m": 100}) == "Fog"
    assert derive_truth(rules, "Weather Type", {"rain_mm": 0.0, "visibility_m": 500}) == "Clear"
    assert derive_truth(rules, "Weather Type", {}) == "Clear"


def test_watch_folder_sensor_metrics(synth, engine, tmp_path):
    """End-to-end rolling service metrics: sensor annotations + truth rules
    -> performance.json + performance_history.csv after metrics_every images
    (Functions/PM_evaluation.py:1017-1043)."""
    from PIL import Image

    from wadt.workloads.inference import WatchFolderService

    watch = tmp_path / "w2"
    ann = tmp_path / "ann"
    watch.mkdir(); ann.mkdir()
    rules = {
        "Weather Type": {
            "default": "Clear",
            "rules": [{"class": "Rain",
                       "when": [{"sensor": "rain_mm", "op": "gt", "value": 0.5}]}],
        }
    }
    rules_path = tmp_path / "rules.json"
    json.dump(rules, open(rules_path, "w"))
    svc = WatchFolderService(
        engine, [str(watch)], [0.1], str(tmp_path / "out2"),
        truth_mapping_path=str(rules_path), annotations_folder=str(ann),
        metrics_every=2,
    )
    svc.start(block=False)
    rng = np.random.RandomState(0)
    sub = tmp_path / "out2" / "w2"
    for i in range(3):
        name = f"2026-08-16_12-00-0{i}"
        json.dump({"sensorValues": [{"name": "rain_mm", "value": float(i)}]},
                  open(ann / f"{name}.json", "w"))
        _atomic_save(Image.fromarray(rng.randint(0, 256, (64, 64, 3), np.uint8)),
                     watch / f"{name}.jpg")
        deadline = time.time() + 20
        while time.time() < deadline:
            if (sub / "last_prediction.json").exists() and json.load(
                open(sub / "last_prediction.json"))["image"] == f"{name}.jpg":
                break
            time.sleep(0.1)
    deadline = time.time() + 20
    while time.time() < deadline and not (sub / "performance.json").exists():
        time.sleep(0.2)
    svc.stop()
    perf = json.load(open(sub / "performance.json"))
    assert "global_f1" in perf and "Weather Type_f1" in perf
    assert (sub / "performance_history.csv").exists()


def test_watch_folder_retries_half_written_frame(synth, engine, tmp_path):
    """A frame caught mid-write must be retried on later polls, not dropped
    forever (round-3 regression: last_processed was set before the load)."""
    import io

    from PIL import Image

    from wadt.workloads.inference import WatchFolderService

    watch = tmp_path / "w3"
    watch.mkdir()
    svc = WatchFolderService(engine, [str(watch)], [0.1], str(tmp_path / "o3"),
                             max_load_retries=50)
    # Simulate a slow in-place writer: first the truncated prefix, then
    # (after the watcher has certainly seen and failed on it) the full file.
    buf = io.BytesIO()
    Image.fromarray(
        np.random.RandomState(1).randint(0, 256, (64, 64, 3), np.uint8)
    ).save(buf, format="JPEG")
    data = buf.getvalue()
    frame = watch / "2026-08-16_13-00-00.jpg"
    frame.write_bytes(data[: len(data) // 2])
    svc.start(block=False)
    time.sleep(1.0)  # several polls fail on the truncated file
    sub = tmp_path / "o3" / "w3"
    assert not (sub / "last_prediction.json").exists()
    frame.write_bytes(data)  # writer finishes
    deadline = time.time() + 20
    while time.time() < deadline and not (sub / "last_prediction.json").exists():
        time.sleep(0.1)
    svc.stop()
    assert (sub / "last_prediction.json").exists()
    j = json.load(open(sub / "last_prediction.json"))
    assert j["image"] == frame.name


def test_watch_folder_gives_up_on_corrupt_frame(synth, engine, tmp_path):
    """A truly corrupt file must not wedge the folder: after max_load_retries
    it is marked dead and a newer frame is still served."""
    from PIL import Image

    from wadt.workloads.inference import WatchFolderService

    watch = tmp_path / "w4"
    watch.mkdir()
    svc = WatchFolderService(engine, [str(watch)], [0.05], str(tmp_path / "o4"),
                             max_load_retries=3)
    (watch / "2026-08-16_14-00-00.jpg").write_bytes(b"never a valid jpeg")
    svc.start(block=False)
    time.sleep(0.8)  # exceed the retry budget on the corrupt frame
    _atomic_save(
        Image.fromarray(
            np.random.RandomState(2).randint(0, 256, (64, 64, 3), np.uint8)
        ),
        watch / "2026-08-16_14-00-01.jpg",
    )
    sub = tmp_path / "o4" / "w4"
    deadline = time.time() + 20
    while time.time() < deadline and not (sub / "last_prediction.json").exists():
        time.sleep(0.1)
    svc.stop()
    assert (sub / "last_prediction.json").exists()
    assert json.load(open(sub / "last_prediction.json"))["image"] == "2026-08-16_14-00-01.jpg"


def test_folder_predictions_skips_corrupt_image(synth, engine, tmp_path):
    """Unreadable images are skipped with a warning, not a crash (reference
    behavior: Functions/RTM_evaluation.py:793-797)."""
    import shutil

    from wadt.workloads.inference import run_inference

    tree = tmp_path / "tree"
    shutil.copytree(os.path.join(synth, "images"), tree)
    (tree / "sun" / "corrupt.jpg").write_bytes(b"not an image at all")
    res = run_inference(engine, str(tree), save_dir=str(tmp_path / "o"))
    assert len(res) == 12  # 12 good images, corrupt one skipped
    assert not any("corrupt" in p for p in res)


def test_batchloader_raises_cleanly_on_decode_error(tmp_path):
    """Without skip_errors, a decode failure must RAISE in the consumer, not
    hang it (regression: dead producer left the consumer blocked forever)."""
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"junk")
    loader = BatchLoader([str(bad)], batch_size=1, num_workers=1)
    with pytest.raises(Exception):
        for _ in loader:
            pass


def test_pm_family_artifact_names(synth, tmp_path):
    """PM/RTM evals additionally emit their reference's own artifact names
    and schema: test_metrics.json ({task: {..., confusion_matrix}, average})
    and times_test.json — PM averages accuracy only
    (PM_evaluation.py:595-641); RTM averages all four metrics
    (RTM_evaluation.py:449-537)."""
    import jax

    from wadt.models import pm, rtm
    from wadt.workloads.evaluate import evaluate

    with open(os.path.join(synth, "tasks.json")) as f:
        tasks = json.load(f)
    ds = MultiTaskDataset(
        os.path.join(synth, "dataset.json"), os.path.join(synth, "tasks.json")
    )

    spec = pm.build_spec(tasks, dict(ndf=8, patch_size=16))
    eng = Engine("pm", spec, pm.init(jax.random.PRNGKey(1), spec), batch_size=4)
    save = str(tmp_path / "pm_eval")
    evaluate(eng, BatchLoader(ds, batch_size=4, num_workers=2), save,
             measure_time=True)
    m = json.load(open(os.path.join(save, "test_metrics.json")))
    assert "average" in m and set(m["average"]) == {"accuracy"}
    for task in eng.tasks.names:
        assert set(m[task]) == {"accuracy", "precision", "recall", "f1_score",
                                "confusion_matrix"}
    assert os.path.exists(os.path.join(save, "times_test.json"))
    # the unified names still exist too
    assert os.path.exists(os.path.join(save, "metrics_test.json"))
    assert os.path.exists(os.path.join(save, "times_classifier.json"))

    rspec = rtm.build_spec(tasks, dict(truncate_layer=5, use_attention=False))
    reng = Engine("rtm", rspec, rtm.init(jax.random.PRNGKey(2), rspec), batch_size=4)
    rsave = str(tmp_path / "rtm_eval_names")
    evaluate(reng, BatchLoader(ds, batch_size=4, num_workers=2), rsave,
             measure_time=True)
    rm = json.load(open(os.path.join(rsave, "test_metrics.json")))
    assert set(rm["average"]) == {"accuracy", "precision", "recall", "f1_score"}
    assert os.path.exists(os.path.join(rsave, "times_test.json"))

    # The family confusion_matrix is the FULL k x k (labels=range(k),
    # PM_evaluation.py:595 / RTM_evaluation.py:465) even when classes are
    # absent from the data — unlike the unified (PMG-semantics) artifact,
    # which lets sklearn infer the present labels (PMG_evaluation.py:201).
    for task in reng.tasks.names:
        k = len(tasks[task])
        assert len(rm[task]["confusion_matrix"]) == k
        assert all(len(row) == k for row in rm[task]["confusion_matrix"])

    # All-Unknown (prob_threshold=1.1 filters every pred): the family
    # artifact records a ZERO k x k matrix and 0.0 scalars
    # (the reference's valid.sum()==0 branch), the unified artifact [].
    ueng = Engine("rtm", rspec, reng.params, batch_size=4, prob_threshold=1.1)
    usave = str(tmp_path / "rtm_eval_unknown")
    evaluate(ueng, BatchLoader(ds, batch_size=4, num_workers=2), usave)
    um = json.load(open(os.path.join(usave, "test_metrics.json")))
    uu = json.load(open(os.path.join(usave, "metrics_test.json")))
    t0 = reng.tasks.names[0]
    k0 = len(tasks[t0])
    assert um[t0]["accuracy"] == 0.0
    assert um[t0]["confusion_matrix"] == [[0.0] * k0 for _ in range(k0)]
    assert uu["tasks"][t0]["confusion_matrix"] == []


def test_render_task_overlay_layout():
    """Auto-layout bar: fits within the height budget, wraps to columns for
    many lines, shrinks font instead of overflowing (RTM_evaluation.py:280-403
    behavior)."""
    from wadt.workloads.inference import render_task_overlay

    img = np.zeros((240, 640, 3), np.uint8)
    lines = [f"Task {i} - True: foo, Pred: bar, Prob: 0.{i}0 " for i in range(12)]
    out = render_task_overlay(img, lines)
    assert out.shape == img.shape and out is not img
    # bar confined to the top 20%+margins: bottom 70% untouched
    assert np.array_equal(out[170:], img[170:])
    # something was drawn up top
    assert out[:60].sum() > 0
    # empty lines -> unmodified copy
    same = render_task_overlay(img, [])
    assert np.array_equal(same, img)


def test_rtm_eval_writes_autolayout_images(synth, tmp_path):
    import jax

    from wadt.models import rtm
    from wadt.workloads.evaluate import evaluate

    with open(os.path.join(synth, "tasks.json")) as f:
        tasks = json.load(f)
    spec = rtm.build_spec(tasks, dict(truncate_layer=5, use_attention=False))
    eng = Engine("rtm", spec, rtm.init(jax.random.PRNGKey(0), spec), batch_size=4)
    ds = MultiTaskDataset(
        os.path.join(synth, "dataset.json"), os.path.join(synth, "tasks.json")
    )
    save = str(tmp_path / "rtm_eval")
    evaluate(eng, BatchLoader(ds, batch_size=4, num_workers=2), save,
             save_test_images=True)
    pngs = [f for _, _, fs in os.walk(os.path.join(save, "test_images"))
            for f in fs if f.endswith(".png")]
    assert len(pngs) == 12


def test_benchmark_pred_image_overlay_options(synth, engine, tmp_path):
    """--pred_images_dir/--overlay_topk/--draw_prob_threshold: custom dir is
    honored and overlays written; an impossible threshold still writes the
    images (task lines are skipped, not the files)."""
    from wadt.workloads.benchmark import run_benchmark

    save = str(tmp_path / "bench_overlay")
    out_dir = str(tmp_path / "custom_pred_dir")
    run_benchmark(
        engine,
        os.path.join(synth, "images"),
        os.path.join(synth, "mapping.json"),
        save,
        os.path.join(save, "roc"),
        save_pred_images=True,
        pred_images_dir=out_dir,
        overlay_topk=2,
        draw_prob_threshold=1.1,
    )
    imgs = os.listdir(out_dir)
    assert len(imgs) == 12
    assert not os.path.exists(os.path.join(save, "pred_images"))


def test_cli_pm_attention_flag_fallbacks(tmp_path):
    """PM attention CLI flags reach the built spec through the REAL
    build_engine path (reference precedence: config wins for tau/softmax,
    --ablate_attention always wins like test_PM.py:163, the spec's SE
    default survives when the flag and checkpoint are absent)."""
    import json as _json

    from wadt.cli import build_argparser, build_engine

    tiny = {"ndf": 4, "n_layers": 2}
    cfg = tmp_path / "pm_hparams.json"
    cfg.write_text(_json.dumps({**tiny, "attn_tau": 0.9}))
    tasks = tmp_path / "tasks.json"
    tasks.write_text(_json.dumps({"A": ["x", "y"]}))

    args = build_argparser().parse_args(
        ["pm", "--build_classifier", str(tasks), "--config_path", str(cfg),
         "--ablate_attention", "--attn_no_softmax", "--attn_tau", "0.3",
         "--batch_size", "2", "--prob_threshold", "0.5"]
    )
    spec = build_engine(args).spec
    assert spec.attn_tau == 0.9            # config beats the CLI flag
    assert not spec.attn_softmax_spatial   # CLI fallback (config silent)
    assert spec.ablate_attention           # CLI always wins (ref :163)
    assert spec.attn_use_se                # spec default survives


def test_hdbscan_clustering_grid_and_tiny_class():
    """Keep-max-clusters grid finds the 2 synthetic blobs, and a class
    with fewer samples than the grid's min_samples must clamp, not crash
    (sklearn: min_samples <= n_samples)."""
    from wadt.workloads.embed import hdbscan_clustering

    rng = np.random.RandomState(0)
    blobs = np.vstack([
        rng.randn(30, 8) + 10.0,
        rng.randn(30, 8) - 10.0,
    ]).astype(np.float32)
    paths = [f"img_{i}.jpg" for i in range(60)]
    res = hdbscan_clustering(blobs, paths)
    assert res["n_clusters"] == 2
    assert sum(len(v) for v in res["clusters"].values()) == 60

    tiny = rng.randn(3, 8).astype(np.float32)
    res2 = hdbscan_clustering(tiny, paths[:3])  # must not raise
    assert sum(len(v) for v in res2["clusters"].values()) == 3

    # sklearn HDBSCAN raises on n_samples < 2: a 0/1-point class must
    # degrade to trivial noise, not crash the clustering mode.
    res1 = hdbscan_clustering(tiny[:1], paths[:1])
    assert res1["n_clusters"] == 0 and res1["clusters"] == {"-1": paths[:1]}
    res0 = hdbscan_clustering(tiny[:0], [])
    assert res0["n_clusters"] == 0 and res0["clusters"] == {}


def test_benchmark_unknown_mapping_task_is_named(synth, engine, tmp_path):
    """A mapping JSON naming a task outside the model registry fails up
    front with the task named (the reference dies later with a bare
    KeyError, benchmark_utils.py:79)."""
    from wadt.workloads.benchmark import run_benchmark

    bad = tmp_path / "bad_mapping.json"
    bad.write_text(json.dumps({"No Such Task": {"sun": ["Clear"]}}))
    with pytest.raises(ValueError, match="No Such Task"):
        run_benchmark(engine, os.path.join(synth, "images"), str(bad),
                      str(tmp_path / "o"), str(tmp_path / "o/roc"))
