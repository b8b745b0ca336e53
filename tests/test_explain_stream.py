"""Tests for explainability, style transfer, streaming and Kalman ops."""

import json
import os

import numpy as np
import pytest

import wadt  # noqa: F401
from wadt.models import pmg

TINY = dict(
    ndf=8, patch_size=64, patch_div=2, gram_channels=16, d_model=32,
    transformer_layers=1, transformer_heads=2, norm="batch",
)
TASKS = {"A": ["a0", "a1", "a2"], "B": ["b0", "b1"]}


@pytest.fixture(scope="module")
def model():
    import jax

    spec = pmg.build_spec(TASKS, TINY)
    params = pmg.init(jax.random.PRNGKey(0), spec)
    return spec, params


def test_gradcam_properties(model):
    from wadt.workloads.explain import Explainer

    spec, params = model
    ex = Explainer("pmg", spec, params)
    imgs = np.random.RandomState(0).randint(0, 256, (3, 64, 64, 3), np.uint8)
    cam, logits = ex.gradcam(imgs, "A", np.array([0, 1, 2], np.int32))
    assert cam.shape[0] == 3 and cam.ndim == 3
    assert float(cam.min()) >= 0.0 and float(cam.max()) <= 1.0 + 1e-6
    assert logits.shape == (3, 2, 3)
    # target resolution: GT when valid, argmax fallback for IGNORE/-1
    labels = np.array([[1, -100], [-100, 0], [2, 1]], np.int64)
    targets = ex.resolve_targets("A", labels, logits)
    am = logits[:, 0, :3].argmax(-1)
    assert targets[0] == 1 and targets[2] == 2 and targets[1] == am[1]


def test_integrated_gradients_completeness(model):
    """IG completeness axiom: sum(attributions) ~= f(x) - f(baseline)."""
    import jax
    import jax.numpy as jnp

    from wadt.ops.preprocess import normalize_uint8
    from wadt.workloads.explain import Explainer

    spec, params = model
    ex = Explainer("pmg", spec, params)
    imgs = np.random.RandomState(1).randint(0, 256, (2, 64, 64, 3), np.uint8)
    cls = np.array([0, 1], np.int32)
    attr = ex.integrated_gradients(imgs, "A", cls, steps=128)

    def logit(z):
        lg, _ = pmg.apply(params, z, spec)
        return np.asarray(lg)[:, 0, :3]

    x = np.asarray(normalize_uint8(jnp.asarray(imgs)))
    fx = logit(x)[np.arange(2), cls]
    f0 = logit(np.zeros_like(x))[np.arange(2), cls]
    got = attr.reshape(2, -1).sum(-1)
    np.testing.assert_allclose(got, fx - f0, rtol=0.08, atol=0.05)


def test_style_transfer_loss_decreases(model):
    from wadt.workloads.style_transfer import run_patch_gram_style_transfer

    spec, params = model
    style = np.random.RandomState(2).randn(1, 64, 64, 3).astype(np.float32) * 0.5
    img, loss, iters = run_patch_gram_style_transfer(
        params, spec, style, num_iterations=15, lr=0.05, target_loss=0.0,
        log_every=0,
    )
    img2, loss2, _ = run_patch_gram_style_transfer(
        params, spec, style, num_iterations=1, lr=0.05, target_loss=0.0,
        log_every=0,
    )
    assert loss < loss2  # more iterations -> lower style loss
    assert img.size == (64, 64)


def test_style_transfer_batch_matches_solo(model):
    """Each image in a batched optimization follows the same trajectory it
    would alone (elementwise Adam + independent per-image losses)."""
    from wadt.workloads.style_transfer import (
        run_patch_gram_style_transfer,
        run_patch_gram_style_transfer_batch,
    )

    spec, params = model
    styles = np.random.RandomState(3).randn(2, 64, 64, 3).astype(np.float32) * 0.5
    imgs, losses, iters = run_patch_gram_style_transfer_batch(
        params, spec, styles, num_iterations=5, lr=0.05, init_type="gray",
        target_loss=0.0, log_every=0,
    )
    assert list(iters) == [5, 5]
    for i in range(2):
        img, loss, it = run_patch_gram_style_transfer(
            params, spec, styles[i : i + 1], num_iterations=5, lr=0.05,
            init_type="gray", target_loss=0.0, log_every=0,
        )
        assert it == 5
        np.testing.assert_allclose(losses[i], loss, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(imgs[i], np.float32), np.asarray(img, np.float32),
            atol=1.0,  # uint8 off-by-one from batched-vs-solo conv numerics
        )


def test_style_transfer_noise_init_position_independent(model):
    """Noise init is keyed on each image's GLOBAL index (seed_offset + i):
    the same image gets the same trajectory solo, batched, or re-chunked."""
    from wadt.workloads.style_transfer import (
        run_patch_gram_style_transfer,
        run_patch_gram_style_transfer_batch,
    )

    spec, params = model
    styles = np.random.RandomState(9).randn(2, 64, 64, 3).astype(np.float32) * 0.5
    imgs, losses, _ = run_patch_gram_style_transfer_batch(
        params, spec, styles, num_iterations=3, init_type="noise",
        target_loss=0.0, log_every=0,
    )
    # image 1 solo, reproducing its batch position via seed_offset
    img1, loss1, _ = run_patch_gram_style_transfer(
        params, spec, styles[1:2], num_iterations=3, init_type="noise",
        target_loss=0.0, log_every=0, seed_offset=1,
    )
    np.testing.assert_allclose(losses[1], loss1, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(imgs[1], np.float32), np.asarray(img1, np.float32), atol=1.0
    )


def test_style_transfer_batch_early_stop(model):
    """A huge target stops every image after one applied step (the reference
    breaks AFTER optimizer.step(), so pixels must have moved)."""
    from wadt.workloads.style_transfer import run_patch_gram_style_transfer_batch

    spec, params = model
    styles = np.random.RandomState(4).randn(2, 64, 64, 3).astype(np.float32) * 0.5
    imgs, losses, iters = run_patch_gram_style_transfer_batch(
        params, spec, styles, num_iterations=10, lr=0.05, init_type="gray",
        target_loss=1e9, log_every=0,
    )
    assert list(iters) == [1, 1]
    assert np.isfinite(losses).all()
    moved = np.abs(np.asarray(imgs[0], np.float32) / 255.0 - 0.5)
    assert float(moved.max()) > 0.01


def test_kalman_identity_dynamics():
    """Matches the closed-form pykalman-default recursion; converges to a
    constant observation."""
    from wadt.ops import kalman

    st = kalman.init_state(2, 3)
    obs = np.tile(np.array([[0.7, 0.2, 0.1], [0.5, 0.5, 0.0]], np.float32), (1, 1))
    means = []
    for _ in range(30):
        st, sm = kalman.filter_update(st, obs)
        means.append(np.asarray(sm))
    np.testing.assert_allclose(means[-1], obs, atol=1e-3)
    # manual recursion check, first 3 steps, scalar case
    m, p = 0.0, 1.0
    st2 = kalman.init_state(1, 1)
    for step in range(3):
        pp = p + 1.0
        k = pp / (pp + 1.0)
        m = m + k * (0.7 - m)
        p = (1 - k) * pp
        st2, sm2 = kalman.filter_update(st2, np.array([[0.7]], np.float32))
        assert abs(float(sm2[0, 0]) - m) < 1e-6


def test_stream_predictor_and_video(model, tmp_path):
    import cv2

    from wadt.workloads.stream import StreamPredictor, run_camera

    spec, params = model
    pred = StreamPredictor("pmg", spec, params, use_kalman=True)
    frame = np.random.RandomState(0).randint(0, 256, (224, 224, 3), np.uint8)
    probs = pred(frame)
    assert probs.shape == (2, 3)
    labels = pred.labels(probs, prob_threshold=0.99)
    assert labels[0][1] == "Unknown"  # kalman warmup keeps probs < 0.99

    # headless camera mode over a tiny generated video
    vid = str(tmp_path / "in.avi")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"XVID"), 5.0, (64, 48))
    rng = np.random.RandomState(1)
    for _ in range(6):
        w.write(rng.randint(0, 256, (48, 64, 3), np.uint8))
    w.release()
    times = run_camera(
        "pmg", spec, params, str(tmp_path / "cam"), video_path=vid,
        display=False, measure_time=True, kalman_filter=True, max_frames=5,
    )
    assert len(times) == 5
    assert os.path.exists(tmp_path / "cam" / "times_camera.json")


def test_embeddings_and_tsne(tmp_path, model):
    from wadt.data import BatchLoader, MultiTaskDataset
    from wadt.engine.executor import Engine
    from wadt.workloads.embed import compute_embeddings, export_interactive_html, perform_tsne

    from tools.make_synth_dataset import make as make_synth

    synth = make_synth(str(tmp_path / "synth"), n_per_class=2, size=64)
    ds = MultiTaskDataset(
        os.path.join(synth, "dataset.json"), os.path.join(synth, "tasks.json")
    )
    import jax

    spec = pmg.build_spec(json.load(open(os.path.join(synth, "tasks.json"))), TINY)
    params = pmg.init(jax.random.PRNGKey(0), spec)
    eng = Engine("pmg", spec, params, batch_size=4)
    loader = BatchLoader(ds, batch_size=4, num_workers=2)
    embs, labs, paths = compute_embeddings(eng, loader, kind="logits", per_task=True)
    assert embs["Weather Type"].shape == (8, 4)
    assert len(paths["Weather Type"]) == 8
    x2d, png = perform_tsne(
        embs["Weather Type"], labs["Weather Type"], ["Clear", "Rain", "Snow", "Fog"],
        None, str(tmp_path / "viz"), "Weather Type",
    )
    assert x2d.shape == (8, 2) and os.path.exists(png)
    html = export_interactive_html(
        {"Weather Type": x2d}, {"Weather Type": labs["Weather Type"]},
        {"Weather Type": ["Clear", "Rain", "Snow", "Fog"]},
        {"Weather Type": paths["Weather Type"]},
        str(tmp_path / "viz" / "tsne.html"),
    )
    assert os.path.getsize(html) > 1000
    src = open(html).read()
    # click-to-view thumbnails embedded (reference tsne_utils.py:363) and the
    # per-class color picker (reference :213)
    assert "const THUMBS=" in src and "/9j/" in src  # base64 JPEG magic
    assert "input" in src and "color" in src
    # thumbnail cap respected
    html2 = export_interactive_html(
        {"Weather Type": x2d}, {"Weather Type": labs["Weather Type"]},
        {"Weather Type": ["Clear", "Rain", "Snow", "Fog"]},
        {"Weather Type": paths["Weather Type"]},
        str(tmp_path / "viz" / "tsne2.html"), thumb_limit=2,
    )
    src2 = open(html2).read()
    assert src2.count("/9j/") <= 2


def test_headless_recording_writes_video(model, tmp_path):
    """Regression: --save_camera_video with no display must still record
    (record=True starts immediately; the 'r' key needs a window)."""
    import cv2

    from wadt.workloads.stream import run_camera

    spec, params = model
    vid = str(tmp_path / "in2.avi")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"XVID"), 5.0, (64, 48))
    rng = np.random.RandomState(2)
    for _ in range(4):
        w.write(rng.randint(0, 256, (48, 64, 3), np.uint8))
    w.release()
    out = tmp_path / "cam2"
    run_camera("pmg", spec, params, str(out), video_path=vid, display=False,
               save_camera_video=True, record=True, max_frames=3)
    vids = [f for f in os.listdir(out) if f.endswith(".avi")]
    assert len(vids) == 1 and os.path.getsize(out / vids[0]) > 1000


def test_embedding_kind_validation(model):
    from wadt.engine.executor import Engine
    from wadt.workloads.embed import compute_embeddings

    spec, params = model
    eng = Engine("pmg", spec, params, batch_size=4)
    with pytest.raises(ValueError, match="not exposed"):
        compute_embeddings(eng, [], kind="task")


def test_packed_forward_bitexact():
    """pmg.apply_packed == apply(normalize_uint8(...)) for non-overlapping
    first blocks (the streaming fast path's correctness contract)."""
    import jax
    import jax.numpy as jnp

    from wadt.models import pmg
    from wadt.ops.preprocess import normalize_uint8, s2d_pack_uint8

    spec = pmg.build_spec(
        {"A": ["a0", "a1"], "B": ["b0", "b1", "b2"]},
        dict(ndf=8, patch_size=16, patch_div=2, gram_channels=16, d_model=32,
             transformer_layers=1, transformer_heads=2, norm="batch"),
    )
    assert pmg.supports_packed_input(spec)
    params = pmg.init(jax.random.PRNGKey(0), spec)
    u8 = np.random.RandomState(0).randint(0, 256, (2, 64, 64, 3), np.uint8)
    want, waux = pmg.apply(
        params, normalize_uint8(jnp.asarray(u8)), spec, capture=("features",)
    )
    got, gaux = pmg.apply_packed(
        params, jnp.asarray(s2d_pack_uint8(u8, spec.plan[0].kernel)), spec,
        capture=("features",),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gaux["features"]), np.asarray(waux["features"]),
        atol=1e-5, rtol=1e-5,
    )
    # Engine auto-packs raw input and accepts pre-packed batches equally
    from wadt.engine.executor import Engine

    eng = Engine("pmg", spec, params, batch_size=4, prob_threshold=0.0)
    assert eng.pack_k == spec.plan[0].kernel
    raw = eng.run(u8, collect=("probs",))["probs"]
    packed = eng.run(s2d_pack_uint8(u8, eng.pack_k), collect=("probs",))["probs"]
    np.testing.assert_allclose(raw, packed, atol=1e-6)
    eng_off = Engine("pmg", spec, params, batch_size=4, prob_threshold=0.0,
                     packed="off")
    off = eng_off.run(u8, collect=("probs",))["probs"]
    np.testing.assert_allclose(raw, off, atol=1e-5)


def test_stream_predictor_packed_matches_generic(model):
    """StreamPredictor's packed fast path must give the same probabilities
    as the generic step (model fixture is a tiny PMG)."""
    from wadt.workloads.stream import StreamPredictor

    family = "pmg"
    spec, params = model
    pred = StreamPredictor(family, spec, params)
    frame = np.random.RandomState(1).randint(0, 256, (64, 64, 3), np.uint8)
    probs = pred(frame)
    if pred._pack_k is None:
        pytest.skip("model has an overlapping first block")
    # force the generic path for comparison
    pred_generic = StreamPredictor(family, spec, params)
    pred_generic._pack_k = None
    import jax
    import jax.numpy as jnp

    from wadt.engine.executor import class_mask, masked_softmax
    from wadt.models import get_family
    from wadt.ops import kalman
    from wadt.ops.preprocess import normalize_uint8

    mod = get_family(family)
    mask = jnp.asarray(class_mask(spec.tasks))

    @jax.jit
    def gstep(p, f, k):
        x = normalize_uint8(f[None])
        lg, _ = mod.apply(p, x, spec)
        pr = masked_softmax(lg.astype(jnp.float32), mask)[0]
        k, sm = kalman.filter_update(k, pr)
        return pr, k

    want, _ = gstep(params, frame, pred_generic.kstate)
    np.testing.assert_allclose(probs, np.asarray(want), atol=1e-5, rtol=1e-5)


def test_rtm_stream_folded_matches_generic():
    """The RTM streaming fast path (precomputed pq + folded proj@out,
    models/rtm.fold_stream_weights) must match the generic forward: argmax
    identical, probabilities within fold tolerance."""
    import jax

    from wadt.models import rtm
    from wadt.workloads.stream import StreamPredictor

    spec = rtm.build_spec(TASKS, dict(truncate_layer=5, attn_token_dim=32))
    params = rtm.init(jax.random.PRNGKey(3), spec)
    frame = np.random.RandomState(2).randint(0, 256, (64, 64, 3), np.uint8)

    folded = StreamPredictor("rtm", spec, params, trunk_kernel="folded")
    generic = StreamPredictor("rtm", spec, params, trunk_kernel="generic")
    assert folded._rtm_folded and not generic._rtm_folded
    pf, pg = folded(frame), generic(frame)
    np.testing.assert_allclose(pf, pg, atol=5e-5, rtol=1e-4)
    np.testing.assert_array_equal(pf.argmax(-1), pg.argmax(-1))

    # weight-only int8 fold: argmax preserved, probs within quant tolerance;
    # the stored fold really is int8 (the HBM read is the point)
    q8 = StreamPredictor("rtm", spec, params, trunk_kernel="folded_q8")
    assert q8._rtm_fold_q8 and q8.params["attn_fold_q8"].dtype == np.int8
    assert "attn_fold" not in q8.params
    pq = q8(frame)
    np.testing.assert_allclose(pq, pg, atol=0.02)
    np.testing.assert_array_equal(pq.argmax(-1), pg.argmax(-1))


def test_pmg_head_fold_matches_generic(model):
    """fold_head_weights (bf16 / weight-only-int8 token_proj) must preserve
    the argmax and stay within compression tolerance of the exact head on
    the same gram tokens (the fused streaming path's selection gate —
    utils/goldens.pmg_head_fold_fixture_parity walks the golden fixtures
    with the same math on the chip)."""
    import jax
    import jax.numpy as jnp

    spec, params = model
    rng = np.random.RandomState(7)
    tokens = jnp.asarray(
        rng.randn(2, spec.patch_div ** 2, spec.gram_channels ** 2)
        .astype(np.float32)
    )
    want = np.asarray(pmg.head_from_gram_tokens(params, tokens, spec))

    fb = pmg.fold_head_weights(params, spec, "bf16")
    assert fb["token_proj"]["w"].dtype == jnp.bfloat16
    got_b = np.asarray(pmg.head_from_gram_tokens(fb, tokens, spec))
    np.testing.assert_allclose(got_b, want, atol=0.05, rtol=0.05)
    np.testing.assert_array_equal(got_b.argmax(-1), want.argmax(-1))

    fq = pmg.fold_head_weights(params, spec, "q8")
    assert fq["token_proj"]["w8"].dtype == np.int8
    assert "w" not in fq["token_proj"]  # the 1-byte read is the point
    got_q = np.asarray(pmg.head_from_gram_tokens(fq, tokens, spec))
    np.testing.assert_allclose(got_q, want, atol=0.05, rtol=0.05)
    np.testing.assert_array_equal(got_q.argmax(-1), want.argmax(-1))

    with pytest.raises(ValueError):
        pmg.fold_head_weights(params, spec, "int4")


def test_pmg_head_fold_golden_fixtures():
    """The head-fold parity walk (the record/release gate) passes on the
    frozen reference fixtures: argmax identical for both variants."""
    import wadt

    from wadt.utils.goldens import pmg_head_fold_fixture_parity

    wadt.config.enable_parity_precision()
    fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
    for variant in ("bf16", "q8"):
        rows = pmg_head_fold_fixture_parity(fixtures, variant)
        assert rows, "no PMG fixtures found"
        for name, agree, drift in rows:
            assert agree, f"{variant} head fold flips argmax on {name} (drift {drift})"


def test_pmg_fused_head_kernel_matches_generic(model):
    """ops/pallas_kernels.fused_head (interpret mode on CPU) must match the
    XLA head on the same fold_head_weights tree within compression
    tolerance, argmax identical — incl. a no-transformer spec (the kernel
    skips the encoder loop)."""
    import jax
    import jax.numpy as jnp

    from wadt.ops.pallas_kernels import fused_head

    spec, params = model
    rng = np.random.RandomState(11)
    tokens = jnp.asarray(
        rng.randn(2, spec.patch_div ** 2, spec.gram_channels ** 2)
        .astype(np.float32)
    )
    want = np.asarray(pmg.head_from_gram_tokens(params, tokens, spec))
    for variant in ("bf16", "q8"):
        folded = pmg.fold_head_weights(params, spec, variant)
        got = np.asarray(fused_head(tokens, folded, spec, interpret=True))
        np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)
        np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))

    spec2 = pmg.build_spec(
        {"A": ["a0", "a1", "a2"]},
        dict(ndf=8, patch_size=64, patch_div=2, gram_channels=16,
             d_model=32, transformer_layers=0, norm="batch",
             use_token_attention=False),
    )
    assert not spec2.has_transformer
    params2 = pmg.init(jax.random.PRNGKey(1), spec2)
    tokens2 = jnp.asarray(rng.randn(1, 4, 256).astype(np.float32))
    w2 = np.asarray(pmg.head_from_gram_tokens(params2, tokens2, spec2))
    g2 = np.asarray(fused_head(
        tokens2, pmg.fold_head_weights(params2, spec2, "bf16"), spec2,
        interpret=True))
    np.testing.assert_allclose(g2, w2, atol=0.02, rtol=0.02)


def test_pmg_head_fold_golden_fixtures_pallas():
    """The goldens walk also gates the fused head kernel variants (interpret
    mode on CPU; compiled on the chip by tools/tpu_checklist.py)."""
    import wadt

    from wadt.utils.goldens import pmg_head_fold_fixture_parity

    wadt.config.enable_parity_precision()
    fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
    rows = pmg_head_fold_fixture_parity(fixtures, "pallas_q8")
    assert rows, "no PMG fixtures found"
    for name, agree, drift in rows:
        assert agree, f"pallas_q8 head flips argmax on {name} (drift {drift})"


def test_stream_head_fold_auto_honors_record(model, monkeypatch):
    """trunk_kernel/head_fold 'auto' must follow the recorded winners: with
    a record naming the pallas trunk + bf16 head fold, StreamPredictor
    derives compressed head params at construction (no step execution —
    the pallas kernel itself is chip-gated)."""
    import jax.numpy as jnp

    from wadt.ops import kernel_select
    from wadt.ops.pallas_kernels import supports_fused_trunk_gram
    from wadt.workloads.stream import StreamPredictor

    spec, params = model
    if not supports_fused_trunk_gram(spec):
        pytest.skip("tiny spec lacks a fused-compatible trunk plan")
    wins = {"fused_trunk_gram": "pallas", "pmg_head_fold": "bf16"}
    monkeypatch.setattr(
        kernel_select, "winner",
        lambda op, default="xla": wins.get(op, default),
    )
    pred = StreamPredictor("pmg", spec, params)
    assert pred._fused
    assert pred.params["token_proj"]["w"].dtype == jnp.bfloat16
    assert "trunk" not in pred.params  # head-only tree on the fused path

    wins["pmg_head_fold"] = "nonsense-variant"
    pred2 = StreamPredictor("pmg", spec, params)  # warn + exact f32 head
    assert pred2.params["token_proj"]["w"].dtype == jnp.float32
