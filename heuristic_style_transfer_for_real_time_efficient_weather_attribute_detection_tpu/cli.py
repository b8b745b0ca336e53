"""Unified CLI — one ``weather`` command with the model family as the first
positional, mirroring the reference's three entry points and flag names
(test_PM.py:39-122, test_PMG.py:35-82, test_RTM.py:20-80).

Modes: classifier, benchmark, inference, folder, watch_folder, camera, tsne,
tsne_interactive, clustering (+ --style_transfer epilogue for PMG and
Grad-CAM / Integrated-Gradients options).

Examples:
  python weather.py pmg --mode classifier --data ds.json \\
      --build_classifier configs/tasks.json --model_path best_model_PMG.pth
  python weather.py pmg --mode benchmark --model_path ... \\
      --benchmark_folder bench/ --benchmark_mapping configs/benchmark_mapping.json
  python weather.py rtm --mode folder --test_images_folder imgs/ ...
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Any, Dict

MODES = [
    "classifier", "tsne", "tsne_interactive", "clustering", "camera",
    "benchmark", "folder", "watch_folder", "inference", "train", "serve",
    "export",
]


def build_argparser() -> argparse.ArgumentParser:
    from . import __version__

    p = argparse.ArgumentParser(
        prog="weather",
        description="TPU-native multi-task weather attribute detection",
    )
    p.add_argument("--version", action="version", version=f"%(prog)s {__version__}")
    p.add_argument("family", choices=["pm", "pmg", "rtm"], help="model family")
    p.add_argument("--data", type=str, help="dataset manifest JSON")
    p.add_argument("--build_classifier", type=str, default=None,
                   help="tasks/classes registry JSON (required except for "
                        "`--mode serve --exported`, which reads tasks from "
                        "the artifact)")
    p.add_argument("--model_path", type=str, default=None,
                   help=".pth / .npz checkpoint (omit for random init)")
    p.add_argument("--config_path", type=str, default=None, help="hparams JSON")
    p.add_argument("--mode", choices=MODES, default="classifier")
    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--save_dir", default="results", type=str)
    p.add_argument("--prob_threshold", default=None, type=float,
                   help="min max-probability before a prediction becomes "
                        "Unknown (default 0.5; `--mode serve --exported` "
                        "defaults to the artifact's recorded threshold)")
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--measure_time", action="store_true")
    p.add_argument("--scan_chunk", default="off",
                   help="classifier mode: stack k full batches into one "
                        "lax.scan dispatch (the sustained loop program — "
                        "'auto' picks the recorded per-family winner, an "
                        "int forces k, 'off' = per-batch).  Metrics are "
                        "identical; --measure_time forces per-batch "
                        "(times_*.json is one wall-time per batch)")
    p.add_argument("--num_samples", type=int, default=None)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--count_params", action="store_true")
    p.add_argument("--search_folder", type=str, default=None)
    p.add_argument("--find_images_by_sub_folder", type=str, default=None)
    p.add_argument("--bf16", action="store_true", help="bfloat16 activations")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler device trace (classifier mode)")
    p.add_argument("--export_torch", type=str, default=None,
                   help="export the (converted) params as a reference-loadable .pth")
    p.add_argument("--save_pred_images", action="store_true",
                   help="benchmark mode: GT/Pred green-red annotated overlays")
    p.add_argument("--pred_images_dir", type=str, default=None,
                   help="benchmark overlay output dir (default "
                        "<save_dir>/pred_images; RTM_evaluation.py:1227)")
    p.add_argument("--overlay_topk", type=int, default=1,
                   help="benchmark overlay: top-k classes per task line "
                        "(the reference declares but ignores this; "
                        "implemented here)")
    p.add_argument("--draw_prob_threshold", type=float, default=None,
                   help="benchmark overlay: skip task lines whose top prob "
                        "is below this (reference declares but ignores)")
    p.add_argument("--no_gt_labels", action="store_true",
                   help="classifier-mode RTM overlays: omit the True: "
                        "ground-truth parts (test_RTM.py:70)")
    # PM attention-head overrides (test_PM.py:117-120).  Precedence mirrors
    # the reference: config/sidecar value wins over the CLI flag, and the
    # checkpoint SE probe decides attn_use_se whenever weights are loaded.
    p.add_argument("--ablate_attention", action="store_true")
    p.add_argument("--attn_use_se", action="store_true", default=None)
    p.add_argument("--attn_no_softmax", action="store_true")
    p.add_argument("--attn_tau", type=float, default=0.7)
    p.add_argument("--parity_precision", action="store_true",
                   help="full-f32 matmuls (bit-parity with the torch reference)")
    p.add_argument("--compilation_cache", nargs="?", type=str, default=None,
                   const=os.path.join("~", ".cache", "wadt", "xla_cache"),
                   metavar="DIR",
                   help="persist compiled XLA executables to DIR (default "
                        "~/.cache/wadt/xla_cache) so repeat CLI runs skip the "
                        "20-40s first compile")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the batch axis across all visible devices")
    # explainability
    p.add_argument("--visualize_gradcam", action="store_true")
    p.add_argument("--save_gradcam_images", action="store_true")
    p.add_argument("--gradcam_task", type=str, default=None)
    p.add_argument("--colormap", type=str, default="hot")
    p.add_argument("--integrated_gradients", action="store_true")
    # inference/folder
    p.add_argument("--image_folder", type=str)
    p.add_argument("--test_images_folder", type=str)
    p.add_argument("--target_task", type=str, default=None)
    p.add_argument("--save_test_images", action="store_true")
    # watch mode
    p.add_argument("--watch_folders", type=str, default=None,
                   help="comma-separated folders")
    p.add_argument("--poll_intervals", type=str, default=None,
                   help="comma-separated seconds")
    p.add_argument("--save_dir_to_canon", default=None, type=str)
    p.add_argument("--truth_mapping", type=str, default=None,
                   help="sensor truth-rule JSON (rolling service metrics)")
    p.add_argument("--annotations_folder", type=str, default=None)
    p.add_argument("--eval_annotations", action="store_true",
                   help="watch mode: require sensor-annotation eval "
                        "(errors without --annotations_folder, "
                        "test_PM.py:111; with the folder given, eval is "
                        "on either way)")
    p.add_argument("--metrics_every", type=int, default=10)
    # camera
    p.add_argument("--camera_index", type=int, default=0)
    p.add_argument("--kalman_filter", action="store_true")
    p.add_argument("--save_camera_video", action="store_true")
    p.add_argument("--video_path", type=str, default=None,
                   help="use a video file instead of the webcam")
    p.add_argument("--no_display", action="store_true")
    p.add_argument("--record", action="store_true",
                   help="start recording immediately (headless recording; "
                        "with a display the 'r' key toggles)")
    p.add_argument("--max_frames", type=int, default=None)
    # benchmark
    p.add_argument("--benchmark_folder", type=str)
    p.add_argument("--benchmark_mapping", type=str)
    p.add_argument("--roc_output", type=str, default="roc_curves")
    p.add_argument("--auto_mapping", action="store_true")
    # tsne / clustering
    p.add_argument("--per_task_tsne", action="store_true")
    p.add_argument("--no_thumbnails", action="store_true",
                   help="tsne_interactive: skip embedding click-to-view thumbnails")
    p.add_argument("--thumb_limit", type=int, default=2000,
                   help="tsne_interactive: max unique images embedded as thumbnails")
    p.add_argument("--colors", nargs="+", default=None)
    p.add_argument("--embedding_kind", choices=["logits", "task", "shared", "pooled"],
                   default=None, help="embedding tap (default: family-native)")
    p.add_argument("--clustering_class", type=str)
    p.add_argument("--clustering_task", type=str, default=None)
    p.add_argument("--min_cluster_size", type=int, nargs="+", default=[10, 15, 20])
    p.add_argument("--min_samples", type=int, nargs="+", default=[5, 10])
    # style transfer (PMG)
    p.add_argument("--style_transfer", action="store_true")
    p.add_argument("--target_loss", type=float, default=1e-18)
    p.add_argument("--style_iterations", type=int, default=300)
    p.add_argument("--lr", type=float, default=0.0005)
    p.add_argument("--init_type", type=str, default="noise")
    # training (train mode; recorded reference recipe)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--train_lr", type=float, default=3e-4)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--accum_steps", type=int, default=1)
    p.add_argument("--balance_loss", action="store_true")
    p.add_argument("--use_focal", action="store_true")
    p.add_argument("--focal_gamma", type=float, default=2.0)
    p.add_argument("--val_split", type=float, default=0.2)
    p.add_argument("--freeze_encoder", action="store_true")
    p.add_argument("--dropout_rate", type=float, default=0.1,
                   help="transformer train-mode dropout (reference default)")
    p.add_argument("--augment", action="store_true",
                   help="device-side train augmentation (random flip, "
                        "<=8px translate, brightness/contrast jitter) fused "
                        "into the jitted step; resume-exact")
    p.add_argument("--resume", action="store_true",
                   help="continue from save_dir/last_state (full optimizer state)")
    p.add_argument("--save_every", type=int, default=1,
                   help="epochs between resumable TrainState checkpoints")
    # serve mode
    p.add_argument("--host", type=str, default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_wait_ms", type=float, default=2.0,
                   help="micro-batch coalescing window")
    p.add_argument("--max_body_mb", type=float, default=32.0,
                   help="reject POST bodies over this size with 413")
    p.add_argument("--result_timeout_s", type=float, default=60.0,
                   help="per-request inference timeout (504 on expiry)")
    p.add_argument("--max_queue", type=int, default=None,
                   help="pending-request cap before 503 (default 2*batch*depth)")
    # export mode (AOT serving artifact)
    p.add_argument("--export_dir", type=str, default=None,
                   help="export mode: artifact output dir "
                        "(default save_dir/exported)")
    p.add_argument("--export_platforms", type=str, default="cpu,tpu",
                   help="export mode: comma-separated lowering targets")
    p.add_argument("--exported", type=str, default=None,
                   help="serve mode: serve from an AOT export artifact dir "
                        "(no model code / checkpoint load)")
    # RTM architecture flags
    p.add_argument("--no_attention", action="store_true")
    p.add_argument("--attn_token_dim", type=int, default=None)
    p.add_argument("--cls_hidden_dims", type=int, nargs="*", default=[])
    p.add_argument("--cls_num_layers", type=int, default=0)
    return p


def build_engine(args) -> "Any":
    import jax
    import jax.numpy as jnp

    from .config import load_hparams, load_tasks
    from .engine import checkpoint
    from .utils.reporting import print_model_parameters

    if args.parity_precision:
        from .config import enable_parity_precision

        enable_parity_precision()

    if args.compilation_cache:
        from .config import enable_persistent_compilation_cache

        cache_dir = enable_persistent_compilation_cache(
            os.path.expanduser(args.compilation_cache)
        )
        print(f"XLA compilation cache: {cache_dir}")

    tasks = load_tasks(args.build_classifier)
    print(f"Tasks: {len(tasks)} -> {list(tasks)}")
    hparams: Dict[str, Any] = load_hparams(args.config_path, args.model_path)

    native_dir = args.model_path and os.path.isdir(args.model_path)
    if args.family == "pm":
        # CLI fallbacks for the attention-head knobs — a config/sidecar
        # value wins, mirroring the reference precedence
        # (test_PM.py:146-150).  attn_use_se is decided by load_engine's
        # checkpoint SE probe whenever weights are loaded (test_PM.py:149-150).
        hparams.setdefault("attn_tau", args.attn_tau)
        hparams.setdefault("attn_softmax_spatial", not args.attn_no_softmax)
        # ablate_attention: the reference passes the CLI value straight to
        # the model, never consulting config (test_PM.py:163) — so the
        # flag always wins here too
        hparams["ablate_attention"] = args.ablate_attention
        # attn_use_se is explicit-enable only: a no-checkpoint build
        # without the flag keeps the spec default (SE on, like the PM
        # model class)
        if args.attn_use_se:
            hparams.setdefault("attn_use_se", True)
    if args.family == "rtm":
        hparams.setdefault("use_attention", not args.no_attention)
        if args.attn_token_dim is not None:
            hparams.setdefault("attn_token_dim", args.attn_token_dim)
        hparams.setdefault("cls_hidden_dims", args.cls_hidden_dims)
        hparams.setdefault("cls_num_layers", args.cls_num_layers)

    mesh = None
    if args.data_parallel:
        from .parallel.mesh import make_mesh

        n = len(jax.devices())
        if n > 1:
            if args.batch_size % n:
                raise ValueError(
                    f"--batch_size {args.batch_size} must divide evenly over "
                    f"{n} devices for --data_parallel"
                )
            mesh = make_mesh(n)
            print(f"data-parallel over {n} devices")
        else:
            print("[data_parallel] single device visible; running unsharded")

    from . import load_engine

    engine = load_engine(
        args.family,
        args.model_path,
        tasks,
        hparams,
        batch_size=args.batch_size,
        prob_threshold=args.prob_threshold,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        mesh=mesh,
    )
    if native_dir:
        print(f"Native (Orbax) checkpoint loaded from {args.model_path}")
    elif args.model_path:
        print(f"Model loaded from {args.model_path}")
    else:
        print("[WARN] no --model_path: random initialization")

    if args.count_params:
        print_model_parameters(args.family, engine.params, engine.spec)
    if args.export_torch:
        checkpoint.save_torch_checkpoint(
            args.family, engine.params, engine.spec, args.export_torch
        )
        print(f"exported torch-format checkpoint to {args.export_torch}")

    return engine


def make_loader(args, engine):
    from .data import BatchLoader, MultiTaskDataset

    if not args.data:
        raise ValueError("--data is required for this mode.")
    ds = MultiTaskDataset(
        args.data,
        args.build_classifier,
        search_folder=args.search_folder,
        find_images_by_sub_folder=args.find_images_by_sub_folder,
    )
    ds.subsample(args.num_samples)
    return ds, BatchLoader(ds, batch_size=args.batch_size, num_workers=args.num_workers,
                           pack_k=engine.pack_k)


def main(argv=None) -> int:
    parser = build_argparser()
    args = parser.parse_args(argv)
    os.makedirs(args.save_dir, exist_ok=True)

    if args.mode == "serve" and args.exported:
        # artifact serving: tasks/weights live in the exported module — no
        # registry, model code, or checkpoint load
        from .engine.export import ExportedPredictor
        from .workloads.serve import InferenceServer

        pred = ExportedPredictor(args.exported)
        if args.prob_threshold is None:
            # the artifact's baked "preds" used this threshold at export
            # time — serve consistently with it unless explicitly overridden
            args.prob_threshold = float(pred.meta.get("prob_threshold", 0.5))
        pred.warmup()
        InferenceServer(pred, host=args.host, port=args.port,
                        prob_threshold=args.prob_threshold,
                        max_wait_ms=args.max_wait_ms,
                        max_body_bytes=int(args.max_body_mb * 1024 * 1024),
                        result_timeout_s=args.result_timeout_s,
                        max_queue=args.max_queue).serve_forever()
        return 0

    if args.prob_threshold is None:
        args.prob_threshold = 0.5
    if not args.build_classifier:
        parser.error("--build_classifier is required for this mode")
    engine = build_engine(args)
    tasks_dict = engine.tasks.as_dict()

    writer = None
    if args.tensorboard:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(log_dir=os.path.join(args.save_dir, "TensorBoard"))

    if args.mode == "classifier":
        from .workloads.evaluate import evaluate

        ds, loader = make_loader(args, engine)
        evaluate(engine, loader, args.save_dir,
                 measure_time=args.measure_time, tensorboard_writer=writer,
                 save_test_images=args.save_test_images, profile=args.profile,
                 show_gt_labels=not args.no_gt_labels,
                 scan_chunk=args.scan_chunk)

        if args.visualize_gradcam or args.integrated_gradients:
            _run_explain(args, engine, ds, writer)
        if args.style_transfer:
            _run_style_transfer(args, engine, ds)

    elif args.mode == "train":
        from .workloads.train import fit

        if not args.data:
            raise ValueError("train mode needs --data")
        fit(
            args.family, engine.spec, args.data, args.build_classifier,
            args.save_dir,
            options=dict(
                epochs=args.epochs, batch_size=args.batch_size,
                lr=args.train_lr, weight_decay=args.weight_decay,
                accum_steps=args.accum_steps, balance_loss=args.balance_loss,
                use_focal=args.use_focal, focal_gamma=args.focal_gamma,
                val_split=args.val_split, freeze_encoder=args.freeze_encoder,
                num_workers=args.num_workers, dropout_rate=args.dropout_rate,
                resume=args.resume, save_every=args.save_every,
                bf16=args.bf16, augment=args.augment,
            ),
            init_params=engine.params if args.model_path else None,
            # --data_parallel: shard train batches over the engine's mesh
            mesh=engine.mesh,
        )

    elif args.mode == "serve":
        from .workloads.serve import InferenceServer

        engine.warmup()
        InferenceServer(engine, host=args.host, port=args.port,
                        prob_threshold=args.prob_threshold,
                        max_wait_ms=args.max_wait_ms,
                        max_body_bytes=int(args.max_body_mb * 1024 * 1024),
                        result_timeout_s=args.result_timeout_s,
                        max_queue=args.max_queue).serve_forever()

    elif args.mode == "export":
        from .engine.export import export_engine

        out = args.export_dir or os.path.join(args.save_dir, "exported")
        meta = export_engine(
            engine, out,
            platforms=tuple(
                s.strip() for s in args.export_platforms.split(",") if s.strip()
            ),
        )
        print(f"exported {meta['family']} forward (batch {meta['batch_size']}, "
              f"platforms {','.join(meta['platforms'])}) -> {out}")

    elif args.mode == "benchmark":
        from .workloads.benchmark import run_benchmark

        if not args.benchmark_folder or not args.benchmark_mapping:
            raise ValueError("benchmark mode needs --benchmark_folder and --benchmark_mapping")
        run_benchmark(engine, args.benchmark_folder, args.benchmark_mapping,
                      args.save_dir, args.roc_output,
                      auto_mapping=args.auto_mapping, num_samples=args.num_samples,
                      num_workers=args.num_workers,
                      save_pred_images=args.save_pred_images,
                      pred_images_dir=args.pred_images_dir,
                      overlay_topk=args.overlay_topk,
                      draw_prob_threshold=args.draw_prob_threshold)

    elif args.mode == "inference":
        from .workloads.inference import run_inference

        folder = args.image_folder or args.test_images_folder
        if not folder:
            raise ValueError("inference mode needs --image_folder")
        run_inference(engine, folder, save_dir=args.save_dir,
                      num_samples=args.num_samples,
                      save_test_images=args.save_test_images,
                      num_workers=args.num_workers,
                      visualize_gradcam=args.visualize_gradcam,
                      gradcam_task=args.gradcam_task, colormap=args.colormap)

    elif args.mode == "folder":
        from .workloads.inference import test_folder_predictions

        folder = args.test_images_folder or args.image_folder
        if not folder:
            raise ValueError("folder mode needs --test_images_folder")
        test_folder_predictions(engine, folder, args.save_dir,
                                save_test_images=args.save_test_images,
                                target_task=args.target_task,
                                num_workers=args.num_workers)

    elif args.mode == "watch_folder":
        from .workloads.inference import WatchFolderService

        if not args.watch_folders:
            raise ValueError("watch_folder mode needs --watch_folders")
        if args.eval_annotations and not args.annotations_folder:
            # the reference's explicit gate (test_PM.py:833-836)
            raise ValueError(
                "--eval_annotations needs --annotations_folder")
        folders = [f for f in args.watch_folders.split(",") if f]
        intervals = (
            [float(x) for x in args.poll_intervals.split(",")]
            if args.poll_intervals
            else [5.0] * len(folders)
        )
        svc = WatchFolderService(
            engine, folders, intervals, args.save_dir,
            save_dir_to_canon=args.save_dir_to_canon,
            truth_mapping_path=args.truth_mapping,
            annotations_folder=args.annotations_folder,
            metrics_every=args.metrics_every,
        )
        svc.start(block=True)

    elif args.mode == "camera":
        import jax.numpy as jnp

        from .workloads.stream import run_camera

        run_camera(args.family, engine.spec, engine.params, args.save_dir,
                   prob_threshold=args.prob_threshold,
                   measure_time=args.measure_time,
                   camera_index=args.camera_index,
                   kalman_filter=args.kalman_filter,
                   save_camera_video=args.save_camera_video,
                   video_path=args.video_path,
                   display=not args.no_display,
                   max_frames=args.max_frames,
                   record=args.record,  # headless implication lives in run_camera
                   dtype=jnp.bfloat16 if args.bf16 else jnp.float32)

    elif args.mode in ("tsne", "tsne_interactive"):
        from .workloads.embed import compute_embeddings, export_interactive_html, perform_tsne

        ds, loader = make_loader(args, engine)
        kind = args.embedding_kind or {"pmg": "logits", "rtm": "task", "pm": "task"}[args.family]
        per_task = args.per_task_tsne or args.mode == "tsne_interactive"
        embs, labs, paths = compute_embeddings(engine, loader, kind=kind, per_task=per_task)
        if args.mode == "tsne":
            if per_task:
                for t in engine.tasks.names:
                    perform_tsne(embs[t], labs[t], tasks_dict[t], args.colors,
                                 args.save_dir, t)
            else:
                first = engine.tasks.names[0]
                perform_tsne(embs, labs, tasks_dict[first], args.colors,
                             args.save_dir, "AllTasks")
        else:
            x2d = {}
            for t in engine.tasks.names:
                x2d[t], _ = perform_tsne(embs[t], labs[t], tasks_dict[t],
                                         args.colors, args.save_dir, t)
            export_interactive_html(
                x2d, labs, tasks_dict, paths,
                os.path.join(args.save_dir, "tsne_interactive.html"),
                thumbnails=not args.no_thumbnails,
                thumb_limit=args.thumb_limit,
            )

    elif args.mode == "clustering":
        from .workloads.embed import clustering_mode

        if not args.clustering_class:
            raise ValueError("clustering mode needs --clustering_class")
        ds, loader = make_loader(args, engine)
        task = args.clustering_task or engine.tasks.names[0]
        kind = args.embedding_kind or {"pmg": "logits", "rtm": "task", "pm": "task"}[args.family]
        clustering_mode(engine, loader, task, args.clustering_class, args.save_dir,
                        args.min_cluster_size, args.min_samples, kind=kind)

    if writer:
        writer.close()
    return 0


def _run_explain(args, engine, ds, writer=None):
    from .workloads.explain import Explainer, ig_heatmap, overlay_cam, save_gradcam_batch
    from .data import BatchLoader

    explainer = Explainer(args.family, engine.spec, engine.params)
    task = args.gradcam_task or engine.tasks.names[0]
    if task not in engine.tasks.names:
        print(f"[GradCAM] Task '{task}' not in registry -> disabled.")
        return
    loader = BatchLoader(ds, batch_size=args.batch_size, num_workers=args.num_workers)
    gradcam_dir = os.path.join(args.save_dir, "gradcam")
    ig_dir = os.path.join(args.save_dir, "integrated_gradients")
    for bi, (images, labels, paths) in enumerate(loader):
        if args.visualize_gradcam and args.save_gradcam_images:
            save_gradcam_batch(explainer, images, labels, task, gradcam_dir,
                               batch_idx=bi, cmap=args.colormap)
        if args.visualize_gradcam and writer is not None and bi == 0:
            # TensorBoard Grad-CAM image logging (RTM parity,
            # Functions/RTM_evaluation.py:442-444): first batch's overlays.
            targets = explainer.resolve_targets(task, labels, explainer.logits(images))
            cam, _ = explainer.gradcam(images, task, targets)
            for i in range(min(4, images.shape[0])):
                over = overlay_cam(images[i], cam[i], args.colormap)
                writer.add_image(f"GradCAM/{task}/{i}", over, dataformats="HWC")
        if args.integrated_gradients:
            import cv2

            os.makedirs(ig_dir, exist_ok=True)
            targets = explainer.resolve_targets(
                task, labels, explainer.logits(images), default_argmax=False)
            attrs = explainer.integrated_gradients(images, task, targets)
            for i in range(images.shape[0]):
                heat = ig_heatmap(attrs[i])
                over = overlay_cam(images[i], heat, args.colormap)
                out = os.path.join(ig_dir, f"ig_b{bi:04d}_i{i:03d}_task-{task}.png")
                cv2.imwrite(out, cv2.cvtColor(over, cv2.COLOR_RGB2BGR))


def _run_style_transfer(args, engine, ds):
    from PIL import Image

    import numpy as np

    from .ops.preprocess import load_image_normalized
    from .workloads.style_transfer import (
        run_patch_gram_style_transfer_batch,
        style_transfer_composite,
    )

    if args.family != "pmg":
        print("[style-transfer] only the PMG family has a Gram trunk; skipping")
        return
    out_dir = os.path.join(args.save_dir, "StyleTransfer")
    os.makedirs(out_dir, exist_ok=True)
    n = min(args.num_samples or len(ds), len(ds))
    paths = [ds.samples[idx][0] for idx in range(n)]
    # One device optimization loop per chunk of images: every image in the
    # chunk runs its own Adam trajectory concurrently (per-image early stop),
    # instead of the reference's one-image-at-a-time outer loop.
    chunk = 32
    for lo in range(0, n, chunk):
        batch_paths = paths[lo : lo + chunk]
        print(
            f"style transfer images {lo + 1}-{lo + len(batch_paths)} of {n} "
            f"(one batched optimization)"
        )
        x = np.stack([load_image_normalized(p) for p in batch_paths])
        gens, losses, iters = run_patch_gram_style_transfer_batch(
            engine.params, engine.spec, x,
            num_iterations=args.style_iterations, lr=args.lr,
            init_type=args.init_type, target_loss=args.target_loss,
            seed_offset=lo,  # noise init keyed on each image's global index
        )
        for path, gen, loss, its in zip(batch_paths, gens, losses, iters):
            base = os.path.splitext(os.path.basename(path))[0]
            combined = style_transfer_composite(Image.open(path).convert("RGB"), gen)
            out = os.path.join(out_dir, f"{base}_styled.png")
            combined.save(out)
            print(f"saved {out} (loss={float(loss):.6f}, iters={int(its)})")


if __name__ == "__main__":
    sys.exit(main())
