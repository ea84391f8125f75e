"""Evaluation/inference CLI, family 1 — mode-compatible with the reference's
test_RESNET50_Truncate.py: classification / tsne / tsne_interactive / camera /
inference / clustering. The inference mode classifies arbitrary unlabelled
images from ``--inference_input`` (a directory walked recursively, or one
file) into ``inference_predictions.json`` — reference
test_RESNET50_Truncate.py:33-164,503-527 (tasks/inference.py here)."""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

from ..config.schema import TruncatedResNetConfig
from ..data.imagefolder import ImageFolderIndex
from ..data.loader import HostLoader
from ..models.truncated_resnet50 import combined_apply, truncated_moco_apply
from ._common import (
    apply_debug_flags,
    add_tpu_args,
    cast_forward,
    resolve_compute_dtype,
    start_profile,
    count_params,
    load_checkpoint_tree,
    make_writer,
    maybe_subset,
    resolve_class_names,
    resolve_eval_mesh,
)

MODES = ["classification", "tsne", "tsne_interactive", "camera", "inference", "clustering"]


def build_parser():
    parser = argparse.ArgumentParser(description="Truncated ResNet50 weather classifier (TPU)")
    parser.add_argument("--data", type=str)
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--batch_size", default=32, type=int)
    parser.add_argument("--num_samples", type=int, default=None)
    parser.add_argument("--save_dir", default="results", type=str)
    parser.add_argument("--tensorboard", action="store_true")
    parser.add_argument("--save_camera_video", action="store_true")
    parser.add_argument("--prob_threshold", default=0.5, type=float)
    parser.add_argument("--visualize_gradcam", action="store_true")
    parser.add_argument("--save_gradcam_images", action="store_true")
    parser.add_argument("--measure_time", action="store_true")
    parser.add_argument("--mode", choices=MODES, default="classification")
    parser.add_argument("--colors", nargs="+", default=None)
    parser.add_argument("--clustering_class", type=str)
    parser.add_argument("--min_cluster_size", type=int, nargs="+", default=[10, 15, 20])
    parser.add_argument("--min_samples", type=int, nargs="+", default=[5, 10])
    parser.add_argument("--kalman_filter", action="store_true")
    parser.add_argument("--save_test_images", action="store_true")
    parser.add_argument("--test_data", type=str)
    parser.add_argument("--list_cameras", action="store_true")
    parser.add_argument("--camera_index", type=str, default="0")
    parser.add_argument("--transport",
                        choices=["rgb", "yuv420", "yuv420_delta"],
                        default="rgb",
                        help="Camera-mode frame transport; yuv420 halves the "
                        "host->device bytes (needs host downscale); "
                        "yuv420_delta additionally temporal-delta-codes "
                        "frames (bit-exact reconstruction on device) so a "
                        "compressing link ships real video in a fraction of "
                        "the bytes")
    parser.add_argument("--device_preprocess", action="store_true",
                        help="Run the full resize pipeline on-device instead of "
                        "host-downscaling frames before transfer (prefer when "
                        "the TPU is directly attached)")
    parser.add_argument("--colormap", type=str, default="hot")
    parser.add_argument("--compute_auc", action="store_true")
    parser.add_argument("--classes", nargs="+", type=str)
    parser.add_argument("--afficher_params", action="store_true")
    # inference-mode arguments (test_RESNET50_Truncate.py:238-241)
    parser.add_argument(
        "--inference_input", type=str,
        help="Chemin vers un dossier d’images ou une image unique pour le "
        "mode inference",
    )
    parser.add_argument(
        "--inference_json_name", type=str,
        default="inference_predictions.json",
        help="Nom du fichier JSON de sortie pour le mode inference",
    )
    parser.add_argument(
        "--num_workers", type=int, default=4,
        help="Nombre de workers pour les DataLoader",
    )
    add_tpu_args(parser, precisions=("float32", "bf16", "int8"))
    from ._common import add_calib_data_arg, add_eval_dispatch_arg

    add_eval_dispatch_arg(parser)

    add_calib_data_arg(parser)
    parser.add_argument(
        "--quantized_path", type=str, default=None,
        help="Persisted quantised-encoder npz (int8): loaded if present "
        "(skips calibration — pairs with the warm compile cache for fast "
        "repeat evals), else written after calibration",
    )
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    apply_debug_flags(args)
    writer = make_writer(args.tensorboard, args.save_dir, "TensorBoard")

    if args.list_cameras:
        from ..tasks.camera import list_available_cameras

        print(f"Caméras disponibles : {list_available_cameras()}")
        return

    cfg = TruncatedResNetConfig.from_json(args.config_path)
    config = cfg.to_dict()
    class_names = resolve_class_names(args.classes, config, args.data)
    truncate = cfg.truncate_layer

    variables = load_checkpoint_tree(args.model_path, "truncated_resnet50", config)
    if "moco" not in variables or "classifier" not in variables:
        raise KeyError(
            f"Checkpoint {args.model_path} does not contain the family-1 "
            "{'moco', 'classifier'} tree."
        )

    if args.afficher_params:
        total = count_params(variables)
        print(f"Nombre total de paramètres du modèle (MoCo + Classifier) : {total}")

    def forward_eval(v, images):
        logits, _ = combined_apply(v["moco"], v["classifier"], images, truncate)
        return logits

    def embed_fn(v, images):
        emb, _ = truncated_moco_apply(v["moco"], images, truncate)
        return emb

    dtype = resolve_compute_dtype(args.precision)
    forward_eval = cast_forward(forward_eval, dtype)
    embed_fn = cast_forward(embed_fn, dtype)
    start_profile(args.profile_dir)

    _loader_cache = []

    def make_loader():
        if not args.data:
            raise ValueError("Le chemin du dataset doit être spécifié pour ce mode")
        if not _loader_cache:
            idx = ImageFolderIndex(os.path.join(args.data, "test"))
            samples = maybe_subset(idx.samples, args.num_samples, cfg.seed)
            _loader_cache.append(
                (idx, samples,
                 HostLoader(samples, args.batch_size, shuffle=False,
                            num_workers=args.num_workers))
            )
        return _loader_cache[0]

    if args.precision == "int8":
        # PTQ the encoder. Calibration source: --calib_data, else the --data
        # train/ split (never the evaluated test split unless nothing else
        # exists — make_calibration_loader warns in that case). Camera mode
        # works too when either flag provides a calibration set.
        has_quantized = args.quantized_path and os.path.exists(args.quantized_path)
        if (args.mode in ("camera", "inference")
                and not (args.data or args.calib_data or has_quantized)):
            raise ValueError(
                "--precision int8 nécessite un dataset de calibration "
                "(--calib_data ou --data) ou un --quantized_path existant; "
                f"utilisez bf16 pour le mode {args.mode} sans dataset"
            )
        from ._common import (
            build_int8_family1,
            collect_calibration_batches,
            make_calibration_loader,
        )

        cal = labeled = None
        if not has_quantized:
            cal_loader = make_calibration_loader(args, args.batch_size)
            if args.qat_steps:
                labeled = collect_calibration_batches(
                    cal_loader, n=4, with_labels=True
                )
                cal = [images for images, _ in labeled[:2]]
            else:
                cal = collect_calibration_batches(cal_loader)
        forward_eval, embed_fn, variables = build_int8_family1(  # noqa: F811
            variables,
            truncate,
            cal,
            # Grad-CAM still needs the float encoder when requested
            keep_encoder=args.visualize_gradcam or args.save_gradcam_images,
            quantized_path=args.quantized_path,
            qat_steps=args.qat_steps,
            qat_lr=args.qat_lr,
            labeled_batches=labeled,
        )

    if args.mode == "inference":
        # reference semantics (test_RESNET50_Truncate.py:503-527): classify
        # arbitrary unlabelled images from --inference_input into one JSON
        if not args.inference_input:
            raise ValueError(
                "Le chemin --inference_input doit être spécifié pour le mode inference"
            )
        if args.steps_per_dispatch > 1 and args.measure_time:
            raise SystemExit(
                "--steps_per_dispatch > 1 dispatche K batches à la fois; le "
                "temps par image ne peut pas être mesuré — utilisez "
                "--steps_per_dispatch 1 avec --measure_time"
            )
        from ..tasks.inference import run_inference

        run_inference(
            forward_eval, variables, args.inference_input, class_names,
            args.save_dir,
            batch_size=args.batch_size,
            json_name=args.inference_json_name,
            measure_time=args.measure_time,
            mesh=resolve_eval_mesh(args.devices, args.batch_size),
            steps_per_dispatch=args.steps_per_dispatch,
            num_workers=args.num_workers,
        )

    elif args.mode == "classification":
        from ..tasks.classification import run_classification_test

        idx, samples, loader = make_loader()
        mesh = resolve_eval_mesh(args.devices, loader.batch_size)

        gradcam_fn = None
        if args.visualize_gradcam:
            from ..tasks.gradcam import generate_heatmap_overlays, gradcam_moco

            def gradcam_fn(v, image_u8, target, img_path, out_path, colormap="hot"):
                cam = np.asarray(
                    gradcam_moco(v, image_u8[None], [target], truncate=truncate)
                )[0]
                return generate_heatmap_overlays(cam, img_path, out_path, colormap)

        res = run_classification_test(
            forward_eval, variables, loader, samples, class_names, args.save_dir,
            prob_threshold=args.prob_threshold, measure_time=args.measure_time,
            save_test_images=args.save_test_images, compute_auc=args.compute_auc,
            gradcam_fn=gradcam_fn, save_gradcam_images=args.save_gradcam_images,
            colormap=args.colormap, writer=writer, mesh=mesh,
            steps_per_dispatch=args.steps_per_dispatch,
        )
        print(
            f"Précision du test: {res['accuracy']}, Perte du test: {res['loss']}, "
            f"Précision: {res['precision']}, Rappel: {res['recall']}, Score F1: {res['f1']}"
        )
        if res["auc"] is not None:
            print(f"Score AUC: {res['auc']}")

    elif args.mode in ("tsne", "tsne_interactive", "clustering"):
        from ..tasks.embeddings import compute_embeddings_with_paths

        idx, samples, loader = make_loader()
        emb, labels, img_paths = compute_embeddings_with_paths(
            embed_fn, variables, loader, samples,
            mesh=resolve_eval_mesh(args.devices, loader.batch_size),
            steps_per_dispatch=args.steps_per_dispatch,
        )
        # embeddings export (test_RESNET50_Truncate.py:161-165); strip any
        # checkpoint suffix (.pth/.npz/orbax dir) from the artifact name
        base = os.path.basename(os.path.normpath(args.model_path))
        for suffix in (".pth", ".pt", ".npz", ".orbax"):
            if base.endswith(suffix):
                base = base[: -len(suffix)]
                break
        out_path = os.path.join(args.save_dir, f"{base}_embeddings.json")
        os.makedirs(args.save_dir, exist_ok=True)
        with open(out_path, "w") as f:
            json.dump({"embeddings": emb.tolist(), "labels": labels.tolist()}, f)

        if args.mode == "tsne":
            from ..tasks.tsne import perform_tsne

            perform_tsne(emb, labels, class_names, args.colors, args.save_dir)
        elif args.mode == "tsne_interactive":
            from ..tasks.tsne import plot_tsne_interactive

            plot_tsne_interactive(
                emb, labels, class_names, img_paths, args.colors, save_dir=args.save_dir
            )
        else:
            from ..tasks.clustering import run_clustering

            if not args.clustering_class:
                raise ValueError(
                    "L'option --clustering_class doit être spécifiée pour le mode clustering"
                )
            run_clustering(
                emb, labels, img_paths, class_names, args.clustering_class,
                args.min_cluster_size, args.min_samples, args.save_dir, args.colors,
            )

    elif args.mode == "camera":
        from ..tasks.camera import run_camera

        cam_index = int(args.camera_index) if args.camera_index.isdigit() else args.camera_index
        run_camera(
            forward_eval, variables, class_names,
            save_video=args.save_camera_video, save_dir=args.save_dir,
            prob_threshold=args.prob_threshold, measure_time=args.measure_time,
            kalman_filter=args.kalman_filter, camera_index=cam_index,
            host_downscale=not args.device_preprocess,
            transport=args.transport,
        )
    else:
        raise ValueError(f"Mode non reconnu: {args.mode}")

    if writer:
        writer.close()


if __name__ == "__main__":
    main()
