"""Evaluation CLI, family 2 — mode-compatible with the reference's
test_RESNET50_Truncate_gram_attention.py: tsne / tsne_interactive /
classification / camera / style_transfer."""
from __future__ import annotations

import argparse
import json
import os

from ..config.schema import GramAttentionConfig
from ..data.imagefolder import ImageFolderIndex
from ..data.loader import HostLoader
from ..models.gram_attention import gram_attention_apply
from ._common import (
    apply_debug_flags,
    add_tpu_args,
    resolve_compute_dtype,
    start_profile,
    count_params,
    load_checkpoint_tree,
    maybe_subset,
    resolve_eval_mesh,
    resolve_style_mesh,
)

MODES = ["tsne", "tsne_interactive", "classification", "camera", "style_transfer"]


def build_parser():
    parser = argparse.ArgumentParser(description="Gram+attention weather classifier (TPU)")
    parser.add_argument("--data", type=str, required=True)
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--num_samples", type=int, default=None)
    parser.add_argument("--mode", type=str, choices=MODES, default="classification")
    parser.add_argument("--save_dir", type=str, required=True)
    parser.add_argument("--colors", nargs="+")
    parser.add_argument("--classes", nargs="+")
    parser.add_argument("--save_camera_video", action="store_true")
    parser.add_argument("--prob_threshold", default=0.5, type=float)
    parser.add_argument("--measure_time", action="store_true")
    parser.add_argument("--layers", type=int, default=4,
                        help="Encoder child truncation for style transfer")
    parser.add_argument("--threshold", default=1e-7, type=float)
    parser.add_argument("--learning_rate", default=0.01, type=float)
    parser.add_argument("--num_iterations", default=500, type=int)
    parser.add_argument("--batch_size", type=int, default=None,
                        help="Override the config batch size (additive flag; "
                        "the style-transfer loop optimises a whole batch per "
                        "compiled while_loop — bf16 peaks near batch 128)")
    parser.add_argument("--shard_spatial", type=int, default=1,
                        help="Style transfer: shard each canvas's H rows over "
                        "this many devices (GSPMD conv halo exchanges in the "
                        "encoder fwd/bwd — the big-canvas path; combines with "
                        "--devices, which shards the batch axis)")
    parser.add_argument(
        "--style_image", type=str, default=None,
        help="Classic content+style transfer (beyond parity): re-render "
        "every test image in THIS image's style (style Gram + content "
        "feature loss) instead of the reference's texture-from-self loop",
    )
    parser.add_argument("--style_weight", type=float, default=1.0)
    parser.add_argument("--content_weight", type=float, default=1.0)
    parser.add_argument("--tv_weight", type=float, default=0.0,
                        help="Total-variation smoothness term on the canvas "
                        "(--style_image runs only)")
    parser.add_argument(
        "--style_layers", choices=["last", "all"], default="last",
        help="--style_image runs: match style Grams at the truncation "
        "point only, or at every executed ResNet stage (classic "
        "multi-scale Gatys statistics; same encoder pass either way)",
    )
    parser.add_argument(
        "--remat", action="store_true",
        help="Checkpoint encoder bottlenecks inside the style-transfer "
        "loop (jax.checkpoint): the backward recomputes within-block "
        "activations instead of keeping them resident — bigger canvases "
        "per chip at ~+1/3 forward FLOPs (style_transfer mode only)",
    )
    parser.add_argument(
        "--style_init", choices=["content", "noise"], default="content",
        help="Pixel initialisation for --style_image runs: the content "
        "image (classic, fastest) or randn like the texture loop",
    )
    parser.add_argument(
        "--quantized_path", type=str, default=None,
        help="Persisted quantised-encoder npz (int8): loaded if present "
        "(skips calibration), else written after calibration",
    )
    parser.add_argument("--afficher_params", action="store_true")
    parser.add_argument(
        "--compute_auc", action="store_true",
        help="Calculer le score AUC pour le modèle",
    )
    parser.add_argument("--camera_index", type=str, default="0")
    parser.add_argument("--device_preprocess", action="store_true",
                        help="Run the full resize pipeline on-device instead of "
                        "host-downscaling frames before transfer (prefer when "
                        "the TPU is directly attached)")
    add_tpu_args(parser, precisions=("float32", "bf16", "int8"))
    from ._common import add_eval_dispatch_arg

    add_eval_dispatch_arg(parser)
    from ._common import add_calib_data_arg

    add_calib_data_arg(parser)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    apply_debug_flags(args)
    os.makedirs(args.save_dir, exist_ok=True)

    cfg = GramAttentionConfig.from_json(args.config_path)
    config = cfg.to_dict()
    idx = ImageFolderIndex(os.path.join(args.data, "test"))
    num_classes = len(idx.classes)
    truncate = cfg.truncate_layer
    s = cfg.gram_matrix_size

    variables = load_checkpoint_tree(args.model_path, "gram_attention", config)
    if "encoder" not in variables and isinstance(variables.get("moco"), dict):
        # family-1 checkpoint: reuse its encoder, fresh gram/attention head
        # (mirrors the reference's encoder-only load_model path,
        # functions_RESNET50_Truncate_Gram_Attention.py:29-58)
        import jax

        from ..checkpoint.pth_converter import shape_filtered_update
        from ..models.gram_attention import gram_attention_init

        init = gram_attention_init(
            jax.random.PRNGKey(cfg.seed or 0), truncate, num_classes, s
        )
        variables = shape_filtered_update(
            init, {"encoder": variables["moco"].get("encoder", {})}
        )
        print(
            "Family-1 checkpoint detected: loaded its encoder; gram/attention "
            "head freshly initialised."
        )
    if "encoder" not in variables:
        raise KeyError(
            f"Checkpoint {args.model_path} has no encoder for the gram-attention "
            "architecture (expected 'encoder' or a family-1 'moco' tree)."
        )

    if args.afficher_params:
        total = count_params(variables)
        print(
            f"Nombre total de paramètres du modèle (TruncatedResNet50_for_test) : {total}"
        )

    samples = maybe_subset(idx.samples, args.num_samples, cfg.seed)
    loader = HostLoader(samples, args.batch_size or cfg.batch_size, shuffle=False)

    dtype = resolve_compute_dtype(args.precision)

    if args.precision == "int8":
        # PTQ encoder calibrated leakage-free (--calib_data, default the
        # --data train/ split); grams/attention/
        # classifier stay float. Gradient-based modes keep the float path.
        if args.mode not in ("classification", "tsne", "tsne_interactive"):
            raise ValueError(
                "--precision int8 est disponible pour les modes "
                "classification/tsne/tsne_interactive uniquement"
            )
        import os as _os

        from ._common import (
            build_int8_family2,
            collect_calibration_batches,
            make_calibration_loader,
        )

        cal = labeled = None
        qpath = getattr(args, "quantized_path", None)
        if not (qpath and _os.path.exists(qpath)):
            cal_loader = make_calibration_loader(
                args, args.batch_size or cfg.batch_size
            )
            if args.qat_steps:
                labeled = collect_calibration_batches(
                    cal_loader, n=4, with_labels=True
                )
                cal = [images for images, _ in labeled[:2]]
            else:
                cal = collect_calibration_batches(cal_loader)
        apply_eval, variables = build_int8_family2(
            variables, truncate, s, num_classes, cal, quantized_path=qpath,
            qat_steps=args.qat_steps, qat_lr=args.qat_lr,
            labeled_batches=labeled,
        )

    else:

        def apply_eval(v, images):
            if dtype is not None:
                images = images.astype(dtype)
            emb, logits, _ = gram_attention_apply(
                v, images, truncate, s, num_classes
            )
            return emb, logits

    def forward_eval(v, images):
        return apply_eval(v, images)[1]

    def embed_fn(v, images):
        return apply_eval(v, images)[0]

    start_profile(args.profile_dir)

    if args.mode == "classification":
        from sklearn.metrics import f1_score, precision_score, recall_score

        import numpy as np
        import jax.numpy as jnp
        from ..core.mesh import scanned_eval_iter
        from ..data.augment import eval_preprocess

        def step(v, images_u8):
            import jax

            images = eval_preprocess(images_u8)
            _, logits = apply_eval(v, images)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.argmax(logits, axis=-1), probs

        preds, labels, probs = [], [], []
        for batch, (p, pr) in scanned_eval_iter(
            step, variables, loader,
            resolve_eval_mesh(args.devices, loader.batch_size),
            input_keys=("image",),
            steps_per_dispatch=args.steps_per_dispatch,
        ):
            n = batch["n_valid"]
            preds.extend(p[:n].tolist())
            labels.extend(batch["label"][:n].tolist())
            probs.append(pr[:n])

        results = {
            "precision": precision_score(labels, preds, average="weighted", zero_division=0),
            "recall": recall_score(labels, preds, average="weighted", zero_division=0),
            "f1_score": f1_score(labels, preds, average="weighted", zero_division=0),
        }
        if args.compute_auc:
            # reference test_RESNET50_Truncate_gram_attention.py:106-117
            # ('auc' is written even when the computation degenerates)
            from ._common import weighted_auc_or_none

            results["auc"] = weighted_auc_or_none(labels, np.concatenate(probs))
        results_path = os.path.join(args.save_dir, "classification_results.json")
        with open(results_path, "w") as f:
            json.dump(results, f, indent=4)
        print(f"Classification results saved to {results_path}")

    elif args.mode in ("tsne", "tsne_interactive"):
        from ..tasks.embeddings import compute_embeddings_with_paths

        emb, labels, img_paths = compute_embeddings_with_paths(
            embed_fn, variables, loader, samples,
            mesh=resolve_eval_mesh(args.devices, loader.batch_size),
            steps_per_dispatch=args.steps_per_dispatch,
        )
        if args.mode == "tsne":
            from ..tasks.tsne import perform_tsne

            # family-2 artifact name (test_RESNET50_Truncate_gram_attention.py:110)
            perform_tsne(emb, labels, idx.classes, args.colors, args.save_dir,
                         filename="tsne_visualization.png")
        else:
            from ..tasks.tsne import plot_tsne_interactive

            plot_tsne_interactive(
                emb, labels, idx.classes, img_paths, args.colors, save_dir=args.save_dir
            )

    elif args.mode == "camera":
        from ..tasks.camera import run_camera

        # reference parity (test_RESNET50_Truncate_gram_attention.py:125-130):
        # camera mode requires --classes explicitly, no config/data fallback
        if args.classes is None:
            raise ValueError(
                "You must specify classes with the --classes option for camera mode."
            )
        cam_index = int(args.camera_index) if args.camera_index.isdigit() else args.camera_index
        run_camera(
            forward_eval, variables, args.classes,
            save_video=args.save_camera_video, save_dir=args.save_dir,
            prob_threshold=args.prob_threshold, measure_time=args.measure_time,
            camera_index=cam_index, host_downscale=not args.device_preprocess,
        )

    elif args.mode == "style_transfer":
        mesh = resolve_style_mesh(
            args.devices, args.shard_spatial, loader.batch_size
        )
        if args.style_image:
            from ..data.loader import load_image_staged
            from ..tasks.style_transfer import (
                content_style_transfer_gram_attention,
            )

            style_u8 = load_image_staged(args.style_image)
            content_style_transfer_gram_attention(
                variables, loader, style_u8, args.save_dir,
                layers=args.layers, truncate_layer=truncate,
                style_weight=args.style_weight,
                content_weight=args.content_weight,
                tv_weight=args.tv_weight,
                style_layers=args.style_layers,
                threshold=args.threshold,
                num_iterations=args.num_iterations,
                learning_rate=args.learning_rate,
                init=args.style_init, compute_dtype=dtype, mesh=mesh,
                remat=args.remat,
            )
        else:
            from ..tasks.style_transfer import style_transfer_gram_attention

            style_transfer_gram_attention(
                variables, loader, args.save_dir,
                layers=args.layers, threshold=args.threshold,
                num_iterations=args.num_iterations,
                learning_rate=args.learning_rate,
                truncate_layer=truncate, compute_dtype=dtype,
                mesh=mesh, remat=args.remat,
            )


if __name__ == "__main__":
    main()
