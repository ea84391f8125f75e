"""Evaluation CLI, family 3 — mode-compatible with the reference's
test_Multi_PatchGAN.py: tsne / tsne_interactive / camera / style_transfer /
classification (+ --pooling_type)."""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

from ..config.schema import MultiPatchGANConfig
from ..data.imagefolder import ImageFolderIndex
from ..data.loader import HostLoader
from ..models.multi_patchgan import multiscale_test_apply
from ._common import (
    apply_debug_flags,
    add_tpu_args,
    cast_forward,
    count_params,
    load_checkpoint_tree,
    maybe_subset,
    resolve_compute_dtype,
    resolve_eval_mesh,
    start_profile,
)

MODES = ["tsne", "tsne_interactive", "camera", "style_transfer", "classification"]


def build_parser():
    parser = argparse.ArgumentParser(description="Multi-scale PatchGAN classifier (TPU)")
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--data", type=str, required=True)
    parser.add_argument("--num_samples", default=None, type=int)
    parser.add_argument("--batch_size", type=int, default=None,
                        help="Override the config batch size (additive flag)")
    parser.add_argument("--save_dir", default="results", type=str)
    parser.add_argument("--measure_time", action="store_true")
    parser.add_argument("--mode", type=str, choices=MODES, default="classification")
    parser.add_argument("--pooling_type", type=str, default="avg", choices=["avg", "max"])
    parser.add_argument("--save_camera_video", action="store_true")
    parser.add_argument("--prob_threshold", default=0.5, type=float)
    parser.add_argument("--classes", nargs="+", default=None)
    parser.add_argument("--colors", nargs="+")
    parser.add_argument("--layers", type=int, default=None,
                        help="(reference flag; its truncation path is broken upstream)")
    parser.add_argument("--threshold", default=1e-4, type=float)
    parser.add_argument("--learning_rate", default=0.01, type=float)
    parser.add_argument("--num_iterations", default=500, type=int)
    parser.add_argument("--shard_spatial", type=int, default=1,
                        help="Style transfer: shard each canvas's H rows over "
                        "this many devices (GSPMD conv halo exchanges in the "
                        "discriminator fwd/bwd — this family optimises one "
                        "image at a time, so 'spatial' is the useful axis)")
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
    add_tpu_args(parser)
    from ._common import add_eval_dispatch_arg

    add_eval_dispatch_arg(parser)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    apply_debug_flags(args)
    os.makedirs(args.save_dir, exist_ok=True)

    cfg = MultiPatchGANConfig.from_json(args.config_path)
    config = cfg.to_dict()
    gdim, norm = cfg.gram_matrix_dim, cfg.norm

    idx = ImageFolderIndex(os.path.join(args.data, "test"))
    classes = idx.classes
    samples = maybe_subset(idx.samples, args.num_samples, cfg.seed)
    loader = HostLoader(samples, args.batch_size or cfg.batch_size, shuffle=False)

    variables = load_checkpoint_tree(args.model_path, "multi_patchgan_test", config)
    if not all(
        isinstance(variables.get(s), dict) and "features" in variables[s]
        for s in ("small", "medium", "large")
    ):
        # train-variant checkpoint: initialise the test architecture and pull
        # in every same-shape leaf (the reference's partial-load strategy,
        # train_best_Multi_PatchGAN.py:88-94)
        import jax

        from ..checkpoint.pth_converter import shape_filtered_update
        from ..models.multi_patchgan import multiscale_test_init

        init = multiscale_test_init(
            jax.random.PRNGKey(cfg.seed or 0), cfg.patch_sizes, ndf=cfg.ndf,
            num_classes=cfg.num_classes, gram_matrix_dim=gdim, norm=norm,
        )
        stats = {}
        variables = shape_filtered_update(init, variables, stats)
        print(
            "Train-variant checkpoint detected: shape-filtered partial load "
            f"into the test architecture ({stats.get('loaded', 0)}/"
            f"{stats.get('total', 0)} tensors matched)."
        )

    if args.afficher_params:
        total = count_params(variables)
        print(
            f"Nombre total de paramètres du modèle (MultiScaleDiscriminator_test) : {total}"
        )

    def forward_eval(v, images):
        _, logits, _ = multiscale_test_apply(v, images, gdim, norm=norm)
        return logits

    def embed_fn(v, images):
        emb, _, _ = multiscale_test_apply(v, images, gdim, norm=norm)
        return emb

    dtype = resolve_compute_dtype(args.precision)
    forward_eval = cast_forward(forward_eval, dtype)
    embed_fn = cast_forward(embed_fn, dtype)
    start_profile(args.profile_dir)

    if args.mode == "camera":
        from ..tasks.camera import run_camera

        if args.classes is None:
            raise ValueError(
                "Vous devez spécifier les classes avec l'option --classes en mode caméra."
            )
        cam_index = int(args.camera_index) if args.camera_index.isdigit() else args.camera_index
        run_camera(
            forward_eval, variables, args.classes,
            save_video=args.save_camera_video, save_dir=args.save_dir,
            prob_threshold=args.prob_threshold, measure_time=args.measure_time,
            camera_index=cam_index, host_downscale=not args.device_preprocess,
        )

    elif args.mode in ("tsne", "tsne_interactive"):
        from ..tasks.embeddings import compute_embeddings_with_paths

        emb, labels, img_paths = compute_embeddings_with_paths(
            embed_fn, variables, loader, samples,
            mesh=resolve_eval_mesh(args.devices, loader.batch_size),
            steps_per_dispatch=args.steps_per_dispatch,
        )
        if args.mode == "tsne":
            from ..tasks.tsne import perform_tsne

            perform_tsne(emb, labels, classes, args.colors, args.save_dir)
        else:
            from ..tasks.tsne import plot_tsne_interactive

            plot_tsne_interactive(
                emb, labels, classes, img_paths, args.colors, save_dir=args.save_dir
            )

    elif args.mode == "style_transfer":
        from ..tasks.style_transfer import style_transfer_patches

        from ._common import resolve_style_mesh

        st_loader = HostLoader(samples, 1, shuffle=False)
        style_transfer_patches(
            variables, st_loader, args.save_dir,
            gram_matrix_dim=gdim, norm=norm,
            layers=args.layers, threshold=args.threshold,
            num_iterations=args.num_iterations, learning_rate=args.learning_rate,
            compute_dtype=dtype,
            mesh=resolve_style_mesh(args.devices, args.shard_spatial, 1),
        )

    elif args.mode == "classification":
        import jax.numpy as jnp
        from sklearn.metrics import confusion_matrix, f1_score, precision_score, recall_score

        from ..core.mesh import jit_eval_step, scanned_eval_iter
        from ..data.augment import eval_preprocess
        from ..tasks.classification import plot_and_save_confusion_matrix

        import time

        if args.steps_per_dispatch > 1 and args.measure_time:
            raise SystemExit(
                "--steps_per_dispatch > 1 dispatche K batches à la fois; le "
                "temps par image ne peut pas être mesuré — utilisez "
                "--steps_per_dispatch 1 avec --measure_time"
            )

        def step(v, images_u8):
            import jax

            images = eval_preprocess(images_u8)
            _, logits, _ = multiscale_test_apply(v, images, gdim, norm=norm)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.argmax(logits, axis=-1), probs

        mesh = resolve_eval_mesh(args.devices, loader.batch_size)
        all_preds, all_labels, all_probs, times = [], [], [], []
        if args.measure_time:
            import jax
            # time the step only (batch already in hand), like the
            # reference's evaluate_model_test — the loader pull stays
            # outside the measured window
            jstep = jit_eval_step(step, mesh, n_batch_inputs=1)
            for batch in loader:
                t0 = time.perf_counter()
                out = jstep(variables, jnp.asarray(batch["image"]))
                if args.compute_auc:
                    # one device_get for both outputs — D2H fetches
                    # serialise through the axon relay (~30 ms RTT each),
                    # so two np.asarray calls would inflate the timed
                    # window by an extra round trip per batch
                    p, pr = jax.device_get(out)
                else:
                    p, pr = np.asarray(out[0]), None
                n = batch["n_valid"]
                times.append((time.perf_counter() - t0) / max(n, 1))
                all_preds.extend(p[:n].tolist())
                all_labels.extend(batch["label"][:n].tolist())
                if pr is not None:
                    all_probs.append(pr[:n])
        else:
            for batch, (p, pr) in scanned_eval_iter(
                step, variables, loader, mesh,
                input_keys=("image",),
                steps_per_dispatch=args.steps_per_dispatch,
            ):
                n = batch["n_valid"]
                all_preds.extend(p[:n].tolist())
                all_labels.extend(batch["label"][:n].tolist())
                all_probs.append(pr[:n])
        if args.measure_time and times:
            # per-image average, like evaluate_model_test
            # (functions_Multi_PatchGAN.py:167-174,188)
            print(f"Temps moyen par image: {np.mean(times):.6f} secondes")

        accuracy = float(np.mean(np.array(all_preds) == np.array(all_labels)))
        precision = precision_score(all_labels, all_preds, average="weighted", zero_division=0)
        recall = recall_score(all_labels, all_preds, average="weighted", zero_division=0)
        f1 = f1_score(all_labels, all_preds, average="weighted", zero_division=0)
        print(f"Accuracy: {accuracy:.4f}")
        print(f"Precision: {precision:.4f}")
        print(f"Recall: {recall:.4f}")
        print(f"F1 Score: {f1:.4f}")

        cm = confusion_matrix(all_labels, all_preds)
        # the updated reference computes cm but comments out the plot call
        # (test_Multi_PatchGAN.py:199 '#plot_confusion_matrix'); the PNG is
        # kept here as an additive artifact (documented deviation)
        plot_and_save_confusion_matrix(cm, classes, args.save_dir)

        results = {
            "accuracy": accuracy,
            "precision": float(precision),
            "recall": float(recall),
            "f1_score": float(f1),
            "predictions": [int(p) for p in all_preds],
            "labels": [int(l) for l in all_labels],
        }
        if args.compute_auc:
            # reference test_Multi_PatchGAN.py:218-241 (auc always written,
            # printed only when computable)
            from ._common import weighted_auc_or_none

            # the Multi_PatchGAN reference branches on the probability-matrix
            # width, not the observed labels (test_Multi_PatchGAN.py:218-235)
            auc = weighted_auc_or_none(
                all_labels, np.concatenate(all_probs), branch_on="probs"
            )
            results["auc"] = auc
            if auc is not None:
                print(f"AUC Score: {auc:.4f}")
        results_path = os.path.join(args.save_dir, "classification_results.json")
        with open(results_path, "w") as f:
            json.dump(results, f, indent=4)
        print(f"Résultats de classification sauvegardés dans {results_path}")


if __name__ == "__main__":
    main()
