"""Training CLI, family 1 — flag-compatible with the reference's
train_best_RESNET50_Truncate.py (SURVEY.md §2.3), running the jitted TPU
engine underneath (k-fold CV, on-device augmentation, data-parallel mesh).
"""
from __future__ import annotations

import argparse
import os

import jax

from ..config.schema import TruncatedResNetConfig
from ..data.augment import generate_transform_combinations
from ..data.imagefolder import ImageFolderIndex
from ..train.factories import setup_truncated_resnet50
from ..train.kfold import run_kfold
from ..utils.logging import maybe_profile
from ._common import (
    apply_debug_flags,
    add_tpu_args,
    add_train_tpu_args,
    build_mesh,
    load_checkpoint_tree,
    make_writer,
    make_save_fn,
    resolve_compute_dtype,
    resolve_lr_schedule,
    apply_auto_batch,
    apply_grad_accum,
    signature_extra_from_args,
    resolve_mix_fn,
    _ema_eval_fn,
    resolve_fold_parallel,
    resolve_seed,
    select_augmentations,
)


def build_parser():
    parser = argparse.ArgumentParser(
        description="Fine-tuning truncated ResNet50 for weather classification (TPU)"
    )
    parser.add_argument("--data", type=str, required=True, help="Path to dataset root directory")
    parser.add_argument("--model_path", type=str, help="Path to pre-trained weights (.npz or .pth)")
    parser.add_argument("--config_path", type=str, required=True, help="Hyperparameter JSON")
    parser.add_argument("--epochs", default=25, type=int)
    parser.add_argument("--save_dir", default="saved_models", type=str)
    parser.add_argument("--tensorboard", action="store_true")
    parser.add_argument("--k_folds", default=5, type=int)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--color_aug", action="store_true")
    parser.add_argument("--geom_aug", action="store_true")
    parser.add_argument("--num_color_transforms", type=int, default=0)
    parser.add_argument("--num_geom_transforms", type=int, default=0)
    parser.add_argument("--geom_transforms", nargs="+", type=str, default=None)
    parser.add_argument(
        "--freeze_encoder", action="store_true",
        help="Freeze all encoder layers and train only the classifier",
    )
    parser.add_argument(
        "--steps_per_dispatch", type=int, default=1,
        help="Train steps fused per device dispatch (lax.scan on-device): "
        "same RNG/losses, ~1/K the host round trips — useful when the TPU "
        "sits behind a network relay",
    )
    add_tpu_args(parser)
    add_train_tpu_args(parser)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    apply_debug_flags(args)
    os.makedirs(args.save_dir, exist_ok=True)

    cfg = TruncatedResNetConfig.from_json(args.config_path)
    hyperparameters = cfg.to_dict()
    seed = resolve_seed(hyperparameters, args.seed)
    cfg.seed = seed

    geom, color = select_augmentations(args)
    combos = generate_transform_combinations(geom, color)

    dataset = ImageFolderIndex(os.path.join(args.data, "train"))
    num_classes = len(dataset.classes)
    writer = make_writer(args.tensorboard, args.save_dir)
    mesh = build_mesh(args.devices, cfg.batch_size)

    # Checkpoint load semantics (reference train_best_RESNET50_Truncate.py:
    # 151-177): the moco encoder always loads; the classifier only when its
    # fc shape matches the dataset's class count, else each fold gets a
    # fresh classifier — with the reference's per-fold console message.
    pretrained = None
    fold_load_msg = "pas de checkpoint fourni, entraînement from scratch."
    if args.model_path:
        tree = load_checkpoint_tree(args.model_path, "truncated_resnet50", hyperparameters)
        fc = tree.get("classifier", {}).get("fc") if isinstance(tree, dict) else None
        if isinstance(fc, dict) and "kernel" in fc and "bias" in fc:
            got = tuple(int(s) for s in fc["kernel"].shape)  # (in, out)
            want = (cfg.dim, num_classes)
            if got == want:
                pretrained = tree
                fold_load_msg = "Classifier chargé depuis le checkpoint."
            else:
                # the reference prints torch-layout (out, in) shapes
                pretrained = {"moco": tree["moco"]}
                fold_load_msg = (
                    f"mismatch classifier → checkpoint a {tuple(reversed(got))}, "
                    f"attendu {(num_classes, cfg.dim)}. Nouveau classifieur non chargé."
                )
        else:
            pretrained = {"moco": tree["moco"]}
            fold_load_msg = (
                "pas de poids de classifieur dans le checkpoint → nouveau classifieur."
            )

    lr_schedule, clip_norm = resolve_lr_schedule(
        args, cfg, len(dataset.samples), args.k_folds
    )
    # compile the train/eval steps ONCE; reuse across all folds
    setup = setup_truncated_resnet50(
        cfg, num_classes, combos, mesh=mesh, pretrained=pretrained,
        compute_dtype=resolve_compute_dtype(args.precision), zero1=args.zero1, remat=args.remat,
        freeze_encoder=args.freeze_encoder,
        lr_schedule=lr_schedule, clip_norm=clip_norm,
        label_smoothing=args.label_smoothing, ema_decay=args.ema_decay,
        mix_fn=resolve_mix_fn(args),
    )

    def init_fn(key, fold):
        variables, opt_state = setup.init(key)
        print(f"Fold {fold}: {fold_load_msg}")
        if args.freeze_encoder:
            print(f"Fold {fold}: encodeur gelé (seul le classifieur sera "
                  f"entraîné).")
        return variables, opt_state, setup.train_step, setup.eval_step

    apply_auto_batch(args, setup, cfg, mesh, hyperparameters)
    apply_grad_accum(args, setup, cfg.batch_size)
    foldwise_step, fold_mesh = resolve_fold_parallel(
        args, setup, args.k_folds, cfg.batch_size
    )

    from ..train.preemption import PreemptedError

    try:
        with maybe_profile(args.profile_dir):
            run_kfold(
        dataset,
        k_folds=args.k_folds,
        seed=seed,
        epochs=args.epochs,
        batch_size=cfg.batch_size,
        save_dir=args.save_dir,
        hyperparameters=hyperparameters,
        init_fn=init_fn,
        mesh=mesh,
        save_fn=make_save_fn(args.checkpoint_format),
        combos_per_sample=len(combos),
        key=jax.random.PRNGKey(seed),
        writer=writer,
        train_step_multi=setup.train_step_multi,
        steps_per_dispatch=args.steps_per_dispatch,
        resume=args.resume,
        async_checkpoint=args.async_checkpoint,
        foldwise_step=foldwise_step,
        fold_mesh=fold_mesh,
        signature_extra=signature_extra_from_args(args),
        early_stop=args.early_stop,
        eval_variables_fn=_ema_eval_fn(args),
        )
    except PreemptedError as e:
        # SIGTERM on a preemptible fleet: the last completed epoch's
        # checkpoint is durable; the same command + --resume continues
        print(f"Preempted: {e}")
        if writer:
            writer.close()
        return
    if writer:
        writer.close()


if __name__ == "__main__":
    main()
