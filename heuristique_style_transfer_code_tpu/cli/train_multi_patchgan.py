"""Training CLI, family 3 — flag-compatible with the reference's
train_best_Multi_PatchGAN.py (shape-filtered partial checkpoint load)."""
from __future__ import annotations

import argparse
import os

import jax

from ..config.schema import MultiPatchGANConfig
from ..data.imagefolder import ImageFolderIndex
from ..train.factories import setup_multi_patchgan
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
)


def build_parser():
    parser = argparse.ArgumentParser(description="Train multi-scale PatchGAN classifier (TPU)")
    parser.add_argument("--data", type=str, required=True)
    parser.add_argument("--epochs", default=25, type=int)
    parser.add_argument("--save_dir", default="Model_Multi_scale_PatchGAN/best", type=str)
    parser.add_argument("--tensorboard", action="store_true")
    parser.add_argument("--k_folds", default=2, type=int)
    parser.add_argument("--model_path", type=str, help="Weights (.npz or .pth); shape-filtered partial load")
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--seed", type=int, default=None)
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

    cfg = MultiPatchGANConfig.from_json(args.config_path)
    hyperparameters = cfg.to_dict()
    seed = resolve_seed(hyperparameters, args.seed)

    dataset = ImageFolderIndex(os.path.join(args.data, "train"))
    # the reference detects the class count from the dataset and overrides the
    # config before the retrained_hyperparameters dump
    # (train_best_Multi_PatchGAN.py:54-59)
    num_classes = len(dataset.classes)
    print(f"Nombre de classes détecté : {num_classes}")
    cfg.num_classes = num_classes
    hyperparameters["num_classes"] = num_classes
    writer = make_writer(args.tensorboard, args.save_dir)
    mesh = build_mesh(args.devices, cfg.batch_size)
    combos = [(None, None)]

    pretrained = None
    if args.model_path:
        pretrained = load_checkpoint_tree(args.model_path, "multi_patchgan", hyperparameters)
        print(f"Poids du modèle chargés depuis {args.model_path} (shape-filtered)")

    lr_schedule, clip_norm = resolve_lr_schedule(
        args, cfg, len(dataset.samples), args.k_folds
    )
    # compile the train/eval steps ONCE; reuse across all folds
    setup = setup_multi_patchgan(
        cfg, num_classes, combos, mesh=mesh, pretrained=pretrained,
        compute_dtype=resolve_compute_dtype(args.precision), zero1=args.zero1, remat=args.remat,
        lr_schedule=lr_schedule, clip_norm=clip_norm,
        label_smoothing=args.label_smoothing, ema_decay=args.ema_decay,
        mix_fn=resolve_mix_fn(args),
    )

    def init_fn(key, fold):
        variables, opt_state = setup.init(key)
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
        # reference family-3 protocol: fixed split seed, an unconditional
        # model_fold_<k> checkpoint per fold, retrained_performance.json
        # (train_best_Multi_PatchGAN.py:63,119-130)
        kfold_random_state=42,
        save_every_fold=True,
        performance_filename="retrained_performance.json",
        )
    except PreemptedError as e:
        # SIGTERM on a preemptible fleet: the last completed epoch's
        # checkpoint is durable; the same command + --resume continues
        print(f"Preempted: {e}")
        if writer:
            writer.close()
        return
    # retrained hyperparameters round-trip (train_best_Multi_PatchGAN.py:125-126)
    cfg.save(os.path.join(args.save_dir, "retrained_hyperparameters.json"))
    if writer:
        writer.close()


if __name__ == "__main__":
    main()
