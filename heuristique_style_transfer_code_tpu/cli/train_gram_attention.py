"""Training CLI, family 2 — flag-compatible with the reference's
train_best_RESNET50_Truncate_gram_attention.py (incl. --freeze_layers)."""
from __future__ import annotations

import argparse
import os

import jax

from ..config.schema import GramAttentionConfig
from ..data.imagefolder import ImageFolderIndex
from ..train.factories import setup_gram_attention
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
    parser = argparse.ArgumentParser(
        description="Train truncated ResNet50 + Gram/attention head (TPU)"
    )
    parser.add_argument("--data", type=str, required=True)
    parser.add_argument("--model_path", type=str, help="Pre-trained encoder (.npz or .pth)")
    parser.add_argument("--epochs", default=25, type=int)
    parser.add_argument("--save_dir", default="saved_models_attention_gram_resnet50", type=str)
    parser.add_argument("--tensorboard", action="store_true")
    parser.add_argument("--k_folds", default=2, type=int)
    parser.add_argument("--freeze_layers", action="store_true", help="Freeze the encoder layers")
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

    cfg = GramAttentionConfig.from_json(args.config_path)
    hyperparameters = cfg.to_dict()
    seed = resolve_seed(hyperparameters, args.seed)

    dataset = ImageFolderIndex(os.path.join(args.data, "train"))
    num_classes = len(dataset.classes)
    writer = make_writer(args.tensorboard, args.save_dir)
    mesh = build_mesh(args.devices, cfg.batch_size)
    combos = [(None, None)]

    pretrained = None
    if args.model_path:
        pretrained = load_checkpoint_tree(args.model_path, "gram_attention", hyperparameters)
        if "encoder" not in pretrained and isinstance(pretrained.get("moco"), dict):
            # family-1 checkpoint: reuse its encoder (reference load_model path)
            pretrained = {"encoder": pretrained["moco"].get("encoder", {})}
            print("Family-1 checkpoint detected: reusing its encoder only.")
        # report how much of the checkpoint actually matches the architecture
        from ..checkpoint.pth_converter import shape_filtered_update
        from ..models.gram_attention import gram_attention_init

        _stats = {}
        shape_filtered_update(
            gram_attention_init(
                jax.random.PRNGKey(0), cfg.truncate_layer, num_classes,
                cfg.gram_matrix_size,
            ),
            pretrained,
            _stats,
        )
        print(
            f"Poids du modèle chargés depuis {args.model_path} "
            f"({_stats.get('loaded', 0)}/{_stats.get('total', 0)} tensors matched)"
        )
        if _stats.get("loaded", 0) == 0:
            raise ValueError(
                f"No tensor in {args.model_path} matches the gram-attention "
                "architecture — wrong checkpoint or config."
            )

    lr_schedule, clip_norm = resolve_lr_schedule(
        args, cfg, len(dataset.samples), args.k_folds
    )
    # compile the train/eval steps ONCE; reuse across all folds
    setup = setup_gram_attention(
        cfg, num_classes, combos, mesh=mesh,
        pretrained=pretrained, freeze_encoder=args.freeze_layers,
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

    def on_fold_end(fold, result, model_path):
        """Reference family-2 per-fold artifact surface
        (train_best_RESNET50_Truncate_gram_attention.py:98-127):
        best_performance_fold_<k>.json (no f1 — the reference's evaluate
        returns only these four) and best_hyperparameters_fold_<k>.json
        (incl. the vestigial hidden_dims/num_layers config keys and the
        fold checkpoint path)."""
        import json as _json

        perf_path = os.path.join(args.save_dir, f"best_performance_fold_{fold}.json")
        with open(perf_path, "w") as f:
            _json.dump(
                {
                    "accuracy": result["val_accuracy"],
                    "precision": result["val_precision"],
                    "recall": result["val_recall"],
                    "val_loss": result["val_loss"],
                },
                f, indent=4,
            )
        print(f"Fold {fold} performance saved to {perf_path}")
        hp_path = os.path.join(args.save_dir, f"best_hyperparameters_fold_{fold}.json")
        with open(hp_path, "w") as f:
            _json.dump(
                {
                    "hidden_dims": hyperparameters.get("hidden_dims"),
                    "num_layers": hyperparameters.get("num_layers"),
                    "batch_size": cfg.batch_size,
                    "lr": cfg.lr,
                    "truncate_layer": cfg.truncate_layer,
                    "gram_matrix_size": cfg.gram_matrix_size,
                    "model_path": model_path,
                },
                f, indent=4,
            )
        print(f"Fold {fold} hyperparameters saved to {hp_path}")

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
        on_fold_end=on_fold_end,
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
