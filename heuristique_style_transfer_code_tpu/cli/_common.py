"""Shared CLI plumbing: seeding, class-name resolution, loaders, checkpoint
loading (.npz native / .pth via the converter), TPU extras."""
from __future__ import annotations

import argparse
import os
import random
from typing import List, Optional

import numpy as np


def _honor_jax_platforms_env():
    """This image's sitecustomize registers the TPU backend at interpreter
    start and pins the platform, which silently overrides JAX_PLATFORMS=cpu.
    Re-apply the user's explicit choice before any backend initialises."""
    want = os.environ.get("JAX_PLATFORMS")
    if want and "axon" not in want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass


_honor_jax_platforms_env()

from ..core.cache import enable_compile_cache as _enable_compile_cache  # noqa: E402

_enable_compile_cache()


def add_tpu_args(parser: argparse.ArgumentParser, precisions=("float32", "bf16")):
    parser.add_argument(
        "--precision", choices=list(precisions), default="float32",
        help="Compute precision policy (bf16 engages the MXU's native type; "
        "int8, where offered, runs the post-training-quantised encoder "
        "calibrated on --calib_data, defaulting to the --data train/ split)",
    )
    parser.add_argument(
        "--devices", type=int, default=None,
        help="Number of devices for the data-parallel mesh (default: all on "
        "train CLIs, 1 on eval CLIs; eval shards the classification/"
        "embedding batch — camera mode is streaming batch-1 and stays "
        "single-device)",
    )
    parser.add_argument(
        "--profile_dir", type=str, default=None,
        help="Write a jax.profiler trace of the run to this directory",
    )
    parser.add_argument(
        "--debug_nans", action="store_true",
        help="Enable jax debug_nans (the reference leaves torch anomaly mode "
        "on globally; here it is opt-in)",
    )


def add_eval_dispatch_arg(parser: argparse.ArgumentParser):
    """Eval-side K-batches-per-dispatch (the eval counterpart of the train
    CLIs' --steps_per_dispatch)."""
    parser.add_argument(
        "--steps_per_dispatch", type=int, default=1,
        help="Évaluer K batches par dispatch device (un lax.scan on-device "
        "du même programme par batch — résultats bit-identiques). Supprime "
        "(K-1)/K du coût aller-retour par batch sur un device distant. "
        "Incompatible avec --measure_time (times_test.json est par batch)",
    )


def add_train_tpu_args(parser: argparse.ArgumentParser):
    """Train-only extras (kept off the eval CLIs so no flag parses without
    effect)."""
    parser.add_argument(
        "--checkpoint_format", choices=["npz", "orbax"], default="npz",
        help="Checkpoint backend for saved models",
    )
    parser.add_argument(
        "--resume", action="store_true",
        help="Continue an interrupted run from its last completed epoch "
        "(bit-identical to an uninterrupted run; uses the in-progress "
        "checkpoint the trainer writes every epoch in --save_dir)",
    )
    parser.add_argument(
        "--grad_accum", type=int, default=1,
        help="Gradient accumulation: run the configured batch as this many "
        "sequential micro-batches with ONE optimiser update — train "
        "effective batches whose activations exceed HBM. Loss/grads equal "
        "the full-batch step (global masked mean); BatchNorm models use "
        "micro-batch statistics (ghost BN, as in pipeline parallelism). "
        "batch_size must divide; exclusive with --steps_per_dispatch>1 "
        "and --parallel_folds",
    )
    parser.add_argument(
        "--async_checkpoint", action="store_true",
        help="With --resume: write the per-epoch in-progress checkpoint in "
        "a background thread (device-side snapshot at submit, so the next "
        "epoch starts immediately; same atomic on-disk format). A crash "
        "can lose only the newest epoch's checkpoint, never corrupt one",
    )
    parser.add_argument(
        "--zero1", action="store_true",
        help="ZeRO-1 optimiser-state sharding: store the SGD momentum 1/N "
        "over the --devices data mesh (grads reduce-scattered into the "
        "shards, params all-gathered). Same numerics as replicated state; "
        "no effect on a single device",
    )
    parser.add_argument(
        "--remat", action="store_true",
        help="Rematerialise block-internal activations in the backward "
        "(jax.checkpoint per bottleneck / per discriminator layer): same "
        "grads and trained model (up to fusion-level reassociation; "
        "tested), activation HBM drops to roughly the block boundaries, "
        "at ~+1/3 forward FLOPs. Use to fit larger --batch_size per chip; "
        "composes with --grad_accum and --precision bf16",
    )
    parser.add_argument(
        "--parallel_folds", action="store_true",
        help="Train all --k_folds CV folds SIMULTANEOUSLY as one SPMD "
        "program over a (fold, data) device mesh — per-fold trajectories "
        "identical to sequential training, wall time ~1 fold's. Needs a "
        "--devices count k_folds divides to win (folds sharing a device "
        "measured 0.76x sequential — PERF.md); exclusive with --resume, "
        "--steps_per_dispatch and --zero1",
    )
    parser.add_argument(
        "--auto_batch", action="store_true",
        help="Probe doubling batch sizes' compiled peak HBM ahead of time "
        "(XLA memory_analysis — no execution, no OOM crash) and adopt the "
        "largest that fits the device budget. Changes training batch "
        "semantics, so opt-in; exclusive with --grad_accum>1 and "
        "--parallel_folds. Composes with --remat (probe the remat step)",
    )
    parser.add_argument(
        "--hbm_budget_gb", type=float, default=None,
        help="Memory budget for --auto_batch in GiB (default: what the "
        "device backend reports; required on backends that report none)",
    )
    parser.add_argument(
        "--lr_schedule", choices=["constant", "cosine", "linear"],
        default="constant",
        help="Learning-rate schedule over each fold's steps (default: the "
        "reference's fixed rate). Evaluated from the optimiser step count "
        "inside the jitted step — one compile serves the whole curve",
    )
    parser.add_argument(
        "--warmup_steps", type=int, default=0,
        help="Linear LR warmup steps (0 -> config lr) before the schedule",
    )
    parser.add_argument(
        "--min_lr_ratio", type=float, default=0.0,
        help="Schedule floor as a fraction of the config lr",
    )
    parser.add_argument(
        "--clip_grad_norm", type=float, default=None,
        help="Clip gradients to this global norm (trainable leaves only) "
        "before the optimiser update",
    )
    parser.add_argument(
        "--label_smoothing", type=float, default=0.0, metavar="EPS",
        help="Label smoothing for the training cross-entropy "
        "(torch.nn.functional.cross_entropy semantics; validation/test "
        "losses stay unsmoothed)",
    )
    parser.add_argument(
        "--mixup", type=float, default=None, metavar="ALPHA",
        help="Mixup batch mixing with lambda ~ Beta(ALPHA, ALPHA): the "
        "augmented batch is blended with a rolled copy of itself and the "
        "train loss becomes lam*CE(y) + (1-lam)*CE(y_partner) "
        "(timm batch-mode semantics; train loss only)",
    )
    parser.add_argument(
        "--cutmix", type=float, default=None, metavar="ALPHA",
        help="CutMix batch mixing: a random box (area ratio 1-lambda, "
        "lambda corrected to the clipped box's exact pixel share) is pasted "
        "from a rolled copy of the batch. With --mixup too, a fair per-batch "
        "coin picks which applies",
    )
    parser.add_argument(
        "--ema_decay", type=float, default=None, metavar="DECAY",
        help="Maintain an exponential moving average of the weights (decay "
        "per optimiser step, e.g. 0.999) inside the optimiser state and "
        "evaluate/save every fold artifact from the EMA weights (BN "
        "statistics stay live). Training itself is unchanged",
    )
    parser.add_argument(
        "--early_stop", type=int, default=None, metavar="PATIENCE",
        help="Validate after every epoch and stop a fold after PATIENCE "
        "consecutive epochs without a new best validation loss; fold "
        "artifacts then describe the best epoch's weights, not the last. "
        "Exclusive with --parallel_folds",
    )


def resolve_class_names(
    args_classes: Optional[List[str]],
    config: dict,
    data_root: Optional[str],
    split: str = "test",
) -> List[str]:
    """Reference resolution order: --classes > config['classes'] > dataset
    dirs > default (test_RESNET50_Truncate.py:97-106)."""
    if args_classes:
        return list(args_classes)
    if "classes" in config:
        return list(config["classes"])
    if data_root:
        from ..data.imagefolder import ImageFolderIndex

        return ImageFolderIndex(os.path.join(data_root, split)).classes
    return ["fog", "rain", "snow", "sun"]


def resolve_seed(config: dict, cli_seed: Optional[int]):
    """config > CLI > random; write the choice back
    (train_best_RESNET50_Truncate.py:58-70)."""
    from ..core.prng import seed_everything

    seed = config.get("seed", cli_seed)
    if seed is None:
        seed, _ = seed_everything(None)
        config["seed"] = seed
    else:
        seed_everything(seed)
    return seed


def maybe_subset(samples, num_samples: Optional[int], seed: Optional[int] = None):
    """--num_samples random subsetting (test_RESNET50_Truncate.py:125-129)."""
    if num_samples is None or num_samples >= len(samples):
        return samples
    rng = random.Random(seed)
    indices = list(range(len(samples)))
    rng.shuffle(indices)
    return [samples[i] for i in indices[:num_samples]]


def load_checkpoint_tree(model_path: str, family: str, config: dict):
    """Route .pth files through the converter, .npz through native IO."""
    if model_path.endswith(".pth") or model_path.endswith(".pt"):
        from ..checkpoint import pth_converter as pc

        if family == "truncated_resnet50":
            return pc.convert_moco_checkpoint(model_path)
        if family == "gram_attention":
            return pc.convert_gram_attention_checkpoint(model_path)
        if family == "multi_patchgan":
            return pc.convert_multi_patchgan_checkpoint(
                model_path, config.get("patch_sizes", {}), ndf=config.get("ndf", 64),
                norm=config.get("norm", "batch"),
            )
        if family == "multi_patchgan_test":
            return pc.convert_multi_patchgan_test_checkpoint(
                model_path, config.get("patch_sizes", {}), ndf=config.get("ndf", 64),
                norm=config.get("norm", "batch"),
            )
        raise ValueError(family)
    if os.path.isdir(model_path):
        # orbax checkpoint directory (what --checkpoint_format orbax saves)
        from ..checkpoint.io import load_pytree_orbax

        return load_pytree_orbax(model_path)
    from ..checkpoint.io import load_pytree_npz

    return load_pytree_npz(model_path)


def resolve_compute_dtype(precision: Optional[str]):
    """--precision flag -> compute dtype (None = float32 passthrough).
    'int8' returns None: the quantised path handles dtypes itself."""
    if precision == "int8":
        return None
    import jax.numpy as jnp

    from ..core.dtypes import resolve_policy

    policy = resolve_policy(precision)
    return None if policy.compute_dtype == jnp.float32 else policy.compute_dtype


def cast_forward(forward, compute_dtype):
    """Wrap a forward fn so activations run in ``compute_dtype``."""
    if compute_dtype is None:
        return forward

    def wrapped(v, images):
        return forward(v, images.astype(compute_dtype))

    return wrapped


def apply_debug_flags(args):
    """Honour --debug_nans (SURVEY §5 sanitizer-equivalent, opt-in)."""
    if getattr(args, "debug_nans", False):
        import jax

        jax.config.update("jax_debug_nans", True)


def make_save_fn(checkpoint_format: str):
    """Checkpoint writer for run_kfold: npz (default) or orbax directories."""
    if checkpoint_format == "orbax":
        import json as _json
        import os as _os

        from ..checkpoint.io import save_pytree_orbax

        def save_orbax(tree, hyperparameters, save_dir, filename):
            path = _os.path.join(save_dir, f"{filename}.orbax")
            save_pytree_orbax(tree, path)
            with open(_os.path.join(save_dir, f"{filename}_hyperparameters.json"), "w") as f:
                _json.dump(hyperparameters, f, indent=4)
            return path

        return save_orbax
    from ..checkpoint.io import save_model_and_hyperparameters

    return save_model_and_hyperparameters


def weighted_auc_or_none(labels, probs, branch_on="labels"):
    """Reference --compute_auc semantics on the eval CLIs
    (test_RESNET50_Truncate_gram_attention.py:106-117,
    test_Multi_PatchGAN.py:218-235): weighted one-vs-rest for >2 classes,
    ``probs[:, 1]`` for binary; a ValueError (e.g. a class absent from the
    labels) prints the reference's warning and yields None.

    The two references pick the branch differently: gram_attention tests
    ``len(np.unique(labels)) > 2`` (``branch_on="labels"``, the default)
    while Multi_PatchGAN tests the probability-matrix width
    ``probs.shape[1] > 2`` (``branch_on="probs"``). The distinction matters
    when a >2-class model is evaluated on a subset whose labels cover <=2
    classes: the labels branch computes a binary AUC from ``probs[:, 1]``
    (as the gram_attention reference does) while the probs branch keeps the
    multiclass path, which raises ValueError for the absent classes and
    yields the reference's warning + ``auc: null``."""
    import numpy as np
    from sklearn.metrics import roc_auc_score

    labels = np.asarray(labels)
    probs = np.asarray(probs)
    multiclass = (
        probs.shape[1] > 2 if branch_on == "probs"
        else len(np.unique(labels)) > 2
    )
    try:
        if multiclass:
            return float(
                roc_auc_score(labels, probs, multi_class="ovr",
                              average="weighted")
            )
        return float(roc_auc_score(labels, probs[:, 1]))
    except ValueError as e:
        print(f"[WARNING] Impossible de calculer l'AUC : {e}")
        return None


def add_calib_data_arg(parser: argparse.ArgumentParser):
    parser.add_argument(
        "--calib_data", type=str, default=None,
        help="ImageFolder root for int8 activation calibration (its train/ "
        "split when present, else test/). Default: the --data root's train/ "
        "split — the evaluated test split is only used as a last resort, "
        "with a printed warning (calibrating on the evaluation data leaks "
        "its statistics into the reported int8 metrics)",
    )
    parser.add_argument(
        "--qat_steps", type=int, default=0,
        help="With --precision int8: quantization-aware fine-tune for N "
        "SGD steps through the fake-quant forward (nn/resnet_qat.py) on "
        "the calibration split before export — recovers PTQ accuracy loss. "
        "0 (default) = plain PTQ. Ignored when --quantized_path already "
        "exists (QAT is baked in at export time)",
    )
    parser.add_argument(
        "--qat_lr", type=float, default=1e-4,
        help="Learning rate for the --qat_steps fine-tune (SGD momentum 0.9)",
    )


def make_calibration_loader(args, batch_size: int):
    """Resolve the int8 activation-calibration source, leakage-free by
    default: the ``--calib_data`` root when given, else the ``--data`` root;
    within the chosen root prefer the ``train/`` split and fall back to
    ``test/`` only when no train split exists (printing a warning when that
    is also the evaluated split)."""
    root = getattr(args, "calib_data", None) or getattr(args, "data", None)
    if not root:
        raise ValueError(
            "--precision int8 nécessite --calib_data (ou --data) pour la "
            "calibration"
        )
    train_dir = os.path.join(root, "train")
    test_dir = os.path.join(root, "test")
    if os.path.isdir(train_dir):
        chosen = train_dir
    elif os.path.isdir(test_dir):
        chosen = test_dir
        if not getattr(args, "calib_data", None):
            print(
                "Avertissement: calibration int8 sur le split de test évalué "
                "(aucun split train/ sous --data) — les métriques int8 "
                "peuvent être légèrement optimistes; fournissez --calib_data."
            )
    else:
        raise ValueError(
            f"Aucun split train/ ou test/ trouvé sous {root} pour la "
            "calibration int8"
        )
    from ..data.imagefolder import ImageFolderIndex
    from ..data.loader import HostLoader

    idx = ImageFolderIndex(chosen)
    # ImageFolder samples are sorted class-by-class and only the FIRST
    # batches calibrate — interleave classes round-robin so the activation
    # ranges see every class, not just the alphabetically-first one
    by_class: dict = {}
    for s in idx.samples:
        by_class.setdefault(s[1], []).append(s)
    groups = [by_class[k] for k in sorted(by_class)]
    samples = []
    for i in range(max(len(g) for g in groups)):
        for g in groups:
            if i < len(g):
                samples.append(g[i])
    return HostLoader(samples, min(batch_size, 32), shuffle=False)


def build_int8_family2(
    variables,
    truncate: int,
    gram_matrix_size: int,
    num_classes: int,
    cal_batches=None,
    quantized_path: Optional[str] = None,
    qat_steps: int = 0,
    qat_lr: float = 1e-4,
    labeled_batches=None,
):
    """Shared family-2 int8 setup (eval + serve CLIs): PTQ the encoder
    (loading a persisted quantised tree from ``quantized_path`` when
    present, else calibrating on ``cal_batches`` and saving there if given),
    strip the unused f32 encoder from the tree shipped through the jit
    boundary, and return (apply_eval, variables') with
    ``apply_eval(v, images) -> (embeddings, logits)``.

    ``qat_steps`` > 0: QAT fine-tune through the fake-quant gram+attention
    forward on ``labeled_batches`` before quantising (see
    build_int8_family1)."""
    import jax.numpy as jnp

    from ..models.gram_attention import gram_attention_apply_int8
    from ..nn.resnet_int8 import (
        calibrate_activation_scales,
        load_quantized,
        quantize_resnet50,
        save_quantized,
    )

    if quantized_path and os.path.exists(quantized_path):
        q_enc = load_quantized(quantized_path)
    else:
        if cal_batches is None:
            raise ValueError(
                "int8 needs calibration batches (or an existing quantized_path)"
            )
        t8 = min(truncate, 8)
        scales = calibrate_activation_scales(
            variables["encoder"], cal_batches, t8
        )
        if qat_steps:
            if not labeled_batches:
                raise ValueError("--qat_steps needs labeled calibration batches")
            from ..models.gram_attention import gram_attention_apply_qat
            from ..train.qat import qat_finetune

            def fwd_qat(v, images):
                _, logits = gram_attention_apply_qat(
                    v, scales, images, truncate, gram_matrix_size, num_classes
                )
                return logits

            variables = qat_finetune(
                variables, fwd_qat, labeled_batches, qat_steps, qat_lr
            )
        q_enc = quantize_resnet50(variables["encoder"], scales, t8)
        if quantized_path:
            save_quantized(q_enc, quantized_path)
            print(f"Quantised encoder saved to {quantized_path}")

    # the quantised encoder rides as jit constants; drop the unused f32
    # encoder so it is never shipped through the jit boundary
    variables = {k: v for k, v in variables.items() if k != "encoder"}

    def apply_eval(v, images):
        emb, logits, _ = gram_attention_apply_int8(
            q_enc, v, images.astype(jnp.float32), gram_matrix_size, num_classes
        )
        return emb, logits

    return apply_eval, variables


def collect_calibration_batches(loader, n: int = 2, with_labels: bool = False):
    """First ``n`` loader batches through the canonical on-device preprocess
    — the exact tensors the quantised encoder will consume.
    ``with_labels``: return (images, labels) pairs (the QAT fine-tune needs
    targets; pad entries keep label -1 and are masked by the CE)."""
    import jax.numpy as jnp

    from ..data.augment import eval_preprocess

    cal = []
    for bi, b in enumerate(loader):
        images = eval_preprocess(jnp.asarray(b["image"]))
        if with_labels:
            cal.append((images, jnp.asarray(b["label"])))
        else:
            cal.append(images)
        if bi >= n - 1:
            break
    return cal


def build_int8_family1(
    variables,
    truncate: int,
    cal_batches=None,
    keep_encoder: bool = False,
    quantized_path: Optional[str] = None,
    qat_steps: int = 0,
    qat_lr: float = 1e-4,
    labeled_batches=None,
):
    """Shared family-1 int8 setup (eval + serve CLIs): PTQ the encoder
    (loading a persisted quantised tree from ``quantized_path`` when
    present, else calibrating on ``cal_batches`` and saving there if given),
    strip the unused f32 encoder from the tree shipped through the jit
    boundary (unless ``keep_encoder`` — Grad-CAM still needs it), and return
    (forward_eval, embed_fn, variables').

    ``qat_steps`` > 0: fine-tune through the fake-quant forward on
    ``labeled_batches`` ((images, labels) pairs from the calibration split)
    before quantising — QAT accuracy recovery (nn/resnet_qat.py). The heads
    are tuned together with the encoder."""
    import jax.numpy as jnp

    from ..models.truncated_resnet50 import combined_apply_int8
    from ..nn.resnet_int8 import (
        calibrate_activation_scales,
        load_quantized,
        quantize_resnet50,
        resnet50_apply_int8,
        save_quantized,
    )
    from ..ops.linear import linear
    from ..ops.pooling import global_avg_pool

    if quantized_path and os.path.exists(quantized_path):
        q_enc = load_quantized(quantized_path)
    else:
        if cal_batches is None:
            raise ValueError(
                "int8 needs calibration batches (or an existing quantized_path)"
            )
        scales = calibrate_activation_scales(
            variables["moco"]["encoder"], cal_batches, truncate
        )
        if qat_steps:
            if not labeled_batches:
                raise ValueError("--qat_steps needs labeled calibration batches")
            from ..models.truncated_resnet50 import combined_apply_qat
            from ..train.qat import qat_finetune

            def fwd_qat(v, images):
                return combined_apply_qat(
                    v["moco"], v["classifier"], scales, images, truncate
                )

            variables = qat_finetune(
                variables, fwd_qat, labeled_batches, qat_steps, qat_lr
            )
        q_enc = quantize_resnet50(variables["moco"]["encoder"], scales, truncate)
        if quantized_path:
            save_quantized(q_enc, quantized_path)
            print(f"Quantised encoder saved to {quantized_path}")

    if keep_encoder:
        heads = variables
    else:
        heads = {
            "moco": {"fc": variables["moco"]["fc"]},
            "classifier": variables["classifier"],
        }

    def forward_eval(v, images):
        logits, _ = combined_apply_int8(
            q_enc, v["moco"], v["classifier"], images.astype(jnp.float32)
        )
        return logits

    def embed_fn(v, images):
        feats = resnet50_apply_int8(q_enc, images.astype(jnp.float32))
        return linear(v["moco"]["fc"], global_avg_pool(feats))

    return forward_eval, embed_fn, heads


def start_profile(profile_dir: Optional[str]):
    """Start a jax.profiler trace for the rest of the process (stops at
    exit). Context-manager-free so CLI bodies need no re-indentation."""
    if not profile_dir:
        return
    import atexit

    import jax

    jax.profiler.start_trace(profile_dir)
    atexit.register(jax.profiler.stop_trace)


def count_params(tree) -> int:
    import jax

    return sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "shape")
    )


def make_writer(enabled: bool, save_dir: str, sub: str = "tensorboard"):
    if not enabled:
        return None
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(log_dir=os.path.join(save_dir, sub))
    except Exception:
        print("TensorBoard unavailable; continuing without it.")
        return None


def build_mesh(n_devices: Optional[int], batch_size: Optional[int] = None):
    """Data-parallel mesh; the device count must divide the (padded) batch
    size, so clamp to the largest divisor when needed."""
    import jax

    from ..core.mesh import create_mesh

    avail = len(jax.devices())
    n = min(n_devices or avail, avail)
    if batch_size is not None:
        while n > 1 and batch_size % n != 0:
            n -= 1
    return create_mesh(n)


def resolve_lr_schedule(args, cfg, n_samples: int, k_folds: int):
    """(lr_schedule_or_None, clip_norm_or_None) from the CLI flags —
    computed BEFORE the setup_* factory so the schedule bakes into the one
    compiled train step. The horizon is each fold's total optimiser steps
    (train/schedules.steps_per_fold); the count restarts per fold, so every
    fold sees the full warmup+decay curve."""
    name = getattr(args, "lr_schedule", "constant") or "constant"
    warmup = int(getattr(args, "warmup_steps", 0) or 0)
    clip = getattr(args, "clip_grad_norm", None)
    if name == "constant" and warmup == 0:
        return None, clip
    if getattr(args, "auto_batch", False):
        raise SystemExit(
            "--lr_schedule/--warmup_steps are exclusive with --auto_batch: "
            "the schedule horizon is fixed per batch size before the probe "
            "runs; pick the batch first (run --auto_batch alone), then "
            "schedule at that batch"
        )
    from ..train.schedules import make_lr_schedule, steps_per_fold

    total = steps_per_fold(n_samples, k_folds, cfg.batch_size, args.epochs)
    sched = make_lr_schedule(
        name, cfg.lr, total, warmup, getattr(args, "min_lr_ratio", 0.0)
    )
    if sched is not None:
        print(
            f"lr schedule: {name}, warmup {warmup} steps, horizon {total} "
            f"steps/fold, floor {cfg.lr * getattr(args, 'min_lr_ratio', 0.0):g}"
        )
    return sched, clip


def resolve_mix_fn(args):
    """train/mixing.make_mix_fn from the --mixup/--cutmix flags (None when
    both are off — the train step then compiles the exact unmixed
    program)."""
    mixup = getattr(args, "mixup", None)
    cutmix = getattr(args, "cutmix", None)
    if mixup is None and cutmix is None:
        return None
    from ..train.mixing import make_mix_fn

    return make_mix_fn(mixup_alpha=mixup, cutmix_alpha=cutmix)


def _ema_eval_fn(args):
    """run_kfold(eval_variables_fn=) for --ema_decay: evaluate and save all
    fold artifacts from the EMA weights carried in the optimiser state
    (train/optim.param_ema); None when the flag is off."""
    if getattr(args, "ema_decay", None) is None:
        return None
    from ..train.optim import extract_ema_variables

    return extract_ema_variables


def apply_auto_batch(args, setup, cfg, mesh, hyperparameters=None):
    """--auto_batch: probe candidate batch sizes' compiled peak memory
    ahead of time (train/autotune.py) and adopt the largest that fits the
    HBM budget. Mutates cfg.batch_size (and the hyperparameters dict that
    feeds training_info.json / the resume signature); call BEFORE anything
    that consumes them (grad-accum validation, fold meshes, run_kfold)."""
    if not getattr(args, "auto_batch", False):
        return
    if getattr(args, "grad_accum", 1) > 1 or getattr(args, "parallel_folds", False):
        raise SystemExit(
            "--auto_batch is exclusive with --grad_accum>1 and "
            "--parallel_folds (those dispatch different step programs than "
            "the one the probe measures)"
        )
    import jax

    from ..data.loader import STAGING_SIZE
    from ..train.autotune import (
        GIB,
        autotune_batch,
        batch_candidates,
        describe_report,
        device_hbm_bytes,
        train_step_peak_bytes,
    )

    budget = (
        int(args.hbm_budget_gb * GIB)
        if args.hbm_budget_gb
        else device_hbm_bytes()
    )
    if budget is None:
        raise SystemExit(
            "--auto_batch: this backend does not report a memory budget; "
            "pass --hbm_budget_gb"
        )
    state_shapes = jax.eval_shape(setup.init, jax.random.PRNGKey(0))
    divisor = int(mesh.devices.size) if mesh is not None else 1
    cands = batch_candidates(cfg.batch_size, divisor)
    chosen, report = autotune_batch(
        lambda b: train_step_peak_bytes(
            setup.train_step, state_shapes, b, STAGING_SIZE
        ),
        budget,
        cands,
    )
    print(describe_report(report, budget))
    if chosen is None:
        raise SystemExit(
            f"--auto_batch: even batch {cands[0]} exceeds the budget; try "
            "--remat and/or --grad_accum"
        )
    if chosen != cfg.batch_size:
        print(
            f"--auto_batch: adopting batch {chosen} "
            f"(configured {cfg.batch_size})"
        )
        cfg.batch_size = chosen
        if hyperparameters is not None:
            hyperparameters["batch_size"] = chosen
    else:
        print(f"--auto_batch: keeping configured batch {cfg.batch_size}")


def apply_grad_accum(args, setup, batch_size: int):
    """--grad_accum K: replace setup.train_step with the accumulation step
    (train_loop.make_train_step_accum). Validates divisibility and the
    exclusive flags here so misuse fails before any compile."""
    n = int(getattr(args, "grad_accum", 1) or 1)
    if n <= 1:
        return
    if getattr(args, "steps_per_dispatch", 1) > 1:
        raise SystemExit("--grad_accum and --steps_per_dispatch>1 are "
                         "exclusive (pick one batching of the dispatch)")
    if getattr(args, "parallel_folds", False):
        raise SystemExit("--grad_accum and --parallel_folds are exclusive")
    if batch_size % n:
        raise SystemExit(
            f"--grad_accum {n} does not divide batch_size {batch_size}"
        )
    setup.train_step = setup.accum_step(n)
    print(f"Gradient accumulation: {n} micro-batches of "
          f"{batch_size // n} per optimiser step")


def signature_extra_from_args(args) -> Optional[dict]:
    """Numerics-changing step configuration for the resume run-signature
    (run_kfold(signature_extra=)): resuming under a different --grad_accum
    (ghost-BN statistics), --precision (compute dtype), or augmentation
    selection (different combo product → different batches per epoch)
    would silently stitch two incompatible trajectories together — so all
    of them are part of the run identity. Every entry is omitted at its
    default, so plain-run signatures are unchanged (back-compat with
    existing in-progress checkpoints)."""
    extra = {}
    n = int(getattr(args, "grad_accum", 1) or 1)
    if n > 1:
        extra["grad_accum"] = n
    precision = getattr(args, "precision", "float32") or "float32"
    if precision != "float32":
        extra["precision"] = precision
    for flag, default in (
        ("color_aug", False),
        ("geom_aug", False),
        ("num_color_transforms", 0),
        ("num_geom_transforms", 0),
        ("geom_transforms", None),
        # schedule/clipping change the update rule: resuming under a
        # different one would stitch incompatible trajectories
        ("lr_schedule", "constant"),
        ("warmup_steps", 0),
        ("min_lr_ratio", 0.0),
        ("clip_grad_norm", None),
        ("label_smoothing", 0.0),
        # early stopping changes which epoch a fold stops at, and the
        # in-progress checkpoint's structure (counter leaves)
        ("early_stop", None),
        # EMA changes the optimiser-state structure (extra param tree)
        ("ema_decay", None),
        # freezing changes which leaves the optimiser updates
        ("freeze_encoder", False),
        # mixing changes the training trajectory
        ("mixup", None),
        ("cutmix", None),
    ):
        val = getattr(args, flag, default)
        if val != default and val is not None:
            extra[flag] = val
    return extra or None


def resolve_fold_parallel(args, setup, k_folds: int, batch_size: int):
    """--parallel_folds: build the (fold, data) mesh and the fold-parallel
    train step (all CV folds as one SPMD program). Returns
    (foldwise_step, fold_mesh), both None when the flag is off."""
    if not getattr(args, "parallel_folds", False):
        return None, None
    if getattr(args, "zero1", False):
        raise SystemExit(
            "--parallel_folds and --zero1 are exclusive (the optimiser "
            "state is already sharded over the fold axis)"
        )
    if getattr(args, "early_stop", None) is not None:
        raise SystemExit(
            "--parallel_folds and --early_stop are exclusive (all folds "
            "run as one SPMD program — no per-fold stopping point)"
        )
    from ..parallel.foldparallel import make_fold_mesh

    mesh = make_fold_mesh(k_folds, args.devices, batch_size)
    print(
        "Fold-parallel training: mesh "
        f"{dict(zip(mesh.axis_names, mesh.devices.shape))}"
    )
    warn_partial_fold_sharding(mesh, k_folds)
    return setup.foldwise_step(mesh), mesh


def warn_partial_fold_sharding(mesh, k_folds: int) -> bool:
    """Warn when the fold axis can't fully shard. Measured on a v5e chip
    (PERF.md): vmapping folds that SHARE a device turns the per-fold-weight
    convs into batched-kernel convs the MXU runs ~25% slower than sequential
    folds — the win comes from sharding the fold axis (local fold width 1)."""
    fold_dim = mesh.devices.shape[0]
    if fold_dim >= k_folds:
        return False
    print(
        f"WARNING: only {fold_dim} of {k_folds} folds shard onto "
        "devices (fold axis = gcd(k_folds, devices)); folds sharing a "
        "device run ~0.76x sequential speed on TPU (PERF.md). "
        "Use a device count that k_folds divides for the full win."
    )
    return True


def resolve_eval_mesh(n_devices: Optional[int], batch_size: int):
    """--devices on the eval CLIs: data-parallel mesh for the batched eval
    paths (classification / embeddings). None or 1 -> single-device (None)."""
    if n_devices is None or n_devices <= 1:
        return None
    mesh = build_mesh(n_devices, batch_size)
    return mesh if mesh.devices.size > 1 else None


def resolve_style_mesh(
    n_devices: Optional[int], shard_spatial: Optional[int], batch_size: int
):
    """Style-transfer mesh: the batch over 'data' and — when --shard_spatial
    > 1 — each canvas's H rows over 'spatial' (GSPMD halo exchanges in the
    encoder fwd/bwd each Adam iteration; the big-canvas path, see
    tasks/style_transfer.make_style_transfer_optimizer). The data axis is
    clamped to the largest batch divisor, exactly like resolve_eval_mesh."""
    import jax

    from ..parallel.sharding import make_mesh_spatial

    sp = int(shard_spatial or 1)
    if sp <= 1:
        return resolve_eval_mesh(n_devices, batch_size)
    avail = len(jax.devices())
    if sp > avail:
        print(
            f"Warning: --shard_spatial {sp} > {avail} available devices; "
            f"clamping to {avail}."
        )
        sp = avail
    n = min(n_devices or sp, avail)
    n = max(n - n % sp, sp)  # whole spatial groups
    data = n // sp
    while data > 1 and batch_size % data != 0:
        data -= 1
    return make_mesh_spatial(data * sp, spatial=sp)


def select_augmentations(args):
    """Reference augmentation selection (train_best_RESNET50_Truncate.py:72-123):
    returns (geom_names, color_names) lists possibly containing None."""
    from ..data.augment import AVAILABLE_COLOR_TRANSFORMS, AVAILABLE_GEOM_TRANSFORMS

    color = [None]
    geom = [None]
    if getattr(args, "color_aug", False) and getattr(args, "num_color_transforms", 0) > 0:
        n = min(args.num_color_transforms, len(AVAILABLE_COLOR_TRANSFORMS))
        color = random.sample(list(AVAILABLE_COLOR_TRANSFORMS), n)
    if getattr(args, "geom_aug", False):
        if getattr(args, "geom_transforms", None):
            geom = []
            for t in args.geom_transforms:
                if t in AVAILABLE_GEOM_TRANSFORMS:
                    geom.append(t)
                else:
                    print(f"Warning: Geometric transform '{t}' is not recognized.")
            geom = geom or [None]
        elif getattr(args, "num_geom_transforms", 0) > 0:
            n = min(args.num_geom_transforms, len(AVAILABLE_GEOM_TRANSFORMS))
            geom = random.sample(list(AVAILABLE_GEOM_TRANSFORMS), n)
    return geom, color
