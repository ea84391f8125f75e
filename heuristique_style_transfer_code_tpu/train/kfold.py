"""K-fold cross-validation driver with the reference's artifact surface
(train_best_RESNET50_Truncate.py:146-258):

- sklearn KFold(shuffle=True, random_state=seed) over the train ImageFolder
- per fold: fresh init (+ optional pretrained load), train, eval
- artifacts: fold_<k>_performance.json, best_model_fold_<k>.npz (improving
  across reruns via best_model_results.json), best_global_model.npz by
  val_loss, training_info.json with per-fold and averaged metrics
"""
from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional

import jax
import numpy as np

from ..checkpoint.io import save_model_and_hyperparameters
from ..data.imagefolder import ImageFolderIndex
from ..data.loader import HostLoader
from .train_loop import evaluate, train_epochs


def load_training_info(save_dir: str, filename: str):
    path = os.path.join(save_dir, filename)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


def save_training_info(info, save_dir: str, filename: str):
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, filename)
    with open(path, "w") as f:
        json.dump(info, f, indent=4)
    print(f"Training information saved to {path}")


_INPROGRESS_STATE = "_inprogress_state.npz"
_INPROGRESS_META = "_inprogress_meta.json"
_INPROGRESS_BEST = "_inprogress_best.npz"  # early-stop best-epoch weights


def _run_signature(
    seed, k_folds, epochs, split_seed, hyperparameters, extra=None
) -> str:
    """Identity of a training run: resuming under a different configuration
    would silently stitch old state into new splits, so the signature is
    stored with every in-progress artifact and checked on resume. ``extra``
    carries numerics-changing step configuration that lives outside the
    model hyperparameters (e.g. --grad_accum, whose ghost-BN micro-batch
    statistics change the trajectory); omitted when falsy so signatures of
    plain runs are unchanged."""
    d = {
        "seed": seed,
        "k_folds": k_folds,
        "epochs": epochs,
        "split_seed": split_seed,
        "hyperparameters": hyperparameters,
    }
    if extra:
        d["extra"] = extra
    return json.dumps(d, sort_keys=True, default=str)


def _inprogress_tree(variables, opt_state, key, fold, epochs_done, signature,
                     extra_leaves=None):
    """ONE atomic artifact per epoch: variables + flattened optimiser leaves
    + the evolved PRNG key + the position (fold, epochs_done) + the run
    signature. Position and state living in the same file means no crash
    window can pair epoch-E+1 weights with an epoch-E position.
    ``extra_leaves`` (e.g. early-stop counters) join the tree only when
    present, so plain-run checkpoints keep their exact structure."""
    tree = {
        "variables": variables,
        "opt_leaves": list(jax.tree_util.tree_leaves(opt_state)),
        "key": np.asarray(key),
        "fold": int(fold),
        "epochs_done": int(epochs_done),
        "signature": np.asarray(signature),
    }
    if extra_leaves:
        tree.update(extra_leaves)
    return tree


def _save_inprogress_state(
    save_dir, variables, opt_state, key, fold, epochs_done, signature,
    async_writer=None, extra_leaves=None,
):
    from ..checkpoint.io import save_pytree_npz

    tree = _inprogress_tree(variables, opt_state, key, fold, epochs_done,
                            signature, extra_leaves)
    path = os.path.join(save_dir, _INPROGRESS_STATE)
    if async_writer is not None:
        async_writer.submit(tree, path)  # device snapshot; write overlapped
    else:
        save_pytree_npz(tree, path)


def _load_inprogress_state(save_dir):
    from ..checkpoint.io import load_pytree_npz

    # as_jax=False: the tree carries a string leaf (signature); numeric
    # leaves are fed to the jitted step as numpy and placed on device there
    return load_pytree_npz(
        os.path.join(save_dir, _INPROGRESS_STATE), as_jax=False
    )


def _restore_opt_state(tree, opt_template):
    """The optimiser state's (NamedTuple) structure is rebuilt from a
    freshly initialised template."""
    treedef = jax.tree_util.tree_structure(opt_template)
    return jax.tree_util.tree_unflatten(treedef, tree["opt_leaves"])


def _save_inprogress_meta(save_dir, meta):
    """Fold-boundary results snapshot (fold_results, best_model_results,
    best_global_path) — written only when a fold completes."""
    tmp = os.path.join(save_dir, _INPROGRESS_META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=4)
    os.replace(tmp, os.path.join(save_dir, _INPROGRESS_META))


def _clear_inprogress(save_dir):
    for name in (_INPROGRESS_STATE, _INPROGRESS_META, _INPROGRESS_BEST):
        p = os.path.join(save_dir, name)
        if os.path.exists(p):
            os.unlink(p)


def run_kfold(
    dataset: ImageFolderIndex,
    *,
    k_folds: int,
    seed: int,
    epochs: int,
    batch_size: int,
    save_dir: str,
    hyperparameters: dict,
    init_fn: Callable[[jax.Array, int], tuple],
    # init_fn(key, fold) -> (variables, opt_state, train_step, eval_step)
    combos_per_sample: int = 1,
    combo_of: Optional[Callable[[int], int]] = None,
    key: Optional[jax.Array] = None,
    writer=None,
    num_workers: int = 8,
    verbose_batches: bool = True,
    save_fn: Optional[Callable] = None,
    mesh=None,
    kfold_random_state: Optional[int] = None,
    save_every_fold: bool = False,
    performance_filename: Optional[str] = None,
    train_step_multi: Optional[Callable] = None,
    steps_per_dispatch: int = 1,
    resume: bool = False,
    async_checkpoint: bool = False,
    foldwise_step: Optional[Callable] = None,
    fold_mesh=None,
    signature_extra: Optional[Dict] = None,
    early_stop: Optional[int] = None,
    eval_variables_fn: Optional[Callable] = None,
    on_fold_end: Optional[Callable] = None,
    # on_fold_end(fold, result_dict, best_model_path): per-family extra
    # artifacts (e.g. family 2's best_performance/hyperparameters_fold files)
    _interrupt_after=None,
) -> Dict:
    """Runs the full CV protocol; returns training_info dict.

    Family-3 artifact surface (train_best_Multi_PatchGAN.py:63,119-130):
    ``kfold_random_state`` pins the split independently of the run seed (the
    reference hard-codes 42 for this family), ``save_every_fold`` writes an
    unconditional ``model_fold_<k>`` checkpoint per fold, and
    ``performance_filename`` dumps the fold-results list (e.g.
    retrained_performance.json).

    Elastic resume (beyond the reference's fold-level best-results file):
    with ``resume=True`` every epoch ends with an atomic in-progress
    checkpoint (variables, optimiser state, evolved PRNG key, position in
    ONE npz; completed-fold results in a sibling meta updated at fold
    boundaries), and an interrupted run continues from the last completed
    epoch, BIT-IDENTICAL to an uninterrupted run (tested). The in-progress
    files are removed on successful completion; runs without ``resume``
    pay no per-epoch checkpoint cost. ``async_checkpoint=True`` moves the
    per-epoch write to a background thread (device-side snapshot at submit,
    checkpoint/async_io.py): the next epoch starts immediately, files and
    resume numerics are unchanged, and a crash can lose only the newest
    epoch's checkpoint, never corrupt one. ``_interrupt_after=(fold, epoch)``
    is a test seam that raises right after that epoch's checkpoint.

    Fold-parallel training (TPU-native, beyond the reference): pass
    ``foldwise_step`` (from ``parallel.foldparallel.make_foldwise_train_step``
    or ``FamilySetup.foldwise_step``) and its ``fold_mesh`` — ALL folds then
    train simultaneously as one SPMD program, the fold index sharded over the
    mesh's 'fold' axis, and the per-fold evaluation/artifact protocol below
    runs unchanged on the trained states. Per-fold trajectories match the
    sequential driver (same init keys, per-step PRNG subkeys, and batch
    sequences; tested in tests/test_foldparallel.py). Mutually exclusive
    with ``resume`` and ``steps_per_dispatch > 1``.

    Early stopping (additive, train/early_stop.py): ``early_stop=P``
    validates after every epoch, stops a fold after P consecutive epochs
    without a new best validation loss, and restores the best epoch's
    weights before the fold-end evaluation — so every fold artifact
    describes the best epoch, not the last. Counters and the best snapshot
    ride the resume checkpoint (a resumed run stops at the identical
    epoch). Exclusive with fold-parallel training (folds share one program
    there — no per-fold stopping point).

    ``eval_variables_fn(variables, opt_state) -> variables`` substitutes the
    tree used for EVERY evaluation and artifact save (training always
    continues from the raw variables) — the hook for EMA evaluation
    (train/optim.extract_ema_variables, ``--ema_decay``); the EMA itself
    rides the optimiser state, so checkpoints/resume carry it for free."""
    from sklearn.model_selection import KFold

    from ..utils.logging import StructuredLogger

    os.makedirs(save_dir, exist_ok=True)
    logger = StructuredLogger(save_dir, echo=False)  # events.jsonl beside prints
    if key is None:
        key = jax.random.PRNGKey(seed)

    split_seed = seed if kfold_random_state is None else kfold_random_state
    kf = KFold(n_splits=k_folds, shuffle=True, random_state=split_seed)
    num_classes = len(dataset.classes)

    fold_results = []
    best_model_results = load_training_info(save_dir, "best_model_results.json") or []
    best_performance = float("inf")
    best_global_path = None

    # resume position comes from the state npz (state+position atomic); the
    # fold-boundary meta carries the completed folds' results. Either may be
    # absent (crash in fold 0 / crash before the first epoch checkpoint).
    signature = _run_signature(
        seed, k_folds, epochs, split_seed, hyperparameters, signature_extra
    )
    acw = None
    if resume and async_checkpoint:
        from ..checkpoint.async_io import AsyncCheckpointWriter

        acw = AsyncCheckpointWriter()  # flushes via atexit even on a crash
    # the preemption flag is module-global: clear any stale request from an
    # earlier run in this process UNCONDITIONALLY (a non-resume run would
    # otherwise raise PreemptedError claiming progress was checkpointed)
    from .preemption import clear_preemption, install_sigterm_handler

    clear_preemption()
    if resume:
        # preemptible-fleet support: SIGTERM stops the run at the next safe
        # point (PreemptedError out of the batch loop) with the last epoch's
        # checkpoint durable — the CLIs catch it and print the resume hint
        install_sigterm_handler()
    resume_state, resume_fold, resume_epochs = None, None, 0
    if resume:
        meta = load_training_info(save_dir, _INPROGRESS_META)
        state_path = os.path.join(save_dir, _INPROGRESS_STATE)
        # load the (potentially large) state npz at most ONCE; its signature
        # check and the state restore below share the same load
        loaded_state = (
            _load_inprogress_state(save_dir)
            if os.path.exists(state_path)
            else None
        )
        for found in (
            meta.get("signature") if meta else None,
            str(np.asarray(loaded_state["signature"]))
            if loaded_state is not None
            else None,
        ):
            if found is not None and found != signature:
                raise ValueError(
                    "--resume: this run's configuration does not match the "
                    "interrupted run's (seed/k_folds/epochs/split/"
                    f"hyperparameters differ).\n  was: {found}\n  now: {signature}"
                )
        if meta is not None or loaded_state is not None:
            if meta is not None:
                fold_results = list(meta["fold_results"])
                # cross-run list as of the interrupted run's fold boundary;
                # when no fold completed (meta absent) the json-loaded list
                # above already holds the right cross-run state
                best_model_results = list(meta.get("best_model_results", []))
                best_global_path = meta.get("best_global_path")
            if fold_results:
                best_performance = min(r["val_loss"] for r in fold_results)
            resume_fold = len(fold_results)  # first fold not in the meta
            if loaded_state is not None:
                resume_state = loaded_state
                # the state is for the in-progress fold only; a stale state
                # from an already-completed fold means resume at the next
                # fold from a fresh init
                if int(resume_state["fold"]) == resume_fold:
                    resume_epochs = int(resume_state["epochs_done"])
                else:
                    resume_state = None
            print(f"Resuming from fold {resume_fold}, epoch {resume_epochs}")

    training_info = load_training_info(save_dir, "training_info.json") or {
        "num_classes": num_classes,
        "class_names": dataset.classes,
        "num_samples_per_class": dataset.samples_per_class(),
        "total_num_samples": len(dataset),
        "num_epochs": epochs,
        "num_folds": k_folds,
        "fold_results": [],
    }
    if resume_fold is not None:
        # append the restored folds exactly as the uninterrupted run would
        # have (training_info may carry entries from prior complete runs)
        training_info["fold_results"].extend(
            {"fold": i, **r} for i, r in enumerate(fold_results)
        )

    if save_fn is None:
        save_fn = save_model_and_hyperparameters

    splits = list(kf.split(np.arange(len(dataset))))
    # the per-fold key stream is consumed upfront in split order — the same
    # stream the sequential per-fold loop draws, so both paths (and resumed
    # runs, which must skip folds without skipping splits) stay identical
    fold_keys = []
    for _ in splits:
        key, init_key, train_key = jax.random.split(key, 3)
        fold_keys.append((init_key, train_key))

    def make_train_loader(fold: int, train_idx) -> HostLoader:
        # augmentation product expansion: each train sample x each combo
        train_samples, combo_ids = [], []
        for i in train_idx:
            for c in range(combos_per_sample):
                train_samples.append(dataset.samples[i])
                combo_ids.append(combo_of(c) if combo_of else c)
        return HostLoader(
            train_samples,
            batch_size,
            combo_ids=combo_ids,
            shuffle=True,
            seed=seed + fold,
            num_workers=num_workers,
        )

    if early_stop is not None and foldwise_step is not None:
        raise ValueError(
            "early stopping and fold-parallel training are exclusive: all "
            "folds run as one SPMD program there, with no per-fold stop point"
        )

    trained_folds, fold_eval_steps = None, None
    if foldwise_step is not None:
        # all folds trained at once as one SPMD program (see docstring);
        # the per-fold loop below then only evaluates and writes artifacts
        if resume:
            raise ValueError("fold-parallel training does not support --resume")
        if steps_per_dispatch > 1:
            raise ValueError(
                "fold-parallel training and --steps_per_dispatch are exclusive"
            )
        from ..parallel.foldparallel import train_folds_parallel

        fold_states, fold_eval_steps = [], []
        for fold in range(k_folds):
            variables, opt_state, _, eval_step = init_fn(fold_keys[fold][0], fold)
            fold_states.append((variables, opt_state))
            fold_eval_steps.append(eval_step)
        trained_folds = train_folds_parallel(
            foldwise_step,
            fold_states,
            [make_train_loader(f, splits[f][0]) for f in range(k_folds)],
            epochs,
            [tk for _, tk in fold_keys],
            fold_mesh,
            verbose_batches=verbose_batches,
            writer=writer,
        )

    def _eval_vars(v, o):
        return eval_variables_fn(v, o) if eval_variables_fn is not None else v

    for fold, (train_idx, val_idx) in enumerate(splits):
        init_key, train_key = fold_keys[fold]
        if resume_fold is not None and fold < resume_fold:
            continue  # fold fully done; its results were restored above
        print(f"FOLD {fold}")
        val_loader = HostLoader(
            [dataset.samples[i] for i in val_idx],
            batch_size,
            shuffle=False,
            num_workers=num_workers,
        )

        if trained_folds is not None:
            variables, opt_state = trained_folds[fold]
            eval_step = fold_eval_steps[fold]
            variables = _eval_vars(variables, opt_state)
        else:
            train_loader = make_train_loader(fold, train_idx)
            variables, opt_state, train_step, eval_step = init_fn(init_key, fold)

            stopper = None
            if early_stop is not None:
                from .early_stop import EarlyStopper

                stopper = EarlyStopper(early_stop)

            start_epoch = 0
            if resume_state is not None and fold == resume_fold and resume_epochs > 0:
                variables = resume_state["variables"]
                opt_state = _restore_opt_state(resume_state, opt_state)
                train_key = resume_state["key"]
                start_epoch = resume_epochs
                train_loader.set_epoch(start_epoch)
                if stopper is not None and "es_best_loss" in resume_state:
                    from ..checkpoint.io import load_pytree_npz

                    best_path = os.path.join(save_dir, _INPROGRESS_BEST)
                    best_v = (
                        load_pytree_npz(best_path, as_jax=False)["variables"]
                        if os.path.exists(best_path)
                        else None
                    )
                    stopper.restore(resume_state, best_v)

            on_epoch_end = None
            if resume or stopper is not None:

                def on_epoch_end(epoch, v, o, k, _fold=fold,
                                 _stopper=stopper):
                    stop = False
                    if _stopper is not None:
                        # per-epoch validation drives the stop decision and
                        # the best-epoch snapshot (host copy — the next
                        # epoch's dispatch donates these buffers); with an
                        # eval_variables_fn (EMA) both see the merged tree
                        ev = _eval_vars(v, o)
                        r = evaluate(
                            eval_step, ev, val_loader, num_classes,
                            fold=_fold, writer=writer, step=epoch,
                        )
                        stop = _stopper.update(r["val_loss"], ev, epoch)
                        if resume and _stopper.improved_last:
                            # best file BEFORE the counter checkpoint: a
                            # crash between the two re-runs this epoch on
                            # resume and rewrites the identical best file
                            from ..checkpoint.io import save_pytree_npz

                            save_pytree_npz(
                                {"variables": _stopper.best_variables},
                                os.path.join(save_dir, _INPROGRESS_BEST),
                            )
                    if resume:
                        _save_inprogress_state(
                            save_dir, v, o, k, _fold, epoch + 1, signature,
                            async_writer=acw,
                            extra_leaves=(
                                _stopper.state_leaves()
                                if _stopper is not None
                                else None
                            ),
                        )
                    if _interrupt_after is not None and (_fold, epoch) == tuple(
                        _interrupt_after
                    ):
                        if acw is not None:
                            acw.wait()  # the seam models a crash boundary;
                            # atexit would flush in a real process anyway
                        raise RuntimeError(
                            f"interrupted after fold {_fold} epoch {epoch} (test seam)"
                        )
                    if stop:
                        print(
                            f"Fold {fold}: early stop after epoch {epoch + 1} "
                            f"(no val-loss improvement in {_stopper.patience} "
                            f"epoch(s); best {_stopper.best_loss:.4f} at "
                            f"epoch {(_stopper.best_epoch or 0) + 1})"
                        )
                    return stop

            variables, opt_state = train_epochs(
                train_step,
                variables,
                opt_state,
                train_loader,
                epochs,
                train_key,
                fold=fold,
                writer=writer,
                verbose_batches=verbose_batches,
                mesh=mesh,
                train_step_multi=train_step_multi,
                steps_per_dispatch=steps_per_dispatch,
                start_epoch=start_epoch,
                on_epoch_end=on_epoch_end,
                preemptible=resume,  # PreemptedError promises a checkpoint
            )
            if stopper is not None and stopper.best_variables is not None:
                # fold artifacts describe the BEST epoch, not the last; the
                # fold-end evaluate below re-runs on the restored weights
                # (deterministic — it reproduces the best epoch's metrics).
                # The snapshot is already the eval tree (EMA-merged when an
                # eval_variables_fn is set)
                variables = stopper.best_variables
                print(
                    f"Fold {fold}: restored best-epoch weights (epoch "
                    f"{stopper.best_epoch + 1}, val loss "
                    f"{stopper.best_loss:.4f})"
                )
            else:
                variables = _eval_vars(variables, opt_state)
        result = evaluate(
            eval_step, variables, val_loader, num_classes, fold=fold,
            writer=writer, step=max(epochs - 1, 0),
        )
        fold_results.append(result)
        fold_result = {"fold": fold, **result}
        training_info["fold_results"].append(fold_result)
        logger.event("fold_result", **fold_result)

        fold_perf_path = os.path.join(save_dir, f"fold_{fold}_performance.json")
        with open(fold_perf_path, "w") as f:
            json.dump(fold_result, f, indent=4)
        print(f"Fold {fold} performance saved to {fold_perf_path}")

        if save_every_fold:
            fold_model_path = save_fn(
                variables, hyperparameters, save_dir, f"model_fold_{fold}"
            )
            print(
                f"Fold {fold}: Poids du modèle sauvegardés à {fold_model_path}"
            )

        if result["val_loss"] < best_performance:
            best_performance = result["val_loss"]
            best_global_path = save_fn(
                variables, hyperparameters, save_dir, "best_global_model"
            )

        prev = next((m for m in best_model_results if m["fold"] == fold), None)
        if prev is None or result["val_loss"] < prev["val_loss"]:
            model_path = save_fn(
                variables, hyperparameters, save_dir, f"best_model_fold_{fold}"
            )
            best_model_results = [m for m in best_model_results if m["fold"] != fold]
            best_model_results.append(
                {"fold": fold, "model_path": model_path, **result}
            )
        else:
            model_path = prev["model_path"]

        if on_fold_end is not None:
            # pass the RETAINED record's metrics (not necessarily this
            # run's): the per-fold artifact triplet (checkpoint, performance
            # json, hyperparameters json) must describe the model actually
            # on disk — a cross-run re-run that did worse keeps the prior
            # fold checkpoint, so it must keep the prior metrics too
            retained = next(m for m in best_model_results if m["fold"] == fold)
            on_fold_end(fold, retained, model_path)

        # fold complete: a crash from here resumes at the next fold (the
        # meta's fold_results length IS the resume fold index; a stale state
        # npz for this fold is ignored by the fold-match check on resume)
        if resume:
            _save_inprogress_meta(
                save_dir,
                {
                    "fold_results": fold_results,
                    "best_model_results": best_model_results,
                    "best_global_path": best_global_path,
                    "signature": signature,
                },
            )

    # reference key names (train_best_RESNET50_Truncate.py:246-255):
    # avg_val_loss keeps its val_ prefix, the other metrics drop it
    avg = {
        "avg_val_loss": float(np.mean([r["val_loss"] for r in fold_results])),
        "avg_accuracy": float(np.mean([r["val_accuracy"] for r in fold_results])),
        "avg_precision": float(np.mean([r["val_precision"] for r in fold_results])),
        "avg_recall": float(np.mean([r["val_recall"] for r in fold_results])),
        "avg_f1": float(np.mean([r["val_f1"] for r in fold_results])),
    }
    training_info["average_results"] = dict(avg)
    print(
        "Average Validation Loss: {:.4f}, Accuracy: {:.4f}, Precision: {:.4f}, "
        "Recall: {:.4f}, F1 Score: {:.4f}".format(
            avg["avg_val_loss"], avg["avg_accuracy"], avg["avg_precision"],
            avg["avg_recall"], avg["avg_f1"],
        )
    )
    logger.event("average_results", **training_info["average_results"])
    logger.close()
    if performance_filename:
        # reference family-3 fold-results dump (train_best_Multi_PatchGAN.py:128-130)
        with open(os.path.join(save_dir, performance_filename), "w") as f:
            json.dump(
                [{"fold": i, **r} for i, r in enumerate(fold_results)], f, indent=4
            )
    save_training_info(training_info, save_dir, "training_info.json")
    save_training_info(best_model_results, save_dir, "best_model_results.json")
    if acw is not None:
        acw.close()  # drain BEFORE clearing: a pending write must not
        # re-materialise the in-progress file after the cleanup
    _clear_inprogress(save_dir)
    if best_global_path:
        print(
            f"Best global model saved at {best_global_path} "
            f"with validation loss: {best_performance:.4f}"
        )
    return training_info
