"""Full classification test harness (reference
functions/functions_RESNET50_Truncate.py:685-887):

batched eval with probability threshold -> "Unknown"(-1) masking, per-batch
timing, weighted metrics + confusion matrix (+ optional weighted-ovr AUC),
annotated per-image PNG dumps into per-class dirs, optional Grad-CAM
overlays, metrics.txt / auc_score.txt / confusion_matrix.png /
times_test.json artifacts (same filenames and line format for drop-in
comparability).
"""
from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.augment import eval_preprocess
from ..metrics.classification import Timer, classification_metrics, weighted_auc_ovr


def plot_and_save_confusion_matrix(cm, class_names, save_dir, filename="confusion_matrix.png"):
    """Reference renderer (functions_RESNET50_Truncate.py:620-648)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cm = np.asarray(cm)
    plt.figure(figsize=(10, 8))
    plt.imshow(cm, interpolation="nearest", cmap=plt.cm.Blues)
    plt.title("Confusion Matrix")
    plt.colorbar()
    ticks = np.arange(len(class_names))
    plt.xticks(ticks, class_names, rotation=45)
    plt.yticks(ticks, class_names)
    with np.errstate(invalid="ignore", divide="ignore"):
        cm_norm = cm.astype("float") / cm.sum(axis=1)[:, np.newaxis]
    thresh = cm.max() / 2.0 if cm.max() > 0 else 0.5
    for i, j in np.ndindex(cm.shape):
        val = cm_norm[i, j] if np.isfinite(cm_norm[i, j]) else 0.0
        plt.text(
            j, i, f"{cm[i, j]} ({val:.2f})",
            horizontalalignment="center",
            color="white" if cm[i, j] > thresh else "black",
        )
    plt.tight_layout()
    plt.ylabel("True label")
    plt.xlabel("Predicted label")
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, filename)
    plt.savefig(path)
    plt.close()
    print(f"Confusion matrix saved to: {path}")
    return path


def run_classification_test(
    forward_eval: Callable,
    variables,
    loader,
    samples,
    class_names: List[str],
    save_dir: str,
    *,
    prob_threshold: float = 0.5,
    measure_time: bool = False,
    save_test_images: bool = False,
    compute_auc: bool = False,
    gradcam_fn: Optional[Callable] = None,
    save_gradcam_images: bool = False,
    colormap: str = "hot",
    embed_fn: Optional[Callable] = None,
    writer=None,
    log_fn=print,
    mesh=None,
    steps_per_dispatch: int = 1,
) -> Dict:
    """Returns the reference's tuple as a dict:
    accuracy, loss, precision, recall, f1, cm, auc (+ features if embed_fn).

    ``mesh``: optional data-parallel mesh (--devices) — the eval batch is
    sharded over its 'data' axis, variables replicated; metrics are identical
    to the single-device run.

    ``steps_per_dispatch``: evaluate K loader batches per device dispatch
    (an on-device ``lax.scan`` of the same per-batch program — the eval
    counterpart of the train loop's ``steps_per_dispatch``). Results are
    bit-identical to K=1; only the dispatch/fetch granularity changes, which
    removes (K-1)/K of the per-batch round-trip overhead on remote-attached
    devices. Incompatible with ``measure_time`` (times_test.json is
    per-batch by contract)."""
    steps_per_dispatch = max(1, int(steps_per_dispatch))
    if steps_per_dispatch > 1 and measure_time:
        raise ValueError(
            "steps_per_dispatch > 1 dispatches K batches at a time, so the "
            "per-batch times_test.json cannot be measured; use "
            "steps_per_dispatch=1 with measure_time"
        )
    os.makedirs(save_dir, exist_ok=True)
    for cls in class_names:
        os.makedirs(os.path.join(save_dir, cls), exist_ok=True)

    def step_body(v, images_u8, labels):
        images = eval_preprocess(images_u8)
        logits = forward_eval(v, images)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
        loss = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
        probs = jnp.exp(logp)
        # one output array -> one D2H fetch per batch (each fetch costs a
        # full round trip when the device sits behind a network relay)
        return jnp.concatenate([loss[:, None], probs], axis=1)

    from ..core.mesh import jit_eval_step, scanned_eval_iter

    embed_body = None
    if embed_fn is not None:
        # jit (and shard, when a mesh is given) the feature extraction like
        # the main step — an unjitted apply would dispatch op-by-op
        def embed_body(v, images_u8):
            return embed_fn(v, eval_preprocess(images_u8))

    timer = Timer()
    total = correct = 0
    total_loss = 0.0
    n_batches = 0
    all_preds, all_targets, all_probs, all_features = [], [], [], []

    def consume(bi, batch, packed, emb):
        nonlocal total, correct, total_loss, n_batches
        n = batch["n_valid"]
        labels = batch["label"][:n]
        loss = packed[:n, 0]
        probs = packed[:n, 1:]

        preds = probs.argmax(axis=1)
        max_probs = probs.max(axis=1)
        preds_thresh = np.where(max_probs < prob_threshold, -1, preds)

        total += n
        correct += int((preds_thresh == labels).sum())
        total_loss += float(loss.mean())
        n_batches += 1
        all_targets.extend(labels.tolist())
        all_probs.extend(probs.tolist())
        all_preds.extend(preds_thresh.tolist())

        if emb is not None:
            all_features.append(emb[:n])

        if save_test_images:
            import cv2
            from PIL import Image

            for j in range(n):
                img_path = samples[batch["indices"][j]][0]
                img = np.array(Image.open(img_path).convert("RGB"))
                img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
                label_name = class_names[int(labels[j])]
                pred_name = (
                    "Unknown" if preds_thresh[j] == -1 else class_names[int(preds_thresh[j])]
                )
                text = f"Label: {label_name}, Pred: {pred_name}, Prob: {max_probs[j]:.4f}"
                cv2.putText(img, text, (10, 25), cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
                cv2.imwrite(os.path.join(save_dir, label_name, f"{bi}_{j}.png"), img)

                if writer is not None:
                    # TB per-image logging (functions_RESNET50_Truncate.py:769-772)
                    writer.add_image(
                        f"Test/Images/{bi}_{j}",
                        cv2.cvtColor(img, cv2.COLOR_BGR2RGB).transpose(2, 0, 1),
                        global_step=bi,
                    )
                    writer.add_text(f"Test/Prédictions/{bi}_{j}", text, global_step=bi)

                if gradcam_fn is not None:
                    overlay_path = os.path.join(
                        save_dir, f"GradCAM_{label_name}", f"gradcam_{bi}_{j}.png"
                    )
                    gradcam_fn(
                        variables,
                        batch["image"][j],
                        int(labels[j]),
                        img_path,
                        overlay_path if save_gradcam_images else None,
                        colormap=colormap,
                    )

    if measure_time:
        # per-batch dispatch with the step timed alone (times_test.json
        # semantics; embeddings fetched by a separate program so the timer
        # matches the reference's model-forward-only window). K == 1 here
        # (guarded above)
        step = jit_eval_step(step_body, mesh, n_batch_inputs=2)
        embed_step = (
            jit_eval_step(embed_body, mesh, n_batch_inputs=1)
            if embed_body is not None else None
        )
        for bi, batch in enumerate(loader):
            timer.start()
            packed = np.asarray(step(
                variables, jnp.asarray(batch["image"]), jnp.asarray(batch["label"])
            ))
            timer.stop()
            emb = None
            if embed_step is not None:
                emb = np.asarray(embed_step(variables, jnp.asarray(batch["image"])))
            consume(bi, batch, packed, emb)
    else:
        # the shared K-batches-per-dispatch driver (core/mesh.py); with
        # embeddings requested they ride the SAME program — one dispatch
        # and one fetch per K batches for everything
        if embed_body is not None:
            def fused(v, images_u8, labels):
                return step_body(v, images_u8, labels), embed_body(v, images_u8)
        else:
            fused = step_body
        for bi, (batch, out) in enumerate(scanned_eval_iter(
            fused, variables, loader, mesh,
            input_keys=("image", "label"), steps_per_dispatch=steps_per_dispatch,
        )):
            packed, emb = out if embed_body is not None else (out, None)
            consume(bi, batch, packed, emb)

    accuracy = 100.0 * correct / max(total, 1)
    average_loss = total_loss / max(n_batches, 1)
    m = classification_metrics(np.array(all_targets), np.array(all_preds), len(class_names))
    auc = (
        weighted_auc_ovr(np.array(all_targets), np.array(all_probs), len(class_names))
        if compute_auc
        else None
    )

    # metrics.txt: keep the reference's exact line labels (French) for
    # drop-in artifact comparability (:855-863)
    with open(os.path.join(save_dir, "metrics.txt"), "w") as f:
        f.write(f"Précision du test: {accuracy}\n")
        f.write(f"Perte du test: {average_loss}\n")
        f.write(f"Précision: {m['precision']}\n")
        f.write(f"Rappel: {m['recall']}\n")
        f.write(f"Score F1: {m['f1']}\n")
        if auc is not None:
            f.write(f"Score AUC: {auc}\n")
        f.write(f"Matrice de confusion:\n{m['confusion_matrix']}\n")

    # console order is part of the parity surface (reference :866-879):
    # metrics line, Score AUC, confusion-matrix message, then the
    # auc_score.txt save notice
    log_fn(
        f"Précision du test: {accuracy}, Perte du test: {average_loss}, "
        f"Précision: {m['precision']}, Rappel: {m['recall']}, Score F1: {m['f1']}"
    )
    if auc is not None:
        log_fn(f"Score AUC: {auc}")
    plot_and_save_confusion_matrix(m["confusion_matrix"], class_names, save_dir)

    if compute_auc and auc is not None:
        with open(os.path.join(save_dir, "auc_score.txt"), "w") as f:
            f.write(f"AUC Score: {auc}\n")
        log_fn("AUC Score sauvegardé dans 'auc_score.txt'")

    if measure_time:
        timer.dump(os.path.join(save_dir, "times_test.json"))
        log_fn(f"Temps moyen de traitement par image: {np.mean(timer.times)} secondes")
        log_fn(f"Temps total de traitement: {np.sum(timer.times)} secondes")

    return {
        "accuracy": accuracy,
        "loss": f"{average_loss:.4f}",
        "precision": m["precision"],
        "recall": m["recall"],
        "f1": m["f1"],
        "confusion_matrix": m["confusion_matrix"],
        "auc": auc,
        "features": np.concatenate(all_features) if all_features else None,
        "preds": np.array(all_preds),
        "targets": np.array(all_targets),
    }
