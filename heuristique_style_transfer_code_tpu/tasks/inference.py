"""Family-1 ``--mode inference``: classify arbitrary unlabelled images.

Reference: test_RESNET50_Truncate.py:33-164 (InferenceImageDataset +
run_inference) and :503-527 (mode wiring) — a directory (recursive) or a
single image file is gathered, every image runs through the frozen
encoder+classifier with softmax, and one JSON
(``inference_predictions.json``) records per-image predicted class / score /
full class-probability vector, plus optional timing.

TPU shape: the batched forward is the SAME jitted program the
classification harness runs (fused eval_preprocess + forward + softmax, one
dispatch per batch or per K batches via ``steps_per_dispatch``); the
device-side work is one ``(B, crop, crop, 3)`` uint8 ingest per batch and a
``(B, num_classes)`` f32 probability fetch.
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable, List, Optional

import numpy as np

# test_RESNET50_Truncate.py:30
VALID_IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff", ".webp")


def gather_inference_images(input_path: str) -> List[str]:
    """Image paths for ``--inference_input``: a supported single file, or a
    recursive sorted walk of a directory (reference
    InferenceImageDataset._gather_images, test_RESNET50_Truncate.py:47-62;
    error strings preserved)."""
    if os.path.isfile(input_path):
        if input_path.lower().endswith(VALID_IMAGE_EXTENSIONS):
            return [input_path]
        raise ValueError(
            f"Le fichier fourni n'est pas une image supportée : {input_path}"
        )
    if os.path.isdir(input_path):
        image_paths = []
        for root, _, files in os.walk(input_path):
            for fname in files:
                if fname.lower().endswith(VALID_IMAGE_EXTENSIONS):
                    image_paths.append(os.path.join(root, fname))
        image_paths.sort()
        return image_paths
    raise ValueError(f"Chemin invalide pour l'inférence : {input_path}")


def run_inference(
    forward_eval: Callable,
    variables,
    input_path: str,
    class_names: List[str],
    save_dir: str,
    *,
    batch_size: int = 32,
    json_name: str = "inference_predictions.json",
    measure_time: bool = False,
    mesh=None,
    steps_per_dispatch: int = 1,
    num_workers: int = 4,
) -> dict:
    """Reference run_inference (test_RESNET50_Truncate.py:82-164): gather →
    batched forward+softmax → ``save_dir/json_name`` with the exact output
    schema (num_images / classes / predictions[...] / optional timing) and
    console messages. Returns the output dict.

    ``measure_time`` times the device step per batch (the loader pull stays
    outside the window, like the reference's CUDA-synchronised span) and is
    exclusive with ``steps_per_dispatch > 1`` at the CLI level.
    """
    import jax.numpy as jnp

    from ..core.mesh import jit_eval_step, scanned_eval_iter
    from ..data.augment import eval_preprocess
    from ..data.loader import HostLoader

    image_paths = gather_inference_images(input_path)
    if len(image_paths) == 0:
        # reference InferenceImageDataset.__init__ (test_RESNET50_Truncate.py:44-45)
        raise ValueError(f"Aucune image trouvée dans : {input_path}")

    os.makedirs(save_dir, exist_ok=True)
    loader = HostLoader(
        [(p, 0) for p in image_paths], batch_size,
        shuffle=False, num_workers=num_workers,
    )

    import jax

    def step(v, images_u8):
        images = eval_preprocess(images_u8)
        logits = forward_eval(v, images)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    results: List[dict] = []
    total_time = 0.0
    total_images = 0
    next_path = 0

    def consume(probs: np.ndarray, n_valid: int):
        nonlocal next_path
        for row in probs[:n_valid]:
            pred_idx = int(np.argmax(row))
            results.append({
                "image_path": image_paths[next_path],
                "predicted_class_index": pred_idx,
                "predicted_class": class_names[pred_idx],
                "predicted_probability": float(row[pred_idx]),
                "class_probabilities": {
                    class_names[i]: float(row[i])
                    for i in range(len(class_names))
                },
            })
            next_path += 1

    if measure_time:
        jstep = jit_eval_step(step, mesh, n_batch_inputs=1)
        for batch in loader:
            t0 = time.perf_counter()
            probs = np.asarray(jstep(variables, jnp.asarray(batch["image"])))
            elapsed = time.perf_counter() - t0
            n = batch["n_valid"]
            total_time += elapsed
            total_images += n
            consume(probs, n)
    else:
        for batch, probs in scanned_eval_iter(
            step, variables, loader, mesh,
            input_keys=("image",),
            steps_per_dispatch=steps_per_dispatch,
        ):
            consume(np.asarray(probs), batch["n_valid"])
            total_images += batch["n_valid"]

    output_json = {
        "num_images": len(results),
        "classes": list(class_names),
        "predictions": results,
    }
    if measure_time and total_images > 0:
        output_json["timing"] = {
            "total_inference_time_seconds": float(total_time),
            "average_time_per_image_seconds": float(total_time / total_images),
        }

    output_path = os.path.join(save_dir, json_name)
    with open(output_path, "w", encoding="utf-8") as f:
        json.dump(output_json, f, indent=2, ensure_ascii=False)

    print(f"Résultats d'inférence sauvegardés dans : {output_path}")
    print(f"Nombre d'images traitées : {len(results)}")
    if measure_time and total_images > 0:
        print(f"Temps total : {total_time:.4f} s")
        print(f"Temps moyen par image : {total_time / total_images:.6f} s")
    return output_json
