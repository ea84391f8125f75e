"""Grad-CAM XAI, JAX-native (reference uses pytorch_grad_cam targeting the
last bottleneck's conv3 in layer4 — functions/functions_RESNET50_Truncate.py:
777-811, heatmap assembly :661-682).

Instead of module hooks, the forward is split functionally at the target
activation A (conv3 output of the last executed stage's last block):
``score = continuation(A)`` and ``dscore/dA`` come from one ``jax.grad`` —
the whole CAM is a single jitted program.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.augment import eval_preprocess
from ..nn.resnet import _bottleneck_apply, _stage_apply
from ..ops.conv import conv2d
from ..ops.norm import batch_norm
from ..ops.pooling import global_avg_pool
from ..ops.linear import linear
from ..ops.resize import resize_image


def _cam_for_moco(variables, images, targets, truncate: int):
    """images: preprocessed (N,224,224,3). Returns cam (N, h, w) in [0,1]."""
    enc = variables["moco"]["encoder"]
    from ..nn.resnet import resnet50_apply

    # run everything up to the input of the last block of the last stage
    stages = ["layer1", "layer2", "layer3", "layer4"]
    n_stages = min(truncate, 8) - 4
    if n_stages < 1:
        raise ValueError(
            "Grad-CAM targets a residual stage's conv3; truncate_layer must be "
            f">= 5 (got {truncate}: stem-only encoder has no target layer)."
        )
    last_stage = stages[n_stages - 1]

    h, _, _ = resnet50_apply(enc, images, truncate=4)
    for s in stages[: n_stages - 1]:
        first_stride = 1 if s == "layer1" else 2
        h, _ = _stage_apply(enc[s], h, first_stride, train=False)
    blocks = enc[last_stage]
    first_stride = 1 if last_stage == "layer1" else 2
    for b, block in enumerate(blocks[:-1]):
        h, _ = _bottleneck_apply(block, h, first_stride if b == 0 else 1, train=False)
    last = blocks[-1]
    stride = first_stride if len(blocks) == 1 else 1

    # target activation: conv3 output of the last block (pre-bn3, pre-residual)
    pre = jax.nn.relu(batch_norm(last["bn1"], conv2d(last["conv1"], h)))
    pre = jax.nn.relu(
        batch_norm(last["bn2"], conv2d(last["conv2"], pre, stride=stride, padding=1))
    )
    A = conv2d(last["conv3"], pre)

    identity = h
    if "downsample" in last:
        identity = batch_norm(
            last["downsample"]["bn"], conv2d(last["downsample"]["conv"], h, stride=stride)
        )

    def continuation(a):
        out = jax.nn.relu(batch_norm(last["bn3"], a) + identity)
        feats = global_avg_pool(out)
        emb = linear(variables["moco"]["fc"], feats)
        logits = linear(variables["classifier"]["fc"], emb)
        score = jnp.take_along_axis(logits, targets[:, None], axis=1)[:, 0]
        return jnp.sum(score)

    grads = jax.grad(continuation)(A)
    weights = jnp.mean(grads, axis=(1, 2), keepdims=True)  # GAP of gradients
    cam = jax.nn.relu(jnp.sum(weights * A, axis=-1))  # (N, h, w)
    lo = jnp.min(cam, axis=(1, 2), keepdims=True)
    hi = jnp.max(cam, axis=(1, 2), keepdims=True)
    return (cam - lo) / jnp.maximum(hi - lo, 1e-7)


def gradcam_moco(variables, images_u8, targets, truncate: int = 8, out_size: int = 224):
    """uint8 staged images (N,S,S,3) + target classes -> CAMs (N,224,224)."""
    images = eval_preprocess(jnp.asarray(images_u8))
    cam = _cam_for_moco(variables, images, jnp.asarray(targets), truncate)
    cam = resize_image(cam[..., None], out_size, out_size)[..., 0]
    return jnp.clip(cam, 0.0, 1.0)


_CV2_COLORMAPS = None


def _cv2_colormap(name: str):
    global _CV2_COLORMAPS
    import cv2

    if _CV2_COLORMAPS is None:
        _CV2_COLORMAPS = {
            "autumn": cv2.COLORMAP_AUTUMN, "bone": cv2.COLORMAP_BONE,
            "jet": cv2.COLORMAP_JET, "winter": cv2.COLORMAP_WINTER,
            "rainbow": cv2.COLORMAP_RAINBOW, "ocean": cv2.COLORMAP_OCEAN,
            "summer": cv2.COLORMAP_SUMMER, "spring": cv2.COLORMAP_SPRING,
            "cool": cv2.COLORMAP_COOL, "hsv": cv2.COLORMAP_HSV,
            "pink": cv2.COLORMAP_PINK, "hot": cv2.COLORMAP_HOT,
            "inferno": cv2.COLORMAP_INFERNO, "magma": cv2.COLORMAP_MAGMA,
            "plasma": cv2.COLORMAP_PLASMA, "viridis": cv2.COLORMAP_VIRIDIS,
            "cividis": cv2.COLORMAP_CIVIDIS, "turbo": cv2.COLORMAP_TURBO,
        }
    return _CV2_COLORMAPS.get(str(name).lower(), _CV2_COLORMAPS["hot"])


def create_custom_colormap():
    """Blue->red gradient colormap (reference helper,
    functions_RESNET50_Truncate.py:654-658)."""
    from matplotlib.colors import LinearSegmentedColormap

    return LinearSegmentedColormap.from_list(
        "custom_cmap", [(0, 0, 1), (1, 0, 0)], N=256
    )


def generate_heatmap_overlays(
    cam: np.ndarray,
    original_path: str,
    save_path: Optional[str],
    colormap: str = "hot",
) -> np.ndarray:
    """show_cam_on_image-equivalent: [orig | coloured overlay | grayscale cam]
    hstack (functions_RESNET50_Truncate.py:661-682,792-811)."""
    import cv2
    from PIL import Image

    cam = np.asarray(cam, dtype=np.float32)
    size = cam.shape[0]
    orig = Image.open(original_path).convert("RGB").resize((size, size))
    orig = np.asarray(orig, dtype=np.float32) / 255.0

    heat = cv2.applyColorMap(np.uint8(255 * cam), _cv2_colormap(colormap))
    heat = cv2.cvtColor(heat, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    overlay = heat + orig
    overlay = overlay / max(float(overlay.max()), 1e-7)

    gray = np.repeat(cam[..., None], 3, axis=-1)
    combined = np.hstack((orig, overlay, gray))
    if save_path:
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        bgr = cv2.cvtColor((combined * 255).astype(np.uint8), cv2.COLOR_RGB2BGR)
        cv2.imwrite(save_path, bgr)
    return combined
