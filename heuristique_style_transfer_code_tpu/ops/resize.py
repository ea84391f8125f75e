"""On-device preprocessing: PIL-parity bilinear resize + crop + normalise.

The reference's canonical transform (every CLI, e.g.
train_best_RESNET50_Truncate.py:126-132) is
    Resize(256) -> CenterCrop(224) -> ToTensor -> Normalize(ImageNet)
executed per-image on the host via PIL. Here the whole pipeline is fused into
the jitted forward pass: PIL's antialiased bilinear filter is separable and
data-independent for a fixed (in, out) shape, so resizing is two constant
matrix contractions — ``A @ img @ B^T`` — that run on the MXU, with the
normalisation folded in behind them by XLA. This is the north-star "fused
on-device preprocessing" requirement (BASELINE.json).

The filter weights replicate PIL's ``_filters_support``/triangle kernel for
BILINEAR with antialias (the Image.resize default), so outputs match
torchvision's ``Resize`` bit-for-bit to float tolerance.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


@functools.lru_cache(maxsize=None)
def _resize_matrix_np(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) row-stochastic matrix of PIL BILINEAR+antialias weights."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale  # triangle filter support
    M = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        js = np.arange(xmin, xmax)
        w = (js + 0.5 - center) / filterscale
        w = np.clip(1.0 - np.abs(w), 0.0, None)  # triangle
        s = w.sum()
        if s > 0:
            M[i, xmin:xmax] = w / s
    return M.astype(np.float32)


def resize_matrix(in_size: int, out_size: int) -> jax.Array:
    return jnp.asarray(_resize_matrix_np(in_size, out_size))


from ..core.geometry import resize_target  # noqa: E402  (canonical definition)


def resize_image(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """img: (..., H, W, C) float -> (..., out_h, out_w, C)."""
    h, w = img.shape[-3], img.shape[-2]
    ah = resize_matrix(h, out_h).astype(jnp.float32)
    aw = resize_matrix(w, out_w).astype(jnp.float32)
    y = jnp.einsum("...hwc,oh->...owc", img.astype(jnp.float32), ah,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("...hwc,pw->...hpc", y, aw, preferred_element_type=jnp.float32)
    return y


def resize_shorter_side(img: jax.Array, shorter: int = 256) -> jax.Array:
    """img: (H, W, C) or (N, H, W, C); shapes must be static under jit."""
    h, w = img.shape[-3], img.shape[-2]
    th, tw = resize_target(h, w, shorter)
    return resize_image(img, th, tw)


def center_crop(img: jax.Array, size: int = 224) -> jax.Array:
    """torchvision F.center_crop offset rule: round((in - out) / 2)."""
    from ..core.geometry import center_crop_offsets

    h, w = img.shape[-3], img.shape[-2]
    top, left = center_crop_offsets(h, w, size)
    return img[..., top : top + size, left : left + size, :]


def normalize_imagenet(img: jax.Array) -> jax.Array:
    """float [0,1] HWC/NHWC -> ImageNet-normalised."""
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (img - mean) / std


def preprocess(img_u8: jax.Array, crop: int = 224, shorter: int = 256) -> jax.Array:
    """Full canonical transform on-device: uint8 (H,W,C) or (N,H,W,C) ->
    normalised float32 of spatial size (crop, crop). Jit-compatible for a
    fixed input shape."""
    x = img_u8.astype(jnp.float32) / 255.0
    x = resize_shorter_side(x, shorter)
    x = center_crop(x, crop)
    return normalize_imagenet(x)
