"""On-device data augmentation: the reference's transform-combination product
(functions/functions_RESNET50_Truncate.py:157-173 + AugmentedDataset :28-59),
re-designed to run *inside the jitted train step*.

Reference semantics: the user selects geometric and color transforms; every
(geom x color) pair composed with the base transform becomes one "combo", and
the dataset is expanded |samples| x |combos| with idx -> divmod. Each combo's
random parameters (rotation angle, jitter factor, ...) are re-drawn per
sample, exactly like torchvision's Random* transforms.

Here every sample carries a static ``combo_id``; the jitted augment fn
dispatches with a vmapped ``lax.switch`` over the (few) combos, draws the
random parameters from a per-sample PRNG key, and emits the final
normalised 224x224 crop. All transforms are shape-preserving on the staged
256x256 canvas, so one XLA program covers the whole product.

Transform inventory mirrors train_best_RESNET50_Truncate.py:72-88:
  color:  brightness(0.5), contrast(0.5), saturation(0.5), hue(0.1),
          grayscale(p=1)
  geom:   horizontal_flip, vertical_flip, rotation(15deg),
          affine(15deg, translate .1, scale .9-1.1), resized_crop(224, .8-1)
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.resize import center_crop, normalize_imagenet

AVAILABLE_COLOR_TRANSFORMS = ("brightness", "contrast", "saturation", "hue", "grayscale")
AVAILABLE_GEOM_TRANSFORMS = (
    "horizontal_flip",
    "vertical_flip",
    "rotation",
    "affine",
    "resized_crop",
)

# np (not jnp): a module-level jnp constant would initialise the JAX backend
# at import time, before CLIs can apply the user's JAX_PLATFORMS choice
import numpy as _np

_LUMA = _np.array([0.299, 0.587, 0.114], dtype=_np.float32)


# ------------------------------------------------------------ color transforms
# All operate on float [0,1] HWC images. Each transform is split into a
# DETERMINISTIC kernel (pinned parameter -> parity-testable against the
# reference's PIL/torchvision pipeline, tests/test_data_and_train.py
# TestAugmentParity) and a thin random wrapper drawing the parameter with the
# reference's ColorJitter ranges (train_best_RESNET50_Truncate.py:72-88).


def _blend(a, b, factor):
    return jnp.clip(a * factor + b * (1.0 - factor), 0.0, 1.0)


def adjust_brightness(img, factor):
    """PIL ImageEnhance.Brightness: blend towards black."""
    return jnp.clip(img * factor, 0.0, 1.0)


def adjust_contrast(img, factor):
    """PIL ImageEnhance.Contrast: blend towards the mean of the ITU-R 601-2
    luma image (PIL rounds the mean to uint8; we keep it float — delta
    bounded by 0.5/255 * |1-factor|)."""
    mean = jnp.mean(img @ _LUMA)
    return _blend(img, mean, factor)


def adjust_saturation(img, factor):
    """PIL ImageEnhance.Color: blend towards the grayscale image."""
    gray = (img @ _LUMA)[..., None]
    return _blend(img, gray, factor)


def adjust_hue(img, shift):
    """Hue shift by ``shift`` turns via a float HSV roundtrip — the same
    algorithm as torchvision's tensor adjust_hue (the PIL path the reference
    runs does the roundtrip in quantised uint8 HSV; float is strictly more
    accurate, measured max delta vs PIL < 2/255 on random images)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    eqc = maxc == minc
    cr = maxc - minc
    ones = jnp.ones_like(maxc)
    s = cr / jnp.where(eqc, ones, maxc)
    cr_div = jnp.where(eqc, ones, cr)
    rc = (maxc - r) / cr_div
    gc = (maxc - g) / cr_div
    bc = (maxc - b) / cr_div
    hr = jnp.where(maxc == r, bc - gc, 0.0)
    hg = jnp.where((maxc == g) & (maxc != r), 2.0 + rc - bc, 0.0)
    hb = jnp.where((maxc != g) & (maxc != r), 4.0 + gc - rc, 0.0)
    h = ((hr + hg + hb) / 6.0) % 1.0
    h = (h + shift) % 1.0
    # HSV -> RGB
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    sextant = i.astype(jnp.int32) % 6
    v = maxc
    p = jnp.clip(v * (1.0 - s), 0.0, 1.0)
    q = jnp.clip(v * (1.0 - s * f), 0.0, 1.0)
    t = jnp.clip(v * (1.0 - s * (1.0 - f)), 0.0, 1.0)
    onehot = jax.nn.one_hot(sextant, 6, dtype=img.dtype)
    r_ = jnp.sum(jnp.stack([v, q, p, p, t, v], axis=-1) * onehot, axis=-1)
    g_ = jnp.sum(jnp.stack([t, v, v, q, p, p], axis=-1) * onehot, axis=-1)
    b_ = jnp.sum(jnp.stack([p, p, t, v, v, q], axis=-1) * onehot, axis=-1)
    return jnp.stack([r_, g_, b_], axis=-1)


def to_grayscale(img):
    """PIL convert('L') luma replicated over 3 channels."""
    g = (img @ _LUMA)[..., None]
    return jnp.broadcast_to(g, img.shape)


def brightness(img, key):
    f = jax.random.uniform(key, (), minval=0.5, maxval=1.5)
    return adjust_brightness(img, f)


def contrast(img, key):
    f = jax.random.uniform(key, (), minval=0.5, maxval=1.5)
    return adjust_contrast(img, f)


def saturation(img, key):
    f = jax.random.uniform(key, (), minval=0.5, maxval=1.5)
    return adjust_saturation(img, f)


def hue(img, key):
    h = jax.random.uniform(key, (), minval=-0.1, maxval=0.1)
    return adjust_hue(img, h)


def grayscale(img, key):
    del key
    return to_grayscale(img)


# -------------------------------------------------------- geometric transforms


def horizontal_flip(img, key):
    del key
    return img[:, ::-1, :]


def vertical_flip(img, key):
    del key
    return img[::-1, :, :]


def _affine_warp(img, matrix, offset):
    """Inverse-map bilinear warp of an HWC image (constant 0 padding)."""
    h, w, _ = img.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    src_y = matrix[0, 0] * yy + matrix[0, 1] * xx + offset[0]
    src_x = matrix[1, 0] * yy + matrix[1, 1] * xx + offset[1]
    coords = jnp.stack([src_y, src_x])

    def warp_channel(c):
        return jax.scipy.ndimage.map_coordinates(c, coords, order=1, mode="constant")

    return jnp.stack([warp_channel(img[..., c]) for c in range(img.shape[-1])], axis=-1)


def _rotation_matrix(angle_rad, h, w, scale=1.0, translate=(0.0, 0.0)):
    """Inverse affine about the image center, PIL/torchvision-PIL convention
    (the path the reference's RandomRotation/RandomAffine take on PIL
    images): PIL's (w/2, h/2) center lives in its pixel-CORNER coordinate
    system, which is (w-1)/2 in the pixel-index coordinates used here
    (PIL samples at index+0.5). src = M @ (dst - c - t) + c, M = R(theta)/s."""
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    cos, sin = jnp.cos(angle_rad) / scale, jnp.sin(angle_rad) / scale
    m = jnp.array([[cos, -sin], [sin, cos]])  # rows/cols in (y, x)
    ty, tx = translate
    center = jnp.array([cy, cx])
    offset = center - m @ (center + jnp.array([ty, tx]))
    return m, offset


def rotate_by(img, deg):
    """Deterministic F.rotate(deg) == PIL Image.rotate(deg): positive angle
    is counterclockwise, which is the OPPOSITE screen direction from
    F.affine's positive angle (torchvision quirk, preserved — hence -deg
    into the shared affine matrix). Bilinear resampling (deviation: the
    reference's RandomRotation defaults to NEAREST; bilinear is strictly
    smoother — documented in ARCHITECTURE.md)."""
    m, off = _rotation_matrix(-jnp.deg2rad(deg), img.shape[0], img.shape[1])
    return _affine_warp(img, m, off)


def affine_by(img, deg, translate=(0.0, 0.0), scale=1.0):
    """Deterministic F.affine(deg, translate=(tx, ty) pixels, scale), shear
    0, bilinear (same NEAREST-default deviation as rotate_by)."""
    tx, ty = translate
    m, off = _rotation_matrix(
        jnp.deg2rad(deg), img.shape[0], img.shape[1], scale, (ty, tx)
    )
    return _affine_warp(img, m, off)


def resized_crop_box(img, top, left, ch, cw):
    """Deterministic F.resized_crop box -> full canvas: crop (top, left,
    ch, cw) upsampled to the image size with PIL-convention bilinear
    (half-pixel centers, source coords clamped to the box exactly like
    crop-then-resize)."""
    h, w, _ = img.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    src_y = jnp.clip((yy + 0.5) * (ch / h) - 0.5 + top, top, top + ch - 1.0)
    src_x = jnp.clip((xx + 0.5) * (cw / w) - 0.5 + left, left, left + cw - 1.0)
    coords = jnp.stack([src_y, src_x])

    def warp_channel(c):
        return jax.scipy.ndimage.map_coordinates(c, coords, order=1, mode="constant")

    return jnp.stack([warp_channel(img[..., c]) for c in range(img.shape[-1])], axis=-1)


def rotation(img, key):
    deg = jax.random.uniform(key, (), minval=-15.0, maxval=15.0)
    return rotate_by(img, deg)


def affine(img, key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    deg = jax.random.uniform(k1, (), minval=-15.0, maxval=15.0)
    scale = jax.random.uniform(k2, (), minval=0.9, maxval=1.1)
    h, w = img.shape[0], img.shape[1]
    # RandomAffine rounds the translation draw to ints; continuous here
    ty = jax.random.uniform(k3, (), minval=-0.1, maxval=0.1) * h
    tx = jax.random.uniform(k4, (), minval=-0.1, maxval=0.1) * w
    return affine_by(img, deg, translate=(tx, ty), scale=scale)


def resized_crop(img, key):
    """RandomResizedCrop(scale=(0.8, 1.0), ratio=(3/4, 4/3)) onto the same
    canvas; the final 224 center-crop happens downstream."""
    h, w = img.shape[0], img.shape[1]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = jax.random.uniform(k1, (), minval=0.8, maxval=1.0) * h * w
    log_ratio = jax.random.uniform(
        k2, (), minval=jnp.log(3.0 / 4.0), maxval=jnp.log(4.0 / 3.0)
    )
    ratio = jnp.exp(log_ratio)
    ch = jnp.clip(jnp.sqrt(area / ratio), 8.0, h)
    cw = jnp.clip(jnp.sqrt(area * ratio), 8.0, w)
    top = jax.random.uniform(k3, (), minval=0.0, maxval=1.0) * (h - ch)
    left = jax.random.uniform(k4, (), minval=0.0, maxval=1.0) * (w - cw)
    return resized_crop_box(img, top, left, ch, cw)


_TRANSFORMS = {
    "brightness": brightness,
    "contrast": contrast,
    "saturation": saturation,
    "hue": hue,
    "grayscale": grayscale,
    "horizontal_flip": horizontal_flip,
    "vertical_flip": vertical_flip,
    "rotation": rotation,
    "affine": affine,
    "resized_crop": resized_crop,
}


def generate_transform_combinations(
    geom_names: Sequence[Optional[str]], color_names: Sequence[Optional[str]]
) -> List[Tuple[Optional[str], Optional[str]]]:
    """Cartesian product (geom x color), None = identity — the reference's
    combination builder (functions_RESNET50_Truncate.py:157-173)."""
    geoms = list(geom_names) or [None]
    colors = list(color_names) or [None]
    return [(g, c) for g in geoms for c in colors]


def make_augment_fn(
    combos: Sequence[Tuple[Optional[str], Optional[str]]],
    crop: int = 224,
) -> Callable:
    """Build a jittable fn (images_u8 (B,S,S,3), combo_ids (B,), key) ->
    normalised float32 (B, crop, crop, 3). Dispatch over combos is a vmapped
    lax.switch — every branch is compiled once into the same program."""
    combos = list(combos)

    def make_branch(geom, color):
        def branch(img, key):
            kg, kc = jax.random.split(key)
            if geom is not None:
                img = _TRANSFORMS[geom](img, kg)
            if color is not None:
                img = _TRANSFORMS[color](img, kc)
            return img

        return branch

    branches = [make_branch(g, c) for g, c in combos]

    def augment_one(img_u8, combo_id, key):
        img = img_u8.astype(jnp.float32) / 255.0
        if len(branches) == 1:
            img = branches[0](img, key)
        else:
            img = jax.lax.switch(combo_id, branches, img, key)
        img = center_crop(img, crop)
        return normalize_imagenet(img)

    def augment(images_u8, combo_ids, key):
        keys = jax.random.split(key, images_u8.shape[0])
        return jax.vmap(augment_one)(images_u8, combo_ids, keys)

    return augment


def eval_preprocess(images_u8: jax.Array, crop: int = 224) -> jax.Array:
    """Deterministic eval path: staged uint8 -> center crop -> normalise."""
    img = images_u8.astype(jnp.float32) / 255.0
    img = center_crop(img, crop)
    return normalize_imagenet(img)
