"""Host-side image loading, staged for on-device preprocessing.

Design (TPU-first): the host only decodes and aspect-resizes each image to a
fixed ``STAGING_SIZE`` uint8 canvas (PIL bilinear shorter-side resize +
center crop — the deterministic prefix of the canonical transform). The
variable part of preprocessing (augmentation, final 224 crop, /255,
ImageNet normalisation) runs *inside the jitted step* on device, fused with
the forward pass — replacing the reference's per-sample host transform chain
and ``DataLoader(num_workers=4)`` (train_best_RESNET50_Truncate.py:175-176)
with a thread-pool prefetcher feeding fixed-shape device batches.
"""
from __future__ import annotations

import concurrent.futures as cf
import os
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ..core.geometry import staging_geometry
from ..native import get_decoder, is_jpeg

STAGING_SIZE = 256  # shorter-side resize target AND staged canvas size


def decode_image_staged_bytes(data: bytes, staging: int = STAGING_SIZE) -> np.ndarray:
    """Decode encoded image BYTES -> staged uint8 (staging, staging, 3):
    resize shorter side to ``staging`` (bilinear) + center crop.

    JPEG bytes take the native C++ path when available (bit-identical
    output, GIL-free — see native/); anything else, or any native-path
    failure, falls back to PIL with the SAME staged transform. The single
    implementation shared by the file loader and the HTTP server, so both
    feed identical pixels by construction."""
    import io

    dec = get_decoder()
    if dec is not None and is_jpeg(data):
        fast = os.environ.get("HST_NATIVE_DECODE_FAST") == "1"
        arr = dec.decode_staged(data, staging, fast=fast)
        if arr is not None:
            return arr
    with Image.open(io.BytesIO(data)) as im:
        im = im.convert("RGB")
        w, h = im.size
        tw, th, left, top = staging_geometry(w, h, staging)
        im = im.resize((tw, th), Image.BILINEAR)
        arr = np.asarray(im, dtype=np.uint8)
    return arr[top : top + staging, left : left + staging]


def load_image_staged(path: str, staging: int = STAGING_SIZE) -> np.ndarray:
    """Decode file -> staged uint8 (staging, staging, 3); see
    decode_image_staged_bytes."""
    with open(path, "rb") as f:
        data = f.read()
    return decode_image_staged_bytes(data, staging)


class HostLoader:
    """Threaded prefetching batch loader over (path, label[, combo]) tuples.

    Yields (images_u8 (B, S, S, 3), labels (B,), combo_ids (B,), indices).
    The final short batch is padded to ``batch_size`` so every device step
    sees one static shape — no recompiles. Pad entries carry label -1 (masked
    out of loss/metrics) and cycle through *distinct* samples from the start
    of the epoch order rather than repeating one image, so train-mode
    BatchNorm statistics are computed over varied real data instead of 31
    copies of the last sample.

    Multi-host: pass ``process_index``/``process_count`` and every host draws
    a disjoint stride of the SAME global per-epoch permutation (seeded by
    ``seed + epoch``, so hosts agree without communicating). The global order
    is first padded (cycling from its start) to a multiple of
    ``process_count * batch_size`` so every host runs the *same number of
    steps per epoch* — mandatory under pjit collectives — and the padding
    entries carry label -1 like intra-batch pads.
    """

    def __init__(
        self,
        samples: Sequence[Tuple[str, int]],
        batch_size: int,
        combo_ids: Optional[Sequence[int]] = None,
        shuffle: bool = False,
        seed: int = 0,
        num_workers: int = 8,
        staging: int = STAGING_SIZE,
        drop_last: bool = False,
        prefetch: int = 2,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.samples = list(samples)
        self.combo_ids = list(combo_ids) if combo_ids is not None else [0] * len(self.samples)
        assert len(self.combo_ids) == len(self.samples)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.staging = staging
        self.drop_last = drop_last
        self.prefetch = prefetch
        assert 0 <= process_index < process_count
        self.process_index = process_index
        self.process_count = process_count
        self._epoch = 0
        self._skip = 0

    def set_epoch(self, epoch: int) -> None:
        """Seek the per-epoch shuffle stream (resume support): the next
        ``__iter__`` produces exactly the order a fresh loader would have
        produced on its ``epoch``-th iteration."""
        self._epoch = int(epoch)

    def set_position(self, epoch: int, skip_batches: int = 0) -> None:
        """Mid-epoch seek (step-granular resume): the next ``__iter__``
        replays epoch ``epoch``'s exact order but drops its first
        ``skip_batches`` batches WITHOUT decoding them — the remaining
        batches are byte-identical to a fresh run's batches
        ``skip_batches..`` of that epoch (tail padding is computed from the
        full epoch order before the slice). One-shot: following epochs
        start at batch 0 again."""
        self.set_epoch(epoch)
        self._skip = int(skip_batches)

    def _local_n(self) -> int:
        """Per-host sample count after global padding (see class docstring)."""
        n = len(self.samples)
        if self.process_count == 1:
            return n
        chunk = self.process_count * self.batch_size
        return -(-n // chunk) * chunk // self.process_count

    def __len__(self):
        n = self._local_n()
        if self.drop_last and self.process_count == 1:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _order(self) -> Tuple[np.ndarray, np.ndarray]:
        """(local indices, validity mask) for this epoch and this host."""
        n = len(self.samples)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(idx)
        valid = np.ones(n, dtype=bool)
        if self.process_count > 1:
            total = self._local_n() * self.process_count
            if total > n:  # pad by cycling from the start of the global order
                pad = idx[np.arange(total - n) % n]
                idx = np.concatenate([idx, pad])
                valid = np.concatenate([valid, np.zeros(total - n, dtype=bool)])
            idx = idx[self.process_index :: self.process_count]
            valid = valid[self.process_index :: self.process_count]
        return idx, valid

    def __iter__(self) -> Iterator[dict]:
        order, order_valid = self._order()
        self._epoch += 1
        bs = self.batch_size
        batches: List[Tuple[np.ndarray, np.ndarray]] = [
            (order[i : i + bs], order_valid[i : i + bs])
            for i in range(0, len(order), bs)
        ]
        if self.drop_last and batches and len(batches[-1][0]) < bs:
            batches.pop()
        skip, self._skip = self._skip, 0
        if skip:
            batches = batches[skip:]

        # two pools: decode workers + batch assemblers (separate pools so an
        # assembler waiting on decodes can never starve the decode pool)
        decode_pool = cf.ThreadPoolExecutor(max_workers=self.num_workers)
        batch_pool = cf.ThreadPoolExecutor(max_workers=max(1, self.prefetch))

        def make_batch(idxs: np.ndarray, valid: np.ndarray) -> dict:
            n = len(idxs)
            if n < bs:  # pad by cycling distinct samples from the epoch order
                pad_pos = np.arange(bs - n) % len(order)
                idxs = np.concatenate([idxs, order[pad_pos]])
                valid = np.concatenate([valid, np.zeros(bs - n, dtype=bool)])
            imgs = np.empty((bs, self.staging, self.staging, 3), dtype=np.uint8)
            decoded = list(
                decode_pool.map(
                    lambda i: load_image_staged(self.samples[i][0], self.staging), idxs
                )
            )
            for j, arr in enumerate(decoded):
                imgs[j] = arr
            labels = np.full((bs,), -1, dtype=np.int32)
            combos = np.zeros((bs,), dtype=np.int32)
            for j, i in enumerate(idxs):
                if valid[j]:
                    labels[j] = self.samples[i][1]
                combos[j] = self.combo_ids[i]
            return {
                "image": imgs,
                "label": labels,
                "combo": combos,
                "indices": np.asarray(idxs),
                "n_valid": int(valid.sum()),
            }

        pending = []
        try:
            for idxs, valid in batches:
                pending.append(batch_pool.submit(make_batch, idxs, valid))
                if len(pending) >= self.prefetch:
                    yield pending.pop(0).result()
            while pending:
                yield pending.pop(0).result()
        finally:
            batch_pool.shutdown(wait=False)
            decode_pool.shutdown(wait=False)
