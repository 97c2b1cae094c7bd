"""Real-dataset loading for SAM2 fine-tuning.

The reference fine-tuned SAM2 on a 267-image circuit dataset offline in
torch (README.md:119, CHANGELOG.md:48-50) — the dataset pipeline itself
lives outside its repo. This module is the rebuild's first-party
equivalent: a folder of (image, mask) pairs → deterministic shuffled
epochs → preprocessed batches with background host prefetch, with
per-process sharding so the same loader feeds single-chip, multi-chip,
and multi-host (``parallel/multihost.py``) fine-tunes.

Layout::

    <root>/images/<name>.png|jpg|jpeg|bmp|webp
    <root>/masks/<name>.png          (nonzero pixel = wire)

Preprocessing matches inference exactly: images go through
``ops.image.sam2_preprocess`` (ToTensor → bilinear resize → ImageNet
normalize, the reference's SAM2Transforms, src/sam2_infer.py:43-51);
masks are nearest-resized to the model resolution and binarized, the
standard target treatment for segmentation fine-tunes.
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


class SegmentationFolderDataset:
    """(image, mask) pairs from ``<root>/images`` + ``<root>/masks``."""

    def __init__(self, root: str, resolution: int = 1024):
        self.root = root
        self.resolution = resolution
        img_dir = os.path.join(root, "images")
        mask_dir = os.path.join(root, "masks")
        if not os.path.isdir(img_dir) or not os.path.isdir(mask_dir):
            raise FileNotFoundError(
                f"expected {root}/images and {root}/masks directories"
            )
        self.items: list = []
        for f in sorted(os.listdir(img_dir)):
            stem, ext = os.path.splitext(f)
            if ext.lower() not in _IMG_EXTS:
                continue
            mask_path = None
            for mext in (".png",) + _IMG_EXTS:
                cand = os.path.join(mask_dir, stem + mext)
                if os.path.exists(cand):
                    mask_path = cand
                    break
            if mask_path is None:
                raise FileNotFoundError(f"no mask for image {f} in {mask_dir}")
            self.items.append((os.path.join(img_dir, f), mask_path))
        if not self.items:
            raise FileNotFoundError(f"no images found under {img_dir}")

    def __len__(self) -> int:
        return len(self.items)

    # -- single-sample loading -------------------------------------------
    def load_raw(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        """(RGB uint8 (H, W, 3), mask uint8 (H, W)) at native size."""
        from ..io.image_io import load_image

        img = load_image(self.items[i][0])
        mask = load_image(self.items[i][1])
        if mask.ndim == 3:
            mask = mask.max(axis=-1)
        return img, (mask > 0).astype(np.uint8)

    def load(self, i: int, augment_code: int = 0) -> Tuple[np.ndarray, np.ndarray]:
        """Preprocessed (image (S, S, 3) float32, mask (S, S) float32).

        ``augment_code`` ∈ [0, 8): bit 0 = horizontal flip, bit 1 =
        vertical flip, bit 2 = transpose — the 8 dihedral symmetries,
        applied identically to image and mask before preprocessing.
        """
        import jax.numpy as jnp

        from ..ops.image import sam2_preprocess

        img, mask = self.load_raw(i)
        if augment_code & 1:
            img, mask = img[:, ::-1], mask[:, ::-1]
        if augment_code & 2:
            img, mask = img[::-1], mask[::-1]
        if augment_code & 4:
            img, mask = img.transpose(1, 0, 2), mask.transpose(1, 0)
        s = self.resolution
        pre = np.asarray(sam2_preprocess(jnp.asarray(np.ascontiguousarray(img)), s))
        # Nearest-neighbor target resize keeps the mask binary.
        ys = (np.arange(s) * (mask.shape[0] / s)).astype(np.int32)
        xs = (np.arange(s) * (mask.shape[1] / s)).astype(np.int32)
        m = mask[ys][:, xs].astype(np.float32)
        return pre, m

    # -- epoch iteration --------------------------------------------------
    def batches(
        self,
        batch_size: int,
        *,
        seed: int = 0,
        epochs: Optional[int] = 1,
        augment: bool = False,
        shard: Optional[Tuple[int, int]] = None,
        drop_remainder: bool = True,
        prefetch: int = 2,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yield (images (B, S, S, 3), masks (B, S, S)) float32 batches.

        Deterministic: epoch e uses permutation seeded ``seed + e`` and
        per-sample augmentation codes from the same stream, so any
        (seed, shard) pair reproduces exactly. ``shard=(index, count)``
        partitions each epoch's permutation round-robin — every process
        of a multi-host fine-tune sees a disjoint, same-length stream
        (pass ``(jax.process_index(), jax.process_count())``), and
        ``batch_size`` is then the per-process batch. ``epochs=None``
        iterates forever. A background thread prefetches and preprocesses
        the next ``prefetch`` batches while the step runs.
        """
        if batch_size <= 0:
            raise ValueError("batch_size must be positive")
        idx_self, n_shards = shard if shard is not None else (0, 1)
        if not (0 <= idx_self < n_shards):
            raise ValueError(f"bad shard {shard}")

        def epoch_indices(e: int) -> Sequence[Tuple[int, int]]:
            rng = np.random.default_rng(seed + e)
            perm = rng.permutation(len(self.items))
            codes = (
                rng.integers(0, 8, size=len(self.items))
                if augment
                else np.zeros(len(self.items), np.int64)
            )
            pairs = list(zip(perm.tolist(), codes.tolist()))
            # Truncate each epoch to a multiple of n_shards so every
            # shard's stream has the SAME length — multi-host training
            # runs collectives in lockstep, and a longer shard would hang
            # waiting for peers that already exhausted their iterator.
            usable = (len(pairs) // n_shards) * n_shards
            return pairs[:usable][idx_self::n_shards]

        # A consumer that abandons the generator (break / GC mid-epoch)
        # must release the producer, which otherwise blocks forever on
        # the bounded queue holding preprocessed batches.
        stop = threading.Event()

        def _put(out_q: "queue.Queue", item) -> bool:
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce(out_q: "queue.Queue"):
            try:
                e = 0
                while epochs is None or e < epochs:
                    pending = []
                    for i, code in epoch_indices(e):
                        if stop.is_set():
                            return
                        pending.append(self.load(i, code))
                        if len(pending) == batch_size:
                            if not _put(
                                out_q,
                                (
                                    np.stack([p[0] for p in pending]),
                                    np.stack([p[1] for p in pending]),
                                ),
                            ):
                                return
                            pending = []
                    if pending and not drop_remainder:
                        if not _put(
                            out_q,
                            (
                                np.stack([p[0] for p in pending]),
                                np.stack([p[1] for p in pending]),
                            ),
                        ):
                            return
                    e += 1
            except Exception as exc:  # surfaced to the consumer
                _put(out_q, exc)
            _put(out_q, None)

        q: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch))
        t = threading.Thread(target=produce, args=(q,), daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            t.join()
