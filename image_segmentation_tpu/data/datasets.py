"""In-memory array datasets.

Unlike the reference's per-item ``torch.utils.data.Dataset`` + DataLoader
worker processes (customDatasets/datasets.py), the TPU design materializes
each split ONCE into contiguous uint8 numpy arrays (images NHWC, masks HW).
Batches are then pure array slices — no Python-object churn in the hot loop —
and ship to the device as uint8 (4x less H2B traffic than fp32).

- :class:`ArrayDataset`: the universal container (images, masks[, labels]).
- :func:`load_pet_dataset`: Oxford-IIIT-Pet-Augmented loader with an .npz
  disk cache (reference datasets.py:30-86, incl. the <split>_dataset cache).
- :func:`synthetic_dataset`: the ``DummyDataset`` equivalent fixture
  (reference datasets.py:165-249).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from . import records

HF_DATASET_ID = "mattidebeer/Oxford-IIIT-Pet-Augmented"
SPLITS = ("train", "validation", "test")


@dataclasses.dataclass
class ArrayDataset:
    """A fully-materialized split.

    images: uint8 (N, H, W, 3)
    masks:  uint8 (N, H, W) class ids {0: bg, 1: cat, 2: dog}
    raw_masks: optional uint8 palette masks (needed by the prompt/class
        datasets whose semantics differ from the 3-class remap).
    """

    images: np.ndarray
    masks: np.ndarray
    raw_masks: Optional[np.ndarray] = None

    def __post_init__(self):
        assert self.images.dtype == np.uint8 and self.images.ndim == 4
        assert self.masks.dtype == np.uint8 and self.masks.ndim == 3
        assert len(self.images) == len(self.masks)

    def __len__(self) -> int:
        return len(self.images)


def load_pet_dataset(
    split: str = "validation",
    dataset_loc: str = "Data/Oxford-IIIT-Pet-Augmented",
    cache: bool = True,
    keep_raw_masks: bool = False,
) -> ArrayDataset:
    """Load a split of mattidebeer/Oxford-IIIT-Pet-Augmented as arrays.

    Mirrors reference CustomImageDataset loading (datasets.py:30-86): local
    path first, HF hub on miss, with an on-disk cache
    (``<split>_arrays.npz`` instead of the reference's ``<split>_dataset.pt``).
    """
    if split not in SPLITS:
        raise ValueError(f"split must be one of {SPLITS}, got {split!r}")

    cache_file = os.path.join(dataset_loc, f"{split}_arrays.npz")
    if cache and os.path.exists(cache_file):
        z = np.load(cache_file)
        raw = z["raw_masks"] if ("raw_masks" in z and keep_raw_masks) else None
        return ArrayDataset(z["images"], z["masks"], raw)

    from datasets import load_dataset  # HF datasets; deferred import

    try:
        ds = load_dataset(dataset_loc, split=split)
    except Exception:
        ds = load_dataset(HF_DATASET_ID, split=split, cache_dir=dataset_loc)

    n = len(ds)
    images = np.empty((n,) + records.IMAGE_SHAPE, dtype=np.uint8)
    raw_masks = np.empty((n,) + records.MASK_SHAPE, dtype=np.uint8)
    for i, dp in enumerate(ds):
        images[i] = records.deserialize_image(dp["image"])
        raw_masks[i] = records.deserialize_image(dp["mask"], records.MASK_SHAPE)
    masks = records.remap_mask_batch(raw_masks)

    if cache:
        os.makedirs(dataset_loc, exist_ok=True)
        np.savez(cache_file, images=images, masks=masks, raw_masks=raw_masks)
    return ArrayDataset(images, masks, raw_masks if keep_raw_masks else None)


def synthetic_shapes_dataset(
    length: int = 64,
    height: int = 64,
    width: int = 64,
    seed: int = 0,
) -> ArrayDataset:
    """LEARNABLE synthetic fixture: colour-coded shapes with exact masks.

    Unlike :func:`synthetic_dataset` (pure noise, only useful for shape/dtype
    checks), each image contains a reddish ellipse (class 1, "cat") and/or a
    bluish rectangle (class 2, "dog") on a textured background — so a real
    model must reach high IoU quickly, making end-to-end convergence
    testable without the Oxford-IIIT-Pet download.
    """
    rng = np.random.default_rng(seed)
    images = np.empty((length, height, width, 3), np.uint8)
    masks = np.zeros((length, height, width), np.uint8)
    yy, xx = np.mgrid[0:height, 0:width]
    for i in range(length):
        img = rng.integers(60, 120, (height, width, 3)).astype(np.float64)
        if rng.random() < 0.8:  # ellipse (class 1)
            cy, cx = rng.uniform(0.25, 0.75, 2) * (height, width)
            ry, rx = rng.uniform(0.1, 0.25, 2) * (height, width)
            inside = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
            img[inside] = [210 + rng.integers(-20, 20), 70, 70]
            masks[i][inside] = records.CAT_ID
        if rng.random() < 0.8:  # rectangle (class 2)
            y0, x0 = rng.integers(0, height // 2), rng.integers(0, width // 2)
            hh, ww = rng.integers(height // 8, height // 3), rng.integers(
                width // 8, width // 3
            )
            box = np.zeros((height, width), bool)
            box[y0 : y0 + hh, x0 : x0 + ww] = True
            img[box] = [70, 70, 210 + rng.integers(-20, 20)]
            masks[i][box] = records.DOG_ID
        images[i] = np.clip(img + rng.normal(0, 6, img.shape), 0, 255).astype(
            np.uint8
        )
    return ArrayDataset(images, masks)


def synthetic_dataset(
    length: int = 100,
    height: int = 256,
    width: int = 256,
    num_classes: int = 3,
    seed: int = 0,
    keep_raw_masks: bool = False,
) -> ArrayDataset:
    """Random fixture dataset (reference DummyDataset, datasets.py:165-249).

    Images are uniform uint8; masks are random class ids in [0, num_classes).
    With ``keep_raw_masks``, palette-valued masks ({0, 38, 75, 255}) are also
    generated so the prompt/perturbation paths can be tested end-to-end.
    """
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 256, (length, height, width, 3), dtype=np.uint8)
    masks = rng.integers(0, num_classes, (length, height, width)).astype(np.uint8)
    raw = None
    if keep_raw_masks:
        palette = np.array(
            [0, records.CAT_PALETTE, records.DOG_PALETTE, records.UNCERTAIN_PALETTE],
            dtype=np.uint8,
        )
        raw = palette[rng.integers(0, 4, (length, height, width))]
    return ArrayDataset(images, masks, raw)
