"""Augmented-dataset reader: the UnetDataset equivalent.

The reference's UnetDataset (unet_code/utils/utils_dataset.py:8-78) is a
torch map-style dataset: sorted directory listings pair image/target/mask by
index, PIL opens + .convert('L') + ToTensor. Missing targets become zeros,
missing masks become ones.

TPU-first difference: the whole split is loaded once into pinned host numpy
(DRIVE-scale data is tiny — ~500 augmented 584x565 grayscale images), stored
uint8, and normalized to float32/255 at batch time. No worker processes;
batches stream to device asynchronously (see loading.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from os.path import join

import numpy as np
from PIL import Image


def _load_dir(root: str, mode: str = "L") -> np.ndarray:
    """Load every image in `root` (sorted, like os.listdir + sorted) as a
    uint8 (N, H, W, 1) stack."""
    names = sorted(os.listdir(root))
    imgs = []
    for name in names:
        with Image.open(join(root, name)) as im:
            imgs.append(np.asarray(im.convert(mode), dtype=np.uint8))
    return np.stack(imgs)[..., None]


@dataclass
class ArrayDataset:
    """A split held fully in host memory, NHWC uint8.

    images/targets/masks: (N, H, W, 1) uint8. targets all-zero / masks
    all-255 when the corresponding directory is absent (the reference's
    zeros/ones fallbacks, utils_dataset.py:58-71).
    """

    images: np.ndarray
    targets: np.ndarray
    masks: np.ndarray

    def __len__(self) -> int:
        return self.images.shape[0]

    def __getitem__(self, idx):
        return (
            self.images[idx].astype(np.float32) / 255.0,
            self.targets[idx].astype(np.float32) / 255.0,
            self.masks[idx].astype(np.float32) / 255.0,
        )

    def as_float(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        return (
            self.images.astype(np.float32) / 255.0,
            self.targets.astype(np.float32) / 255.0,
            self.masks.astype(np.float32) / 255.0,
        )

    def subset(self, n: int) -> "ArrayDataset":
        """Sequential truncation (the RED policy's torch Subset(range(n)),
        reference base_model_tests/training-RED.py:163-167)."""
        return ArrayDataset(self.images[:n], self.targets[:n], self.masks[:n])


def load_split(split_root: str, with_targets: bool = True) -> ArrayDataset:
    """Load one split directory: {images, targets?, masks?} subdirs
    (the layout create_augmentations writes, utils_preprocessing.py:98-108)."""
    images = _load_dir(join(split_root, "images"))
    n, h, w, _ = images.shape
    tdir = join(split_root, "targets")
    if with_targets and os.path.isdir(tdir):
        targets = _load_dir(tdir)
    else:
        targets = np.zeros((n, h, w, 1), dtype=np.uint8)
    mdir = join(split_root, "masks")
    if os.path.isdir(mdir):
        masks = _load_dir(mdir)
    else:
        masks = np.full((n, h, w, 1), 255, dtype=np.uint8)
    return ArrayDataset(images, targets, masks)
