"""Raw DRIVE dataset reader (the ImLoader equivalent).

Reads the original DRIVE tree (reference layout
Unet_research/datasets/{training,test}): training/{images .tif,
1st_manual .gif, mask .gif}, test/{images, mask}. Images load as RGB,
targets/masks as L — matching unet_code/utils/utils_imloader.py:35-53.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from os.path import isdir, join

import numpy as np
from PIL import Image


def _listdir_sorted(root: str) -> list[str]:
    return sorted(os.listdir(root))


@dataclass
class DriveImages:
    """One DRIVE split in host memory: images uint8 (N,H,W,3) RGB,
    targets/masks uint8 (N,H,W) or None."""

    images: np.ndarray
    targets: np.ndarray | None
    masks: np.ndarray | None

    def __len__(self) -> int:
        return self.images.shape[0]

    def __getitem__(self, idx):
        return (
            self.images[idx],
            None if self.targets is None else self.targets[idx],
            None if self.masks is None else self.masks[idx],
        )


def _load(root: str, mode: str) -> np.ndarray:
    out = []
    for name in _listdir_sorted(root):
        with Image.open(join(root, name)) as im:
            out.append(np.asarray(im.convert(mode), dtype=np.uint8))
    return np.stack(out)


def load_drive(dataset_root: str, split: str) -> DriveImages:
    """Load 'training' or 'test' from a DRIVE-layout root."""
    root = join(dataset_root, split)
    images = _load(join(root, "images"), "RGB")
    targets = None
    tdir = join(root, "1st_manual")
    if isdir(tdir):
        targets = _load(tdir, "L")
    masks = None
    mdir = join(root, "mask")
    if isdir(mdir):
        masks = _load(mdir, "L")
    return DriveImages(images, targets, masks)
