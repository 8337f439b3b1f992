"""General helpers (reference unet_code/utils/utils_general.py)."""

from __future__ import annotations

import os
import random
from os.path import exists

import numpy as np
from PIL import Image


def create_dir(path: str):
    """Create `path`, or `path0`..`path5` if taken; None when all exist
    (reference utils_general.py:15-30 — its eval CLIs depend on this
    suffix-retry behavior to avoid clobbering reruns)."""
    d = path
    if not exists(d):
        os.makedirs(d)
        return d
    for i in range(6):
        d = path + str(i)
        if not exists(d):
            os.makedirs(d)
            return d
    print("Could not create directory.")
    return None


def to_pil(arr: np.ndarray, mode=None) -> Image.Image:
    """float [0,1] HWC/HW numpy -> PIL (torchvision ToPILImage equivalent,
    utils_general.py:9-12)."""
    a = np.asarray(arr)
    if a.ndim == 3 and a.shape[-1] == 1:
        a = a[..., 0]
    if a.dtype != np.uint8:
        a = np.clip(np.round(a * 255.0), 0, 255).astype(np.uint8)
    return Image.fromarray(a, mode=mode)


def seed_everything(seed: int) -> None:
    """Seed python/numpy (PL seed_everything equivalent; JAX keys are passed
    explicitly so only host-side RNG needs global seeding)."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PL_GLOBAL_SEED"] = str(seed)
