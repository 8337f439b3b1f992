"""Augmented-dataset generation: create_augmentations reimplemented with
batched on-device warps.

Reference pipeline (preprocessing/create_augmentations.py): seed 1234, DRIVE
train 20 images split 70/30 into 14 train / 6 val; train transform =
A.ToGray + A.Flip(p=.5) + A.Rotate(limit=180, p=.95, border_mode=REPLICATE),
36 augments per train image (504 files x3); val/test get ToGray only; output
tree {train,val}/{images,targets,masks} + test/{images,masks} with
{i}_image.png / {i}_target.png / {i}_mask.png naming (gen_givens,
utils_preprocessing.py:16-33) and 1-based zero-padded test ids (gen_tests,
utils_preprocessing.py:82-95).

TPU-native difference: each source image's 36 augments evaluate as ONE
vmapped jitted program (gray conversion + flip selects + rotation warps for
image/target/mask together) instead of 504 serial albumentations calls. The
random plan (flip codes, angles, apply-gates) is drawn host-side with numpy
so the dataset is reproducible from the seed.
"""

from __future__ import annotations

import os
from functools import partial
from os.path import exists, join

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from unet_research_tpu.data.drive import load_drive
from unet_research_tpu.ops.image import rotate_cv2_like, to_gray_rgb
from unet_research_tpu.utils.general import seed_everything


@partial(jax.jit, static_argnames=("num",))
def _augment_batch(im_rgb, gt, mask, angles, rot_on, flip_v, flip_h, num: int):
    """Produce `num` augments of one (im, gt, mask) triple.

    im_rgb: (H,W,3) float 0..255 (already gray-converted by caller or not);
    gt/mask: (H,W,1) float 0..255. angles/rot_on/flip_v/flip_h: (num,) plans.
    Returns (num,H,W,3), (num,H,W,1), (num,H,W,1).
    """
    im_gray = to_gray_rgb(im_rgb[None])  # ToGray applies to the image only

    def one(angle, rot, fv, fh):
        def tf(x, interp):
            x = jnp.where(fv, x[:, ::-1, :, :], x)
            x = jnp.where(fh, x[:, :, ::-1, :], x)
            rx = rotate_cv2_like(x, angle, interpolation=interp, border="replicate")
            return jnp.where(rot, rx, x)

        return (
            tf(im_gray, "bilinear")[0],
            tf(gt[None], "nearest")[0],
            tf(mask[None], "nearest")[0],
        )

    return jax.vmap(one)(angles, rot_on, flip_v, flip_h)


def _save_u8(arr: np.ndarray, path: str, mode: str) -> None:
    a = np.clip(np.round(np.asarray(arr)), 0, 255).astype(np.uint8)
    if mode == "L" and a.ndim == 3:
        a = a[..., 0]
    Image.fromarray(a).save(path)


def _gen_subdir(path: str, include_targets: bool = True):
    im_path = join(path, "images")
    mask_path = join(path, "masks")
    os.makedirs(im_path)
    os.makedirs(mask_path)
    if include_targets:
        target_path = join(path, "targets")
        os.makedirs(target_path)
        return im_path, target_path, mask_path
    return im_path, mask_path


def _plan(rng: np.random.Generator, num: int, flip_p=0.5, rot_p=0.95, limit=180.0):
    """Random transform plan matching A.Flip(p)/A.Rotate(limit, p) draws."""
    flip_on = rng.random(num) < flip_p
    codes = rng.integers(-1, 2, num)  # cv2 flip code in {-1,0,1}
    flip_v = flip_on & ((codes == 0) | (codes == -1))
    flip_h = flip_on & ((codes == 1) | (codes == -1))
    rot_on = rng.random(num) < rot_p
    angles = rng.uniform(-limit, limit, num).astype(np.float32)
    return (
        jnp.asarray(angles),
        jnp.asarray(rot_on),
        jnp.asarray(flip_v),
        jnp.asarray(flip_h),
    )


def gen_givens(dest: str, num: int, items, seed: int, augment: bool) -> int:
    """Write `num` augments per (im, gt, mask) item to dest/{images,targets,
    masks} with running {i}_* names (utils_preprocessing.py:16-33)."""
    seed_everything(seed)
    rng = np.random.default_rng(seed)
    im_path, target_path, mask_path = _gen_subdir(dest, include_targets=True)
    num_added = 0
    for im, gt, mask in items:
        imj = jnp.asarray(im, jnp.float32)
        gtj = jnp.asarray(gt, jnp.float32)[..., None]
        maskj = jnp.asarray(mask, jnp.float32)[..., None]
        if augment:
            plans = _plan(rng, num)
        else:
            zero = jnp.zeros(num)
            plans = (zero, zero.astype(bool), zero.astype(bool), zero.astype(bool))
        ims, gts, masks = jax.device_get(_augment_batch(imj, gtj, maskj, *plans, num=num))
        for i in range(num):
            _save_u8(gts[i], join(target_path, f"{num_added}_target.png"), "L")
            _save_u8(ims[i], join(im_path, f"{num_added}_image.png"), "RGB")
            _save_u8(masks[i], join(mask_path, f"{num_added}_mask.png"), "L")
            num_added += 1
    return num_added


def gen_givens_resized(
    dest: str,
    sizes: list[int],
    num: list[int],
    items,
    seed: int,
    resize_up: bool,
    augment: bool = True,
) -> int:
    """Resized-dataset writer (reference utils_preprocessing.py:36-79,
    unused by the checked-in CLI but part of the preprocessing surface):
    builds a shuffled per-output size plan from (sizes, num) pairs, cycles
    the loader until the plan is exhausted, and writes each transformed
    triple either at size s x s (resize_up=False) or degraded down-then-up
    at the original size (resize_up=True). Size -1 keeps the original.
    """
    assert len(sizes) == len(num)
    plan = np.repeat(np.asarray(sizes), np.asarray(num))
    rng_plan = np.random.default_rng(seed)
    rng_plan.shuffle(plan)
    total = int(plan.size)

    seed_everything(seed)
    rng = np.random.default_rng(seed)
    im_path, target_path, mask_path = _gen_subdir(dest, include_targets=True)

    from unet_research_tpu.ops.image import resize_bilinear

    num_added = 0
    while num_added < total:
        for im, gt, mask in items:
            if num_added >= total:
                break
            imj = jnp.asarray(im, jnp.float32)
            gtj = jnp.asarray(gt, jnp.float32)[..., None]
            maskj = jnp.asarray(mask, jnp.float32)[..., None]
            if augment:
                plans = _plan(rng, 1)
            else:
                zero = jnp.zeros(1)
                plans = (zero, zero.astype(bool), zero.astype(bool), zero.astype(bool))
            ims, gts, masks = _augment_batch(imj, gtj, maskj, *plans, num=1)
            triple = [ims[0], gts[0], masks[0]]
            s = int(plan[num_added])
            if s != -1:
                orig_hw = (triple[0].shape[0], triple[0].shape[1])
                down = [resize_bilinear(t[None], (s, s))[0] for t in triple]
                if resize_up:
                    triple = [resize_bilinear(t[None], orig_hw)[0] for t in down]
                else:
                    triple = down
            ims0, gts0, masks0 = jax.device_get(triple)
            _save_u8(gts0, join(target_path, f"{num_added}_target.png"), "L")
            _save_u8(ims0, join(im_path, f"{num_added}_image.png"), "RGB")
            _save_u8(masks0, join(mask_path, f"{num_added}_mask.png"), "L")
            num_added += 1
    return num_added


def gen_tests(dest: str, items) -> int:
    """ToGray-only test copies, 1-based zero-padded names
    (utils_preprocessing.py:82-95)."""
    im_path, mask_path = _gen_subdir(dest, include_targets=False)
    count = 1
    for im, _, mask in items:
        gray = jax.device_get(to_gray_rgb(jnp.asarray(im, jnp.float32)[None]))[0]
        _save_u8(gray, join(im_path, f"{str(count).zfill(2)}_image.png"), "RGB")
        _save_u8(mask, join(mask_path, f"{str(count).zfill(2)}_mask.png"), "L")
        count += 1
    return count - 1


def create_augmentations(
    drive_root: str,
    dest: str = "augmented_data",
    seed: int = 1234,
    num_train: int = 36,
    training_pct: float = 0.7,
) -> str:
    """Full dataset generation (create_augmentations.py __main__)."""
    seed_everything(seed)
    given = load_drive(drive_root, "training")
    test = load_drive(drive_root, "test")

    training_len = int(len(given) * training_pct)
    perm = np.random.permutation(len(given))  # torch random_split equivalent
    train_idx, val_idx = perm[:training_len], perm[training_len:]

    out = dest
    if exists(out):
        for i in range(1, 5):
            out = dest + str(i)
            if not exists(out):
                break
        else:
            raise FileExistsError("Could not create destination directory.")
    os.makedirs(out)

    train_dest = join(out, "train")
    val_dest = join(out, "val")
    test_dest = join(out, "test")
    for p in (train_dest, val_dest, test_dest):
        os.makedirs(p)

    train_items = [given[i] for i in train_idx]
    val_items = [given[i] for i in val_idx]
    test_items = [test[i] for i in range(len(test))]

    gen_givens(train_dest, num_train, train_items, seed, augment=True)
    gen_givens(val_dest, 1, val_items, seed, augment=False)
    gen_tests(test_dest, test_items)
    return out
