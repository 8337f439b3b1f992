"""Augmentation pipeline tests: cv2 goldens for gray/flip/rotate and the
end-to-end generation layout."""

import os

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from unet_research_tpu.data.augment import create_augmentations
from unet_research_tpu.data.dataset import load_split
from unet_research_tpu.ops.image import flip_nhwc, rotate_cv2_like, to_gray_rgb


def test_to_gray_matches_cv2(rng):
    img = rng.integers(0, 256, (20, 30, 3)).astype(np.uint8)
    ours = np.asarray(to_gray_rgb(jnp.asarray(img, jnp.float32)[None]))[0]
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    np.testing.assert_array_equal(ours[..., 0].astype(np.uint8), ref)


@pytest.mark.parametrize("code", [-1, 0, 1])
def test_flip_matches_cv2(rng, code):
    img = rng.integers(0, 256, (8, 9, 3)).astype(np.uint8)
    ours = np.asarray(flip_nhwc(jnp.asarray(img, jnp.float32)[None], code))[0]
    ref = cv2.flip(img, code)
    np.testing.assert_array_equal(ours.astype(np.uint8), ref)


@pytest.mark.parametrize("angle", [15.0, -97.3, 180.0])
def test_rotate_replicate_matches_cv2(rng, angle):
    img = rng.integers(0, 256, (41, 37, 1)).astype(np.uint8)
    h, w = img.shape[:2]
    ours = np.asarray(
        rotate_cv2_like(jnp.asarray(img, jnp.float32)[None], angle, "bilinear", "replicate")
    )[0, ..., 0]
    M = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
    ref = cv2.warpAffine(
        img, M, (w, h), flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REPLICATE
    )
    # cv2 uses 5-bit fixed-point interpolation weights; allow small deltas on
    # a small fraction of pixels
    diff = np.abs(ours - ref.astype(np.float32))
    assert np.quantile(diff, 0.99) <= 3.0, diff.max()
    assert np.mean(diff) < 1.0


@pytest.mark.parametrize("angle", [30.0, -45.0])
def test_rotate_nearest_matches_cv2(rng, angle):
    img = (rng.integers(0, 2, (33, 29, 1)) * 255).astype(np.uint8)
    h, w = img.shape[:2]
    ours = np.asarray(
        rotate_cv2_like(jnp.asarray(img, jnp.float32)[None], angle, "nearest", "replicate")
    )[0, ..., 0]
    M = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
    ref = cv2.warpAffine(
        img, M, (w, h), flags=cv2.INTER_NEAREST, borderMode=cv2.BORDER_REPLICATE
    )
    # nearest disagreements only happen on rounding-boundary pixels; cv2's
    # 5-bit fixed-point source coords tie-break differently from exact float
    # rounding, so random binary noise shows a few percent boundary flips
    mismatch = np.mean(ours.astype(np.uint8) != ref)
    assert mismatch < 0.05, mismatch


def _fake_drive(tmp_path):
    """Tiny synthetic DRIVE tree."""
    from PIL import Image

    rng = np.random.default_rng(0)
    for split, n, with_manual in [("training", 5, True), ("test", 3, False)]:
        root = tmp_path / split
        (root / "images").mkdir(parents=True)
        (root / "mask").mkdir()
        if with_manual:
            (root / "1st_manual").mkdir()
        for i in range(n):
            im = rng.integers(0, 256, (24, 20, 3)).astype(np.uint8)
            Image.fromarray(im).save(root / "images" / f"{21+i}_{split}.tif")
            mask = (rng.random((24, 20)) > 0.3).astype(np.uint8) * 255
            Image.fromarray(mask).save(root / "mask" / f"{21+i}_mask.gif")
            if with_manual:
                man = (rng.random((24, 20)) > 0.7).astype(np.uint8) * 255
                Image.fromarray(man).save(root / "1st_manual" / f"{21+i}_manual1.gif")
    return str(tmp_path)


def test_create_augmentations_layout(tmp_path):
    drive = _fake_drive(tmp_path / "drive")
    out = create_augmentations(drive, str(tmp_path / "aug"), seed=1234, num_train=4)
    # 5 originals -> 3 train (70%), 2 val; 4 augs per train image
    train = load_split(os.path.join(out, "train"))
    val = load_split(os.path.join(out, "val"))
    test = load_split(os.path.join(out, "test"), with_targets=False)
    assert len(train) == 12 and len(val) == 2 and len(test) == 3
    assert sorted(os.listdir(os.path.join(out, "test", "images")))[0] == "01_image.png"
    im, gt, mask = train[0]
    assert im.shape == (24, 20, 1)  # loaded as L
    assert set(np.unique(np.asarray(mask))) <= {0.0, 1.0}
    # determinism from the seed
    out2 = create_augmentations(drive, str(tmp_path / "aug2"), seed=1234, num_train=4)
    train2 = load_split(os.path.join(out2, "train"))
    np.testing.assert_array_equal(train.images, train2.images)


def test_gen_givens_resized(tmp_path):
    from unet_research_tpu.data.augment import gen_givens_resized
    from unet_research_tpu.data.drive import load_drive

    drive = _fake_drive(tmp_path / "drive2")
    given = load_drive(drive, "training")
    items = [given[i] for i in range(3)]
    out = tmp_path / "rsz"
    out.mkdir()
    n = gen_givens_resized(str(out), sizes=[-1, 12], num=[2, 3], items=items,
                           seed=7, resize_up=False)
    assert n == 5
    from PIL import Image
    sizes = sorted(Image.open(out / "images" / f"{i}_image.png").size for i in range(5))
    # 3 outputs at 12x12, 2 at original 20x24 (PIL size is (W,H))
    assert sizes.count((12, 12)) == 3
    assert sizes.count((20, 24)) == 2
    # resize_up=True keeps the original canvas
    out2 = tmp_path / "rszup"
    out2.mkdir()
    gen_givens_resized(str(out2), sizes=[12], num=[2], items=items, seed=7, resize_up=True)
    assert Image.open(out2 / "images" / "0_image.png").size == (20, 24)
