"""Smoke test for the static tensor viewer (cli/view_tensors.py) — the
Evaluate_Tensors.ipynb-equivalent contact sheets, including the CV-map and
MSE-vs-base-model panels (notebook cells ~65-76 and 92-96)."""

import os
from os.path import exists, join

import numpy as np
import pytest

from unet_research_tpu.evaluation import artifacts


def _fake_run(root, model, rng, h=24, w=20, n_images=2, with_rot=True):
    for i in range(n_images):
        db = join(root, model, "dropblock_uncertainty", "tensors", f"image_{i}")
        os.makedirs(db)
        mean = rng.random((1, h, w, 1), dtype=np.float32)
        std = rng.random((1, h, w, 1), dtype=np.float32) * 0.1
        artifacts.save_tensor_batched(mean, join(db, "mean.pt"))
        artifacts.save_tensor_batched(std, join(db, "std.pt"))
        if with_rot:
            rot = join(root, model, "rotation_uncertainty", f"image_{i}")
            os.makedirs(rot)
            artifacts.save_tensor_batched(mean * 0.9, join(rot, "mean.pt"))
            artifacts.save_tensor_batched(std * 0.5, join(rot, "std.pt"))
        seg = join(root, model, "test_statistics", "val_images", "tensors", f"image_{i}")
        os.makedirs(seg)
        artifacts.save_tensor(rng.random((h, w, 1), dtype=np.float32), join(seg, "segmentation.pt"))


def _fake_aug(root, rng, h=24, w=20, n_images=2):
    from PIL import Image

    for sub in ("images", "targets", "masks"):
        d = join(root, "val", sub)
        os.makedirs(d)
        for i in range(n_images):
            arr = (rng.random((h, w)) * 255).astype(np.uint8)
            if sub == "masks":
                arr = np.full((h, w), 255, np.uint8)
            Image.fromarray(arr, "L").save(join(d, f"{i}_{sub[:-1]}.png"))


def test_viewer_renders_cv_and_mse_panels(tmp_path):
    pytest.importorskip("torch")
    from unet_research_tpu.cli import view_tensors

    rng = np.random.default_rng(0)
    results = tmp_path / "runs"
    aug = tmp_path / "aug"
    _fake_run(str(results), "BM-1", rng)
    _fake_run(str(results), "LF-1", rng, with_rot=False)
    _fake_aug(str(aug), rng)

    out = view_tensors.main([
        "-results_root", str(results),
        "-aug_root", str(aug),
        "-save_path", str(tmp_path / "viewer"),
        "-models", "BM-1,LF-1",
    ])
    # per-image contact sheets for both models
    for m in ("BM-1", "LF-1"):
        for i in range(2):
            assert exists(join(out, f"{m}_image_{i}.png"))
    # the MSE-vs-base panels (one per model with any seg/mean available)
    assert exists(join(out, "MSE_Plot_BM-1.png"))
    assert exists(join(out, "MSE_Plot_LF-1.png"))


def test_cv_map_masks_and_guards_division():
    from unet_research_tpu.cli.view_tensors import _cv_map

    mean = np.array([[0.5, 0.0], [1.0, 0.25]], np.float32)
    std = np.array([[0.25, 0.1], [0.5, 0.5]], np.float32)
    fov = np.array([[1.0, 1.0], [0.0, 1.0]], np.float32)
    cv = _cv_map(mean, std, fov)
    np.testing.assert_allclose(cv, [[0.5, 0.0], [0.0, 2.0]])
