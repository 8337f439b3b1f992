"""Density-analysis tests on synthetic uncertainty outputs."""

import os
from os.path import exists, join

import numpy as np
import torch

from unet_research_tpu.evaluation.density import (
    calculate_magnitudes,
    create_density_report,
    extract_tensors,
    load_matrix_tensors,
)


def _fake_results(tmp_path, models=("BM-1", "MF-1")):
    rng = np.random.default_rng(0)
    for model in models:
        for kind, nest in [("dropblock_uncertainty", "tensors"), ("rotation_uncertainty", None)]:
            base = tmp_path / model / kind
            root = base / nest if nest else base
            for i in range(2):
                d = root / f"image_{i}"
                d.mkdir(parents=True)
                torch.save(torch.from_numpy(rng.random((1, 1, 16, 16)).astype(np.float32) * 0.3), d / "std.pt")
                torch.save(torch.from_numpy(rng.random((1, 1, 16, 16)).astype(np.float32)), d / "mean.pt")
        stats = tmp_path / model / "statistics" / "val_images"
        stats.mkdir(parents=True)
        with open(stats / "metrics.csv", "w") as f:
            f.write("Validation_Image,F1_Vessel,AUROC_Vessel,Accuracy_Vessel\n1,0.8,0.9,0.95\n")
    return str(tmp_path)


def test_extract_and_magnitudes(tmp_path):
    root = _fake_results(tmp_path)
    stds = extract_tensors(join(root, "BM-1", "dropblock_uncertainty", "tensors"), "std.pt")
    assert sorted(stds) == [0, 1]
    assert stds[0].shape == (1, 1, 16, 16)
    df = calculate_magnitudes({"BM-1": stds})
    assert len(df) == 2
    assert (df["max"] <= 0.3 + 1e-6).all()


def test_full_report(tmp_path):
    root = _fake_results(tmp_path / "runs")
    out = str(tmp_path / "density")
    create_density_report(root, out, models=["BM-1", "MF-1"])
    assert exists(join(out, "All_Models", "All_Model_DB_STD.png"))
    assert exists(join(out, "All_Models", "All_Model_ROT_STD.png"))
    assert exists(join(out, "All_Models", "All_Model_DB_CV.png"))
    assert exists(join(out, "Single_Models", "BM-1_DB_STD.png"))
    assert exists(join(out, "std_magnitudes_db.csv"))
    assert exists(join(out, "all_metrics.csv"))
    data = load_matrix_tensors(root, ["BM-1", "MF-1"])
    assert set(data["metrics"]["name"]) == {"BM-1", "MF-1"}


def test_hist_battery(tmp_path):
    """The masked/dilated/inverse-dilated histogram battery
    (create_density_STD.py:172-311) renders from matrix outputs + aug data."""
    from PIL import Image

    root = _fake_results(tmp_path / "runs", models=("BM-1",))
    aug = tmp_path / "aug" / "val"
    (aug / "masks").mkdir(parents=True)
    (aug / "targets").mkdir(parents=True)
    rng = np.random.default_rng(2)
    for i in range(2):
        mask = np.full((16, 16), 255, np.uint8)
        mask[:2] = 0  # some non-FOV border
        Image.fromarray(mask).save(aug / "masks" / f"{i}_mask.png")
        target = (rng.random((16, 16)) > 0.7).astype(np.uint8) * 255
        Image.fromarray(target).save(aug / "targets" / f"{i}_target.png")

    out = str(tmp_path / "density")
    create_density_report(str(tmp_path / "runs"), out, aug_root=str(tmp_path / "aug"),
                          models=["BM-1"], kinds=("hist",))
    hd = join(out, "Histograms")
    for name in ("CV_Histogram_BM-1.png", "STD_Dilated_Histogram_BM-1.png",
                 "CV_Dilated_Histogram_BM-1.png", "STD_InvDilated_Histogram_BM-1.png",
                 "CV_InvDilated_Histogram_BM-1.png"):
        assert exists(join(hd, name)), name


def test_did_overlay(tmp_path):
    root = _fake_results(tmp_path / "runs", models=("BM-1",))
    # add a dependent-variant run next to the independent one
    rng = np.random.default_rng(1)
    for i in range(2):
        d = tmp_path / "runs" / "BM-1" / "dropblock_uncertainty_dep" / "tensors" / f"image_{i}"
        d.mkdir(parents=True)
        torch.save(torch.from_numpy(rng.random((1, 1, 16, 16)).astype(np.float32) * 0.3), d / "std.pt")
        torch.save(torch.from_numpy(rng.random((1, 1, 16, 16)).astype(np.float32)), d / "mean.pt")
    out = str(tmp_path / "density")
    create_density_report(str(tmp_path / "runs"), out, models=["BM-1"], kinds=("std", "did"))
    assert exists(join(out, "All_Models", "BM-1_DvUD_STD.png"))
