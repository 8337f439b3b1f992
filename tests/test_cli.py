"""End-to-end CLI integration tests on a tiny synthetic dataset.

Drives the public entry points the way a reference user would (train ->
test -> uncertainty), checking the output directory contract
(SURVEY.md §5 'output directory contract') with a scaled-down model.
"""

import os
from os.path import exists, join

import numpy as np
import pandas as pd
import pytest
from PIL import Image

SMALL = ["-filters", "4", "-model_depth", "2", "-group_norm_groups", "2",
         "--auto_lr_find", "False"]


@pytest.fixture(scope="module")
def aug_data(tmp_path_factory):
    """Tiny augmented-layout dataset: train/val (images,targets,masks) + test."""
    root = tmp_path_factory.mktemp("aug")
    rng = np.random.default_rng(0)
    for split, n, with_targets in [("train", 6, True), ("val", 2, True), ("test", 2, False)]:
        d = root / split
        (d / "images").mkdir(parents=True)
        (d / "masks").mkdir()
        if with_targets:
            (d / "targets").mkdir()
        for i in range(n):
            Image.fromarray(rng.integers(0, 256, (32, 32)).astype(np.uint8)).save(
                d / "images" / f"{i}_image.png"
            )
            Image.fromarray(np.full((32, 32), 255, np.uint8)).save(
                d / "masks" / f"{i}_mask.png"
            )
            if with_targets:
                Image.fromarray(
                    ((rng.random((32, 32)) > 0.5) * 255).astype(np.uint8)
                ).save(d / "targets" / f"{i}_target.png")
    return str(root)


@pytest.fixture(scope="module")
def trained(aug_data, tmp_path_factory):
    from unet_research_tpu.cli import training

    out_root = tmp_path_factory.mktemp("runs")
    dest = training.main(
        ["-mode", "train", "-data_path", aug_data, "-save_path", str(out_root / "bm"),
         "-num_epochs", "1", "-seed", "7"] + SMALL
    )
    return dest


def test_training_output_contract(trained):
    ckpts = os.listdir(join(trained, "model_info"))
    assert len(ckpts) == 1 and ckpts[0].startswith("model-epoch=")
    stats = join(trained, "statistics")
    assert exists(join(stats, "losses", "train_losses.txt"))
    assert exists(join(stats, "losses", "validation_losses.txt"))
    assert exists(join(stats, "losses", "loss_profile.png"))
    assert exists(join(stats, "test_images", "segmentations", "1.png"))
    assert exists(join(stats, "test_images", "examples", "test_example_1.png"))
    assert exists(join(stats, "val_images", "examples", "val_image_1", "val_example_1.png"))
    assert exists(join(stats, "val_images", "examples", "val_image_1", "contour_map.png"))
    assert exists(join(stats, "val_images", "examples", "val_image_1", "overlap_map.png"))
    assert exists(join(stats, "val_images", "tensors", "image_0", "segmentation.pt"))
    df = pd.read_csv(join(stats, "val_images", "metrics.csv"))
    assert list(df.columns) == ["Validation_Image", "F1_Vessel", "AUROC_Vessel", "Accuracy_Vessel"]
    assert len(df) == 2
    # segmentation.pt is (C,H,W) torch tensor like the reference's
    import torch

    seg = torch.load(join(stats, "val_images", "tensors", "image_0", "segmentation.pt"))
    assert tuple(seg.shape) == (1, 32, 32)


def test_testing_mode(trained, aug_data, tmp_path):
    from unet_research_tpu.cli import training
    from unet_research_tpu.train.checkpoint import find_checkpoint

    ckpt = find_checkpoint(join(trained, "model_info"))
    out = training.main(
        ["-mode", "test", "-model_path", ckpt, "-data_path", aug_data,
         "-save_path", str(tmp_path / "teststats"), "-seed", "7"] + SMALL
    )
    assert exists(join(out, "val_images", "metrics.csv"))


def test_dropblock_uncertainty_cli(trained, aug_data, tmp_path):
    from unet_research_tpu.cli import dropblock_uncertainty
    from unet_research_tpu.train.checkpoint import find_checkpoint

    ckpt = find_checkpoint(join(trained, "model_info"))
    out = dropblock_uncertainty.main(
        ["-model_path", ckpt, "-data_path", aug_data,
         "-save_path", str(tmp_path / "mc"), "-iter_num", "8", "-save_num", "3",
         "-chunk", "4", "-block_size", "3", "-seed", "3", "-reuse_tensors"] + SMALL
    )
    assert os.path.islink(join(out, "model_ckpt_symlink.ckpt"))
    import torch

    mean = torch.load(join(out, "tensors", "image_0", "mean.pt"))
    std = torch.load(join(out, "tensors", "image_0", "std.pt"))
    tensors = torch.load(join(out, "tensors", "image_0", "tensors.pt"))
    assert tuple(mean.shape) == (1, 1, 32, 32)
    assert tuple(std.shape) == (1, 1, 32, 32)
    assert tuple(tensors.shape) == (3, 1, 1, 32, 32)
    assert float(std.max()) > 0
    assert exists(join(out, "statistics", "val_images", "metrics.csv"))
    # disable_test => no test_images segmentations
    assert not exists(join(out, "statistics", "test_images", "segmentations"))


def test_rotational_uncertainty_cli(trained, aug_data, tmp_path):
    from unet_research_tpu.cli import rotational_uncertainty
    from unet_research_tpu.train.checkpoint import find_checkpoint

    ckpt = find_checkpoint(join(trained, "model_info"))
    out = rotational_uncertainty.main(
        ["-model_path", ckpt, "-data_path", aug_data,
         "-save_path", str(tmp_path / "rot"), "-num_iterations", "6",
         "-save_num", "2", "-chunk", "3", "-seed", "3"] + SMALL
    )
    import torch

    # rotational saves image dirs at the top level (no tensors/ nesting)
    mean = torch.load(join(out, "image_0", "mean.pt"))
    assert tuple(mean.shape) == (1, 1, 32, 32)
    assert exists(join(out, "image_1", "tensors.pt"))


def test_base_model_mf_sweep(trained, aug_data, tmp_path):
    from unet_research_tpu.cli import base_model_mf
    from unet_research_tpu.train.checkpoint import find_checkpoint

    ckpt = find_checkpoint(join(trained, "model_info"))
    out = base_model_mf.main(
        ["-model_path", ckpt, "-data_path", aug_data,
         "-save_path", str(tmp_path / "sweep"), "-height", "16,32", "-width", "16,32",
         "-seed", "3"] + SMALL
    )
    assert exists(join(out, "16x16", "val_images", "metrics.csv"))
    assert exists(join(out, "32x32", "val_images", "metrics.csv"))


def test_run_matrix_dry_run(aug_data, tmp_path, capsys):
    from unet_research_tpu.cli import run_matrix

    run_matrix.main(
        ["-stage", "train", "-data_path", aug_data, "-out_root", str(tmp_path / "m"),
         "--dry_run"]
    )
    outp = capsys.readouterr().out
    assert outp.count("[run_matrix]") == 12
    assert "-policy rsz-rat" in outp and "-train_ratio" in outp


def test_run_matrix_all_to_density(aug_data, tmp_path, capsys):
    """The uncertainty -> density seam end to end: `-stage all` on one tiny
    model must leave uncertainty tensors where density/viewer read them
    (<model>/dropblock_uncertainty/tensors, <model>/rotation_uncertainty)
    and render a density report FROM those tensors (VERDICT r1 weak #4)."""
    from unet_research_tpu.cli import run_matrix

    out_root = str(tmp_path / "matrix")
    argv = [
        "-stage", "all", "-data_path", aug_data, "-out_root", out_root,
        "-models", "BM-1", "-num_epochs", "1", "-seed", "5",
        # tiny-model + tiny-ensemble knobs pass through to every stage
        "-iter_num", "8", "-num_iterations", "6", "-chunk", "4",
        "-save_num", "2", "-block_size", "3", "-reuse_tensors",
    ] + SMALL
    run_matrix.main(argv)

    bm = join(out_root, "BM-1")
    # canonical (unsuffixed) stage outputs
    assert exists(join(bm, "model_info"))
    assert exists(join(bm, "test_statistics", "val_images", "metrics.csv"))
    import torch

    std = torch.load(join(bm, "dropblock_uncertainty", "tensors", "image_0", "std.pt"))
    assert float(std.max()) > 0
    assert exists(join(bm, "rotation_uncertainty", "image_0", "std.pt"))

    # density report rendered from the matrix-produced tensors
    dens = join(out_root, "density")
    assert exists(join(dens, "All_Models", "All_Model_DB_STD.png"))
    assert exists(join(dens, "All_Models", "All_Model_ROT_STD.png"))
    assert exists(join(dens, "Single_Models", "BM-1_DB_STD.png"))
    mags = pd.read_csv(join(dens, "std_magnitudes_db.csv"))
    assert (mags["model_name"] == "BM-1").all() and len(mags) == 2
    allm = pd.read_csv(join(dens, "all_metrics.csv"))
    assert set(allm["name"]) >= {"BM-1", "BM-1_DB"}

    # rerun is idempotent: every stage skips, nothing suffix-drifts
    run_matrix.main(argv)
    outp = capsys.readouterr().out
    assert outp.count("skip") >= 4
    assert not exists(bm + "0") and not exists(join(bm, "dropblock_uncertainty0"))


def test_build_unet_plugin_flags():
    """The new arch flags (-norm/-activation/-conv_impl/-mask_impl) reach the
    model config; defaults stay reference behavior (CLAUDE.md invariant)."""
    import argparse

    from unet_research_tpu.cli.common import (
        add_arch_args,
        add_common_train_args,
        add_trainer_args,
        build_unet,
        parse_with_passthrough,
    )

    p = argparse.ArgumentParser()
    add_common_train_args(p)
    add_arch_args(p)
    add_trainer_args(p)
    base = ["-mode", "train", "-data_path", "x", "-save_path", "y",
            "-filters", "8", "-model_depth", "2"]
    args = parse_with_passthrough(
        p, base + ["-norm", "batch", "-activation", "elu",
                   "-conv_impl", "pair", "-mask_impl", "elementwise"])
    m = build_unet(args, "dependent", use_scheduler=False)
    assert m.cfg.norm == "batch" and m.cfg.activation == "elu"
    assert m.cfg.conv_impl == "pair"
    assert m.cfg.dropblock.mask_impl == "elementwise"

    dflt = build_unet(parse_with_passthrough(p, base), "dependent", True)
    assert dflt.cfg.norm == "group" and dflt.cfg.activation == "relu"
    assert dflt.cfg.conv_impl == "xla" and dflt.cfg.dropblock.mask_impl is None

    none = parse_with_passthrough(p, base + ["-norm", "none"])
    assert build_unet(none, None, False).cfg.norm is None
