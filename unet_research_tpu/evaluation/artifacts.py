"""Artifact writers (reference utils_metrics.py:176-301).

All inputs are numpy HWC float [0,1]. Saved tensors (.pt) use torch CPU
serialization in the reference's (C, H, W) layout so the downstream density
analysis (create_density_*.py, Evaluate_Tensors.ipynb) can consume our
outputs unchanged.
"""

from __future__ import annotations

from os.path import join

import matplotlib

matplotlib.use("Agg")
import matplotlib.cm as cm
import matplotlib.pyplot as plt
import numpy as np
from matplotlib.colors import LinearSegmentedColormap

from unet_research_tpu.utils.general import to_pil


def _chw(arr: np.ndarray) -> np.ndarray:
    """HWC -> CHW for torch-format tensor dumps."""
    a = np.asarray(arr, dtype=np.float32)
    if a.ndim == 2:
        a = a[..., None]
    return np.moveaxis(a, -1, 0)


def save_tensor(arr: np.ndarray, path: str) -> None:
    """torch.save of a (C,H,W) float tensor — byte-compatible with the
    reference's torch dumps (utils_metrics.py:136,
    Dropblock_Uncertainty.py:157-165)."""
    import torch

    torch.save(torch.from_numpy(_chw(arr).copy()), path)


def save_tensor_batched(arr_nhwc: np.ndarray, path: str) -> None:
    """torch.save of an (N,C,H,W) tensor from NHWC — the uncertainty engines'
    mean/std dumps keep the batch dim ((1,1,H,W),
    Dropblock_Uncertainty.py:66-67,157-165)."""
    import torch

    a = np.asarray(arr_nhwc, dtype=np.float32)
    a = np.moveaxis(a, -1, 1)  # NHWC -> NCHW
    torch.save(torch.from_numpy(a.copy()), path)


def save_stacked_tensors(arr_knhwc: np.ndarray, path: str) -> None:
    """torch.save of a (K,N,C,H,W) member stack from (K,N,H,W,C) — the
    reference's tensors.pt layout (vstack of unsqueezed (1,1,H,W) members)."""
    import torch

    a = np.asarray(arr_knhwc, dtype=np.float32)
    a = np.moveaxis(a, -1, 2)  # KNHWC -> KNCHW
    torch.save(torch.from_numpy(a.copy()), path)


def save_losses_as_text(train_losses, val_losses, save_path=".") -> None:
    np.array(train_losses, dtype=np.float64).tofile(
        join(save_path, "train_losses.txt"), sep="\n", format="%ls"
    )
    np.array(val_losses, dtype=np.float64).tofile(
        join(save_path, "validation_losses.txt"), sep="\n", format="%ls"
    )


def save_loss_profile(train_losses, val_losses, save_path=".") -> None:
    fig, ax = plt.subplots(1, 1, figsize=(8, 5))
    ax.plot(train_losses, "b", label="Train Losses")
    ax.plot(val_losses, "r^", label="Validation Losses")
    fig.legend(loc="upper right")
    ax.set_xlabel("Epoch")
    ax.set_ylabel("BCELoss")
    fig.suptitle("Loss Profile")
    fig.savefig(join(save_path, "loss_profile.png"))
    plt.close(fig)


def save_contour_map(seg: np.ndarray, gt: np.ndarray, save_path=".") -> None:
    """Divergence map between thresholded segmentation and gt
    (utils_metrics.py:209-231)."""
    s = np.round(np.asarray(seg)[..., 0])
    g = np.asarray(gt)[..., 0]
    diff = 2 * (s - g) / np.clip(np.abs(s) + np.abs(g), 1e-6, None)
    fig, ax1 = plt.subplots(1, 1, figsize=(10, 10))
    m = ax1.imshow(diff, cmap=cm.seismic)
    fig.colorbar(m, ax=ax1)
    ax1.set_title("Divergence Map Vessel Segmentation", fontsize=12)
    fig.savefig(join(save_path, "contour_map.png"))
    plt.close(fig)


def save_overlap_map(seg: np.ndarray, gt: np.ndarray, save_path=".") -> None:
    """Red thresholded segmentation over the gray gt (utils_metrics.py:234-257)."""
    mask = np.round(np.asarray(seg)[..., 0])
    masked = np.ma.masked_where(mask == 0, mask)
    cdict = {
        "red": ((0, 1, 1), (1, 1, 1)),
        "green": ((0, 0, 0), (1, 0, 0)),
        "blue": ((0, 0, 0), (1, 0, 0)),
    }
    fig, ax = plt.subplots(1, 1, figsize=(10, 8))
    ax.imshow(to_pil(gt), cmap="gray")
    ax.imshow(masked, cmap=LinearSegmentedColormap("custom_cmap", cdict), alpha=0.9)
    ax.set_title("Overlap Vessel Segmentation", fontsize=12)
    fig.savefig(join(save_path, "overlap_map.png"))
    plt.close(fig)


def save_test_example(image, seg, id, save_path) -> None:
    fig, axes = plt.subplots(nrows=1, ncols=2, figsize=(12, 6), tight_layout=True)
    axes[0].imshow(to_pil(image), cmap="gray")
    axes[0].set_title("Base Image")
    axes[1].imshow(to_pil(seg), cmap="gray")
    axes[1].set_title("Vessel Segmentation")
    fig.suptitle(f"Test Image {id}")
    fig.savefig(join(save_path, f"test_example_{id}.png"))
    plt.close(fig)


def save_segmentation(seg, id, save_path) -> None:
    """Thresholded binary segmentation PNG (utils_metrics.py:277-279)."""
    to_pil(np.round(np.asarray(seg))).convert("L").save(join(save_path, f"{id}.png"))


def save_val_example(image, seg, gt, id, save_path) -> None:
    fig, axes = plt.subplots(nrows=1, ncols=4, figsize=(27, 9), tight_layout=True)
    axes[0].imshow(to_pil(image), cmap="gray")
    axes[0].set_title("Base Image")
    axes[1].imshow(to_pil(seg), cmap="gray")
    axes[1].set_title("Vessel Segmentation")
    axes[2].imshow(to_pil(np.round(np.asarray(seg))), cmap="gray")
    axes[2].set_title("Vessel Segmentation - Thresholded")
    axes[3].imshow(to_pil(gt), cmap="gray")
    axes[3].set_title("Vessel Ground Truth")
    fig.suptitle(f"Val Image {id}")
    fig.savefig(join(save_path, f"val_example_{id}.png"))
    plt.close(fig)
