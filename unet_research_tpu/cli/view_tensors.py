"""Static tensor viewer: the Evaluate_Tensors.ipynb capability as a CLI.

The reference ships an ipywidgets notebook (Evaluate_Tensors.ipynb, 104
cells) for interactively browsing MC-DropBlock / rotational means, stds,
dependent-vs-independent comparisons, CV maps and MSE-vs-base panels. This
CLI renders the same panels as PNG contact sheets so results are browsable
without a notebook kernel:

per model and validation image:
  - mean / std / CV panels for DB and ROT ensembles (CV = std/mean inside
    the FOV mask, the quantity the notebook's CV sections histogram,
    Evaluate_Tensors.ipynb cells ~65-76)
  - original image + ground truth context
  - dependent-vs-independent difference panel when both runs exist

plus the notebook's "MSE over Base model" section (cells 92-96): the val
image with the highest base-model segmentation MSE is selected, then a
per-pixel squared-error map vs ground truth is rendered for every model's
plain segmentation, DB mean, and ROT mean.

Usage:
  python -m unet_research_tpu.cli.view_tensors -results_root RUNS \
      -aug_root AUG -save_path RUNS/viewer [-models BM-1,MF-1]
"""

from __future__ import annotations

import argparse
import os
from os.path import exists, join

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from unet_research_tpu.evaluation.density import MODELS, extract_tensors


def _load_val_images(aug_root):
    from PIL import Image

    out = {}
    for sub in ("images", "targets", "masks"):
        d = join(aug_root, "val", sub)
        out[sub] = {}
        if exists(d):
            for f in os.listdir(d):
                out[sub][int(f.split("_")[0])] = np.array(Image.open(join(d, f)).convert("L"))
    return out


def _resize_to(arr, hw):
    """Bilinear-resize a 2-D uint8/float array to (H, W) (display-parity with
    the notebook's TF.resize of the GT, Evaluate_Tensors.ipynb cell 96)."""
    from PIL import Image

    if arr.shape == tuple(hw):
        return np.asarray(arr, np.float32)
    im = Image.fromarray(np.asarray(arr, np.float32))
    return np.array(im.resize((hw[1], hw[0]), Image.BILINEAR), np.float32)


def _cv_map(mean2d, std2d, fov):
    """std/mean coefficient-of-variation inside the FOV, 0 elsewhere (the
    per-pixel quantity behind the notebook's CV histograms, cells 65-76)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        cv = std2d / mean2d
    cv = np.nan_to_num(cv, nan=0.0, posinf=0.0, neginf=0.0)
    if fov is not None:
        cv = cv * (fov > 0.5)
    return cv


def _panel(ax, arr, title, cmap="gray", vmin=None, vmax=None):
    im = ax.imshow(arr, cmap=cmap, vmin=vmin, vmax=vmax)
    ax.set_title(title, fontsize=10)
    ax.axis("off")
    return im


def render_model(model, results_root, val_data, save_dir):
    sources = {
        "DB": join(results_root, model, "dropblock_uncertainty", "tensors"),
        "ROT": join(results_root, model, "rotation_uncertainty"),
    }
    means = {k: extract_tensors(p, "mean.pt") for k, p in sources.items()}
    stds = {k: extract_tensors(p, "std.pt") for k, p in sources.items()}
    dep_means = extract_tensors(
        join(results_root, model, "dropblock_uncertainty_dep", "tensors"), "mean.pt"
    )

    images = sorted(set().union(*[set(m) for m in means.values()]))
    if not images:
        return 0
    os.makedirs(save_dir, exist_ok=True)
    # CV display ranges follow the notebook's histogram ranges: (0,5) for
    # DB, (0,2) for ROT (Evaluate_Tensors.ipynb cell 76)
    cv_vmax = {"DB": 5.0, "ROT": 2.0}
    for i in images:
        cols = 2 + 3 * sum(1 for k in sources if i in means[k]) + (1 if i in dep_means else 0)
        fig, axes = plt.subplots(1, cols, figsize=(4 * cols, 4.2), tight_layout=True)
        axes = np.atleast_1d(axes)
        c = 0
        if i in val_data["images"]:
            _panel(axes[c], val_data["images"][i], "Input"); c += 1
        else:
            axes[c].axis("off"); c += 1
        for kind in ("DB", "ROT"):
            if i in means[kind]:
                mm = means[kind][i][0, 0]
                _panel(axes[c], mm, f"{kind} mean", vmin=0, vmax=1); c += 1
                sm = stds[kind][i][0, 0]
                im = _panel(axes[c], sm, f"{kind} std", cmap="jet", vmin=0, vmax=max(1e-6, sm.max()))
                fig.colorbar(im, ax=axes[c], fraction=0.046); c += 1
                fov = val_data["masks"].get(i)
                if fov is not None:
                    fov = _resize_to(fov, mm.shape)
                cv = _cv_map(mm, sm, fov)
                im = _panel(axes[c], cv, f"{kind} CV (std/mean, FOV)",
                            cmap="jet", vmin=0, vmax=cv_vmax[kind])
                fig.colorbar(im, ax=axes[c], fraction=0.046); c += 1
        if i in dep_means and i in means["DB"]:
            a, b = means["DB"][i][0, 0], dep_means[i][0, 0]
            hw = (min(a.shape[0], b.shape[0]), min(a.shape[1], b.shape[1]))
            diff = a[: hw[0], : hw[1]] - b[: hw[0], : hw[1]]
            im = _panel(axes[c], diff, "indep - dep mean", cmap="seismic", vmin=-0.5, vmax=0.5)
            fig.colorbar(im, ax=axes[c], fraction=0.046); c += 1
        if i in val_data["targets"]:
            _panel(axes[c], val_data["targets"][i], "GT")
        else:
            axes[c].axis("off")
        fig.suptitle(f"{model} — val image {i}")
        fig.savefig(join(save_dir, f"{model}_image_{i}.png"))
        plt.close(fig)
    return len(images)


def _load_plain_segs(results_root, model):
    """Plain (non-MC) validation segmentations from the model's test run:
    {image_id: (H, W) float}. Falls back to the training run's copy."""
    for stats in ("test_statistics", "statistics"):
        d = join(results_root, model, stats, "val_images", "tensors")
        segs = extract_tensors(d, "segmentation.pt")
        if segs:
            return {i: np.asarray(t).reshape(t.shape[-2:]) for i, t in segs.items()}
    return {}


def render_mse_panels(models, results_root, val_data, save_dir):
    """The notebook's 'MSE over Base model' section (Evaluate_Tensors.ipynb
    cells 92-96): select the val image with the highest base-model plain-seg
    MSE vs ground truth, then render per-pixel squared-error maps vs GT for
    every model's plain segmentation, DB mean, and ROT mean."""
    targets = val_data["targets"]
    if not targets:
        return 0
    base = next((m for m in models if _load_plain_segs(results_root, m)), None)
    if base is None:
        return 0
    base_segs = _load_plain_segs(results_root, base)

    def gt_for(i, hw):
        return _resize_to(targets[i], hw) / 255.0

    # worst image by base-model MSE (notebook cell 94 uses BM-1; we use the
    # first model with plain segs so partial matrices still render)
    cur_i, real_max = None, -1.0
    for i, seg in base_segs.items():
        if i not in targets:
            continue
        mse = float(np.mean((seg - gt_for(i, seg.shape)) ** 2))
        if mse > real_max:
            cur_i, real_max = i, mse
    if cur_i is None:
        return 0

    os.makedirs(save_dir, exist_ok=True)
    rendered = 0
    for model in models:
        panels = []
        segs = _load_plain_segs(results_root, model)
        if cur_i in segs:
            panels.append(("plain seg", segs[cur_i]))
        db = extract_tensors(
            join(results_root, model, "dropblock_uncertainty", "tensors"), "mean.pt"
        )
        if cur_i in db:
            panels.append(("DB mean", db[cur_i][0, 0]))
        rot = extract_tensors(
            join(results_root, model, "rotation_uncertainty"), "mean.pt"
        )
        if cur_i in rot:
            panels.append(("ROT mean", rot[cur_i][0, 0]))
        if not panels:
            continue
        fig, axes = plt.subplots(1, len(panels), figsize=(4 * len(panels), 4.2),
                                 tight_layout=True, squeeze=False)
        for ax, (name, seg) in zip(axes[0], panels):
            err = (np.asarray(seg, np.float32) - gt_for(cur_i, seg.shape)) ** 2
            im = _panel(ax, err, f"{name} sq-err", cmap="jet", vmin=0, vmax=1)
            fig.colorbar(im, ax=ax, fraction=0.046)
        fig.suptitle(f"{model} — MSE map vs GT, val image {cur_i} "
                     f"(worst for {base}: {real_max:.4f})")
        fig.savefig(join(save_dir, f"MSE_Plot_{model}.png"))
        plt.close(fig)
        rendered += 1
    return rendered


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-results_root", dest="results_root", required=True)
    parser.add_argument("-aug_root", dest="aug_root", required=True)
    parser.add_argument("-save_path", dest="save_path", required=True)
    parser.add_argument("-models", dest="models", default=",".join(MODELS))
    args, _ = parser.parse_known_args(argv)

    val_data = _load_val_images(args.aug_root)
    total = 0
    model_list = [m for m in args.models.split(",") if m]
    for model in model_list:
        total += render_model(model, args.results_root, val_data, args.save_path)
    total += render_mse_panels(model_list, args.results_root, val_data, args.save_path)
    print(f"rendered {total} panels to {args.save_path}")
    return args.save_path


if __name__ == "__main__":
    main()
