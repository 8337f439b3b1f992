"""Offline density analysis of saved uncertainty tensors.

Consolidates the reference's three near-identical analysis scripts
(create_density_STD.py / create_density_CV.py / create_density_DID.py,
~530 LoC each) into one module:

- extract_tensors: read the tensors/image_{i}/{mean,std}.pt dumps
  (create_density_STD.py:49-66);
- std_density / std_single_density: Gaussian-KDE overlays of per-pixel STD
  across model groups (create_density_STD.py:399-430,:433-523), bandwidth =
  range/num_steps, threshold 0.01;
- cv_density: KDE of the coefficient of variation std/mean over FOV pixels
  (create_density_CV.py);
- dependent-vs-independent overlays (create_density_DID.py) fall out of the
  same primitives by passing both tensor sets;
- calculate_magnitudes: the per-model/per-image STD summary table
  (create_density_STD.py:99-138);
- CV / dilated / inverse-dilated histograms (create_density_STD.py:172-311):
  vessel-eroded target regions via cv2.erode with a 3x3 kernel.

The directory layout consumed is exactly what our CLIs (and the reference)
write: <root>/<model>/statistics/val_images/metrics.csv,
<root>/<model>/dropblock_uncertainty/tensors/image_{i}/{mean,std}.pt and
<root>/<model>/rotation_uncertainty/image_{i}/{mean,std}.pt.
"""

from __future__ import annotations

import os
from os.path import exists, join

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
from sklearn.neighbors import KernelDensity

MODELS = "BM-1 BM-2 BM-3 MF-1 MF-2 MF-3 LF-1 LF-3 LF-5 LF-2 LF-4 LF-6".split()
GROUPS = {
    "All Model": MODELS,
    "Base Model": ["BM-1", "BM-2", "BM-3"],
    "Multi Fidelity Model": ["MF-1", "MF-2", "MF-3"],
    "LF HFT Model": ["LF-1", "LF-3", "LF-5"],
    "LF LFT Model": ["LF-2", "LF-4", "LF-6"],
}
COLORSCHEME = {
    "BM-1": "tab:blue", "BM-2": "tab:blue", "BM-3": "tab:blue",
    "LF-1": "tab:orange", "LF-3": "tab:orange", "LF-5": "tab:orange",
    "LF-2": "tab:green", "LF-4": "tab:green", "LF-6": "tab:green",
    "MF-1": "tab:red", "MF-2": "tab:red", "MF-3": "tab:red",
}
MARKERSCHEME = {
    "BM-1": "-", "BM-2": ":", "BM-3": "--", "LF-1": "-.", "LF-3": ":",
    "LF-5": "--", "LF-2": "-", "LF-4": ":", "LF-6": "--", "MF-1": "-",
    "MF-2": ":", "MF-3": "--",
}
IM_COLORS = {i: c for i, c in enumerate(
    ["tab:blue", "tab:orange", "tab:green", "tab:red", "tab:purple", "tab:brown"])}


def extract_tensors(path: str, tensor_name: str) -> dict[int, np.ndarray]:
    """Load {image_i -> tensor} numpy arrays from an uncertainty output dir."""
    import torch

    out = {}
    if not exists(path):
        return out
    for sub in os.listdir(path):
        if sub.startswith("image"):
            tp = join(path, sub, tensor_name)
            if exists(tp):
                out[int(sub.split("_")[-1])] = torch.load(tp, map_location="cpu").numpy()
    return out


def _kde_curve(data: np.ndarray, rnge, num_steps: int):
    bandwidth = (rnge[1] - rnge[0]) / num_steps
    kde = KernelDensity(kernel="gaussian", bandwidth=bandwidth).fit(data[:, None])
    xs = np.linspace(rnge[0], rnge[1], num_steps)
    return xs, np.exp(kde.score_samples(xs[:, None]))


def std_density(models, std_data, threshold, rnge, num_steps, figname,
                xlabel, ylabel, save_path):
    """Overlay per-model KDE curves of thresholded per-pixel STDs."""
    fig, ax = plt.subplots(1, 1, figsize=(15, 10))
    for model in models:
        if model not in std_data or not std_data[model]:
            continue
        data = np.concatenate([v.flatten() for v in std_data[model].values()])
        data = data[data > threshold]
        if data.size < 2:
            continue
        xs, dens = _kde_curve(data, rnge, num_steps)
        ax.plot(xs, dens, MARKERSCHEME.get(model, "-"),
                c=COLORSCHEME.get(model), label=model, alpha=0.6, linewidth=1.5)
    ax.legend(ncol=4, frameon=False)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    fig.suptitle(figname)
    os.makedirs(save_path, exist_ok=True)
    fig.savefig(join(save_path, f"{'_'.join(figname.split(' '))}.png"))
    plt.close(fig)


def std_single_density(model, std_data, threshold, rnge, num_steps, figname,
                       xlabel, ylabel, save_path):
    """Per-image KDE curves for one model (create_density_STD.py:489-523)."""
    fig, ax = plt.subplots(1, 1, figsize=(15, 10))
    for im, data in sorted(std_data.get(model, {}).items()):
        data = data.flatten()
        data = data[data > threshold]
        if data.size < 2:
            continue
        xs, dens = _kde_curve(data, rnge, num_steps)
        ax.plot(xs, dens, c=IM_COLORS.get(im % 6), label=im, alpha=0.6, linewidth=1.5)
    ax.legend(ncol=2, frameon=False)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    fig.suptitle(figname)
    os.makedirs(save_path, exist_ok=True)
    fig.savefig(join(save_path, f"{'_'.join(figname.split(' '))}.png"))
    plt.close(fig)


def _fov_values(arr2d: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Values inside the FOV, with the mask resized to the tensor resolution
    (uncertainty runs may be at a resize)."""
    import cv2

    m = mask
    if m.shape != arr2d.shape:
        m = cv2.resize(m.astype(np.uint8), (arr2d.shape[1], arr2d.shape[0]),
                       interpolation=cv2.INTER_NEAREST)
    return arr2d[m > 0]


def cv_density(models, std_data, mean_data, masks, rnge, num_steps, figname,
               save_path):
    """KDE of coefficient of variation std/mean over FOV pixels
    (create_density_CV.py cv_density)."""
    fig, ax = plt.subplots(1, 1, figsize=(15, 10))
    for model in models:
        if model not in std_data or not std_data[model]:
            continue
        cvs = []
        for i, std in std_data[model].items():
            if i not in mean_data.get(model, {}):
                continue
            s = std[0, 0]
            m = mean_data[model][i][0, 0]
            if masks and i in masks:
                s = _fov_values(s, masks[i])
                m = _fov_values(m, masks[i])
            with np.errstate(divide="ignore", invalid="ignore"):
                cv = s / m
            cvs.append(cv[np.isfinite(cv)])
        if not cvs:
            continue
        data = np.concatenate(cvs)
        data = data[(data >= rnge[0]) & (data <= rnge[1])]
        if data.size < 2:
            continue
        xs, dens = _kde_curve(data, rnge, num_steps)
        ax.plot(xs, dens, MARKERSCHEME.get(model, "-"),
                c=COLORSCHEME.get(model), label=model, alpha=0.6, linewidth=1.5)
    ax.legend(ncol=4, frameon=False)
    ax.set_xlabel("CV")
    ax.set_ylabel("Density")
    fig.suptitle(figname)
    os.makedirs(save_path, exist_ok=True)
    fig.savefig(join(save_path, f"{'_'.join(figname.split(' '))}.png"))
    plt.close(fig)


def calculate_magnitudes(std_dicts: dict) -> pd.DataFrame:
    """Per-model/per-image STD summary stats (create_density_STD.py:99-138)."""
    rows = []
    for model_name, model_dict in std_dicts.items():
        for im_num, t in model_dict.items():
            flat = t.flatten()
            row = {
                "model_name": model_name, "im_num": im_num,
                "min": float(flat.min()), "max": float(flat.max()),
                "mean": float(flat.mean()), "std": float(flat.std(ddof=1)),
            }
            for thr in (0.01, 0.001, 0.0):
                sel = flat[flat > thr]
                row[f"mean_thresholded_{thr:g}"] = float(sel.mean()) if sel.size else float("nan")
                row[f"std_thresholded_{thr:g}"] = float(sel.std(ddof=1)) if sel.size > 1 else float("nan")
            rows.append(row)
    return pd.DataFrame(rows)


def _dilated_region(shape_hw, target: np.ndarray, inverse: bool,
                    mask: np.ndarray | None) -> np.ndarray:
    """Boolean selector for the (inverse-)dilated vessel region
    (create_density_STD.py:212-311): the reference erodes the INVERTED
    target with a 3x3 kernel, keeping pixels where the eroded map is 0
    (np.ma masks nonzero); the inverse battery keeps the FOV background
    instead (inv = 1 - mask*dilated, keep where 0)."""
    import cv2

    t = target
    if t.shape != shape_hw:
        t = cv2.resize(t, (shape_hw[1], shape_hw[0]), interpolation=cv2.INTER_NEAREST)
    inv_target = (255 - t).astype(np.uint8)
    dilated = cv2.erode(inv_target, np.ones((3, 3), np.uint8))
    if inverse:
        m = mask
        if m is None:
            m = np.ones(shape_hw, np.uint8)
        elif m.shape != shape_hw:
            m = cv2.resize(m, (shape_hw[1], shape_hw[0]), interpolation=cv2.INTER_NEAREST)
        return (m > 0) & (dilated > 0)
    return dilated == 0


def dilated_hist(std_map: np.ndarray, target: np.ndarray, save_to: str, title: str,
                 rnge=(0, 0.5), inverse=False, mask: np.ndarray | None = None):
    """Single-image STD histogram over the (inverse-)dilated vessel region."""
    sel = _dilated_region(std_map.shape, target, inverse, mask)
    data = std_map[sel]
    fig, ax = plt.subplots(1, 1)
    ax.hist(data, bins="auto", range=rnge, density=True)
    fig.suptitle(title)
    fig.savefig(save_to)
    plt.close(fig)


def _save_hist(data: np.ndarray, rnge, title: str, save_to: str):
    fig, ax = plt.subplots(1, 1)
    ax.hist(data, bins="auto", range=rnge, density=True)
    fig.suptitle(title)
    fig.savefig(save_to)
    plt.close(fig)


def hist_battery(models, std_data, mean_data, targets, masks, save_path) -> None:
    """The reference's per-model aggregate histogram battery
    (create_density_STD.py:172-311): FOV-masked CV histogram
    (display_agg_CV_hist), dilated-vessel STD/CV histograms
    (dilated_agg_std_hist / dilated_agg_cv_hist), and the inverse-dilated
    (FOV background) variants. One filename per plot — the reference's
    inverse variants overwrote the dilated ones ('STD_Dilated_Histogram',
    create_density_STD.py:296), which we keep distinct as
    'STD_InvDilated_Histogram' etc."""
    os.makedirs(save_path, exist_ok=True)
    for model in models:
        stds = std_data.get(model) or {}
        means = mean_data.get(model) or {}
        if not stds:
            continue

        # FOV-masked CV histogram (display_agg_CV_hist)
        cv_chunks = []
        for i, std in stds.items():
            if i not in means or not masks or i not in masks:
                continue
            s = _fov_values(std[0, 0], masks[i])
            m = _fov_values(means[i][0, 0], masks[i])
            with np.errstate(divide="ignore", invalid="ignore"):
                cv = s / m
            cv_chunks.append(cv[~np.isnan(cv)])
        if cv_chunks:
            _save_hist(np.concatenate(cv_chunks), (0, 5), f"{model} DB CV",
                       join(save_path, f"CV_Histogram_{model}.png"))

        if not targets:
            continue
        for inverse, tag in ((False, "Dilated"), (True, "InvDilated")):
            std_chunks, cvn_chunks, cvd_chunks = [], [], []
            for i, std in stds.items():
                if i not in targets:
                    continue
                s2d = std[0, 0]
                sel = _dilated_region(s2d.shape, targets[i], inverse,
                                      masks.get(i) if masks else None)
                std_chunks.append(s2d[sel])
                if i in means:
                    cvn_chunks.append(s2d[sel])
                    cvd_chunks.append(means[i][0, 0][sel])
            if std_chunks:
                _save_hist(np.concatenate(std_chunks), (0, 0.5),
                           f"{model} {tag} STD",
                           join(save_path, f"STD_{tag}_Histogram_{model}.png"))
            if cvd_chunks:
                num = np.concatenate(cvn_chunks)
                den = np.concatenate(cvd_chunks)
                # zero-mean guard (dilated_agg_cv_hist: both -> 1e-8)
                num = np.where(den == 0, 1e-8, num)
                den = np.where(den == 0, 1e-8, den)
                _save_hist(num / den, (0, 5), f"{model} {tag} CV",
                           join(save_path, f"CV_{tag}_Histogram_{model}.png"))


def load_matrix_tensors(results_root: str, models=MODELS):
    """Gather all models' mean/std tensors + metrics (the reference's data-
    loading block, create_density_STD.py:371-396)."""
    out = {
        "metrics": pd.DataFrame(), "mean_db": {}, "std_db": {},
        "mean_rot": {}, "std_rot": {}, "seg": {},
    }
    frames = []
    for model in models:
        path = join(results_root, model)
        mcsv = join(path, "statistics", "val_images", "metrics.csv")
        if exists(mcsv):
            df = pd.read_csv(mcsv)
            df["name"] = model
            frames.append(df)
        dbcsv = join(path, "dropblock_uncertainty", "statistics", "val_images", "metrics.csv")
        if exists(dbcsv):
            df = pd.read_csv(dbcsv)
            df["name"] = f"{model}_DB"
            frames.append(df)
        out["mean_db"][model] = extract_tensors(join(path, "dropblock_uncertainty", "tensors"), "mean.pt")
        out["std_db"][model] = extract_tensors(join(path, "dropblock_uncertainty", "tensors"), "std.pt")
        out["mean_rot"][model] = extract_tensors(join(path, "rotation_uncertainty"), "mean.pt")
        out["std_rot"][model] = extract_tensors(join(path, "rotation_uncertainty"), "std.pt")
        # dependent-variant run (create_density_DID's comparison set), when a
        # second dropblock run without -independent_drop was saved alongside
        out.setdefault("mean_db_dep", {})[model] = extract_tensors(
            join(path, "dropblock_uncertainty_dep", "tensors"), "mean.pt"
        )
        out.setdefault("std_db_dep", {})[model] = extract_tensors(
            join(path, "dropblock_uncertainty_dep", "tensors"), "std.pt"
        )
    if frames:
        out["metrics"] = pd.concat(frames)
    return out


def create_density_report(results_root: str, save_path: str, aug_root: str | None = None,
                          models=MODELS, kinds=("std", "cv", "hist")) -> None:
    """Render the full plot battery the reference's qsub'd density jobs
    produce (create_density.py:3-5): grouped STD KDEs for DB + ROT,
    per-model single densities, magnitude table, CV densities, and (with
    aug_root) the masked/dilated/inverse-dilated histogram battery."""
    data = load_matrix_tensors(results_root, models)
    masks = {}
    targets = {}
    if aug_root:
        from PIL import Image

        mask_dir = join(aug_root, "val", "masks")
        if exists(mask_dir):
            for f in os.listdir(mask_dir):
                masks[int(f.split("_")[0])] = np.array(Image.open(join(mask_dir, f)).convert("L"))
        target_dir = join(aug_root, "val", "targets")
        if exists(target_dir):
            for f in os.listdir(target_dir):
                targets[int(f.split("_")[0])] = np.array(Image.open(join(target_dir, f)).convert("L"))

    all_dir = join(save_path, "All_Models")
    single_dir = join(save_path, "Single_Models")
    os.makedirs(all_dir, exist_ok=True)
    os.makedirs(single_dir, exist_ok=True)

    if "std" in kinds:
        for group_name, group in GROUPS.items():
            std_density(group, data["std_db"], 0.01, (0, 0.5), 1000,
                        f"{group_name} DB STD", "STD", "Density", all_dir)
            std_density(group, data["std_rot"], 0.01, (0, 0.3), 1000,
                        f"{group_name} ROT STD", "STD", "Density", all_dir)
        for model in models:
            if data["std_db"].get(model):
                std_single_density(model, data["std_db"], 0.01, (0, 0.5), 250,
                                   f"{model} DB STD", "STD", "Density", single_dir)
            if data["std_rot"].get(model):
                std_single_density(model, data["std_rot"], 0.01, (0, 0.3), 250,
                                   f"{model} ROT STD", "STD", "Density", single_dir)
        mags = calculate_magnitudes({m: d for m, d in data["std_db"].items() if d})
        mags.to_csv(join(save_path, "std_magnitudes_db.csv"), index=False)
        mags_rot = calculate_magnitudes({m: d for m, d in data["std_rot"].items() if d})
        mags_rot.to_csv(join(save_path, "std_magnitudes_rot.csv"), index=False)

    if "cv" in kinds:
        for group_name, group in GROUPS.items():
            cv_density(group, data["std_db"], data["mean_db"], masks, (0, 5), 1000,
                       f"{group_name} DB CV", all_dir)
            cv_density(group, data["std_rot"], data["mean_rot"], masks, (0, 5), 1000,
                       f"{group_name} ROT CV", all_dir)

    if "hist" in kinds:
        hist_battery(models, data["std_db"], data["mean_db"], targets, masks,
                     join(save_path, "Histograms"))

    if "did" in kinds:
        # dependent-vs-independent overlays (create_density_DID.py): for each
        # model with both dropblock runs, overlay the two STD KDEs
        for model in models:
            indep = data["std_db"].get(model, {})
            dep = data.get("std_db_dep", {}).get(model, {})
            if not indep or not dep:
                continue
            fig, ax = plt.subplots(1, 1, figsize=(15, 10))
            for label, d, style in (("independent", indep, "-"), ("dependent", dep, "--")):
                vals = np.concatenate([v.flatten() for v in d.values()])
                vals = vals[vals > 0.01]
                if vals.size < 2:
                    continue
                xs, dens = _kde_curve(vals, (0, 0.5), 1000)
                ax.plot(xs, dens, style, label=label, alpha=0.7, linewidth=1.5)
            ax.legend(frameon=False)
            ax.set_xlabel("STD")
            ax.set_ylabel("Density")
            fig.suptitle(f"{model} DvUD STD")
            fig.savefig(join(all_dir, f"{model}_DvUD_STD.png"))
            plt.close(fig)

    if not data["metrics"].empty:
        data["metrics"].to_csv(join(save_path, "all_metrics.csv"), index=False)
