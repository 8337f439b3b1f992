"""Eval metrics + the final_test_metrics harness.

Reimplements reference unet_code/utils/utils_metrics.py: FOV-masked
F1/AUROC/accuracy per validation image into metrics.csv, loss artifacts, and
the per-image example/contour/overlap visualizations, preserving the output
directory contract downstream density scripts hard-code
(create_density_STD.py:384-396):

    save_path/
      losses/{train_losses.txt, validation_losses.txt, loss_profile.png}
      test_images/{segmentations/{id}.png, examples/test_example_{id}.png}
      val_images/{examples/val_image_{id}/..., tensors/image_{id-1}/
                  segmentation.pt, metrics.csv}

Deviation (documented): the reference writes only the LAST epoch's losses to
the txt files because PL's logged_metrics holds final values
(utils_metrics.py:33-50); we write the full per-epoch history in the same
newline-separated format — a strict superset.
"""

from __future__ import annotations

import os
from os.path import join
from typing import Optional

import numpy as np
import pandas as pd
import sklearn.metrics as skmetrics

from unet_research_tpu.evaluation import artifacts


def get_accuracy_metrics(seg: np.ndarray, gt: np.ndarray, mask: np.ndarray):
    """(f1_vessel, auroc, accuracy) over FOV pixels only.

    Parity with reference utils_metrics.py:157-173: the mask is truncated to
    integers (torch .long()), nonzero selects the field of view; gt is also
    integer-truncated; F1/accuracy use the 0.5-rounded segmentation, AUROC
    the raw scores.
    """
    sel = mask.astype(np.int64) != 0
    y_true = gt.astype(np.int64)[sel]
    y_score = seg[sel]
    y_pred = np.round(y_score)
    f1 = skmetrics.f1_score(y_true=y_true, y_pred=y_pred)
    auroc = skmetrics.roc_auc_score(y_true=y_true, y_score=y_score)
    accu = skmetrics.accuracy_score(y_true=y_true, y_pred=y_pred)
    return f1, auroc, accu


def dice_score(seg: np.ndarray, gt: np.ndarray, mask: np.ndarray) -> float:
    """Dice of the thresholded segmentation inside the FOV (the parity gate
    metric; equals F1 of the vessel class)."""
    sel = mask.astype(np.int64) != 0
    pred = np.round(seg[sel])
    true = gt.astype(np.int64)[sel]
    inter = float((pred * true).sum())
    denom = float(pred.sum() + true.sum())
    return 2.0 * inter / denom if denom else 1.0


def final_test_metrics(
    predict,
    val_ds,
    test_ds,
    save_path: str,
    history: Optional[dict] = None,
    disable_test: bool = False,
) -> pd.DataFrame:
    """The reference's post-training harness (utils_metrics.py:16-150).

    `predict(ds)` must yield (idx, seg, im, gt, mask) numpy NHWC batches of
    size 1 (Trainer.predict or an uncertainty engine in evaluate mode).
    Returns the metrics DataFrame (also written to val_images/metrics.csv).
    """
    loss_folder = join(save_path, "losses")
    test_folder = join(save_path, "test_images")
    val_folder = join(save_path, "val_images")
    for d in (loss_folder, test_folder, val_folder):
        os.makedirs(d, exist_ok=True)

    history = history or {}
    train_losses = history.get("train_loss_epoch", [])
    val_losses = history.get("val_loss_epoch", [])
    artifacts.save_losses_as_text(train_losses, val_losses, loss_folder)
    artifacts.save_loss_profile(train_losses, val_losses, loss_folder)
    print("Saved Losses")

    if not disable_test:
        test_segs = join(test_folder, "segmentations")
        test_examples = join(test_folder, "examples")
        os.makedirs(test_segs, exist_ok=True)
        os.makedirs(test_examples, exist_ok=True)
        for im_id, seg, im, _, mask in predict(test_ds):
            im_id += 1
            artifacts.save_test_example(im[0], seg[0], im_id, test_examples)
            artifacts.save_segmentation(seg[0], im_id, test_segs)
        print("Saved Test Data")

    val_examples = join(val_folder, "examples")
    val_tensors = join(val_folder, "tensors")
    os.makedirs(val_examples, exist_ok=True)
    os.makedirs(val_tensors, exist_ok=True)

    scores = {"Validation_Image": [], "F1_Vessel": [], "AUROC_Vessel": [], "Accuracy_Vessel": []}
    for im_id, seg, im, gt, mask in predict(val_ds):
        seg0, im0, gt0, mask0 = seg[0], im[0], gt[0], mask[0]
        im_id += 1
        im_folder = join(val_examples, f"val_image_{im_id}")
        os.makedirs(im_folder, exist_ok=True)
        tensor_folder = join(val_tensors, f"image_{im_id - 1}")
        os.makedirs(tensor_folder, exist_ok=True)

        artifacts.save_val_example(im0, seg0, gt0, im_id, im_folder)
        artifacts.save_contour_map(seg0, gt0, im_folder)
        artifacts.save_overlap_map(seg0, gt0, im_folder)
        artifacts.save_tensor(seg0, join(tensor_folder, "segmentation.pt"))

        f1, auroc, accu = get_accuracy_metrics(seg0, gt0, mask0)
        scores["Validation_Image"].append(im_id)
        scores["F1_Vessel"].append(f1)
        scores["AUROC_Vessel"].append(auroc)
        scores["Accuracy_Vessel"].append(accu)
    print("Saved Val Data")

    df = pd.DataFrame(scores)
    df.to_csv(join(val_folder, "metrics.csv"), index=False)
    print("Saved All Metrics")
    return df
