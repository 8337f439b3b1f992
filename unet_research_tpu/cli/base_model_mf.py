"""Multi-fidelity inference sweep: evaluate a trained model at arbitrary
height x width resolutions.

The reference README documents `base_model_mf.py -height H -width W`
(README.md:139-170) but the script is absent from the tree (superseded by
the MF/LF forks — SURVEY.md §2.4). This entry point restores the
capability once, parameterized: each requested resolution gets a full
metrics pass (square-pad -> bilinear resize -> forward -> FOV-masked
F1/AUROC/accuracy at that resolution), written to save_path/{HxW}/.

-height/-width accept comma-separated lists for a sweep in one invocation:
  python -m unet_research_tpu.cli.base_model_mf -model_path CKPT \
      -data_path AUG -save_path OUT -height 32,64,128,256 -width 32,64,128,256
"""

from __future__ import annotations

import argparse
import os
from os.path import join

import jax
import numpy as np

from unet_research_tpu.cli import common
from unet_research_tpu.data.loading import batch_iterator
from unet_research_tpu.evaluation.metrics import final_test_metrics
from unet_research_tpu.ops.image import resize_bilinear, square_pad
from unet_research_tpu.train.checkpoint import load_checkpoint
from unet_research_tpu.utils.general import create_dir, seed_everything
from unet_research_tpu.models.unet import as_variables


def evaluate_at(model, params, val_ds, test_ds, h: int, w: int, out_dir: str):
    @jax.jit
    def predict_step(params, im, gt, mask):
        im = resize_bilinear(square_pad(im), (h, w))
        gt = resize_bilinear(square_pad(gt), (h, w))
        mask = resize_bilinear(square_pad(mask), (h, w))
        seg = model.apply(as_variables(params), im)
        return seg * mask, im, gt, mask

    def predict(ds):
        for i, (im, gt, mask) in enumerate(batch_iterator(ds, 1, False)):
            seg, im2, gt2, mask2 = jax.device_get(predict_step(params, im, gt, mask))
            yield i, seg, im2, gt2, mask2

    os.makedirs(out_dir, exist_ok=True)
    return final_test_metrics(predict, val_ds, test_ds, out_dir)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-model_path", dest="model_path", required=True)
    parser.add_argument("-data_path", dest="data_path", required=True)
    parser.add_argument("-save_path", dest="save_path", required=True)
    parser.add_argument("-height", dest="height", type=str, default="256")
    parser.add_argument("-width", dest="width", type=str, default="256")
    parser.add_argument("-seed", dest="seed", type=int, default=-1)
    parser.add_argument("-block_size", dest="block_size", type=int, default=7)
    parser.add_argument("-max_drop_prob", dest="max_drop_prob", type=float, default=0.15)
    parser.add_argument("-dropblock_steps", dest="dropblock_steps", type=int, default=1500)
    common.add_arch_args(parser)
    common.add_trainer_args(parser)
    args = common.parse_with_passthrough(parser, argv)

    if args.seed != -1:
        seed_everything(args.seed)
    dest = create_dir(args.save_path)
    if dest is None:
        raise SystemExit(1)

    heights = [int(x) for x in str(args.height).split(",")]
    widths = [int(x) for x in str(args.width).split(",")]
    if len(widths) == 1:
        widths = widths * len(heights)
    assert len(heights) == len(widths), "-height/-width sweep lengths differ"

    _, val_ds, test_ds = common.load_datasets(args.data_path, with_train=False)
    model = common.build_unet(args, dropblock_kind=None, use_scheduler=False)
    template = model.init(jax.random.PRNGKey(0), np.zeros((1, 32, 32, 1), np.float32))["params"]
    params, _, _ = load_checkpoint(args.model_path, template)

    for h, w in zip(heights, widths):
        out = join(dest, f"{h}x{w}")
        df = evaluate_at(model, params, val_ds, test_ds, h, w, out)
        print(f"{h}x{w}: mean F1 {df['F1_Vessel'].mean():.4f}")
    return dest


if __name__ == "__main__":
    main()
