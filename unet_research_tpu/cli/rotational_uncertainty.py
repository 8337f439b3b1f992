"""Rotational-TTA uncertainty CLI (reference
uncertainty_tests/Rotational_Uncertainty.py).

Per validation image: a 359-member rotate -> forward -> unrotate ensemble
(num_iterations hardcoded to 359 at load time in the reference,
Rotational_Uncertainty.py:127), computed as chunked vmapped device batches.
Saves image_{i}/{mean,std,tensors}.pt directly under the stats dir
(Rotational_Uncertainty.py:136-144 — note: unlike the dropblock CLI, no
tensors/ nesting). No dropblock is configured (the model runs in eval mode).

Usage:
  python -m unet_research_tpu.cli.rotational_uncertainty -model_path CKPT \
      -data_path AUG -save_path OUT [-resize 256] [-save_num 25]
"""

from __future__ import annotations

import argparse
import os
from os.path import join

import jax
import numpy as np

from unet_research_tpu.cli import common
from unet_research_tpu.data.loading import batch_iterator
from unet_research_tpu.evaluation import artifacts
from unet_research_tpu.train.checkpoint import load_checkpoint
from unet_research_tpu.uncertainty import RotationalEngine
from unet_research_tpu.utils.general import create_dir, seed_everything


def test_uncertainty(args) -> str:
    if args.seed != -1:
        seed_everything(args.seed)
    stats = create_dir(args.save_path)
    if stats is None:
        raise SystemExit(1)
    os.symlink(os.path.abspath(args.model_path), join(stats, "model_ckpt_symlink.ckpt"))

    _, val_ds, _ = common.load_datasets(args.data_path, with_train=False)

    model = common.build_unet(args, dropblock_kind=None, use_scheduler=False)
    template = model.init(jax.random.PRNGKey(0), np.zeros((1, 32, 32, 1), np.float32))["params"]
    params, _, _ = load_checkpoint(args.model_path, template)

    engine = RotationalEngine(
        model,
        num_iterations=args.num_iterations,
        return_num=args.save_num,
        resize=args.resize,
        chunk=args.chunk,
        warp=args.warp,
    )

    for i, (im, gt, mask) in enumerate(batch_iterator(val_ds, 1, False)):
        mean, std, saved, *_ = engine.predict(params, im, gt, mask)
        im_dir = join(stats, f"image_{i}")
        os.makedirs(im_dir)
        mean, std, saved = jax.device_get((mean, std, saved))
        artifacts.save_tensor_batched(mean, join(im_dir, "mean.pt"))
        artifacts.save_tensor_batched(std, join(im_dir, "std.pt"))
        artifacts.save_stacked_tensors(saved, join(im_dir, "tensors.pt"))
        print(f"saved rotational tensors for image {i}")
    return stats


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("-model_path", dest="model_path", required=True, type=str)
    parser.add_argument("-data_path", dest="data_path", required=True)
    parser.add_argument("-save_path", dest="save_path", required=True)
    parser.add_argument("-save_num", dest="save_num", type=int, default=0)
    parser.add_argument("-resize", dest="resize", type=int, default=-1)
    parser.add_argument("-seed", dest="seed", type=int, default=-1)
    parser.add_argument("-num_iterations", dest="num_iterations", type=int, default=359,
                        help="rotation fan size (the reference hardcodes 359)")
    parser.add_argument("-chunk", dest="chunk", type=int, default=16)
    parser.add_argument("-warp", dest="warp", choices=("shear", "gather"), default="gather",
                        help="rotation backend: 'gather' (torchvision-bilinear "
                        "parity, the reference's interpolation) or 'shear' "
                        "(fast 3-shear fan warp, ~4.5x the passes/s; ensemble-"
                        "statistics parity pinned in tests and PERF.md)")
    parser.add_argument("-block_size", dest="block_size", type=int, default=7)
    parser.add_argument("-max_drop_prob", dest="max_drop_prob", type=float, default=0.15)
    parser.add_argument("-dropblock_steps", dest="dropblock_steps", type=int, default=1500)
    common.add_arch_args(parser)
    common.add_trainer_args(parser)
    return parser


def main(argv=None):
    args = common.parse_with_passthrough(build_parser(), argv)
    return test_uncertainty(args)


if __name__ == "__main__":
    main()
