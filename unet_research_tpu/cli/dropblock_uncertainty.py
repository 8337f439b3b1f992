"""MC-DropBlock uncertainty CLI (reference
uncertainty_tests/Dropblock_Uncertainty.py).

Phase 1 ('save'): per validation image, a num_iterations-member Monte-Carlo
DropBlock ensemble (reference default 1000) computed as chunked vmapped
device batches; saves tensors/image_{i}/{mean,std,tensors}.pt
(Dropblock_Uncertainty.py:154-165). Phase 2 ('evaluate'): the ensemble mean
is scored with final_test_metrics(disable_test=True)
(Dropblock_Uncertainty.py:167-172). Like the reference, the evaluate phase
recomputes the ensemble with fresh draws; pass -reuse_tensors to reuse the
phase-1 means instead (statistically identical, half the compute).

Usage:
  python -m unet_research_tpu.cli.dropblock_uncertainty -model_path CKPT \
      -data_path AUG -save_path OUT [-independent_drop] [-iter_num 1000]
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
from unet_research_tpu.evaluation.metrics import final_test_metrics
from unet_research_tpu.uncertainty import MCDropBlockEngine
from unet_research_tpu.utils.general import create_dir, seed_everything


def test_uncertainty(args) -> str:
    if args.seed != -1:
        seed_everything(args.seed)
    stats = create_dir(args.save_path)
    if stats is None:
        raise SystemExit(1)
    os.symlink(os.path.abspath(args.model_path), join(stats, "model_ckpt_symlink.ckpt"))

    _, val_ds, test_ds = common.load_datasets(args.data_path, with_train=False)

    model = common.build_unet(
        args,
        dropblock_kind="independent" if args.independent else "dependent",
        use_scheduler=False,
        drop_prob=args.drop_prob,
    )
    from unet_research_tpu.train.checkpoint import load_checkpoint

    template = model.init(jax.random.PRNGKey(0), np.zeros((1, 32, 32, 1), np.float32))["params"]
    params, _, _ = load_checkpoint(args.model_path, template)

    engine = MCDropBlockEngine(
        model,
        num_iterations=args.iter_num,
        return_num=args.save_num,
        resize=args.resize,
        chunk=args.chunk,
        mesh=common.make_mesh_if_requested(args),
    )
    base_key = jax.random.PRNGKey(args.seed if args.seed != -1 else 0)

    # phase 1: save tensors (Dropblock_Uncertainty.py:152-165)
    tens = join(stats, "tensors")
    os.makedirs(tens)
    means = {}
    for i, (im, gt, mask) in enumerate(batch_iterator(val_ds, 1, False)):
        key = jax.random.fold_in(base_key, i)
        mean, std, saved, *_ = engine.predict(params, im, gt, mask, key, args.drop_prob)
        im_dir = join(tens, f"image_{i}")
        os.makedirs(im_dir)
        mean, std, saved = jax.device_get((mean, std, saved))
        artifacts.save_tensor_batched(mean, join(im_dir, "mean.pt"))
        artifacts.save_tensor_batched(std, join(im_dir, "std.pt"))
        artifacts.save_stacked_tensors(saved, join(im_dir, "tensors.pt"))
        means[i] = np.asarray(mean)
        print(f"saved MC tensors for image {i}")

    # phase 2: evaluate the MC mean (Dropblock_Uncertainty.py:167-172)
    from unet_research_tpu.ops.image import resize_bilinear, square_pad

    def _resized_triple(im, gt, mask):
        if args.resize == -1:
            return im, gt, mask
        t = (args.resize, args.resize)
        return (
            resize_bilinear(square_pad(im), t),
            resize_bilinear(square_pad(gt), t),
            resize_bilinear(square_pad(mask), t),
        )

    def mc_predict(ds):
        for i, (im, gt, mask) in enumerate(batch_iterator(ds, 1, False)):
            if args.reuse_tensors and i in means:
                mean = means[i]
                im2, gt2, mask2 = jax.device_get(_resized_triple(im, gt, mask))
            else:
                key = jax.random.fold_in(base_key, 100_000 + i)
                mean, _, _, im2, gt2, mask2 = jax.device_get(
                    engine.predict(params, im, gt, mask, key, args.drop_prob)
                )
            yield i, np.asarray(mean), np.asarray(im2), np.asarray(gt2), np.asarray(mask2)

    statistics = join(stats, "statistics")
    os.makedirs(statistics)
    final_test_metrics(mc_predict, val_ds, test_ds, statistics, disable_test=True)
    return stats


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("-model_path", dest="model_path", required=True, type=str)
    parser.add_argument("-data_path", dest="data_path", required=True)
    parser.add_argument("-save_path", dest="save_path", required=True)
    parser.add_argument("-block_size", dest="block_size", type=int, default=7)
    parser.add_argument("-drop_prob", dest="drop_prob", type=float, default=0.15)
    parser.add_argument("-independent_drop", dest="independent", action="store_true")
    parser.add_argument("-iter_num", dest="iter_num", type=int, default=1000)
    parser.add_argument("-save_num", dest="save_num", type=int, default=0)
    parser.add_argument("-resize", dest="resize", type=int, default=-1)
    parser.add_argument("-seed", dest="seed", type=int, default=-1)
    parser.add_argument("-chunk", dest="chunk", type=int, default=16,
                        help="vmapped ensemble chunk size (TPU memory/perf knob)")
    parser.add_argument("-reuse_tensors", dest="reuse_tensors", action="store_true",
                        help="reuse phase-1 means in the evaluate phase")
    # the reference forwards max_drop_prob/dropblock_steps via the shared
    # surface; used only to build the module (scheduler off here)
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
