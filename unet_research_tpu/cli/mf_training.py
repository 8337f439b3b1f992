"""Multi-fidelity training CLI: UNI / RAT / RSZ-RAT policies.

One entry point replaces the reference's three forked scripts
(multi-fidelity/MF-training-{UNI,RAT,RSZ-RAT}.py — identical except for the
size-plan ratios and degrade-in-place behavior, SURVEY.md §2.4). All MF
scripts use the independent-channel dropblock (MF-training-UNI.py:244) and
an UNSHUFFLED train loader so batch_idx indexes the per-image size plan
(MF-training-UNI.py:227).

Usage:
  python -m unet_research_tpu.cli.mf_training -policy uni -mode train \
      -data_path AUG -save_path OUT -orig_train_size 14 -num_augmentations 36
"""

from __future__ import annotations

import argparse
import os
from os.path import join

import numpy as np

from unet_research_tpu.cli import common
from unet_research_tpu.evaluation.metrics import final_test_metrics
from unet_research_tpu.train import POLICIES, Trainer, TrainerConfig, make_size_plan
from unet_research_tpu.train.checkpoint import load_checkpoint
from unet_research_tpu.utils.general import create_dir, seed_everything


def make_trainer(args, remat: bool = True) -> Trainer:
    remat = remat and str(getattr(args, "remat", "true")).lower() != "false"
    model = common.build_unet(
        args, dropblock_kind="independent", use_scheduler=True, remat=remat
    )
    tcfg = TrainerConfig(
        max_epochs=args.max_epochs or args.num_epochs,
        lr=args.lr,
        momentum=args.momentum,
        clip_norm=args.gradient_clip_val,
        auto_lr_find=str(args.auto_lr_find).lower() != "false",
        check_val_every_n_epoch=args.check_val_every_n_epoch,
        train_batch=args.train_batch,
        val_batch=args.val_batch,
        seed=args.seed,
        profiler=args.profiler,
        detect_anomaly=args.detect_anomaly,
    )
    return Trainer(
        model, POLICIES[args.policy], tcfg, mesh=common.make_mesh_if_requested(args)
    )


def training(args) -> str:
    if args.seed != -1:
        seed_everything(args.seed)
    dest = create_dir(args.save_path)
    if dest is None:
        raise SystemExit(1)
    train_ds, val_ds, test_ds = common.load_datasets(args.data_path)

    plan_rng = np.random.default_rng(args.seed if args.seed != -1 else None)
    size_plan = make_size_plan(
        args.policy, args.orig_train_size, args.num_augmentations, plan_rng
    )
    if len(size_plan) != len(train_ds):
        print(
            f"[mf_training] size plan covers {len(size_plan)} items but train set"
            f" has {len(train_ds)}; plan will be cycled/truncated like batch_idx"
        )
        reps = -(-len(train_ds) // len(size_plan))
        size_plan = np.tile(size_plan, reps)[: len(train_ds)]

    trainer = make_trainer(args)
    model_info = join(dest, "model_info")
    os.makedirs(model_info)
    state, history, keeper = trainer.fit(train_ds, val_ds, model_info, size_plan=size_plan)

    params, _, _ = load_checkpoint(keeper.best_path, trainer.init_params(seed=0))
    statistics = join(dest, "statistics")
    os.makedirs(statistics)
    final_test_metrics(
        lambda ds: trainer.predict(params, ds), val_ds, test_ds, statistics, history
    )
    return dest


def testing(args) -> str:
    if args.seed != -1:
        seed_everything(args.seed)
    stats = create_dir(args.save_path)
    if stats is None:
        raise SystemExit(1)
    _, val_ds, test_ds = common.load_datasets(args.data_path, with_train=False)
    trainer = make_trainer(args, remat=False)
    params, _, _ = load_checkpoint(args.model_path, trainer.init_params(seed=0))
    final_test_metrics(lambda ds: trainer.predict(params, ds), val_ds, test_ds, stats)
    return stats


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    common.add_common_train_args(parser)
    parser.add_argument("-policy", dest="policy", choices=["uni", "rat", "rsz-rat"], default="uni")
    parser.add_argument("-orig_train_size", dest="orig_train_size", type=int, default=14,
                        help="number of original (pre-augmentation) train images")
    parser.add_argument("-num_augmentations", dest="num_augmentations", type=int, default=36)
    common.add_arch_args(parser)
    common.add_trainer_args(parser)
    return parser


def main(argv=None):
    args = common.parse_with_passthrough(build_parser(), argv)
    if args.mode == "train":
        return training(args)
    elif args.mode == "test":
        return testing(args)
    raise SystemExit(f"unknown mode {args.mode}")


if __name__ == "__main__":
    main()
