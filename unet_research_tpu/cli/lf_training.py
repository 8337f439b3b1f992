"""Low-fidelity training CLI: LFT / HFT / LFT-UP policies.

One entry point replaces the reference's three LF forks
(multi-fidelity/LF-training-{LFT,HFT,LFT-UP}.py): train at -new_size^2
(LFT: test there too; HFT: test at native res; LFT-UP: degrade down->up at
full res). All use the independent-channel dropblock and support
-train_ratio sequential truncation (LF-training-LFT.py:242-243,338).

Usage:
  python -m unet_research_tpu.cli.lf_training -policy hft -mode train \
      -data_path AUG -save_path OUT -new_size 256 [-train_ratio .3]
"""

from __future__ import annotations

import argparse
import math
import os
from os.path import join

from unet_research_tpu.cli import common
from unet_research_tpu.evaluation.metrics import final_test_metrics
from unet_research_tpu.train import Trainer, TrainerConfig
from unet_research_tpu.train.checkpoint import load_checkpoint
from unet_research_tpu.train.policies import lf_policy
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
    policy = lf_policy(args.policy, args.new_size)
    return Trainer(model, policy, tcfg, mesh=common.make_mesh_if_requested(args))


def training(args) -> str:
    if args.seed != -1:
        seed_everything(args.seed)
    dest = create_dir(args.save_path)
    if dest is None:
        raise SystemExit(1)
    train_ds, val_ds, test_ds = common.load_datasets(args.data_path)
    if args.train_ratio != 1.0:
        train_ds = train_ds.subset(math.ceil(args.train_ratio * len(train_ds)))

    trainer = make_trainer(args)
    model_info = join(dest, "model_info")
    os.makedirs(model_info)
    state, history, keeper = trainer.fit(train_ds, val_ds, model_info)

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
    parser.add_argument("-policy", dest="policy", choices=["lft", "hft", "lft-up"], default="lft")
    parser.add_argument("-new_size", dest="new_size", type=int, default=32,
                        help="square training resolution (LF-training-LFT.py:336)")
    parser.add_argument("-train_ratio", dest="train_ratio", type=float, default=1.0)
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
