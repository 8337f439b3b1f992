"""Shared CLI plumbing: the reference's public flag surface + model/data
assembly.

Every reference entry point exposes single-dash long options plus the whole
PL Trainer namespace (Trainer.add_argparse_args,
base_model_tests/training.py:239-267). We keep the documented flags verbatim
and honor the Trainer flags that map onto this stack (--gradient_clip_val,
--check_val_every_n_epoch, --max_epochs, --devices/--gpus -> data-parallel
mesh size, --precision 16/bf16 -> bfloat16 compute); everything else is
accepted and ignored with a notice, as SURVEY.md §5 prescribes.
"""

from __future__ import annotations

import argparse
from os.path import join
from typing import Optional

import jax.numpy as jnp

from unet_research_tpu.data.dataset import load_split
from unet_research_tpu.models import DropBlockConfig, UNet, canonical_config


def add_common_train_args(parser: argparse.ArgumentParser) -> None:
    """The shared reference flags (training.py:243-256)."""
    parser.add_argument("-mode", dest="mode", type=str, required=True, help="Mode: train or test")
    parser.add_argument("-model_path", dest="model_path", type=str, help="checkpoint path for -mode test")
    parser.add_argument("-data_path", dest="data_path", required=True, help="augmented data root with train/val/test splits")
    parser.add_argument("-save_path", dest="save_path", required=True, help="output folder (suffix-retried if it exists)")
    parser.add_argument("-num_epochs", dest="num_epochs", type=int, default=50)
    parser.add_argument("-train_batch", dest="train_batch", type=int, default=1)
    parser.add_argument("-val_batch", dest="val_batch", type=int, default=1)
    parser.add_argument("-lr", dest="lr", type=float, default=1e-3)
    parser.add_argument("-momentum", dest="momentum", type=float, default=0.99)
    parser.add_argument("-block_size", dest="block_size", type=int, default=7)
    parser.add_argument("-max_drop_prob", dest="max_drop_prob", type=float, default=0.15)
    parser.add_argument("-dropblock_steps", dest="dropblock_steps", type=int, default=1500)
    parser.add_argument("-seed", dest="seed", type=int, default=-1)


def add_arch_args(parser: argparse.ArgumentParser) -> None:
    """Extensions beyond the reference surface: architecture overrides
    (defaults = the canonical 31M config). Mainly for scaled-down tests and
    ablations; the reference hardcodes these (training.py:171-192)."""
    parser.add_argument("-filters", dest="filters", type=int, default=64)
    parser.add_argument("-model_depth", dest="model_depth", type=int, default=4)
    parser.add_argument("-group_norm_groups", dest="group_norm_groups", type=int, default=32)
    parser.add_argument(
        "-remat", dest="remat", type=str, default="true",
        help="rematerialize block activations in training (the reference "
        "always checkpoints via fairscale; 'false' trades memory for speed)",
    )
    parser.add_argument(
        "-norm", dest="norm", type=str, default="group",
        help="normalization plug-in: group | batch | none (the reference "
        "builder's set_normalization contract, utils_unet.py:136-153)",
    )
    parser.add_argument(
        "-activation", dest="activation", type=str, default="relu",
        help="activation plug-in: relu | leaky_relu | elu | gelu | silu | "
        "tanh | sigmoid | none (set_activation_function, utils_unet.py:155)",
    )
    parser.add_argument(
        "-conv_impl", dest="conv_impl", type=str, default="xla",
        help="3x3-conv lowering: xla | pair (pair-view Pallas GEMM for the "
        "C_out<=64 top level; ops/pallas/pair_conv.py)",
    )
    parser.add_argument(
        "-mask_impl", dest="mask_impl", type=str, default=None,
        help="dropblock mask pipeline: elementwise | kernel | fused "
        "(ops/dropblock.py; default follows UNET_DB_IMPL)",
    )


def add_trainer_args(parser: argparse.ArgumentParser) -> None:
    """The honored subset of PL Trainer flags."""
    parser.add_argument("--gradient_clip_val", type=float, default=None)
    parser.add_argument("--check_val_every_n_epoch", type=int, default=1)
    parser.add_argument("--max_epochs", type=int, default=None)
    parser.add_argument("--gpus", "--devices", dest="devices", type=int, default=1,
                        help="data-parallel device count (TPU chips)")
    parser.add_argument("--precision", type=str, default="32",
                        help="'bf16'/'16' selects bfloat16 compute")
    parser.add_argument("--auto_lr_find", type=str, default="True")
    parser.add_argument("--profiler", type=str, default=None)
    parser.add_argument("--detect_anomaly", action="store_true")


def parse_with_passthrough(parser: argparse.ArgumentParser, argv=None):
    """parse_known_args; warn about ignored Trainer flags instead of failing
    (the reference accepts the full Trainer namespace)."""
    args, unknown = parser.parse_known_args(argv)
    if unknown:
        print(f"[unet_research_tpu] accepted-and-ignored Trainer flags: {unknown}")
    return args


def compute_dtype(args) -> jnp.dtype:
    prec = str(getattr(args, "precision", "32")).lower()
    return jnp.bfloat16 if prec in ("16", "bf16", "bfloat16") else jnp.float32


def build_unet(
    args,
    dropblock_kind: Optional[str],
    use_scheduler: bool,
    drop_prob: Optional[float] = None,
    remat: bool = False,
) -> UNet:
    """The canonical UNet every reference entry point builds
    (training.py:171-192; the MF/LF family swaps in the independent-channel
    dropblock, MF-training-UNI.py:244)."""
    db = DropBlockConfig(
        kind=dropblock_kind,
        block_size=args.block_size,
        drop_prob=drop_prob if drop_prob is not None else args.max_drop_prob,
        use_scheduler=use_scheduler,
        start_drop_prob=0.0,
        max_drop_prob=args.max_drop_prob,
        nr_steps=args.dropblock_steps,
        mask_impl=getattr(args, "mask_impl", None) or None,
    )
    norm = getattr(args, "norm", "group")
    cfg = canonical_config(
        dropblock=db,
        remat=remat,
        dtype=compute_dtype(args),
        filters=getattr(args, "filters", 64),
        model_depth=getattr(args, "model_depth", 4),
        group_norm_groups=getattr(args, "group_norm_groups", 32),
        norm=None if norm in ("none", "None") else norm,
        activation=getattr(args, "activation", "relu"),
        conv_impl=getattr(args, "conv_impl", "xla"),
    )
    return UNet(cfg)


def load_datasets(data_path: str, with_train: bool = True):
    train = load_split(join(data_path, "train")) if with_train else None
    val = load_split(join(data_path, "val"))
    test = load_split(join(data_path, "test"), with_targets=False)
    return train, val, test


def make_mesh_if_requested(args):
    if getattr(args, "devices", 1) and args.devices > 1:
        from unet_research_tpu.parallel.mesh import make_mesh

        return make_mesh(data=args.devices)
    return None
