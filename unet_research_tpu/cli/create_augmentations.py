"""Augmented-dataset generation CLI (reference
preprocessing/create_augmentations.py: -dest/-seed, DRIVE paths relative to
the working directory; we add -data_root to point at any DRIVE checkout).

Usage:
  python -m unet_research_tpu.cli.create_augmentations -dest augmented_data \
      -seed 1234 [-data_root /path/to/Unet_research/datasets]
"""

from __future__ import annotations

import argparse

from unet_research_tpu.data.augment import create_augmentations


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("-dest", dest="dest", type=str, default="augmented_data")
    parser.add_argument("-seed", dest="seed", type=int, default=1234)
    parser.add_argument(
        "-data_root", dest="data_root", type=str, default="datasets",
        help="DRIVE root containing training/ and test/ (reference uses ./datasets)",
    )
    parser.add_argument("-num_train", dest="num_train", type=int, default=36,
                        help="augments per train image (hardcoded 36 upstream)")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    out = create_augmentations(args.data_root, args.dest, args.seed, args.num_train)
    print(f"augmented dataset written to {out}")
    return out


if __name__ == "__main__":
    main()
