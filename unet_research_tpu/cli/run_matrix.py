"""Experiment-matrix runner: the reference's PBS/qsub fleet as a real CLI.

The reference launches its 12-model matrix by shelling out qsub strings
(training_script.py:16-30, testing_script.py:17-39,
uncertainty_tests/uncertainty_script.py:20-28, create_density.py:3-5) whose
.sh payloads are gitignored. This runner encodes the same matrix
declaratively and executes stages in-process (sequentially — one TPU) or
prints the equivalent commands with --dry_run.

The 12 models (training_script.py:16-30):
  BM-1/2/3: base training at train_ratio 1, 4/14, 2/14
  MF-1/2/3: UNI / RAT / RSZ-RAT
  LF-1/3/5: HFT at new_size 256,128,256 (ratio 1,1,4/14)
  LF-2/4/6: LFT at the same grid

Uncertainty stage resize policy mirrors uncertainty_script.py:20-28: LF
models evaluated at their training resolution, everything else native.
"""

from __future__ import annotations

import argparse
import shlex
from os.path import join

MATRIX = {
    "BM-1": ("training", ["-train_ratio", "1"]),
    "BM-2": ("training", ["-train_ratio", str(4 / 14)]),
    "BM-3": ("training", ["-train_ratio", str(2 / 14)]),
    "MF-1": ("mf_training", ["-policy", "uni"]),
    "MF-2": ("mf_training", ["-policy", "rat"]),
    "MF-3": ("mf_training", ["-policy", "rsz-rat"]),
    "LF-1": ("lf_training", ["-policy", "hft", "-new_size", "256"]),
    "LF-2": ("lf_training", ["-policy", "lft", "-new_size", "256"]),
    "LF-3": ("lf_training", ["-policy", "hft", "-new_size", "128"]),
    "LF-4": ("lf_training", ["-policy", "lft", "-new_size", "128"]),
    "LF-5": ("lf_training", ["-policy", "hft", "-new_size", "256", "-train_ratio", str(4 / 14)]),
    "LF-6": ("lf_training", ["-policy", "lft", "-new_size", "256", "-train_ratio", str(4 / 14)]),
}

# resize used by the uncertainty stage per model (uncertainty_script.py:20-28)
UNCERTAINTY_RESIZE = {
    "LF-1": 256, "LF-2": 256, "LF-5": 256, "LF-6": 256,
    "LF-3": 128, "LF-4": 128,
}


def _run_module(module: str, argv: list[str], dry: bool) -> None:
    cmd = f"python -m unet_research_tpu.cli.{module} " + " ".join(map(shlex.quote, argv))
    print(f"[run_matrix] {cmd}")
    if dry:
        return
    import importlib

    mod = importlib.import_module(f"unet_research_tpu.cli.{module}")
    mod.main(argv)


def stage_train(args, models):
    for name in models:
        module, extra = MATRIX[name]
        argv = [
            "-mode", "train",
            "-data_path", args.data_path,
            "-save_path", join(args.out_root, name),
            "-seed", str(args.seed),
            "-num_epochs", str(args.num_epochs),
        ] + extra + args.extra
        _run_module(module, argv, args.dry_run)


def stage_test(args, models):
    """Per-model -mode test with the best checkpoint (the reference's
    testing_script.py:17-39)."""
    from unet_research_tpu.train.checkpoint import find_checkpoint

    for name in models:
        module, extra = MATRIX[name]
        ckpt = "<best.ckpt>" if args.dry_run else find_checkpoint(join(args.out_root, name, "model_info"))
        argv = [
            "-mode", "test",
            "-model_path", ckpt,
            "-data_path", args.data_path,
            "-save_path", join(args.out_root, name, "test_statistics"),
            "-seed", str(args.seed),
        ] + extra + args.extra
        _run_module(module, argv, args.dry_run)


def stage_uncertainty(args, models):
    from unet_research_tpu.train.checkpoint import find_checkpoint

    for name in models:
        resize = UNCERTAINTY_RESIZE.get(name, -1)
        ckpt = "<best.ckpt>" if args.dry_run else find_checkpoint(join(args.out_root, name, "model_info"))
        for kind, module, extra in [
            ("dropblock_i", "dropblock_uncertainty", ["-independent_drop"]),
            ("rotation", "rotational_uncertainty", []),
        ]:
            argv = [
                "-model_path", ckpt,
                "-data_path", args.data_path,
                "-save_path", join(args.out_root, name, f"uncertainty_{kind}"),
                "-resize", str(resize),
                "-seed", str(args.seed),
            ] + extra + args.extra
            _run_module(module, argv, args.dry_run)


def stage_density(args, models):
    argv = [
        "-results_root", args.out_root,
        "-save_path", join(args.out_root, "density"),
    ] + args.extra
    _run_module("create_density", argv, args.dry_run)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-stage", choices=["train", "test", "uncertainty", "density", "all"], default="all")
    parser.add_argument("-data_path", required=True)
    parser.add_argument("-out_root", required=True)
    parser.add_argument("-models", default=",".join(MATRIX), help="comma list of model names")
    parser.add_argument("-seed", type=int, default=1234)
    parser.add_argument("-num_epochs", type=int, default=50)
    parser.add_argument("--dry_run", action="store_true")
    args, extra = parser.parse_known_args(argv)
    args.extra = extra
    models = [m for m in args.models.split(",") if m]
    unknown = set(models) - set(MATRIX)
    if unknown:
        raise SystemExit(f"unknown models: {sorted(unknown)}")

    if args.stage in ("train", "all"):
        stage_train(args, models)
    if args.stage == "test":
        stage_test(args, models)
    if args.stage in ("uncertainty", "all"):
        stage_uncertainty(args, models)
    if args.stage in ("density", "all"):
        stage_density(args, models)


if __name__ == "__main__":
    main()
