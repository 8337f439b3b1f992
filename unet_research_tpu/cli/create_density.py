"""Density-analysis CLI (the reference's create_density.py qsub driver +
its three analysis payload scripts, consolidated).

Usage:
  python -m unet_research_tpu.cli.create_density -results_root RUNS \
      -save_path RUNS/density [-aug_root AUG] [-kinds std,cv,did,hist] [-models BM-1,...]

The default kinds are 'std,cv'; 'did' (the reference's create_density_DID
dependent-vs-independent overlays, also submitted by its create_density.py
driver) and 'hist' are opt-in.
"""

from __future__ import annotations

import argparse

from unet_research_tpu.evaluation.density import MODELS, create_density_report


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-results_root", dest="results_root", required=True)
    parser.add_argument("-save_path", dest="save_path", required=True)
    parser.add_argument("-aug_root", dest="aug_root", default=None,
                        help="augmented data root (for FOV masks in CV plots)")
    # The reference's create_density.py submits the STD/CV/DID payloads, but
    # DID needs dependent-MC tensors that only exist when run_matrix ran with
    # --with_dependent, so 'did' is opt-in here (run_matrix adds it when the
    # tensors exist); create_density_STD.py only DEFINES the histogram
    # battery and never invokes it, so 'hist' is opt-in too.
    parser.add_argument("-kinds", dest="kinds", default="std,cv")
    parser.add_argument("-models", dest="models", default=",".join(MODELS))
    args, _ = parser.parse_known_args(argv)
    create_density_report(
        args.results_root,
        args.save_path,
        aug_root=args.aug_root,
        models=[m for m in args.models.split(",") if m],
        kinds=tuple(args.kinds.split(",")),
    )
    print(f"density report written to {args.save_path}")


if __name__ == "__main__":
    main()
