"""Dice-parity sweep on the 31M canonical model: TPU vs the live reference.

The CPU suite pins the mechanism on a tiny model
(tests/test_reference_parity.py::TestDiceSweep); this script runs the SAME
gate at full scale in a TPU window — the reference torch model on host CPU,
ours on the chip, each riding its own preprocessing (reference square pad
utils_general.py:32-43 + torch bilinear interpolate vs our
square_pad/resize_bilinear), Dice within 0.5% at every resolution of the
base_model_mf sweep (reference README.md:139-150).

Usage (TPU window, single-tenant — nothing else on the chip):
    python scripts/dice_sweep.py [path/to/reference.ckpt]

Without a checkpoint argument a fresh torch-seeded reference model is used;
parity is about identical weights, not trained ones. Prints one JSON line
per resolution and exits non-zero if any resolution breaks the 0.5% gate.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_ROOT = "/root/reference/Unet_research/unet_code"
RESOLUTIONS = (32, 64, 128, 256, None)  # None = native 584x565, square-padded


def dice(seg: np.ndarray, gt: np.ndarray) -> float:
    s = (seg >= 0.5).astype(np.float64)
    return 2.0 * float((s * gt).sum()) / max(float(s.sum() + gt.sum()), 1.0)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv

    import torch
    import torch.nn.functional as F

    # the reference-import shims live with the parity tests
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_reference_parity import _build_reference

    import jax.numpy as jnp

    from unet_research_tpu.models import UNet, canonical_config
    from unet_research_tpu.ops.image import resize_bilinear, square_pad
    from unet_research_tpu.utils.convert import (
        load_torch_checkpoint_variables,
        torch_state_dict_to_variables,
    )

    cfg = canonical_config()  # the full 31M-param model
    ref = _build_reference(cfg, seed=5)
    if argv:
        variables = load_torch_checkpoint_variables(argv[0], cfg)
        sd = torch.load(argv[0], map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd)
        ref.load_state_dict(
            {k.split("_model.", 1)[-1]: v for k, v in sd.items()}, strict=False)
    else:
        variables = torch_state_dict_to_variables(ref.state_dict(), cfg)
    model = UNet(cfg)

    # DRIVE-native synthetic content (584x565) + a blob ground truth:
    # mid-range Dice so resize-numerics drift would actually move it
    rng = np.random.default_rng(21)
    h0, w0 = 584, 565
    yy, xx = np.mgrid[0:h0, 0:w0]
    img = (np.sin(yy / 23.0) * np.cos(xx / 17.0) * 0.5 + 0.5).astype(np.float32)
    img += rng.random((h0, w0), dtype=np.float32) * 0.1
    gt0 = (((yy - 290) ** 2 + (xx - 280) ** 2) < 200**2).astype(np.float32)
    x, g = img[None, None], gt0[None, None]

    ok = True
    for r in RESOLUTIONS:
        th, tw = max(h0, w0) - h0, max(h0, w0) - w0
        pad = ((0, 0), (0, 0), (th // 2, th - th // 2), (tw - tw // 2, tw // 2))
        xt, gtt = torch.from_numpy(np.pad(x, pad)), torch.from_numpy(np.pad(g, pad))
        if r is not None:
            xt = F.interpolate(xt, size=(r, r), mode="bilinear", align_corners=False)
            gtt = F.interpolate(gtt, size=(r, r), mode="bilinear", align_corners=False)
        with torch.no_grad():
            seg_ref = ref(xt).numpy()
        gt_bin = (gtt.numpy() >= 0.5).astype(np.float64)
        d_ref = dice(seg_ref, gt_bin)

        im = square_pad(jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        gj = square_pad(jnp.asarray(np.transpose(g, (0, 2, 3, 1))))
        if r is not None:
            im, gj = resize_bilinear(im, (r, r)), resize_bilinear(gj, (r, r))
        seg = np.asarray(model.apply(variables, im))
        d_ours = dice(seg, (np.asarray(gj) >= 0.5).astype(np.float64))

        gate = 0.005 * max(d_ref, 1e-9)
        line = {"resolution": r or "native", "dice_ref": round(d_ref, 6),
                "dice_ours": round(d_ours, 6),
                "abs_diff": round(abs(d_ref - d_ours), 6),
                "ok": abs(d_ref - d_ours) <= gate}
        print(json.dumps(line), flush=True)
        ok = ok and line["ok"]
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
