"""Rotational test-time-augmentation uncertainty: the reference's 359 serial
rotate -> forward -> unrotate passes
(uncertainty_tests/Rotational_Uncertainty.py:36-68) as one jitted,
chunk-batched device program over the angle fan.

Angles run 1..num_iterations degrees (num_iterations hardcoded to 359 at
load time in the reference, Rotational_Uncertainty.py:127). Optional
square-pad + resize first (Rotational_Uncertainty.py:40-48).

Warp backends:
- 'gather' (default): the exact torchvision-parity warp (ops/image.py
  rotate_bilinear). Default because additions beyond the reference must
  default to reference behavior (CLAUDE.md): the CLI's uncertainty
  artifacts match the reference's interpolation bit-for-policy.
- 'shear' (opt-in perf mode, `-warp shear`): the Paeth 3-shear fan warp
  (ops/pallas/shear_rotate.py) — no gathers, whole chunks of angles
  warped as one batch. XLA lowers the C=1 bilinear gather to near-scalar
  code (~12 ms/warp at DRIVE resolution, 2 warps per member vs the ~6 ms
  forward), so the gather path runs the ensemble at ~31 passes/s where
  the shear path is forward-bound (141.3 passes/s). Interpolation differs
  from torchvision bilinear by ~1e-3 mean abs on smooth content
  (tests/test_shear_rotate.py); ensemble-statistics agreement is pinned by
  tests/test_uncertainty.py::test_rotational_shear_vs_gather_ensemble_stats.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unet_research_tpu.models.unet import UNet
from unet_research_tpu.ops.image import resize_bilinear, rotate_bilinear, square_pad
from unet_research_tpu.ops.pallas.shear_rotate import rotate_fan
from unet_research_tpu.uncertainty.ensemble import streaming_ensemble
from unet_research_tpu.models.unet import as_variables


class RotationalEngine:
    """RotationEval-equivalent: build once, call per image."""

    def __init__(
        self,
        model: UNet,
        num_iterations: int = 359,
        return_num: int = 25,
        resize: int = -1,
        chunk: int = 16,
        warp: str = "gather",
    ):
        if warp not in ("shear", "gather"):
            raise ValueError("warp must be 'shear' or 'gather'")
        self.model = model
        self.num_iterations = num_iterations
        self.return_num = min(return_num, num_iterations)
        self.resize = resize
        self.chunk = chunk
        self.warp = warp
        # the shear kernel needs a TPU (or the Pallas interpreter elsewhere,
        # e.g. the CPU test mesh)
        interpret = jax.default_backend() not in ("tpu", "axon")

        def run(params, im, gt, mask):
            if self.resize != -1:
                t = (self.resize, self.resize)
                im = resize_bilinear(square_pad(im), t)
                gt = resize_bilinear(square_pad(gt), t)
                mask = resize_bilinear(square_pad(mask), t)

            angles = jnp.arange(1, self.num_iterations + 1, dtype=jnp.float32)

            if self.warp == "shear":

                def chunk_sample(angle_chunk):
                    # one real device batch per chunk: warp the fan, run the
                    # batched forward, un-warp the fan
                    rot = rotate_fan(im, angle_chunk, interpret=interpret)
                    segs = model.apply(as_variables(params), rot)
                    segs = rotate_fan(segs, -angle_chunk, interpret=interpret)
                    return segs * mask

                mean, std, saved = streaming_ensemble(
                    chunk_sample, angles, self.chunk, self.return_num,
                    chunk_fn=True,
                )
            else:

                def sample(angle):
                    rot = rotate_bilinear(im, angle)
                    seg = model.apply(as_variables(params), rot)
                    seg = rotate_bilinear(seg, -angle)
                    return (seg * mask)[0]

                mean, std, saved = streaming_ensemble(
                    sample, angles, self.chunk, self.return_num
                )
            return mean[None], std[None], saved[:, None], im, gt, mask

        self._run = jax.jit(run)

    def predict(self, params, im, gt, mask):
        return self._run(params, im, gt, mask)
