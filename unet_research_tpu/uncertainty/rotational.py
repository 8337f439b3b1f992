"""Rotational test-time-augmentation uncertainty: the reference's 359 serial
rotate -> forward -> unrotate passes
(uncertainty_tests/Rotational_Uncertainty.py:36-68) as one jitted,
chunk-vmapped device program over the angle fan.

Angles run 1..num_iterations degrees (num_iterations hardcoded to 359 at
load time in the reference, Rotational_Uncertainty.py:127). Rotation numerics
match torchvision bilinear/zero-fill (see ops/image.py). Optional square-pad
+ resize first (Rotational_Uncertainty.py:40-48).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unet_research_tpu.models.unet import UNet
from unet_research_tpu.ops.image import resize_bilinear, rotate_bilinear, square_pad
from unet_research_tpu.uncertainty.ensemble import streaming_ensemble


class RotationalEngine:
    """RotationEval-equivalent: build once, call per image."""

    def __init__(
        self,
        model: UNet,
        num_iterations: int = 359,
        return_num: int = 25,
        resize: int = -1,
        chunk: int = 16,
    ):
        self.model = model
        self.num_iterations = num_iterations
        self.return_num = min(return_num, num_iterations)
        self.resize = resize
        self.chunk = chunk

        def run(params, im, gt, mask):
            if self.resize != -1:
                t = (self.resize, self.resize)
                im = resize_bilinear(square_pad(im), t)
                gt = resize_bilinear(square_pad(gt), t)
                mask = resize_bilinear(square_pad(mask), t)

            def sample(angle):
                rot = rotate_bilinear(im, angle)
                seg = model.apply({"params": params}, rot)
                seg = rotate_bilinear(seg, -angle)
                return (seg * mask)[0]

            angles = jnp.arange(1, self.num_iterations + 1, dtype=jnp.float32)
            mean, std, saved = streaming_ensemble(
                sample, angles, self.chunk, self.return_num
            )
            return mean[None], std[None], saved[:, None], im, gt, mask

        self._run = jax.jit(run)

    def predict(self, params, im, gt, mask):
        return self._run(params, im, gt, mask)
