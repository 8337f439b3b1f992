"""Compute ops: image warps, DropBlock mask generation, losses.

Pure-XLA implementations live here; fused TPU kernels live in `ops.pallas`.
"""

from unet_research_tpu.ops.image import (
    resize_bilinear,
    rotate_bilinear,
    square_pad,
    pad_to_multiple,
    crop_to,
    center_crop,
)
from unet_research_tpu.ops.dropblock import (
    dropblock_dependent,
    dropblock_independent,
    dropblock_gamma_dependent,
    dropblock_gamma_independent,
    linear_drop_prob,
)
from unet_research_tpu.ops.losses import bce_loss, masked_rescaled_bce
