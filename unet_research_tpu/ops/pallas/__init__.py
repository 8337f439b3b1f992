from unet_research_tpu.ops.pallas.dropblock_kernel import (
    dropblock_pallas_mask,
    pallas_dropblock_supported,
)
from unet_research_tpu.ops.pallas.shear_rotate import canvas_size, rotate_fan
