from unet_research_tpu.ops.pallas.dropblock_kernel import (
    dropblock_pallas,
    dropblock_pallas_ad,
    pallas_dropblock_supported,
)
from unet_research_tpu.ops.pallas.fused_gn_dropblock import (
    gn_dropblock_relu,
    gn_dropblock_relu_ad,
)
from unet_research_tpu.ops.pallas.shear_rotate import canvas_size, rotate_fan
