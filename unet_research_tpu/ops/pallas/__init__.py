from unet_research_tpu.ops.pallas.dropblock_kernel import (
    dropblock_pallas,
    pallas_dropblock_supported,
)
