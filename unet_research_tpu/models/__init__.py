from unet_research_tpu.models.unet import (
    UNet,
    UNetConfig,
    DropBlockConfig,
    canonical_config,
    param_count,
)
