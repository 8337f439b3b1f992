from unet_research_tpu.models.unet import (
    UNet,
    UNetConfig,
    DropBlockConfig,
    as_variables,
    canonical_config,
    param_count,
    split_variables,
)
