from unet_research_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated,
    shard_ensemble_keys,
)
