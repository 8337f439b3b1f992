from unet_research_tpu.data.dataset import ArrayDataset, load_split
from unet_research_tpu.data.drive import DriveImages, load_drive
from unet_research_tpu.data.loading import batch_iterator, shard_batch
