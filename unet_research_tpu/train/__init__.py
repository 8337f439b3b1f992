from unet_research_tpu.train.schedule import ReduceLROnPlateau, EarlyStopping
from unet_research_tpu.train.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    BestCheckpointKeeper,
)
from unet_research_tpu.train.state import TrainState, create_train_state
from unet_research_tpu.train.policies import (
    POLICIES,
    ResizePolicy,
    make_size_plan,
)
from unet_research_tpu.train.loop import Trainer, TrainerConfig, lr_find
