from unet_research_tpu.evaluation.metrics import (
    get_accuracy_metrics,
    dice_score,
    final_test_metrics,
)
