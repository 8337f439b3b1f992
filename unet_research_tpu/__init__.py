"""unet_research_tpu — TPU-native (JAX/Flax/XLA/Pallas) framework with the
capabilities of JohnDLee/Unet-Research.

A from-scratch rebuild of the reference's DRIVE retinal-vessel segmentation
research pipeline (multifidelity data augmentation + U-Net uncertainty
quantification), designed TPU-first:

- `models/`       Flax U-Net (configurable encoder/decoder, GroupNorm/ReLU,
                  DropBlock, remat) — replaces the torch builder UNet
                  (reference: unet_code/utils/utils_unet.py).
- `ops/`          Pure-XLA + Pallas compute ops: DropBlock mask generation,
                  torch-parity bilinear resize/rotate warps, masked BCE
                  (reference: utils_modules.py, torchvision functional calls).
- `train/`        Functional training engine: jitted steps, SGD+momentum,
                  ReduceLROnPlateau, early stopping, LR finder, checkpoints,
                  and the resize-policy registry covering the reference's
                  8 forked training scripts (reference: utils_training.py,
                  base_model_tests/, multi-fidelity/).
- `uncertainty/`  MC-DropBlock + rotational-TTA ensembles as single vmapped
                  on-device batches instead of serial batch-1 loops
                  (reference: uncertainty_tests/).
- `data/`         DRIVE readers, augmentation generation, host->device feed
                  (reference: utils_dataset.py, utils_imloader.py,
                  preprocessing/create_augmentations.py).
- `evaluation/`   Masked F1/AUROC/accuracy, artifact + metrics.csv writers,
                  KDE density analysis (reference: utils_metrics.py,
                  create_density_*.py).
- `parallel/`     Device mesh + NamedSharding (data / MC-sample parallelism
                  over ICI); the distributed-communication component.
- `cli/`          Entry points preserving the reference's public flags and
                  output layout.
"""

__version__ = "0.1.0"
