"""Losses with torch-parity numerics.

The reference trains with ``nn.BCELoss()`` on sigmoid outputs, multiplies
segmentation and ground truth by the FOV mask first, and rescales the mean
loss by numel/count_nonzero(mask) so that masked-out zeros don't dilute it
(reference utils/utils_training.py:21-39).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# torch BCELoss clamps log terms at -100 for stability.
_LOG_CLAMP = -100.0


def bce_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean binary cross-entropy, identical to torch.nn.BCELoss.

    Computed in float32 regardless of input dtype (the model's bf16 compute
    path must not leak into the loss; see SURVEY.md §7 'BCE-after-sigmoid
    stability').
    """
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    log_p = jnp.maximum(jnp.log(p), _LOG_CLAMP)
    log_1p = jnp.maximum(jnp.log(1.0 - p), _LOG_CLAMP)
    return -jnp.mean(t * log_p + (1.0 - t) * log_1p)


def masked_rescaled_bce(seg: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked BCE with the reference's numel/nonzero rescale
    (utils/utils_training.py:28-33)."""
    seg = seg * mask
    gt = gt * mask
    loss = bce_loss(seg, gt)
    nonzero = jnp.sum((mask != 0).astype(jnp.float32))
    return loss * (seg.size / nonzero)
