"""Losses with torch-parity numerics.

The reference trains with ``nn.BCELoss()`` on sigmoid outputs, multiplies
segmentation and ground truth by the FOV mask first, and rescales the mean
loss by numel/count_nonzero(mask) so that masked-out zeros don't dilute it
(reference utils/utils_training.py:21-39).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# torch BCELoss clamps log terms at -100 for stability — and its BACKWARD
# clamps too. A naive max(log(p), -100) matches the value but its gradient
# at p=0 is 0 * inf = NaN; masked-out pixels are exactly 0 after seg*mask,
# so that NaN silently poisoned every update until the model collapsed to
# all-zero outputs (the forward stayed finite via the NaN scrub, which is
# exactly the failure mode --detect_anomaly exists for). The double-where
# safe-log below gives torch's values with finite gradients; inputs below
# the smallest normal f32 clamp to -100 (denormals flush to zero on TPU).
_TINY = 1.1754944e-38


def _safe_log(v: jax.Array) -> jax.Array:
    guarded = jnp.where(v < _TINY, 1.0, v)
    return jnp.where(v < _TINY, -100.0, jnp.log(guarded))


def bce_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean binary cross-entropy, identical to torch.nn.BCELoss (its backward
    also clamps, so gradients at saturated predictions are finite).

    Computed in float32 regardless of input dtype (the model's bf16 compute
    path must not leak into the loss; see SURVEY.md §7 'BCE-after-sigmoid
    stability').
    """
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    return -jnp.mean(t * _safe_log(p) + (1.0 - t) * _safe_log(1.0 - p))


def masked_rescaled_bce(seg: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked BCE with the reference's numel/nonzero rescale
    (utils/utils_training.py:28-33)."""
    seg = seg * mask
    gt = gt * mask
    loss = bce_loss(seg, gt)
    nonzero = jnp.sum((mask != 0).astype(jnp.float32))
    return loss * (seg.size / nonzero)
