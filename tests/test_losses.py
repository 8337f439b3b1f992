"""Loss parity vs torch BCELoss + the reference's mask rescale."""

import jax.numpy as jnp
import numpy as np
import torch

from unet_research_tpu.ops import bce_loss, masked_rescaled_bce


def test_bce_matches_torch(rng):
    p = rng.random((2, 16, 16, 1), dtype=np.float32)
    t = (rng.random((2, 16, 16, 1)) > 0.5).astype(np.float32)
    ours = float(bce_loss(jnp.asarray(p), jnp.asarray(t)))
    ref = torch.nn.BCELoss()(torch.from_numpy(p), torch.from_numpy(t)).item()
    assert abs(ours - ref) < 1e-5


def test_bce_clamp_at_extremes():
    p = jnp.asarray([[0.0, 1.0]], dtype=jnp.float32)
    t = jnp.asarray([[1.0, 0.0]], dtype=jnp.float32)
    # torch clamps log terms at -100
    assert float(bce_loss(p, t)) == 100.0


def test_masked_rescaled_bce_matches_reference_semantics(rng):
    seg = rng.random((1, 20, 20, 1), dtype=np.float32)
    gt = (rng.random((1, 20, 20, 1)) > 0.5).astype(np.float32)
    mask = np.zeros((1, 20, 20, 1), dtype=np.float32)
    mask[:, 4:16, 4:16, :] = 1.0

    ours = float(masked_rescaled_bce(jnp.asarray(seg), jnp.asarray(gt), jnp.asarray(mask)))

    st = torch.from_numpy(seg) * torch.from_numpy(mask)
    gtt = torch.from_numpy(gt) * torch.from_numpy(mask)
    loss = torch.nn.BCELoss()(st, gtt)
    loss = loss * (st.numel() / torch.from_numpy(mask).count_nonzero())
    assert abs(ours - loss.item()) < 1e-5


def test_masked_bce_gradients_finite():
    """Regression: masked-out pixels are exactly 0 after seg*mask; the loss
    gradient must stay finite there (torch BCELoss's backward clamps too —
    an unguarded log produced 0*inf = NaN and silently killed training)."""
    import jax

    def loss_fn(seg, gt, mask):
        return masked_rescaled_bce(seg, gt, mask)

    seg = jnp.asarray([[0.5, 0.0, 1.0, 0.2]], dtype=jnp.float32)
    gt = jnp.asarray([[1.0, 0.0, 1.0, 0.0]], dtype=jnp.float32)
    mask = jnp.asarray([[1.0, 0.0, 1.0, 1.0]], dtype=jnp.float32)
    g = jax.grad(loss_fn)(seg, gt, mask)
    assert np.isfinite(np.asarray(g)).all()
    # masked-out pixel contributes zero gradient
    assert float(g[0, 1]) == 0.0
