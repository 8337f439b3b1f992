"""Pallas fused dropblock kernel tests.

Full semantics run on TPU (skipped on the CPU test mesh — hardware PRNG);
tests assert the same invariants the pure-XLA goldens satisfy: drop-rate
statistics, exact per-sample rescale, key independence, identity at gamma=0,
block geometry, and VJP correctness (bwd == mask-apply of the cotangent).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_research_tpu.ops.pallas.dropblock_kernel import (
    dropblock_pallas,
    dropblock_pallas_ad,
    pallas_dropblock_supported,
)

on_tpu = jax.default_backend() in ("tpu", "axon")
tpu_only = pytest.mark.skipif(not on_tpu, reason="needs TPU hardware PRNG")


def test_supported_predicate():
    assert pallas_dropblock_supported(7)
    assert pallas_dropblock_supported(3)
    assert not pallas_dropblock_supported(4)
    assert not pallas_dropblock_supported(1)
    assert not pallas_dropblock_supported(19)


@tpu_only
def test_statistics_and_scale():
    from unet_research_tpu.ops.dropblock import dropblock_gamma_dependent

    x = jnp.ones((4, 64, 64, 8), jnp.float32)
    gamma = dropblock_gamma_dependent(64, 64, 7, 0.15)
    out = np.asarray(dropblock_pallas(x, jax.random.PRNGKey(0), gamma, 7))
    assert np.isfinite(out).all()
    assert abs((out == 0).mean() - 0.15) < 0.04
    # per-sample rescale: kept values in each sample equal numel/sum(keep)
    for i in range(4):
        kept = out[i][out[i] > 0]
        if kept.size:
            expected = out[i].size / np.count_nonzero(out[i])
            np.testing.assert_allclose(kept, expected, rtol=1e-4)
    # samples draw independent masks from one call
    assert ((out[0] == 0) != (out[1] == 0)).any()


@tpu_only
def test_key_independence_and_identity():
    x = jnp.ones((1, 48, 40, 4), jnp.float32)
    a = np.asarray(dropblock_pallas(x, jax.random.PRNGKey(1), 0.01, 5))
    b = np.asarray(dropblock_pallas(x, jax.random.PRNGKey(2), 0.01, 5))
    assert ((a == 0) != (b == 0)).any()
    ident = np.asarray(dropblock_pallas(x, jax.random.PRNGKey(1), 0.0, 5))
    np.testing.assert_allclose(ident, 1.0)


@tpu_only
def test_vjp_is_mask_apply():
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 4), np.float32))
    key = jax.random.PRNGKey(3)

    f = lambda x: jnp.sum(dropblock_pallas_ad(x, key, 0.02, 5) * 3.0)
    g = jax.grad(f)(x)
    out = dropblock_pallas(x, key, 0.02, 5)
    # grad of sum(3*x*keep*scale) = 3*keep*scale; compare via masked pattern
    mask = np.asarray(out) != 0
    gn = np.asarray(g)
    assert (gn[~mask] == 0).all()
    if mask.any():
        # kept entries: grad = 3 * scale (per sample)
        for i in range(2):
            sel = mask[i]
            if sel.any():
                scale = out.size // 2 / np.count_nonzero(np.asarray(out)[i])
                np.testing.assert_allclose(gn[i][sel], 3.0 * scale, rtol=1e-3)


@tpu_only
def test_block_geometry():
    # a sparse draw must produce axis-aligned b x b zero blocks
    b = 5
    x = jnp.ones((1, 40, 40, 1), jnp.float32)
    for s in range(50):
        out = np.asarray(dropblock_pallas(x, jax.random.PRNGKey(s), 0.002, b))
        nz = out[0, :, :, 0] == 0
        if nz.sum() == b * b:
            ys, xs = np.where(nz)
            assert ys.max() - ys.min() == b - 1
            assert xs.max() - xs.min() == b - 1
            return
    pytest.skip("no single-block draw found")


@tpu_only
def test_mask_producer_kernel():
    """dropblock_pallas_mask: dense s8 keep-mask + keep counts consistent
    with each other, with the two-phase kernel's mask (same strip-seeded
    streams), and with the expected drop statistics."""
    from unet_research_tpu.ops.dropblock import dropblock_gamma_dependent
    from unet_research_tpu.ops.pallas.dropblock_kernel import dropblock_pallas_mask

    shape = (4, 96, 80, 8)
    key = jax.random.PRNGKey(3)
    gamma = float(dropblock_gamma_dependent(96, 80, 7, 0.15))
    mask, keep = dropblock_pallas_mask(shape, key, gamma, 7)
    mask = np.asarray(mask)
    keep = np.asarray(keep)
    assert mask.dtype == np.int8 and set(np.unique(mask)) <= {0, 1}
    # counts match the emitted mask exactly
    np.testing.assert_allclose(keep, mask.reshape(4, -1).sum(1))
    # drop rate near the configured drop_prob
    assert abs(1.0 - mask.mean() - 0.15) < 0.04
    # identical mask to the two-phase kernel (same (key, sample, strip) streams)
    x = jnp.ones(shape, jnp.float32)
    out2 = np.asarray(dropblock_pallas(x, key, gamma, 7))
    np.testing.assert_array_equal(mask == 0, out2 == 0)
