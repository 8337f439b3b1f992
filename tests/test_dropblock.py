"""Golden tests for DropBlock mask generation.

Checked against the reference math (utils/utils_modules.py): gamma formulas,
block-expansion behavior, border exclusion, rescaling, and the vmap key
discipline that replaces the reference's per-call torch RNG draws.
A torch re-execution of the reference's published formulas provides
statistical goldens without copying its code paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_research_tpu.ops import (
    dropblock_dependent,
    dropblock_gamma_dependent,
    dropblock_gamma_independent,
    dropblock_independent,
    linear_drop_prob,
)


def test_gamma_formulas():
    # dependent: p*H*W / (b^2 (H-b+1)(W-b+1))   (utils_modules.py:81-82)
    g = dropblock_gamma_dependent(40, 50, 7, 0.15)
    expected = 0.15 * 40 * 50 / (49 * 34 * 44)
    assert abs(float(g) - expected) < 1e-9
    # independent is the same formula clamped to 1 (utils_modules.py:98-102)
    gi = dropblock_gamma_independent(40, 50, 7, 0.15)
    assert abs(float(gi) - expected) < 1e-9
    assert float(dropblock_gamma_independent(8, 8, 7, 50.0)) == 1.0


def test_identity_at_zero_prob():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((2, 24, 24, 3)) * 1.5
    np.testing.assert_allclose(np.asarray(dropblock_dependent(x, key, 0.0, 7)), np.asarray(x))
    np.testing.assert_allclose(np.asarray(dropblock_independent(x, key, 0.0, 7)), np.asarray(x))


@pytest.mark.parametrize("fn", [dropblock_dependent, dropblock_independent])
def test_drop_fraction_matches_target(fn):
    # With the paper gamma, the expected fraction of dropped activations is
    # approximately drop_prob.
    key = jax.random.PRNGKey(42)
    x = jnp.ones((4, 64, 64, 8))
    p = 0.15
    out = fn(x, key, p, 7)
    dropped = float(jnp.mean(out == 0.0))
    assert abs(dropped - p) < 0.04, dropped


def test_dependent_rescale_is_numel_over_sum():
    key = jax.random.PRNGKey(7)
    x = jnp.ones((1, 32, 32, 4))
    out = np.asarray(dropblock_dependent(x, key, 0.2, 5))
    kept = out[out > 0]
    if kept.size:
        # every kept activation is scaled by numel/sum(block_mask)
        expected_scale = out.size / np.count_nonzero(out)
        np.testing.assert_allclose(kept, expected_scale, rtol=1e-5)


def test_independent_rescale_and_guard():
    key = jax.random.PRNGKey(3)
    x = jnp.ones((1, 32, 32, 4))
    out = np.asarray(dropblock_independent(x, key, 0.2, 5))
    kept = out[out > 0]
    if kept.size:
        keep_frac = np.count_nonzero(out) / out.size
        np.testing.assert_allclose(kept, 1.0 / keep_frac, rtol=1e-5)
    # gamma >= 1 drops everything in the interior; guarded, no NaN/inf
    out2 = np.asarray(dropblock_independent(x, key, 60.0, 5))
    assert np.isfinite(out2).all()


def test_independent_border_exclusion():
    # seeds only in the interior => with b=7, ex=3, no mask seed can originate
    # in the 3-wide frame; blocks still reach up to the edge via expansion,
    # but a border-origin-only drop pattern must not exist. Statistically:
    # corner pixel drop rate should be far below interior drop rate.
    key = jax.random.PRNGKey(11)
    x = jnp.ones((64, 33, 33, 1))
    out = np.asarray(dropblock_independent(x, key, 0.3, 7))
    corner_dropped = np.mean(out[:, 0, 0, 0] == 0)
    center_dropped = np.mean(out[:, 16, 16, 0] == 0)
    assert corner_dropped < center_dropped


def test_block_shape_is_square():
    # a single seed must expand to an exact b x b zero block
    b = 5
    x = jnp.ones((1, 21, 21, 1))
    # find a key that drops exactly one block in the interior
    for s in range(200):
        key = jax.random.PRNGKey(s)
        out = np.asarray(dropblock_independent(x, key, 0.01, b))
        nz = out[0, :, :, 0] == 0
        if nz.sum() == b * b:
            ys, xs = np.where(nz)
            assert ys.max() - ys.min() == b - 1
            assert xs.max() - xs.min() == b - 1
            return
    pytest.skip("no single-block draw found")


def test_even_block_size_dependent_shapes():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((1, 20, 22, 2))
    out = dropblock_dependent(x, key, 0.1, 4)
    assert out.shape == x.shape
    with pytest.raises(ValueError):
        dropblock_independent(x, key, 0.1, 4)


def test_vmap_keys_give_independent_masks():
    x = jnp.ones((1, 32, 32, 4))
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    outs = jax.vmap(lambda k: dropblock_dependent(x, k, 0.2, 5))(keys)
    outs = np.asarray(outs)
    masks = outs == 0
    # all pairs differ
    for i in range(8):
        for j in range(i + 1, 8):
            assert (masks[i] != masks[j]).any()


def test_linear_drop_prob_schedule():
    # dropblock pkg LinearScheduler: linspace(start, stop, n), clamped at end
    n = 5
    vals = [float(linear_drop_prob(i, 0.0, 0.2, n)) for i in range(8)]
    expected = list(np.linspace(0.0, 0.2, n)) + [0.2] * 3
    np.testing.assert_allclose(vals, expected, rtol=1e-6)
    assert float(linear_drop_prob(0, 0.0, 0.2, 1)) == pytest.approx(0.2)
    # traced step works
    jitted = jax.jit(lambda s: linear_drop_prob(s, 0.0, 0.15, 1500))
    assert float(jitted(1499)) == pytest.approx(0.15)
    assert float(jitted(5000)) == pytest.approx(0.15)


def test_mask_impl_dispatch():
    """mask_impl knob: explicit names select pipelines; 'kernel' falls back
    to elementwise off-TPU (no Pallas import); unknown names raise."""
    from unet_research_tpu.ops.dropblock import dropblock_independent

    x = jnp.ones((2, 48, 48, 4))
    key = jax.random.PRNGKey(9)
    out_el = np.asarray(dropblock_dependent(x, key, 0.15, 7, mask_impl="elementwise"))
    # CPU backend: 'kernel' is not supported -> elementwise fallback, exact match
    out_k = np.asarray(dropblock_dependent(x, key, 0.15, 7, mask_impl="kernel"))
    np.testing.assert_array_equal(out_k, out_el)
    out_ik = np.asarray(dropblock_independent(x, key, 0.15, 7, mask_impl="kernel"))
    out_iel = np.asarray(dropblock_independent(x, key, 0.15, 7, mask_impl="elementwise"))
    np.testing.assert_array_equal(out_ik, out_iel)
    with pytest.raises(ValueError):
        dropblock_dependent(x, key, 0.15, 7, mask_impl="bogus")
