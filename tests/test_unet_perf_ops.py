"""Equivalence tests for the TPU-performance rewrites of standard ops."""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_research_tpu.models.unet import (
    DepthToSpaceUpConv,
    DropBlockConfig,
    UNet,
    canonical_config,
)
from unet_research_tpu.ops.dropblock import _block_expand_max


def test_depth_to_space_matches_conv_transpose(rng):
    """Matches flax nn.ConvTranspose(2,2,s=2) up to kernel orientation:
    our kernel follows the torch ConvTranspose2d stamp convention
    (out[2i+di,2j+dj] += x[i,j]*K[di,dj]); flax applies the rot-180 kernel
    (gradient-of-conv semantics), so the flax reference gets the flipped
    weights."""
    x = jnp.asarray(rng.random((2, 5, 7, 6), dtype=np.float32))
    ref = nn.ConvTranspose(features=4, kernel_size=(2, 2), strides=(2, 2), padding="VALID")
    v_ref = ref.init(jax.random.PRNGKey(0), x)
    ours = DepthToSpaceUpConv(
        features=4,
        use_bias=True,
        kernel_init=nn.initializers.lecun_normal(),
        bias_init=nn.initializers.zeros_init(),
    )
    v_ours = jax.tree_util.tree_map(lambda a: a, v_ref)
    v_ours = {"params": {"kernel": v_ref["params"]["kernel"][::-1, ::-1], "bias": v_ref["params"]["bias"]}}
    out_ref = ref.apply(v_ref, x)
    out_ours = ours.apply(v_ours, x)
    assert out_ours.shape == (2, 10, 14, 4)
    np.testing.assert_allclose(np.asarray(out_ours), np.asarray(out_ref), rtol=1e-5, atol=1e-5)


def test_separable_block_expand_matches_2d(rng):
    from jax import lax

    for b in (3, 4, 7):
        mask = (rng.random((2, 11, 13, 3)) < 0.2).astype(np.float32)
        m = jnp.asarray(mask)
        sep = _block_expand_max(m, b)
        p = b // 2
        ref = lax.reduce_window(
            m, -jnp.inf, lax.max,
            window_dimensions=(1, b, b, 1), window_strides=(1, 1, 1, 1),
            padding=((0, 0), (p, p), (p, p), (0, 0)),
        )
        if b % 2 == 0:
            ref = ref[:, :11, :13, :]
        np.testing.assert_array_equal(np.asarray(sep), np.asarray(ref))


@pytest.mark.parametrize("kind", ["dependent", "independent"])
@pytest.mark.parametrize("connection", ["cat", "add", "none"])
def test_fold_rescale_matches_inline(rng, kind, connection):
    """fold_rescale (skip/defer the DropBlock rescale through the GroupNorm
    algebra) is exact-math-equivalent to the literal per-site rescale. At
    batch 1 the whole-tensor and per-sample scales coincide, so the two
    forwards must agree to f32 rounding."""
    cfg = canonical_config(
        filters=8,
        model_depth=2,
        group_norm_groups=4,
        connection=connection,
        dropblock=DropBlockConfig(kind=kind, block_size=3, drop_prob=0.15),
        fold_rescale=True,
    )
    cfg_inline = dataclasses.replace(cfg, fold_rescale=False)
    x = jnp.asarray(rng.random((1, 16, 12, 1), dtype=np.float32))
    key = jax.random.PRNGKey(7)
    params = UNet(cfg).init(
        {"params": jax.random.PRNGKey(0), "dropblock": key}, x, drop_prob=0.15
    )
    out_fold = UNet(cfg).apply(params, x, drop_prob=0.15, rngs={"dropblock": key})
    out_inline = UNet(cfg_inline).apply(
        params, x, drop_prob=0.15, rngs={"dropblock": key}
    )
    # same mask draws (identical rng fold order), algebraically identical
    np.testing.assert_allclose(
        np.asarray(out_fold), np.asarray(out_inline), rtol=2e-4, atol=2e-5
    )
    # eval mode (drop_prob=None) is untouched by the knob
    e1 = UNet(cfg).apply(params, x)
    e2 = UNet(cfg_inline).apply(params, x)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_fold_rescale_batched_shapes(rng):
    """Batched (MC-chunk-like) forward under folding: per-sample deferred
    scales broadcast cleanly and members stay independent."""
    cfg = canonical_config(
        filters=8, model_depth=2, group_norm_groups=4,
        dropblock=DropBlockConfig(kind="independent", block_size=3, drop_prob=0.15),
    )
    x = jnp.asarray(rng.random((2, 16, 12, 1), dtype=np.float32))
    out = UNet(cfg).apply(
        UNet(cfg).init({"params": jax.random.PRNGKey(0), "dropblock": jax.random.PRNGKey(1)}, x, drop_prob=0.1),
        x, drop_prob=0.1, rngs={"dropblock": jax.random.PRNGKey(2)},
    )
    assert out.shape == (2, 16, 12, 1)
    assert np.isfinite(np.asarray(out)).all()
