"""Fused GroupNorm+DropBlock+ReLU kernel tests (TPU-only: hardware PRNG).

The fused kernel and the standalone bit-packed dropblock kernel derive their
masks from the same strip-seeded generator (_gen_block_words), so with the
same key/gamma/shape the masks are BIT-IDENTICAL — which turns the fused-op
tests into exact decompositions against flax GroupNorm + dropblock_pallas:

    fused(x, s, b, key, g)  ==  relu(dropblock_pallas(GN(x), key, g))

up to GroupNorm rounding (the fused path computes norm->mask->relu in f32
and casts once; the composition casts at each op boundary).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from unet_research_tpu.ops.pallas.dropblock_kernel import dropblock_pallas
from unet_research_tpu.ops.pallas.fused_gn_dropblock import (
    gn_dropblock_relu,
    gn_dropblock_relu_ad,
)

on_tpu = jax.default_backend() in ("tpu", "axon")
tpu_only = pytest.mark.skipif(not on_tpu, reason="needs TPU hardware PRNG")


def _gn_xla(x, scale, bias, groups):
    mod = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=x.dtype)
    return mod.apply({"params": {"scale": scale, "bias": bias}}, x)


def _mk(n=2, h=48, w=40, c=16, groups=4, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32), dtype)
    scale = jnp.asarray(rng.normal(1.0, 0.2, size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0.0, 0.2, size=(c,)).astype(np.float32))
    return x, scale, bias, groups


@tpu_only
def test_gamma_zero_is_gn_relu():
    x, scale, bias, groups = _mk()
    out = gn_dropblock_relu(x, scale, bias, jax.random.PRNGKey(0), 0.0,
                            num_groups=groups, block_size=5)
    ref = nn.relu(_gn_xla(x, scale, bias, groups))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@tpu_only
def test_decomposes_against_standalone_kernel():
    x, scale, bias, groups = _mk(n=2, h=56, w=48, c=32, groups=8)
    key = jax.random.PRNGKey(7)
    gamma = 0.02
    out = gn_dropblock_relu(x, scale, bias, key, gamma,
                            num_groups=groups, block_size=5)
    ref = nn.relu(dropblock_pallas(_gn_xla(x, scale, bias, groups), key,
                                   gamma, 5))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    assert (np.asarray(out) == 0).mean() > 0.05  # masks actually active


@tpu_only
def test_bf16_matches_f32_reference():
    x, scale, bias, groups = _mk(c=64, dtype=jnp.bfloat16, seed=3)
    key = jax.random.PRNGKey(9)
    out = gn_dropblock_relu(x, scale, bias, key, 0.01,
                            num_groups=groups, block_size=7)
    assert out.dtype == jnp.bfloat16
    ref = nn.relu(dropblock_pallas(
        _gn_xla(x.astype(jnp.float32), scale, bias, groups), key,
        jnp.float32(0.01), 7))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.05, atol=0.05)


@tpu_only
def test_guard_zero_independent_semantics():
    # gamma=1 drops every interior seed -> everything dropped; guarded
    # variant returns zeros (identity rescale), unguarded NaNs out.
    x, scale, bias, groups = _mk(n=1, h=32, w=32, c=16, groups=4)
    key = jax.random.PRNGKey(1)
    out = gn_dropblock_relu(x, scale, bias, key, 1.0,
                            num_groups=groups, block_size=5, guard_zero=True)
    np.testing.assert_allclose(np.asarray(out), 0.0)


@tpu_only
def test_vjp_matches_composed_autodiff():
    x, scale, bias, groups = _mk(n=2, h=40, w=40, c=16, groups=4, seed=5)
    key = jax.random.PRNGKey(11)
    gamma = 0.02
    w_ref = jnp.asarray(
        np.random.default_rng(6).normal(size=x.shape).astype(np.float32))

    def fused(x, s, b):
        y = gn_dropblock_relu_ad(x, s, b, key, gamma, groups, 5)
        return jnp.sum(y * w_ref)

    def composed(x, s, b):
        from unet_research_tpu.ops.pallas.dropblock_kernel import (
            dropblock_pallas_ad,
        )
        y = nn.relu(dropblock_pallas_ad(_gn_xla(x, s, b, groups), key,
                                        gamma, 5))
        return jnp.sum(y * w_ref)

    gx, gs, gb = jax.grad(fused, argnums=(0, 1, 2))(x, scale, bias)
    rx, rs, rb = jax.grad(composed, argnums=(0, 1, 2))(x, scale, bias)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(rs), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=2e-3, atol=2e-3)
