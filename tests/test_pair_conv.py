"""Pair-view conv kernel (ops/pallas/pair_conv.py): correctness against
lax.conv on CPU (interpret mode — the kernel is pure matmuls/reshapes), and
the model-path parity on TPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from unet_research_tpu.ops.pallas.pair_conv import (
    _pack_weights,
    conv3x3_pair,
    pair_conv_supported,
)

on_tpu = jax.default_backend() in ("tpu", "axon")
tpu_only = pytest.mark.skipif(not on_tpu, reason="needs TPU (mosaic lowering)")
# Interpret-mode model-path tests are CPU-suite coverage: on the axon
# backend the interpret emulation itself is compiled by libtpu, which crashes
# on the emulation HLO (fusion_emitter.cc 'Check failed: window.pad_low[i]
# == 0' SIGABRT, measured on v5e round 5) and drifts numerically. The
# compiled Mosaic path is covered on-chip by test_model_path_pair_conv.
cpu_only = pytest.mark.skipif(
    on_tpu, reason="interpret-mode emulation is CPU-suite coverage")


def _ref_conv(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.mark.parametrize("shape,f", [((2, 16, 12, 5), 4), ((1, 24, 20, 8), 8),
                                     ((2, 8, 6, 3), 2),
                                     # the C=1 stem shape (zero-padded C path)
                                     ((1, 20, 16, 1), 8),
                                     # ragged H: no %8 divisor, adaptive tile
                                     ((1, 22, 12, 8), 4)])
def test_matches_lax_conv_interpret(rng, shape, f):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    k = jnp.asarray(0.1 * rng.standard_normal((3, 3, shape[-1], f)).astype(np.float32))
    y, s1, s2 = conv3x3_pair(x, k, stats=True, interpret=True)
    ref = np.asarray(_ref_conv(x, k))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=2e-5)
    r64 = ref.astype(np.float64)
    np.testing.assert_allclose(np.asarray(s1), r64.sum((1, 2)), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s2), (r64 * r64).sum((1, 2)), rtol=1e-4)


def test_valid_matches_lax_conv_interpret(rng):
    """conv3x3_pair_valid (SAME kernel + interior crop) vs lax VALID conv,
    values and gradients."""
    from unet_research_tpu.ops.pallas.pair_conv import conv3x3_pair_valid

    x = jnp.asarray(rng.standard_normal((2, 16, 12, 5)).astype(np.float32))
    k = jnp.asarray(0.1 * rng.standard_normal((3, 3, 5, 4)).astype(np.float32))

    def ref(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y = conv3x3_pair_valid(x, k, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref(x, k)),
                               rtol=2e-5, atol=2e-5)
    w = jnp.asarray(rng.standard_normal(y.shape).astype(np.float32))
    dx_p, dk_p = jax.grad(
        lambda x, k: jnp.sum(conv3x3_pair_valid(x, k, interpret=True) * w),
        argnums=(0, 1))(x, k)
    dx_r, dk_r = jax.grad(
        lambda x, k: jnp.sum(ref(x, k) * w), argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dk_p), np.asarray(dk_r),
                               rtol=2e-4, atol=2e-4)


def test_pack_weights_block_structure(rng):
    """Wu/Wv block layout: each output (q, co) column sees exactly the three
    taps K[dy, dx] of its parity, zeros elsewhere (the 75%-density GEMM)."""
    c, f = 3, 2
    k = rng.standard_normal((3, 3, c, f)).astype(np.float32)
    wp = np.asarray(_pack_weights(jnp.asarray(k), jnp.float32))
    wu, wv = wp[0], wp[1]
    for dy in range(3):
        np.testing.assert_array_equal(wu[dy, :c, :f], k[dy, 0])
        np.testing.assert_array_equal(wu[dy, :c, f:], 0.0)
        np.testing.assert_array_equal(wu[dy, c:, :f], k[dy, 1])
        np.testing.assert_array_equal(wu[dy, c:, f:], k[dy, 0])
        np.testing.assert_array_equal(wv[dy, :c, :f], k[dy, 2])
        np.testing.assert_array_equal(wv[dy, :c, f:], k[dy, 1])
        np.testing.assert_array_equal(wv[dy, c:, :f], 0.0)
        np.testing.assert_array_equal(wv[dy, c:, f:], k[dy, 2])


def test_supported_predicate():
    assert pair_conv_supported((1, 48, 48, 64), 3, 3, (1, 1), "SAME", False)
    assert not pair_conv_supported((1, 48, 41, 64), 3, 3, (1, 1), "SAME", False)
    # ragged H (44 % 8 != 0): supported via the adaptive row tile
    assert pair_conv_supported((1, 44, 48, 64), 3, 3, (1, 1), "SAME", False)
    assert not pair_conv_supported((1, 45, 48, 64), 3, 3, (1, 1), "SAME", False)
    # VALID rides the SAME kernel + interior crop
    assert pair_conv_supported((1, 48, 48, 64), 3, 3, (1, 1), "VALID", False)
    assert not pair_conv_supported((1, 48, 48, 64), 3, 3, (1, 1), "SAME", True)
    # compiled Mosaic needs C % 64 == 0 and (W/2) % 8 == 0 ((8,128)-aligned
    # halo DMA slices); the C=1 stem and narrow inputs stay on XLA
    assert not pair_conv_supported((1, 48, 48, 1), 3, 3, (1, 1), "SAME", False)
    assert not pair_conv_supported((1, 48, 48, 8), 3, 3, (1, 1), "SAME", False)
    assert not pair_conv_supported((1, 48, 40, 64), 3, 3, (1, 1), "SAME", False)
    assert pair_conv_supported((1, 48, 48, 128), 3, 3, (1, 1), "SAME", False)
    assert pair_conv_supported((1, 592, 576, 64), 3, 3, (1, 1), "SAME", False)


def test_pick_row_tile():
    from unet_research_tpu.ops.pallas.pair_conv import _pick_row_tile

    assert _pick_row_tile(592, 8) == 8
    assert _pick_row_tile(74, 8) == 2
    assert _pick_row_tile(20, 8) == 5
    assert _pick_row_tile(22, 8) == 2
    assert _pick_row_tile(6, 8) == 6


@pytest.mark.parametrize("stats", [False, True])
def test_grad_matches_xla_conv_interpret(rng, stats):
    """Custom VJP vs jax.grad of lax.conv on the same scalar loss, with the
    stats side outputs (when on) also contributing through a GN-like use."""
    x = jnp.asarray(rng.standard_normal((2, 16, 12, 8)).astype(np.float32))
    k = jnp.asarray(0.1 * rng.standard_normal((3, 3, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((2, 16, 12, 4)).astype(np.float32))

    def loss_pair(x, k):
        if stats:
            y, s1, s2 = conv3x3_pair(x, k, stats=True, interpret=True)
            return jnp.sum(y * w) + jnp.sum(jnp.sin(s1)) + jnp.sum(s2 * 1e-2)
        return jnp.sum(conv3x3_pair(x, k, interpret=True) * w)

    def loss_ref(x, k):
        y = _ref_conv(x, k)
        if stats:
            y64 = y.astype(jnp.float32)
            s1 = jnp.sum(y64, axis=(1, 2))
            s2 = jnp.sum(y64 * y64, axis=(1, 2))
            return jnp.sum(y * w) + jnp.sum(jnp.sin(s1)) + jnp.sum(s2 * 1e-2)
        return jnp.sum(y * w)

    dx_p, dk_p = jax.grad(loss_pair, argnums=(0, 1))(x, k)
    dx_r, dk_r = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dk_p), np.asarray(dk_r),
                               rtol=2e-4, atol=2e-4)


@cpu_only
def test_model_train_grads_pair_vs_xla_interpret(rng, monkeypatch):
    """Full training gradient with conv_impl='pair' (interpret) vs 'xla' on a
    tiny UNet + masked-BCE loss: the VJP composes through GN-from-sums,
    fold_rescale and remat."""
    import dataclasses as dc

    import unet_research_tpu.ops.pallas.pair_conv as pc
    from unet_research_tpu.models.unet import UNet, canonical_config
    from unet_research_tpu.ops.losses import masked_rescaled_bce

    monkeypatch.setattr(pc, "INTERPRET", True)
    cfg = canonical_config(filters=8, model_depth=2, group_norm_groups=4,
                           dtype=jnp.float32, conv_impl="pair", remat=True)
    cfg_x = dc.replace(cfg, conv_impl="xla")
    x = jnp.asarray(rng.random((1, 8, 8, 1), np.float32))
    gt = jnp.asarray((rng.random((1, 8, 8, 1)) > 0.5).astype(np.float32))
    fov = jnp.ones_like(gt)
    params = UNet(cfg_x).init(jax.random.PRNGKey(0), x)["params"]

    def loss(p, cfg):
        pred = UNet(cfg).apply(
            {"params": p}, x, drop_prob=0.1,
            rngs={"dropblock": jax.random.PRNGKey(7)},
        )
        return masked_rescaled_bce(pred, gt, fov)

    # jit the whole grad: one trace of the interpret-mode kernels instead of
    # per-primitive eager dispatch (~2x faster on the CPU suite)
    gp = jax.jit(lambda p: jax.grad(loss)(p, cfg))(params)
    gx = jax.jit(lambda p: jax.grad(loss)(p, cfg_x))(params)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_x = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gx)}
    for key, v in flat_p:
        ref = flat_x[jax.tree_util.keystr(key)]
        np.testing.assert_allclose(np.asarray(v), np.asarray(ref),
                                   rtol=5e-3, atol=5e-5,
                                   err_msg=jax.tree_util.keystr(key))


@cpu_only
def test_model_path_pair_conv_interpret(rng, monkeypatch):
    """conv_impl='pair' through the tiny UNet on CPU (interpret hook): the
    full model wiring — eligibility gates, moment-sum plumbing into
    group_norm_coeffs_from_sums — matches the XLA lowering with shared
    params. f32 end to end so only the GN-from-sums algebra differs."""
    import unet_research_tpu.ops.pallas.pair_conv as pc
    from unet_research_tpu.models.unet import UNet, canonical_config

    monkeypatch.setattr(pc, "INTERPRET", True)
    cfg = canonical_config(filters=8, model_depth=2, group_norm_groups=4,
                           dtype=jnp.float32, conv_impl="pair")
    cfg_x = dataclasses.replace(cfg, conv_impl="xla")
    x = jnp.asarray(rng.random((1, 16, 8, 1), np.float32))
    params = UNet(cfg_x).init(jax.random.PRNGKey(0), x)
    yp = np.asarray(jax.jit(UNet(cfg).apply)(params, x))
    yx = np.asarray(jax.jit(UNet(cfg_x).apply)(params, x))
    np.testing.assert_allclose(yp, yx, rtol=2e-4, atol=2e-4)


@cpu_only
def test_model_path_pair_conv_valid_interpret(rng, monkeypatch):
    """conv_impl='pair' through the same_padding=False (VALID + center-crop
    skips) builder variant: even-dim sites ride the cropped pair kernel,
    odd-dim sites fall back to XLA, outputs match the pure-XLA lowering."""
    import unet_research_tpu.ops.pallas.pair_conv as pc
    from unet_research_tpu.models.unet import UNet, canonical_config

    monkeypatch.setattr(pc, "INTERPRET", True)
    cfg = canonical_config(filters=8, model_depth=2, group_norm_groups=4,
                           dtype=jnp.float32, conv_impl="pair",
                           same_padding=False)
    cfg_x = dataclasses.replace(cfg, conv_impl="xla")
    x = jnp.asarray(rng.random((1, 40, 40, 1), np.float32))
    params = UNet(cfg_x).init(jax.random.PRNGKey(0), x)
    yp = np.asarray(jax.jit(UNet(cfg).apply)(params, x))
    yx = np.asarray(jax.jit(UNet(cfg_x).apply)(params, x))
    np.testing.assert_allclose(yp, yx, rtol=2e-4, atol=2e-4)


@tpu_only
def test_model_path_pair_conv(rng):
    """conv_impl='pair' through a small UNet on TPU: eval forward matches
    the XLA lowering to bf16 tolerance with shared params. filters=64 and
    W=48 ((W/2) % 8 == 0) so the compiled eligibility gate actually routes
    the 64->64 and 128->64 sites through the Mosaic kernel — a filters=8 or
    W=40 model would fall back to XLA everywhere and test nothing."""
    from unet_research_tpu.models.unet import UNet, canonical_config

    cfg = canonical_config(filters=64, model_depth=2, group_norm_groups=8,
                           dtype=jnp.bfloat16, conv_impl="pair")
    cfg_x = dataclasses.replace(cfg, conv_impl="xla")
    x = jnp.asarray(rng.random((1, 48, 48, 1), np.float32))
    params = UNet(cfg_x).init(jax.random.PRNGKey(0), x)
    yp = np.asarray(UNet(cfg).apply(params, x))
    yx = np.asarray(UNet(cfg_x).apply(params, x))
    np.testing.assert_allclose(yp, yx, rtol=0.05, atol=0.02)
