"""Pallas mask-producer dropblock kernel tests.

Full semantics run on TPU (skipped on the CPU test mesh — hardware PRNG);
tests assert the same invariants the pure-XLA goldens satisfy: drop-rate
statistics, count/mask consistency, key independence, identity at gamma=0,
and block geometry. The bit-plane expansion helper is pure jnp and is
covered off-TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_research_tpu.ops.pallas.dropblock_kernel import (
    _pick_ht,
    dropblock_fused_apply,
    dropblock_pallas_mask,
    expand_bit_planes,
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


def test_pick_ht_known_sites():
    """Lane-padded tile sizing is pure Python — pin the shipped values so an
    edit can't silently reintroduce the scoped-vmem OOM (ADVICE r4). The
    canonical model's extreme sites: the padded top level (C=64 -> 128
    lanes) and the widest unpadded skip site (C=512)."""
    assert _pick_ht(592, 576, 64) == 8  # lane-padded: 576*128*20 B/row
    assert _pick_ht(74, 72, 512) == 16  # unpadded: C=512 is already 128-aligned
    assert _pick_ht(592, 576, 1) == 8  # C=1 pads to a full 128-lane register
    # small shapes take the whole tensor in one tile
    assert _pick_ht(48, 40, 8) == 48


def test_pick_ht_over_budget_raises():
    """A single 8-row strip that exceeds the 16M scoped-vmem ceiling must
    fail loudly at trace time, not inside Mosaic compile (ADVICE r4)."""
    with pytest.raises(ValueError, match="scoped vmem"):
        _pick_ht(8, 4096, 64)  # 8*4096*128*20 B = 80M > 16M


def test_expand_bit_planes_matches_dense():
    """The interleaved-word width expansion equals a dense separable OR
    (pure jnp, runs on CPU). Positions q = t*WG + g over W=70, WG=3."""
    rng = np.random.default_rng(0)
    w, wg, p = 70, 3, 3
    dense = (rng.random((8, wg * 32)) < 0.03).astype(np.uint32)
    dense[:, w:] = 0
    # pack: bit t of word g = position t*wg + g
    words = np.zeros((8, wg), np.uint32)
    for q in range(w):
        t, g = divmod(q, wg)
        words[:, g] |= dense[:, q] << t
    planes = jnp.asarray(words.view(np.int32)).reshape(8, wg, 1)
    out = np.asarray(expand_bit_planes(planes, p, wg=wg)).reshape(8, wg)
    # reference: dense OR over +-p
    ref = np.zeros_like(dense)
    for s in range(-p, p + 1):
        lo, hi = max(0, -s), min(wg * 32, wg * 32 - s)
        ref[:, lo:hi] |= dense[:, lo + s : hi + s]
    got = np.zeros_like(dense)
    for q in range(wg * 32):
        t, g = divmod(q, wg)
        got[:, q] = (out[:, g].view(np.uint32) >> t) & 1
    np.testing.assert_array_equal(got[:, :w], ref[:, :w])


@tpu_only
def test_statistics_and_counts():
    from unet_research_tpu.ops.dropblock import dropblock_gamma_dependent

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
    # samples draw independent masks from one call
    assert (mask[0] != mask[1]).any()


@tpu_only
def test_key_independence_and_identity():
    shape = (1, 48, 40, 4)
    a, _ = dropblock_pallas_mask(shape, jax.random.PRNGKey(1), 0.01, 5)
    b, _ = dropblock_pallas_mask(shape, jax.random.PRNGKey(2), 0.01, 5)
    assert (np.asarray(a) != np.asarray(b)).any()
    ident, keep = dropblock_pallas_mask(shape, jax.random.PRNGKey(1), 0.0, 5)
    np.testing.assert_array_equal(np.asarray(ident), 1)
    np.testing.assert_allclose(np.asarray(keep), 48 * 40 * 4)


@tpu_only
def test_block_geometry():
    # a sparse draw must produce axis-aligned b x b zero blocks
    b = 5
    for s in range(50):
        mask, _ = dropblock_pallas_mask((1, 40, 40, 1), jax.random.PRNGKey(s), 0.002, b)
        nz = np.asarray(mask)[0, :, :, 0] == 0
        if nz.sum() == b * b:
            ys, xs = np.where(nz)
            assert ys.max() - ys.min() == b - 1
            assert xs.max() - xs.min() == b - 1
            return
    pytest.skip("no single-block draw found")


@tpu_only
def test_model_path_kernel_impl():
    """mask_impl='kernel' through dropblock_dependent: correct rescale and
    finite output on TPU."""
    from unet_research_tpu.ops.dropblock import dropblock_dependent

    x = jnp.ones((4, 64, 64, 8), jnp.float32)
    out = np.asarray(dropblock_dependent(x, jax.random.PRNGKey(0), 0.15, 7,
                                         mask_impl="kernel"))
    assert np.isfinite(out).all()
    assert abs((out == 0).mean() - 0.15) < 0.04
    kept = out[out > 0]
    if kept.size:
        np.testing.assert_allclose(kept, out.size / np.count_nonzero(out), rtol=1e-4)


@tpu_only
def test_fused_apply_matches_producer():
    """The fused epilogue kernel draws the SAME mask stream as the producer
    kernel for the same key (both seed the hardware PRNG per (key, sample,
    strip)), so act((x*a+b)*mask) must match exactly, counts included."""
    rng = np.random.default_rng(0)
    shape = (3, 96, 80, 8)
    key = jax.random.PRNGKey(11)
    gamma = 0.004
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    a = jnp.asarray(rng.random((3, 8)).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.standard_normal((3, 8)).astype(np.float32) * 0.1)
    mask, keep_ref = dropblock_pallas_mask(shape, key, gamma, 7)
    out, keep = dropblock_fused_apply(x, jnp.stack([a, b]), key, gamma, 7,
                                      act="relu")
    ref = np.maximum(
        (np.asarray(x) * np.asarray(a)[:, None, None, :]
         + np.asarray(b)[:, None, None, :]) * np.asarray(mask), 0.0
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(keep), np.asarray(keep_ref))


@tpu_only
def test_fused_apply_modes():
    """affine=None + act='none' (the merge-site form) is x*mask;
    leaky_relu keeps the negative slope."""
    rng = np.random.default_rng(1)
    shape = (2, 64, 72, 4)
    key = jax.random.PRNGKey(5)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    mask, _ = dropblock_pallas_mask(shape, key, 0.01, 5)
    out, _ = dropblock_fused_apply(x, None, key, 0.01, 5, act="none")
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(x) * np.asarray(mask), rtol=1e-6)
    out_l, _ = dropblock_fused_apply(x, None, key, 0.01, 5,
                                     act="leaky_relu", slope=0.2)
    ref = np.asarray(x) * np.asarray(mask)
    ref = np.where(ref > 0, ref, 0.2 * ref)
    np.testing.assert_allclose(np.asarray(out_l), ref, rtol=1e-5, atol=1e-6)


@tpu_only
def test_fused_model_forward():
    """mask_impl='fused' end-to-end through the tiny UNet: runs, finite, and
    the eval path (drop_prob=None) is identical to the elementwise config."""
    import dataclasses

    from unet_research_tpu.models.unet import DropBlockConfig, UNet, canonical_config

    cfg = canonical_config(
        filters=8, model_depth=2, group_norm_groups=4, dtype=jnp.bfloat16,
        dropblock=DropBlockConfig(kind="independent", block_size=7,
                                  mask_impl="fused"),
    )
    x = jnp.asarray(np.random.default_rng(3).random((2, 48, 40, 1), np.float32))
    params = UNet(cfg).init(
        {"params": jax.random.PRNGKey(0), "dropblock": jax.random.PRNGKey(1)},
        x, drop_prob=0.1,
    )
    out = UNet(cfg).apply(params, x, drop_prob=0.1,
                          rngs={"dropblock": jax.random.PRNGKey(2)})
    assert out.shape == (2, 48, 40, 1)
    assert np.isfinite(np.asarray(out)).all()
    cfg_e = dataclasses.replace(
        cfg, dropblock=dataclasses.replace(cfg.dropblock, mask_impl="elementwise"))
    e1 = UNet(cfg).apply(params, x)
    e2 = UNet(cfg_e).apply(params, x)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
