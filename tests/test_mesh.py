"""Mesh/sharding tests on the 8-virtual-device CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_research_tpu.parallel import data_sharding, make_mesh, replicated


def test_mesh_axes():
    mesh = make_mesh(data=8, model=1)
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == 8

    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.shape == {"data": 4, "model": 2}

    with pytest.raises(ValueError):
        make_mesh(data=16, model=1)


def test_dp_train_step_matches_single_device(tmp_path):
    """A data-parallel step over 8 devices must produce the same update as
    the same batch on one device (the gradient psum is exact)."""
    from unet_research_tpu.models import DropBlockConfig, UNet, UNetConfig, canonical_config
    from unet_research_tpu.train import POLICIES, Trainer, TrainerConfig

    cfg = canonical_config(filters=8)
    cfg = UNetConfig(
        **{
            **cfg.__dict__,
            "group_norm_groups": 4,
            "model_depth": 2,
            "dropblock": DropBlockConfig(kind=None),
        }
    )
    model = UNet(cfg)
    tcfg = TrainerConfig(auto_lr_find=False, lr=0.05, verbose=False)

    mesh = make_mesh(data=8)
    t_dp = Trainer(model, POLICIES["none"], tcfg, mesh=mesh)
    t_sd = Trainer(model, POLICIES["none"], tcfg)

    params = t_sd.init_params(seed=0)
    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.random((8, 32, 32, 1), dtype=np.float32))
    gt = (jnp.asarray(rng.random((8, 32, 32, 1))) > 0.5).astype(jnp.float32)
    mask = jnp.ones((8, 32, 32, 1), jnp.float32)

    key = jax.random.PRNGKey(0)
    s_dp = t_dp.create_state(params)
    s_sd = t_sd.create_state(params)
    dp = data_sharding(mesh)
    im_s, gt_s, mask_s = jax.device_put((im, gt, mask), dp)

    s_dp, loss_dp = t_dp._train_step(s_dp, im_s, gt_s, mask_s, 0.05, key, -1)
    s_sd, loss_sd = t_sd._train_step(s_sd, im, gt, mask, 0.05, key, -1)

    assert float(loss_dp) == pytest.approx(float(loss_sd), rel=2e-5)
    a = jax.tree_util.tree_leaves(s_dp.params)
    b = jax.tree_util.tree_leaves(s_sd.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=2e-4, atol=2e-6)


def test_graft_dryrun_multichip():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_compiles_small():
    """entry() returns a jittable fn; compile-check it on a small shape to
    keep CPU CI fast (the driver runs the full 584x565 on TPU)."""
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge
    from unet_research_tpu.models import UNet, canonical_config

    # same construction as entry(), smaller model+shape
    model = UNet(canonical_config(filters=8, model_depth=2, group_norm_groups=4))
    x = jnp.zeros((1, 37, 29, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    fn = jax.jit(lambda p, x: model.apply({"params": p}, x))
    out = fn(params, x)
    assert out.shape == (1, 37, 29, 1)


@pytest.mark.parametrize("chunk", [8, 32])
def test_mc_engine_sharded_chunk_sweep(chunk):
    """VERDICT r1 item 10: the sharded ensemble's mean/std match the
    single-device run to f32 at the per-device-share edge cases (chunk/8 of
    1 and 4), and the chunk->device split is exact (no ragged remainder on
    the 'data' axis)."""
    from unet_research_tpu.models import DropBlockConfig, UNet, UNetConfig, canonical_config
    from unet_research_tpu.uncertainty import MCDropBlockEngine

    cfg = canonical_config(filters=4)
    cfg = UNetConfig(
        **{
            **cfg.__dict__,
            "group_norm_groups": 2,
            "model_depth": 2,
            "dropblock": DropBlockConfig(kind="independent", block_size=3, use_scheduler=False),
        }
    )
    model = UNet(cfg)
    mesh = make_mesh(data=8)
    assert chunk % mesh.shape["data"] == 0  # per-device share is integral

    rng = np.random.default_rng(1)
    im = jnp.asarray(rng.random((1, 24, 24, 1), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), im)["params"]
    ones = jnp.ones_like(im)
    e_sharded = MCDropBlockEngine(model, num_iterations=2 * chunk, return_num=0,
                                  chunk=chunk, mesh=mesh)
    e_single = MCDropBlockEngine(model, num_iterations=2 * chunk, return_num=0,
                                 chunk=chunk)
    key = jax.random.PRNGKey(5)
    m1, s1, *_ = e_sharded.predict(params, im, im, ones, key, 0.15)
    m2, s2, *_ = e_single.predict(params, im, im, ones, key, 0.15)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-6)


def test_mc_engine_rejects_indivisible_chunk():
    from unet_research_tpu.models import UNet, canonical_config
    from unet_research_tpu.uncertainty import MCDropBlockEngine

    model = UNet(canonical_config(filters=4, model_depth=2, group_norm_groups=2))
    mesh = make_mesh(data=8)
    with pytest.raises(ValueError):
        MCDropBlockEngine(model, num_iterations=16, chunk=12, mesh=mesh)


def test_mc_engine_sharded_over_mesh():
    """MC ensemble with the chunk batch sharded over 8 devices matches the
    single-device result (mask streams derive from the batch index, so the
    sharding is numerically transparent)."""
    from unet_research_tpu.models import DropBlockConfig, UNet, UNetConfig, canonical_config
    from unet_research_tpu.uncertainty import MCDropBlockEngine

    cfg = canonical_config(filters=8)
    cfg = UNetConfig(
        **{
            **cfg.__dict__,
            "group_norm_groups": 4,
            "model_depth": 2,
            "dropblock": DropBlockConfig(kind="dependent", block_size=3, use_scheduler=False),
        }
    )
    model = UNet(cfg)
    im = jnp.ones((1, 32, 32, 1)) * 0.4
    params = model.init(jax.random.PRNGKey(0), im)["params"]

    mesh = make_mesh(data=8)
    e_sharded = MCDropBlockEngine(model, num_iterations=16, return_num=0, chunk=8, mesh=mesh)
    e_single = MCDropBlockEngine(model, num_iterations=16, return_num=0, chunk=8)
    key = jax.random.PRNGKey(3)
    m1, s1, *_ = e_sharded.predict(params, im, im, jnp.ones_like(im), key, 0.2)
    m2, s2, *_ = e_single.predict(params, im, im, jnp.ones_like(im), key, 0.2)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-6)
