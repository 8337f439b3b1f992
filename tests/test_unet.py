"""UNet architecture tests: shapes, modes, autopad round-trip, param budget.

Mirrors the reference's notebook smoke checks (base_model_tests/test.ipynb:
forward at odd 585x564, both norm settings, both dropblock classes) as real
automated tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_research_tpu.models import (
    DropBlockConfig,
    UNet,
    UNetConfig,
    canonical_config,
    param_count,
)


def make_model(cfg, h=64, w=64):
    model = UNet(cfg)
    x = jnp.zeros((1, h, w, cfg.init_channels))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def test_canonical_param_count():
    cfg = canonical_config()
    model = UNet(cfg)
    # eval_shape: the count needs shapes only, not a real 31M-param init
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, cfg.init_channels)))
    n = param_count(variables["params"])
    # the classic 31M-param U-Net (encoder 64..512, bottleneck 1024); the
    # reference's GroupNorm setup disables conv biases everywhere.
    assert 30_000_000 < n < 32_000_000, n


def test_forward_odd_size_autopad():
    # odd-size forward must round-trip through autopad (the reference smoke
    # test runs 585x564, test.ipynb cells 11-14; we keep the odd-size shape
    # semantics but a small width so the CPU test stays fast)
    cfg = canonical_config(filters=8)
    cfg = UNetConfig(**{**cfg.__dict__, "group_norm_groups": 4})
    model, variables = make_model(cfg, 64, 64)
    x = jnp.ones((1, 61, 44, 1)) * 0.5
    out = model.apply(variables, x)
    assert out.shape == (1, 61, 44, 1)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0


@pytest.mark.parametrize("pool_mode", ["max", "avg", "conv"])
@pytest.mark.parametrize("up_mode", ["upconv", "upsample"])
def test_pool_up_modes(pool_mode, up_mode):
    cfg = canonical_config(pool_mode=pool_mode, up_mode=up_mode, filters=8)
    cfg = UNetConfig(**{**cfg.__dict__, "group_norm_groups": 4, "model_depth": 2})
    model, variables = make_model(cfg, 32, 32)
    out = model.apply(variables, jnp.ones((2, 32, 32, 1)))
    assert out.shape == (2, 32, 32, 1)


@pytest.mark.parametrize("connection", ["cat", "add", "none"])
def test_connections(connection):
    cfg = canonical_config(connection=connection, filters=8)
    cfg = UNetConfig(**{**cfg.__dict__, "group_norm_groups": 4, "model_depth": 2})
    model, variables = make_model(cfg, 32, 32)
    out = model.apply(variables, jnp.ones((1, 32, 32, 1)))
    assert out.shape == (1, 32, 32, 1)


def test_valid_padding_shrinks_and_crops():
    cfg = canonical_config(same_padding=False, filters=8)
    cfg = UNetConfig(**{**cfg.__dict__, "group_norm_groups": 4, "model_depth": 2})
    model, variables = make_model(cfg, 64, 64)
    out = model.apply(variables, jnp.ones((1, 64, 64, 1)))
    # valid padding shrinks the canvas; output must not exceed the input size
    assert out.shape[0] == 1 and out.shape[3] == 1
    assert out.shape[1] <= 64 and out.shape[2] <= 64


def test_dropblock_paths():
    cfg = canonical_config(filters=8)
    cfg = UNetConfig(
        **{
            **cfg.__dict__,
            "group_norm_groups": 4,
            "model_depth": 2,
            "dropblock": DropBlockConfig(kind="dependent", block_size=5),
        }
    )
    model, variables = make_model(cfg, 32, 32)
    x = jnp.ones((1, 32, 32, 1)) * 0.3

    # eval path: no rngs needed when drop_prob is None
    out_eval = model.apply(variables, x)
    # train/MC path: dropblock active
    out_db1 = model.apply(
        variables, x, drop_prob=0.3, rngs={"dropblock": jax.random.PRNGKey(1)}
    )
    out_db2 = model.apply(
        variables, x, drop_prob=0.3, rngs={"dropblock": jax.random.PRNGKey(2)}
    )
    assert not np.allclose(np.asarray(out_db1), np.asarray(out_db2))
    assert not np.allclose(np.asarray(out_eval), np.asarray(out_db1))
    # independent variant runs too
    cfg_i = UNetConfig(
        **{**cfg.__dict__, "dropblock": DropBlockConfig(kind="independent", block_size=5)}
    )
    model_i = UNet(cfg_i)
    out_i = model_i.apply(
        variables, x, drop_prob=0.3, rngs={"dropblock": jax.random.PRNGKey(1)}
    )
    assert out_i.shape == x.shape


def test_remat_matches_no_remat():
    cfg = canonical_config(filters=8)
    base = {**cfg.__dict__, "group_norm_groups": 4, "model_depth": 2}
    cfg_plain = UNetConfig(**base)
    cfg_remat = UNetConfig(**{**base, "remat": True})
    model_p, variables = make_model(cfg_plain, 32, 32)
    model_r = UNet(cfg_remat)
    x = jnp.linspace(0, 1, 32 * 32).reshape(1, 32, 32, 1)
    np.testing.assert_allclose(
        np.asarray(model_p.apply(variables, x)),
        np.asarray(model_r.apply(variables, x)),
        rtol=1e-6,
        atol=1e-6,
    )
    # gradients flow through the remat path
    def loss_fn(params):
        return jnp.sum(model_r.apply({"params": params}, x))

    grads = jax.grad(loss_fn)(variables["params"])
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads))


def test_config_validation():
    with pytest.raises(ValueError):
        canonical_config(connection="bogus")
    with pytest.raises(ValueError):
        canonical_config(pool_mode="bogus")
    with pytest.raises(ValueError):
        canonical_config(up_mode="bogus")
    with pytest.raises(ValueError):
        canonical_config(conv_layers_per_block=1)


def test_jit_vs_eager_parity():
    """SURVEY §5: jit-vs-eager parity assertion — the compiled forward must
    match op-by-op eager execution."""
    cfg = canonical_config(filters=8)
    cfg = UNetConfig(**{**cfg.__dict__, "group_norm_groups": 4, "model_depth": 2})
    model, variables = make_model(cfg, 48, 40)
    x = jnp.linspace(0, 1, 48 * 40).reshape(1, 48, 40, 1)
    eager = model.apply(variables, x)
    jitted = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), rtol=1e-5, atol=1e-6)
