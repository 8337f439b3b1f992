"""Torch-checkpoint conversion tests: per-op weight-layout equivalence vs
torch CPU, plus full-tree structural coverage for the canonical config."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from unet_research_tpu.models import UNet, canonical_config
from unet_research_tpu.utils.convert import (
    _conv_w,
    _convt_w,
    assert_params_match,
    torch_state_dict_to_params,
)


def test_conv_weight_layout(rng):
    x = rng.random((1, 5, 9, 8), dtype=np.float32)  # NHWC
    w = rng.random((4, 8, 3, 3), dtype=np.float32)  # torch OIHW
    ref = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w), padding=1)
    ours = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(_conv_w(w)), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5
    )


def test_convtranspose_weight_layout(rng):
    from unet_research_tpu.models.unet import DepthToSpaceUpConv
    import flax.linen as nn

    x = rng.random((1, 4, 6, 8), dtype=np.float32)
    w = rng.random((8, 4, 2, 2), dtype=np.float32)  # torch (in, out, kh, kw)
    ref = F.conv_transpose2d(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w), stride=2)
    mod = DepthToSpaceUpConv(
        features=4, use_bias=False,
        kernel_init=nn.initializers.zeros_init(), bias_init=nn.initializers.zeros_init(),
    )
    out = mod.apply({"params": {"kernel": jnp.asarray(_convt_w(w))}}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5
    )


def _synthetic_reference_state_dict(filters=8, depth=2, convs=2, in_ch=1, out_ch=1):
    """Reference-layout state dict with the right shapes (GroupNorm config:
    conv biases disabled, Identity-free indices per utils_unet.py)."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv(name, cin, cout, k=3):
        sd[f"{name}.weight"] = rng.random((cout, cin, k, k)).astype(np.float32)

    def norm(name, c):
        sd[f"{name}.weight"] = rng.random(c).astype(np.float32)
        sd[f"{name}.bias"] = rng.random(c).astype(np.float32)

    f = filters
    cin = in_ch
    for d in range(depth):
        cout = f if d == 0 else f * 2
        if d > 0:
            f *= 2
        # fairscale-style 'module.' artifacts on some entries
        conv(f"down_blocks.{d}.0.module.0", cin, cout)
        norm(f"down_blocks.{d}.0.4" if False else f"down_blocks.{d}.0.1", cout)
        conv(f"down_blocks.{d}.0.4", cout, cout)
        norm(f"down_blocks.{d}.0.5", cout)
        norm(f"down_blocks.{d}.1.1", cout)
        cin = cout
    conv("conn_block.0", f, f * 2)
    norm("conn_block.1", f * 2)
    conv("conn_block.4", f * 2, f * 2)
    norm("conn_block.5", f * 2)
    f *= 2
    for d in range(depth):
        sd[f"up_blocks.{d}.0.0.weight"] = rng.random((f, f // 2, 2, 2)).astype(np.float32)
        f //= 2
        norm(f"up_blocks.{d}.0.1", f)
        conv(f"up_blocks.{d}.1.0", f * 2, f)  # cat connection doubles input
        norm(f"up_blocks.{d}.1.1", f)
        conv(f"up_blocks.{d}.1.4", f, f)
        norm(f"up_blocks.{d}.1.5", f)
    conv("output_conv.0", f, out_ch, k=1)
    return sd


def test_full_tree_conversion_matches_canonical_structure():
    cfg = canonical_config(filters=8, model_depth=2, group_norm_groups=4)
    model = UNet(cfg)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    sd = _synthetic_reference_state_dict()
    converted = torch_state_dict_to_params(sd, cfg)
    assert_params_match(template, converted)
    # converted params actually run
    out = model.apply({"params": converted}, jnp.ones((1, 32, 32, 1)) * 0.5)
    assert out.shape == (1, 32, 32, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_pl_prefix_stripping():
    cfg = canonical_config(filters=8, model_depth=2, group_norm_groups=4)
    sd = {f"_model.{k}": v for k, v in _synthetic_reference_state_dict().items()}
    converted = torch_state_dict_to_params(sd, cfg)
    model = UNet(cfg)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    assert_params_match(template, converted)


def test_convert_cli_roundtrip(tmp_path):
    """python -m unet_research_tpu.utils.convert SRC DST: the written msgpack
    checkpoint loads via train.checkpoint.load_checkpoint and matches the
    in-process conversion."""
    from unet_research_tpu.train.checkpoint import load_checkpoint
    from unet_research_tpu.utils import convert as convert_mod

    sd = {k: torch.from_numpy(v) for k, v in _synthetic_reference_state_dict().items()}
    src = str(tmp_path / "ref.ckpt")
    dst = str(tmp_path / "out.ckpt")
    torch.save({"state_dict": sd}, src)

    convert_mod.main([src, dst, "-filters", "8", "-model_depth", "2",
                      "-group_norm_groups", "4"])

    cfg = canonical_config(filters=8, model_depth=2, group_norm_groups=4)
    template = UNet(cfg).init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    params, meta, _ = load_checkpoint(dst, params_template=template)
    direct = torch_state_dict_to_params(
        {k: v.numpy() for k, v in sd.items()}, cfg)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(direct)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert meta["converted_from"] == src
