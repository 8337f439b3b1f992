"""Torch/PL checkpoint -> Flax params converter.

Lets a reference user bring their trained PL checkpoints
(UNetTraining.load_from_checkpoint targets, base_model_tests/training.py:119)
into this framework. The mapping follows the reference builder's Sequential
layout exactly (utils_unet.py:162-406):

  down_blocks.{d}.0.{4i}   Conv2d      -> down{d}/conv{i}
  down_blocks.{d}.0.{4i+1} GroupNorm   -> down{d}/norm{i}
  down_blocks.{d}.1.0      pool conv   -> pool{d}/pool_conv   ('conv' mode)
  down_blocks.{d}.1.1      GroupNorm   -> pool{d}/pool_norm
  conn_block.{4i}/{4i+1}               -> conn/conv{i},norm{i}
  up_blocks.{d}.0.0        ConvTransp. -> up{d}/up_conv       ('upconv')
  up_blocks.{d}.0.1        Conv2d      -> up{d}/up_conv       ('upsample')
  up_blocks.{d}.0.{1|2}    GroupNorm   -> up{d}/up_norm
  up_blocks.{d}.1.{4i}/{4i+1}          -> post{d}/conv{i},norm{i}
  output_conv.0            1x1 Conv2d  -> head

(each Sequential slot exists even for Identity norm/dropblock, so indices
are config-independent; dropblock/activation slots hold no params).

Weight layout: Conv2d OIHW -> HWIO; ConvTranspose2d (in,out,kh,kw) ->
(kh,kw,in,out) with NO spatial flip — DepthToSpaceUpConv deliberately uses
torch's stamp orientation (models/unet.py). PL prefixes ('_model.',
'model.') and fairscale wrapper artifacts ('.module') are stripped.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _normalize_key(k: str) -> str:
    # strip nested wrapper prefixes: a PL ckpt of the reference holds the
    # UNet at '_model.' inside UNetTraining (utils_training.py:12), itself
    # possibly under 'model.' in subclasses — strip until none match
    stripped = True
    while stripped:
        stripped = False
        for prefix in ("_model.", "model."):
            if k.startswith(prefix):
                k = k[len(prefix):]
                stripped = True
    return k.replace(".module.", ".").replace("module.", "")


def _conv_w(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _convt_w(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 0, 1)))


def torch_state_dict_to_params(state_dict: Mapping[str, Any], cfg) -> dict:
    """Convert a reference-UNet torch state dict to our Flax param tree
    (GroupNorm/no-norm models — for BatchNorm models use
    torch_state_dict_to_variables, which also carries the running stats)."""
    return torch_state_dict_to_variables(state_dict, cfg)["params"]


def torch_state_dict_to_variables(state_dict: Mapping[str, Any], cfg) -> dict:
    """Convert a reference-UNet torch state dict to a Flax variables dict:
    {'params': ...} plus, when the reference model used BatchNorm (its
    set_normalization accepts any norm class, utils_unet.py:136-153),
    {'batch_stats': ...} holding running_mean/running_var as mean/var.

    cfg: UNetConfig (for model_depth / conv_layers_per_block / pool & up
    modes). Values may be torch tensors or numpy arrays.
    """
    sd = {}
    for k, v in state_dict.items():
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        sd[_normalize_key(k)] = arr

    params: dict = {}
    bstats: dict = {}

    def put(path: str, leaf: str, value, tree=None):
        node = params if tree is None else tree
        for part in path.split("/"):
            node = node.setdefault(part, {})
        node[leaf] = value

    def conv_slot(src: str, dst: str, transpose=_conv_w):
        w = sd.get(f"{src}.weight")
        if w is None:
            return False
        put(dst, "kernel", transpose(w))
        b = sd.get(f"{src}.bias")
        if b is not None:
            put(dst, "bias", np.asarray(b))
        return True

    def norm_slot(src: str, dst: str):
        w = sd.get(f"{src}.weight")
        if w is None:
            return False  # Identity norm
        put(dst, "scale", np.asarray(w))
        put(dst, "bias", np.asarray(sd[f"{src}.bias"]))
        rm = sd.get(f"{src}.running_mean")
        if rm is not None:  # BatchNorm2d: running stats -> 'batch_stats'
            put(dst, "mean", np.asarray(rm), tree=bstats)
            put(dst, "var", np.asarray(sd[f"{src}.running_var"]), tree=bstats)
        return True

    n_convs = cfg.conv_layers_per_block
    for d in range(cfg.model_depth):
        for i in range(n_convs):
            conv_slot(f"down_blocks.{d}.0.{4 * i}", f"down{d}/conv{i}")
            norm_slot(f"down_blocks.{d}.0.{4 * i + 1}", f"down{d}/norm{i}")
        if cfg.pool_mode == "conv":
            conv_slot(f"down_blocks.{d}.1.0", f"pool{d}/pool_conv")
        norm_slot(f"down_blocks.{d}.1.1", f"pool{d}/pool_norm")

    for i in range(n_convs):
        conv_slot(f"conn_block.{4 * i}", f"conn/conv{i}")
        norm_slot(f"conn_block.{4 * i + 1}", f"conn/norm{i}")

    for d in range(cfg.model_depth):
        if cfg.up_mode == "upconv":
            conv_slot(f"up_blocks.{d}.0.0", f"up{d}/up_conv", transpose=_convt_w)
            norm_slot(f"up_blocks.{d}.0.1", f"up{d}/up_norm")
        else:
            conv_slot(f"up_blocks.{d}.0.1", f"up{d}/up_conv")
            norm_slot(f"up_blocks.{d}.0.2", f"up{d}/up_norm")
        for i in range(n_convs):
            conv_slot(f"up_blocks.{d}.1.{4 * i}", f"post{d}/conv{i}")
            norm_slot(f"up_blocks.{d}.1.{4 * i + 1}", f"post{d}/norm{i}")

    conv_slot("output_conv.0", "head")
    out = {"params": params}
    if bstats:
        out["batch_stats"] = bstats
    return out


def load_torch_checkpoint(path: str, cfg) -> dict:
    """Load a PL .ckpt (or raw torch state dict) and convert (params tree;
    use load_torch_checkpoint_variables for BatchNorm models)."""
    return load_torch_checkpoint_variables(path, cfg)["params"]


def load_torch_checkpoint_variables(path: str, cfg) -> dict:
    """Load a PL .ckpt (or raw torch state dict) and convert to variables."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload) if isinstance(payload, dict) else payload
    return torch_state_dict_to_variables(sd, cfg)


def assert_params_match(template, converted) -> None:
    """Raise if the converted tree's shapes don't cover the template."""
    import jax

    t_flat = dict(jax.tree_util.tree_flatten_with_path(template)[0])
    c_flat = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    missing = set(map(str, t_flat)) - set(map(str, c_flat))
    if missing:
        raise ValueError(f"converted checkpoint missing params: {sorted(missing)[:5]}...")
    for k, v in t_flat.items():
        cv = c_flat.get(k)
        if cv is not None and tuple(cv.shape) != tuple(v.shape):
            raise ValueError(f"shape mismatch at {k}: {cv.shape} vs {v.shape}")


def main(argv=None):
    """Convert a reference PL/torch .ckpt to this framework's msgpack format.

    Usage:
      python -m unet_research_tpu.utils.convert SRC.ckpt DST.ckpt \
          [-filters 64] [-model_depth 4] [-group_norm_groups 32] \
          [-norm group|batch|none] [-activation relu|...]

    The arch flags must describe the reference model the checkpoint was
    trained with (the reference hardcodes the canonical 31M config,
    base_model_tests/training.py:171-192 — the defaults here). BatchNorm
    checkpoints carry their running stats into the 'batch_stats' bundle the
    eval surfaces restore."""
    import argparse

    from unet_research_tpu.models import DropBlockConfig, canonical_config
    from unet_research_tpu.train.checkpoint import save_checkpoint

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("-filters", type=int, default=64)
    p.add_argument("-model_depth", type=int, default=4)
    p.add_argument("-group_norm_groups", type=int, default=32)
    p.add_argument("-norm", default="group")
    p.add_argument("-activation", default="relu")
    a = p.parse_args(argv)
    cfg = canonical_config(
        filters=a.filters, model_depth=a.model_depth,
        group_norm_groups=a.group_norm_groups,
        norm=None if a.norm == "none" else a.norm, activation=a.activation,
        dropblock=DropBlockConfig(kind="dependent"),
    )
    import jax

    variables = load_torch_checkpoint_variables(a.src, cfg)
    payload = variables if "batch_stats" in variables else variables["params"]
    save_checkpoint(a.dst, payload, meta={"converted_from": a.src})
    n = sum(int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"converted {a.src} -> {a.dst} ({n:,} params)")


if __name__ == "__main__":
    main()
