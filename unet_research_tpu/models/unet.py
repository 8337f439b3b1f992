"""Configurable U-Net in Flax, NHWC, TPU-first.

Capability-parity rebuild of the reference's stateful torch builder
(reference unet_code/utils/utils_unet.py:11-463) as a functional Flax module:

- encoder blocks: first conv init_channels->filters, later blocks double
  filters; every conv is followed by norm -> dropblock -> activation
  (utils_unet.py:210-291);
- pooling: 'max' / 'avg' / stride-2 'conv' + norm (+ activation for conv
  pooling only) (utils_unet.py:263-286);
- bottleneck: one filter-doubling conv + extras (utils_unet.py:162-207);
- decoder: 'upconv' (2x2 stride-2 transpose conv) or 'upsample' (nearest x2 +
  3x3 conv), each halving filters, + norm + activation
  (utils_unet.py:294-322); skip merge 'cat'/'add'/'none' with center-crop for
  the valid-padding case and dropblock after the merge
  (utils_unet.py:376-390); post-skip conv stack (utils_unet.py:326-369);
- 1x1 conv + sigmoid head (bias disabled when a norm is set, like every
  other conv) (utils_unet.py:393-406, 144);
- autopad input to a multiple of 2**model_depth, crop back after the head,
  clamp to [0,1] and scrub NaNs (utils_unet.py:408-463).

Differences by design (TPU-native, not a port):
- NHWC layout, bf16-capable compute dtype with fp32 params;
- DropBlock drop-prob is threaded as a traced scalar argument instead of
  scheduler module state, so the linear ramp costs no recompilation;
- rematerialization via jax.checkpoint policies instead of fairscale
  checkpoint_wrapper (only applied when `remat=True`, and intended for the
  training step; inference should run with remat=False);
- per-call-site PRNG keys via linen's rng folding reproduce the reference's
  independent mask draws from a single shared module instance
  (utils_unet.py:129-134 — one instance, fresh torch RNG draw per call).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from unet_research_tpu.ops.dropblock import (
    dropblock_dependent,
    dropblock_independent,
)
from unet_research_tpu.ops.image import center_crop, crop_to, pad_to_multiple


@dataclasses.dataclass(frozen=True)
class DropBlockConfig:
    """DropBlock plug-in (reference UNet.set_dropblock, utils_unet.py:117-134).

    kind: 'dependent' (DropBlock2D) | 'independent' (Dropblock2d_ichan) | None.
    The linear schedule fields mirror LinearScheduler(start, stop, nr_steps).
    """

    kind: Optional[str] = "dependent"
    block_size: int = 7
    drop_prob: float = 0.1
    use_scheduler: bool = True
    start_drop_prob: float = 0.0
    max_drop_prob: float = 0.2
    nr_steps: int = 500
    # Mask pipeline: None (UNET_DB_IMPL env default) | 'elementwise' (XLA,
    # fastest measured end-to-end) | 'kernel' (Pallas mask producer — dense
    # s8 mask + keep counts from one kernel pass, XLA apply). See
    # ops/dropblock.py and PERF.md for the measured ladder.
    mask_impl: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Constructor-arg parity with reference UNet (utils_unet.py:14-26) plus
    TPU knobs (dtype, remat)."""

    init_channels: int = 3
    filters: int = 64
    output_channels: int = 1
    model_depth: int = 4
    pool_mode: str = "max"  # 'max' | 'avg' | 'conv'
    up_mode: str = "upconv"  # 'upconv' | 'upsample'
    connection: str = "cat"  # 'cat' | 'add' | 'none'
    same_padding: bool = True
    conv_layers_per_block: int = 2
    norm: Optional[str] = "group"  # 'group' | None
    group_norm_groups: int = 32
    activation: str = "relu"  # 'relu' | 'leaky_relu'
    negative_slope: float = 0.01
    dropblock: DropBlockConfig = dataclasses.field(default_factory=DropBlockConfig)
    remat: bool = False
    dtype: Any = jnp.float32  # compute dtype (bf16 on TPU hot paths)

    def __post_init__(self):
        if self.connection not in ("add", "cat", "none"):
            raise ValueError("Connection type must be of (add, cat, none)")
        if self.pool_mode not in ("max", "avg", "conv"):
            raise ValueError("Pool Mode must be of (max, avg, conv).")
        if self.up_mode not in ("upsample", "upconv"):
            raise ValueError("Up_Mode must be of (upsample, upconv).")
        if self.conv_layers_per_block <= 1:
            raise ValueError("Convolutional Layers in each block must be 2 or more.")
        if self.dropblock.kind not in (None, "dependent", "independent"):
            raise ValueError("dropblock.kind must be dependent/independent/None")


def canonical_config(**overrides) -> UNetConfig:
    """The configuration every reference entry point uses
    (base_model_tests/training.py:171-192 and all MF/LF/uncertainty CLIs):
    the classic 31M-parameter U-Net with GroupNorm(32) and ReLU."""
    base = dict(
        init_channels=1,
        filters=64,
        output_channels=1,
        model_depth=4,
        pool_mode="max",
        up_mode="upconv",
        connection="cat",
        same_padding=True,
        conv_layers_per_block=2,
        norm="group",
        group_norm_groups=32,
        activation="relu",
    )
    base.update(overrides)
    return UNetConfig(**base)


# --- torch-parity initializers -------------------------------------------------
# torch Conv2d resets weights with kaiming_uniform(a=sqrt(5)) wrt
# fan_in = in_ch * kh * kw  =>  U(-sqrt(1/fan_in), sqrt(1/fan_in)), which is
# variance_scaling(scale=1/3, 'fan_in', 'uniform'). Matching the init keeps
# the training trajectory (and PL-style LR finding) comparable.
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    bound = float(fan_in) ** -0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def transpose_kernel_init(out_ch: int, kh: int, kw: int):
    """torch ConvTranspose2d fan_in is out_ch*kh*kw (weight[in, out, kh, kw],
    fan computed on dim 1)."""
    bound = (out_ch * kh * kw) ** -0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _GNParams(nn.Module):
    """GroupNorm's parameter tree ('scale'/'bias' of shape (C,), ones/zeros
    init) without its computation — the fused Pallas epilogue consumes the
    raw params, and checkpoints stay interchangeable with nn.GroupNorm."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


def group_norm_affine(x, scale, bias, num_groups: int, eps: float, dtype):
    """GroupNorm (torch GroupNorm semantics: biased variance over
    (H, W, C/G) per sample, reference training.py:191) with the apply
    reassociated to one elementwise FMA.

    (x - mean) * rsqrt(var + eps) * scale + bias is algebraically
    x * a + b with per-(sample, channel) scalars
      a = rsqrt(var + eps) * scale,   b = bias - mean * a.
    Writing it this way matters on TPU: flax's nn.GroupNorm casts the full
    tensor to f32 for (x - mean), and XLA materializes that f32 intermediate
    at full resolution (measured in the round-3 MC-pass profile: the top-site
    apply fusions were reading 2.8 GB f32 copies of a 1.4 GB bf16 tensor).
    Here the only full-size tensors are the bf16 input and output; the f32
    stats are [N, C] and fold into the producing conv's epilogue reductions.
    """
    n, h, w, c = x.shape
    cg = c // num_groups
    x32 = x.astype(jnp.float32)
    # per-channel moments reduce over (H, W) first — XLA input-fuses these
    # into the producing conv — then combine channels into group moments
    s1 = jnp.sum(x32, axis=(1, 2))  # [N, C]
    s2 = jnp.sum(x32 * x32, axis=(1, 2))  # [N, C]
    g1 = s1.reshape(n, num_groups, cg).sum(-1)
    g2 = s2.reshape(n, num_groups, cg).sum(-1)
    cnt = float(h * w * cg)
    mean = g1 / cnt
    var = g2 / cnt - mean * mean
    mul = jax.lax.rsqrt(var + eps)  # [N, G]
    mul = jnp.repeat(mul, cg, axis=1)  # [N, C]
    meanc = jnp.repeat(mean, cg, axis=1)
    a = mul * scale.astype(jnp.float32)[None, :]
    b = bias.astype(jnp.float32)[None, :] - meanc * a
    # apply in the input dtype (a, b rounded once): if the apply read x32,
    # XLA would CSE it with the stats' convert and materialize the f32 copy
    # this function exists to avoid. In f32 mode this is exact.
    a = a.astype(x.dtype)[:, None, None, :]
    b = b.astype(x.dtype)[:, None, None, :]
    return (x * a + b).astype(dtype)


class _Layers(nn.Module):
    """Shared helpers: norm / activation / dropblock application."""

    cfg: UNetConfig

    def _act(self, x):
        if self.cfg.activation == "relu":
            return nn.relu(x)
        if self.cfg.activation == "leaky_relu":
            return nn.leaky_relu(x, negative_slope=self.cfg.negative_slope)
        raise ValueError(f"unknown activation {self.cfg.activation}")

    def _norm(self, x, name: str):
        if self.cfg.norm is None:
            return x
        if self.cfg.norm == "group":
            scale, bias = _GNParams(x.shape[-1], name=name)()
            return group_norm_affine(
                x, scale, bias, self.cfg.group_norm_groups, 1e-5, self.cfg.dtype
            )
        raise ValueError(f"unknown norm {self.cfg.norm}")

    def _norm_db_act(self, x, drop_prob, idx: int):
        """The conv epilogue norm -> dropblock -> act (reference conv block
        order, utils_unet.py:215-258)."""
        x = self._norm(x, name=f"norm{idx}")
        x = self._dropblock(x, drop_prob)
        return self._act(x)

    def _dropblock(self, x, drop_prob):
        """Apply dropblock when a drop_prob is threaded in (drop_prob=None is
        the static 'module in eval mode / no dropblock configured' path).
        The mask pipeline is selected by DropBlockConfig.mask_impl."""
        db = self.cfg.dropblock
        if db.kind is None or drop_prob is None:
            return x
        key = self.make_rng("dropblock")
        fn = dropblock_dependent if db.kind == "dependent" else dropblock_independent
        return fn(x, key, drop_prob, db.block_size, mask_impl=db.mask_impl)

    def _conv(self, x, features: int, name: str):
        cfg = self.cfg
        fan_in = x.shape[-1] * 9
        return nn.Conv(
            features=features,
            kernel_size=(3, 3),
            strides=(1, 1),
            padding="SAME" if cfg.same_padding else "VALID",
            use_bias=cfg.norm is None,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=cfg.dtype,
            name=name,
        )(x)


class DepthToSpaceUpConv(nn.Module):
    """2x2 stride-2 transposed conv as 1x1-matmul + pixel shuffle.

    Mathematically identical to nn.ConvTranspose(kernel=(2,2), strides=(2,2),
    padding='VALID') — with k=s there is no tap overlap, so
    out[n, 2i+di, 2j+dj, f] = sum_c x[n,i,j,c] * kernel[di,dj,c,f] (+ bias).
    On TPU the lhs-dilated conv XLA lowers a conv_transpose to wastes 3/4 of
    its MACs on inserted zeros; the einsum form is a clean MXU matmul.
    Parameter tree ('kernel'/'bias' shapes) matches nn.ConvTranspose so
    checkpoints are interchangeable (verified in tests/test_unet_perf_ops.py).
    """

    features: int
    use_bias: bool
    kernel_init: Any
    bias_init: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (2, 2, ci, self.features))
        # dot in its natural output order (batch, lhs-free, rhs-free) so the
        # matmul itself needs no transpose, then pixel-shuffle explicitly in
        # the storage dtype. (Asking einsum for 'nhiwjf' directly made XLA
        # run the unavoidable (h,w,i) relayout copy on an f32 intermediate —
        # 2x the bytes; round-3 profile: 2 x 7.3 ms per chunk at the top
        # level. The relayout on bf16 is half that, and the f32->bf16
        # convert fuses into the dot epilogue.)
        y = jnp.einsum(
            "nhwc,cijf->nhwijf",
            x.astype(self.dtype),
            jnp.transpose(kernel, (2, 0, 1, 3)).astype(self.dtype),
        ).astype(self.dtype)
        n, h, w, _, _, f = y.shape
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(n, 2 * h, 2 * w, f)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class ConvBlock(_Layers):
    """`conv_layers_per_block` convs, each conv -> norm -> dropblock -> act.

    `features` lists the output channels of each conv (the first may differ,
    reference utils_unet.py:215-230,243-258).
    """

    features: Sequence[int] = ()

    @nn.compact
    def __call__(self, x, drop_prob=None):
        for i, feats in enumerate(self.features):
            x = self._conv(x, feats, name=f"conv{i}")
            x = self._norm_db_act(x, drop_prob, i)
        return x


class PoolBlock(_Layers):
    """Downsampling step + norm (+ act for conv pooling)
    (reference utils_unet.py:261-291)."""

    features: int = 0

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        if cfg.pool_mode == "max":
            x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        elif cfg.pool_mode == "avg":
            x = nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2))
        else:  # conv
            fan_in = x.shape[-1] * 4
            x = nn.Conv(
                features=self.features,
                kernel_size=(2, 2),
                strides=(2, 2),
                padding="VALID",
                use_bias=cfg.norm is None,
                kernel_init=torch_kernel_init,
                bias_init=torch_bias_init(fan_in),
                dtype=cfg.dtype,
                name="pool_conv",
            )(x)
        x = self._norm(x, name="pool_norm")
        if cfg.pool_mode == "conv":
            x = self._act(x)
        return x


class UpBlock(_Layers):
    """Upsampling step halving filters + norm + act
    (reference utils_unet.py:296-322)."""

    features: int = 0  # output channels (= filters // 2 of the level below)

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        if cfg.up_mode == "upconv":
            x = DepthToSpaceUpConv(
                features=self.features,
                use_bias=cfg.norm is None,
                kernel_init=transpose_kernel_init(self.features, 2, 2),
                bias_init=torch_bias_init(self.features * 4),
                dtype=cfg.dtype,
                name="up_conv",
            )(x)
        else:  # 'upsample': torch nn.Upsample default is nearest
            n, h, w, c = x.shape
            x = jax.image.resize(x, (n, 2 * h, 2 * w, c), method="nearest")
            x = self._conv(x, self.features, name="up_conv")
        x = self._norm(x, name="up_norm")
        return self._act(x)


class SkipMerge(_Layers):
    """'cat'/'add'/'none' skip merge with center-crop and post-merge dropblock
    (reference utils_unet.py:376-390)."""

    @nn.compact
    def __call__(self, x, skip, drop_prob=None):
        conn = self.cfg.connection
        if conn == "none":
            return x
        skip = center_crop(skip, (x.shape[-3], x.shape[-2]))
        if conn == "cat":
            x = jnp.concatenate([x, skip], axis=-1)
        else:  # add
            x = x + skip
        return self._dropblock(x, drop_prob)


class UNet(nn.Module):
    """The full encoder/decoder (reference UNet.forward, utils_unet.py:408-449).

    Call: ``model.apply(vars, x, drop_prob=p, rngs={'dropblock': key})``.
    - x: NHWC float batch.
    - drop_prob: None => dropblock entirely off (eval); a float or traced
      scalar => dropblock active at that probability (training, or MC
      uncertainty forcing dropblock on in eval —
      reference Dropblock_Uncertainty.py:22-25).
    """

    cfg: UNetConfig

    def _maybe_remat(self, cls):
        if self.cfg.remat:
            return nn.remat(cls, prevent_cse=False)
        return cls

    @nn.compact
    def __call__(self, x, drop_prob=None):
        cfg = self.cfg
        x = x.astype(cfg.dtype)
        x, orig_hw = pad_to_multiple(x, 2**cfg.model_depth)

        conv_block = self._maybe_remat(ConvBlock)
        pool_block = self._maybe_remat(PoolBlock)
        up_block = self._maybe_remat(UpBlock)

        filters = cfg.filters
        skips = []
        # encoder
        for d in range(cfg.model_depth):
            if d == 0:
                feats = [filters] * cfg.conv_layers_per_block
            else:
                filters *= 2
                feats = [filters] * cfg.conv_layers_per_block
            x = conv_block(cfg, tuple(feats), name=f"down{d}")(x, drop_prob)
            skips.append(x)
            x = pool_block(cfg, filters, name=f"pool{d}")(x)

        # bottleneck ("connection block", utils_unet.py:162-207)
        filters *= 2
        x = conv_block(cfg, (filters,) * cfg.conv_layers_per_block, name="conn")(
            x, drop_prob
        )

        # decoder
        for d in range(cfg.model_depth):
            filters //= 2
            x = up_block(cfg, filters, name=f"up{d}")(x)
            x = SkipMerge(cfg, name=f"skip{d}")(x, skips[-1 - d], drop_prob)
            x = conv_block(cfg, (filters,) * cfg.conv_layers_per_block, name=f"post{d}")(
                x, drop_prob
            )

        # 1x1 head + sigmoid (bias follows the global norm rule,
        # utils_unet.py:393-406)
        x = nn.Conv(
            features=cfg.output_channels,
            kernel_size=(1, 1),
            use_bias=cfg.norm is None,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(x.shape[-1]),
            dtype=cfg.dtype,
            name="head",
        )(x)
        x = jax.nn.sigmoid(x.astype(jnp.float32))

        x = crop_to(x, orig_hw)
        # clamp + NaN scrub (utils_unet.py:443-444)
        x = jnp.clip(x, 0.0, 1.0)
        return jnp.nan_to_num(x, nan=0.0)


def param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
