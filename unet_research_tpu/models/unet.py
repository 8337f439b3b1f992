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
    # Mask pipeline: None (UNET_DB_IMPL env default) | 'elementwise' (XLA) |
    # 'kernel' (Pallas mask producer — dense s8 mask + keep counts from one
    # kernel pass, XLA apply) | 'fused' (Pallas epilogue kernel owning
    # GN-affine + mask + activation + count in ONE pass over x; pairs with
    # fold_rescale, inference-mode only — no VJP). See ops/dropblock.py and
    # PERF.md for the measured ladder.
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
    # Normalization plug-in (reference set_normalization accepts any
    # class+params with 'fill' channel substitution, utils_unet.py:136-153;
    # its exercised instantiations are GroupNorm — every entry point — and
    # BatchNorm2d, base_model_tests/test.ipynb). Here: 'group' | 'batch' |
    # None. The 'fill' contract is inherent: channel counts come from the
    # input's last axis at each site. 'batch' is torch BatchNorm2d semantics
    # (eps 1e-5, momentum 0.1 -> flax momentum 0.9; running stats live in
    # the 'batch_stats' collection, updated when __call__ gets train=True;
    # flax updates running_var with the biased batch variance where torch
    # uses unbiased — an n/(n-1) factor, negligible at n = N*H*W).
    norm: Optional[str] = "group"
    group_norm_groups: int = 32
    # Activation plug-in (reference set_activation_function accepts any
    # module, utils_unet.py:155-160; exercised with ReLU everywhere).
    # 'relu' | 'leaky_relu' | 'elu' | 'gelu' | 'silu' | 'tanh' | 'sigmoid'
    # | 'none' — the torch activation modules a reference user could pass.
    activation: str = "relu"
    negative_slope: float = 0.01
    dropblock: DropBlockConfig = dataclasses.field(default_factory=DropBlockConfig)
    remat: bool = False
    dtype: Any = jnp.float32  # compute dtype (bf16 on TPU hot paths)
    # 3x3-conv lowering: 'xla' (default) or 'pair' — the pair-view Pallas
    # GEMM (ops/pallas/pair_conv.py) for bias-free SAME convs with
    # C_out <= 64, where XLA's GEMM runs the MXU at half output width
    # (34% MFU measured at the 592x576 top level, PERF.md round 3). The
    # kernel also emits the GroupNorm moment sums so no stat pass reads the
    # activation. Differentiable (custom VJP: dx rides the same pair kernel,
    # dK is one XLA correlation GEMM — ops/pallas/pair_conv.py), so training
    # shares the MXU win. VALID padding rides the SAME kernel + interior
    # crop; ineligible sites (C_out > 64, odd H/W) fall back to XLA.
    conv_impl: str = "xla"
    # Fold the DropBlock rescale through the network algebra (GroupNorm-gated).
    #
    # The reference rescales every masked tensor by numel/count in place
    # (utils_modules.py:61-64, 133-138). In this architecture every mask site
    # is followed by [activation ->] convolution -> GroupNorm before anything
    # scale-sensitive, and each of those commutes with (ReLU/LeakyReLU,
    # bias-free conv, max/avg pool) or annihilates (GroupNorm: GN(s*x) =
    # GN(x) for s > 0) a positive per-sample scalar. Tracing the dataflow of
    # the canonical model, only two kinds of site ever need the scalar
    # physically applied:
    #   - the last conv of each encoder block, whose output rides the skip
    #     connection into a concat/add merge (two branches with different
    #     scalars do not cancel) -> applied to the skip tensor at the merge;
    #   - the last mask site before the 1x1 head + sigmoid (sigmoid is not
    #     scale-invariant) -> applied to the head logits.
    # The other sites' counts are mathematically irrelevant and are skipped
    # entirely; the surviving scales are PER-SAMPLE (N,), which is exactly
    # the reference's serial batch-1 semantics for a batched MC chunk.
    # Near-exact, not bit-exact: GN(s*x) = GN(x) holds exactly only at
    # eps = 0; with eps = 1e-5 the omitted scales perturb outputs by
    # O(eps * (s^2 - 1) / var) — well under bf16 rounding noise and pinned
    # at 2e-4 by tests/test_unet_perf_ops.py::test_fold_rescale_matches_inline.
    # Active only when norm == 'group' (bias-free convs + GN annihilation
    # are what make the algebra hold).
    fold_rescale: bool = True

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
        if self.norm not in (None, "group", "batch"):
            raise ValueError("norm must be 'group', 'batch' or None")
        if self.activation not in (
            "relu", "leaky_relu", "elu", "gelu", "silu", "tanh", "sigmoid", "none"
        ):
            raise ValueError(f"unknown activation {self.activation!r}")


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


def group_norm_coeffs_from_sums(s1, s2, hw: int, scale, bias,
                                num_groups: int, eps: float):
    """GroupNorm affine coefficients from per-channel moment sums s1 = sum x,
    s2 = sum x^2 over (H, W) with hw = H*W — e.g. the side outputs of the
    conv-owning Pallas kernel (ops/pallas/pair_conv.py), which computes them
    from the f32 accumulator so no second pass over the activation exists."""
    n, c = s1.shape
    cg = c // num_groups
    g1 = s1.reshape(n, num_groups, cg).sum(-1)
    g2 = s2.reshape(n, num_groups, cg).sum(-1)
    cnt = float(hw * cg)
    mean = g1 / cnt
    # E[x^2] - E[x]^2 can cancel below 0 in f32 on large-mean activations;
    # clamp like flax nn.GroupNorm does so rsqrt never sees a negative
    var = jnp.maximum(g2 / cnt - mean * mean, 0.0)
    mul = jax.lax.rsqrt(var + eps)  # [N, G]
    mul = jnp.repeat(mul, cg, axis=1)  # [N, C]
    meanc = jnp.repeat(mean, cg, axis=1)
    a = mul * scale.astype(jnp.float32)[None, :]
    b = bias.astype(jnp.float32)[None, :] - meanc * a
    return a, b


def group_norm_coeffs(x, scale, bias, num_groups: int, eps: float):
    """Per-(sample, channel) GroupNorm affine coefficients (f32 (N, C) each):
    GN(x) = x * a + b with a = rsqrt(var + eps) * scale, b = bias - mean * a.
    The moment reductions are shaped so XLA input-fuses them into the
    producing conv (per-channel (H, W) sums first, group-combined after)."""
    n, h, w, c = x.shape
    x32 = x.astype(jnp.float32)
    # per-channel moments reduce over (H, W) first — XLA input-fuses these
    # into the producing conv — then combine channels into group moments
    s1 = jnp.sum(x32, axis=(1, 2))  # [N, C]
    s2 = jnp.sum(x32 * x32, axis=(1, 2))  # [N, C]
    return group_norm_coeffs_from_sums(s1, s2, h * w, scale, bias,
                                       num_groups, eps)


def group_norm_affine(x, scale, bias, num_groups: int, eps: float, dtype,
                      sums=None):
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

    sums: optional precomputed (s1, s2) per-channel moment sums over (H, W)
    (the conv-owning kernel's side outputs) — skips the reductions here.
    """
    if sums is not None:
        a, b = group_norm_coeffs_from_sums(
            sums[0], sums[1], x.shape[1] * x.shape[2], scale, bias,
            num_groups, eps)
    else:
        a, b = group_norm_coeffs(x, scale, bias, num_groups, eps)
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
        a = self.cfg.activation
        if a == "relu":
            return nn.relu(x)
        if a == "leaky_relu":
            return nn.leaky_relu(x, negative_slope=self.cfg.negative_slope)
        if a == "elu":
            return nn.elu(x)  # torch nn.ELU(alpha=1.0)
        if a == "gelu":
            return nn.gelu(x, approximate=False)  # torch nn.GELU default
        if a == "silu":
            return nn.silu(x)
        if a == "tanh":
            return jnp.tanh(x)
        if a == "sigmoid":
            return nn.sigmoid(x)
        if a == "none":
            return x
        raise ValueError(f"unknown activation {a}")

    def _norm(self, x, name: str, sums=None, train: bool = False):
        if self.cfg.norm is None:
            return x
        if self.cfg.norm == "group":
            scale, bias = _GNParams(x.shape[-1], name=name)()
            return group_norm_affine(
                x, scale, bias, self.cfg.group_norm_groups, 1e-5, self.cfg.dtype,
                sums=sums,
            )
        if self.cfg.norm == "batch":
            # torch BatchNorm2d: eps 1e-5, momentum 0.1 (flax ra-convention
            # momentum = 0.9); param tree 'scale'/'bias' + 'batch_stats'
            # 'mean'/'var' (convert.py maps running_mean/running_var there)
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.cfg.dtype,
                name=name,
            )(x)
        raise ValueError(f"unknown norm {self.cfg.norm}")

    def _fold_active(self, drop_prob) -> bool:
        """fold_rescale is live at this trace: GroupNorm everywhere (so the
        annihilation algebra holds) and dropblock actually running."""
        cfg = self.cfg
        return (
            cfg.fold_rescale
            and cfg.norm == "group"
            and cfg.dropblock.kind is not None
            and drop_prob is not None
        )

    def _fused_impl(self, drop_prob) -> bool:
        """True when this site runs the fused Pallas epilogue kernel
        (mask_impl='fused'): GroupNorm-affine + mask + activation in one
        custom call, the site's whole conv epilogue owned by one pass."""
        from unet_research_tpu.ops.dropblock import _kernel_ok, _resolve_impl

        db = self.cfg.dropblock
        if db.kind is None or drop_prob is None:
            return False
        # the kernel owns norm+act: it implements the GN-affine (or no norm)
        # and relu/leaky epilogues only — other plug-ins use the XLA path
        if self.cfg.norm not in (None, "group"):
            return False
        if self.cfg.activation not in ("relu", "leaky_relu"):
            return False
        return _resolve_impl(db.mask_impl) == "fused" and _kernel_ok(db.block_size)

    def _fused_site(self, x, drop_prob, idx, rescale: str, with_act: bool,
                    sums=None):
        """One mask site as the fused Pallas kernel: act((x*a+b) * mask) with
        the GN moment reductions left OUTSIDE (they input-fuse into the
        producing conv; a, b are (N, C)). Parameter names match _norm's
        _GNParams so checkpoints are interchangeable across pipelines."""
        from unet_research_tpu.ops.dropblock import (
            dropblock_gamma_dependent,
            dropblock_gamma_independent,
        )
        from unet_research_tpu.ops.pallas.dropblock_kernel import dropblock_fused_apply

        cfg, db = self.cfg, self.cfg.dropblock
        n, h, w, c = x.shape
        if with_act and cfg.norm == "group":
            scale_p, bias_p = _GNParams(c, name=f"norm{idx}")()
            if sums is not None:
                a, b = group_norm_coeffs_from_sums(
                    sums[0], sums[1], h * w, scale_p, bias_p,
                    cfg.group_norm_groups, 1e-5)
            else:
                a, b = group_norm_coeffs(x, scale_p, bias_p,
                                         cfg.group_norm_groups, 1e-5)
            ab = jnp.stack([a, b])
        else:
            ab = None
        key = self.make_rng("dropblock")
        if db.kind == "dependent":
            gamma = dropblock_gamma_dependent(h, w, db.block_size, drop_prob)
        else:
            gamma = dropblock_gamma_independent(h, w, db.block_size, drop_prob)
        act = cfg.activation if with_act else "none"
        out, keep = dropblock_fused_apply(
            x, ab, key, gamma, db.block_size, act=act, slope=cfg.negative_slope
        )
        out = out.astype(cfg.dtype)
        if rescale == "skip":
            return out
        if db.kind == "dependent":
            per = float(h * w * c) / keep  # (N,) reference numel/sum per member
            whole = float(n * h * w * c) / jnp.sum(keep)
        else:
            kf = keep / float(h * w * c)
            per = jnp.where(kf != 0, 1.0 / kf, 1.0)
            kfw = jnp.sum(keep) / float(n * h * w * c)
            whole = jnp.where(kfw != 0, 1.0 / kfw, 1.0)
        if rescale == "defer":
            return out, per
        return out * whole.astype(out.dtype)

    def _norm_db_act(self, x, drop_prob, idx: int, rescale: str = "apply",
                     sums=None, train: bool = False):
        """The conv epilogue norm -> dropblock -> act (reference conv block
        order, utils_unet.py:215-258). rescale: see _dropblock; sums: the
        producing conv's moment side outputs, if any."""
        if self._fused_impl(drop_prob):
            return self._fused_site(x, drop_prob, idx, rescale, with_act=True,
                                    sums=sums)
        x = self._norm(x, name=f"norm{idx}", sums=sums, train=train)
        if rescale == "defer":
            x, scale = self._dropblock(x, drop_prob, rescale="defer")
            return self._act(x), scale
        x = self._dropblock(x, drop_prob, rescale=rescale)
        return self._act(x)

    def _dropblock(self, x, drop_prob, rescale: str = "apply"):
        """Apply dropblock when a drop_prob is threaded in (drop_prob=None is
        the static 'module in eval mode / no dropblock configured' path).
        The mask pipeline is selected by DropBlockConfig.mask_impl;
        rescale ('apply'/'defer'/'skip') by the fold_rescale dataflow."""
        db = self.cfg.dropblock
        if db.kind is None or drop_prob is None:
            return (x, None) if rescale == "defer" else x
        if self._fused_impl(drop_prob):
            # bare mask site (the skip merge): no norm, no activation
            return self._fused_site(x, drop_prob, None, rescale, with_act=False)
        key = self.make_rng("dropblock")
        fn = dropblock_dependent if db.kind == "dependent" else dropblock_independent
        return fn(x, key, drop_prob, db.block_size, mask_impl=db.mask_impl,
                  rescale=rescale)

    def _conv(self, x, features: int, name: str):
        """3x3 conv. Returns (y, sums) where sums is the (s1, s2) GroupNorm
        moment pair when the conv-owning Pallas kernel produced them (the
        'pair' lowering), else None (XLA: the reductions input-fuse into the
        conv downstream in group_norm_coeffs)."""
        cfg = self.cfg
        if (
            cfg.conv_impl == "pair"
            and cfg.norm is not None  # bias-free under norm
            and 2 * features <= 128
            # H only needs an even divisor — the row tile adapts
            and x.shape[-2] % 2 == 0
            and x.shape[-3] % 2 == 0
        ):
            from unet_research_tpu.ops.pallas import pair_conv as _pc

            try:
                on_tpu = _pc.INTERPRET or jax.default_backend() in ("tpu", "axon")
            except Exception:
                on_tpu = False
            # Compiled Mosaic needs input C % 64 == 0 and (W/2) % 8 == 0
            # ((8,128)-tiling-aligned halo DMA slices, pair_conv.py); the
            # C=1 stem and narrow shapes stay on XLA. Interpret mode (CPU
            # suite) keeps tiny channels/widths eligible via the zero-pad
            # path so the wiring is covered without hardware.
            if _pc.INTERPRET:
                shape_ok = True
            else:
                shape_ok = (x.shape[-1] % 64 == 0
                            and (x.shape[-2] // 2) % 8 == 0)
            if on_tpu and shape_ok:
                if cfg.same_padding:
                    # the moment side outputs only pay off when GroupNorm
                    # consumes them downstream
                    return PairConv(features, stats=cfg.norm == "group",
                                    name=name)(x)
                # VALID rides the SAME kernel + interior crop; no moment
                # side outputs (they would include the cropped border ring)
                return PairConv(features, stats=False, valid=True,
                                name=name)(x)
        fan_in = x.shape[-1] * 9
        y = nn.Conv(
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
        return y, None


class PairConv(nn.Module):
    """3x3 SAME bias-free conv via the pair-view Pallas GEMM
    (ops/pallas/pair_conv.py), emitting the GroupNorm moment sums as side
    outputs. Parameter tree ('kernel', torch-parity init) matches nn.Conv so
    checkpoints are interchangeable across conv_impl settings."""

    features: int
    stats: bool = True
    valid: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from unet_research_tpu.ops.pallas.pair_conv import (
            conv3x3_pair,
            conv3x3_pair_valid,
        )

        ci = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init,
                            (3, 3, ci, self.features))
        if self.valid:
            return conv3x3_pair_valid(x, kernel.astype(x.dtype)), None
        if not self.stats:
            return conv3x3_pair(x, kernel.astype(x.dtype)), None
        y, s1, s2 = conv3x3_pair(x, kernel.astype(x.dtype), stats=True)
        return y, (s1, s2)


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

    want_scale: this block's output feeds a scale-sensitive consumer (a skip
    merge or the head) under fold_rescale — return (x, per-sample scale of
    the LAST mask site); earlier sites' scales are annihilated downstream
    and skipped. Always returns (x, scale) when want_scale (scale None if
    folding is inactive this trace).

    train: a STATIC module attribute (not a call arg — under nn.remat a call
    arg would be traced, and BatchNorm's use_running_average must stay a
    Python bool). Only batch norm reads it.
    """

    features: Sequence[int] = ()
    want_scale: bool = False
    train: bool = False

    @nn.compact
    def __call__(self, x, drop_prob=None):
        fold = self._fold_active(drop_prob)
        scale = None
        last = len(self.features) - 1
        for i, feats in enumerate(self.features):
            x, sums = self._conv(x, feats, name=f"conv{i}")
            if not fold:
                x = self._norm_db_act(x, drop_prob, i, sums=sums,
                                      train=self.train)
            elif self.want_scale and i == last:
                x, scale = self._norm_db_act(x, drop_prob, i, rescale="defer",
                                             sums=sums, train=self.train)
            else:
                x = self._norm_db_act(x, drop_prob, i, rescale="skip",
                                      sums=sums, train=self.train)
        if self.want_scale:
            return x, scale
        return x


class PoolBlock(_Layers):
    """Downsampling step + norm (+ act for conv pooling)
    (reference utils_unet.py:261-291)."""

    features: int = 0
    train: bool = False

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
        x = self._norm(x, name="pool_norm", train=self.train)
        if cfg.pool_mode == "conv":
            x = self._act(x)
        return x


class UpBlock(_Layers):
    """Upsampling step halving filters + norm + act
    (reference utils_unet.py:296-322)."""

    features: int = 0  # output channels (= filters // 2 of the level below)
    train: bool = False

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
            x = self._norm(x, name="up_norm", train=self.train)
            return self._act(x)
        # 'upsample': torch nn.Upsample default is nearest
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, 2 * h, 2 * w, c), method="nearest")
        x, sums = self._conv(x, self.features, name="up_conv")
        x = self._norm(x, name="up_norm", sums=sums, train=self.train)
        return self._act(x)


class SkipMerge(_Layers):
    """'cat'/'add'/'none' skip merge with center-crop and post-merge dropblock
    (reference utils_unet.py:376-390)."""

    @nn.compact
    def __call__(self, x, skip, drop_prob=None, skip_scale=None):
        conn = self.cfg.connection
        if conn == "none":
            return x
        if skip_scale is not None:
            # the deferred rescale of the encoder block's last mask site:
            # the up branch arrives scalar-clean (its pending scale was
            # annihilated by up_norm), so only the skip needs correcting
            # before the branches mix (fold_rescale, UNetConfig)
            skip = skip * skip_scale.astype(skip.dtype)[:, None, None, None]
        skip = center_crop(skip, (x.shape[-3], x.shape[-2]))
        if conn == "cat":
            x = jnp.concatenate([x, skip], axis=-1)
        else:  # add
            x = x + skip
        # the merge-site mask's own scale is annihilated by the post-block's
        # first GroupNorm when folding
        rescale = "skip" if self._fold_active(drop_prob) else "apply"
        return self._dropblock(x, drop_prob, rescale=rescale)


class UNet(nn.Module):
    """The full encoder/decoder (reference UNet.forward, utils_unet.py:408-449).

    Call: ``model.apply(vars, x, drop_prob=p, rngs={'dropblock': key})``.
    - x: NHWC float batch.
    - drop_prob: None => dropblock entirely off (eval); a float or traced
      scalar => dropblock active at that probability (training, or MC
      uncertainty forcing dropblock on in eval —
      reference Dropblock_Uncertainty.py:22-25).
    - train: static Python bool; only meaningful for norm='batch' (use batch
      stats + update the 'batch_stats' collection — pass
      mutable=['batch_stats'] to apply). GroupNorm/None ignore it, matching
      torch module train/eval semantics (dropblock is controlled by
      drop_prob, not train — the MC engines force it on in eval).
    """

    cfg: UNetConfig

    def _maybe_remat(self, cls):
        if self.cfg.remat:
            return nn.remat(cls, prevent_cse=False)
        return cls

    @nn.compact
    def __call__(self, x, drop_prob=None, train: bool = False):
        cfg = self.cfg
        x = x.astype(cfg.dtype)
        x, orig_hw = pad_to_multiple(x, 2**cfg.model_depth)

        conv_block = self._maybe_remat(ConvBlock)
        pool_block = self._maybe_remat(PoolBlock)
        up_block = self._maybe_remat(UpBlock)

        # fold_rescale dataflow (see UNetConfig): encoder blocks defer their
        # last mask site's per-sample scale to the skip merge; the final
        # decoder block defers to the head; every other site skips its count
        fold = (
            cfg.fold_rescale
            and cfg.norm == "group"
            and cfg.dropblock.kind is not None
            and drop_prob is not None
        )
        want_skip_scale = fold and cfg.connection != "none"

        filters = cfg.filters
        skips = []
        # encoder
        for d in range(cfg.model_depth):
            if d == 0:
                feats = [filters] * cfg.conv_layers_per_block
            else:
                filters *= 2
                feats = [filters] * cfg.conv_layers_per_block
            blk = conv_block(cfg, tuple(feats), want_skip_scale, train,
                             name=f"down{d}")
            if want_skip_scale:
                x, s = blk(x, drop_prob)
            else:
                x, s = blk(x, drop_prob), None
            skips.append((x, s))
            x = pool_block(cfg, filters, train, name=f"pool{d}")(x)

        # bottleneck ("connection block", utils_unet.py:162-207)
        filters *= 2
        x = conv_block(
            cfg, (filters,) * cfg.conv_layers_per_block, False, train,
            name="conn",
        )(x, drop_prob)

        # decoder
        head_scale = None
        for d in range(cfg.model_depth):
            filters //= 2
            x = up_block(cfg, filters, train, name=f"up{d}")(x)
            skip_x, skip_s = skips[-1 - d]
            x = SkipMerge(cfg, name=f"skip{d}")(x, skip_x, drop_prob, skip_scale=skip_s)
            want_head_scale = fold and d == cfg.model_depth - 1
            blk = conv_block(
                cfg, (filters,) * cfg.conv_layers_per_block, want_head_scale,
                train, name=f"post{d}",
            )
            if want_head_scale:
                x, head_scale = blk(x, drop_prob)
            else:
                x = blk(x, drop_prob)

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
        x = x.astype(jnp.float32)
        if head_scale is not None:
            # the last mask site's deferred scale, moved past the (linear,
            # bias-free) 1x1 head to just before the scale-sensitive sigmoid
            x = x * head_scale[:, None, None, None]
        x = jax.nn.sigmoid(x)

        x = crop_to(x, orig_hw)
        # clamp + NaN scrub (utils_unet.py:443-444)
        x = jnp.clip(x, 0.0, 1.0)
        return jnp.nan_to_num(x, nan=0.0)


def param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


def as_variables(params) -> dict:
    """Accept either a bare param tree or a variables bundle
    ({'params': ..., 'batch_stats': ...} — what init/convert produce for
    norm='batch' models) and return the apply-ready variables dict. Lets
    every eval/inference surface (engines, CLIs, checkpoints) keep passing
    one object regardless of the norm plug-in."""
    from collections.abc import Mapping

    if isinstance(params, Mapping) and "params" in params:
        return dict(params)
    return {"params": params}


def split_variables(params):
    """(param tree, batch_stats-or-None) from a bundle or bare params."""
    v = as_variables(params)
    return v["params"], v.get("batch_stats")
