"""Fused GroupNorm + DropBlock + ReLU as a two-phase Pallas TPU kernel.

This is the conv epilogue of every ConvBlock layer (reference order
conv -> norm -> dropblock -> act, utils_unet.py:215-258 with
set_dropblock utils_unet.py:117-134). Fusing the three removes the
DropBlock stage's entire marginal cost from the MC hot loop: GroupNorm
already needs one stats pass (read x) and one apply pass (read x, write y);
the dropblock mask is generated *bit-packed in VMEM* inside those same
passes (see ops/pallas/dropblock_kernel.py for the bit-plane machinery), so
the mask costs no HBM traffic at all — only ~1/32nd-rate word ops.

Phase 1 (no Pallas tensor I/O at all):
  - the per-(sample, channel) GN moment sums run as plain XLA reductions —
    XLA input-fuses them into the conv that produced x, so they cost no
    extra HBM pass (a Pallas stats kernel was tried first: it must re-read
    x, and measured ~20% slower end-to-end);
  - per-sample dropped-position popcounts come from the bit-plane kernel
    (`dropblock_pallas_keep_sums` — replayable strip-seeded hardware PRNG,
    reads/writes nothing tensor-sized).
Between phases (plain XLA on (N, C)-sized arrays): mean/var -> per-channel
affine a = scale * rstd, b = bias - mean * a (the flax use_fast_variance
formulation: var = E[x^2] - E[x]^2 in f32), with the per-sample DropBlock
rescale numel/keep (or the guarded variant) pre-folded into a and b
(dropped positions are zeroed in-kernel; zeros are scale-invariant).

Phase 2 (`_apply_kernel`), one read + one write:
  out = relu(where(dropped, 0, x * a + b)), applied in x.dtype after f32
  stats/affine math — the same split flax GroupNorm(dtype=bf16) uses
  (f32 statistics, dtype-cast normalization arithmetic).

Semantics notes:
  - gamma == 0 degrades to plain GroupNorm + ReLU (zero seed planes, scale 1).
  - per-SAMPLE rescale (each batch element is an MC ensemble member); the
    batch-1 reference semantics (utils_modules.py:61-64) apply sample-wise.
  - guard_zero=True gives the independent variant's guarded rescale
    (utils_modules.py:133-138).
  - The mask RNG is the TPU hardware PRNG (distribution-correct, not
    bit-identical to any host RNG — same contract as dropblock_kernel).

The custom VJP recomputes nothing in Pallas except the mask replay: relu'
comes from out > 0, the mask+rescale is one `dropblock_pallas_apply` of the
cotangent (the mask is a pure function of (key, gamma, shape)), and the
GroupNorm backward runs as standard XLA ops from the saved f32 stats.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unet_research_tpu.ops.pallas.dropblock_kernel import (
    _STRIP,
    KBITS,
    _bitpos_np,
    _gen_block_words,
    _interior_words_np,
    dropblock_pallas_apply,
    dropblock_pallas_keep_sums,
    pallas_dropblock_supported,
)


def _pick_ht(h: int, w: int, c: int, budget: int = 14 * 2**20) -> int:
    """Rows per tile against XLA's 16M *scoped* vmem limit for custom calls.
    Mosaic's measured stack for this kernel is ~26 bytes/element (bf16
    x/out double-buffered + unpacked int32 planes + select temps)."""
    per_row = max(1, w * c * 26)
    rows = min(h, max(1, budget // per_row))
    return max(_STRIP, (rows // _STRIP) * _STRIP)


def _apply_kernel(kd_ref, gb_ref, interior_ref, bitpos_ref, a_ref, b2_ref,
                  x_ref, out_ref, seeds_ref,
                  *, H, b, wg, c, Ht):
    n = pl.program_id(0)
    ht = pl.program_id(1)
    row0 = ht * Ht
    block = _gen_block_words(seeds_ref, interior_ref, kd_ref[0], kd_ref[1],
                             gb_ref[0], n, row0,
                             H=H, b=b, wg=wg, lanes=c, Ht=Ht)
    w = x_ref.shape[2]
    planes = pltpu.repeat(block, -(-w // wg), axis=1)[:, :w, :]
    dropped = (planes & bitpos_ref[...]) != 0
    # keep_scale is pre-folded into a/b outside (zeros stay zeros under it).
    # The affine applies in x.dtype — flax GroupNorm(dtype=bf16) also casts
    # before the normalization arithmetic, and bf16 temps halve VMEM.
    dt = x_ref.dtype
    a = a_ref[pl.ds(n, 1), :].reshape(1, 1, c).astype(dt)
    b2 = b2_ref[pl.ds(n, 1), :].reshape(1, 1, c).astype(dt)
    y = x_ref[0] * a + b2
    y = jnp.where(dropped, jnp.zeros((), dt), y)
    out_ref[0] = jnp.maximum(y, jnp.zeros((), dt))


def _prep(x_shape, key, gamma, block_size):
    n, h, w, c = x_shape
    b = block_size
    p = b // 2
    wg = -(-w // 32)
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)[:2].astype(jnp.int32)
    gb = jnp.clip(jnp.round(jnp.asarray(gamma, jnp.float32) * (1 << KBITS)),
                  0, (1 << KBITS) - 1).astype(jnp.int32).reshape(1)
    interior = jnp.asarray(_interior_words_np(w, p, wg))
    return n, h, w, c, b, wg, kd, gb, interior


@functools.partial(
    jax.jit,
    static_argnames=("num_groups", "block_size", "guard_zero", "eps", "interpret"),
)
def gn_dropblock_relu(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    key: jax.Array,
    gamma,
    *,
    num_groups: int,
    block_size: int,
    guard_zero: bool = False,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """relu(dropblock(groupnorm(x, scale, bias), key, gamma)) fused, NHWC.

    gamma is the *already-derived* Bernoulli rate (traced scalar; the caller
    picks the dependent/independent formula, ops/dropblock.py:30-41).
    """
    if not pallas_dropblock_supported(block_size):
        raise ValueError("fused gn_dropblock requires odd 1 < block_size <= 17")
    n, h, w, c, b, wg, kd, gb, interior = _prep(x.shape, key, gamma, block_size)
    if c % num_groups != 0:
        raise ValueError(f"C={c} not divisible by groups={num_groups}")

    # GN moments in XLA: these reductions input-fuse into the conv that
    # produced x (no extra HBM pass), which a Pallas stats kernel can't do.
    xf = x.astype(jnp.float32)
    sums = jnp.sum(xf, axis=(1, 2))  # (n, c)
    sumsq = jnp.sum(xf * xf, axis=(1, 2))
    # dropped-position popcounts: bit-plane kernel, no tensor I/O
    keep = dropblock_pallas_keep_sums(x.shape, key, gamma, block_size, interpret)
    dropped = float(h * w * c) - keep

    a2, b2 = _affine_from_stats(
        sums, sumsq, dropped, scale, bias,
        h=h, w=w, c=c, num_groups=num_groups, eps=eps, guard_zero=guard_zero)
    return _apply(x, kd, gb, interior, a2, b2,
                  block_size=b, wg=wg, interpret=interpret)


def _affine_from_stats(sums, sumsq, dropped, scale, bias, *,
                       h, w, c, num_groups, eps, guard_zero):
    """(N,C) f32 per-channel moment sums + per-sample dropped counts ->
    per-(N,C) affine a, b and the per-sample keep rescale."""
    cs = c // num_groups
    m = float(h * w * cs)
    n = sums.shape[0]
    mean = jnp.sum(sums.reshape(n, num_groups, cs), axis=2) / m
    mean2 = jnp.sum(sumsq.reshape(n, num_groups, cs), axis=2) / m
    var = mean2 - mean * mean  # flax use_fast_variance
    rstd = lax.rsqrt(var + eps)
    rstd_c = jnp.repeat(rstd, cs, axis=1)  # (n, c)
    mean_c = jnp.repeat(mean, cs, axis=1)
    a2 = scale.astype(jnp.float32)[None, :] * rstd_c
    b2 = bias.astype(jnp.float32)[None, :] - mean_c * a2
    total = float(h * w * c)
    keep = total - dropped
    if guard_zero:
        keep_scale = jnp.where(keep != 0, total / keep, 1.0)
    else:
        keep_scale = total / keep
    # fold the per-sample rescale into the affine: dropped positions are
    # zeroed in-kernel, and zeros are invariant under the scaling
    ks = keep_scale.reshape(-1, 1)
    return a2 * ks, b2 * ks


def _apply(x, kd, gb, interior, a2, b2, *, block_size, wg, interpret):
    n, h, w, c = x.shape
    ht = _pick_ht(h, w, c)
    n_htiles = pl.cdiv(h, ht)
    bitpos = jnp.asarray(_bitpos_np(w, wg))
    kernel = functools.partial(_apply_kernel, H=h, b=block_size, wg=wg, c=c, Ht=ht)
    return pl.pallas_call(
        kernel,
        grid=(n, n_htiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((n, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((ht + 2 * _STRIP, wg, c), jnp.int32)],
        interpret=interpret,
    )(kd, gb, interior, bitpos, a2, b2, x)


# --- differentiable wrapper ----------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9)
)
def gn_dropblock_relu_ad(x, scale, bias, key, gamma,
                         num_groups, block_size, guard_zero=False,
                         eps=1e-5, interpret=False):
    """Differentiable fused GN+DropBlock+ReLU (see gn_dropblock_relu).

    Positional num_groups/block_size/... because custom_vjp nondiff args."""
    return gn_dropblock_relu(
        x, scale, bias, key, gamma,
        num_groups=num_groups, block_size=block_size, guard_zero=guard_zero,
        eps=eps, interpret=interpret)


def _fwd(x, scale, bias, key, gamma, num_groups, block_size, guard_zero,
         eps, interpret):
    out = gn_dropblock_relu(
        x, scale, bias, key, gamma,
        num_groups=num_groups, block_size=block_size, guard_zero=guard_zero,
        eps=eps, interpret=interpret)
    return out, (x, scale, key, gamma, out)


def _bwd(num_groups, block_size, guard_zero, eps, interpret, res, g):
    x, scale, key, gamma, out = res
    n, h, w, c = x.shape
    cs = c // num_groups
    xf = x.astype(jnp.float32)
    # recompute stats (cheap XLA reduction; avoids threading pallas outputs)
    xg = xf.reshape(n, h * w, num_groups, cs)
    mean = jnp.mean(xg, axis=(1, 3))
    var = jnp.mean(xg * xg, axis=(1, 3)) - mean * mean
    rstd = lax.rsqrt(var + eps)  # (n, G)

    g = g.astype(jnp.float32) * (out > 0)  # relu'
    # mask + per-sample rescale on the cotangent: replay via the mask kernel.
    # scale=1 here; the keep_scale folds in below via the same replayed sums.
    from unet_research_tpu.ops.pallas.dropblock_kernel import (
        dropblock_pallas_keep_sums,
    )

    keep = dropblock_pallas_keep_sums(x.shape, key, gamma, block_size, interpret)
    total = float(h * w * c)
    ks = jnp.where(keep != 0, total / keep, 1.0) if guard_zero else total / keep
    gm = dropblock_pallas_apply(g, key, gamma, ks, block_size, interpret)
    gm = gm.astype(jnp.float32)

    # GroupNorm backward from (x, mean, rstd):
    xhat = (xg - mean[:, None, :, None]) * rstd[:, None, :, None]
    gg = gm.reshape(n, h * w, num_groups, cs)
    dscale = jnp.sum(gg * xhat, axis=(0, 1)).reshape(c)
    dbias = jnp.sum(gg, axis=(0, 1)).reshape(c)
    sc = scale.astype(jnp.float32).reshape(1, 1, num_groups, cs)
    dxhat = gg * sc
    m = float(h * w * cs)
    dx = (dxhat - jnp.mean(dxhat, axis=(1, 3), keepdims=True)
          - xhat * jnp.mean(dxhat * xhat, axis=(1, 3), keepdims=True))
    dx = dx * rstd[:, None, :, None]
    dx = dx.reshape(x.shape).astype(x.dtype)
    return dx, dscale.astype(scale.dtype), dbias.astype(scale.dtype), None, None


gn_dropblock_relu_ad.defvjp(_fwd, _bwd)
