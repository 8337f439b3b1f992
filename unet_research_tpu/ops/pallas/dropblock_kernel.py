"""Fused DropBlock mask generation as a Pallas TPU kernel.

This is the load-bearing optimization of the MC-DropBlock hot loop
(SURVEY.md §7): the XLA composition (PRNG -> pad -> two stride-1 max pools
-> invert -> apply -> global sum) costs ~8 HBM round trips over every
dropblock site per forward pass. This kernel does the whole pipeline in one
pass per tile — hardware PRNG (pltpu.prng_random_bits), in-VMEM separable
block expansion, mask apply, and per-tile keep-mask partial sums — reading x
once and writing the masked output once.

Semantics match ops.dropblock for ODD block sizes (the canonical
block_size=7; the reference's independent-channel variant requires odd
sizes anyway, utils_modules.py:117-128): seeds ~ Bernoulli(gamma) over the
interior region (border of b//2 excluded, equivalent to the dependent
variant's valid-center + zero-pad construction), expanded to b x b blocks,
inverted, applied, and rescaled OUTSIDE the kernel by numel/sum(keep) (the
scalar multiply fuses into the consumer). The RNG stream differs from
jax.random (hardware PRNG streams) — allowed, since masks only need the
right distribution, not bit-parity with any host RNG.

Strip-aligned generation keeps tiles independent with no cross-tile
communication: every global 8-row strip draws its bits from a stream seeded
by (key, sample, strip), so the +-b//2 halo rows a tile needs are
regenerated locally, bit-identical to the neighbor tile's rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_STRIP = 8  # PRNG strip height; tiles and halos are strip-aligned


def pallas_dropblock_supported(block_size: int) -> bool:
    return block_size % 2 == 1 and 1 < block_size <= 2 * _STRIP + 1


def _pick_ht(h: int, w: int, c: int, budget: int = 9 * 2**20) -> int:
    """Rows per tile: the bf16 working set is roughly 9 row-planes deep
    (seeds scratch with halo, shift temporaries, double-buffered x/out)."""
    per_row = max(1, w * c * 2 * 9)
    rows = min(h, budget // per_row)
    return max(_STRIP, (rows // _STRIP) * _STRIP)


def _shift_w(a, d: int):
    """Shift along axis 1 (W) by d (+right / -left), zero fill, bf16-safe."""
    ht, w, c = a.shape
    zeros = jnp.zeros((ht, abs(d), c), a.dtype)
    if d > 0:
        return jnp.concatenate([zeros, a[:, : w - d, :]], axis=1)
    return jnp.concatenate([a[:, -d:, :], zeros], axis=1)


def _kernel(kd_ref, gamma_ref, x_ref, out_ref, psum_ref, seeds_ref, *, H, W, C, Ht, b):
    p = b // 2
    n = pl.program_id(0)
    ht = pl.program_id(1)
    row0 = ht * Ht
    strip0 = row0 // _STRIP - 1  # first (possibly negative) halo strip
    gamma = gamma_ref[0]
    kd0 = kd_ref[0]
    kd1 = kd_ref[1]

    col_ids = lax.broadcasted_iota(jnp.int32, (_STRIP, W, C), 1)
    col_ok = (col_ids >= p) & (col_ids <= W - 1 - p)
    row_in_strip = lax.broadcasted_iota(jnp.int32, (_STRIP, W, C), 0)

    n_strips = Ht // _STRIP + 2

    def gen_strip(si, _):
        gs = strip0 + si  # global strip index
        # 0x9E3779B1 (Fibonacci hashing constant) as signed int32
        pltpu.prng_seed(kd0 ^ (gs * jnp.int32(-1640531535)) ^ (n * 97 + 13) ^ kd1)
        bits = pltpu.bitcast(pltpu.prng_random_bits((_STRIP, W, C)), jnp.uint32)
        # top 24 bits as a positive int32 (Mosaic can't cast uint32->f32)
        hi24 = pltpu.bitcast(bits >> 8, jnp.int32)
        u = hi24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
        g = gs * _STRIP + row_in_strip  # global row of each lane
        row_ok = (g >= p) & (g <= H - 1 - p)
        s = jnp.where((u < gamma) & col_ok & row_ok, 1.0, 0.0)
        seeds_ref[pl.ds(si * _STRIP, _STRIP)] = s.astype(seeds_ref.dtype)
        return 0

    lax.fori_loop(0, n_strips, gen_strip, 0)

    # separable block expansion in bf16 VMEM. Tile rows live at scratch
    # offset _STRIP (one halo strip above); seeds beyond the canvas are 0.
    off = _STRIP - p
    acc = seeds_ref[pl.ds(off, Ht)]
    for d in range(1, 2 * p + 1):
        acc = jnp.maximum(acc, seeds_ref[pl.ds(off + d, Ht)])
    colacc = acc
    for d in range(1, p + 1):
        colacc = jnp.maximum(colacc, _shift_w(acc, d))
        colacc = jnp.maximum(colacc, _shift_w(acc, -d))

    keep = (jnp.ones((), colacc.dtype) - colacc).astype(x_ref.dtype)
    out_ref[0] = x_ref[0] * keep

    # partial sum over rows that exist in the (possibly ragged) last tile;
    # the psum buffer is unblocked SMEM — TPU grid steps run sequentially,
    # each writing its own slot
    row3 = lax.broadcasted_iota(jnp.int32, (Ht, W, C), 0)
    valid = (row3 + row0) < H
    psum_ref[n, ht] = jnp.sum(jnp.where(valid, keep.astype(jnp.float32), 0.0))


@functools.partial(jax.jit, static_argnames=("block_size", "guard_zero", "interpret"))
def dropblock_pallas(
    x: jax.Array,
    key: jax.Array,
    gamma,
    block_size: int,
    guard_zero: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Fused dropblock: returns x * keep * scale.

    gamma: traced scalar (caller picks the dependent/independent formula).
    guard_zero: independent-variant semantics (no rescale when everything
    dropped, utils_modules.py:133-138); False reproduces the dependent
    variant's unguarded numel/sum (which NaNs out when all is dropped, like
    the reference — the model's NaN scrub handles it).
    """
    if not pallas_dropblock_supported(block_size):
        raise ValueError("pallas dropblock requires odd 1 < block_size <= 17")
    n, h, w, c = x.shape
    b = block_size
    ht = _pick_ht(h, w, c)
    n_htiles = pl.cdiv(h, ht)

    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)[:2].astype(jnp.int32)
    gamma32 = jnp.asarray(gamma, jnp.float32).reshape(1)

    kernel = functools.partial(_kernel, H=h, W=w, C=c, Ht=ht, b=b)
    out, psums = pl.pallas_call(
        kernel,
        grid=(n, n_htiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ht, w, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, ht, w, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((n, n_htiles), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((ht + 2 * _STRIP, w, c), jnp.bfloat16),
        ],
        interpret=interpret,
    )(kd, gamma32, x)

    # Per-SAMPLE rescale: each batch element is one MC ensemble member, so
    # the batch-1 reference semantics (scale = numel/sum per forward pass,
    # utils_modules.py:61-64) apply sample-wise. (The pure-XLA impl keeps the
    # reference's whole-batch coupling for training parity; at batch 1 the
    # two are identical.)
    keep_sum = jnp.sum(psums, axis=1)  # (N,)
    total = float(h * w * c)
    if guard_zero:
        scale = jnp.where(keep_sum != 0, total / keep_sum, 1.0)
    else:
        scale = total / keep_sum
    return out * scale.astype(x.dtype)[:, None, None, None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def dropblock_pallas_ad(x, key, gamma, block_size, guard_zero=False, interpret=False):
    """Differentiable wrapper: d(x*keep*scale)/dx = keep*scale, and the mask
    is a deterministic function of (key, gamma, shape) — so the backward pass
    simply reruns the kernel on the cotangent with the same key. No residual
    mask needs to be stored."""
    return dropblock_pallas(x, key, gamma, block_size, guard_zero, interpret)


def _db_fwd(x, key, gamma, block_size, guard_zero, interpret):
    out = dropblock_pallas(x, key, gamma, block_size, guard_zero, interpret)
    return out, (key, gamma)


def _db_bwd(block_size, guard_zero, interpret, res, g):
    key, gamma = res
    dx = dropblock_pallas(g, key, gamma, block_size, guard_zero, interpret)
    return dx, None, None


dropblock_pallas_ad.defvjp(_db_fwd, _db_bwd)
