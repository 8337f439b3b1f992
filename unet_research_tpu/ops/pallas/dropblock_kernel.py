"""DropBlock mask PRODUCER as a bit-packed Pallas TPU kernel.

One kernel pass emits the dense s8 keep-mask (N,H,W,C) plus per-sample keep
counts. The mask math runs on int32 BIT-PLANES — 32 mask positions per
word — so generation, block expansion and the keep-count cost ~1/32nd the
vector ops of an elementwise formulation:

- Bernoulli(gamma) seeds are drawn with a bitwise 'U < gamma' comparator:
  KBITS=16 rounds of hardware PRNG words combine into one seed bit-plane
  (~5 word-ops/round), quantizing gamma to gamma_bits/2^16 (<=0.5% relative
  at the canonical gamma~3e-3; exact identity at gamma=0).
- The separable b x b block expansion is ORs of word-shifted planes
  (interleaved mapping, below) — ~1 op per mask element total.
- The per-sample rescale's keep-count is a popcount over words.

The kernel sits OUTSIDE the activation dataflow: it reads nothing and
writes 1 B/element, so the model's mask*x apply stays an ordinary XLA
elementwise op that can input-fuse into the GroupNorm/ReLU epilogues. (The
round-2/3 lesson, measured twice: a custom call in the APPLY position
forfeits those fusions and its 2R+1W of x erases any generation win —
PERF.md. Even this producer form only ties the pure-XLA elementwise
pipeline end-to-end, 103.4 vs 104.0 MC passes/s, because the custom-call
boundary still perturbs XLA's fusion choices around it; it ships as the
one alternative pipeline, `mask_impl='kernel'`.)

Bit<->position mapping (interleaved): bit t of word g holds width position
q = t*WG + g (WG words of 32 bits cover W; lanes carry C). This makes
unpacking a single `pltpu.repeat` (tile semantics: output sublane
q = t*WG + g is copy t of word g) plus a per-sublane bit extraction.
A shift by k positions decomposes into a sublane shift of k%WG plus a
logical bit-shift of k//WG (with a carry select at the word-wrap boundary).

Semantics match ops.dropblock for ODD block sizes (the canonical
block_size=7): seeds ~ Bernoulli(gamma) over the interior (border of b//2
excluded — equivalent to the dependent variant's valid-center + zero-pad
construction, reference utils_modules.py:36-82), expanded to b x b blocks,
inverted. The RNG stream differs from jax.random (hardware PRNG) and gamma
is 16-bit-quantized — allowed: masks need the right distribution, not
bit-parity with any host RNG.

Strip-aligned generation keeps tiles independent with no cross-tile
communication: every global 8-row strip draws from a stream seeded by
(key, sample, strip), so halo rows replay bit-identically across tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_STRIP = 8  # PRNG strip height; tiles and halos are strip-aligned
KBITS = 16  # gamma quantization bits for the bitwise Bernoulli comparator


def pallas_dropblock_supported(block_size: int) -> bool:
    return block_size % 2 == 1 and 1 < block_size <= 2 * _STRIP + 1


def _pick_ht(h: int, w: int, c: int, budget: int = 14 * 2**20) -> int:
    """Rows per output tile against XLA's 16M *scoped* vmem limit for custom
    calls (a 48M budget OOMed at compile on the (N,74,72,1024) skip sites).
    Mosaic's stack cost is per *lane-padded* element — C pads up to the
    128-lane register width — so C=64 sites cost 2x their logical bytes and
    C=1 sites 128x (measured: 18.2 B/padded-elem at (16,74,72,512) where
    C=512 needs no padding; 15.5 B at (16,592,576,64) where it doubles —
    the unpadded-C formula OOMed the top sites at 18.27M vs the 16M limit).
    Budget with 20 B/padded-element."""
    c_padded = -(-c // 128) * 128
    per_row = max(1, w * c_padded * 20)
    rows = min(h, max(1, budget // per_row))
    ht = max(_STRIP, (rows // _STRIP) * _STRIP)
    # The strip clamp can only round UP to one strip; if even that single
    # strip blows XLA's 16M scoped-vmem ceiling (very wide W at padded C),
    # fail loudly at trace time instead of deep inside Mosaic compile.
    if ht * per_row > 16 * 2**20:
        raise ValueError(
            f"dropblock Pallas kernel: minimum {_STRIP}-row tile at "
            f"(w={w}, c={c}->padded {c_padded}) needs ~{ht * per_row / 2**20:.1f}M "
            "scoped vmem (> the 16M custom-call limit); use mask_impl="
            "'elementwise' for this shape"
        )
    return ht


def _bit_shift(x, n: int):
    """Logical bit shift moving bit (t+n) -> t; n may be negative."""
    if n == 0:
        return x
    if n > 0:
        if n >= 32:
            return jnp.zeros_like(x)
        return lax.shift_right_logical(x, jnp.int32(n))
    if n <= -32:
        return jnp.zeros_like(x)
    return lax.shift_left(x, jnp.int32(-n))


def _g_shift(a, j: int):
    """Word-index (sublane) shift on (R, WG, L) planes: out[g] = a[g+j]."""
    if j == 0:
        return a
    r, wg, lanes = a.shape
    if abs(j) >= wg:
        return jnp.zeros_like(a)
    zeros = jnp.zeros((r, abs(j), lanes), a.dtype)
    if j > 0:
        return jnp.concatenate([a[:, j:, :], zeros], axis=1)
    return jnp.concatenate([zeros, a[:, :j, :]], axis=1)


def _w_shift(a, k: int, wg: int):
    """Width shift on interleaved bit planes: position q picks up q+k.
    Decomposes into sublane shift k%WG + bit shift k//WG with a carry
    select at the word wrap."""
    if k == 0:
        return a
    kb = k % wg  # python: non-negative, floor-consistent with k // wg
    ka = k // wg
    if kb == 0:
        return _bit_shift(a, ka)
    lo = _bit_shift(_g_shift(a, kb), ka)
    hi = _bit_shift(_g_shift(a, kb - wg), ka + 1)
    g_iota = lax.broadcasted_iota(jnp.int32, a.shape, 1)
    return jnp.where(g_iota < wg - kb, lo, hi)


def expand_bit_planes(seeds, p: int, *, wg: int):
    """OR of all (2p+1)-separable width shifts: rows were pre-ORed by the
    caller; this is the width direction. Pure jnp — unit-testable off-TPU."""
    out = seeds
    for s in range(1, p + 1):
        out = out | _w_shift(seeds, s, wg)
        out = out | _w_shift(seeds, -s, wg)
    return out


def _interior_words_np(w: int, p: int, wg: int) -> np.ndarray:
    """(WG, 1) int32: bit t of word g is set iff width position w0 = t*wg+g
    lies in the interior [p, W-1-p] (the Bernoulli-center region; p=0 gives
    the coverage mask that zeroes packing-pad bits). Broadcasts over lanes."""
    out = np.zeros((wg, 1), np.uint32)
    for g in range(wg):
        bits = 0
        for t in range(32):
            w0 = t * wg + g
            if p <= w0 <= w - 1 - p:
                bits |= 1 << t
        out[g, 0] = np.uint32(bits)
    return out.view(np.int32)


def _gen_seed_words(seeds_ref, interior_ref, kd0, kd1, gamma_bits, n, row0,
                    *, H, p, wg, lanes, Ht):
    """Fill the bit-plane scratch for this tile + halo strips: KBITS rounds
    of the bitwise 'U < gamma' comparator on hardware PRNG words, masked to
    the interior region."""
    strip0 = row0 // _STRIP - 1
    n_strips = Ht // _STRIP + 2
    interior = interior_ref[...]  # (wg, 1) int32, broadcasts over lanes
    row_in_strip = lax.broadcasted_iota(jnp.int32, (_STRIP, wg, lanes), 0)

    def gen_strip(si, _):
        gs = strip0 + si
        # 0x9E3779B1 (Fibonacci hashing constant) as signed int32
        pltpu.prng_seed(kd0 ^ (gs * jnp.int32(-1640531535)) ^ (n * 97 + 13) ^ kd1)
        lt = jnp.zeros((_STRIP, wg, lanes), jnp.int32)
        eq = jnp.full((_STRIP, wg, lanes), -1, jnp.int32)
        for i in range(KBITS):
            r = pltpu.bitcast(pltpu.prng_random_bits((_STRIP, wg, lanes)), jnp.int32)
            gbit = (gamma_bits >> (KBITS - 1 - i)) & 1
            gmask = -gbit  # 0 or all-ones, broadcast scalar
            # U < gamma decided where still tied, u_i = 0, g_i = 1
            lt = lt | (eq & ~r & gmask)
            # tie continues where u_i == g_i
            eq = eq & (r ^ ~gmask)
        g = gs * _STRIP + row_in_strip
        row_ok = (g >= p) & (g <= H - 1 - p)
        seeds_ref[pl.ds(si * _STRIP, _STRIP)] = jnp.where(row_ok, lt & interior, 0)
        return 0

    lax.fori_loop(0, n_strips, gen_strip, 0)


def _gen_block_words(seeds_ref, interior_ref, kd0, kd1, gamma_bits, n, row0,
                     *, H, b, wg, lanes, Ht):
    """Seed bit-planes + separable block expansion -> dropped-position
    bit-planes (Ht, WG, lanes) for this tile."""
    p = b // 2
    _gen_seed_words(seeds_ref, interior_ref, kd0, kd1, gamma_bits, n, row0,
                    H=H, p=p, wg=wg, lanes=lanes, Ht=Ht)
    off = _STRIP - p
    acc = seeds_ref[pl.ds(off, Ht)]
    for d in range(1, 2 * p + 1):
        acc = acc | seeds_ref[pl.ds(off + d, Ht)]
    return expand_bit_planes(acc, p, wg=wg)


def _mask_kernel(kd_ref, gb_ref, interior_ref, cover_ref, tpos_ref,
                 mask_ref, psum_ref, seeds_ref, *, H, b, wg, c, Ht):
    """Mask-producer kernel body: dense s8 keep-mask tile + per-tile drop
    counts (summed over the valid rows of this tile)."""
    n = pl.program_id(0)
    ht = pl.program_id(1)
    row0 = ht * Ht
    block = _gen_block_words(seeds_ref, interior_ref, kd_ref[0], kd_ref[1],
                             gb_ref[0], n, row0,
                             H=H, b=b, wg=wg, lanes=c, Ht=Ht)
    blockc = block & cover_ref[...]  # drop expansion spill into packing pad
    counts = lax.population_count(blockc)
    row3 = lax.broadcasted_iota(jnp.int32, (Ht, wg, c), 0)
    valid = (row3 + row0) < H  # ragged last tile
    psum_ref[n, ht] = jnp.sum(jnp.where(valid, counts, 0).astype(jnp.float32))
    w = mask_ref.shape[2]
    planes = pltpu.repeat(block, -(-w // wg), axis=1)[:, :w, :]
    # arithmetic bit extraction (no i1->i8 select: Mosaic cannot relayout an
    # (8,128)-tiled i1 mask onto the (32,128) i8 tiling); the i32 0/1 keep
    # value converts (packs) to s8 directly
    dropped01 = lax.shift_right_logical(planes, tpos_ref[...][None, :, :]) & 1
    mask_ref[0] = (1 - dropped01).astype(jnp.int8)


def _prep(x_shape, key, gamma, block_size):
    n, h, w, c = x_shape
    b = block_size
    p = b // 2
    wg = -(-w // 32)
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)[:2].astype(jnp.int32)
    # stop_gradient: the mask is a deterministic function of (key, gamma) and
    # never differentiated; this keeps autodiff from trying to linearize the
    # pallas_call when gamma rides a traced drop-prob schedule
    g = lax.stop_gradient(jnp.asarray(gamma, jnp.float32))
    gb = jnp.clip(jnp.round(g * (1 << KBITS)),
                  0, (1 << KBITS) - 1).astype(jnp.int32).reshape(1)
    interior = jnp.asarray(_interior_words_np(w, p, wg))
    cover = jnp.asarray(_interior_words_np(w, 0, wg))
    return n, h, w, c, b, wg, kd, gb, interior, cover


def _fused_kernel(kd_ref, gb_ref, interior_ref, cover_ref, tpos_ref, ab_ref,
                  x_ref, out_ref, psum_ref, seeds_ref,
                  *, H, b, wg, c, Ht, affine, act, slope):
    """Fused GroupNorm-affine + DropBlock + activation in the APPLY position:

        out = act((x * a + b) * keep_mask)

    One custom call owns the whole conv epilogue: the mask never touches HBM
    (bit-planes live in VMEM), the keep-count is a popcount side output, and
    x is read and written exactly once. The rescale is NOT applied here —
    the caller runs under the model's fold_rescale dataflow (models/unet.py),
    which needs the count only at skip/head sites and nowhere else.
    a, b are the per-(sample, channel) GroupNorm affine coefficients
    (models/unet.py group_norm_affine); computing them OUTSIDE the kernel is
    deliberate: XLA input-fuses the moment reductions into the producing
    conv, which a custom call could never do (the round-2 lesson, PERF.md).
    """
    n = pl.program_id(0)
    ht = pl.program_id(1)
    row0 = ht * Ht
    block = _gen_block_words(seeds_ref, interior_ref, kd_ref[0], kd_ref[1],
                             gb_ref[0], n, row0,
                             H=H, b=b, wg=wg, lanes=c, Ht=Ht)
    blockc = block & cover_ref[...]  # drop expansion spill into packing pad
    counts = lax.population_count(blockc)
    row3 = lax.broadcasted_iota(jnp.int32, (Ht, wg, c), 0)
    valid = (row3 + row0) < H  # ragged last tile
    psum_ref[n, ht] = jnp.sum(jnp.where(valid, counts, 0).astype(jnp.float32))
    w = out_ref.shape[2]
    planes = pltpu.repeat(block, -(-w // wg), axis=1)[:, :w, :]
    dropped01 = lax.shift_right_logical(planes, tpos_ref[...][None, :, :]) & 1
    x = x_ref[0]
    if affine:
        a = ab_ref[0, pl.ds(n, 1), :]  # (1, C), broadcasts over (Ht, W, C)
        bb = ab_ref[1, pl.ds(n, 1), :]
        y = x * a.astype(x.dtype) + bb.astype(x.dtype)
    else:
        y = x
    y = jnp.where(dropped01 == 1, jnp.zeros_like(y), y)
    if act == "relu":
        y = jnp.maximum(y, jnp.zeros_like(y))
    elif act == "leaky_relu":
        y = jnp.where(y > 0, y, y * jnp.asarray(slope, y.dtype))
    out_ref[0] = y


def dropblock_fused_apply(x, ab, key, gamma, block_size: int, *,
                          act: str = "relu", slope: float = 0.01,
                          interpret=False):
    """act((x * a + b) * keep_mask) and per-sample keep counts, one pass.

    x: (N, H, W, C); ab: (2, N, C) stacked GroupNorm-affine coefficients, or
    None for unnormalized sites (the skip-merge mask). Returns (out, keep)
    with keep (N,) float32 — the caller derives the deferred rescale where
    the fold_rescale dataflow needs it (reference rescale semantics:
    utils_modules.py:61-64/133-138, batch-1 per member).

    Not differentiable by design: the fused path is for inference-mode
    ensembles (MC uncertainty, bench.py); training keeps the XLA pipeline.
    """
    if not pallas_dropblock_supported(block_size):
        raise ValueError("pallas dropblock requires odd 1 < block_size <= 17")
    n, h, w, c, b, wg, kd, gb, interior, cover = _prep(x.shape, key, gamma, block_size)
    # x in + out double-buffered (2 x 2 x itemsize) + i32 planes/select temps
    ht = _pick_ht(h, w, c, budget=13 * 2**20)
    n_htiles = pl.cdiv(h, ht)
    tpos = jnp.asarray((np.arange(w, dtype=np.int32) // wg).reshape(w, 1))
    affine = ab is not None
    if ab is None:
        ab = jnp.zeros((2, n, c), jnp.float32)

    kernel = functools.partial(_fused_kernel, H=h, b=b, wg=wg, c=c, Ht=ht,
                               affine=affine, act=act, slope=slope)
    out, psums = pl.pallas_call(
        kernel,
        grid=(n, n_htiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ht, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
            jax.ShapeDtypeStruct((n, n_htiles), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((ht + 2 * _STRIP, wg, c), jnp.int32)],
        interpret=interpret,
    )(kd, gb, interior, cover, tpos, ab.astype(jnp.float32), x)
    keep = float(h) * w * c - jnp.sum(psums, axis=1)
    return out, keep


def dropblock_pallas_mask(shape, key, gamma, block_size: int, interpret=False):
    """Dense s8 keep-mask (N,H,W,C) + keep counts (N,) in ONE kernel pass.

    The consumer multiplies x * mask * scale in plain XLA (which fuses it
    into neighboring epilogues); scale comes from the keep counts exactly as
    in the pure-XLA paths (reference utils_modules.py:61-64 / 133-138).
    HBM cost: one 1 B/element write; generation, expansion, count and
    unpack all run in-VMEM on hardware PRNG words."""
    if not pallas_dropblock_supported(block_size):
        raise ValueError("pallas dropblock requires odd 1 < block_size <= 17")
    n, h, w, c, b, wg, kd, gb, interior, cover = _prep(shape, key, gamma, block_size)
    ht = _pick_ht(h, w, c)
    n_htiles = pl.cdiv(h, ht)
    tpos = jnp.asarray((np.arange(w, dtype=np.int32) // wg).reshape(w, 1))

    kernel = functools.partial(_mask_kernel, H=h, b=b, wg=wg, c=c, Ht=ht)
    mask, psums = pl.pallas_call(
        kernel,
        grid=(n, n_htiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ht, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w, c), jnp.int8),
            jax.ShapeDtypeStruct((n, n_htiles), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((ht + 2 * _STRIP, wg, c), jnp.int32)],
        interpret=interpret,
    )(kd, gb, interior, cover, tpos)
    keep = float(h) * w * c - jnp.sum(psums, axis=1)
    return mask, keep
