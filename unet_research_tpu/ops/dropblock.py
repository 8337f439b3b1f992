"""DropBlock mask generation, pure-XLA reference implementations (NHWC).

The reference ships two torch DropBlock variants (utils/utils_modules.py):

- ``DropBlock2D`` ("dependent" in the CLIs, though channels are still masked
  independently): Bernoulli(gamma) over the valid-center region
  (H-b+1, W-b+1), zero-padded back to (H, W), expanded to blocks with a
  stride-1 max-pool, inverted, applied, and rescaled by numel/sum
  (utils_modules.py:36-82).
- ``Dropblock2d_ichan``: Bernoulli(gamma) over the full (H, W) grid with the
  b//2 border rows/cols zeroed, the same stride-1 max-pool block expansion,
  and a zero-division-guarded 1/mean rescale (utils_modules.py:86-139).

Both use the same paper gamma; the ichan variant clamps it to 1. These
functions reproduce the exact semantics with jax.random + reduce_window so
they vmap cleanly over per-sample PRNG keys — that is what turns the
reference's 1000 serial MC forward passes into one batched device program.

The fused Pallas kernel (in-kernel PRNG + block expansion) lives in
ops/pallas/dropblock_kernel.py; these are the goldens it is tested against.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Read once at import: flipping the env var after the first jit compile could
# never take effect anyway (the toggle is trace-time), so making it an
# import-time constant keeps behavior a function of visible state. Callers can
# also pass `bitplane=` explicitly (e.g. from a config knob).
BITPLANE_DEFAULT = bool(os.environ.get("UNET_DB_BITPLANE"))

# Mask pipeline selector: 'elementwise' (XLA hash+maxpool), 'bitplane'
# (XLA word-packed), 'kernel' (Pallas mask PRODUCER: hardware PRNG +
# in-VMEM expansion emitting the dense s8 mask + keep counts; the apply
# stays plain XLA so it input-fuses into neighboring epilogues).
# UNET_DB_IMPL overrides; unset defers to the bitplane bool knobs.
IMPL_DEFAULT = os.environ.get("UNET_DB_IMPL") or None


def _resolve_impl(mask_impl, bitplane) -> str:
    impl = mask_impl or IMPL_DEFAULT
    if impl is None:
        if bitplane is None:
            bitplane = BITPLANE_DEFAULT
        impl = "bitplane" if bitplane else "elementwise"
    if impl not in ("elementwise", "bitplane", "kernel"):
        raise ValueError(f"unknown dropblock mask_impl {impl!r}")
    return impl


def _kernel_ok(block_size: int) -> bool:
    if block_size % 2 != 1 or block_size <= 1:
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def dropblock_gamma_dependent(h: int, w: int, block_size: int, drop_prob) -> jax.Array:
    """Gamma for the dependent variant (utils_modules.py:81-82). Unclamped."""
    b = block_size
    return drop_prob * h * w / ((b * b) * (h - b + 1) * (w - b + 1))


def dropblock_gamma_independent(h: int, w: int, block_size: int, drop_prob) -> jax.Array:
    """Gamma for the independent-channel variant (utils_modules.py:98-102),
    clamped to 1."""
    b = block_size
    gamma = (drop_prob / (b * b)) * (h * w) / ((h - b + 1) * (w - b + 1))
    return jnp.minimum(gamma, 1.0)


def _hash_uniform(key: jax.Array, shape) -> jax.Array:
    """Counter-based uniform [0,1) noise from a murmur3-style integer mixer.

    jax.random's threefry costs ~100 int-ops per draw and dominated the MC
    hot loop (~10 ms of a 21 ms pass at 584x565); this mixer is ~10 VPU ops
    per element, coordinate-stable, and XLA fuses it straight into the
    dropblock mask pipeline with no HBM round trip. Independence across MC
    members comes from folding both PRNG key words into the hash; the
    statistical tests in tests/test_dropblock.py run against this path.
    """
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    n = 1
    for s in shape:
        n *= s
    idx = lax.broadcasted_iota(jnp.uint32, (n, 1), 0).reshape(shape)
    x = idx * jnp.uint32(2654435761) ^ kd[0]
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15) ^ kd[-1]
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    # 24-bit mantissa -> exact float32 uniform in [0, 1)
    return (x >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _bernoulli(key, gamma, shape, fast_rng: bool):
    if fast_rng:
        return _hash_uniform(key, shape) < gamma
    return jax.random.bernoulli(key, gamma, shape=shape)


# --- bit-plane mask pipeline ---------------------------------------------------
#
# The mask math (Bernoulli seeds, border zeroing, b x b max-pool expansion,
# keep-count) runs on int32 BIT-PLANES packed along the HEIGHT axis: bit t
# of word g holds mask row h = g*32 + t, so every vector op processes 32
# mask positions. The Bernoulli draw uses a bitwise MSB-first 'U < gamma'
# comparator on hashed word streams (KBITS rounds of ~6 word-ops decide all
# 32 positions at once, quantizing gamma to multiples of 2^-KBITS); the
# expansion is ORs of across-word funnel shifts (H) and row rolls (W).
# Compared to the elementwise pipeline above (~10 hash ops + 14 expansion
# taps per element) this is ~10 word-ops per 32 elements for generation.
#
# WHY the H axis: the unpack in apply_bitplane_mask is
# repeat(axis=1) + reshape + per-row bit test. With H-packing the reshape
# merges dims that lie OUTSIDE the TPU's tiled (second-minor, minor) =
# (W, C) pair, so it is a layout-preserving bitcast and XLA fuses the whole
# unpack into the surrounding conv/GroupNorm elementwise epilogue — the
# expanded mask never exists in HBM. (A width-packed variant was measured
# first: its (WG, 32)->W merge changes the sublane dim, forcing a 4-byte/
# element materialization that erased the win.)
#
# Everything here is plain jnp on int32: it runs (and is tested) on CPU,
# vmaps, and differentiates through `where` with no custom VJP.
#
# STATUS (v5e, round 2): opt-in via UNET_DB_BITPLANE=1. The unpack fuses to
# ~zero measured cost and generation is ~10 word-ops/32 positions on paper,
# but at the canonical C=64 top sites the (..., W, 64)-layout planes leave
# half the VPU lanes idle during generation, and end-to-end the pipeline
# measures 89.3 MC passes/s vs 93.6 for the elementwise path above — so the
# elementwise pipeline stays default. See PERF.md for the ladder.

KBITS = 12  # gamma quantized to n/2^12: <=2% relative at the canonical 3e-3


def _hash_words(key: jax.Array, shape, salt: int) -> jax.Array:
    """Murmur3-style mixed int32 words, coordinate-stable (same family as
    _hash_uniform but one word per 32 mask positions)."""
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    n = 1
    for s in shape:
        n *= s
    idx = lax.broadcasted_iota(jnp.uint32, (n, 1), 0).reshape(shape)
    x = idx * jnp.uint32(2654435761) ^ (kd[0] + jnp.uint32(salt) * jnp.uint32(0x9E3779B1))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15) ^ kd[-1]
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x.astype(jnp.int32) if x.dtype != jnp.int32 else x


def _seed_planes(key, gamma, shape) -> jax.Array:
    """int32 Bernoulli(gamma) bit-planes via the bitwise comparator: lt
    accumulates 'decided below', eq tracks surviving ties.

    Per-round randomness: one murmur-mixed word seeds a per-position
    xorshift32 stream (3 ops/round instead of 6), which is plenty for mask
    thinning — the statistical gates in tests/test_dropblock.py hold."""
    gb = jnp.clip(
        jnp.round(jnp.asarray(gamma, jnp.float32) * (1 << KBITS)),
        0, (1 << KBITS) - 1,
    ).astype(jnp.int32)
    # `| 1` guards the xorshift fixed point at state 0: a hash word that mixes
    # to exactly 0 would stay 0 for all KBITS rounds and deterministically
    # seed dropped blocks at those 32 positions (~2^-32 per word).
    state = _hash_words(key, shape, salt=0x5EED) | 1
    lt = jnp.zeros(shape, jnp.int32)
    eq = jnp.full(shape, -1, jnp.int32)
    for i in range(KBITS):
        state = state ^ lax.shift_left(state, jnp.int32(13))
        state = state ^ lax.shift_right_logical(state, jnp.int32(17))
        state = state ^ lax.shift_left(state, jnp.int32(5))
        r = state
        gbit = (gb >> (KBITS - 1 - i)) & 1
        gmask = -gbit  # 0 or all-ones scalar
        lt = lt | (eq & ~r & gmask)  # tie and u_i=0 < g_i=1: decided
        eq = eq & (r ^ ~gmask)  # tie survives where u_i == g_i
    return lt


def _word_shift(a: jax.Array, s: int, hg: int) -> jax.Array:
    """Height shift on packed bit-planes along axis 1: position q picks up
    position q+s. Bit t of word g holds q = g*32 + t, so a shift by s is a
    funnel shift across word neighbors."""
    if s == 0:
        return a
    gs, tb = divmod(s, 32)  # python floor-div: tb in [0, 32)

    def word(j):
        # neighbor word g+j, zero beyond the edge
        if j == 0:
            return a
        if abs(j) >= hg:
            return jnp.zeros_like(a)
        pad = jnp.zeros_like(a[:, :1])
        if j > 0:
            return jnp.concatenate([a[:, j:]] + [pad] * j, axis=1)
        return jnp.concatenate([pad] * (-j) + [a[:, :j]], axis=1)

    lo = word(gs)
    if tb == 0:
        return lo
    hi = word(gs + 1)
    # logical funnel: bit t of out = bit t+tb of lo (t+tb<32) else
    # bit t+tb-32 of hi
    lo_u = lax.shift_right_logical(lo, jnp.int32(tb))
    hi_u = lax.shift_left(hi, jnp.int32(32 - tb))
    return lo_u | hi_u


def _expand_planes(seeds: jax.Array, p: int, hg: int, w_axis: int = 2) -> jax.Array:
    """Separable (2p+1) x (2p+1) OR-expansion of seed planes:
    funnel word-shifts along packed H (axis 1), rolls along W (`w_axis`)."""
    acc = seeds
    for d in range(1, p + 1):
        acc = acc | jnp.roll(seeds, d, axis=w_axis) | jnp.roll(seeds, -d, axis=w_axis)
    # columns rolled across the canvas edge carry seeds the interior column
    # mask zeroed anyway (odd-b draws exclude the border), so roll is safe;
    # height shifts are edge-zeroed in _word_shift.
    out = acc
    for s in range(1, p + 1):
        out = out | _word_shift(acc, s, hg) | _word_shift(acc, -s, hg)
    return out


def _word_masks_np(h: int, p: int, hg: int):
    """(HG,) int32 with bit t of word g set iff q = g*32+t is a valid row
    in [p, h-1-p] (also zeroes the h..hg*32 packing pad)."""
    q = np.arange(hg * 32)
    ok = ((q >= p) & (q <= h - 1 - p)).astype(np.uint64)
    words = (ok.reshape(hg, 32) << np.arange(32, dtype=np.uint64)).sum(axis=1)
    return words.astype(np.uint32).view(np.int32)


def dropblock_mask_bitplane(
    key: jax.Array, gamma, shape, block_size: int
):
    """Dropped-position bit-planes + keep count for NHWC `shape`.

    Returns (planes, keep): planes (N, HG, W, C) int32 where bit t of word g
    marks row g*32+t dropped; keep (N,) f32 kept-position counts.
    Odd block_size only (the canonical configs; even b falls back to the
    elementwise path in the callers).

    Lane-occupancy rule (v5e, round-3 profile): the generation/expansion
    word math runs in whichever of two layouts fills the 128 VPU lanes
    better — (N, HG, W, C) when C >= W (deep, narrow sites) or
    (N, HG, C, W) when W > C (the top U-Net levels, where C=64 left half
    the lanes idle and the mask pipeline was ~35% of the whole MC pass).
    In the W-lanes layout the W-expansion taps become lane rotations and
    the final swapaxes back to (..., W, C) costs 1/8 the bytes of the
    dense mask it replaces.
    """
    n, h, w, c = shape
    b = block_size
    p = b // 2
    hg = -(-h // 32)
    lanes_w = w > c
    if lanes_w:
        seeds = _seed_planes(key, gamma, (n, hg, c, w))
        cols = jnp.arange(w, dtype=jnp.int32).reshape(1, 1, 1, w)
        w_axis = 3
    else:
        seeds = _seed_planes(key, gamma, (n, hg, w, c))
        cols = jnp.arange(w, dtype=jnp.int32).reshape(1, 1, w, 1)
        w_axis = 2
    col_ok = jnp.where((cols >= p) & (cols <= w - 1 - p), -1, 0)
    interior = jnp.asarray(_word_masks_np(h, p, hg)).reshape(1, hg, 1, 1)
    seeds = seeds & col_ok & interior
    planes = _expand_planes(seeds, p, hg, w_axis=w_axis)
    cover = jnp.asarray(_word_masks_np(h, 0, hg)).reshape(1, hg, 1, 1)
    planes = planes & cover
    # materialize the word-level planes: without the barrier XLA fuses this
    # whole producer chain into the per-ELEMENT unpack consumer, recomputing
    # the word ops 32x (measured: +4.5 ms/chunk at the top U-Net site). The
    # planes array is 1/8 the bytes of x — reading it back is ~free.
    planes = lax.optimization_barrier(planes)
    dropped = jnp.sum(
        lax.population_count(planes).astype(jnp.float32), axis=(1, 2, 3)
    )
    if lanes_w:
        planes = jnp.swapaxes(planes, 2, 3)  # -> (N, HG, W, C) for the unpack
    return planes, float(h * w * c) - dropped


def bitplane_to_dense(planes: jax.Array, h: int) -> jax.Array:
    """Unpack H-packed bit-planes (N, HG, W, C) to a dense s8 KEEP mask
    (N, h, W, C) (1 = keep, 0 = dropped — the reference's block_mask
    orientation after inversion, utils_modules.py:61).

    Shape discipline matters here: the unpack is expressed as
    broadcast -> bit-test -> s8 write in a 5-D (N, HG, 32, W, C) view with
    NO reshape between the broadcast and its consumer, then one
    layout-preserving (HG, 32) -> H merge. Round-3 profile: the previous
    repeat+reshape+slice formulation made XLA materialize the s32 broadcast
    at 4 B/element (1.4 GB per top site, 2 ms/pass total); this form lowers
    to a single output fusion writing the 1 B/element mask.
    """
    n, hg, w, c = planes.shape
    tbit = lax.broadcasted_iota(jnp.int32, (1, 1, 32, 1, 1), 2)
    p5 = planes[:, :, None, :, :]
    dropped = lax.shift_right_logical(p5, tbit) & 1  # (N, HG, 32, W, C)
    keep5 = (jnp.int8(1) - dropped.astype(jnp.int8))
    return keep5.reshape(n, hg * 32, w, c)[:, :h]


def apply_bitplane_mask(x: jax.Array, planes: jax.Array, scale) -> jax.Array:
    """x * keep * scale from bit-planes.

    The unpack is repeat along the PACKED H axis + reshape + per-row bit
    test: the reshape merges dims outside the TPU-tiled (W, C) pair (a
    bitcast), and the bit test is elementwise — XLA fuses the whole thing
    into neighboring epilogues. scale: (N,) or scalar, pre-divided."""
    n, h, w, c = x.shape
    hg = planes.shape[1]
    rep = jnp.repeat(planes, 32, axis=1)[:, :h]  # word of row q at row q
    tbit = (jnp.arange(h, dtype=jnp.int32) % 32).reshape(1, h, 1, 1)
    dropped = lax.shift_right_logical(rep, tbit) & 1
    sc = jnp.asarray(scale, jnp.float32).reshape(-1, 1, 1, 1).astype(x.dtype)
    return jnp.where(dropped != 0, jnp.zeros((), x.dtype), x * sc)


def _block_expand_max(mask: jax.Array, block_size: int) -> jax.Array:
    """Stride-1 max-pool with kernel `block_size`, torch-style b//2 padding.

    Expands isolated seed ones into b x b blocks. For even b the torch code
    crops the trailing row/col after pooling; we do the same.

    Computed separably (1D max over H, then over W) — max over a rectangle
    factorizes exactly, and two b-tap passes cost 2b reads/element instead
    of b^2, which matters at b=7 on every dropblock site of the MC hot loop.
    """
    b = block_size
    p = b // 2
    # int8 {0,1} masks halve the expansion's HBM traffic vs bf16 and use the
    # finite dtype-min as the max identity; float inputs keep -inf
    init = jnp.iinfo(mask.dtype).min if jnp.issubdtype(mask.dtype, jnp.integer) else -jnp.inf
    out = lax.reduce_window(
        mask,
        jnp.asarray(init, mask.dtype),
        lax.max,
        window_dimensions=(1, b, 1, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (p, p), (0, 0), (0, 0)),
    )
    if b % 2 == 0:
        out = out[:, : mask.shape[1], :, :]
    out = lax.reduce_window(
        out,
        jnp.asarray(init, mask.dtype),
        lax.max,
        window_dimensions=(1, 1, b, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, 0), (p, p), (0, 0)),
    )
    if b % 2 == 0:
        out = out[:, :, : mask.shape[2], :]
    return out


def dropblock_dependent(
    x: jax.Array,
    key: jax.Array,
    drop_prob,
    block_size: int,
    fast_rng: bool = True,
    bitplane: bool | None = None,
    mask_impl: str | None = None,
) -> jax.Array:
    """DropBlock2D-equivalent (reference utils_modules.py:36-82), NHWC.

    Seeds are drawn over the valid-center region only, then zero-padded to
    full size, so no block ever extends past the canvas asymmetrically.
    The output is rescaled by numel/sum(block_mask) over the whole input —
    exactly the reference's data-dependent scaling (which divides by zero and
    NaNs out if everything is dropped; the model's NaN scrub handles that,
    as in the reference).

    drop_prob may be a traced scalar: at p=0 the math degrades to identity
    (all-ones block mask, scale 1), so no dynamic branch is needed under jit.
    """
    impl = _resolve_impl(mask_impl, bitplane)
    n, h, w, c = x.shape
    b = block_size
    gamma = dropblock_gamma_dependent(h, w, b, drop_prob)
    p = b // 2
    if impl == "kernel" and _kernel_ok(b):
        # Pallas mask producer: dense s8 keep-mask + popcount keep counts in
        # one kernel pass; the whole-batch numel/sum rescale matches the
        # reference exactly (utils_modules.py:61-64) and the x*mask*scale
        # apply is plain XLA, free to fuse into the consuming conv.
        from unet_research_tpu.ops.pallas.dropblock_kernel import dropblock_pallas_mask

        dense, keep = dropblock_pallas_mask(x.shape, key, gamma, b)
        scale = float(n * h * w * c) / jnp.sum(keep)
        return x * dense.astype(x.dtype) * scale.astype(x.dtype)
    if b % 2 == 1 and fast_rng and impl == "bitplane":
        # bit-plane pipeline (module comment above): word ops for the mask
        # math + popcount keep-count (no full-tensor rescale re-read), then
        # one dense s8 unpack so the mask-apply keeps input-fusing into the
        # consuming conv exactly like the elementwise path. The whole-batch
        # numel/sum rescale matches the reference exactly
        # (utils_modules.py:61-64; at batch 1 they are the same thing).
        planes, keep = dropblock_mask_bitplane(key, gamma, x.shape, b)
        scale = float(n * h * w * c) / jnp.sum(keep)
        dense = bitplane_to_dense(planes, h)
        return x * dense.astype(x.dtype) * scale.astype(x.dtype)
    if b % 2 == 1:
        # odd b: drawing over the full grid and zeroing the p-wide border is
        # identical to draw-over-valid-centers + ZeroPad2d(p), but the
        # borderless formulation lets XLA fuse the PRNG hash + compare +
        # border mask directly into the expansion's input (no materialized
        # pad), saving an HBM round trip on the MC hot path.
        seeds = _bernoulli(key, gamma, (n, h, w, c), fast_rng)
        rows = jnp.arange(h)[:, None]
        cols = jnp.arange(w)[None, :]
        interior = ((rows >= p) & (rows <= h - 1 - p) & (cols >= p) & (cols <= w - 1 - p))
        mask = (seeds & interior[None, :, :, None]).astype(jnp.int8)
    else:
        seeds = _bernoulli(key, gamma, (n, h - b + 1, w - b + 1, c), fast_rng).astype(
            x.dtype
        )
        mask = jnp.pad(seeds, ((0, 0), (p, p), (p, p), (0, 0)))
        mask = mask[:, :h, :w, :]  # ZeroPad2d(b//2) then [:-1, :-1] crop
    block = _block_expand_max(mask, b)
    if jnp.issubdtype(block.dtype, jnp.integer):
        block_mask = jnp.int8(1) - block
    else:
        block_mask = (1.0 - block).astype(jnp.int8)
    # (An optimization_barrier here to make the keep-count read the written
    # mask instead of re-deriving it measured SLOWER end-to-end — 101.4 vs
    # 104.0 passes/s — XLA's duplicated producer chains fuse better than the
    # forced materialize+reread. Leave the graph unconstrained.)
    # data-dependent rescale accumulated in f32 (bf16 sums of ~1e6 elements
    # would corrupt the scale)
    scale = block_mask.size / jnp.sum(block_mask.astype(jnp.float32))
    return x * block_mask.astype(x.dtype) * scale.astype(x.dtype)


def dropblock_independent(
    x: jax.Array,
    key: jax.Array,
    drop_prob,
    block_size: int,
    fast_rng: bool = True,
    bitplane: bool | None = None,
    mask_impl: str | None = None,
) -> jax.Array:
    """Dropblock2d_ichan-equivalent (reference utils_modules.py:107-139), NHWC.

    Bernoulli over the full grid with the b//2 border frame zeroed, stride-1
    max-pool block expansion, and a guarded 1/mean rescale (identity when
    everything was dropped). Requires odd block_size — the reference's
    reshape-based per-channel pooling implicitly does too.
    """
    if block_size % 2 == 0:
        raise ValueError("dropblock_independent requires an odd block_size")
    impl = _resolve_impl(mask_impl, bitplane)
    n, h, w, c = x.shape
    b = block_size
    gamma = dropblock_gamma_independent(h, w, b, drop_prob)
    if impl == "kernel" and _kernel_ok(b):
        # guarded 1/mean rescale over the whole batch (utils_modules.py:133-138)
        from unet_research_tpu.ops.pallas.dropblock_kernel import dropblock_pallas_mask

        dense, keep = dropblock_pallas_mask(x.shape, key, gamma, b)
        keep_frac = jnp.sum(keep) / float(n * h * w * c)
        scale = jnp.where(keep_frac != 0, 1.0 / keep_frac, 1.0)
        return x * dense.astype(x.dtype) * scale.astype(x.dtype)
    if fast_rng and impl == "bitplane":
        # bit-plane pipeline with the ichan variant's guarded 1/mean rescale
        # over the whole batch (utils_modules.py:133-138)
        planes, keep = dropblock_mask_bitplane(key, gamma, x.shape, b)
        keep_frac = jnp.sum(keep) / float(n * h * w * c)
        scale = jnp.where(keep_frac != 0, 1.0 / keep_frac, 1.0)
        dense = bitplane_to_dense(planes, h)
        return x * dense.astype(x.dtype) * scale.astype(x.dtype)
    seeds = _bernoulli(key, gamma, x.shape, fast_rng).astype(jnp.int8)
    ex = b // 2
    if ex > 0:
        border = jnp.zeros((h, w), dtype=jnp.int8)
        border = border.at[ex : h - ex, ex : w - ex].set(1)
        seeds = seeds * border[None, :, :, None]
    block = _block_expand_max(seeds, b)
    keep = jnp.int8(1) - block
    keep_frac = jnp.mean(keep.astype(jnp.float32))
    scale = jnp.where(keep_frac != 0, 1.0 / keep_frac, 1.0)
    return x * keep.astype(x.dtype) * scale.astype(x.dtype)


def linear_drop_prob(step, start: float, stop: float, nr_steps: int):
    """Drop-prob of the dropblock package's LinearScheduler at global `step`.

    The scheduler holds np.linspace(start, stop, nr_steps) and is stepped once
    per training forward (reference utils_unet.py:410-411, set_dropblock
    utils_unet.py:129-132), staying at `stop` afterwards:
    p(i) = start + (stop-start) * min(i, n-1)/(n-1).

    `step` may be a traced int32, so the schedule threads through jit as a
    scalar instead of module state.
    """
    if nr_steps <= 1:
        return jnp.asarray(stop, dtype=jnp.float32)
    i = jnp.minimum(jnp.asarray(step, dtype=jnp.float32), nr_steps - 1)
    return start + (stop - start) * i / (nr_steps - 1)
