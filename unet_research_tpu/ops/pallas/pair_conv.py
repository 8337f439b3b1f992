"""3x3 SAME convolution as a pair-view Pallas GEMM — the conv-owning kernel
for the U-Net's C_out=64 top level.

Why: XLA lowers this model's top-level convs (592x576, 64->64) to an MXU
GEMM whose output lane axis is C_out=64 — half the 128-wide MXU — and the
round-3 MC-pass profile measured them at 34% MFU, 1.77 ms/pass of a 9.6 ms
pass (PERF.md). The reference leaves this to cuDNN (torch nn.Conv2d,
utils_unet.py:221); on TPU the fix is to restructure the GEMM, not the model.

The pair trick: compute TWO adjacent output columns per GEMM row. Output
lives in pair-view (N, H, W/2, 2*C_out) where lane = (q, co), q = w % 2 —
all 128 MXU output lanes busy. Each output pair (cols 2j, 2j+1) reads input
columns {2j-1 .. 2j+2}, covered exactly once by two half-shifted pair-views:

    u[j] = (x[2j-1], x[2j])      v[j] = (x[2j+1], x[2j+2])

so one row offset dy contributes two accumulating matmuls with zero-padded
block weights (3 of 4 C x C_out blocks live in each):

    Wu[dy] = [[K[dy,0],    0   ],     Wv[dy] = [[K[dy,2], K[dy,1]],
              [K[dy,1], K[dy,0]]]               [   0   , K[dy,2]]]

6 matmuls of (Ht*W/2, 2C) @ (2C, 2*C_out) per tile; useful/issued FLOPs =
75%, against XLA's 50% lane ceiling at C_out=64 (and its measured 34%).

Optionally emits the per-channel GroupNorm moment sums (s1, s2) of the f32
accumulator as side outputs, so the conv -> GN-coeff -> fused-DropBlock
chain (models/unet.py, dropblock_kernel.dropblock_fused_apply) never makes
another full pass over the activation.

Halo: each H-tile needs one row above and below. x stays in HBM (ANY) and
the kernel runs its own two-slot DMA pipeline — the body rows plus two
edge-conditional single-row halo copies per tile, next tile's copies issued
before this tile's matmuls — so every input byte crosses HBM exactly once
and the fetch overlaps compute (a block-mapped halo would triple the input
traffic: three overlapping tile views).

Differentiable: a custom VJP routes the input gradient back through the same
pair kernel (dx is itself a 3x3 SAME conv — of the cotangent with the
spatially-rotated, channel-transposed kernel, so it has the same C_out=64
lane problem the forward does) and computes the weight gradient as one XLA
correlation (a single (9C, NHW) @ (NHW, F) GEMM — contraction-dominated, not
lane-limited). The stats side outputs are differentiated exactly:
s1 = sum y, s2 = sum y^2 over (H, W), so their cotangents fold into the
output cotangent as g = dy + ds1 + 2*y*ds2 before the conv-transpose
(rounding bf16 acc -> y treated as identity, the standard AD convention).
Training therefore shares the MXU win (the reference leaves both directions
to cuDNN, utils_unet.py:221).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Test hook: force interpret-mode execution (and model-path eligibility)
# off-TPU, so the conv_impl='pair' wiring is covered on the CPU suite.
INTERPRET = False


def pair_conv_supported(x_shape, kh: int, kw: int, strides, padding,
                        use_bias: bool, ht: int = 8) -> bool:
    n, h, w, c = x_shape
    return (
        (kh, kw) == (3, 3)
        and tuple(strides) == (1, 1)
        # VALID rides the SAME kernel + interior crop (conv3x3_pair_valid)
        and padding in ("SAME", "VALID")
        and not use_bias
        and w % 2 == 0
        and h % 2 == 0  # row tile adapts down from `ht` to any even divisor
        # pair-view lane width 2C must be a whole number of 128-lane words:
        # Mosaic's HBM memref_slice (the halo DMA) requires slices 128-aligned
        # along lanes ('Slice shape along dimension 3 must be aligned to
        # tiling (128)', measured on v5e). The C=1 stem therefore stays on
        # XLA — padding it to 64 channels would run the pair GEMM at ~1%
        # useful MXU occupancy, worse than any XLA stem lowering.
        and c % 64 == 0
        # and the pair-view sublane width W/2 a whole number of 8-sublane
        # words, same memref_slice tiling rule one axis up ('slice 1x8x20x128
        # of 1x48x24x128' rejected, measured on v5e). All canonical model
        # resolutions are % 16 wide (576, 256); tiny odd test shapes fall
        # back to XLA.
        and (w // 2) % 8 == 0
    )


def _pick_row_tile(h: int, ht_max: int) -> int:
    """Largest row-tile <= ht_max dividing h. The canonical autopadded
    resolutions are all % 8; shallow/tiny configs (e.g. depth-2 test models)
    can leave H % 8 != 0 and simply take a shorter tile."""
    for d in range(min(ht_max, h), 0, -1):
        if h % d == 0:
            return d
    return 1


def _pack_weights(kernel: jax.Array, dtype) -> jax.Array:
    """flax (3, 3, C, F) -> (2, 3, 2C, 2F) stacked [Wu, Wv] pair-GEMM blocks."""
    k = kernel.astype(dtype)
    _, _, c, f = k.shape
    z = jnp.zeros((3, c, f), dtype)
    # rows: s (position within the half-shifted pair), cols: q (output parity)
    wu = jnp.concatenate(
        [
            jnp.concatenate([k[:, 0], z], axis=2),        # u_low  = col 2j-1
            jnp.concatenate([k[:, 1], k[:, 0]], axis=2),  # u_high = col 2j
        ],
        axis=1,
    )
    wv = jnp.concatenate(
        [
            jnp.concatenate([k[:, 2], k[:, 1]], axis=2),  # v_low  = col 2j+1
            jnp.concatenate([z, k[:, 2]], axis=2),        # v_high = col 2j+2
        ],
        axis=1,
    )
    return jnp.stack([wu, wv])


def _half_shifted_views(A, C: int):
    """Build the two half-shifted pair views u, v from the pair-view tile
    A (rows, Wp, 2C) WITHOUT any vector reshape (Mosaic rejects the
    (W, C) <-> (W/2, 2C) shape cast: 'infer-vector-layout: unsupported
    shape cast', measured on v5e). In the flattened per-row lane stream
    p = w*C + c, u = stream shifted by -C and v by +C, which decomposes
    into ONE intra-word half-swap (a lane roll by C — by construction
    self-inverse) plus a word shift along Wp for the half that crossed a
    word boundary, blended by a lane select:

        r    = roll(A, C, lanes)        # word j -> (hi_j, lo_j)
        u[j] = (hi_{j-1}, lo_j)   = where(lane < C, r[j-1], r[j])
        v[j] = (hi_j, lo_{j+1})   = where(lane < C, r[j], r[j+1])

    The zero fill of the word shifts IS the SAME-padding halo at the canvas
    edges (x[-1] = x[W] = 0).

    The lane roll is spelled as a static slice+concat, NOT pltpu.roll:
    this chip's Mosaic lowers roll to tpu.dynamic_rotate even for a static
    amount, and dynamic_rotate is unimplemented for non-32-bit data
    ('Rotate with non-32-bit data', the bf16 hot path — measured on v5e,
    round 5); the sliced concat compiles and matches exactly."""
    r = jnp.concatenate([A[..., C:], A[..., :C]], axis=-1)
    z = jnp.zeros_like(r[:, :1])
    rdn = jnp.concatenate([z, r[:, :-1]], axis=1)  # r[j-1]
    rup = jnp.concatenate([r[:, 1:], z], axis=1)   # r[j+1]
    lane = lax.broadcasted_iota(jnp.int32, r.shape, 2)
    u = jnp.where(lane < C, rdn, r)  # input cols (2j-1, 2j)
    v = jnp.where(lane < C, r, rup)  # input cols (2j+1, 2j+2)
    return u, v


def _issue_tile_dma(x_ref, xt, sems, n, ht, slot, *, Ht, nt, wait: bool):
    """Start (or wait for) the up-to-3 copies filling halo slot `slot` with
    tile (n, ht): Ht body rows into xt[slot, 1:Ht+1], plus one halo row on
    each non-edge side. make_async_copy is descriptor-based: rebuilding the
    same copy and calling .wait() waits on its semaphore."""
    row0 = ht * Ht
    body = pltpu.make_async_copy(
        x_ref.at[n, pl.ds(row0, Ht)], xt.at[slot, pl.ds(1, Ht)],
        sems.at[slot, 0])
    body.wait() if wait else body.start()

    @pl.when(ht > 0)
    def _():
        top = pltpu.make_async_copy(
            x_ref.at[n, pl.ds(row0 - 1, 1)], xt.at[slot, pl.ds(0, 1)],
            sems.at[slot, 1])
        top.wait() if wait else top.start()

    @pl.when(ht < nt - 1)
    def _():
        bot = pltpu.make_async_copy(
            x_ref.at[n, pl.ds(row0 + Ht, 1)], xt.at[slot, pl.ds(Ht + 1, 1)],
            sems.at[slot, 2])
        bot.wait() if wait else bot.start()


def _conv_kernel(wp_ref, x_ref, out_ref, s1_ref, s2_ref, xt_ref, sems,
                 *, Ht, Wp, C, F, N, nt, stats, out_dtype):
    n, ht = pl.program_id(0), pl.program_id(1)
    step = n * nt + ht
    slot = lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        _issue_tile_dma(x_ref, xt_ref, sems, n, ht, slot, Ht=Ht, nt=nt,
                        wait=False)

    # issue next tile's copies into the other slot before computing this one
    @pl.when(step + 1 < N * nt)
    def _():
        last = ht == nt - 1
        n2 = jnp.where(last, n + 1, n)
        ht2 = jnp.where(last, 0, ht + 1)
        _issue_tile_dma(x_ref, xt_ref, sems, n2, ht2, 1 - slot, Ht=Ht, nt=nt,
                        wait=False)

    _issue_tile_dma(x_ref, xt_ref, sems, n, ht, slot, Ht=Ht, nt=nt, wait=True)

    # canvas edges: zero halo rows (SAME padding); no copy was issued there
    @pl.when(ht == 0)
    def _():
        xt_ref[slot, 0:1] = jnp.zeros_like(xt_ref[slot, 0:1])

    @pl.when(ht == nt - 1)
    def _():
        xt_ref[slot, Ht + 1 : Ht + 2] = jnp.zeros_like(
            xt_ref[slot, Ht + 1 : Ht + 2])

    u, v = _half_shifted_views(xt_ref[slot], C)  # each (Ht+2, Wp, 2C)
    m = Ht * Wp
    acc = jnp.zeros((m, 2 * F), jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    for dy in range(3):
        acc += lax.dot_general(u[dy : dy + Ht].reshape(m, 2 * C), wp_ref[0, dy],
                               dn, preferred_element_type=jnp.float32)
        acc += lax.dot_general(v[dy : dy + Ht].reshape(m, 2 * C), wp_ref[1, dy],
                               dn, preferred_element_type=jnp.float32)
    if stats:
        # pair-view (2F,) sums; the caller folds the two F-halves in XLA
        # (splitting to (2, F) here is another unsupported vector reshape)
        s1_ref[0, 0] = jnp.sum(acc, axis=0).reshape(1, 2 * F)
        s2_ref[0, 0] = jnp.sum(acc * acc, axis=0).reshape(1, 2 * F)
    out_ref[0] = acc.astype(out_dtype).reshape(Ht, Wp, 2 * F)


def conv3x3_pair(x, kernel, *, stats: bool = False, ht: int = 8,
                 interpret=None):
    """y = conv3x3_same(x, kernel) (NHWC, no bias), optionally with the f32
    per-channel moment sums over (H, W): returns y or (y, s1, s2) with
    s1, s2 of shape (N, C_out) — exactly the reductions group_norm_coeffs
    feeds on (models/unet.py), computed here from the pre-rounding f32
    accumulator. Differentiable (custom VJP, module docstring)."""
    if interpret is None:
        interpret = INTERPRET
    return _pair_vjp(x, kernel, stats, ht, bool(interpret))


def conv3x3_pair_valid(x, kernel, *, ht: int = 8, interpret=None):
    """VALID 3x3 conv via the SAME pair kernel: the interior of the SAME
    output IS the VALID output (the zero-padded halo taps only reach the
    border ring). Costs one extra output row/column pair of compute; no
    moment side outputs (they would sum the border ring the VALID conv
    never produces — GroupNorm reductions fuse in XLA downstream instead).
    Differentiable: the slice is AD-transparent over conv3x3_pair's VJP."""
    y = conv3x3_pair(x, kernel, stats=False, ht=ht, interpret=interpret)
    return y[:, 1:-1, 1:-1, :]


def _conv3x3_pair_impl(x, kernel, stats: bool, ht: int, interpret: bool):
    n, h, w, c = x.shape
    kh, kw, kc, f = kernel.shape
    if (kh, kw) != (3, 3) or kc != c:
        raise ValueError(f"conv3x3_pair: kernel {kernel.shape} vs input C={c}")
    if w % 2:
        raise ValueError("conv3x3_pair needs even W")
    if interpret:
        # Interpret mode (CPU suite) keeps the zero-pad path so tiny test
        # channels exercise the padded-contraction algebra: pad C to a
        # sublane multiple; padded columns multiply zero weights.
        cpad = -c % 8
        if cpad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cpad)))
            kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, cpad), (0, 0)))
            c += cpad
    elif c % 64 or (w // 2) % 8:
        # Compiled (Mosaic) constraint: the pair view (N, H, W/2, 2C) is
        # sliced by the halo DMA, and Mosaic requires memref slices aligned
        # to the (8, 128) tiling on the last two dims — 2C % 128 == 0
        # ('Slice shape along dimension 3 must be aligned to tiling (128)',
        # v5e, BENCH_r04 root cause) and W/2 % 8 == 0 ('slice 1x8x20x128 of
        # 1x48x24x128' rejected, v5e round 5). Fail loudly at trace time
        # instead of an opaque tpu_compile_helper HTTP 500 at compile time.
        raise ValueError(
            f"conv3x3_pair compiled path needs C % 64 == 0 and "
            f"(W/2) % 8 == 0 (got C={c}, W={w}): the pair-view halo DMA "
            "requires (8,128)-tiling-aligned HBM slices. Use the XLA conv "
            "for this site (pair_conv_supported gates it).")
    ht = _pick_row_tile(h, ht)
    nt = h // ht
    wp = _pack_weights(kernel, x.dtype)
    wpair = w // 2
    # Pair-view fold OUTSIDE the kernel: in row-major NHWC this reshape is a
    # pure HBM bitcast ((w, c) and (w//2, 2c) index the same linear bytes),
    # so the kernel's DMA loads land already pair-folded and no in-VMEM
    # vector shape cast is needed (Mosaic rejects that cast; see
    # _half_shifted_views).
    x_pv = x.reshape(n, h, wpair, 2 * c)

    kfn = functools.partial(_conv_kernel, Ht=ht, Wp=wpair, C=c, F=f, N=n,
                            nt=nt, stats=stats, out_dtype=x.dtype)
    out_shape = [
        jax.ShapeDtypeStruct((n, h, wpair, 2 * f), x.dtype),
        jax.ShapeDtypeStruct((n, nt, 1, 2 * f), jnp.float32),
        jax.ShapeDtypeStruct((n, nt, 1, 2 * f), jnp.float32),
    ]
    y, s1, s2 = pl.pallas_call(
        kfn,
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed weights, whole
            pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, ht, wpair, 2 * f), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 2 * f), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 2 * f), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, ht + 2, wpair, 2 * c), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(wp, x_pv)
    y = y.reshape(n, h, w, f)  # unfold the pair view (HBM bitcast again)
    if not stats:
        return y
    s1 = jnp.sum(s1[:, :, 0], axis=1)  # (n, 2f) pair-view sums
    s2 = jnp.sum(s2[:, :, 0], axis=1)
    return y, s1[:, :f] + s1[:, f:], s2[:, :f] + s2[:, f:]


def _xla_conv3x3_same(x, kernel):
    return lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _rot_transpose(kernel):
    """The dx kernel: K'[a, b, f, c] = K[2-a, 2-b, c, f] — a 3x3 SAME conv of
    the output cotangent with K' is exactly the input gradient of a 3x3 SAME
    conv with K."""
    return jnp.transpose(kernel[::-1, ::-1], (0, 1, 3, 2))


def _dkernel(x, g):
    """dK[di, dj, c, f] = sum_{n,h,w} x_pad[n, h+di-1, w+dj-1, c] * g[n,h,w,f]
    as one XLA conv: batch <- C, contraction <- (N, H, W)."""
    dk = lax.conv_general_dilated(
        jnp.transpose(x, (3, 1, 2, 0)),   # (C, H, W, N)
        jnp.transpose(g, (1, 2, 0, 3)),   # (H, W, N, F) as HWIO
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )  # (C, 3, 3, F)
    return jnp.transpose(dk, (1, 2, 0, 3))


def _dx_conv(g, kernel, ht: int, interpret: bool):
    """Input gradient, routed through the pair kernel when the cotangent's
    shape is eligible (it is, for every site the forward was)."""
    kt = _rot_transpose(kernel).astype(g.dtype)
    n, h, w, f = g.shape
    # Output-lane gate (kt.shape[-1], the dx channel count): a narrow dx
    # (e.g. the C=1 stem's input gradient, normally dead code) would fill
    # only 2 of 128 output lanes — leave it to XLA. Input-lane gate (f, the
    # cotangent channels) and sublane gate (W/2): compiled Mosaic needs
    # 2f % 128 == 0 and (W/2) % 8 == 0 for the halo DMA, same constraints
    # as the forward.
    cmin = 8 if interpret else 64
    w_ok = w % 2 == 0 if interpret else (w // 2) % 8 == 0
    if w_ok and h % 2 == 0 and 2 * kt.shape[-1] <= 128 \
            and kt.shape[-1] % 8 == 0 and f % cmin == 0:
        return _conv3x3_pair_impl(g, kt, stats=False, ht=ht,
                                  interpret=interpret)
    return _xla_conv3x3_same(g, kt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _pair_vjp(x, kernel, stats, ht, interpret):
    return _conv3x3_pair_impl(x, kernel, stats, ht, interpret)


def _pair_vjp_fwd(x, kernel, stats, ht, interpret):
    out = _conv3x3_pair_impl(x, kernel, stats, ht, interpret)
    y = out[0] if stats else out
    return out, (x, kernel, y if stats else None)


def _pair_vjp_bwd(stats, ht, interpret, res, cot):
    x, kernel, y = res
    if stats:
        dy, ds1, ds2 = cot
        # s1 = sum_{h,w} y, s2 = sum_{h,w} y^2 (f32 accumulator; bf16
        # rounding of y treated as identity): fold into the output cotangent
        g = (dy.astype(jnp.float32)
             + ds1[:, None, None, :]
             + 2.0 * y.astype(jnp.float32) * ds2[:, None, None, :])
        g = g.astype(dy.dtype)
    else:
        g = cot
    dx = _dx_conv(g, kernel, ht, interpret).astype(x.dtype)
    dk = _dkernel(x, g).astype(kernel.dtype)
    return dx, dk


_pair_vjp.defvjp(_pair_vjp_fwd, _pair_vjp_bwd)
