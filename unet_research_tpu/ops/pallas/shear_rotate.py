"""Rotation as three shears — the TTA warp without gathers.

The rotational-uncertainty loop (reference
uncertainty_tests/Rotational_Uncertainty.py:51-59) warps every member twice:
rotate the input by +angle, un-rotate the segmentation by -angle. The exact
torchvision-parity warp (ops/image.py rotate_bilinear) is a 4-tap gather;
XLA lowers C=1 gathers to near-scalar TPU code (~12 ms per warp at DRIVE
resolution — 4x the cost of the 31M-param forward pass it surrounds).

This module replaces the gather with the classic Paeth decomposition:

    R(theta) = R(q * 90deg) . R(phi),   phi in [-45, 45]

- the 90-degree part is an exact index permutation (jnp.rot90 under
  lax.switch on a square canvas);
- R(phi) factors into three 1-D shears (x, y, x). Each shear resamples
  every line by a per-line CONSTANT fractional shift — on TPU that is two
  whole-tile lane-rotates + a per-sublane select + one blend, no gather
  anywhere (`_row_resample_kernel`). The y-shear runs the same kernel on
  the XLA-transposed canvas.

Inverse-map composition (out[p] = in[u(p)], u = R(-phi) p + e):

    pass1: r1[y, x] = in[y, x + A1(y)],  A1(y) = r*(y - y_ref)
    pass2: r2[y, x] = r1[y + B(x), x],   B(x)  = q*x + s
    pass3: out[y, x] = r2[y, x + A2(y)], A2(y) = r*y + t2

with r = -tan(phi/2), q = sin(phi). Matching u fixes two of the three
offsets; the remaining degree of freedom pins A1(y_ref) = 0 at the content
center row, which keeps every intermediate image centered on the canvas
(naive offset placement shears the content off-canvas at |phi| -> 45deg).

The canvas is square with margin: content within radius rho of the center
excursions to at most x +/- tan(22.5deg)*y during the middle state, so
S >= (1 + tan(pi/8)) * max(H, W) keeps everything on-canvas.

Numerics: three 1-D linear interpolations are NOT bit-equal to one 2-D
bilinear sample — this is a deliberate engine-level trade (mean abs
difference ~1e-3 on smooth images, tests/test_shear_rotate.py) in exchange
for removing the dominant cost of the rotational ensemble. Dataset
augmentation and the torch-parity goldens keep the exact gather warp.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8  # sublane strip: shifts within a strip spread by < |slope| * 8


def canvas_size(h: int, w: int) -> int:
    """Square canvas that contains every intermediate shear state.

    128-aligned: the canvas is the kernel's lane axis, and Mosaic's dynamic
    lane rotate (pltpu.roll) requires a tile-aligned shape ('unsupported
    unaligned shape' otherwise). 128 | S also keeps S even + strip-aligned."""
    s = int(math.ceil((1.0 + math.tan(math.pi / 8)) * max(h, w))) + 2
    return s + (-s) % 128


def _shift_tables(delta, n_rows: int):
    """delta: (K, S) per-line fractional shifts -> (k, f, kmin) tables:
    integer taps (K, S) int32, fractions (K, S) f32, and the per-8-line
    strip minimum (K, S//8) int32 used as the kernel's roll base."""
    k = jnp.floor(delta).astype(jnp.int32)
    f = (delta - jnp.floor(delta)).astype(jnp.float32)
    kmin = jnp.min(k.reshape(k.shape[0], -1, n_rows), axis=2)
    return k, f, kmin


def _row_resample_kernel(kmin_ref, k_ref, f_ref, x_ref, out_ref, *, S, spread):
    """out[y, x] = (1-f[y]) * img[y, x + k[y]] + f[y] * img[y, x + k[y] + 1]
    with zeros outside [0, S). Per 8-row strip: `spread`+2 whole-strip
    lane-rotates from the strip's base shift, then a per-sublane select."""
    n = pl.program_id(0)
    si = pl.program_id(1)
    strip = x_ref[0]  # (_ROWS, S)
    k0 = kmin_ref[n, si]
    kv = k_ref[0]  # (_ROWS, 1) int32
    fv = f_ref[0]  # (_ROWS, 1) f32
    lane = lax.broadcasted_iota(jnp.int32, (_ROWS, S), 1)

    def tap(j):
        # candidate plane shifted by k0 + j: out_lane i reads lane i + k0 + j
        return pltpu.roll(strip, -(k0 + j), axis=1)

    cands = [tap(j) for j in range(spread + 2)]
    rel = kv - k0  # (_ROWS, 1) in [0, spread]
    t1 = cands[0]
    t2 = cands[1]
    for j in range(1, spread + 1):
        sel = rel == j
        t1 = jnp.where(sel, cands[j], t1)
        t2 = jnp.where(sel, cands[j + 1], t2)
    src1 = lane + kv  # true (unwrapped) source index per element
    zero = jnp.zeros((), strip.dtype)
    t1 = jnp.where((src1 >= 0) & (src1 < S), t1, zero)
    t2 = jnp.where((src1 + 1 >= 0) & (src1 + 1 < S), t2, zero)
    fv = fv.astype(strip.dtype)
    out_ref[0] = t1 * (1 - fv) + t2 * fv


def _row_resample(img, k, f, kmin, *, spread: int, interpret: bool):
    """img: (K, S, S); k/f: (K, S); kmin: (K, S // _ROWS)."""
    K, S, _ = img.shape
    n_strips = S // _ROWS
    kernel = functools.partial(_row_resample_kernel, S=S, spread=spread)
    return pl.pallas_call(
        kernel,
        grid=(K, n_strips),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _ROWS, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ROWS, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ROWS, S), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _ROWS, S), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(img.shape, img.dtype),
        interpret=interpret,
    )(kmin, k.reshape(K, S, 1), f.reshape(K, S, 1), img)


def _pass_params(phi, cy, e_y, e_x):
    """Per-member scalars -> the three per-line shift functions' (slope,
    offset) pairs; see module docstring for the derivation."""
    r = -jnp.tan(phi / 2)
    q = jnp.sin(phi)
    t1 = -r * cy  # pins A1(cy) = 0: intermediates stay centered
    t2 = e_x - r * e_y - t1
    s = e_y - q * t2
    return r, q, t1, t2, s


@functools.partial(jax.jit, static_argnames=("interpret",))
def rotate_fan(img, angles_deg, *, interpret: bool = False):
    """Rotate one NHWC image by a fan of angles: (1, H, W, 1), (K,) ->
    (K, H, W, 1), each member matching torchvision rotate semantics
    (CCW about ((W-1)/2, (H-1)/2), zero fill) up to shear-vs-bilinear
    interpolation differences.

    Also accepts an already-batched (K, H, W, 1) input (per-member images —
    the inverse warp of a segmentation fan uses this with -angles).
    """
    n, h, w, c = img.shape
    if c != 1:
        raise ValueError("rotate_fan expects single-channel NHWC")
    K = angles_deg.shape[0]
    if n not in (1, K):
        raise ValueError("img batch must be 1 or len(angles)")
    S = canvas_size(h, w)
    py, px = (S - h) // 2, (S - w) // 2

    canvas = jnp.zeros((K, S, S), img.dtype)
    content = jnp.broadcast_to(img[:, :, :, 0], (K, h, w))
    canvas = lax.dynamic_update_slice(canvas, content, (0, py, px))

    theta = jnp.deg2rad(angles_deg.astype(jnp.float32))
    # nearest multiple of 90deg and the +/-45deg residual
    qi = jnp.round(theta / (jnp.pi / 2)).astype(jnp.int32)
    phi = theta - qi.astype(jnp.float32) * (jnp.pi / 2)
    qm = ((qi % 4) + 4) % 4

    # the 90-degree part: exact permutation about the canvas center,
    # per member (angles differ) via switch-under-vmap. Rotating the image
    # CCW by q*90 in y-down pixel coords is jnp.rot90(..., k=q) on the
    # array (verified against rotate_bilinear in tests/test_shear_rotate.py).
    def member_rot(m, qk):
        return lax.switch(qk, [
            lambda v: v,
            lambda v: jnp.rot90(v, k=1),
            lambda v: jnp.rot90(v, k=2),
            lambda v: jnp.rot90(v, k=3),
        ], m)

    canvas = jax.vmap(member_rot)(canvas, qm)

    # stage-2 affine: u(p) = R(-phi) p + e in raw canvas coords, where
    # e = c2 - R(-phi) cL,  c2 = cc + R(q90)(cL - cc)
    cc = (S - 1) / 2.0
    cLy = py + (h - 1) / 2.0
    cLx = px + (w - 1) / 2.0
    dy, dx = cLy - cc, cLx - cc
    cosq = jnp.cos(qm.astype(jnp.float32) * (jnp.pi / 2))
    sinq = jnp.sin(qm.astype(jnp.float32) * (jnp.pi / 2))
    # forward rotation of the offset vector (x right, y down, CCW angle):
    # x' = cos*x + sin*y ; y' = -sin*x + cos*y   (y-down flips the signs)
    c2x = cc + cosq * dx + sinq * dy
    c2y = cc - sinq * dx + cosq * dy
    cosp = jnp.cos(phi)
    sinp = jnp.sin(phi)
    # inverse map linear part (y-down coords, matching ops/image.py:124-125):
    # u_x = cos*x - sin*y ; u_y = sin*x + cos*y  (centered)
    e_x = c2x - (cosp * cLx - sinp * cLy)
    e_y = c2y - (sinp * cLx + cosp * cLy)

    r, q, t1, t2, s = _pass_params(phi, cLy, e_y, e_x)

    rows = jnp.arange(S, dtype=jnp.float32)
    # pass 1: x-resample by A1(y) = r*y + t1
    d1 = r[:, None] * rows[None, :] + t1[:, None]
    k1, f1, m1 = _shift_tables(d1, _ROWS)
    out = _row_resample(canvas, k1, f1, m1, spread=4, interpret=interpret)
    # pass 2: y-resample by B(x) = q*x + s -> x-resample on the transpose
    d2 = q[:, None] * rows[None, :] + s[:, None]
    k2, f2, m2 = _shift_tables(d2, _ROWS)
    out = jnp.swapaxes(out, 1, 2)
    out = _row_resample(out, k2, f2, m2, spread=7, interpret=interpret)
    out = jnp.swapaxes(out, 1, 2)
    # pass 3: x-resample by A2(y) = r*y + t2
    d3 = r[:, None] * rows[None, :] + t2[:, None]
    k3, f3, m3 = _shift_tables(d3, _ROWS)
    out = _row_resample(out, k3, f3, m3, spread=4, interpret=interpret)

    return out[:, py:py + h, px:px + w, None]
