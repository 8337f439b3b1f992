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

Two mask pipelines ship (the `mask_impl` knob / UNET_DB_IMPL env var):

- ``elementwise`` (default): murmur-style hash per element + separable
  reduce_window expansion, fully inside XLA. Fastest measured end-to-end
  (104.0 MC passes/s on v5e) because XLA fuses the producer chain into the
  neighboring conv/GroupNorm epilogues.
- ``kernel``: the Pallas mask PRODUCER (ops/pallas/dropblock_kernel.py) —
  hardware PRNG + in-VMEM bit-plane expansion emitting the dense s8 mask
  plus popcount keep counts in one pass; the mask*x apply stays plain XLA.
  Measures 103.4 passes/s: the kernel wins its own slot ~2x but the
  custom-call boundary degrades neighboring XLA fusions by the same amount
  (PERF.md round-3 ladder). Kept as the one alternative pipeline.

Two earlier pipelines (a pure-XLA bit-plane word pipeline and a fused
GroupNorm+DropBlock+ReLU apply-position kernel) measured slower end-to-end
and were retired in round 3; PERF.md records their ladders and the lessons
(git history has the code).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

# Mask pipeline selector: 'elementwise' (XLA hash+maxpool) or 'kernel'
# (Pallas mask producer). Read once at import: flipping the env var after the
# first jit compile could never take effect anyway (the toggle is
# trace-time). Callers can also pass `mask_impl=` explicitly (e.g. from
# DropBlockConfig).
IMPL_DEFAULT = os.environ.get("UNET_DB_IMPL") or None


def _resolve_impl(mask_impl) -> str:
    impl = mask_impl or IMPL_DEFAULT or "elementwise"
    if impl not in ("elementwise", "kernel", "fused"):
        raise ValueError(f"unknown dropblock mask_impl {impl!r}")
    return impl


def _kernel_ok(block_size: int) -> bool:
    # delegate the shape gate to the kernel (odd 1 < b <= 2*STRIP+1 = 17) so
    # oversized block sizes fall back to the elementwise pipeline instead of
    # raising from inside the kernel
    from unet_research_tpu.ops.pallas.dropblock_kernel import (
        pallas_dropblock_supported,
    )

    if not pallas_dropblock_supported(block_size):
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
    mask_impl: str | None = None,
    rescale: str = "apply",
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

    rescale: 'apply' multiplies the numel/sum scale in (whole-tensor count,
    the literal reference op); 'defer' returns (x*mask, scale) with a
    PER-SAMPLE (N,) scale — the reference's batch-1 serial semantics for a
    batched MC chunk — so the caller can fold it in where it matters;
    'skip' omits the count entirely (the model-level algebra: any positive
    per-sample scalar is annihilated by the next GroupNorm, see
    models/unet.py fold_rescale).
    """
    impl = _resolve_impl(mask_impl)
    if impl == "fused":
        # 'fused' is a MODEL-level pipeline (the Pallas epilogue kernel needs
        # the site's GroupNorm/activation context — models/unet.py
        # _fused_site); at the bare-op level it degrades to the mask producer
        impl = "kernel"
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
        if rescale == "skip":
            return x * dense.astype(x.dtype)
        if rescale == "defer":
            scale = float(h * w * c) / keep  # (N,) per-sample
            return x * dense.astype(x.dtype), scale
        scale = float(n * h * w * c) / jnp.sum(keep)
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
    if rescale == "skip":
        return x * block_mask.astype(x.dtype)
    # (An optimization_barrier here to make the keep-count read the written
    # mask instead of re-deriving it measured SLOWER end-to-end — 101.4 vs
    # 104.0 passes/s — XLA's duplicated producer chains fuse better than the
    # forced materialize+reread. Leave the graph unconstrained.)
    # data-dependent rescale accumulated in f32 (bf16 sums of ~1e6 elements
    # would corrupt the scale)
    if rescale == "defer":
        keep = jnp.sum(block_mask.astype(jnp.float32), axis=(1, 2, 3))  # (N,)
        return x * block_mask.astype(x.dtype), float(h * w * c) / keep
    scale = block_mask.size / jnp.sum(block_mask.astype(jnp.float32))
    return x * block_mask.astype(x.dtype) * scale.astype(x.dtype)


def dropblock_independent(
    x: jax.Array,
    key: jax.Array,
    drop_prob,
    block_size: int,
    fast_rng: bool = True,
    mask_impl: str | None = None,
    rescale: str = "apply",
) -> jax.Array:
    """Dropblock2d_ichan-equivalent (reference utils_modules.py:107-139), NHWC.

    Bernoulli over the full grid with the b//2 border frame zeroed, stride-1
    max-pool block expansion, and a guarded 1/mean rescale (identity when
    everything was dropped). Requires odd block_size — the reference's
    reshape-based per-channel pooling implicitly does too.

    rescale: 'apply' | 'defer' (returns (x*mask, per-sample scale)) | 'skip'
    — see dropblock_dependent.
    """
    if block_size % 2 == 0:
        raise ValueError("dropblock_independent requires an odd block_size")
    impl = _resolve_impl(mask_impl)
    if impl == "fused":
        impl = "kernel"  # see dropblock_dependent
    n, h, w, c = x.shape
    b = block_size
    gamma = dropblock_gamma_independent(h, w, b, drop_prob)
    if impl == "kernel" and _kernel_ok(b):
        # guarded 1/mean rescale over the whole batch (utils_modules.py:133-138)
        from unet_research_tpu.ops.pallas.dropblock_kernel import dropblock_pallas_mask

        dense, keep = dropblock_pallas_mask(x.shape, key, gamma, b)
        if rescale == "skip":
            return x * dense.astype(x.dtype)
        if rescale == "defer":
            keep_frac = keep / float(h * w * c)  # (N,)
            return x * dense.astype(x.dtype), jnp.where(keep_frac != 0, 1.0 / keep_frac, 1.0)
        keep_frac = jnp.sum(keep) / float(n * h * w * c)
        scale = jnp.where(keep_frac != 0, 1.0 / keep_frac, 1.0)
        return x * dense.astype(x.dtype) * scale.astype(x.dtype)
    seeds = _bernoulli(key, gamma, x.shape, fast_rng).astype(jnp.int8)
    ex = b // 2
    if ex > 0:
        border = jnp.zeros((h, w), dtype=jnp.int8)
        border = border.at[ex : h - ex, ex : w - ex].set(1)
        seeds = seeds * border[None, :, :, None]
    block = _block_expand_max(seeds, b)
    keep = jnp.int8(1) - block
    if rescale == "skip":
        return x * keep.astype(x.dtype)
    if rescale == "defer":
        keep_frac = jnp.mean(keep.astype(jnp.float32), axis=(1, 2, 3))  # (N,)
        return x * keep.astype(x.dtype), jnp.where(keep_frac != 0, 1.0 / keep_frac, 1.0)
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
