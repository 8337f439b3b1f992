"""Streaming on-device ensemble statistics.

The reference's uncertainty engines materialize every ensemble member
(torch.vstack of 1000 full-res segmentations,
uncertainty_tests/Dropblock_Uncertainty.py:64) and reduce afterwards. On TPU
we instead evaluate members in vmapped chunks and merge running (mean, M2)
with Chan's parallel-variance combine, so HBM holds one chunk of activations
regardless of ensemble size — and the statistics match torch's
mean(0)/std(0) (std unbiased, ddof=1) to float32 accuracy.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _merge(stats, new_stats):
    count, mean, m2 = stats
    new_count, new_mean, new_m2 = new_stats
    tot = count + new_count
    delta = new_mean - mean
    mean = mean + delta * (new_count / tot)
    m2 = m2 + new_m2 + delta * delta * (count * new_count / tot)
    return tot, mean, m2


def _batch_stats(outs):
    n = outs.shape[0]
    mean = jnp.mean(outs, axis=0)
    m2 = jnp.sum((outs - mean) ** 2, axis=0)
    return jnp.asarray(float(n), jnp.float32), mean, m2


def streaming_ensemble(
    sample_fn: Callable,
    xs: jax.Array,
    chunk: int,
    return_num: int = 0,
    chunk_fn: bool = False,
):
    """Evaluate sample_fn over xs[i] (vmapped in chunks of `chunk`) and return
    (mean, std, first_return_num_outputs).

    - sample_fn: x -> array (all outputs same shape; statistics reduce in f32)
    - xs: stacked per-member inputs (PRNG keys, angles, ...), leading axis =
      ensemble size
    - std is unbiased (ddof=1), matching torch .std(0)
    - the first `return_num` members' raw outputs are returned (the
      reference's tensors[0:return_num], Dropblock_Uncertainty.py:69)
    - chunk_fn=True: sample_fn already maps a CHUNK of xs to stacked member
      outputs (used when the member computation is a real device batch
      rather than a vmap — e.g. the shear-warped rotation fan)

    All chunk boundaries are static; call inside jit.
    """
    n = xs.shape[0]
    if n < 2:
        raise ValueError("ensemble needs >= 2 members for std")
    return_num = min(return_num, n)
    vf = sample_fn if chunk_fn else jax.vmap(sample_fn)

    def absorb(stats, outs):
        bstats = _batch_stats(outs)
        return bstats if stats is None else _merge(stats, bstats)

    stats = None
    saved = None
    pos = 0
    if return_num > 0:
        outs = vf(xs[:return_num]).astype(jnp.float32)
        saved = outs
        stats = absorb(stats, outs)
        pos = return_num

    rest = xs[pos:]
    m = rest.shape[0]
    n_full = m // chunk
    start = 0
    if n_full > 0 and stats is None:
        stats = absorb(None, vf(rest[:chunk]).astype(jnp.float32))
        start = 1
    if n_full - start > 0:
        body = rest[start * chunk : n_full * chunk].reshape(
            (n_full - start, chunk) + rest.shape[1:]
        )

        def scan_body(carry, xs_chunk):
            outs = vf(xs_chunk).astype(jnp.float32)
            return _merge(carry, _batch_stats(outs)), None

        stats, _ = jax.lax.scan(scan_body, stats, body)
    if m - n_full * chunk > 0:
        stats = absorb(stats, vf(rest[n_full * chunk :]).astype(jnp.float32))

    count, mean, m2 = stats
    std = jnp.sqrt(m2 / (count - 1.0))
    if saved is None:
        saved = jnp.zeros((0,) + mean.shape, jnp.float32)
    return mean, std, saved


def streaming_ensemble_batched(
    batch_fn,
    key: jax.Array,
    total: int,
    chunk: int,
    return_num: int = 0,
):
    """Like streaming_ensemble, but batch_fn(key, size) produces `size`
    members ITSELF (shape (size, ...)) — used when per-member randomness is
    drawn inside the model from one chunk key (the fused Pallas dropblock
    kernel derives per-sample streams from the batch index, so no vmap over
    keys is needed and the whole chunk is one real batched forward).
    """
    if total < 2:
        raise ValueError("ensemble needs >= 2 members for std")
    return_num = min(return_num, total)

    def absorb(stats, outs):
        bstats = _batch_stats(outs)
        return bstats if stats is None else _merge(stats, bstats)

    stats = None
    saved = None
    consumed = 0
    kidx = 0
    if return_num > 0:
        outs = batch_fn(jax.random.fold_in(key, kidx), return_num).astype(jnp.float32)
        kidx += 1
        saved = outs
        stats = absorb(stats, outs)
        consumed = return_num

    m = total - consumed
    n_full = m // chunk
    start = 0
    if n_full > 0 and stats is None:
        stats = absorb(None, batch_fn(jax.random.fold_in(key, kidx), chunk).astype(jnp.float32))
        kidx += 1
        start = 1
    if n_full - start > 0:
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(kidx, kidx + n_full - start)
        )
        kidx += n_full - start

        def scan_body(carry, k):
            outs = batch_fn(k, chunk).astype(jnp.float32)
            return _merge(carry, _batch_stats(outs)), None

        stats, _ = jax.lax.scan(scan_body, stats, keys)
    rem = m - n_full * chunk
    if rem > 0:
        stats = absorb(stats, batch_fn(jax.random.fold_in(key, kidx), rem).astype(jnp.float32))

    count, mean, m2 = stats
    std = jnp.sqrt(m2 / (count - 1.0))
    if saved is None:
        saved = jnp.zeros((0,) + mean.shape, jnp.float32)
    return mean, std, saved
