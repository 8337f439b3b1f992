"""Host->device batch feeding.

The reference leans on torch DataLoader worker processes
(base_model_tests/training.py:166-169, num_workers=os.cpu_count()); on TPU
the equivalent is an async dispatch pipeline: batches are device_put while
the previous step executes (JAX dispatch is asynchronous), with an explicit
one-batch lookahead prefetcher.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import numpy as np

from unet_research_tpu.data.dataset import ArrayDataset


def batch_iterator(
    ds: ArrayDataset,
    batch_size: int,
    shuffle: bool,
    rng: Optional[np.random.Generator] = None,
    drop_last: bool = False,
    device=None,
    prefetch: int = 1,
) -> Iterator[tuple]:
    """Yield (image, target, mask) float32 device batches.

    shuffle=True reshuffles per call (per epoch), like DataLoader
    shuffle=True; shuffle=False preserves order so batch_idx can index the
    MF size plans (reference MF-training-UNI.py:227 uses shuffle=False for
    exactly that reason).
    """
    n = len(ds)
    order = np.arange(n)
    if shuffle:
        if rng is None:
            rng = np.random.default_rng()
        rng.shuffle(order)
    ends = range(batch_size, n + 1, batch_size) if drop_last else range(batch_size, n + batch_size, batch_size)
    starts_ends = [(e - batch_size, min(e, n)) for e in ends if e - batch_size < n]

    def make(bi):
        s, e = starts_ends[bi]
        idx = order[s:e]
        im, gt, mask = ds[idx]
        if device is not None:
            return jax.device_put((im, gt, mask), device)
        return jax.device_put((im, gt, mask))

    # simple lookahead prefetch: keep `prefetch` extra batches dispatched
    from collections import deque

    pending: deque = deque()
    next_to_make = 0
    while next_to_make < min(prefetch + 1, len(starts_ends)):
        pending.append(make(next_to_make))
        next_to_make += 1
    while pending:
        out = pending.popleft()
        if next_to_make < len(starts_ends):
            pending.append(make(next_to_make))
            next_to_make += 1
        yield out


def shard_batch(batch, sharding):
    """Place a host batch with a NamedSharding (data-parallel feeding)."""
    return jax.device_put(batch, sharding)
