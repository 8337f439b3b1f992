"""Device mesh + sharding: the distributed-communication component.

The reference has no explicit distributed layer — PL would spin up
DDP/NCCL for --gpus N (SURVEY.md §2.8), but every documented run is
single-GPU. The TPU-native equivalent is first-class here:

- a `jax.sharding.Mesh` over ICI (single host) or DCN (multi-host via
  jax.distributed.initialize), with axes ('data', 'model');
- data parallelism: batches and MC-ensemble key fans shard over 'data';
  params replicate; XLA emits the psum gradient all-reduce under jit — no
  hand-rolled backend;
- the 'model' axis is reserved for tensor-parallel sharding; at 31M params
  the model comfortably fits one chip, so it stays size 1 in practice but
  every entry point accepts a mesh so the layout generalizes.

Tested against a virtual 8-device CPU mesh (tests/test_mesh.py) and
exercised by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None, model: int = 1, devices=None
) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all local devices on the
    data axis."""
    if devices is None:
        devices = jax.devices()
    if data is None:
        data = len(devices) // model
    n = data * model
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch / ensemble) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_ensemble_keys(mesh: Mesh, keys: jax.Array) -> jax.Array:
    """Place an (N, ...) ensemble-input fan (PRNG keys, angles) so members
    split across the data axis; each chip computes its slice of the vmapped
    chunk and the streaming statistics combine with XLA collectives."""
    return jax.device_put(keys, data_sharding(mesh))


def multihost_initialize(**kwargs) -> None:
    """Multi-host (DCN) entry: thin wrapper over jax.distributed.initialize
    so CLIs can opt in with a flag."""
    jax.distributed.initialize(**kwargs)
