"""Multi-host (DCN) path: two REAL processes initialize jax.distributed
through parallel.mesh.multihost_initialize, build one global mesh and run a
cross-process collective — the previously-untested wrapper (SURVEY §2.8;
the reference's analogue is PL's latent DDP, base_model_tests/training.py:217).

Each worker owns one CPU device; the global ('data','model') mesh spans both
processes, a process-sharded array is summed under jit (XLA inserts the
cross-process all-reduce over the gloo CPU collectives backend), and every
process must see the same total.
"""

import pathlib
import socket
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]

_WORKER = r"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from unet_research_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    multihost_initialize,
)

multihost_initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=n, process_id=pid
)
assert jax.process_count() == n, jax.process_count()
assert len(jax.devices()) == n  # global devices across processes

import jax.numpy as jnp
import numpy as np

mesh = make_mesh(data=n, model=1)  # built from the GLOBAL device list
sharding = data_sharding(mesh)
arr = jax.make_array_from_callback(
    (n,), sharding, lambda idx: np.arange(n, dtype=np.float32)[idx]
)
total = jax.jit(jnp.sum)(arr)  # cross-process psum
assert float(total) == float(sum(range(n))), float(total)
print(f"proc {pid} OK total={float(total)}", flush=True)

# --- a REAL data-parallel train step across the processes (VERDICT r4
# weak #5): batch shards over 'data' (one sample per process), params
# replicate, XLA inserts the cross-process gradient psum. The parent
# compares loss + updated-param fingerprint against a mesh-free
# single-process step on the same batch.
from unet_research_tpu.models import DropBlockConfig, UNet, UNetConfig, canonical_config
from unet_research_tpu.train import Trainer, TrainerConfig
from unet_research_tpu.train.policies import POLICIES

base = canonical_config(filters=8)
cfg = UNetConfig(**{**base.__dict__, "group_norm_groups": 4, "model_depth": 2,
                    "dropblock": DropBlockConfig(kind=None), "remat": False})
model = UNet(cfg)
tcfg = TrainerConfig(lr=0.05, auto_lr_find=False, seed=0, verbose=False)
trainer = Trainer(model, POLICIES["none"], tcfg, mesh=mesh)
state = trainer.create_state(trainer.init_params(seed=0))
rng = np.random.default_rng(0)
im = rng.random((n, 32, 32, 1)).astype(np.float32)
gt = (rng.random((n, 32, 32, 1)) > 0.5).astype(np.float32)
mk = np.ones((n, 32, 32, 1), np.float32)


def sharded(a):
    return jax.make_array_from_callback(a.shape, sharding, lambda idx: a[idx])


new_state, loss = trainer._train_step(
    state, sharded(im), sharded(gt), sharded(mk), 0.05,
    jax.random.PRNGKey(0), -1,
)
flat = np.concatenate(
    [np.ravel(jax.device_get(x)) for x in jax.tree_util.tree_leaves(new_state.params)]
)
print(f"proc {pid} STEP loss={float(loss):.8f} fp={np.abs(flat).sum():.6f}",
      flush=True)
"""


def test_two_process_mesh_collective():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    n = 2
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), str(n), str(port)],
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(n)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} OK total=1.0" in out

    # both processes must agree on the DP step's loss and updated params...
    import re

    steps = []
    for pid, out in enumerate(outs):
        m = re.search(rf"proc {pid} STEP loss=([\d.eE+-]+) fp=([\d.eE+-]+)", out)
        assert m, f"proc {pid} printed no STEP line:\n{out[-3000:]}"
        steps.append((float(m.group(1)), float(m.group(2))))
    assert steps[0] == steps[1]

    # ...and match a mesh-free single-process step on the same global batch
    import jax
    import numpy as np

    from unet_research_tpu.models import (
        DropBlockConfig,
        UNet,
        UNetConfig,
        canonical_config,
    )
    from unet_research_tpu.train import Trainer, TrainerConfig
    from unet_research_tpu.train.policies import POLICIES

    base = canonical_config(filters=8)
    cfg = UNetConfig(**{**base.__dict__, "group_norm_groups": 4,
                        "model_depth": 2,
                        "dropblock": DropBlockConfig(kind=None),
                        "remat": False})
    trainer = Trainer(UNet(cfg), POLICIES["none"],
                      TrainerConfig(lr=0.05, auto_lr_find=False, seed=0,
                                    verbose=False))
    state = trainer.create_state(trainer.init_params(seed=0))
    rng = np.random.default_rng(0)
    im = rng.random((n, 32, 32, 1)).astype(np.float32)
    gt = (rng.random((n, 32, 32, 1)) > 0.5).astype(np.float32)
    mk = np.ones((n, 32, 32, 1), np.float32)
    new_state, loss = trainer._train_step(
        state, im, gt, mk, 0.05, jax.random.PRNGKey(0), -1
    )
    flat = np.concatenate(
        [np.ravel(jax.device_get(x))
         for x in jax.tree_util.tree_leaves(new_state.params)]
    )
    assert steps[0][0] == pytest.approx(float(loss), rel=2e-5)
    assert steps[0][1] == pytest.approx(float(np.abs(flat).sum()), rel=2e-5)
