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
