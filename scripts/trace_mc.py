"""Capture a jax.profiler trace of one MC-ensemble dispatch (32 members,
2 chunks of 16) under the env-selected pipelines, then summarize it with
scripts/analyze_trace.py.

Usage:
    UNET_CONV_IMPL=pair UNET_DB_IMPL=fused python scripts/trace_mc.py [OUTDIR]

Defaults follow bench.py's UNET_CONV_IMPL / UNET_DB_IMPL env overrides so a
trace can be taken of any ladder rung. The dispatch uses the bench
methodology (2 warmups, fresh salted key for the traced call, host-scalar
sync) so the traced program is the steady-state one.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from unet_research_tpu.models import DropBlockConfig, UNet, UNetConfig, canonical_config
from unet_research_tpu.uncertainty import MCDropBlockEngine


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_mc"
    conv_impl = os.environ.get("UNET_CONV_IMPL", "xla")
    mask_impl = os.environ.get("UNET_DB_IMPL", "elementwise")
    h, w = (int(v) for v in os.environ.get("BENCH_HW", "584x565").split("x"))
    members = int(os.environ.get("TRACE_MEMBERS", 32))
    chunk = int(os.environ.get("BENCH_CHUNK", 16))
    resize = int(os.environ.get("BENCH_RESIZE", 0))

    cfg = canonical_config(dtype=jnp.bfloat16)
    cfg = UNetConfig(**{
        **cfg.__dict__,
        "dropblock": DropBlockConfig(kind="dependent", block_size=7,
                                     drop_prob=0.15, use_scheduler=False,
                                     mask_impl=mask_impl),
        "conv_impl": conv_impl,
    })
    model = UNet(cfg)
    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.random((1, h, w, 1), dtype=np.float32))
    gt, mask = jnp.zeros_like(im), jnp.ones_like(im)
    params = model.init(jax.random.PRNGKey(0), im)["params"]
    engine = MCDropBlockEngine(model, num_iterations=members, return_num=0,
                               chunk=chunk, resize=resize if resize else -1)

    def sync(mean, std):
        return float(jnp.sum(mean) + jnp.sum(std))

    for i in range(2):
        mean, std, *_ = engine.predict(params, im, gt, mask,
                                       jax.random.PRNGKey(i), 0.15)
        sync(mean, std)

    salt = time.time_ns() & 0x7FFFFFFF
    with jax.profiler.trace(out):
        mean, std, *_ = engine.predict(params, im, gt, mask,
                                       jax.random.PRNGKey(salt), 0.15)
        sync(mean, std)
    print(f"trace written to {out} (conv={conv_impl}, mask={mask_impl}, "
          f"{members} members)", flush=True)
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__), "analyze_trace.py"),
                    out, str(members)])


if __name__ == "__main__":
    main()
