"""Single-process perf ladder: measure the MC-DropBlock headline across
(conv_impl, mask_impl, resize, chunk) rungs in ONE TPU claim.

The axon pool is single-tenant and each python process pays a claim (28 min
during outage recovery, ~1 min healthy); the per-rung-subprocess ladder
(/tmp/ladder_r4.sh style) pays it per rung and each timeout-kill wedges the
pool ~20 min (memory: axon-tpu-tunnel-quirks). This runner claims once and
walks every rung, printing one JSON line per rung and a summary table.

Usage:
    python scripts/ladder.py                 # the full round-4 ladder
    python scripts/ladder.py native          # only native-res rungs
    python scripts/ladder.py r256            # only resize-256 rungs

Workload per rung = bench.py's exactly (fresh salted keys, 2 warmups,
host-scalar sync), 300 iterations.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from unet_research_tpu.models import DropBlockConfig, UNet, UNetConfig, canonical_config
from unet_research_tpu.uncertainty import MCDropBlockEngine

# same shrink knobs as bench.py, for CPU smoke runs of the harness itself
ITERS = int(os.environ.get("BENCH_ITERS", 300))
H, W = (int(v) for v in os.environ.get("BENCH_HW", "584x565").split("x"))
TINY = {
    k: int(os.environ[e])
    for k, e in [("filters", "BENCH_FILTERS"), ("model_depth", "BENCH_DEPTH"),
                 ("group_norm_groups", "BENCH_GROUPS")]
    if os.environ.get(e)
}

# tag, conv_impl, mask_impl, resize (0=native), chunk
RUNGS = [
    ("native/default",        "xla",  "elementwise", 0,   16),
    ("native/default,c32",    "xla",  "elementwise", 0,   32),
    ("native/default,c64",    "xla",  "elementwise", 0,   64),
    ("native/fused",          "xla",  "fused",       0,   16),
    ("native/pair",           "pair", "elementwise", 0,   16),
    ("native/pair+fused",     "pair", "fused",       0,   16),
    ("native/pair+fused,c32", "pair", "fused",       0,   32),
    ("r256/default",          "xla",  "elementwise", 256, 16),
    ("r256/default,c64",      "xla",  "elementwise", 256, 64),
    ("r256/default,c128",     "xla",  "elementwise", 256, 128),
    ("r256/fused,c64",        "xla",  "fused",       256, 64),
    ("r256/pair",             "pair", "elementwise", 256, 16),
    ("r256/pair+fused",       "pair", "fused",       256, 16),
    ("r256/pair+fused,c64",   "pair", "fused",       256, 64),
    # chunk-frontier probe (run via `python scripts/ladder.py chunk256`):
    # the main ladder measured xla/elementwise at r256 non-monotonic in
    # chunk (c16 563.8 < c64 528.7 < c128 649.7 passes/s) — walk the
    # frontier upward until HBM or the curve turns over.
    ("chunk256/c192",         "xla",  "elementwise", 256, 192),
    ("chunk256/c256",         "xla",  "elementwise", 256, 256),
    ("chunk256/c384",         "xla",  "elementwise", 256, 384),
    ("chunk256/c512",         "xla",  "elementwise", 256, 512),
    # 1000-iter finals (run with BENCH_ITERS=1000): c128 pays a 104-member
    # remainder program at 1000 iters; 200/250 divide exactly.
    ("iters1k/c128",          "xla",  "elementwise", 256, 128),
    ("iters1k/c200",          "xla",  "elementwise", 256, 200),
    ("iters1k/c250",          "xla",  "elementwise", 256, 250),
]


def run_rung(tag, conv_impl, mask_impl, resize, chunk, im, gt, mask):
    cfg = canonical_config(dtype=jnp.bfloat16, **TINY)
    cfg = UNetConfig(**{
        **cfg.__dict__,
        "dropblock": DropBlockConfig(
            kind="dependent", block_size=7, drop_prob=0.15,
            use_scheduler=False, mask_impl=mask_impl,
        ),
        "conv_impl": conv_impl,
    })
    model = UNet(cfg)
    params = model.init(jax.random.PRNGKey(0), im)["params"]
    engine = MCDropBlockEngine(
        model, num_iterations=ITERS, return_num=0, chunk=chunk,
        resize=resize if resize else -1,
    )

    def sync(mean, std):
        return float(jnp.sum(mean) + jnp.sum(std))

    t_c0 = time.perf_counter()
    for i in range(2):
        mean, std, *_ = engine.predict(params, im, gt, mask,
                                       jax.random.PRNGKey(i), 0.15)
        sync(mean, std)
    compile_s = time.perf_counter() - t_c0

    salt = time.time_ns() & 0x7FFFFFFF
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        mean, std, *_ = engine.predict(params, im, gt, mask,
                                       jax.random.PRNGKey(salt + i), 0.15)
        sync(mean, std)
        times.append(time.perf_counter() - t0)
    pps = ITERS / min(times)
    print(json.dumps({"rung": tag, "passes_per_sec": round(pps, 1),
                      "compile_s": round(compile_s, 1),
                      "times": [round(t, 3) for t in times]}), flush=True)
    return pps


def main():
    # jax is pre-imported at interpreter startup here and the axon plugin
    # forces its platform; honor JAX_PLATFORMS programmatically (as
    # tests/conftest.py and bench.py do) so CPU smoke runs stay off the TPU.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    sel = sys.argv[1] if len(sys.argv) > 1 else ""
    print(f"ladder: backend={jax.default_backend()} "
          f"devices={len(jax.devices())}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.random((1, H, W, 1), dtype=np.float32))
    gt = jnp.zeros_like(im)
    mask = jnp.ones_like(im)

    results = {}
    for rung in RUNGS:
        if sel and not rung[0].startswith(sel):
            continue
        try:
            results[rung[0]] = run_rung(*rung, im, gt, mask)
        except Exception as e:  # a failed rung must not kill the ladder
            print(json.dumps({"rung": rung[0], "error": repr(e)[:300]}),
                  flush=True)
    print("== ladder summary ==")
    for tag, pps in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{tag:24s} {pps:8.1f} passes/s")


if __name__ == "__main__":
    main()
