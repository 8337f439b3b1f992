"""Headline benchmark: MC-DropBlock uncertainty passes/sec on one chip.

The reference's hot loop is 1000 serial batch-1 torch forward passes of the
31M-param U-Net per 584x565 DRIVE image with fresh DropBlock masks each pass
(uncertainty_tests/Dropblock_Uncertainty.py:64) — single-digit passes/sec
class on a contemporary GPU. Here the ensemble runs as chunked vmapped
device batches in bfloat16 with streaming statistics (one jitted program).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "passes/sec", "vs_baseline": N/REF}
vs_baseline is measured against BASELINE.json's driver target of 1000
passes/sec/chip (there are no published upstream numbers; BASELINE.md).
"""

import importlib.util
import json
import os
import sys
import time

# The driver invokes plain `python bench.py`; on a re-imaged host the venv
# may not be on PATH and /usr/local/bin/python has no jax. Re-exec under the
# baked-in venv interpreter rather than dying with ModuleNotFoundError.
_VENV_PY = "/opt/venv/bin/python"
# note: the venv python is a symlink to the base interpreter, so compare
# sys.executable literally (realpath collapses them) and use a one-shot env
# flag to rule out an exec loop.
if importlib.util.find_spec("jax") is None and os.path.exists(_VENV_PY) \
        and not os.environ.get("BENCH_REEXECED"):
    os.environ["BENCH_REEXECED"] = "1"
    os.execv(_VENV_PY, [_VENV_PY] + sys.argv)

# The shipping configuration: the preferred (conv, mask) pipeline pair and
# the fallback it degrades to if the preferred one fails to compile/run on
# the current hardware (the scored artifact must be a number, not an rc=1).
# Round-5 measured ladder (PERF.md, 14 rungs on the v5e): xla+elementwise
# WINS at native (106.2 vs pair+fused 85.2 passes/s) and at resize-256
# (649.7 @ chunk 128 vs pair+fused 439.5) — the Pallas conv pipeline is
# retired from the default with that measured verdict; the kernels stay
# available via UNET_CONV_IMPL/UNET_DB_IMPL (overrides run WITHOUT
# fallback — a ladder rung must fail loudly). With default == fallback the
# fallback path is a retry-once guard against transient tunnel failures
# (BENCH_r03 was lost to one).
DEFAULT_CONV_IMPL = "xla"
DEFAULT_MASK_IMPL = "elementwise"
FALLBACK_CONV_IMPL = "xla"
FALLBACK_MASK_IMPL = "elementwise"
# measured chunk winners per workload (same ladder): native flat in chunk
# (16/32 identical), resize-256 non-monotonic with 128 on top.
NATIVE_CHUNK = 16
R256_CHUNK = 128


def _devices_with_retry(get_devices, attempts: int, sleep_s: float):
    """Claim the backend with a bounded retry.

    The axon TPU pool's transient-outage signature is a long block in
    backend init followed by `RuntimeError: Unable to initialize backend
    'axon': UNAVAILABLE ...` (memory: each failed claim costs ~28 min).
    A single such failure must degrade to a late number, not an rc=1 round
    (BENCH_r03 was lost to exactly this).
    """
    last = None
    for i in range(attempts):
        try:
            return get_devices()
        except RuntimeError as e:  # jax raises RuntimeError on backend-init failure
            last = e
            print(
                f"bench: backend init failed (attempt {i + 1}/{attempts}): {e}",
                file=sys.stderr,
                flush=True,
            )
            if i + 1 < attempts:
                time.sleep(sleep_s)
    raise last


def _get_devices():
    import jax

    # Honor JAX_PLATFORMS programmatically: jax is pre-imported at
    # interpreter startup in this environment and the axon plugin forces its
    # platform, so the env var alone does not stick (same reason
    # tests/conftest.py uses config.update). Without this, the CPU retry
    # test would block ~28 min on a real TPU claim.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    # test hook: simulate the first N claim attempts failing
    sim = int(os.environ.get("BENCH_SIM_INIT_FAIL", 0))
    if sim > 0:
        os.environ["BENCH_SIM_INIT_FAIL"] = str(sim - 1)
        raise RuntimeError(
            "Unable to initialize backend 'axon': UNAVAILABLE: simulated"
        )
    return jax.devices()


def main():
    attempts = int(os.environ.get("BENCH_ATTEMPTS", 3))
    retry_sleep = float(os.environ.get("BENCH_RETRY_SLEEP", 120))
    _devices_with_retry(_get_devices, attempts, retry_sleep)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unet_research_tpu.models import DropBlockConfig, UNet, UNetConfig, canonical_config
    from unet_research_tpu.uncertainty import MCDropBlockEngine

    num_iterations = int(os.environ.get("BENCH_ITERS", 1000))
    # secondary benchmark: the reference's `-resize N` MC configuration
    # (Dropblock_Uncertainty.py:52-61) — square-pad + bilinear resize before
    # the ensemble. 0 = native (the driver's headline metric).
    resize = int(os.environ.get("BENCH_RESIZE", 0))
    chunk = int(os.environ.get("BENCH_CHUNK", 0)) or (
        R256_CHUNK if resize else NATIVE_CHUNK
    )
    # test-only shrink knobs (the retry-path subprocess test runs a tiny
    # model on CPU); defaults are the canonical workload and the metric name
    # reflects the measured size, so the headline name stays stable.
    h, w = (int(v) for v in os.environ.get("BENCH_HW", "584x565").split("x"))
    tiny = {}
    if os.environ.get("BENCH_FILTERS"):
        tiny["filters"] = int(os.environ["BENCH_FILTERS"])
    if os.environ.get("BENCH_DEPTH"):
        tiny["model_depth"] = int(os.environ["BENCH_DEPTH"])
    if os.environ.get("BENCH_GROUPS"):
        tiny["group_norm_groups"] = int(os.environ["BENCH_GROUPS"])

    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.random((1, h, w, 1), dtype=np.float32))
    gt = jnp.zeros_like(im)
    mask = jnp.ones_like(im)

    # multi-chip: shard the MC chunk batch over a ('data','model') mesh —
    # the ensemble scales over ICI with no code change (the engine holds the
    # sharding constraint; XLA emits the collectives). Default 0 = the
    # driver's single-chip headline.
    n_dev = int(os.environ.get("BENCH_DEVICES", 0))
    mesh = None
    if n_dev > 1:
        from unet_research_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=n_dev, model=1)

    def sync(mean, std):
        # host scalar fetch: the only reliable execution barrier on the
        # remote-tunnel backend (block_until_ready returns early on the
        # first post-compile call there)
        return float(jnp.sum(mean) + jnp.sum(std))

    def measure(conv_impl: str, mask_impl: str) -> float:
        # test hook: simulate the first N measure() calls failing on-device
        # (count-based, not pipeline-matched, so the retry-once fallback is
        # testable even when default == fallback)
        sim_fail = int(os.environ.get("BENCH_SIM_MEASURE_FAIL", 0))
        if sim_fail > 0:
            os.environ["BENCH_SIM_MEASURE_FAIL"] = str(sim_fail - 1)
            raise RuntimeError("simulated preferred-pipeline failure")
        cfg = canonical_config(dtype=jnp.bfloat16, **tiny)
        cfg = UNetConfig(
            **{
                **cfg.__dict__,
                "dropblock": DropBlockConfig(
                    kind="dependent",
                    block_size=7,
                    drop_prob=0.15,
                    use_scheduler=False,
                    # mask pipeline: 'elementwise' | 'kernel' | 'fused'
                    mask_impl=mask_impl,
                ),
                # 3x3-conv lowering: 'xla' | 'pair'
                "conv_impl": conv_impl,
            }
        )
        model = UNet(cfg)
        params = model.init(jax.random.PRNGKey(0), im)["params"]
        engine = MCDropBlockEngine(
            model, num_iterations=num_iterations, return_num=0, chunk=chunk,
            resize=resize if resize else -1, mesh=mesh,
        )

        # warmups (compile + one clean execution)
        for i in range(2):
            mean, std, *_ = engine.predict(
                params, im, gt, mask, jax.random.PRNGKey(i), 0.15
            )
            sync(mean, std)

        # Salt the timed keys per invocation: the tunnel backend memoizes
        # identical dispatches, and a fixed key set would let a replayed
        # result masquerade as a fresh measurement. The keys only need to be
        # fresh, not reproducible.
        salt = time.time_ns() & 0x7FFFFFFF
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            mean, std, *_ = engine.predict(
                params, im, gt, mask, jax.random.PRNGKey(salt + i), 0.15
            )
            sync(mean, std)
            times.append(time.perf_counter() - t0)
        return num_iterations / min(times)

    env_conv = os.environ.get("UNET_CONV_IMPL")
    env_mask = os.environ.get("UNET_DB_IMPL")
    if env_conv or env_mask:
        # explicit ladder override: fail loudly, never substitute
        conv, mask_p = env_conv or DEFAULT_CONV_IMPL, env_mask or DEFAULT_MASK_IMPL
        passes_per_sec = measure(conv, mask_p)
        pipeline = f"{conv}+{mask_p}"
    else:
        try:
            passes_per_sec = measure(DEFAULT_CONV_IMPL, DEFAULT_MASK_IMPL)
            pipeline = f"{DEFAULT_CONV_IMPL}+{DEFAULT_MASK_IMPL}"
        except Exception as e:  # Mosaic/compile/runtime failure on this chip
            print(
                f"bench: preferred pipelines ({DEFAULT_CONV_IMPL},"
                f" {DEFAULT_MASK_IMPL}) failed ({type(e).__name__}: "
                f"{str(e)[:300]}); falling back to "
                f"({FALLBACK_CONV_IMPL}, {FALLBACK_MASK_IMPL})",
                file=sys.stderr,
                flush=True,
            )
            passes_per_sec = measure(FALLBACK_CONV_IMPL, FALLBACK_MASK_IMPL)
            pipeline = f"{FALLBACK_CONV_IMPL}+{FALLBACK_MASK_IMPL} (fallback)"
    chips = f"{n_dev}chip" if n_dev > 1 else "1chip"
    metric = f"mc_dropblock_passes_per_sec_{h}x{w}_{chips}"
    if resize:
        metric = f"mc_dropblock_passes_per_sec_resize{resize}_{chips}"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(passes_per_sec, 2),
                "unit": "passes/sec",
                "vs_baseline": round(passes_per_sec / 1000.0, 4),
                # provenance: which (conv, mask) pipeline produced the scored
                # number — a silent fallback must be visible in the artifact,
                # not just the stderr tail (VERDICT r4 weak #2). The metric
                # name stays stable (CLAUDE.md invariant).
                "pipeline": pipeline,
            }
        )
    )


if __name__ == "__main__":
    main()
