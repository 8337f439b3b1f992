"""bench.py outage resilience: a transient backend-init failure must degrade
to a late measurement (rc=0, one JSON line), not a lost round.

BENCH_r03 was lost to a single axon UNAVAILABLE claim failure; bench.py now
retries backend init a bounded number of times (BENCH_ATTEMPTS) before
giving up. The simulated failure uses bench.py's BENCH_SIM_INIT_FAIL hook.
"""

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]

_TINY_ENV = {
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_backend_optimization_level=0",
    # the four subprocesses compile near-identical tiny programs; share one
    # persistent cache so only the first pays the compile
    "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_test_cache_bench",
    "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0.1",
    "BENCH_RETRY_SLEEP": "0",
    "BENCH_ITERS": "2",
    "BENCH_CHUNK": "2",
    "BENCH_HW": "48x40",
    "BENCH_FILTERS": "4",
    "BENCH_DEPTH": "2",
    "BENCH_GROUPS": "2",
}


def _run_bench(extra_env):
    env = {**os.environ, **_TINY_ENV, **extra_env}
    return subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )


def test_bench_survives_transient_init_failure():
    out = _run_bench({"BENCH_SIM_INIT_FAIL": "1", "BENCH_ATTEMPTS": "3"})
    assert out.returncode == 0, out.stderr[-2000:]
    assert "attempt 1/3" in out.stderr
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1  # exactly one JSON line (CLAUDE.md invariant)
    rec = json.loads(lines[0])
    assert rec["unit"] == "passes/sec"
    assert rec["value"] > 0
    assert rec["metric"] == "mc_dropblock_passes_per_sec_48x40_1chip"
    # provenance: the scored JSON must say which pipeline produced the number
    assert "fallback" not in rec["pipeline"]


def test_bench_gives_up_after_bounded_attempts():
    out = _run_bench({"BENCH_SIM_INIT_FAIL": "5", "BENCH_ATTEMPTS": "2"})
    assert out.returncode != 0
    assert "attempt 2/2" in out.stderr


def test_bench_falls_back_when_preferred_pipelines_fail():
    """A Mosaic/compile failure of the preferred (pair, fused) pipelines must
    degrade to the (xla, elementwise) fallback and still print the one JSON
    line — the scored artifact is a number, not an rc=1."""
    out = _run_bench({"BENCH_SIM_MEASURE_FAIL": "1"})
    assert out.returncode == 0, out.stderr[-2000:]
    assert "falling back" in out.stderr
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["value"] > 0


def test_bench_devices_shards_over_mesh():
    """BENCH_DEVICES=N runs the same workload over an N-device ('data',
    'model') mesh (virtual CPU devices here) and tags the metric name."""
    out = _run_bench({
        "BENCH_DEVICES": "8",
        "XLA_FLAGS": _TINY_ENV["XLA_FLAGS"]
        + " --xla_force_host_platform_device_count=8",
        "BENCH_CHUNK": "8",
    })
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    rec = json.loads(lines[0])
    assert rec["metric"] == "mc_dropblock_passes_per_sec_48x40_8chip"
    assert rec["value"] > 0
