"""CLI entry points.

jax is pre-imported at interpreter startup in some environments (the axon
TPU plugin's sitecustomize registers itself and programmatically forces
`jax_platforms='axon,cpu'`), which makes the standard JAX_PLATFORMS env var
a no-op by the time a CLI main runs. Honor an EXPLICIT non-axon selection
programmatically here — every CLI module imports this package first — so
`JAX_PLATFORMS=cpu python -m unet_research_tpu.cli.training ...` runs on
CPU instead of blocking on a TPU claim (tests/conftest.py and bench.py do
the same). The ambient environment also exports JAX_PLATFORMS=axon, so a
value naming axon is the forced default already and must NOT be re-asserted
(it would override a test harness's earlier cpu forcing).
"""

import os

_env_platforms = os.environ.get("JAX_PLATFORMS", "")
if _env_platforms and "axon" not in _env_platforms.split(","):
    import jax

    try:
        jax.config.update("jax_platforms", _env_platforms)
    except RuntimeError:
        pass  # backends already initialized — too late to switch
