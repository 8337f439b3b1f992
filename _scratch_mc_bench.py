import time, numpy as np, jax, jax.numpy as jnp
from unet_research_tpu.models import DropBlockConfig, UNet, UNetConfig, canonical_config
from unet_research_tpu.uncertainty import MCDropBlockEngine

rng = np.random.default_rng(0)
im = jnp.asarray(rng.random((1, 584, 565, 1), dtype=np.float32))
cfg = canonical_config(dtype=jnp.bfloat16)
cfg = UNetConfig(**{**cfg.__dict__, "dropblock": DropBlockConfig(kind="dependent", block_size=7, drop_prob=0.15, use_scheduler=False)})
model = UNet(cfg)
params = model.init(jax.random.PRNGKey(0), im)["params"]
engine = MCDropBlockEngine(model, num_iterations=96, return_num=0, chunk=16)
args = lambda k: (params, im, im, jnp.ones_like(im), jax.random.PRNGKey(k), 0.15)
t0=time.time(); r = engine.predict(*args(0)); print("warm", float(jnp.sum(r[0])), f"{time.time()-t0:.0f}s", flush=True)
ts = []
for k in (1,2,3):
    t0 = time.perf_counter(); r = engine.predict(*args(k)); s = float(jnp.sum(r[0])+jnp.sum(r[1])); ts.append(time.perf_counter()-t0)
print("std max:", float(jnp.max(r[1])))
print(f"pallas strip MC: {96/min(ts):.1f} passes/s")
