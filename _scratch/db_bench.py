import sys, time, numpy as np, jax, jax.numpy as jnp
from unet_research_tpu.ops.dropblock import dropblock_dependent, _hash_uniform, dropblock_gamma_dependent
from jax import lax

variant = sys.argv[1]
B, H, W, C = 16, 592, 576, 64
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.random((B,H,W,C), dtype=np.float32), jnp.bfloat16)
key = jax.random.PRNGKey(0)

def db_i8(x, k, p=0.15, b=7):
    n,h,w,c = x.shape
    gamma = dropblock_gamma_dependent(h, w, b, p)
    u = _hash_uniform(k, (n, h-b+1, w-b+1, c))
    seeds = (u < gamma).astype(jnp.int8)
    pp = b//2
    mask = jnp.pad(seeds, ((0,0),(pp,pp),(pp,pp),(0,0)))
    blk = lax.reduce_window(mask, jnp.int8(-127), lax.max, (1,b,1,1), (1,1,1,1), ((0,0),(pp,pp),(0,0),(0,0)))
    blk = lax.reduce_window(blk, jnp.int8(-127), lax.max, (1,1,b,1), (1,1,1,1), ((0,0),(0,0),(pp,pp),(0,0)))
    keep = (jnp.int8(1) - blk)
    s = jnp.sum(keep.astype(jnp.float32))
    scale = (keep.size / s).astype(x.dtype)
    return x * keep.astype(x.dtype) * scale

def db_norw(x, k, p=0.15, b=7):
    n,h,w,c = x.shape
    gamma = dropblock_gamma_dependent(h, w, b, p)
    u = _hash_uniform(k, (n,h,w,c))
    keep = (u >= gamma).astype(x.dtype)
    s = jnp.sum(keep.astype(jnp.float32))
    return x * keep * (keep.size / s).astype(x.dtype)

ops = {
    "current": lambda x, k: dropblock_dependent(x, k, 0.15, 7),
    "i8": db_i8,
    "norw": db_norw,
}
op = ops[variant]
n = 10
@jax.jit
def f(x, key):
    def body(i, x):
        return op(x, jax.random.fold_in(key, i)).astype(x.dtype)
    return lax.fori_loop(0, n, body, x)
r = f(x0, key); float(jnp.sum(r.astype(jnp.float32)))
ts = []
for k in range(2):
    xi = (x0 + np.float32(k+1)*1e-6).astype(x0.dtype)
    t0 = time.perf_counter(); r = f(xi, jax.random.fold_in(key, 100+k)); float(jnp.sum(r.astype(jnp.float32))); ts.append(time.perf_counter()-t0)
print(f"{variant}: {min(ts)/n*1e3:.2f} ms/application")
