"""Is int32 _step math slower than f32 on this VPU?"""
import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu
from metricsfm_tpu.ops.pallas import sgm_kernel as K

H, W, D, ITERS = 512, 640, 128, 10
rng = np.random.default_rng(0)
L = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
R = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
vmem = pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)

cu = K.census_cost_pallas(L, R, D)
ci = K.census_cost_pallas(L, R, D, storage=jnp.int32)
KV = K._kv_for(W, D, jnp.float32)

def timeit_vol(name, make, vol):
    @jax.jit
    def chained(a):
        def body(c, _):
            out = make(c)
            leaf = jax.tree_util.tree_leaves(out)[0]
            probe = leaf.ravel()[:1].reshape((1,) * c.ndim).astype(c.dtype)
            return c + probe - probe, jnp.sum(leaf[..., :1].astype(jnp.float32))
        _, s = jax.lax.scan(body, a, None, length=ITERS)
        return s
    _ = np.asarray(chained(vol))
    t0 = time.perf_counter()
    _ = np.asarray(chained(vol))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:30s} {dt*1e3:8.2f} ms   {H*W/1e6/dt:6.1f} MP/s")

timeit_vol("partial f32",
       lambda c: K._partial_sum(c, KV, 10, 120, True, jnp.float32, jnp.float32, vmem, False), cu)
timeit_vol("partial int32",
       lambda c: K._partial_sum(c, KV, 10, 120, True, jnp.int32, jnp.int32, vmem, False), ci)
timeit_vol("wta f32",
       lambda c: K.aggregate_wta_pallas(c, 10, 120, 8, storage=jnp.float32, real_shape=(H, W, D)), cu)
timeit_vol("wta int32",
       lambda c: K.aggregate_wta_pallas(c, 10, 120, 8, storage=jnp.int32, real_shape=(H, W, D)), ci)
