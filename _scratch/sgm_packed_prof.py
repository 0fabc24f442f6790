import time
import numpy as np, jax, jax.numpy as jnp
from metricsfm_tpu.ops import sgm
from metricsfm_tpu.ops.pallas import sgm_kernel as K

H, W, D = 512, 640, 128
rng = np.random.default_rng(0)
L = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
R = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
ITERS = 20

def timeit(name, fn):
    out = fn(L, R)
    _ = [np.asarray(x) for x in jax.tree_util.tree_leaves(out)[:1]]
    t0 = time.perf_counter()
    for _i in range(ITERS):
        out = fn(L, R)
    _ = [np.asarray(x) for x in jax.tree_util.tree_leaves(out)[:1]]
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:28s} {dt*1e3:8.2f} ms   {H*W/1e6/dt:6.1f} MP/s")

def agg_packed(a, b):
    cp = K.census_cost_pallas(a, b, D, packed=True)
    return K.aggregate_wta_pallas(cp, 10, 120, 8, packed=True,
                                  real_shape=(H, W, D))

timeit("census packed", lambda a, b: K.census_cost_pallas(a, b, D, packed=True))
timeit("census+agg+wta packed", agg_packed)
timeit("full stereo_sgm (packed)", lambda a, b: sgm.stereo_sgm(a, b, max_disp=D))
