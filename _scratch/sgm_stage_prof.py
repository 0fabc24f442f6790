"""Per-stage timing of the packed SGM pipeline at 512x640x128."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from metricsfm_tpu.ops import sgm
from metricsfm_tpu.ops.pallas import sgm_kernel as K

H, W, D, ITERS = 512, 640, 128, 10
rng = np.random.default_rng(0)
L = jnp.asarray(rng.uniform(0, 1, size=(H, W)).astype(np.float32))
R = jnp.asarray(rng.uniform(0, 1, size=(H, W)).astype(np.float32))

cost_p = jax.block_until_ready(K.census_cost_pallas(L, R, D, packed=True))


def timeit(name, fn, *args):
    @jax.jit
    def chained(a0, *rest):
        def body(c, _):
            out = fn(c, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            probe = leaf.ravel()[:1].reshape((1,) * c.ndim).astype(c.dtype)
            return c + probe - probe, jnp.sum(leaf[..., :1].astype(jnp.float32))
        _, s = jax.lax.scan(body, a0, None, length=ITERS)
        return s
    _ = np.asarray(chained(*args))
    t0 = time.perf_counter()
    _ = np.asarray(chained(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:28s} {dt*1e3:8.2f} ms   {H*W/1e6/dt:6.1f} MP/s")
    return dt


KV = K._kv_for(W, D, jnp.int32)

timeit("census_cost packed", lambda l: K.census_cost_pallas(l, R, D, packed=True), L)
timeit("horizontal pair", lambda c: K._horizontal_pass(
    c, 10, 120, jnp.int32, jnp.float32,
    K.pltpu.CompilerParams(vmem_limit_bytes=120 << 20), False, packed=True),
    cost_p)
timeit("partial (horiz+vfwd)", lambda c: K._partial_sum(
    c, KV, 10, 120, True, jnp.int32, jnp.float32,
    K.pltpu.CompilerParams(vmem_limit_bytes=120 << 20), False, packed=True),
    cost_p)
timeit("agg+wta (3 kernels)", lambda c: K.aggregate_wta_pallas(
    c, 10, 120, 8, packed=True, real_shape=(H, W, D)), cost_p)
timeit("stereo_sgm full", lambda l: sgm.stereo_sgm(l, R, max_disp=D), L)
