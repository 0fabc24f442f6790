"""Per-stage SGM timing at the bench shape (512x640x128)."""
import functools
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


def timeit(name, make):
    @jax.jit
    def chained(a, b):
        def body(c, _):
            out = make(c, b)
            leaf = jax.tree_util.tree_leaves(out)[0]
            probe = leaf.ravel()[:1].reshape(1, 1).astype(c.dtype)
            return c + probe * 1e-12, jnp.sum(leaf[0].astype(jnp.float32))
        _, s = jax.lax.scan(body, a, None, length=ITERS)
        return s

    _ = np.asarray(chained(L, R))
    t0 = time.perf_counter()
    _ = np.asarray(chained(L, R))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:28s} {dt*1e3:8.2f} ms   {H*W/1e6/dt:6.1f} MP/s")
    return dt


cost_p = K.census_cost_pallas(L, R, D)
print("cost_p shape", cost_p.shape, cost_p.dtype)


def agg_only(a, b):
    cp = K.census_cost_pallas(a, b, D)
    return K.aggregate_wta_pallas(cp, 10, 120, 8, storage=jnp.int16,
                                  real_shape=(H, W, D))


timeit("census_cost", lambda a, b: K.census_cost_pallas(a, b, D))
timeit("census+agg+wta", agg_only)
timeit("full stereo_sgm", lambda a, b: sgm.stereo_sgm(a, b, max_disp=D))


# individual aggregation kernels on a fixed padded volume
from jax.experimental.pallas import tpu as pltpu

cv, KV = K._vertical_setup(cost_p.astype(jnp.int16), jnp.int16)
vmem = pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)


def horiz(cvol, _):
    return K._horizontal_pass(cvol, 10, 120, jnp.int16, jnp.int32, vmem,
                              False)


def part(cvol, _):
    return K._partial_sum(cvol, KV, 10, 120, True, jnp.int16, jnp.int32,
                          vmem, False)


L2 = cv
R2 = cv


def timeit_vol(name, make):
    @jax.jit
    def chained(a):
        def body(c, _):
            out = make(c, None)
            leaf = jax.tree_util.tree_leaves(out)[0]
            probe = leaf.ravel()[:1].reshape(1, 1, 1).astype(c.dtype)
            return c + probe, jnp.sum(leaf[0, 0, :8].astype(jnp.int32))
        _, s = jax.lax.scan(body, a, None, length=ITERS)
        return s
    _ = np.asarray(chained(L2))
    t0 = time.perf_counter()
    _ = np.asarray(chained(L2))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:28s} {dt*1e3:8.2f} ms   {H*W/1e6/dt:6.1f} MP/s")


timeit_vol("horizontal pair", horiz)
timeit_vol("horiz + vert fwd", part)
