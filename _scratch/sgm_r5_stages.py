"""Round-5 SGM stage accounting: where do the missing 27% vs the
30.2 MP/s DMA bound go?  Times each pipeline stage separately (chained
in-jit like bench_sgm) and charges it against its ledger share.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from metricsfm_tpu.ops import sgm
from metricsfm_tpu.ops.pallas.sgm_kernel import (_horizontal_pass,
                                                 _kv_for, _partial_sum,
                                                 aggregate_wta_pallas,
                                                 census_cost_pallas)
from metricsfm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

H, W, D = 512, 640, 128
ITERS = 10
rng = np.random.default_rng(0)
L = jnp.asarray(rng.uniform(0, 1, size=(H, W)).astype(np.float32))
R = jnp.asarray(rng.uniform(0, 1, size=(H, W)).astype(np.float32))


def timeit(label, fn, *args):
    @jax.jit
    def chained(a, b):
        def body(cur, _):
            out = fn(cur, b)
            probe = jax.tree.leaves(out)[0]
            bump = (probe.reshape(-1)[0].astype(jnp.float32) * 1e-12)
            return cur + bump.astype(cur.dtype), \
                jnp.sum(probe.reshape(-1)[:1].astype(jnp.float32))
        _, s = jax.lax.scan(body, a, None, length=ITERS)
        return s

    _ = np.asarray(chained(*args))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        _ = np.asarray(chained(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    mps = H * W / 1e6 / best
    print(f"{label:28s}: {best*1e3:7.2f} ms  ({mps:6.2f} MP/s-equiv)",
          flush=True)
    return best


# full pipeline
t_full = timeit("stereo_sgm (full)",
                lambda a, b: sgm.stereo_sgm(a, b, max_disp=D)[0], L, R)

# stage 1: census + packed cost volume
t_cc = timeit("census_cost (packed)",
              lambda a, b: census_cost_pallas(a, b, D, packed=True), L, R)

# stage 2+3+4: aggregation + WTA from a precomputed packed volume
cost_p = census_cost_pallas(L, R, D, packed=True)
cost_p = jax.block_until_ready(cost_p)


def agg_only(c, _):
    wl, wr = aggregate_wta_pallas(c, 10, 120, 8, packed=True,
                                  real_shape=(H, W, D))
    return wl["c0"]


t_agg = timeit("aggregate+wta (packed)", agg_only, cost_p, cost_p)

# horizontal pass alone on the packed volume
import jax.numpy as jnp2
from jax.experimental.pallas import tpu as pltpu
vmem = pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)


def horiz_only(c, _):
    hf, hb = _horizontal_pass(c, 10, 120, jnp.int32, jnp.float32, vmem,
                              False, packed=True)
    return hf


t_h = timeit("horizontal pair (packed)", horiz_only, cost_p, cost_p)


def partial_only(c, _):
    KV = _kv_for(W, D, jnp.int32)
    return _partial_sum(c, KV, 10, 120, True, jnp.int32, jnp.float32,
                        vmem, False, packed=True)


t_p = timeit("horiz+vert_fwd (packed)", partial_only, cost_p, cost_p)

# XLA epilogue (median/LR/subpixel) = full - census - agg
print(f"\nledger accounting at {H}x{W}x{D}:", flush=True)
px = H * W
el = px * D / 2  # packed elements per volume pass
rate = 22e9
print(f"  packed volume pass @22Gel/s: {el / rate * 1e3:.2f} ms")
print(f"  census_cost measured {t_cc*1e3:.1f} ms vs ledger 1 pass")
print(f"  horizontal measured {t_h*1e3:.1f} ms vs ledger 4 passes "
      f"(r1+w1 x2) = {4 * el / rate * 1e3:.2f} ms")
print(f"  vert_fwd measured {(t_p - t_h)*1e3:.1f} ms vs ledger 4 passes")
print(f"  vert_bwd+wta measured {(t_agg - t_p)*1e3:.1f} ms vs ledger "
      f"3 passes + wta")
print(f"  xla epilogue (full - cc - agg): "
      f"{(t_full - t_cc - t_agg)*1e3:.1f} ms")
print(f"  full: {t_full*1e3:.1f} ms = {px/1e6/t_full:.2f} MP/s; bound "
      f"{sgm.speed_of_light_mps(D):.1f}")
