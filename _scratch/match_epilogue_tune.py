"""Epilogue tuning sweep for the fused 2-NN kernel (round-5).

The round-4 pipelined study measured the double-buffered overlap variant
at 7.2-7.5k pairs/s vs 9.7k for the current kernel — Mosaic serializes
the scratch epilogue with the next tile's dot, so pipelining REGRESSES.
This sweep tries the remaining cheap levers: static no-mask variant
(skips one VPU pass), fused packing constants, tile size, and an output
layout variant.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from metricsfm_tpu.ops.pallas.match_kernel import (_COL_BITS, _COL_MASK,
                                                   _VAL_SCALE,
                                                   _knn2_pallas_impl)
from metricsfm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N_KP, N_PAIRS, ITERS = 4096, 96, 6


def _kernel_nomask(q_ref, db_ref, out_ref):
    sim = jnp.dot(q_ref[:], db_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
    cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    pk = (sim * _VAL_SCALE).astype(jnp.int32) * (1 << _COL_BITS) + cols
    m1 = jnp.max(pk, axis=1)
    pk2 = jnp.where(pk == m1[:, None], jnp.int32(-(2 ** 31)), pk)
    m2 = jnp.max(pk2, axis=1)
    out_ref[0, :] = m1
    out_ref[1, :] = m2


def knn2_nomask(desc1, desc2, tile=512):
    N1, D = desc1.shape
    N2 = desc2.shape[0]
    pad2 = (-N2) % 128
    n2p = N2 + pad2
    q = desc1.astype(jnp.bfloat16)
    db = jnp.pad(desc2, ((0, pad2), (0, 0))).astype(jnp.bfloat16).T
    nq = N1 // tile
    out = pl.pallas_call(
        _kernel_nomask,
        grid=(nq,),
        in_specs=[
            pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, n2p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, N1), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("parallel",)),
    )(q, db)
    m1 = out[0]
    m2 = out[1]
    idx = m1 & _COL_MASK
    best = (m1 >> _COL_BITS).astype(jnp.float32) / _VAL_SCALE
    second = (m2 >> _COL_BITS).astype(jnp.float32) / _VAL_SCALE
    return (jnp.maximum(2.0 - 2.0 * best, 0.0),
            jnp.maximum(2.0 - 2.0 * second, 0.0), idx)


def _kernel_andor(q_ref, db_ref, out_ref):
    # pack via one scaled cast + mask/or instead of cast + mul + add
    sim = jnp.dot(q_ref[:], db_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
    cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    pk = ((sim * (_VAL_SCALE * (1 << _COL_BITS))).astype(jnp.int32)
          & jnp.int32(~_COL_MASK)) | cols
    m1 = jnp.max(pk, axis=1)
    pk2 = jnp.where(pk == m1[:, None], jnp.int32(-(2 ** 31)), pk)
    m2 = jnp.max(pk2, axis=1)
    out_ref[0, :] = m1
    out_ref[1, :] = m2


def knn2_andor(desc1, desc2, tile=512):
    N1, D = desc1.shape
    N2 = desc2.shape[0]
    pad2 = (-N2) % 128
    n2p = N2 + pad2
    q = desc1.astype(jnp.bfloat16)
    db = jnp.pad(desc2, ((0, pad2), (0, 0))).astype(jnp.bfloat16).T
    nq = N1 // tile
    out = pl.pallas_call(
        _kernel_andor,
        grid=(nq,),
        in_specs=[
            pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, n2p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, N1), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("parallel",)),
    )(q, db)
    m1 = out[0]
    m2 = out[1]
    idx = m1 & _COL_MASK
    best = (m1 >> _COL_BITS).astype(jnp.float32) / _VAL_SCALE
    second = (m2 >> _COL_BITS).astype(jnp.float32) / _VAL_SCALE
    return (jnp.maximum(2.0 - 2.0 * best, 0.0),
            jnp.maximum(2.0 - 2.0 * second, 0.0), idx)


def bench(knn, d1j, d2j, label):
    @jax.jit
    def chained(D1, D2):
        def body(carry, _):
            r = jax.vmap(knn)(carry, D2)
            bump = (r[0][:, :1, None] * 1e-12).astype(carry.dtype)
            return carry + bump, r[2][0, 0]
        _, idxs = jax.lax.scan(body, D1, None, length=ITERS)
        return idxs

    try:
        _ = np.asarray(chained(d1j, d2j))
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            _ = np.asarray(chained(d1j, d2j))
            dt = time.perf_counter() - t0
            best = max(best, N_PAIRS * ITERS / dt)
        print(f"{label:16s}: {best:8.0f} pairs/s", flush=True)
        return best
    except Exception as e:
        print(f"{label:16s}: FAIL {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return -1.0


rng = np.random.default_rng(0)
d1 = np.abs(rng.normal(size=(N_PAIRS, N_KP, 128))).astype(np.float32)
d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
d2 = np.abs(rng.normal(size=(N_PAIRS, N_KP, 128))).astype(np.float32)
d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
d1j = jnp.asarray(d1).astype(jnp.bfloat16)
d2j = jnp.asarray(d2)

# correctness of variants vs current
ref = jax.jit(lambda a, b: _knn2_pallas_impl(a, b))(
    jnp.asarray(d1[0]), jnp.asarray(d2[0]))
for fn, name in ((knn2_nomask, "nomask"), (knn2_andor, "andor")):
    got = jax.jit(fn)(jnp.asarray(d1[0]), jnp.asarray(d2[0]))
    agree = float(np.mean(np.asarray(ref[2]) == np.asarray(got[2])))
    print(f"{name} idx agreement: {agree:.4f}", flush=True)

for t in (256, 512, 1024, 2048):
    bench(lambda a, b, t=t: _knn2_pallas_impl(a, b, tile=t), d1j, d2j,
          f"cur_t{t}")
for t in (512, 1024, 2048):
    bench(lambda a, b, t=t: knn2_nomask(a, b, tile=t), d1j, d2j,
          f"nomask_t{t}")
for t in (512, 2048):
    bench(lambda a, b, t=t: knn2_andor(a, b, tile=t), d1j, d2j,
          f"andor_t{t}")
