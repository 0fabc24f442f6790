"""Micro-profile of the 2-NN kernel: where does the time go?

Variants (all 96 pairs x 4096x4096x128, chained scan like bench.py):
  bf16_full   : shipped bf16 kernel
  int8_full   : shipped int8 kernel
  bf16_mm     : bf16 matmul only (epilogue = one max)
  int8_mm     : int8 matmul only (epilogue = one max)
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metricsfm_tpu.ops.pallas.match_kernel import (
    _knn2_pallas_impl, _knn2_pallas_int8_impl, quantize_desc_int8)

N, D, P, ITERS = 4096, 128, 96, 6


def _mm_kernel_bf16(q_ref, db_ref, out_ref):
    sim = jnp.dot(q_ref[:], db_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
    out_ref[0, :] = jnp.max(sim, axis=1)


def _mm_kernel_int8(q_ref, db_ref, out_ref):
    sim = jnp.dot(q_ref[:], db_ref[:], preferred_element_type=jnp.int32,
                  precision=jax.lax.Precision.DEFAULT)
    out_ref[0, :] = jnp.max(sim, axis=1).astype(jnp.float32)


def mm_only(desc1, desc2, kind="bf16", bq=512):
    if kind == "bf16":
        q = desc1.astype(jnp.bfloat16)
        db = desc2.astype(jnp.bfloat16).T
        kern = _mm_kernel_bf16
    else:
        q = quantize_desc_int8(desc1)
        db = quantize_desc_int8(desc2).T
        kern = _mm_kernel_int8
    nq = N // bq
    return pl.pallas_call(
        kern,
        grid=(nq,),
        in_specs=[
            pl.BlockSpec((bq, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
    )(q, db)


def timeit(name, fn, d1, d2):
    @jax.jit
    def chained(D1, D2):
        def body(c, _):
            out = fn(c, D2)
            leaf = jax.tree_util.tree_leaves(out)[0]
            probe = leaf[..., :1, :1].astype(jnp.bfloat16) if leaf.ndim >= 2 \
                else leaf[..., :1].astype(jnp.bfloat16)[..., None]
            y = sum(jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree_util.tree_leaves(out))
            return c + probe * 1e-12, y
        _, ys = jax.lax.scan(body, D1, None, length=ITERS)
        return ys
    _ = np.asarray(chained(d1, d2))
    t0 = time.perf_counter()
    _ = np.asarray(chained(d1, d2))
    dt = time.perf_counter() - t0
    pps = ITERS * P / dt
    tf = pps * 2 * N * N * D / 1e12
    print(f"{name:12s} {pps:10.1f} pairs/s   {tf:6.1f} T(mac2)/s")


rng = np.random.default_rng(0)
d1 = np.abs(rng.normal(size=(P, N, D))).astype(np.float32)
d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
d2 = np.abs(rng.normal(size=(P, N, D))).astype(np.float32)
d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
d1j = jnp.asarray(d1).astype(jnp.bfloat16)
d2j = jnp.asarray(d2)

variants = {
    "bf16_mm": jax.vmap(lambda a, b: mm_only(a, b, "bf16")),
    "int8_mm": jax.vmap(lambda a, b: mm_only(a, b, "int8")),
    "bf16_full": jax.vmap(lambda a, b: _knn2_pallas_impl(a, b)),
    "int8_full": jax.vmap(lambda a, b: _knn2_pallas_int8_impl(a, b)),
}
import sys
names = sys.argv[1:] or list(variants)
for nm in names:
    try:
        timeit(nm, variants[nm], d1j, d2j)
    except Exception as e:
        print(nm, "FAIL", type(e).__name__, str(e)[:200])
