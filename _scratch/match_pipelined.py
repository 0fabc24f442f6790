"""Software-pipelined 2-NN kernel: overlap tile i's VPU top-2 epilogue
with tile i+1's MXU matmul via a double-buffered VMEM scratch.

Grid runs nq+1 steps with "arbitrary" semantics; step i issues the dot
for query tile i into scratch[i%2] and the packed top-2 epilogue for
tile i-1 from scratch[(i-1)%2].  The dot and the epilogue touch different
buffers, so Mosaic is free to run them on the MXU and VPU concurrently.
Upside bound: full kernel 9.9k pairs/s vs matmul+1-max 12.8k (epilogue
~23%); perfect overlap would land near the matmul-only rate.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from metricsfm_tpu.ops import matching
from metricsfm_tpu.ops.pallas.match_kernel import (_COL_BITS, _COL_MASK,
                                                   _VAL_SCALE,
                                                   _knn2_pallas_impl)
from metricsfm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N_KP, N_PAIRS, ITERS = 4096, 96, 6


def _pipe_kernel(q_ref, db_ref, mask_ref, out_ref, sim_buf, *, nq):
    i = pl.program_id(0)

    @pl.when(i < nq)
    def _do_dot():
        sim_buf[i % 2] = jnp.dot(q_ref[:], db_ref[:],
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.DEFAULT)

    @pl.when(i > 0)
    def _do_epilogue():
        sim = sim_buf[(i - 1) % 2]
        sim = jnp.where(mask_ref[:] > 0, sim, -1.9)
        cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        pk = (sim * _VAL_SCALE).astype(jnp.int32) * (1 << _COL_BITS) + cols
        m1 = jnp.max(pk, axis=1)
        pk2 = jnp.where(pk == m1[:, None], jnp.int32(-(2 ** 31)), pk)
        m2 = jnp.max(pk2, axis=1)
        out_ref[0, :] = m1
        out_ref[1, :] = m2


def knn2_pipelined(desc1, desc2, tile=512):
    N1, D = desc1.shape
    N2 = desc2.shape[0]
    pad2 = (-N2) % 128
    n2p = N2 + pad2
    q = desc1.astype(jnp.bfloat16)
    db = jnp.pad(desc2, ((0, pad2), (0, 0))).astype(jnp.bfloat16).T
    m = jnp.ones((1, n2p), jnp.float32)
    nq = N1 // tile
    import functools
    kern = functools.partial(_pipe_kernel, nq=nq)
    out = pl.pallas_call(
        kern,
        grid=(nq + 1,),
        in_specs=[
            # query tile for step i (clamped at the end; masked by when)
            pl.BlockSpec((tile, D), lambda i, _n=nq: (min(i, _n - 1)
                                                      if isinstance(i, int)
                                                      else jnp.minimum(i, _n - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, n2p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n2p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        # output row for step i is tile i-1
        out_specs=pl.BlockSpec((2, tile),
                               lambda i: (0, jnp.maximum(i - 1, 0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, N1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((2, tile, n2p), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
    )(q, db, m)
    m1 = out[0, :N1]
    m2 = out[1, :N1]
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
        t0 = time.perf_counter()
        _ = np.asarray(chained(d1j, d2j))
        dt = time.perf_counter() - t0
        print(f"{label:14s}: {N_PAIRS * ITERS / dt:8.0f} pairs/s",
              flush=True)
    except Exception as e:
        print(f"{label:14s}: FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)


rng = np.random.default_rng(0)
d1 = np.abs(rng.normal(size=(N_PAIRS, N_KP, 128))).astype(np.float32)
d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
d2 = np.abs(rng.normal(size=(N_PAIRS, N_KP, 128))).astype(np.float32)
d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
d1j = jnp.asarray(d1).astype(jnp.bfloat16)
d2j = jnp.asarray(d2)

# correctness vs current kernel
try:
    ref = jax.jit(lambda a, b: _knn2_pallas_impl(a, b))(
        jnp.asarray(d1[0]), jnp.asarray(d2[0]))
    got = jax.jit(knn2_pipelined)(jnp.asarray(d1[0]), jnp.asarray(d2[0]))
    agree = float(np.mean(np.asarray(ref[2]) == np.asarray(got[2])))
    err = float(np.max(np.abs(np.asarray(ref[0]) - np.asarray(got[0]))))
    print(f"pipelined idx agreement: {agree:.4f}  max d1_sq err: {err:.2e}",
          flush=True)
except Exception as e:
    print("correctness FAIL:", type(e).__name__, str(e)[:300], flush=True)

for t in (512, 1024, 2048):
    bench(lambda a, b, t=t: knn2_pipelined(a, b, tile=t), d1j, d2j,
          f"pipe_t{t}")
bench(lambda a, b: _knn2_pallas_impl(a, b, tile=2048), d1j, d2j, "cur_t2048")
