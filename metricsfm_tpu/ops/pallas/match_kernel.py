"""Fused 2-NN descriptor matching kernel (Pallas/TPU).

The hot op of the matching layer (SURVEY.md §3.1 HOT LOOP #2): for each
query descriptor find its best + second-best database neighbour.  The XLA
version (ops/matching.knn2) materializes (BQ, chunk) similarity tiles and
re-reads them for max/argmax/second-max; this kernel keeps each similarity
tile in VMEM and fuses the MXU matmul with the running top-2 update —
one HBM pass over the database per query block.

Layout: grid (query_blocks, db_blocks), db-minor iteration; the running
(best, second, argmax) rows live in VMEM scratch across db steps and are
flushed to the output block on the last db step.  All row vectors are kept
as (1, BQ) so the lane dimension stays wide.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, db_ref, mask_ref, best_ref, second_ref, idx_ref,
            acc_best, acc_second, acc_idx, *, bd: int):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_best[:] = jnp.full_like(acc_best, -jnp.inf)
        acc_second[:] = jnp.full_like(acc_second, -jnp.inf)
        acc_idx[:] = jnp.zeros_like(acc_idx)

    # db block arrives pre-transposed as (D, BD): standard (m,k)x(k,n)
    # matmul. Blocks are stored bf16 (halves VMEM traffic) but cast to f32
    # at the dot: current Mosaic rejects the bf16xbf16->f32 tpu.matmul
    # form ("Bad lhs type"), while f32 inputs lower cleanly.
    sim = jnp.dot(q_ref[:].astype(jnp.float32),
                  db_ref[:].astype(jnp.float32),
                  preferred_element_type=jnp.float32)       # (BQ, BD)
    sim = jnp.where(mask_ref[:] > 0, sim, -jnp.inf)         # (1,BD) bcast

    blk_best = jnp.max(sim, axis=1)                         # (BQ,)
    blk_arg = jnp.argmax(sim, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    sim2 = jnp.where(cols == blk_arg[:, None], -jnp.inf, sim)
    blk_second = jnp.max(sim2, axis=1)

    best = acc_best[0, :]
    second = acc_second[0, :]
    hi = jnp.maximum(best, blk_best)
    lo = jnp.minimum(best, blk_best)
    # second/blk_second are each <= their block's best <= hi, so the new
    # runner-up is simply the max of {lo, second, blk_second}
    sec = jnp.maximum(lo, jnp.maximum(second, blk_second))
    new_idx = jnp.where(blk_best > best, j * bd + blk_arg, acc_idx[0, :])

    acc_best[0, :] = hi
    acc_second[0, :] = sec
    acc_idx[0, :] = new_idx

    @pl.when(j == nj - 1)
    def _():
        best_ref[0, :] = acc_best[0, :]
        second_ref[0, :] = acc_second[0, :]
        idx_ref[0, :] = acc_idx[0, :]


@functools.partial(jax.jit, static_argnames=("bq", "bd", "interpret"))
def knn2_pallas(desc1, desc2, mask2=None, bq: int = 256, bd: int = 1024,
                interpret: bool = False):
    """Exact 2-NN via the fused kernel.

    Args:
      desc1: (N1, D) L2-normalized queries (padded to bq internally).
      desc2: (N2, D) database (padded to bd internally).
      mask2: (N2,) validity.
    Returns (d1_sq, d2_sq, idx) like ops.matching.knn2.
    """
    N1, D = desc1.shape
    N2 = desc2.shape[0]
    pad1 = (-N1) % bq
    pad2 = (-N2) % bd
    q = jnp.pad(desc1, ((0, pad1), (0, 0))).astype(jnp.bfloat16)
    db = jnp.pad(desc2, ((0, pad2), (0, 0))).astype(jnp.bfloat16).T  # (D, N2p)
    m = jnp.ones((N2,), jnp.float32) if mask2 is None else mask2.astype(jnp.float32)
    m = jnp.pad(m, (0, pad2))[None, :]                      # (1, N2p)

    n1p, n2p = N1 + pad1, N2 + pad2
    nq, nd = n1p // bq, n2p // bd

    kernel = functools.partial(_kernel, bd=bd)
    best, second, idx = pl.pallas_call(
        kernel,
        grid=(nq, nd),
        in_specs=[
            pl.BlockSpec((bq, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, bd), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bd), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        # outputs are (1, N) rows with lane-dim blocks — 1-D outputs tile
        # as T(256) in Mosaic but T(1024) in XLA and fail layout checks
        out_specs=[
            pl.BlockSpec((1, bq), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n1p), jnp.float32),
            jax.ShapeDtypeStruct((1, n1p), jnp.float32),
            jax.ShapeDtypeStruct((1, n1p), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, bq), jnp.float32),
            pltpu.VMEM((1, bq), jnp.float32),
            pltpu.VMEM((1, bq), jnp.int32),
        ],
        interpret=interpret,
    )(q, db, m)

    best = best[0, :N1]
    second = second[0, :N1]
    idx = idx[0, :N1]
    d1_sq = jnp.maximum(2.0 - 2.0 * best, 0.0)
    d2_sq = jnp.maximum(2.0 - 2.0 * second, 0.0)
    return d1_sq, d2_sq, idx


def match_pair_pallas(desc1, desc2, mask1=None, mask2=None,
                      ratio_good: float = 0.6, ratio_all: float = 0.85,
                      bq: int = 256, bd: int = 1024):
    """Drop-in fused variant of ops.matching.match_pair."""
    d1_sq, d2_sq, idx2 = knn2_pallas(desc1, desc2, mask2, bq=bq, bd=bd)
    m1 = jnp.ones(desc1.shape[:1], bool) if mask1 is None else mask1.astype(bool)
    safe2 = jnp.maximum(d2_sq, 1e-12)
    good = (d1_sq < ratio_good ** 2 * safe2) & m1
    allm = (d1_sq < ratio_all ** 2 * safe2) & m1
    return {"idx2": idx2, "good": good, "all": allm, "dist_sq": d1_sq}
