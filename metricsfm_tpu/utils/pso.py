"""Particle-swarm optimization (compiled-in capability of the reference).

Re-design of SfM/src/utils/simpsolib.{h,cpp} (+simtstlib): a generic PSO
minimizer.  The reference links it but wires it to no pipeline (SURVEY.md
§2.9 "dead capability"); provided here as a jit-compiled utility.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("fn", "n_particles", "iters"))
def pso_minimize(fn, lo, hi, key, n_particles: int = 64, iters: int = 100,
                 inertia: float = 0.72, c_personal: float = 1.49,
                 c_global: float = 1.49):
    """Minimize fn over the box [lo, hi].

    Args:
      fn: vectorized objective mapping (N, D) -> (N,).
      lo, hi: (D,) bounds.
    Returns (best_x (D,), best_val ()).
    """
    D = lo.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.uniform(k1, (n_particles, D)) * (hi - lo) + lo
    v = (jax.random.uniform(k2, (n_particles, D)) - 0.5) * (hi - lo) * 0.1
    pbest = x
    pval = fn(x)
    gi = jnp.argmin(pval)
    gbest, gval = x[gi], pval[gi]

    def body(i, state):
        x, v, pbest, pval, gbest, gval, key = state
        key, ka, kb = jax.random.split(key, 3)
        r1 = jax.random.uniform(ka, x.shape)
        r2 = jax.random.uniform(kb, x.shape)
        v = inertia * v + c_personal * r1 * (pbest - x) \
            + c_global * r2 * (gbest[None] - x)
        x = jnp.clip(x + v, lo, hi)
        val = fn(x)
        better = val < pval
        pbest = jnp.where(better[:, None], x, pbest)
        pval = jnp.where(better, val, pval)
        gi = jnp.argmin(pval)
        upd = pval[gi] < gval
        gbest = jnp.where(upd, pbest[gi], gbest)
        gval = jnp.where(upd, pval[gi], gval)
        return x, v, pbest, pval, gbest, gval, key

    state = (x, v, pbest, pval, gbest, gval, k3)
    *_, gbest, gval, _ = jax.lax.fori_loop(0, iters, body, state)
    return gbest, gval
