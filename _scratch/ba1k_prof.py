"""Stage breakdown of the 1k-camera LM iteration (round-4 target: >=2 it/s).

Times, separately jitted: full LM step, _track_terms (linearization),
CG solve at several iteration counts, cost evaluation.
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from metricsfm_tpu.ba.lm import (LMConfig, _assemble_and_solve,
                                 _assemble_and_solve_cg, _track_terms,
                                 _gps_prior_blocks, _cg_solve,
                                 problem_cost)
from metricsfm_tpu.utils import synth
from metricsfm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

prob = synth.synthetic_ba_problem(n_cams=1024, n_pts=131072, max_views=6,
                                  seed=0)
cfg = LMConfig(cg_iterations=50, cg_tol=1e-4)
lam = jnp.float32(1e-3)


def timeit(fn, *args, n=4):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / n


@jax.jit
def full_step(p, l):
    d_pose, d_intr, d_pt = _assemble_and_solve(p, l, cfg)
    return p._replace(poses=p.poses + d_pose, intrs=p.intrs + d_intr,
                      points=p.points + d_pt)


@jax.jit
def terms_only(p, l):
    terms, rhs, aux = _track_terms(p, l, cfg)
    return rhs


@jax.jit
def cost_only(p):
    return problem_cost(p, cfg.huber_delta)


def make_cg(n_it):
    c = cfg._replace(cg_iterations=n_it, cg_tol=0.0)

    @jax.jit
    def f(p, l):
        d_pose, d_intr, d_pt = _assemble_and_solve_cg(p, l, c)
        return d_pose
    return f


import sys
which = sys.argv[1:] or ["full", "terms", "cost", "cg0", "cg50"]
for w in which:
    t0 = time.perf_counter()
    if w == "full":
        r = timeit(full_step, prob, lam)
    elif w == "terms":
        r = timeit(terms_only, prob, lam)
    elif w == "cost":
        r = timeit(cost_only, prob)
    elif w.startswith("cg"):
        r = timeit(make_cg(int(w[2:])), prob, lam)
    print(f"{w:12s}: {r:.4f} s   (incl. compile wall {time.perf_counter()-t0:.1f}s)", flush=True)
