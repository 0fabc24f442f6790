"""Time solve_lm at the bucketed shapes a partial BA actually hits during
the 200/500-image aerial runs (C~16-64, P~2-8k, V=16, 30 LM iterations),
plus the per-call host overhead of to_ba_problem-style dispatch.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from metricsfm_tpu.ba.lm import LMConfig, solve_lm
from metricsfm_tpu.utils import synth
from metricsfm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

for C, P in [(16, 2048), (32, 4096), (64, 8192)]:
    prob = synth.synthetic_ba_problem(n_cams=C, n_pts=P, max_views=6, seed=0)
    # pad views to 16 like to_ba_problem(max_views=16)
    V = 16
    pv = V - prob.track_cam.shape[1]
    prob = prob._replace(
        track_cam=jnp.pad(prob.track_cam, ((0, 0), (0, pv))),
        track_uv=jnp.pad(prob.track_uv, ((0, 0), (0, pv), (0, 0))),
        track_mask=jnp.pad(prob.track_mask, ((0, 0), (0, pv))))
    cfg = LMConfig(max_iterations=30)
    t0 = time.perf_counter()
    out, info = solve_lm(prob, cfg)
    _ = float(info["final_cost"])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        out, info = solve_lm(prob, cfg)
        _ = float(info["final_cost"])
    per = (time.perf_counter() - t0) / n
    print(f"C={C:3d} P={P:5d} V=16: {per*1e3:7.1f} ms/solve "
          f"({int(info['iterations'])} its, first-call {compile_s:.1f}s)",
          flush=True)
