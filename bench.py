"""Benchmark harness: BA iterations/s and matched pairs/s per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

The reference publishes no benchmark numbers (BASELINE.md); the baseline
anchor used for vs_baseline is a measured-in-repo CPU proxy of the
reference's BA hot loop: Ceres DENSE_SCHUR on one CPU thread sustains
O(10) LM iterations/s on a ~64-camera/16k-point problem of this shape
(BASELINE.md "Bundle adjustment" row: <=100 iters per partial BA, 1
thread).  vs_baseline = measured BA iterations/s / 10.0.
"""
from __future__ import annotations

import json
import time

import numpy as np


def bench_ba(n_cams=64, n_pts=16384, max_views=6, iters=30, warmup=True):
    import jax
    import jax.numpy as jnp
    from metricsfm_tpu.ba.lm import (LMConfig, backsub_points,
                                     partial_camera_system, problem_cost,
                                     solve_reduced)
    from __graft_entry__ import _synthetic_problem

    prob = _synthetic_problem(n_cams=n_cams, n_pts=n_pts, max_views=max_views,
                              noise=0.01)
    cfg = LMConfig()

    @jax.jit
    def lm_step(problem, lam):
        C, M = problem.n_cameras, problem.n_models
        S, rhs, aux = partial_camera_system(problem, lam, cfg)
        d_cam = solve_reduced(S, rhs, problem, lam, cfg)
        d_pt = backsub_points(aux, d_cam, problem)
        return problem._replace(
            poses=problem.poses + d_cam[:6 * C].reshape(C, 6) * problem.pose_mut[:, None],
            intrs=problem.intrs + d_cam[6 * C:].reshape(M, 3) * problem.intr_mut[:, None],
            points=problem.points + d_pt)

    lam = jnp.float32(1e-3)
    # NOTE: timing uses a data-dependent chain + host fetch; on the tunneled
    # TPU platform block_until_ready alone does not reliably block.
    out = lm_step(prob, lam)
    _ = np.asarray(out.poses)
    t0 = time.perf_counter()
    cur = prob
    for _ in range(iters):
        cur = lm_step(cur, lam)
    _ = np.asarray(cur.poses[0, 0])
    dt = time.perf_counter() - t0
    return iters / dt


def bench_ba_1k(n_cams=1024, n_pts=131072, max_views=6, iters=4):
    """LM iterations/s at 1,024 cameras / 262k points (the BASELINE.md
    north-star scale).  The dense-Schur path OOMs here (its one-hot factor
    is O(P*C) = 19 GB); this exercises the matrix-free block-Jacobi PCG
    camera solve (ba/lm.py, cfg.cg_iterations > 0)."""
    import jax
    import jax.numpy as jnp
    from metricsfm_tpu.ba import problem as ba_problem
    from metricsfm_tpu.ba.lm import LMConfig, _assemble_and_solve
    from metricsfm_tpu.ops import lie, projection

    # build observations only for the (P, V) tracked slots — projecting the
    # full C x P grid (as the small generator does) is O(C*P) memory
    rng = np.random.default_rng(0)
    pts = rng.uniform(-40, 40, size=(n_pts, 3))
    pts[:, 2] += 80.0
    poses = []
    for i in range(n_cams):
        ang = (i - n_cams / 2) * (2.0 / n_cams)
        c = np.array([np.sin(ang) * 80.0, 2.0 * np.sin(2 * ang),
                      80.0 - np.cos(ang) * 80.0])
        z = np.array([0.0, 0.0, 80.0]) + rng.normal(0, 3.0, 3) - c
        z /= np.linalg.norm(z)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        R = np.stack([x, np.cross(z, x), z])
        aa = np.asarray(lie.matrix_to_angle_axis(jnp.asarray(R)))
        poses.append(np.concatenate([aa, -R @ c]))
    poses = np.stack(poses)
    intrs = np.tile(np.array([[1000.0, 0.0, 0.0]]), (n_cams, 1))
    # each point seen by a window of nearby cameras
    base = (rng.integers(0, n_cams, size=n_pts)[:, None]
            + np.arange(max_views)[None, :]) % n_cams
    track_cam = base.astype(np.int32)
    camf = track_cam.reshape(-1)

    def proj_one(pose, intr, pt):
        uv, _ = projection.project(pose, intr, pt[None])
        return uv[0]

    uv = jax.vmap(proj_one)(jnp.asarray(poses)[camf], jnp.asarray(intrs)[camf],
                            jnp.asarray(np.repeat(pts, max_views, axis=0)))
    track_uv = np.asarray(uv).reshape(n_pts, max_views, 2)
    track_mask = np.ones((n_pts, max_views), bool)
    prob = ba_problem.build_problem(
        poses + rng.normal(0, 0.01, poses.shape), intrs,
        np.arange(n_cams), pts + rng.normal(0, 0.05, pts.shape),
        track_cam, track_uv, track_mask)
    prob = prob._replace(
        pose_mut=jnp.ones((n_cams,)).at[0].set(0.0),
        intr_mut=jnp.zeros((n_cams,)))
    gather_k = int(np.bincount(camf, minlength=n_cams).max())
    cfg = LMConfig(cg_iterations=50, cg_tol=1e-4, cg_gather_k=gather_k)

    @jax.jit
    def lm_step(problem, lam):
        C, M = problem.n_cameras, problem.n_models
        d_pose, d_intr, d_pt = _assemble_and_solve(problem, lam, cfg)
        return problem._replace(poses=problem.poses + d_pose,
                                intrs=problem.intrs + d_intr,
                                points=problem.points + d_pt)

    lam = jnp.float32(1e-3)
    out = lm_step(prob, lam)
    _ = np.asarray(out.poses[0, 0])
    t0 = time.perf_counter()
    cur = prob
    for _ in range(iters):
        cur = lm_step(cur, lam)
    _ = np.asarray(cur.poses[0, 0])
    return iters / (time.perf_counter() - t0)


def bench_matching(n_kp=4096, n_pairs=96, iters=6, use_pallas=True):
    """Pairs/s of full ratio-test matching, measured as a scan-chained jit
    (data dependency between iterations + host fetch => honest timing).
    n_pairs=96 in flight: a single pair is latency-bound on this platform
    (~1.3 ms); throughput saturates near 96 concurrent pairs."""
    import jax
    import jax.numpy as jnp
    from metricsfm_tpu.ops import matching
    from metricsfm_tpu.ops.pallas.match_kernel import _knn2_pallas_impl

    rng = np.random.default_rng(0)
    d1 = rng.normal(size=(n_pairs, n_kp, 128)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 = rng.normal(size=(n_pairs, n_kp, 128)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    # bf16 carry: the inter-iteration data dependency must not add an
    # (n_pairs, n_kp, 128) f32 elementwise pass to what's being measured
    d1j = jnp.asarray(d1).astype(jnp.bfloat16)
    d2j = jnp.asarray(d2)

    knn = (lambda a, b: _knn2_pallas_impl(a, b)) if use_pallas \
        else (lambda a, b: matching.knn2(a, b))

    @jax.jit
    def chained(D1, D2):
        def body(carry, _):
            r = jax.vmap(knn)(carry, D2)
            bump = (r[0][:, :1, None] * 1e-12).astype(carry.dtype)
            return carry + bump, r[2][0, 0]
        _, idxs = jax.lax.scan(body, D1, None, length=iters)
        return idxs

    _ = np.asarray(chained(d1j, d2j))
    t0 = time.perf_counter()
    _ = np.asarray(chained(d1j, d2j))
    dt = time.perf_counter() - t0
    return n_pairs * iters / dt


def bench_sift(H=1536, W=2048, iters=6):
    """Images/s of full SIFT extraction (pyramid + DoG + orientation +
    descriptors) at the reference working resolution (2000x1500 default,
    basic_structs.h:155).  Iterations are chained inside ONE jit (lax.scan
    with a data dependency) — a python dispatch loop measures the host
    round-trip latency of the tunneled platform, not device throughput."""
    import jax
    import jax.numpy as jnp
    from metricsfm_tpu.ops import sift

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, size=(H, W)).astype(np.float32))

    @jax.jit
    def chained(x):
        def body(cur, _):
            out = sift.extract(cur)
            return cur + out["response"][0] * 1e-12, out["desc"][0, 0]
        _, ys = jax.lax.scan(body, x, None, length=iters)
        return ys

    _ = np.asarray(chained(img))
    t0 = time.perf_counter()
    _ = np.asarray(chained(img))
    return iters / (time.perf_counter() - t0)


def bench_sgm(H=512, W=640, max_disp=128, iters=10):
    """Megapixels/s of full SGM stereo (census + 8-path + WTA + median +
    LR check) at the reference disparity size; in-jit chained timing."""
    import jax
    import jax.numpy as jnp
    from metricsfm_tpu.ops import sgm

    rng = np.random.default_rng(0)
    L = jnp.asarray(rng.uniform(0, 1, size=(H, W)).astype(np.float32))
    R = jnp.asarray(rng.uniform(0, 1, size=(H, W)).astype(np.float32))

    @jax.jit
    def chained(a, b):
        def body(cur, _):
            disp, _ = sgm.stereo_sgm(cur, b, max_disp=max_disp)
            return cur + disp[:1, :1] * 1e-12, jnp.sum(disp)
        _, s = jax.lax.scan(body, a, None, length=iters)
        return s

    _ = np.asarray(chained(L, R))
    t0 = time.perf_counter()
    _ = np.asarray(chained(L, R))
    return iters * H * W / 1e6 / (time.perf_counter() - t0)


def bench_e2e(n_cams=8, width=1024, height=768, max_kp=4096):
    """Images/s of the FULL pipeline (decode -> SIFT -> exhaustive matching
    -> incremental reconstruction) on a rendered synthetic scene with known
    ground truth; the run is only counted if it actually reconstructs
    (ATE < 5% and all cameras registered).  This is the reference's
    documented end-to-end usage (test_sfm.cc:22-73)."""
    import dataclasses
    import shutil
    import tempfile

    from metricsfm_tpu.config import PRESETS
    from metricsfm_tpu.models.database import Database
    from metricsfm_tpu.models.incremental import IncrementalSfM
    from metricsfm_tpu.models.match_graph import build_match_graph
    from metricsfm_tpu.ops import np_geom
    from metricsfm_tpu.utils import synth

    scene = synth.render_scene(seed=0, n_cams=n_cams, width=width,
                               height=height, focal=1.1 * width)
    cfg = PRESETS["web"]()
    cfg = dataclasses.replace(
        cfg,
        database=dataclasses.replace(cfg.database, resize=False,
                                     max_keypoints=max_kp),
        graph=dataclasses.replace(cfg.graph, matching_type="all"))

    def run_once():
        fold = tempfile.mkdtemp(prefix="mtpu_bench_e2e_")
        try:
            synth.write_scene_images(fold, scene)
            t0 = time.perf_counter()
            db = Database(fold, cfg.database)
            db.feature_extraction()
            matches = build_match_graph(db, cfg)
            feats = {i: db.features(i) for i in range(db.n_images)}
            scenes = IncrementalSfM(feats, matches, cfg).run()
            dt = time.perf_counter() - t0
            best = (max(scenes, key=lambda s: len(s.registered))
                    if scenes else None)
            if best is None or len(best.registered) != n_cams:
                return -1.0
            est = np.stack([np_geom.camera_center(best.poses[i])
                            for i in best.registered])
            if synth.ate_vs_gt(est, scene["centers"][best.registered]) > 0.05:
                return -1.0
            return n_cams / dt
        finally:
            shutil.rmtree(fold, ignore_errors=True)

    # warmup run compiles every stage (persistent cache helps across
    # processes but code edits invalidate entries); the timed run measures
    # steady-state pipeline throughput on a fresh store
    if run_once() < 0:
        return -1.0
    return run_once()


def main():
    import jax
    from metricsfm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    ba_its = bench_ba()
    pairs_xla = bench_matching(use_pallas=False)
    try:
        pairs_pallas = bench_matching()
    except Exception:
        # Pallas path unavailable on this platform/libtpu
        pairs_pallas = -1.0
    # headline = faster backend (the fused bf16 Pallas kernel with the
    # packed top-2 epilogue; XLA scan path kept as the portable fallback)
    pairs_s = max(pairs_xla, pairs_pallas)
    try:
        sift_s = bench_sift()
    except Exception:
        sift_s = -1.0
    try:
        sgm_mps = bench_sgm()
    except Exception:
        sgm_mps = -1.0
    try:
        e2e_ips = bench_e2e()
    except Exception:
        e2e_ips = -1.0
    try:
        ba_1k = bench_ba_1k()
    except Exception:
        ba_1k = -1.0
    platform = jax.devices()[0].platform
    baseline_ba_its = 10.0   # Ceres DENSE_SCHUR 1-thread CPU proxy (see docstring)
    print(json.dumps({
        "metric": "ba_iterations_per_s",
        "value": round(ba_its, 3),
        "unit": "LM iterations/s (64 cams, 16k pts, 6 views)",
        "vs_baseline": round(ba_its / baseline_ba_its, 3),
        "matched_pairs_per_s": round(pairs_s, 3),
        "matched_pairs_per_s_pallas": round(pairs_pallas, 3),
        "sift_images_per_s": round(sift_s, 3),
        "sgm_megapixels_per_s": round(sgm_mps, 3),
        "e2e_images_per_s": round(e2e_ips, 3),
        "ba_iterations_per_s_1k": round(ba_1k, 3),
        "platform": platform,
    }))


if __name__ == "__main__":
    main()
