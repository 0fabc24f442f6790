import jax
import jax.numpy as jnp
import numpy as np

from metricsfm_tpu.ba import BAProblem, LMConfig, solve_lm
from metricsfm_tpu.ba import problem as ba_problem
from metricsfm_tpu.ba.lm import problem_cost
from tests.conftest import make_scene


def scene_to_problem(scene, V=None, noise=None, rng=None, shared_model=False,
                     weight=None):
    """Build a BAProblem from a synthetic scene where every camera sees every point."""
    C = scene["poses"].shape[0]
    P = scene["points"].shape[0]
    V = V or C
    track_cam = np.tile(np.arange(C)[None, :], (P, 1))[:, :V]
    track_uv = np.transpose(scene["obs"], (1, 0, 2))[:, :V]
    track_mask = np.transpose(scene["vis"], (1, 0))[:, :V]
    if shared_model:
        cam_model = np.zeros(C, np.int32)
        intrs = scene["intrs"][:1]
    else:
        cam_model = np.arange(C, dtype=np.int32)
        intrs = scene["intrs"]
    return ba_problem.build_problem(
        scene["poses"], intrs, cam_model, scene["points"],
        track_cam, track_uv, track_mask, track_weight=weight)


def perturb(problem, rng, sig_pose=0.02, sig_pt=0.05, sig_f=0.0):
    poses = problem.poses + sig_pose * jnp.asarray(rng.normal(size=problem.poses.shape))
    points = problem.points + sig_pt * jnp.asarray(rng.normal(size=problem.points.shape))
    intrs = problem.intrs
    if sig_f:
        intrs = intrs.at[:, 0].mul(1.0 + sig_f * jnp.asarray(rng.normal(size=intrs.shape[0])))
    return problem._replace(poses=poses, points=points, intrs=intrs)


def test_zero_residual_at_ground_truth(scene):
    prob = scene_to_problem(scene)
    cost = problem_cost(prob, 1.0)
    assert float(cost) < 1e-4


def test_lm_converges_points_only(rng):
    scene = make_scene(rng, n_cams=4, n_pts=60)
    prob = scene_to_problem(scene)
    # freeze cameras+intrinsics, perturb points: pure triangulation refinement
    prob = prob._replace(pose_mut=jnp.zeros_like(prob.pose_mut),
                         intr_mut=jnp.zeros_like(prob.intr_mut))
    bad = perturb(prob, rng, sig_pose=0.0, sig_pt=0.2)
    out, info = solve_lm(bad, LMConfig(max_iterations=30))
    assert float(info["final_cost"]) < 1e-3
    np.testing.assert_allclose(out.points, prob.points, atol=1e-2)


def test_lm_converges_full(rng):
    scene = make_scene(rng, n_cams=5, n_pts=80)
    prob = scene_to_problem(scene)
    # gauge fixing: freeze first camera
    pose_mut = jnp.ones((5,)).at[0].set(0.0)
    prob = prob._replace(pose_mut=pose_mut,
                         intr_mut=jnp.zeros_like(prob.intr_mut))
    bad = perturb(prob, rng, sig_pose=0.01, sig_pt=0.05)
    cost_before = float(problem_cost(bad, 1.0))
    out, info = solve_lm(bad, LMConfig(max_iterations=50))
    assert float(info["final_cost"]) < 1e-2 * cost_before
    assert float(info["rms_px"]) < 0.1


def test_lm_with_intrinsics(rng):
    scene = make_scene(rng, n_cams=6, n_pts=150)
    prob = scene_to_problem(scene, shared_model=True)
    pose_mut = jnp.ones((6,)).at[0].set(0.0)
    prob = prob._replace(pose_mut=pose_mut)
    bad = perturb(prob, rng, sig_pose=0.005, sig_pt=0.03, sig_f=0.02)
    out, info = solve_lm(bad, LMConfig(max_iterations=60))
    # focal recovered within 0.5%
    np.testing.assert_allclose(float(out.intrs[0, 0]),
                               float(prob.intrs[0, 0]), rtol=5e-3)
    assert float(info["rms_px"]) < 0.2


def test_lm_huber_outliers(rng):
    scene = make_scene(rng, n_cams=5, n_pts=100, noise_px=0.2)
    prob = scene_to_problem(scene)
    # corrupt 5% of observations grossly
    uv = np.array(prob.track_uv)
    flat = uv.reshape(-1, 2)
    idx = rng.choice(len(flat), size=len(flat) // 20, replace=False)
    flat[idx] += 200.0
    prob = prob._replace(track_uv=jnp.asarray(uv))
    pose_mut = jnp.ones((5,)).at[0].set(0.0)
    prob = prob._replace(pose_mut=pose_mut, intr_mut=jnp.zeros_like(prob.intr_mut))
    bad = perturb(prob, rng, sig_pose=0.005, sig_pt=0.02)
    out, info = solve_lm(bad, LMConfig(max_iterations=40))
    # inlier reprojection should still be sub-pixel despite outliers
    from metricsfm_tpu.ba.lm import compute_residuals
    r = np.asarray(compute_residuals(out))
    err = np.linalg.norm(r, axis=-1)[np.asarray(out.track_mask)]
    assert np.median(err) < 1.0


def test_masked_views(rng):
    scene = make_scene(rng, n_cams=4, n_pts=50)
    prob = scene_to_problem(scene)
    # knock out some views; solver must ignore them
    mask = np.array(prob.track_mask)
    mask[:, 3] = False
    uv = np.array(prob.track_uv)
    uv[:, 3] = 1e6  # poison masked slots
    prob = prob._replace(track_mask=jnp.asarray(mask), track_uv=jnp.asarray(uv),
                         pose_mut=jnp.ones((4,)).at[0].set(0.0),
                         intr_mut=jnp.zeros_like(prob.intr_mut))
    bad = perturb(prob, rng, sig_pose=0.005, sig_pt=0.02)
    out, info = solve_lm(bad, LMConfig(max_iterations=30))
    assert float(info["rms_px"]) < 0.1
    assert np.all(np.isfinite(np.asarray(out.poses)))


def test_normalize_denormalize(rng):
    scene = make_scene(rng, n_cams=4, n_pts=50)
    prob = scene_to_problem(scene)
    normed, tf = ba_problem.normalize_problem(prob)
    # projections invariant
    c0 = float(problem_cost(prob, 1.0))
    c1 = float(problem_cost(normed, 1.0))
    assert abs(c0 - c1) < 1e-2
    back = ba_problem.denormalize_problem(normed, tf)
    np.testing.assert_allclose(back.points, prob.points, atol=1e-3)
    np.testing.assert_allclose(back.poses, prob.poses, atol=1e-3)


def test_seed_recovery_after_perturb(rng, key):
    """The reference's seed recipe: normalize, perturb, full BA (optimizer.cc:50-60)."""
    scene = make_scene(rng, n_cams=3, n_pts=60)
    prob = scene_to_problem(scene)
    normed, tf = ba_problem.normalize_problem(prob)
    pert = ba_problem.perturb_problem(normed, key, 0.02, 0.1, 0.1)
    pose_mut = jnp.ones((3,)).at[0].set(0.0)
    pert = pert._replace(pose_mut=pose_mut, intr_mut=jnp.zeros_like(pert.intr_mut))
    out, info = solve_lm(pert, LMConfig(max_iterations=80))
    assert float(info["rms_px"]) < 0.5


def test_gps_triple_constraints(scene, rng):
    """GPS relative angle/distance-ratio residuals over camera triples
    (ref gps_error_pose_raletive_angle.h / gps_error_pose_raletive_dis.h)."""
    from metricsfm_tpu.ba.lm import gps_triple_residuals
    from metricsfm_tpu.ops import projection

    prob = scene_to_problem(scene)
    C = prob.n_cameras
    centers = np.asarray(jax.vmap(projection.camera_center)(prob.poses))
    trip = np.stack([np.arange(C - 2), np.arange(1, C - 1),
                     np.arange(2, C)], axis=1)
    tw = np.ones((len(trip), 2), np.float32)

    # gps = true camera centers -> residuals vanish at ground truth
    p0 = prob._replace(gps_pos=jnp.asarray(centers, jnp.float32),
                       gps_triple=jnp.asarray(trip, jnp.int32),
                       gps_triple_weight=jnp.asarray(tw))
    r0 = np.asarray(gps_triple_residuals(p0))
    np.testing.assert_allclose(r0, 0.0, atol=1e-4)

    # perturbed poses -> nonzero residuals, and LM with the constraints
    # converges back to lower cost than without them
    p_bad = perturb(p0, rng, sig_pose=0.03, sig_pt=0.0)
    r_bad = np.asarray(gps_triple_residuals(p_bad))
    assert np.abs(r_bad).max() > 1e-4

    cfg = LMConfig(max_iterations=30)
    out, info = solve_lm(p_bad, cfg)
    r_fin = np.asarray(gps_triple_residuals(out))
    assert np.abs(r_fin).max() < np.abs(r_bad).max() * 0.5
    assert float(info["final_cost"]) < float(info["initial_cost"])
