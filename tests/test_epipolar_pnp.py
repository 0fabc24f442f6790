import jax
import jax.numpy as jnp
import numpy as np

from metricsfm_tpu.ops import epipolar, pnp, polynomial, ransac, umeyama
from tests.conftest import make_scene


def two_view_data(rng, noise_px=0.0, n_outliers=0, focal=1000.0):
    scene = make_scene(rng, n_cams=2, n_pts=300, focal=focal, noise_px=noise_px)
    vis = scene["vis"].all(axis=0)
    sel = np.where(vis)[0]
    p1 = scene["obs"][0][sel]
    p2 = scene["obs"][1][sel]
    if n_outliers:
        idx = rng.choice(len(p1), size=n_outliers, replace=False)
        p2[idx] += rng.uniform(50, 300, size=(n_outliers, 2)) * rng.choice([-1, 1], size=(n_outliers, 2))
    return scene, sel, jnp.asarray(p1), jnp.asarray(p2), idx if n_outliers else None


def relative_gt(scene):
    from metricsfm_tpu.ops import projection
    R1, t1 = projection.pose_to_Rt(jnp.asarray(scene["poses"][0]))
    R2, t2 = projection.pose_to_Rt(jnp.asarray(scene["poses"][1]))
    # x2 = R_rel x1 + t_rel with x1 in cam1 frame
    R_rel = R2 @ R1.T
    t_rel = t2 - R_rel @ t1
    return R_rel, t_rel


def test_polynomial_roots():
    # (x-1)(x-2)(x+3)(x-0.5) = known real roots
    r = np.array([1.0, 2.0, -3.0, 0.5])
    coeffs = np.poly(r)
    roots, is_real = polynomial.quartic_real_roots(jnp.asarray(coeffs))
    roots = np.sort(np.asarray(roots)[np.asarray(is_real)])
    np.testing.assert_allclose(roots, np.sort(r), atol=1e-3)
    # complex pair detection: x^4 + 1 has no real roots
    roots, is_real = polynomial.quartic_real_roots(jnp.array([1.0, 0.0, 0.0, 0.0, 1.0]))
    assert not np.asarray(is_real).any()


def test_fundamental_8pt_exact(rng):
    scene, sel, p1, p2, _ = two_view_data(rng)
    F = epipolar.fundamental_8pt(p1, p2)
    d = epipolar.epipolar_distance(F, p1, p2)
    assert float(jnp.mean(d)) < 0.1


def test_fundamental_ransac_outliers(rng, key):
    scene, sel, p1, p2, out_idx = two_view_data(rng, noise_px=0.5, n_outliers=60)
    res = ransac.fundamental_ransac(p1, p2, key, num_hypotheses=256, th_px=3.0)
    assert bool(res["ok"])
    inl = np.asarray(res["inlier_mask"])
    # outliers should be rejected
    assert inl[out_idx].sum() <= 3
    assert inl.sum() > 0.8 * (len(p1) - 60)


def test_essential_decompose(rng):
    scene, sel, p1, p2, _ = two_view_data(rng)
    f = scene["intrs"][0][0]
    n1, n2 = p1 / f, p2 / f
    E = epipolar.essential_8pt(n1, n2)
    R, t, votes = epipolar.decompose_essential(E, n1, n2)
    R_gt, t_gt = relative_gt(scene)
    np.testing.assert_allclose(R, R_gt, atol=1e-3)
    t_dir = t / jnp.linalg.norm(t)
    t_gt_dir = t_gt / jnp.linalg.norm(t_gt)
    np.testing.assert_allclose(jnp.abs(jnp.dot(t_dir, t_gt_dir)), 1.0, atol=1e-3)
    assert int(votes) > 0.9 * len(p1)


def test_focal_recovery_bougnoux(rng):
    scene, sel, p1, p2, _ = two_view_data(rng, focal=1200.0)
    res = epipolar.relative_pose_unknown_focal(p1, p2)
    assert bool(res["valid"])
    np.testing.assert_allclose(float(res["f1"]), 1200.0, rtol=0.05)
    np.testing.assert_allclose(float(res["f2"]), 1200.0, rtol=0.05)
    R_gt, t_gt = relative_gt(scene)
    np.testing.assert_allclose(res["R"], R_gt, atol=0.02)


def test_p3p_grunert(rng):
    scene = make_scene(rng, n_cams=1, n_pts=10)
    f = scene["intrs"][0][0]
    Xw = jnp.asarray(scene["points"][:3])
    obs = jnp.asarray(scene["obs"][0][:3])
    bear = jnp.concatenate([obs / f, jnp.ones((3, 1))], axis=-1)
    bear = bear / jnp.linalg.norm(bear, axis=-1, keepdims=True)
    R, t, valid = pnp.p3p_grunert(Xw, bear)
    from metricsfm_tpu.ops import projection
    R_gt, t_gt = projection.pose_to_Rt(jnp.asarray(scene["poses"][0]))
    errs = [float(jnp.max(jnp.abs(R[i] - R_gt)) + jnp.max(jnp.abs(t[i] - t_gt)))
            for i in range(4) if bool(valid[i])]
    assert len(errs) >= 1
    assert min(errs) < 1e-2


def test_epnp(rng):
    scene = make_scene(rng, n_cams=1, n_pts=100)
    f = scene["intrs"][0][0]
    Xw = jnp.asarray(scene["points"])
    obs = jnp.asarray(scene["obs"][0])
    R, t = pnp.epnp(Xw, obs / f)
    from metricsfm_tpu.ops import projection
    R_gt, t_gt = projection.pose_to_Rt(jnp.asarray(scene["poses"][0]))
    np.testing.assert_allclose(R, R_gt, atol=1e-3)
    np.testing.assert_allclose(t, t_gt, atol=1e-2)


def test_pnp_ransac_with_outliers(rng, key):
    scene = make_scene(rng, n_cams=1, n_pts=200, noise_px=0.5)
    f = float(scene["intrs"][0][0])
    Xw = np.array(scene["points"])
    obs = np.array(scene["obs"][0])
    out = rng.choice(200, size=40, replace=False)
    obs[out] += rng.uniform(80, 300, size=(40, 2))
    res = pnp.pnp_ransac(jnp.asarray(Xw), jnp.asarray(obs), f, key,
                         num_hypotheses=256, th_inlier_px=10.0)
    from metricsfm_tpu.ops import projection
    R_gt, t_gt = projection.pose_to_Rt(jnp.asarray(scene["poses"][0]))
    assert int(res["n_inliers"]) > 120
    np.testing.assert_allclose(res["R"], R_gt, atol=0.02)
    np.testing.assert_allclose(res["t"], t_gt, atol=0.1)
    assert float(res["avg_err"]) < 3.0


def test_pnp_unknown_focal(rng, key):
    scene = make_scene(rng, n_cams=1, n_pts=200, noise_px=0.3, focal=1500.0)
    Xw = jnp.asarray(scene["points"])
    obs = jnp.asarray(scene["obs"][0])
    res = pnp.pnp_ransac_unknown_focal(Xw, obs, 1000.0, key,
                                       num_hypotheses=64, num_focal_samples=96)
    assert abs(float(res["f"]) - 1500.0) / 1500.0 < 0.1
    assert int(res["n_inliers"]) > 120


def test_umeyama_similarity(rng):
    src = jnp.asarray(rng.normal(size=(50, 3)))
    from metricsfm_tpu.ops import lie
    R_gt = lie.angle_axis_to_matrix(jnp.array([0.3, -0.5, 0.2]))
    s_gt, t_gt = 2.3, jnp.array([1.0, -2.0, 0.5])
    dst = s_gt * src @ R_gt.T + t_gt
    s, R, t = umeyama.similarity_align(src, dst)
    np.testing.assert_allclose(float(s), s_gt, rtol=1e-5)
    np.testing.assert_allclose(R, R_gt, atol=1e-5)
    np.testing.assert_allclose(t, t_gt, atol=1e-4)
    # weighted: corrupt half the points with weight 0
    dst2 = np.array(dst)
    dst2[25:] += 100.0
    w = jnp.asarray(np.r_[np.ones(25), np.zeros(25)])
    s2, R2, t2 = umeyama.similarity_align(src, jnp.asarray(dst2), weights=w)
    np.testing.assert_allclose(R2, R_gt, atol=1e-5)
