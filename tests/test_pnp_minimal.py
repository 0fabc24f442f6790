"""P4Pf / P3Pf / oriented-DLT minimal solvers (ref orientation/absolute_pose_via_*)."""
import jax.numpy as jnp
import numpy as np

from metricsfm_tpu.ops import pnp
from metricsfm_tpu.ops.lie import angle_axis_to_matrix


def _pose_scene(rng, n, f=1200.0):
    aa = rng.standard_normal(3) * 0.3
    R = np.asarray(angle_axis_to_matrix(jnp.asarray(aa)))
    t = np.array([0.3, -0.2, 0.5]) + rng.standard_normal(3) * 0.1
    Xw = rng.standard_normal((n, 3)) * 2 + np.array([0, 0, 8.0])
    Xw = Xw @ R + (-R.T @ t)  # keep points in front: world points seen from cam
    Xw = rng.standard_normal((n, 3)) * 2
    Xw[:, 2] += 8.0
    # place camera at origin-ish looking down +z: Xc = R Xw + t must have z>0
    Xc = Xw @ R.T + t
    uv = f * Xc[:, :2] / Xc[:, 2:]
    return R, t, Xw, uv


def test_p4pf_recovers_pose_and_focal():
    rng = np.random.default_rng(0)
    f_true = 1200.0
    hits = 0
    for _ in range(8):
        R, t, Xw, uv = _pose_scene(rng, 4, f=f_true)
        out = pnp.p4pf(jnp.asarray(Xw, jnp.float32), jnp.asarray(uv, jnp.float32),
                       f_hyp=1000.0)
        f_est = float(out["f"])
        R_est = np.asarray(out["R"])
        if abs(f_est - f_true) / f_true < 0.05 and np.linalg.norm(R_est - R) < 0.1:
            hits += 1
    assert hits >= 6


def test_p3pf_candidate_set_contains_truth():
    rng = np.random.default_rng(1)
    f_true = 900.0
    R, t, Xw, uv = _pose_scene(rng, 3, f=f_true)
    out = pnp.p3pf(jnp.asarray(Xw, jnp.float32), jnp.asarray(uv, jnp.float32),
                   f_hyp=1000.0, num_focal_samples=256)
    Rs = np.asarray(out["R"]).reshape(-1, 3, 3)
    valid = np.asarray(out["valid"]).reshape(-1)
    errs = [np.linalg.norm(Rs[i] - R) for i in range(len(Rs)) if valid[i]]
    assert min(errs) < 0.05


def test_dlt_oriented_known_focal():
    rng = np.random.default_rng(2)
    f = 1000.0
    R, t, Xw, uv = _pose_scene(rng, 12, f=f)
    out = pnp.dlt_oriented(jnp.asarray(R, jnp.float32),
                           jnp.asarray(Xw, jnp.float32),
                           jnp.asarray(uv, jnp.float32), f=f)
    np.testing.assert_allclose(np.asarray(out["t"]), t, atol=1e-3)


def test_dlt_oriented_unknown_focal():
    rng = np.random.default_rng(3)
    f = 1400.0
    R, t, Xw, uv = _pose_scene(rng, 12, f=f)
    out = pnp.dlt_oriented(jnp.asarray(R, jnp.float32),
                           jnp.asarray(Xw, jnp.float32),
                           jnp.asarray(uv, jnp.float32))
    assert abs(float(out["f"]) - f) / f < 0.01
    np.testing.assert_allclose(np.asarray(out["t"]), t, atol=5e-2)


def test_epnp_robust_rejects_gross_outliers():
    """EPNPRobust semantics (absolute_pose_via_epnp.cc:45-99): subset
    consensus must recover the pose when 10% of correspondences are gross
    outliers that wreck a plain all-point EPnP fit."""
    import jax
    rng = np.random.default_rng(3)
    f = 1000.0
    R, t, Xw, uv = _pose_scene(rng, 60, f=f)
    uv_bad = uv.copy()
    bad = rng.choice(60, size=6, replace=False)
    uv_bad[bad] += rng.uniform(300, 600, size=(6, 2)) * np.sign(
        rng.standard_normal((6, 2)))

    # plain EPnP on everything is dragged off by the outliers
    R0, t0 = pnp.epnp(jnp.asarray(Xw, jnp.float32),
                      jnp.asarray(uv_bad / f, jnp.float32))
    err_plain = float(np.asarray(pnp.reproj_errors_px(
        R0, t0, f, jnp.asarray(Xw, jnp.float32),
        jnp.asarray(uv, jnp.float32))).mean())

    out = pnp.epnp_robust(jnp.asarray(Xw, jnp.float32),
                          jnp.asarray(uv_bad, jnp.float32), f,
                          jax.random.PRNGKey(0))
    R_est = np.asarray(out["R"])
    inl = np.asarray(out["inlier_mask"])
    assert np.linalg.norm(R_est - R) < 0.02
    assert float(out["avg_err"]) < 1.0 < err_plain
    # the gross outliers are among the dropped points
    assert not inl[bad].any()
