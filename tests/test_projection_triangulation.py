import jax
import jax.numpy as jnp
import numpy as np

from metricsfm_tpu.ops import projection, triangulation
from tests.conftest import make_scene


def test_project_reproject_zero_error(scene):
    poses = jnp.asarray(scene["poses"])
    intrs = jnp.asarray(scene["intrs"])
    pts = jnp.asarray(scene["points"])
    mse = projection.reprojection_mse(poses[0], intrs[0], pts, jnp.asarray(scene["obs"][0]))
    assert float(mse) < 1e-6


def test_camera_center_inverse(scene):
    poses = jnp.asarray(scene["poses"])
    c = projection.camera_center(poses)
    # transform center to camera frame -> origin
    p = jax.vmap(projection.transform_to_camera)(poses, c)
    np.testing.assert_allclose(p, 0.0, atol=1e-5)


def test_distortion_roundtrip(rng):
    xn = jnp.asarray(rng.uniform(-0.4, 0.4, size=(64, 2)))
    k1 = jnp.full((64,), -0.1)
    k2 = jnp.full((64,), 0.02)
    xd = projection.distort_radial(xn, k1, k2)
    xu = projection.undistort_radial(xd, k1, k2, iters=20)
    np.testing.assert_allclose(xu, xn, atol=1e-5)


def test_triangulate_dlt_and_midpoint(scene):
    poses = jnp.asarray(scene["poses"])
    intrs = jnp.asarray(scene["intrs"])
    obs = jnp.asarray(scene["obs"])
    vis = scene["vis"]
    # take first 20 points seen by all cameras
    sel = np.where(vis.all(axis=0))[0][:20]
    for j in sel[:5]:
        o = obs[:, j, :]
        mask = jnp.ones((poses.shape[0],))
        xyz_d = triangulation.triangulate_dlt(poses, intrs, o, mask)
        xyz_m = triangulation.triangulate_midpoint(poses, intrs, o, mask)
        np.testing.assert_allclose(xyz_d, scene["points"][j], atol=1e-3)
        np.testing.assert_allclose(xyz_m, scene["points"][j], atol=1e-3)


def test_triangulate_masked_views(scene):
    poses = jnp.asarray(scene["poses"])
    intrs = jnp.asarray(scene["intrs"])
    obs = jnp.asarray(scene["obs"])
    j = int(np.where(scene["vis"].all(axis=0))[0][0])
    o = obs[:, j, :]
    # corrupt the last observation but mask it out
    o = o.at[-1].set(jnp.array([9999.0, -9999.0]))
    mask = jnp.ones((poses.shape[0],)).at[-1].set(0.0)
    xyz = triangulation.triangulate_midpoint(poses, intrs, o, mask)
    np.testing.assert_allclose(xyz, scene["points"][j], atol=1e-3)
    xyz_d = triangulation.triangulate_dlt(poses, intrs, o, mask)
    np.testing.assert_allclose(xyz_d, scene["points"][j], atol=1e-3)


def test_triangulate_and_gate(scene):
    poses = jnp.asarray(scene["poses"])
    intrs = jnp.asarray(scene["intrs"])
    obs = jnp.asarray(scene["obs"])
    j = int(np.where(scene["vis"].all(axis=0))[0][0])
    mask = jnp.ones((poses.shape[0],))
    xyz, ok, mse = triangulation.triangulate_and_gate(
        poses, intrs, obs[:, j, :], mask, 3.0, 1.0, "midpoint")
    assert bool(ok)
    assert float(mse) < 1e-6
    # insufficient parallax: use only one camera twice -> angle gate fails
    poses2 = jnp.stack([poses[0], poses[0]])
    intrs2 = jnp.stack([intrs[0], intrs[0]])
    obs2 = jnp.stack([obs[0, j], obs[0, j]])
    mask2 = jnp.ones((2,))
    _, ok2, _ = triangulation.triangulate_and_gate(
        poses2, intrs2, obs2, mask2, 3.0, 1.0, "midpoint")
    assert not bool(ok2)


def test_batched_tracks(scene):
    poses = jnp.asarray(scene["poses"])
    intrs = jnp.asarray(scene["intrs"])
    obs = jnp.asarray(scene["obs"])
    sel = np.where(scene["vis"].all(axis=0))[0][:32]
    P = len(sel)
    V = poses.shape[0]
    tp = jnp.broadcast_to(poses, (P, V, 6))
    ti = jnp.broadcast_to(intrs, (P, V, 3))
    to = jnp.transpose(obs[:, sel, :], (1, 0, 2))
    tm = jnp.ones((P, V))
    xyz, ok, mse = triangulation.triangulate_tracks(tp, ti, to, tm, 3.0, 1.0, "midpoint")
    assert np.asarray(ok).all()
    np.testing.assert_allclose(xyz, scene["points"][sel], atol=1e-3)


def test_similarity_pose_update(scene):
    import jax.numpy as jnp
    from metricsfm_tpu.ops import lie
    poses = jnp.asarray(scene["poses"])
    intrs = jnp.asarray(scene["intrs"])
    pts = jnp.asarray(scene["points"])
    s = jnp.asarray(2.5)
    R_s = lie.angle_axis_to_matrix(jnp.array([0.1, -0.2, 0.3]))
    t_s = jnp.array([1.0, -2.0, 3.0])
    pts_new = s * pts @ R_s.T + t_s
    new_pose = projection.apply_similarity_to_pose(poses[0], s, R_s, t_s)
    uv_old, _ = projection.project(poses[0], intrs[0], pts)
    uv_new, _ = projection.project(new_pose, intrs[0], pts_new)
    np.testing.assert_allclose(uv_old, uv_new, atol=1e-3)
