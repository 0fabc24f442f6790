import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metricsfm_tpu.ops import lie


def random_rotations(rng, n=32):
    """Random rotations via QR of gaussians."""
    A = rng.normal(size=(n, 3, 3))
    Q, R = np.linalg.qr(A)
    Q = Q * np.sign(np.diagonal(R, axis1=-2, axis2=-1))[:, None, :]
    det = np.linalg.det(Q)
    Q[det < 0, :, 0] *= -1
    return Q


def test_angle_axis_roundtrip(rng):
    R = jnp.asarray(random_rotations(rng))
    aa = lie.matrix_to_angle_axis(R)
    R2 = lie.angle_axis_to_matrix(aa)
    np.testing.assert_allclose(R, R2, atol=1e-5)


def test_quaternion_roundtrip(rng):
    R = jnp.asarray(random_rotations(rng))
    q = lie.matrix_to_quaternion(R)
    R2 = lie.quaternion_to_matrix(q)
    np.testing.assert_allclose(R, R2, atol=1e-5)
    aa = lie.quaternion_to_angle_axis(q)
    q2 = lie.angle_axis_to_quaternion(aa)
    # same rotation up to sign
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_small_angle_stability():
    aa = jnp.array([[0.0, 0.0, 0.0], [1e-9, -1e-9, 1e-9], [1e-5, 0.0, 0.0]])
    R = lie.angle_axis_to_matrix(aa)
    np.testing.assert_allclose(R[0], jnp.eye(3), atol=1e-7)
    # differentiable at zero
    g = jax.jacfwd(lambda a: lie.angle_axis_to_matrix(a))(jnp.zeros(3))
    assert np.all(np.isfinite(g))


def test_rotate_point_matches_matrix(rng):
    R = jnp.asarray(random_rotations(rng, 16))
    aa = lie.matrix_to_angle_axis(R)
    p = jnp.asarray(rng.normal(size=(16, 3)))
    r1 = lie.rotate_point(aa, p)
    r2 = jnp.einsum("nij,nj->ni", R, p)
    np.testing.assert_allclose(r1, r2, atol=1e-5)
    # gradient finite at aa=0
    g = jax.grad(lambda a: jnp.sum(lie.rotate_point(a, jnp.ones(3))))(jnp.zeros(3))
    assert np.all(np.isfinite(g))


def test_euler_roundtrip(rng):
    e = jnp.asarray(rng.uniform(-1.0, 1.0, size=(16, 3)))
    R = lie.euler_zyx_to_matrix(e)
    e2 = lie.matrix_to_euler_zyx(R)
    np.testing.assert_allclose(e, e2, atol=1e-5)


def test_project_to_so3(rng):
    R = jnp.asarray(random_rotations(rng, 8))
    noisy = R + 0.05 * jnp.asarray(rng.normal(size=R.shape))
    P = lie.project_to_so3(noisy)
    eye = jnp.einsum("nij,nkj->nik", P, P)
    np.testing.assert_allclose(eye, jnp.broadcast_to(jnp.eye(3), eye.shape), atol=1e-5)
    assert np.all(np.asarray(jnp.linalg.det(P)) > 0)


def test_np_geom_matches_jnp(rng):
    """Host-side numpy pose helpers agree with the jnp kernels."""
    from metricsfm_tpu.ops import np_geom, projection

    for _ in range(20):
        aa = rng.normal(0, 1.2, 3)
        t = rng.normal(0, 2, 3)
        pose = np.concatenate([aa, t])
        R_np = np_geom.angle_axis_to_matrix(aa)
        R_j = np.asarray(lie.angle_axis_to_matrix(jnp.asarray(aa)))
        np.testing.assert_allclose(R_np, R_j, atol=1e-5)
        np.testing.assert_allclose(
            np_geom.camera_center(pose),
            np.asarray(projection.camera_center(jnp.asarray(pose))), atol=1e-4)
        aa_back = np_geom.matrix_to_angle_axis(R_np)
        np.testing.assert_allclose(
            np_geom.angle_axis_to_matrix(aa_back), R_np, atol=1e-6)
        # similarity update preserves projection semantics
        s = float(rng.uniform(0.5, 2.0))
        R_s = np_geom.angle_axis_to_matrix(rng.normal(0, 0.5, 3))
        t_s = rng.normal(0, 1, 3)
        p2 = np_geom.apply_similarity_to_pose(pose, s, R_s, t_s)
        j2 = np.asarray(projection.apply_similarity_to_pose(
            jnp.asarray(pose, jnp.float64).astype(jnp.float32),
            jnp.float32(s), jnp.asarray(R_s, jnp.float32),
            jnp.asarray(t_s, jnp.float32)))
        R2n, t2n = np_geom.pose_to_Rt(p2)
        R2j, t2j = np_geom.pose_to_Rt(j2)
        np.testing.assert_allclose(R2n, R2j, atol=1e-4)
        np.testing.assert_allclose(t2n, t2j, atol=1e-3)
