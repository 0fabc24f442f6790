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
