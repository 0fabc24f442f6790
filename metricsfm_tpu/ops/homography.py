"""Homography estimation (DLT + batched RANSAC).

Supports the reference's homography gating in windowed video matching
(slam_gps.cc:312-555 prior-H gate) and planar-degeneracy checks.
Convention: x2 ~ H x1 (centered pixels).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .epipolar import _homog, _smallest_right_singular, normalize_points


def homography_dlt(pts1, pts2, weights=None):
    """Normalized DLT homography from >=4 correspondences (..., N, 2)."""
    p1n, T1 = normalize_points(pts1)
    p2n, T2 = normalize_points(pts2)
    x1, y1 = p1n[..., 0], p1n[..., 1]
    x2, y2 = p2n[..., 0], p2n[..., 1]
    zero = jnp.zeros_like(x1)
    one = jnp.ones_like(x1)
    # rows: [-x1 -y1 -1 0 0 0 x2x1 x2y1 x2], [0 0 0 -x1 -y1 -1 y2x1 y2y1 y2]
    r1 = jnp.stack([-x1, -y1, -one, zero, zero, zero, x2 * x1, x2 * y1, x2],
                   axis=-1)
    r2 = jnp.stack([zero, zero, zero, -x1, -y1, -one, y2 * x1, y2 * y1, y2],
                   axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)
    if weights is not None:
        w = jnp.concatenate([weights, weights], axis=-1)[..., None]
        A = A * w
    h = _smallest_right_singular(A)
    H = h.reshape(*h.shape[:-1], 3, 3)
    # denormalize: T2^-1 H T1
    H = jnp.linalg.solve(T2, H @ T1)
    return H / jnp.maximum(jnp.abs(H[..., 2:3, 2:3]), 1e-12)


def transfer_error(H, pts1, pts2):
    """Symmetric-ish forward transfer error |H x1 - x2| in px (..., N)."""
    x1 = _homog(pts1)
    Hx = jnp.einsum("...ij,...nj->...ni", H, x1)
    z = Hx[..., 2:]
    z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    proj = Hx[..., :2] / z
    return jnp.linalg.norm(proj - pts2, axis=-1)


@partial(jax.jit, static_argnames=("num_hypotheses",))
def homography_ransac(pts1, pts2, key, mask=None, num_hypotheses: int = 256,
                      th_px: float = 3.0, min_inliers: int = 20):
    """Batched 4-point H-RANSAC; returns dict H, inlier_mask, n_inliers, ok."""
    N = pts1.shape[0]
    m = jnp.ones((N,), bool) if mask is None else mask.astype(bool)
    logits = jnp.where(m, 0.0, -1e9)
    keys = jax.random.split(key, num_hypotheses)
    idx = jax.vmap(lambda k: jax.random.choice(
        k, N, shape=(4,), replace=False, p=jax.nn.softmax(logits)))(keys)
    Hs = jax.vmap(lambda si: homography_dlt(pts1[si], pts2[si]))(idx)
    err = jax.vmap(lambda H: transfer_error(H, pts1, pts2))(Hs)
    inl = (err < th_px) & m[None, :]
    n = jnp.sum(inl, axis=-1)
    best = jnp.argmax(n)
    w = inl[best].astype(pts1.dtype)
    H = homography_dlt(pts1, pts2, weights=w)
    e = transfer_error(H, pts1, pts2)
    fin = (e < th_px) & m
    ok = jnp.sum(fin) >= jnp.maximum(jnp.sum(inl[best]) // 2, 4)
    H_fin = jnp.where(ok, H, Hs[best])
    fin = jnp.where(ok, fin, inl[best])
    return {"H": H_fin, "inlier_mask": fin, "n_inliers": jnp.sum(fin),
            "ok": jnp.sum(fin) >= min_inliers}
