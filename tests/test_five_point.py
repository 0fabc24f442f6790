"""Nister 5-point essential solver + bracketed real-root finder.

Synthetic ground-truth recipe per SURVEY.md §4: generate pose/points,
project, solve, compare.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metricsfm_tpu.ops import polynomial
from metricsfm_tpu.ops.five_point import essential_5pt, essential_ransac_5pt


def _rodrigues(w):
    th = np.linalg.norm(w)
    k = w / (th + 1e-12)
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K


def _two_view(rng, n=5, planar=False):
    R = _rodrigues(rng.standard_normal(3) * 0.3)
    t = rng.standard_normal(3)
    t /= np.linalg.norm(t)
    if planar:
        X = np.concatenate([rng.standard_normal((n, 2)) * 2,
                            np.full((n, 1), 6.0)], axis=1)
    else:
        X = rng.standard_normal((n, 3)) * 2 + np.array([0, 0, 6])
    x1 = X[:, :2] / X[:, 2:]
    Xc2 = X @ R.T + t
    x2 = Xc2[:, :2] / Xc2[:, 2:]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    Egt = tx @ R
    Egt /= np.linalg.norm(Egt)
    return x1, x2, Egt


def test_real_roots_bracketed_known_poly():
    rng = np.random.default_rng(3)
    roots = np.sort(rng.uniform(-20, 20, size=6))
    c = np.poly(roots).astype(np.float32)
    found, valid = polynomial.real_roots_bracketed(jnp.asarray(c), max_roots=6)
    found = np.sort(np.asarray(found)[np.asarray(valid)])
    assert valid.sum() == 6
    np.testing.assert_allclose(found, roots, rtol=0, atol=2e-2)


def test_five_point_recovers_E():
    rng = np.random.default_rng(0)
    hits = 0
    for _ in range(10):
        x1, x2, Egt = _two_view(rng)
        Es, valid = jax.jit(essential_5pt)(jnp.asarray(x1, jnp.float32),
                                           jnp.asarray(x2, jnp.float32))
        Es, valid = np.asarray(Es), np.asarray(valid)
        errs = [min(np.linalg.norm(Es[i] - Egt), np.linalg.norm(Es[i] + Egt))
                for i in range(10) if valid[i]]
        if errs and min(errs) < 5e-3:
            hits += 1
    assert hits >= 8  # f32 tolerance; RANSAC refit polishes the rest


def test_five_point_planar_scene():
    """Planar scenes degenerate the 8-point solver but not the 5-point."""
    rng = np.random.default_rng(1)
    hits = 0
    for _ in range(10):
        x1, x2, Egt = _two_view(rng, planar=True)
        Es, valid = jax.jit(essential_5pt)(jnp.asarray(x1, jnp.float32),
                                           jnp.asarray(x2, jnp.float32))
        Es, valid = np.asarray(Es), np.asarray(valid)
        errs = [min(np.linalg.norm(Es[i] - Egt), np.linalg.norm(Es[i] + Egt))
                for i in range(10) if valid[i]]
        if errs and min(errs) < 5e-3:
            hits += 1
    assert hits >= 8


def test_five_point_ransac_outliers(key):
    rng = np.random.default_rng(2)
    x1, x2, Egt = _two_view(rng, n=60)
    # corrupt 30% of rows
    n_bad = 18
    x2 = x2.copy()
    x2[:n_bad] += rng.standard_normal((n_bad, 2)) * 0.3
    out = essential_ransac_5pt(jnp.asarray(x1, jnp.float32),
                               jnp.asarray(x2, jnp.float32), key,
                               num_hypotheses=64, th_sampson=1e-6)
    assert bool(out["ok"])
    inl = np.asarray(out["inlier_mask"])
    assert inl[:n_bad].sum() <= 2          # outliers rejected
    assert inl[n_bad:].sum() >= 38         # inliers kept
    E = np.asarray(out["E"])
    E = E / np.linalg.norm(E)
    err = min(np.linalg.norm(E - Egt), np.linalg.norm(E + Egt))
    assert err < 2e-2
