"""Polynomial root finding, XLA-native.

Replaces the reference's companion-matrix eigen root finders
(SfM/src/utils/polynomial.{h,cc},
 utils/find_polynomial_roots_companion_matrix.{h,cc}).  Non-symmetric
eigendecomposition is unsupported on TPU, so roots are found with a fixed
iteration-count Durand-Kerner (Weierstrass) method using *manual* complex
arithmetic (re/im pairs of real arrays) — no complex dtype, fully jittable
and vmappable on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-20


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cdiv(ar, ai, br, bi):
    d = br * br + bi * bi
    d = jnp.maximum(d, _EPS)
    return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d


def _poly_eval(coeffs, zr, zi):
    """Evaluate monic-ordered polynomial coeffs[0]*z^d + ... + coeffs[d] at z.

    coeffs: (..., d+1) real; zr, zi: (..., k) evaluation points.
    """
    pr = jnp.zeros_like(zr) + coeffs[..., 0:1]
    pi = jnp.zeros_like(zi)
    d = coeffs.shape[-1] - 1
    for k in range(1, d + 1):
        pr, pi = _cmul(pr, pi, zr, zi)
        pr = pr + coeffs[..., k:k + 1]
    return pr, pi


def roots_durand_kerner(coeffs, iters: int = 60):
    """All (complex) roots of a real-coefficient polynomial.

    Args:
      coeffs: (..., d+1) descending-order coefficients (leading may be any
        nonzero value; internally normalized to monic).
      iters: fixed Weierstrass iteration count.

    Returns:
      (roots_re, roots_im): each (..., d).
    """
    d = coeffs.shape[-1] - 1
    lead = coeffs[..., 0:1]
    lead = jnp.where(jnp.abs(lead) < 1e-12, jnp.where(lead < 0, -1e-12, 1e-12), lead)
    monic = coeffs / lead

    # scale roots into O(1): substitute z = s*w with s = max|a_k|^(1/k)
    powers = jnp.arange(1, d + 1, dtype=coeffs.dtype)
    mags = jnp.abs(monic[..., 1:])
    s = jnp.max(mags ** (1.0 / powers), axis=-1, keepdims=True)
    s = jnp.maximum(s, 1e-6)
    scaled = monic * (s ** -jnp.arange(0, d + 1, dtype=coeffs.dtype)) * 1.0
    # renormalize to monic in w: coefficient k becomes a_k / s^k (monic stays 1)

    # standard initial guesses (0.4 + 0.9i)^k
    base_r, base_i = 0.4, 0.9
    zr = jnp.zeros(scaled.shape[:-1] + (d,), coeffs.dtype)
    zi = jnp.zeros_like(zr)
    cr, ci = 1.0, 0.0
    init_r, init_i = [], []
    for _ in range(d):
        cr, ci = cr * base_r - ci * base_i, cr * base_i + ci * base_r
        init_r.append(cr)
        init_i.append(ci)
    zr = zr + jnp.array(init_r, coeffs.dtype)
    zi = zi + jnp.array(init_i, coeffs.dtype)

    def body(_, zz):
        zr, zi = zz
        pr, pi = _poly_eval(scaled, zr, zi)
        # denom = prod_{j != i} (z_i - z_j)
        dr = zr[..., :, None] - zr[..., None, :]
        di = zi[..., :, None] - zi[..., None, :]
        eye = jnp.eye(d, dtype=coeffs.dtype)
        dr = dr + eye  # diagonal -> 1 (excluded from product)
        qr = jnp.ones_like(zr)
        qi = jnp.zeros_like(zi)
        for j in range(d):
            qr, qi = _cmul(qr, qi, dr[..., j], di[..., j])
        wr, wi = _cdiv(pr, pi, qr, qi)
        return zr - wr, zi - wi

    zr, zi = jax.lax.fori_loop(0, iters, body, (zr, zi))
    return zr * s, zi * s


def real_roots(coeffs, iters: int = 60, imag_tol: float = 1e-4):
    """Real roots of a polynomial with validity mask.

    Returns (roots (..., d), is_real (..., d)).  Non-real entries carry their
    real parts; mask them out.
    """
    zr, zi = roots_durand_kerner(coeffs, iters)
    scale = 1.0 + jnp.abs(zr)
    return zr, jnp.abs(zi) < imag_tol * scale


def quartic_real_roots(coeffs, iters: int = 60):
    """Real roots of a quartic (descending coeffs, shape (..., 5))."""
    return real_roots(coeffs, iters)
