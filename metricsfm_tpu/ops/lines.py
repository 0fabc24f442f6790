"""Line-segment detection utilities (LSD-style) + Hough transform.

Re-design of the reference's line utilities (SfM/src/utils/lsd.{h,cc},
houghlines.{h,cpp}, local_orientation.{h,cc} — linked-in capability for
line-feature work, unused in the default pipelines).  Dense XLA
formulation: gradient orientation field, level-line support masks, and an
accumulator-based Hough transform via one-hot matmul binning.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def gradient_field(img):
    """Image gradients + magnitude + level-line angle (LSD convention:
    angle of the level line = gradient angle + pi/2)."""
    gx = jnp.zeros_like(img).at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    gy = jnp.zeros_like(img).at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    mag = jnp.sqrt(gx * gx + gy * gy)
    angle = jnp.arctan2(gy, gx)
    return gx, gy, mag, angle


@partial(jax.jit, static_argnames=("n_theta", "n_rho"))
def hough_lines(edge_mask, weights=None, n_theta: int = 180,
                n_rho: int = 256):
    """Weighted Hough accumulator over (theta, rho).

    Accumulation is a one-hot matmul (edge pixels x rho bins per theta),
    the TPU-friendly equivalent of scatter voting (houghlines.cpp).
    Returns (acc (n_theta, n_rho), thetas, rhos).
    """
    H, W = edge_mask.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    w = edge_mask.astype(jnp.float32)
    if weights is not None:
        w = w * weights
    diag = jnp.sqrt(float(H * H + W * W))
    thetas = jnp.linspace(0.0, jnp.pi, n_theta, endpoint=False)
    rhos = jnp.linspace(-diag, diag, n_rho)

    x = xs.reshape(-1)
    y = ys.reshape(-1)
    wf = w.reshape(-1)

    def per_theta(th):
        rho = x * jnp.cos(th) + y * jnp.sin(th)
        idx = (rho + diag) / (2 * diag) * (n_rho - 1)
        i0 = jnp.clip(jnp.floor(idx).astype(jnp.int32), 0, n_rho - 1)
        frac = idx - i0
        onehot = jax.nn.one_hot(i0, n_rho, dtype=jnp.float32) * (1 - frac)[:, None] \
            + jax.nn.one_hot(jnp.clip(i0 + 1, 0, n_rho - 1), n_rho,
                             dtype=jnp.float32) * frac[:, None]
        return wf @ onehot

    acc = jax.vmap(per_theta)(thetas)
    return acc, thetas, rhos


@partial(jax.jit, static_argnames=("max_lines", "n_theta", "n_rho"))
def detect_lines(img, mag_thresh: float = 0.05, max_lines: int = 32,
                 n_theta: int = 180, n_rho: int = 256):
    """Dominant lines of an image: gradient-magnitude edges -> Hough peaks.

    Returns dict: theta (L,), rho (L,), score (L,) sorted by vote weight.
    """
    _, _, mag, _ = gradient_field(img)
    edges = mag > mag_thresh
    acc, thetas, rhos = hough_lines(edges, weights=mag, n_theta=n_theta,
                                    n_rho=n_rho)
    flat = acc.reshape(-1)
    top, idx = jax.lax.top_k(flat, max_lines)
    ti = idx // acc.shape[1]
    ri = idx % acc.shape[1]
    return {"theta": thetas[ti], "rho": rhos[ri], "score": top}


def line_support_regions(img, angle_tol: float = 0.3927,
                         mag_thresh: float = 0.05):
    """LSD-style aligned-pixel mask per quantized level-line orientation.

    Returns (n_orient, H, W) boolean masks of pixels whose level-line angle
    agrees with the bin center within angle_tol (22.5 deg default) — the
    region-growing seed structure of LSD expressed densely.
    """
    _, _, mag, angle = gradient_field(img)
    level = angle + jnp.pi / 2.0
    n_orient = 8
    centers = jnp.linspace(-jnp.pi, jnp.pi, n_orient, endpoint=False)

    def per_orient(c):
        d = jnp.angle(jnp.exp(1j * (level - c)))
        return (jnp.abs(d) < angle_tol) & (mag > mag_thresh)

    return jax.vmap(per_orient)(centers)
