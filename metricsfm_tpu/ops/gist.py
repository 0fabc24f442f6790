"""GIST global image descriptor (optional capability).

Re-design of SfM/src/utils/gist.{hpp,cpp} (4 scales x 8 orientations Gabor
bank averaged over a 4x4 grid; used when DatabaseOptions.extract_gist,
database.cc:335-348).  Implemented as FFT-domain Gabor filtering.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _gabor_bank(H, W, n_scales=4, n_orients=8):
    """Frequency-domain Gabor transfer functions (n_filters, H, W)."""
    fy = jnp.fft.fftfreq(H)[:, None]
    fx = jnp.fft.fftfreq(W)[None, :]
    rad = jnp.sqrt(fx * fx + fy * fy)
    ang = jnp.arctan2(fy, fx)
    filters = []
    for s in range(n_scales):
        f0 = 0.25 / (2 ** s)
        for o in range(n_orients):
            th = math.pi * o / n_orients
            dang = jnp.angle(jnp.exp(1j * (ang - th)))
            g = jnp.exp(-10.0 * (rad / f0 - 1.0) ** 2
                        - 2.0 * dang * dang * n_orients / math.pi)
            filters.append(g)
    return jnp.stack(filters)


@partial(jax.jit, static_argnames=("n_scales", "n_orients", "grid"))
def gist_descriptor(img, n_scales: int = 4, n_orients: int = 8,
                    grid: int = 4):
    """(H, W) image -> (n_scales*n_orients*grid*grid,) GIST vector."""
    H, W = img.shape
    img = (img - jnp.mean(img)) / jnp.maximum(jnp.std(img), 1e-6)
    F = jnp.fft.fft2(img)
    bank = _gabor_bank(H, W, n_scales, n_orients)
    resp = jnp.abs(jnp.fft.ifft2(F[None] * bank))        # (nf, H, W)
    # average-pool over a grid x grid partition
    gh, gw = H // grid, W // grid
    resp = resp[:, :gh * grid, :gw * grid]
    pooled = resp.reshape(resp.shape[0], grid, gh, grid, gw).mean(axis=(2, 4))
    v = pooled.reshape(-1)
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
