"""Match geometric verification suite.

Re-design of SfM/src/utils/geo_verification.{h,cc}: the four verification
modes the reference exposes —
  F-RANSAC (geo_verification.cc:30-58, 3 px / >=30 inliers),
  re-filter by a fixed F (:60-79),
  local-flow grid consistency (:81-154),
  per-patch local F (:156-222)
— built on the batched ops (ransac.fundamental_ransac, epipolar distances).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..ops import epipolar, ransac


def verify_fundamental(pts1, pts2, key, mask=None, th_px: float = 3.0,
                       min_inliers: int = 30, num_hypotheses: int = 256):
    """Mode 1: F-RANSAC verification (cv::findFundamentalMat equivalent)."""
    import jax.numpy as jnp
    res = ransac.fundamental_ransac(
        jnp.asarray(pts1), jnp.asarray(pts2), key,
        mask=None if mask is None else jnp.asarray(mask),
        th_px=th_px, min_inliers=min_inliers, num_hypotheses=num_hypotheses)
    return bool(res["ok"]), np.asarray(res["inlier_mask"]), np.asarray(res["F"])


def refilter_with_fundamental(F, pts1, pts2, th_px: float = 3.0):
    """Mode 2: keep matches within th_px of the epipolar lines of a fixed F."""
    import jax.numpy as jnp
    d = epipolar.epipolar_distance(jnp.asarray(F), jnp.asarray(pts1),
                                   jnp.asarray(pts2))
    return np.asarray(d) < th_px


def verify_local_flow(pts1, pts2, grid: int = 8, th_mad: float = 3.0,
                      min_per_cell: int = 3):
    """Mode 3: local-flow grid check (geo_verification.cc:81-154).

    Matches vote with their displacement vector; within each grid cell the
    flow should be locally consistent — outliers deviate from the cell
    median by more than th_mad median-absolute-deviations.
    """
    pts1 = np.asarray(pts1)
    pts2 = np.asarray(pts2)
    flow = pts2 - pts1
    lo = pts1.min(axis=0)
    hi = pts1.max(axis=0) + 1e-6
    cell = np.floor((pts1 - lo) / (hi - lo) * grid).astype(int)
    cell = np.clip(cell, 0, grid - 1)
    key = cell[:, 1] * grid + cell[:, 0]
    keep = np.ones(len(pts1), bool)
    for c in np.unique(key):
        sel = key == c
        if sel.sum() < min_per_cell:
            continue
        med = np.median(flow[sel], axis=0)
        dev = np.linalg.norm(flow[sel] - med, axis=1)
        mad = np.median(dev) + 1e-6
        keep[sel] = dev <= th_mad * max(mad, 2.0)
    return keep


def verify_patch_fundamental(pts1, pts2, key, n_patches: int = 4,
                             th_px: float = 3.0, min_per_patch: int = 16):
    """Mode 4: per-patch F verification (geo_verification.cc:156-222):
    split image 1 into n_patches x n_patches tiles and F-verify each tile
    with enough matches independently."""
    import jax
    import jax.numpy as jnp
    pts1 = np.asarray(pts1)
    pts2 = np.asarray(pts2)
    lo = pts1.min(axis=0)
    hi = pts1.max(axis=0) + 1e-6
    cell = np.floor((pts1 - lo) / (hi - lo) * n_patches).astype(int)
    cell = np.clip(cell, 0, n_patches - 1)
    pid = cell[:, 1] * n_patches + cell[:, 0]
    keep = np.zeros(len(pts1), bool)
    keys = jax.random.split(key, n_patches * n_patches)
    for c in np.unique(pid):
        sel = np.where(pid == c)[0]
        if len(sel) < min_per_patch:
            keep[sel] = True  # too few to verify locally; defer to global F
            continue
        ok, inl, _ = verify_fundamental(
            pts1[sel], pts2[sel], keys[c], th_px=th_px,
            min_inliers=min(8, len(sel) // 2), num_hypotheses=128)
        keep[sel] = inl if ok else False
    return keep
