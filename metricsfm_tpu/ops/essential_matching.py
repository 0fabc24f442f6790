"""Essential-guided matching: KNN + iterative E-RANSAC re-filtering.

Re-design of SfM/src/feature/feature_matching_essential.{h,cpp}: after the
ratio-test KNN pass, iteratively (2 rounds) estimate E on the current
inliers and re-filter all candidates by Sampson distance (<=0.001 in
normalized coords).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import epipolar, matching, ransac


@partial(jax.jit, static_argnames=("rounds",))
def match_pair_essential(desc1, desc2, xy1, xy2, f1, f2, key,
                         mask1=None, mask2=None, ratio: float = 0.85,
                         th_sampson: float = 1e-3, rounds: int = 2):
    """Returns dict idx2, inlier_mask, E (normalized-coords convention)."""
    res = matching.match_pair(desc1, desc2, mask1, mask2,
                              ratio_good=0.6, ratio_all=ratio)
    idx2 = res["idx2"]
    cand = res["all"]
    n1 = xy1 / f1
    n2 = xy2[idx2] / f2

    def body(carry, k):
        inl, _E = carry
        r = ransac.essential_ransac(n1, n2, k, mask=inl,
                                    th_sampson=th_sampson,
                                    num_hypotheses=128, min_inliers=8)
        d = epipolar.sampson_distance(r["E"], n1, n2)
        new = (d < th_sampson) & cand
        keep = jnp.sum(new) >= 8
        return (jnp.where(keep, new, inl), r["E"]), None

    keys = jax.random.split(key, rounds)
    (inl, E), _ = jax.lax.scan(body, (cand, jnp.eye(3)), keys)
    return {"idx2": idx2, "inlier_mask": inl, "E": E}
