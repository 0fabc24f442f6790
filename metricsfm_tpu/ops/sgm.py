"""Semi-global matching dense stereo, XLA-native.

Replaces the CUDA libSGM backend (SfM/src/dense/cudasgm/: 9x7 census ->
8-path aggregation (P1=10, P2=120) -> winner-takes-all with uniqueness
0.96 -> 3x3 median -> L/R consistency) and the CPU ELAS capability with
one TPU formulation (SURVEY.md §7):

* census transform: vectorized window comparisons packed into 2 uint32
  lanes; matching cost = Hamming distance via lax.population_count.
* path aggregation: the classic wavefront recurrence expressed as
  `lax.scan` over image columns/rows; diagonal paths reuse the horizontal
  scan on sheared images (shift row y by -y columns => diagonals become
  columns), the standard way to keep the MXU/VPU busy on a scan dependency.
* WTA + uniqueness + subpixel + median + LR-check: dense elementwise ops.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def census_transform(img, win_h: int = 9, win_w: int = 7):
    """9x7 census over a (H, W) image -> (2, H, W) uint32 bit-packs.

    Matches dense/cudasgm/src/census_transform.cu semantics: bit = center >
    neighbour, border pixels compare against zero-padded context.

    Layout note: the two words are a LEADING axis — packing them as a
    trailing dim of 2 puts a 2-wide minor dimension on every downstream
    elementwise op and wastes 126/128 vector lanes (measured >50x on the
    cost volume).
    """
    H, W = img.shape
    rh, rw = win_h // 2, win_w // 2
    pad = jnp.pad(img, ((rh, rh), (rw, rw)))
    bits = []
    for dy in range(win_h):
        for dx in range(win_w):
            if dy == rh and dx == rw:
                continue
            nb = jax.lax.dynamic_slice(pad, (dy, dx), (H, W))
            bits.append(img > nb)
    lo = jnp.zeros((H, W), jnp.uint32)
    hi = jnp.zeros((H, W), jnp.uint32)
    for k, b in enumerate(bits):
        word = b.astype(jnp.uint32) << jnp.uint32(k % 32)
        if k < 32:
            lo = lo | word
        else:
            hi = hi | word
    return jnp.stack([lo, hi], axis=0)


def matching_cost_volume(census_l, census_r, max_disp: int):
    """(H, W, D) Hamming-distance cost volume, D = max_disp.

    cost(x, y, d) = popcount(census_l(x, y) ^ census_r(x - d, y)); out-of-
    range disparities get the max cost (64). census inputs are (2, H, W).
    """
    _, H, W = census_l.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    def per_d(d):
        shifted = jnp.roll(census_r, d, axis=2)
        x = jnp.bitwise_xor(census_l, shifted)
        ham = jnp.sum(jax.lax.population_count(x), axis=0).astype(jnp.float32)
        return jnp.where(col >= d, ham, 64.0)

    return jnp.stack([per_d(d) for d in range(max_disp)], axis=-1)


def _shear(vol, direction: int):
    """Shift row y by direction*y columns (maps diagonals onto columns)."""
    H = vol.shape[0]
    rows = jnp.arange(H)

    def shift_row(row, r):
        return jnp.roll(row, direction * r, axis=0)

    return jax.vmap(shift_row)(vol, rows)


def _batched_scan(xs, p1: float, p2: float):
    """One wavefront recurrence over several directions at once.

    xs: (L, B, D, R) — B independent direction-sequences of length L with
    R-row wavefronts; the DISPARITY axis sits second-to-last so the d+-1
    shifts of the recurrence are sublane slices, not minor-dim lane
    rotations (a minor-D layout relayouts the carry every step — measured
    dominant in the scan cost), and the row axis keeps full lanes.

    A single scan over L replaces B separate scans: per-step work is
    small, so sequential step count (not FLOPs) dominates SGM wall time
    on TPU.
    """
    big = jnp.float32(1e9)

    def step(prev, c):                                        # (B, D, R)
        m = jnp.min(prev, axis=-2, keepdims=True)             # (B, 1, R)
        shift_p = jnp.concatenate([prev[:, :1] + big, prev[:, :-1]],
                                  axis=1)
        shift_n = jnp.concatenate([prev[:, 1:], prev[:, -1:] + big],
                                  axis=1)
        best = jnp.minimum(jnp.minimum(prev, m + p2),
                           jnp.minimum(shift_p + p1, shift_n + p1))
        out = c + best - m
        return out, out

    init = jnp.zeros_like(xs[0])
    _, ys = jax.lax.scan(step, init, xs)
    return ys                                                 # (L, B, D, R)


def aggregate_paths(cost, p1: float = 10.0, p2: float = 120.0,
                    num_paths: int = 8):
    """Sum of 4 or 8 directional aggregations (ref path_aggregation.cu).

    Horizontal + the two diagonal pairs share the column-scan shape
    (diagonals via shearing), so they run as ONE batched scan of W steps;
    the vertical pair is a second batched scan of H steps — 2 scans total
    instead of 8."""
    cw = jnp.transpose(cost, (1, 2, 0))                       # (W, D, H)
    seqs = [cw, cw[::-1]]
    if num_paths >= 8:
        sp = jnp.transpose(_shear(cost, 1), (1, 2, 0))
        sn = jnp.transpose(_shear(cost, -1), (1, 2, 0))
        seqs += [sp, sp[::-1], sn, sn[::-1]]
    xs_a = jnp.stack(seqs, axis=1)                            # (W, B, D, H)
    ys_a = _batched_scan(xs_a, p1, p2)

    def back(y):                                              # (W, D, H)
        return jnp.transpose(y, (2, 0, 1))                    # (H, W, D)

    total = back(ys_a[:, 0]) + back(ys_a[:, 1][::-1])
    if num_paths >= 8:
        dp = back(ys_a[:, 2]) + back(ys_a[:, 3][::-1])
        dn = back(ys_a[:, 4]) + back(ys_a[:, 5][::-1])
        total = total + _shear(dp, -1) + _shear(dn, 1)

    cv = jnp.transpose(cost, (0, 2, 1))                       # (H, D, W)
    xs_b = jnp.stack([cv, cv[::-1]], axis=1)                  # (H, 2, D, W)
    ys_b = _batched_scan(xs_b, p1, p2)
    total = total + jnp.transpose(ys_b[:, 0], (0, 2, 1)) + \
        jnp.transpose(ys_b[:, 1][::-1], (0, 2, 1))
    return total


def winner_takes_all(agg, uniqueness: float = 0.96, subpixel: bool = True):
    """argmin + uniqueness test + parabolic subpixel (ref winner_takes_all.cu).

    Returns (disp (H, W) float32, valid (H, W) bool).
    """
    D = agg.shape[-1]
    best = jnp.argmin(agg, axis=-1)
    c0 = jnp.min(agg, axis=-1)
    # second-best at least 2 disparities away (exclude immediate neighbours)
    d_idx = jnp.arange(D)[None, None, :]
    masked = jnp.where(jnp.abs(d_idx - best[..., None]) <= 1, 1e9, agg)
    c1 = jnp.min(masked, axis=-1)
    valid = c0 <= uniqueness * c1
    if subpixel:
        bm = jnp.clip(best, 1, D - 2)
        # neighbour costs via masked reductions — take_along_axis gathers
        # on the (H, W, D) volume are far slower than dense passes on TPU
        sel = d_idx - bm[..., None]
        cm = jnp.sum(jnp.where(sel == -1, agg, 0.0), axis=-1)
        cc = jnp.sum(jnp.where(sel == 0, agg, 0.0), axis=-1)
        cp = jnp.sum(jnp.where(sel == 1, agg, 0.0), axis=-1)
        denom = cm - 2 * cc + cp
        off = jnp.where(jnp.abs(denom) > 1e-6,
                        0.5 * (cm - cp) / jnp.maximum(denom, 1e-6), 0.0)
        disp = bm.astype(jnp.float32) + jnp.clip(off, -1.0, 1.0)
        disp = jnp.where(best == 0, 0.0, disp)
    else:
        disp = best.astype(jnp.float32)
    return disp, valid


def median3(x):
    """3x3 median filter (ref median_filter.cu)."""
    H, W = x.shape
    pad = jnp.pad(x, 1, mode="edge")
    stack = jnp.stack([jax.lax.dynamic_slice(pad, (dy, dx), (H, W))
                       for dy in range(3) for dx in range(3)], axis=-1)
    return jnp.sort(stack, axis=-1)[..., 4]


def lr_consistency(disp_l, disp_r, max_diff: float = 1.0):
    """Left/right check (ref check_consistency.cu): valid where
    |dL(x) - dR(x - dL(x))| <= max_diff."""
    H, W = disp_l.shape
    x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    xr = jnp.clip(x - jnp.round(disp_l).astype(jnp.int32), 0, W - 1)
    dr = jnp.take_along_axis(disp_r, xr, axis=1)
    return jnp.abs(disp_l - dr) <= max_diff


@partial(jax.jit, static_argnames=("max_disp", "num_paths", "subpixel"))
def stereo_sgm(left, right, max_disp: int = 128, p1: float = 10.0,
               p2: float = 120.0, uniqueness: float = 0.96,
               num_paths: int = 8, subpixel: bool = True):
    """Full SGM pipeline on a rectified pair (public API mirrors
    sgm::StereoSGM::execute, dense/cudasgm/include/libsgm.h).

    Args:
      left, right: (H, W) float images in [0, 1].
    Returns:
      (disp (H, W) float32 with invalid = -1, valid (H, W) bool).
    """
    cl = census_transform(left)
    cr = census_transform(right)
    cost_l = matching_cost_volume(cl, cr, max_disp)
    agg_l = aggregate_paths(cost_l, p1, p2, num_paths)
    disp_l, uniq_l = winner_takes_all(agg_l, uniqueness, subpixel)

    # right disparity from the same cost volume: cost_r(x, d) = cost_l(x+d, d)
    # — built with one roll per disparity plane; a take_along_axis gather
    # over the whole (H, W, D) volume measured ~0.7 s on its own
    D = max_disp
    H, W = left.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    cost_r = jnp.stack(
        [jnp.where(col < W - d, jnp.roll(agg_l[:, :, d], -d, axis=1), 1e9)
         for d in range(D)], axis=-1)
    disp_r, _ = winner_takes_all(cost_r, uniqueness, subpixel)

    disp_l = median3(disp_l)
    disp_r = median3(disp_r)
    valid = uniq_l & lr_consistency(disp_l, disp_r)
    return jnp.where(valid, disp_l, -1.0), valid


def disparity_to_depth(disp, focal: float, baseline: float,
                       scale: float = 20.0, clamp: float = 600.0):
    """depth = scale * f * B / d, clamped (ref dense_reconstruction.cc:243-263)."""
    d = jnp.maximum(disp, 1e-6)
    depth = scale * focal * baseline / d
    depth = jnp.where(disp > 0, jnp.minimum(depth, clamp), 0.0)
    return depth


def depth_to_points(depth, K_inv, R, t, stride: int = 1):
    """Depth map -> world points Xw = R^T (Xc - t)
    (ref Depth2Points, dense_reconstruction.cc:364-453)."""
    H, W = depth.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)[::stride, ::stride]
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)[::stride, ::stride]
    z = depth[::stride, ::stride]
    ones = jnp.ones_like(xs)
    pix = jnp.stack([xs, ys, ones], axis=-1)
    rays = jnp.einsum("ij,hwj->hwi", K_inv, pix)
    Xc = rays * z[..., None]
    Xw = jnp.einsum("ji,hwj->hwi", R, Xc - t[None, None, :])
    mask = z > 0
    return Xw, mask
