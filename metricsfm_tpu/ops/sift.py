"""SIFT feature detection + description, dense-masked for TPU.

TPU-native re-design of the reference extractors
(SfM/src/feature/feature_extractor_vl_sift.cpp — vlfeat CPU SIFT, 4 octaves
x 5 levels, edge_thresh 10, peak_thresh 0;
 feature_extractor_cuda_sift.cpp — CudaSift GPU, 60k keypoint cap).

The scattered, data-dependent parts of SIFT (extrema lists, per-keypoint
loops) become dense masked computation (SURVEY.md §7 "hard parts" #3):

* Gaussian pyramid: separable depthwise convs (XLA fuses these well).
* DoG extrema: 3x3x3 neighbourhood max/min via reduce_window, computed
  everywhere; candidate strength is a dense response map.
* Keypoint selection: top-K over the masked response map per octave — a
  fixed keypoint budget with validity mask replaces dynamic lists.
* Subpixel/orientation/descriptor: vmapped gathers around each selected
  keypoint (bilinear sampling of the gradient field), soft-binned 4x4x8
  histograms as 8 static scatter-adds.

Output coordinates are *centered* at the principal point (w/2, h/2),
matching the reference convention (database.cc:522-527).
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SiftConfig(NamedTuple):
    n_octaves: int = 4
    n_scales: int = 3           # intervals per octave (ref: 5 DoG levels)
    sigma0: float = 1.6
    peak_thresh: float = 0.5 / 255.0  # DoG response gate (vlfeat peak 0 => tiny)
    edge_thresh: float = 10.0   # Hessian edge ratio (ref edge_thresh=10)
    max_keypoints: int = 2048   # fixed budget (ref cap 60000)
    desc_width: int = 4         # 4x4 spatial bins
    desc_bins: int = 8          # 8 orientation bins
    desc_window: int = 16       # GxG gradient samples per keypoint
    desc_mag: float = 3.0       # spatial bin size in units of sigma
    clip: float = 0.2           # descriptor clipping before renorm


def _gauss_kernel1d(sigma, radius):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _blur(img, sigma):
    """Separable Gaussian blur of (H, W) image with static radius."""
    radius = max(1, int(math.ceil(3.0 * float(sigma))))
    k = _gauss_kernel1d(sigma, radius)
    pad = [(radius, radius)]
    # rows
    imgp = jnp.pad(img, ((radius, radius), (0, 0)), mode="edge")
    out = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"),
                   in_axes=1, out_axes=1)(imgp)
    imgp = jnp.pad(out, ((0, 0), (radius, radius)), mode="edge")
    out = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(imgp)
    return out


def gaussian_pyramid(img, cfg: SiftConfig):
    """List (per octave) of (S+3, H_o, W_o) Gaussian stacks."""
    S = cfg.n_scales
    k = 2.0 ** (1.0 / S)
    base = _blur(img, cfg.sigma0)
    octaves = []
    cur = base
    for o in range(cfg.n_octaves):
        levels = [cur]
        sigma_prev = cfg.sigma0
        for s in range(1, S + 3):
            sigma_total = cfg.sigma0 * (k ** s)
            sigma_extra = math.sqrt(max(sigma_total ** 2 - sigma_prev ** 2, 0.01))
            levels.append(_blur(levels[-1], sigma_extra))
            sigma_prev = sigma_total
        stack = jnp.stack(levels)               # (S+3, H, W)
        octaves.append(stack)
        # next octave seeds from level S (sigma doubled), downsample 2x
        cur = stack[S][::2, ::2]
    return octaves


def _dog_extrema_response(dog):
    """Dense extrema response for a (L, H, W) DoG stack.

    Returns (resp, is_extremum): resp = |dog| on interior levels; extremum
    requires strict 26-neighbourhood max or min.
    """
    # 3x3x3 max/min pools
    mx = jax.lax.reduce_window(dog, -jnp.inf, jax.lax.max, (3, 3, 3),
                               (1, 1, 1), "SAME")
    mn = jax.lax.reduce_window(dog, jnp.inf, jax.lax.min, (3, 3, 3),
                               (1, 1, 1), "SAME")
    is_max = dog >= mx - 1e-12
    is_min = dog <= mn + 1e-12
    is_ext = is_max | is_min
    # only interior levels can be extrema in scale
    L = dog.shape[0]
    lvl = jnp.arange(L)[:, None, None]
    interior = (lvl >= 1) & (lvl <= L - 2)
    return jnp.abs(dog), is_ext & interior


def _edge_mask(dog, edge_thresh):
    """Hessian edge-response rejection (trace^2/det < (r+1)^2/r)."""
    dxx = dog[:, 1:-1, 2:] + dog[:, 1:-1, :-2] - 2 * dog[:, 1:-1, 1:-1]
    dyy = dog[:, 2:, 1:-1] + dog[:, :-2, 1:-1] - 2 * dog[:, 1:-1, 1:-1]
    dxy = 0.25 * (dog[:, 2:, 2:] - dog[:, 2:, :-2] - dog[:, :-2, 2:] + dog[:, :-2, :-2])
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_thresh
    ok = (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det)
    return jnp.pad(ok, ((0, 0), (1, 1), (1, 1)))


def detect_octave(stack, octave, cfg: SiftConfig, budget):
    """Top-`budget` keypoints from one octave's Gaussian stack.

    Returns (xy (B,2) full-res pixel coords, level (B,), resp (B,), mask (B,)).
    """
    dog = stack[1:] - stack[:-1]               # (S+2, H, W)
    resp, is_ext = _dog_extrema_response(dog)
    edge_ok = _edge_mask(dog, cfg.edge_thresh)
    H, W = dog.shape[1], dog.shape[2]
    border = 8
    yy = jnp.arange(H)[None, :, None]
    xx = jnp.arange(W)[None, None, :]
    inb = (yy >= border) & (yy < H - border) & (xx >= border) & (xx < W - border)
    valid = is_ext & edge_ok & inb & (resp > cfg.peak_thresh)
    score = jnp.where(valid, resp, -1.0)
    flat = score.reshape(-1)
    top, idx = jax.lax.top_k(flat, budget)
    lvl = idx // (H * W)
    rem = idx % (H * W)
    y = rem // W
    x = rem % W
    mask = top > 0
    scale_mult = 2.0 ** octave
    xy = jnp.stack([x, y], axis=-1).astype(jnp.float32) * scale_mult
    # sigma at detection level (DoG level l sits between gauss l and l+1)
    k = 2.0 ** (1.0 / cfg.n_scales)
    sigma = cfg.sigma0 * (k ** lvl.astype(jnp.float32)) * scale_mult
    return xy, lvl, sigma, top, mask, x, y


def _bilinear(img, xy):
    """Bilinear sample (H, W) image at (..., 2) float (x, y) coords."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


def _grad_maps(level_img):
    gx = jnp.zeros_like(level_img)
    gx = gx.at[:, 1:-1].set(0.5 * (level_img[:, 2:] - level_img[:, :-2]))
    gy = jnp.zeros_like(level_img)
    gy = gy.at[1:-1, :].set(0.5 * (level_img[2:, :] - level_img[:-2, :]))
    return gx, gy


def orientation_histogram(gx, gy, x, y, sigma_oct, n_bins: int = 36,
                          window: int = 16):
    """36-bin orientation histogram around (x, y) in octave coords (vmapped)."""
    g = jnp.arange(window, dtype=jnp.float32) - (window - 1) / 2.0
    ox, oy = jnp.meshgrid(g, g, indexing="xy")
    radius = 1.5 * sigma_oct
    sx = x + ox * (2.0 * radius / window)
    sy = y + oy * (2.0 * radius / window)
    coords = jnp.stack([sx, sy], axis=-1)
    vx = _bilinear(gx, coords)
    vy = _bilinear(gy, coords)
    mag = jnp.sqrt(vx * vx + vy * vy)
    w = jnp.exp(-(ox ** 2 + oy ** 2) / (2.0 * (window / 4.0) ** 2))
    ang = jnp.arctan2(vy, vx)                  # [-pi, pi]
    binf = (ang + jnp.pi) / (2 * jnp.pi) * n_bins
    b0 = jnp.floor(binf).astype(jnp.int32) % n_bins
    fb = binf - jnp.floor(binf)
    hist = jnp.zeros((n_bins,))
    hist = hist.at[b0.reshape(-1)].add((mag * w * (1 - fb)).reshape(-1))
    hist = hist.at[((b0 + 1) % n_bins).reshape(-1)].add((mag * w * fb).reshape(-1))
    # smooth histogram (circular box filter x2)
    for _ in range(2):
        hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0
    peak = jnp.argmax(hist)
    # parabolic refine
    l = hist[(peak - 1) % n_bins]
    c = hist[peak]
    r = hist[(peak + 1) % n_bins]
    denom = l - 2 * c + r
    off = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (l - r) / denom, 0.0)
    theta = (peak + off + 0.5) / n_bins * 2 * jnp.pi - jnp.pi
    return theta


def descriptor(gx, gy, x, y, sigma_oct, theta, cfg: SiftConfig):
    """128-D SIFT descriptor at one keypoint in octave coords (vmapped)."""
    G = cfg.desc_window
    nb = cfg.desc_width                       # 4 spatial bins/axis
    g = (jnp.arange(G, dtype=jnp.float32) + 0.5) / G * nb - nb / 2.0  # in bin units
    ux, uy = jnp.meshgrid(g, g, indexing="xy")
    ct, st = jnp.cos(theta), jnp.sin(theta)
    bin_size = cfg.desc_mag * sigma_oct
    rx = (ct * ux - st * uy) * bin_size
    ry = (st * ux + ct * uy) * bin_size
    coords = jnp.stack([x + rx, y + ry], axis=-1)
    vx = _bilinear(gx, coords)
    vy = _bilinear(gy, coords)
    mag = jnp.sqrt(vx * vx + vy * vy)
    w = jnp.exp(-(ux ** 2 + uy ** 2) / (2.0 * (nb / 2.0) ** 2))
    ang = jnp.arctan2(vy, vx) - theta
    nbins = cfg.desc_bins
    binf = (ang / (2 * jnp.pi)) * nbins
    binf = jnp.mod(binf, nbins)
    ob0 = jnp.floor(binf).astype(jnp.int32)
    fo = binf - ob0

    # spatial soft-assign: sample (ux, uy) sits in bin space [-nb/2, nb/2]
    bx = ux + nb / 2.0 - 0.5
    by = uy + nb / 2.0 - 0.5
    bx0 = jnp.floor(bx).astype(jnp.int32)
    by0 = jnp.floor(by).astype(jnp.int32)
    fxs = bx - bx0
    fys = by - by0

    desc = jnp.zeros((nb, nb, nbins))
    contrib = mag * w
    for dy in (0, 1):
        for dx in (0, 1):
            for do in (0, 1):
                ix = bx0 + dx
                iy = by0 + dy
                io = (ob0 + do) % nbins
                wgt = contrib * (fxs if dx else 1 - fxs) \
                    * (fys if dy else 1 - fys) * (fo if do else 1 - fo)
                ok = (ix >= 0) & (ix < nb) & (iy >= 0) & (iy < nb)
                wgt = jnp.where(ok, wgt, 0.0)
                ixc = jnp.clip(ix, 0, nb - 1)
                iyc = jnp.clip(iy, 0, nb - 1)
                desc = desc.at[iyc.reshape(-1), ixc.reshape(-1),
                               io.reshape(-1)].add(wgt.reshape(-1))
    v = desc.reshape(-1)
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
    v = jnp.minimum(v, cfg.clip)
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
    return v


@partial(jax.jit, static_argnames=("cfg",))
def extract(img, cfg: SiftConfig = SiftConfig()):
    """Full SIFT extraction on an (H, W) float image in [0, 1].

    Returns dict:
      xy (K, 2): centered pixel coords (principal point at image center),
      sigma (K,), angle (K,), response (K,),
      desc (K, 128) L2-normalized float32,
      mask (K,) validity.
    """
    H, W = img.shape
    octs = gaussian_pyramid(img, cfg)
    budget = cfg.max_keypoints // cfg.n_octaves

    all_xy, all_sig, all_resp, all_mask, all_desc, all_angle = [], [], [], [], [], []
    for o, stack in enumerate(octs):
        xy, lvl, sigma, resp, mask, xo, yo = detect_octave(stack, o, cfg, budget)
        # gradient maps per gaussian level (use middle level for desc)
        Smid = cfg.n_scales // 2 + 1
        gx, gy = _grad_maps(stack[Smid])
        sig_oct = sigma / (2.0 ** o)

        def per_kp(xof, yof, so):
            th = orientation_histogram(gx, gy, xof.astype(jnp.float32),
                                       yof.astype(jnp.float32), so)
            d = descriptor(gx, gy, xof.astype(jnp.float32),
                           yof.astype(jnp.float32), so, th, cfg)
            return th, d

        theta, desc = jax.vmap(per_kp)(xo, yo, sig_oct)
        all_xy.append(xy)
        all_sig.append(sigma)
        all_resp.append(resp)
        all_mask.append(mask)
        all_desc.append(desc)
        all_angle.append(theta)

    xy = jnp.concatenate(all_xy)
    sigma = jnp.concatenate(all_sig)
    resp = jnp.concatenate(all_resp)
    mask = jnp.concatenate(all_mask)
    desc = jnp.concatenate(all_desc)
    angle = jnp.concatenate(all_angle)

    # global top-K by response among valid
    K = min(cfg.max_keypoints, int(resp.shape[0]))
    score = jnp.where(mask, resp, -1.0)
    top, idx = jax.lax.top_k(score, K)
    sel_mask = top > 0
    xy = xy[idx]
    center = jnp.array([W / 2.0, H / 2.0])
    return {
        "xy": xy - center,                    # centered coords (ref convention)
        "xy_pix": xy,
        "sigma": sigma[idx],
        "angle": angle[idx],
        "response": top,
        "desc": desc[idx].astype(jnp.float32),
        "mask": sel_mask,
    }
