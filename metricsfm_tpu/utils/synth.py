"""Synthetic rendered-image scenes with exact ground truth.

The reference validates its pipeline only on real photo sets
(SfM/test/test_sfm/test_sfm.cc:22-73 — the documented usage); it ships no
fixtures.  For the TPU build we need a deterministic, license-free way to
exercise the FULL images -> SIFT -> matching -> reconstruction loop with a
known answer, so this module renders a piecewise-planar textured scene from
N pinhole cameras by exact homography inverse-warping (each textured plane
maps to the image through a 3x3 homography; compositing near-over-far gives
parallax + occlusion, i.e. a genuinely non-planar scene that is NOT
degenerate for fundamental-matrix estimation).

Host-side numpy on purpose: this is test/bench fixture generation, not a
pipeline stage.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np


def multiscale_texture(rng: np.random.Generator, size: int = 512,
                       scales: Tuple[int, ...] = (8, 24, 64, 192)) -> np.ndarray:
    """Random texture with power at several spatial scales.

    Sums bilinearly-upsampled white noise at a few coarse resolutions plus a
    fine layer — rich in blob/corner structure at multiple DoG octaves, and
    locally distinctive (unlike e.g. pure gaussian blobs, whose rotationally
    symmetric neighbourhoods defeat the SIFT ratio test).
    """
    img = np.zeros((size, size), np.float32)
    for s in scales:
        coarse = rng.uniform(-1.0, 1.0, size=(s, s)).astype(np.float32)
        # bilinear upsample coarse -> size
        yy = np.linspace(0, s - 1, size)
        xx = np.linspace(0, s - 1, size)
        y0 = np.clip(yy.astype(int), 0, s - 2)
        x0 = np.clip(xx.astype(int), 0, s - 2)
        fy = (yy - y0)[:, None]
        fx = (xx - x0)[None, :]
        up = (coarse[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
              + coarse[np.ix_(y0 + 1, x0)] * fy * (1 - fx)
              + coarse[np.ix_(y0, x0 + 1)] * (1 - fy) * fx
              + coarse[np.ix_(y0 + 1, x0 + 1)] * fy * fx)
        img += up * (0.55 + 0.45 * (s / scales[-1]))
    img -= img.min()
    img /= max(img.max(), 1e-6)
    return 0.08 + 0.84 * img


def _look_at(c: np.ndarray, target: np.ndarray) -> np.ndarray:
    """World->cam rotation rows for a camera at `c` looking at `target`
    (z forward, y down-ish — matches ops/projection conventions)."""
    z = target - c
    z = z / np.linalg.norm(z)
    x = np.cross(np.array([0.0, 1.0, 0.0]), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z], axis=0)


def _bilinear(tex: np.ndarray, s: np.ndarray, t: np.ndarray) -> np.ndarray:
    T = tex.shape[0]
    u = np.clip(s, 0.0, 1.0) * (T - 1)
    v = np.clip(t, 0.0, 1.0) * (T - 1)
    u0 = np.clip(u.astype(int), 0, T - 2)
    v0 = np.clip(v.astype(int), 0, T - 2)
    fu = u - u0
    fv = v - v0
    return (tex[v0, u0] * (1 - fv) * (1 - fu) + tex[v0 + 1, u0] * fv * (1 - fu)
            + tex[v0, u0 + 1] * (1 - fv) * fu + tex[v0 + 1, u0 + 1] * fv * fu)


def default_planes() -> List[dict]:
    """Three textured rectangles at different depths/orientations around the
    world point (0, 0, 8) the cameras fixate."""
    return [
        # far back-wall, gently tilted
        dict(P0=np.array([-7.0, -5.0, 11.5]), U=np.array([14.0, 0.0, 1.6]),
             V=np.array([0.0, 10.0, 0.8])),
        # mid slab, offset left
        dict(P0=np.array([-4.6, -3.2, 8.4]), U=np.array([5.2, 0.0, -1.0]),
             V=np.array([0.3, 4.4, 0.5])),
        # near slab, offset right
        dict(P0=np.array([0.6, -2.4, 6.8]), U=np.array([3.6, 0.0, 0.9]),
             V=np.array([-0.3, 3.4, -0.4])),
    ]


def render_scene(seed: int = 0, n_cams: int = 6, width: int = 640,
                 height: int = 480, focal: float = 640.0,
                 arc_step: float = 0.055, tex_size: int = 512,
                 planes: List[dict] | None = None):
    """Render `n_cams` views of a 3-plane textured scene.

    Returns dict with:
      images  : (C, H, W) float32 in [0,1]
      poses   : (C, 6) ground-truth [angle-axis | t] (world->cam)
      centers : (C, 3) ground-truth camera centers
      focal   : float (pixels)
    """
    import jax.numpy as jnp

    from ..ops import lie

    rng = np.random.default_rng(seed)
    if planes is None:
        planes = default_planes()
    texs = [multiscale_texture(rng, tex_size) for _ in planes]

    depth = 8.0
    K = np.array([[focal, 0.0, width / 2.0],
                  [0.0, focal, height / 2.0],
                  [0.0, 0.0, 1.0]])
    xs, ys = np.meshgrid(np.arange(width) + 0.5, np.arange(height) + 0.5)
    pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1)  # (H, W, 3)

    images = np.zeros((n_cams, height, width), np.float32)
    poses = np.zeros((n_cams, 6), np.float64)
    centers = np.zeros((n_cams, 3), np.float64)
    for ci in range(n_cams):
        ang = (ci - (n_cams - 1) / 2.0) * arc_step
        c = np.array([np.sin(ang) * depth, 0.25 * np.sin(2.3 * ang + 0.4),
                      depth - np.cos(ang) * depth])
        target = np.array([0.0, 0.0, depth]) + rng.normal(0, 0.15, 3)
        R = _look_at(c, target)
        t = -R @ c
        aa = np.asarray(lie.matrix_to_angle_axis(jnp.asarray(R)))
        poses[ci] = np.concatenate([aa, t])
        centers[ci] = c

        img = np.zeros((height, width), np.float32)
        # far -> near compositing
        order = np.argsort([-np.linalg.norm(p["P0"] + 0.5 * p["U"]
                                            + 0.5 * p["V"] - c)
                            for p in planes])
        for pi in order:
            p = planes[pi]
            A = np.stack([p["U"], p["V"], p["P0"]], axis=1)  # (3,3)
            Hm = K @ (R @ A + t[:, None] @ np.array([[0.0, 0.0, 1.0]]))
            Hinv = np.linalg.inv(Hm)
            st = pix @ Hinv.T                                # (H, W, 3)
            w = st[..., 2]
            s = st[..., 0] / np.where(np.abs(w) < 1e-12, 1e-12, w)
            tt = st[..., 1] / np.where(np.abs(w) < 1e-12, 1e-12, w)
            # camera-frame depth of the hit point (front-of-camera gate)
            X = (s[..., None] * p["U"] + tt[..., None] * p["V"] + p["P0"])
            z_cam = X @ R[2] + t[2]
            hit = ((s >= 0) & (s <= 1) & (tt >= 0) & (tt <= 1)
                   & (z_cam > 0.2))
            vals = _bilinear(texs[pi], s, tt)
            img = np.where(hit, vals, img)
        images[ci] = img
    return {"images": images, "poses": poses, "centers": centers,
            "focal": float(focal)}


def render_aerial(seed: int = 0, rows: int = 10, cols: int = 20,
                  width: int = 640, height: int = 480,
                  focal: float | None = None, altitude: float = 40.0,
                  forward_overlap: float = 0.70, side_overlap: float = 0.55,
                  tile_rel: float = 0.5, relief: float = 0.12,
                  tex_size: int = 256):
    """Render a lawnmower-grid aerial survey over tiled terrain.

    This is the fixture for the BASELINE configs 3-4 (500/1k-image aerial
    sets; the reference's documented aerial workload, README.md) scaled to
    rows*cols images: nadir-ish cameras on a rows x cols grid with the
    given forward/side overlap, over a ground made of textured tiles at
    different heights (relief = peak height as a fraction of altitude) and
    small random tilts — genuinely non-planar, so epipolar geometry is
    well-conditioned, while covisibility stays local (each image overlaps
    only its grid neighbours, like a real survey).

    Returns the same dict schema as render_scene; `centers[:, :2]` doubles
    as the UTM easting/northing for GPS-priori candidate selection
    (ref initial_matching_graph.cc:83-162).
    """
    from ..ops import np_geom

    rng = np.random.default_rng(seed)
    if focal is None:
        focal = 1.1 * width
    # ground footprint of one image and grid spacing from overlap
    fx = altitude * width / focal
    fy = altitude * height / focal
    sx = (1.0 - forward_overlap) * fx      # along a flight line (cols)
    sy = (1.0 - side_overlap) * fy         # across flight lines (rows)
    extent_x = (cols - 1) * sx + 1.2 * fx
    extent_y = (rows - 1) * sy + 1.2 * fy
    x_min = -extent_x / 2.0
    y_min = -extent_y / 2.0

    ts = tile_rel * min(fx, fy)            # tile edge length
    nx = int(np.ceil(extent_x / ts)) + 1
    ny = int(np.ceil(extent_y / ts)) + 1
    tiles = []
    for iy in range(ny):
        for ix in range(nx):
            dz = rng.uniform(-relief, relief) * altitude
            tilt_u = rng.uniform(-0.08, 0.08) * ts
            tilt_v = rng.uniform(-0.08, 0.08) * ts
            tiles.append(dict(
                P0=np.array([x_min + ix * ts, y_min + iy * ts,
                             altitude + dz]),
                U=np.array([ts, 0.0, tilt_u]),
                V=np.array([0.0, ts, tilt_v]),
                tex=multiscale_texture(rng, tex_size,
                                       scales=(6, 16, 40, 96)),
            ))
    tile_centers = np.stack([t["P0"] + 0.5 * t["U"] + 0.5 * t["V"]
                             for t in tiles])

    n_cams = rows * cols
    K = np.array([[focal, 0.0, width / 2.0],
                  [0.0, focal, height / 2.0],
                  [0.0, 0.0, 1.0]])
    xs, ys = np.meshgrid(np.arange(width) + 0.5, np.arange(height) + 0.5)
    pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1)

    images = np.zeros((n_cams, height, width), np.float32)
    poses = np.zeros((n_cams, 6), np.float64)
    centers = np.zeros((n_cams, 3), np.float64)
    cull_r = 0.9 * np.hypot(fx, fy)
    ci = 0
    for row in range(rows):
        # lawnmower: alternate direction per flight line
        col_order = range(cols) if row % 2 == 0 else range(cols - 1, -1, -1)
        for col in col_order:
            c = np.array([
                x_min + 0.6 * fx + col * sx + rng.normal(0, 0.02 * sx),
                y_min + 0.6 * fy + row * sy + rng.normal(0, 0.02 * sy),
                rng.normal(0, 0.01 * altitude),
            ])
            target = np.array([c[0], c[1], altitude]) \
                + rng.normal(0, 0.01 * altitude, 3) * np.array([1, 1, 0])
            R = _look_at(c, target)
            t = -R @ c
            poses[ci] = np.concatenate([np_geom.matrix_to_angle_axis(R), t])
            centers[ci] = c

            img = np.zeros((height, width), np.float32)
            d_xy = np.linalg.norm(tile_centers[:, :2] - c[:2], axis=1)
            near = np.where(d_xy < cull_r)[0]
            order = near[np.argsort(-np.linalg.norm(
                tile_centers[near] - c, axis=1))]
            for pi in order:
                p = tiles[pi]
                A = np.stack([p["U"], p["V"], p["P0"]], axis=1)
                Hm = K @ (R @ A + t[:, None] @ np.array([[0.0, 0.0, 1.0]]))
                Hinv = np.linalg.inv(Hm)
                st = pix @ Hinv.T
                w = st[..., 2]
                s = st[..., 0] / np.where(np.abs(w) < 1e-12, 1e-12, w)
                tt = st[..., 1] / np.where(np.abs(w) < 1e-12, 1e-12, w)
                X = (s[..., None] * p["U"] + tt[..., None] * p["V"]
                     + p["P0"])
                z_cam = X @ R[2] + t[2]
                hit = ((s >= 0) & (s <= 1) & (tt >= 0) & (tt <= 1)
                       & (z_cam > 0.2))
                img = np.where(hit, _bilinear(p["tex"], s, tt), img)
            images[ci] = img
            ci += 1
    return {"images": images, "poses": poses, "centers": centers,
            "focal": float(focal)}


def synthetic_ba_problem(n_cams: int = 1024, n_pts: int = 131072,
                         max_views: int = 6, seed: int = 0,
                         noise_pose: float = 0.01, noise_pt: float = 0.05,
                         focal: float = 1000.0):
    """Large-scale synthetic BAProblem (the BASELINE 1k-camera shape).

    Cameras sweep an arc over a point cloud; each point is observed by a
    window of `max_views` consecutive cameras (bounded per-camera slot
    counts — the realistic sparsity of a survey, and what the CG gather
    table needs).  Observations are exact projections of the ground truth;
    poses/points are returned perturbed.  Host-side numpy (fixture
    generation, not a pipeline stage).
    """
    import jax.numpy as jnp

    from ..ba import problem as ba_problem
    from ..ops import np_geom

    rng = np.random.default_rng(seed)
    pts = rng.uniform(-40, 40, size=(n_pts, 3))
    pts[:, 2] += 80.0
    poses = np.zeros((n_cams, 6))
    for i in range(n_cams):
        ang = (i - n_cams / 2) * (2.0 / n_cams)
        c = np.array([np.sin(ang) * 80.0, 2.0 * np.sin(2 * ang),
                      80.0 - np.cos(ang) * 80.0])
        z = np.array([0.0, 0.0, 80.0]) + rng.normal(0, 3.0, 3) - c
        z /= np.linalg.norm(z)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        R = np.stack([x, np.cross(z, x), z])
        poses[i] = np.concatenate([np_geom.matrix_to_angle_axis(R), -R @ c])
    intrs = np.tile(np.array([[focal, 0.0, 0.0]]), (n_cams, 1))

    base = (rng.integers(0, n_cams, size=n_pts)[:, None]
            + np.arange(max_views)[None, :]) % n_cams
    track_cam = base.astype(np.int32)
    camf = track_cam.reshape(-1)
    # exact pinhole projection, host numpy
    Rs = np.stack([np_geom.pose_to_Rt(p)[0] for p in poses])
    ts = np.stack([np_geom.pose_to_Rt(p)[1] for p in poses])
    Xc = (np.einsum("nij,nj->ni", Rs[camf],
                    np.repeat(pts, max_views, axis=0)) + ts[camf])
    zc = np.where(np.abs(Xc[:, 2]) < 1e-9, 1e-9, Xc[:, 2])
    track_uv = (focal * Xc[:, :2] / zc[:, None]).reshape(
        n_pts, max_views, 2)
    track_mask = np.ones((n_pts, max_views), bool)
    prob = ba_problem.build_problem(
        poses + rng.normal(0, noise_pose, poses.shape), intrs,
        np.arange(n_cams), pts + rng.normal(0, noise_pt, pts.shape),
        track_cam, track_uv, track_mask)
    prob = prob._replace(
        pose_mut=jnp.ones((n_cams,)).at[0].set(0.0),
        intr_mut=jnp.zeros((n_cams,)))
    return prob


def write_scene_images(fold: str, scene: dict) -> List[str]:
    """Write the rendered views as 8-bit PNGs into `fold` (what the Database
    discovery stage expects)."""
    import os

    from PIL import Image

    os.makedirs(fold, exist_ok=True)
    paths = []
    for i, img in enumerate(scene["images"]):
        p = f"{fold}/view_{i:03d}.png"
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(p)
        paths.append(p)
    return paths


def ate_vs_gt(est_centers: np.ndarray, gt_centers: np.ndarray) -> float:
    """Absolute trajectory error after similarity (Umeyama) alignment,
    normalized by the ground-truth trajectory extent."""
    import jax.numpy as jnp

    from ..ops import umeyama

    s, R, t = umeyama.similarity_align(jnp.asarray(est_centers),
                                       jnp.asarray(gt_centers))
    s, R, t = float(s), np.asarray(R), np.asarray(t)
    aligned = s * est_centers @ R.T + t
    err = np.linalg.norm(aligned - gt_centers, axis=1).mean()
    extent = np.linalg.norm(gt_centers - gt_centers.mean(0), axis=1).max()
    return float(err / max(extent, 1e-9))
