"""Dense pairwise-stereo reconstruction driver.

Re-design of the reference DenseReconstruction
(SfM/src/dense_reconstruction.{h,cc}, SURVEY.md §3.5): reads a SURE-format
pose file, epipolar-rectifies each consecutive pair, runs one of the two
XLA stereo backends (ops/sgm.py for the CUDA libSGM path, ops/elas.py for
the CPU ELAS path — DenseOptions.method), converts disparity -> depth ->
world points, writes depth maps + cloud.

Rectification is the linear (Fusiello) method: rotate both cameras onto a
common frame whose x-axis is the baseline, warp via the induced
homographies with bilinear resampling — replacing cv::stereoRectify+remap
(dense_reconstruction.cc:299-331) without OpenCV.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..config import DenseOptions
from ..ops import elas as elas_ops
from ..ops import sgm as sgm_ops


@dataclass
class DensePose:
    name: str
    K: np.ndarray        # (3,3)
    R: np.ndarray        # (3,3) world->cam
    t: np.ndarray        # (3,)
    w: int = 0
    h: int = 0


def read_sure_pose_file(path: str) -> List[DensePose]:
    """Parse the SURE-format pose file (ref ReadinPoseFile,
    dense_reconstruction.cc:70-111): 8 header lines then
    'name w h / K / k1 k2 k3 p1 p2 / t / R' per camera."""
    with open(path) as f:
        lines = f.read().splitlines()
    tok = " ".join(lines[8:]).split()
    it = iter(tok)
    out = []
    try:
        while True:
            name = next(it)
            w, h = int(next(it)), int(next(it))
            K = np.array([float(next(it)) for _ in range(9)]).reshape(3, 3)
            _dist = [float(next(it)) for _ in range(5)]
            t = np.array([float(next(it)) for _ in range(3)])
            R = np.array([float(next(it)) for _ in range(9)]).reshape(3, 3)
            out.append(DensePose(name=name, K=K, R=R, t=t, w=w, h=h))
    except StopIteration:
        pass
    return out


def rectify_pair(K1, R1, t1, K2, R2, t2):
    """Fusiello linear rectification.

    Returns (Rn, Kn, H1, H2, baseline): new shared rotation, intrinsics,
    per-image homographies (new <- old pixel maps use H^-1), baseline.
    """
    c1 = -R1.T @ t1
    c2 = -R2.T @ t2
    b = c2 - c1
    baseline = float(np.linalg.norm(b))
    x = b / max(baseline, 1e-12)
    # y = cross(old z1, x), z = cross(x, y)
    z_old = R1[2, :]
    y = np.cross(z_old, x)
    y /= max(np.linalg.norm(y), 1e-12)
    z = np.cross(x, y)
    Rn = np.stack([x, y, z])
    Kn = (K1 + K2) / 2.0
    Kn[0, 1] = 0.0
    H1 = Kn @ Rn @ R1.T @ np.linalg.inv(K1)
    H2 = Kn @ Rn @ R2.T @ np.linalg.inv(K2)
    return Rn, Kn, H1, H2, baseline


def warp_homography(img, H_inv, out_shape=None):
    """Inverse-map warp with bilinear sampling (jnp)."""
    import jax
    import jax.numpy as jnp
    from ..ops.sift import _bilinear

    Hh, Ww = out_shape or img.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (Hh, Ww), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (Hh, Ww), 1)
    ones = jnp.ones_like(xs)
    pix = jnp.stack([xs, ys, ones], axis=-1)
    src = jnp.einsum("ij,hwj->hwi", jnp.asarray(H_inv, jnp.float32), pix)
    sx = src[..., 0] / jnp.maximum(src[..., 2], 1e-9)
    sy = src[..., 1] / jnp.maximum(src[..., 2], 1e-9)
    coords = jnp.stack([sx, sy], axis=-1)
    return _bilinear(jnp.asarray(img, jnp.float32), coords)


class DenseReconstruction:
    """Per-consecutive-pair dense stereo (ref Run/SGMDense/ELASDense)."""

    def __init__(self, options: DenseOptions):
        self.opts = options

    def run(self, fold: str, pose_file: Optional[str] = None,
            image_loader=None, verbose: bool = False):
        """fold must contain the pose file + images; image_loader(name) may
        override image reading (for tests)."""
        import jax.numpy as jnp

        pose_file = pose_file or os.path.join(fold, "sfm_sure.txt")
        poses = read_sure_pose_file(pose_file)
        out_fold = os.path.join(fold, "dense")
        os.makedirs(out_fold, exist_ok=True)

        def load(name):
            if image_loader is not None:
                return image_loader(name)
            from .database import load_image_gray
            return load_image_gray(os.path.join(fold, name))[0]

        from ..utils.tracing import span

        clouds = []
        for i in range(len(poses) - 1):
            a, b = poses[i], poses[i + 1]
            with span("dense/load_images"):
                img1 = load(a.name)
                img2 = load(b.name)
            with span("dense/rectify"):
                Rn, Kn, H1, H2, baseline = rectify_pair(
                    a.K, a.R, a.t, b.K, b.R, b.t)
                r1 = warp_homography(img1, np.linalg.inv(H1))
                r2 = warp_homography(img2, np.linalg.inv(H2))
            with span("dense/stereo", block_jax=True):
                if self.opts.method == "elas":
                    ep = elas_ops.middlebury_params() \
                        if self.opts.elas_setting == "middlebury" \
                        else elas_ops.ElasParams()
                    disp, valid = elas_ops.stereo_elas(
                        r1, r2, max_disp=self.opts.disp_size, params=ep)
                else:
                    disp, valid = sgm_ops.stereo_sgm(
                        r1, r2, max_disp=self.opts.disp_size, p1=self.opts.p1,
                        p2=self.opts.p2, uniqueness=self.opts.uniqueness,
                        num_paths=self.opts.num_paths)
            f_rect = float(Kn[0, 0])
            depth = sgm_ops.disparity_to_depth(
                disp, f_rect, baseline, self.opts.depth_scale,
                self.opts.depth_clamp)
            # rectified camera pose: Rn, t_n = -Rn c1
            t_n = -Rn @ (-a.R.T @ a.t)
            Xw, mask = sgm_ops.depth_to_points(
                depth, jnp.asarray(np.linalg.inv(Kn), jnp.float32),
                jnp.asarray(Rn, jnp.float32), jnp.asarray(t_n, jnp.float32),
                stride=2)
            np.save(os.path.join(out_fold, f"depth_{i}.npy"),
                    np.asarray(depth))
            with open(os.path.join(out_fold, f"pose_rect_{i}.txt"), "w") as f:
                for row in np.hstack([Rn, t_n[:, None]]):
                    f.write(" ".join(f"{v:.8f}" for v in row) + "\n")
            pts = np.asarray(Xw)[np.asarray(mask)]
            clouds.append(pts)
            if verbose:
                print(f"pair {i}: {int(np.asarray(valid).sum())} valid px, "
                      f"{len(pts)} points")
        if clouds:
            cloud = np.concatenate(clouds)
            with open(os.path.join(out_fold, "dense_cloud.txt"), "w") as f:
                for p in cloud[::max(1, len(cloud) // 2_000_000)]:
                    f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f}\n")
        return clouds
