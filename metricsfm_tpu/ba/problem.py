"""Bundle-adjustment problem representation.

Re-design of the reference's pointer-graph problem construction
(SfM/src/optimizer.cc:62-129: per-observation Ceres residual blocks chosen
from a mutability matrix) as fixed-shape masked arrays:

* Tracks ARE the observation grouping: a track tensor of shape (P, V) holds,
  per 3D point, up to V observing views (camera index, centered uv, mask).
  This mirrors the reference's `map<globalKpId, Camera*>` track structure
  (structure.h:64-67) with static shapes for XLA.
* Mutability masks replace the 2x2 functor matrix (optimizer.cc:86-125):
  pose_mut (C,), intr_mut (M,), point_mut (P,) — a masked dof is frozen by
  zeroing its rows/cols in the reduced system.
* Shared vs per-image camera models (use_same_camera) are expressed by the
  cam_model index map (C,) -> M intrinsic blocks.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class BAProblem(NamedTuple):
    """Static-shape BA problem. All arrays are device arrays.

    Shapes: C cameras, M camera models, P points, V max views per track.
    """
    poses: jnp.ndarray        # (C, 6)  [angle-axis, t] world->cam
    intrs: jnp.ndarray        # (M, 3)  [f, k1, k2]
    cam_model: jnp.ndarray    # (C,)    int32 camera -> model index
    points: jnp.ndarray       # (P, 3)
    track_cam: jnp.ndarray    # (P, V)  int32 camera index (0 where masked)
    track_uv: jnp.ndarray     # (P, V, 2) centered pixel observations
    track_mask: jnp.ndarray   # (P, V)  bool
    track_weight: jnp.ndarray  # (P,)   per-track residual weight (ref :1012)
    pose_mut: jnp.ndarray     # (C,)   1.0 = free, 0.0 = frozen
    intr_mut: jnp.ndarray     # (M,)
    point_mut: jnp.ndarray    # (P,)
    # GPS camera-center anchors (ref gps_error_pose_absolute.h): residual
    # gps_weight * (camera_center(pose) - gps_pos); weight 0 disables.
    # Per-axis weights express the reference's z/5 down-weighting.
    gps_pos: jnp.ndarray      # (C, 3) UTM-offset anchor positions
    gps_weight: jnp.ndarray   # (C, 3) per-axis residual weights
    # Full 6-dof pose priors (ref cam_error_pose_absolute.h, available but
    # off by default): residual pose_prior_weight * (pose - pose_prior).
    pose_prior: jnp.ndarray        # (C, 6)
    pose_prior_weight: jnp.ndarray  # (C, 6)
    # GPS *relative* constraints over camera triples (i, j, k) — ref
    # gps_error_pose_raletive_angle.h (triangle angle at j) and
    # gps_error_pose_raletive_dis.h (distance ratio |ci-cj|/|cj-ck|),
    # selected in slam_gps.cc:716-830 (off by default there too).
    # Residuals: w0*(cos angle_est - cos angle_gps), w1*(ratio_est - ratio_gps).
    gps_triple: jnp.ndarray        # (T, 3) int32 camera indices
    gps_triple_weight: jnp.ndarray  # (T, 2) [angle_w, dist_w]; 0 disables

    @property
    def n_cameras(self):
        return self.poses.shape[0]

    @property
    def n_models(self):
        return self.intrs.shape[0]

    @property
    def n_points(self):
        return self.points.shape[0]

    @property
    def max_views(self):
        return self.track_cam.shape[1]

    @property
    def n_camera_dofs(self):
        return 6 * self.n_cameras + 3 * self.n_models

    def n_observations(self):
        return jnp.sum(self.track_mask.astype(jnp.int32))


def build_problem(poses, intrs, cam_model, points, track_cam, track_uv,
                  track_mask, track_weight=None, pose_mut=None, intr_mut=None,
                  point_mut=None, gps_pos=None, gps_weight=None,
                  pose_prior=None, pose_prior_weight=None,
                  gps_triple=None, gps_triple_weight=None,
                  dtype=jnp.float32) -> BAProblem:
    """Assemble a BAProblem from host arrays, filling default masks."""
    poses = jnp.asarray(poses, dtype)
    intrs = jnp.asarray(intrs, dtype)
    points = jnp.asarray(points, dtype)
    P = points.shape[0]
    C = poses.shape[0]
    M = intrs.shape[0]
    if track_weight is None:
        track_weight = jnp.ones((P,), dtype)
    return BAProblem(
        poses=poses,
        intrs=intrs,
        cam_model=jnp.asarray(cam_model, jnp.int32),
        points=points,
        track_cam=jnp.asarray(track_cam, jnp.int32),
        track_uv=jnp.asarray(track_uv, dtype),
        track_mask=jnp.asarray(track_mask, bool),
        track_weight=jnp.asarray(track_weight, dtype),
        pose_mut=jnp.ones((C,), dtype) if pose_mut is None else jnp.asarray(pose_mut, dtype),
        intr_mut=jnp.ones((M,), dtype) if intr_mut is None else jnp.asarray(intr_mut, dtype),
        point_mut=jnp.ones((P,), dtype) if point_mut is None else jnp.asarray(point_mut, dtype),
        gps_pos=jnp.zeros((C, 3), dtype) if gps_pos is None else jnp.asarray(gps_pos, dtype),
        gps_weight=jnp.zeros((C, 3), dtype) if gps_weight is None else jnp.asarray(gps_weight, dtype),
        pose_prior=jnp.zeros((C, 6), dtype) if pose_prior is None else jnp.asarray(pose_prior, dtype),
        pose_prior_weight=jnp.zeros((C, 6), dtype) if pose_prior_weight is None
        else jnp.asarray(pose_prior_weight, dtype),
        # one zero-weight placeholder triple keeps shapes static and nonzero
        gps_triple=jnp.zeros((1, 3), jnp.int32) if gps_triple is None
        else jnp.asarray(gps_triple, jnp.int32),
        gps_triple_weight=jnp.zeros((1, 2), dtype) if gps_triple_weight is None
        else jnp.asarray(gps_triple_weight, dtype),
    )


def normalize_problem(problem: BAProblem, target_scale: float = 100.0):
    """Recentre points at the median and rescale MAD to target_scale.

    Reference BundleAdjuster::Normalize (optimizer.cc:155-195), applied
    before seed BA to condition the problem.  Returns (problem, (center, s))
    so callers can undo the transform.
    """
    m = problem.track_mask.any(axis=1)
    w = m.astype(problem.points.dtype)
    # median via sort (masked entries pushed to +inf)
    big = jnp.where(m[:, None], problem.points, jnp.inf)
    med = jnp.nanmedian(jnp.where(jnp.isinf(big), jnp.nan, big), axis=0)
    dev = jnp.sum(jnp.abs(problem.points - med), axis=-1)
    mad = jnp.sum(dev * w) / jnp.maximum(jnp.sum(w), 1.0)
    s = target_scale / jnp.maximum(mad, 1e-8)

    new_points = (problem.points - med) * s
    # pose update under similarity x' = s(x - med): R' = R, t' = s t + s R med...
    # projection invariance: R x + t = (1/s)(R x' + (s t + R med s)) -> t' = s*(t + R med)
    from ..ops import lie
    R = jax.vmap(lambda p: lie.angle_axis_to_matrix(p[:3]))(problem.poses)
    t = problem.poses[:, 3:6]
    t_new = s * (t + jnp.einsum("cij,j->ci", R, med))
    new_poses = jnp.concatenate([problem.poses[:, :3], t_new], axis=-1)
    new_gps = (problem.gps_pos - med) * s
    return problem._replace(points=new_points, poses=new_poses,
                            gps_pos=new_gps), (med, s)


def denormalize_problem(problem: BAProblem, transform):
    """Undo normalize_problem."""
    med, s = transform
    from ..ops import lie
    new_points = problem.points / s + med
    R = jax.vmap(lambda p: lie.angle_axis_to_matrix(p[:3]))(problem.poses)
    t = problem.poses[:, 3:6]
    t_new = t / s - jnp.einsum("cij,j->ci", R, med)
    new_poses = jnp.concatenate([problem.poses[:, :3], t_new], axis=-1)
    return problem._replace(points=new_points, poses=new_poses,
                            gps_pos=problem.gps_pos / s + med)


def perturb_problem(problem: BAProblem, key, sigma_rot=0.1, sigma_t=0.5,
                    sigma_pt=0.5):
    """Gaussian perturbation of the seed reconstruction
    (reference BundleAdjuster::Perturb, optimizer.cc:197-232)."""
    k1, k2, k3 = jax.random.split(key, 3)
    d_rot = sigma_rot * jax.random.normal(k1, problem.poses[:, :3].shape,
                                          problem.poses.dtype)
    d_t = sigma_t * jax.random.normal(k2, problem.poses[:, 3:].shape,
                                      problem.poses.dtype)
    d_p = sigma_pt * jax.random.normal(k3, problem.points.shape,
                                       problem.points.dtype)
    poses = problem.poses + jnp.concatenate([d_rot, d_t], axis=-1)
    return problem._replace(poses=poses, points=problem.points + d_p)
