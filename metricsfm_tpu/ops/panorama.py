"""Panorama feature extraction: equirectangular -> per-zone pinhole views.

Re-design of SfM/src/feature/feature_extractor_panorama.{h,cc}: the
reference reprojects an equirectangular panorama into 12 overlapping
cylindrical zones (fov 30x90 deg, f=600, bilinear resample) and runs SIFT
on each; keypoints carry their zone's backprojection so matching works in
a common frame.
"""
from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from . import sift as sift_ops


def zone_to_pano_coords(zone_yaw: float, f: float, out_w: int, out_h: int,
                        pano_w: int, pano_h: int):
    """Pixel grid of one pinhole zone -> (x, y) coords in the panorama."""
    xs = jnp.arange(out_w, dtype=jnp.float32) - out_w / 2.0
    ys = jnp.arange(out_h, dtype=jnp.float32) - out_h / 2.0
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    # pinhole ray (x, y, f) rotated by yaw about the vertical axis
    lon = jnp.arctan2(gx, f) + zone_yaw
    lat = jnp.arctan2(gy, jnp.sqrt(gx * gx + f * f))
    px = (lon / (2 * jnp.pi) + 0.5) % 1.0 * pano_w
    py = (lat / jnp.pi + 0.5) * pano_h
    return jnp.stack([px, py], axis=-1)


def extract_panorama(pano, n_zones: int = 12, fov_deg: float = 30.0,
                     f: float = 600.0, cfg: sift_ops.SiftConfig = None):
    """SIFT over per-zone reprojections of an equirectangular image.

    Returns a list of per-zone dicts (sift.extract outputs + 'yaw'), with
    keypoint xy in zone-centered coords.
    """
    cfg = cfg or sift_ops.SiftConfig(n_octaves=3, max_keypoints=1024)
    H, W = pano.shape
    out_w = int(2 * f * math.tan(math.radians(fov_deg) / 2.0)) or 128
    out_h = min(int(out_w * 3), H)
    outs = []
    from .sift import _bilinear
    for z in range(n_zones):
        yaw = 2 * math.pi * z / n_zones
        coords = zone_to_pano_coords(yaw, f, out_w, out_h, W, H)
        view = _bilinear(jnp.asarray(pano, jnp.float32), coords)
        feats = sift_ops.extract(view, cfg)
        feats = dict(feats)
        feats["yaw"] = yaw
        outs.append(feats)
    return outs
