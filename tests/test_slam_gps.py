"""SLAM-GPS pipeline test on synthetic street-sequence data with GT."""
import math
import os

import jax.numpy as jnp
import numpy as np
import pytest

from metricsfm_tpu.config import street_preset
from metricsfm_tpu.models import slam_gps as sg
from metricsfm_tpu.ops import lie, projection
from metricsfm_tpu.utils import utm as utm_util


def synth_street(tmp_path, rng, n_cams=20, n_pts=200, focal=800.0):
    """Forward-moving camera track with GPS, written in reference formats."""
    resize = 0.5
    cx, cy = 640.0, 360.0
    # ground-truth trajectory: gentle arc in a local UTM-like frame
    lat0, lon0 = 40.0, -83.0
    centers, poses = [], []
    for i in range(n_cams):
        s_ = i * 2.0
        c = np.array([s_, 0.05 * s_ ** 1.2, 1.5 + 0.01 * i])
        yaw = 0.02 * i
        R = np.array([[math.cos(yaw), 0, -math.sin(yaw)],
                      [0, 1, 0],
                      [math.sin(yaw), 0, math.cos(yaw)]])
        # camera looks along +x: rotate world so z_cam = direction of travel
        look = np.array([[0, 0, 1.0], [0, 1, 0], [-1, 0, 0]]) @ R
        t = -look @ c
        centers.append(c)
        poses.append((look, t))

    pts = np.zeros((n_pts, 3))
    pts[:, 0] = rng.uniform(0, n_cams * 2.0, n_pts)       # along track
    pts[:, 1] = rng.uniform(-3, 3, n_pts)
    pts[:, 2] = rng.uniform(3, 12, n_pts)                 # off to the side

    # SLAM frame: similarity-transformed copy of GT (scale 0.3, rotated)
    s_slam = 0.3
    R_slam = np.asarray(lie.angle_axis_to_matrix(jnp.asarray([0.05, 0.3, -0.1])))
    t_slam = np.array([2.0, -1.0, 0.5])

    def to_slam(x):
        return s_slam * R_slam @ x + t_slam

    lines = [str(n_cams)]
    for i, (R, t) in enumerate(poses):
        c = centers[i]
        c_s = to_slam(c)
        R_s = R @ R_slam.T
        t_s = -R_s @ c_s
        fx = focal * resize
        row = [str(i), f"{i * 0.1:.3f}", f"{fx}", f"{fx}",
               f"{cx * resize}", f"{cy * resize}"]
        row += [f"{v:.9f}" for v in t_s]
        row += [f"{v:.9f}" for v in R_s.reshape(-1)]
        lines.append(" ".join(row))

    # observations in resized, uncentered pixels (file convention)
    obs_lines = [str(n_pts)]
    for p in range(n_pts):
        o = []
        for i, (R, t) in enumerate(poses):
            xc = R @ pts[p] + t
            if xc[2] < 0.5:
                continue
            u = focal * xc[0] / xc[2]
            v = focal * xc[1] / xc[2]
            if abs(u) < cx and abs(v) < cy:
                px = (u + rng.normal(0, 0.3)) * resize + cx * resize
                py = (v + rng.normal(0, 0.3)) * resize + cy * resize
                o.append((i, px, py))
        row = [f"{to_slam(pts[p])[0]:.9f}", f"{to_slam(pts[p])[1]:.9f}",
               f"{to_slam(pts[p])[2]:.9f}", str(len(o))]
        for i, px, py in o:
            row += [str(i), f"{px:.4f}", f"{py:.4f}"]
        obs_lines.append(" ".join(row))

    with open(os.path.join(tmp_path, "KeyFramePts.txt"), "w") as f:
        f.write("\n".join(lines + obs_lines))

    # GPS: GT centers interpreted as local UTM offsets from (lat0, lon0)
    e0, n0, zone = utm_util.ll_to_utm(lat0, lon0)
    with open(os.path.join(tmp_path, "pos.txt"), "w") as f:
        for i, c in enumerate(centers):
            lat, lon = utm_util.utm_to_ll(e0 + c[0], n0 + c[1], zone)
            alt = c[2]
            f.write(f"{i} {lat:.9f} {lon:.9f} {alt:.3f}\n")

    with open(os.path.join(tmp_path, "rgb.txt"), "w") as f:
        f.write("# rgb\n# header\n# lines\n")
        for i in range(n_cams):
            f.write(f"{i * 0.1:.2f} rgb/{i}.png\n")

    return centers, pts, (e0, n0)


@pytest.mark.slow
def test_slam_gps_pipeline(tmp_path, rng):
    centers, pts, (e0, n0) = synth_street(str(tmp_path), rng)
    cfg = street_preset()
    pipe = sg.SLAMGPS(cfg)
    scene = pipe.run(str(tmp_path), verbose=False)

    # recovered camera centers should land on the GPS (UTM) track
    est = []
    for img in scene.registered:
        c = np.asarray(projection.camera_center(
            jnp.asarray(scene.poses[img], jnp.float32)))
        est.append(pipe.convert_to_gps(c))
    est = np.array(est)
    gt = np.array([[e0 + c[0], n0 + c[1], 0.0] for c in centers])
    # altitude was averaged in the GPS reader (reference semantics), so
    # compare easting/northing only
    err = np.linalg.norm(est[:, :2] - gt[:, :2], axis=1)
    assert np.median(err) < 1.0, f"median UTM error {np.median(err)}"

    # outputs exist
    out = os.path.join(str(tmp_path), "mtpu_out")
    for fn in ["pose.qin", "sfm_sure.txt", "sfm_openmvs.txt", "cloud.txt",
               "gps_pos.txt"]:
        assert os.path.exists(os.path.join(out, fn)), fn
    assert os.path.exists(os.path.join(str(tmp_path), "accuracy.txt"))


def test_utm_roundtrip():
    lat, lon = 40.001, -83.0125
    e, n, zone = utm_util.ll_to_utm(lat, lon)
    assert zone.startswith("17")
    lat2, lon2 = utm_util.utm_to_ll(e, n, zone)
    assert abs(lat - lat2) < 1e-6
    assert abs(lon - lon2) < 1e-6


def synth_keyframe_features(rng, tmp_path, n_cams=20, n_pts=160,
                            focal=800.0, desc_dim=128):
    """Synthetic keyframe ImageFeatures consistent with synth_street's GT:
    keypoints are centered full-res projections of a shared 3D point set,
    descriptors are per-point unit vectors (+noise) so 2-NN recovers the
    correspondence."""
    from metricsfm_tpu.models.incremental import ImageFeatures

    # regenerate the same GT trajectory as synth_street
    centers, poses = [], []
    for i in range(n_cams):
        s_ = i * 2.0
        c = np.array([s_, 0.05 * s_ ** 1.2, 1.5 + 0.01 * i])
        yaw = 0.02 * i
        R = np.array([[math.cos(yaw), 0, -math.sin(yaw)],
                      [0, 1, 0],
                      [math.sin(yaw), 0, math.cos(yaw)]])
        look = np.array([[0, 0, 1.0], [0, 1, 0], [-1, 0, 0]]) @ R
        poses.append((look, -look @ c))
    pts = np.zeros((n_pts, 3))
    pts[:, 0] = rng.uniform(0, n_cams * 2.0, n_pts)
    pts[:, 1] = rng.uniform(-3, 3, n_pts)
    pts[:, 2] = rng.uniform(3, 12, n_pts)
    track_desc = rng.normal(size=(n_pts, desc_dim)).astype(np.float32)
    track_desc /= np.linalg.norm(track_desc, axis=1, keepdims=True)

    feats = {}
    for i, (R, t) in enumerate(poses):
        xy, desc = [], []
        for p in range(n_pts):
            xc = R @ pts[p] + t
            if xc[2] < 0.5:
                continue
            u = focal * xc[0] / xc[2]
            v = focal * xc[1] / xc[2]
            if abs(u) < 640 and abs(v) < 360:
                xy.append([u + rng.normal(0, 0.3), v + rng.normal(0, 0.3)])
                d = track_desc[p] + rng.normal(0, 0.02, desc_dim).astype(np.float32)
                desc.append(d / np.linalg.norm(d))
        xy = np.array(xy, np.float32)
        desc = np.array(desc, np.float32)
        feats[i] = ImageFeatures(xy=xy, desc=desc,
                                 mask=np.ones(len(xy), bool),
                                 width=1280, height=720, focal_exif=focal)
    return feats


@pytest.mark.slow
def test_slam_gps_rematch_retriangulate(tmp_path, rng):
    """Windowed prior-gated matching + >=3-view re-triangulation
    (ref slam_gps.cc:312-668): re-matching builds multi-view tracks from
    keyframe features and every kept track has >= min_track_views views."""
    centers, pts, (e0, n0) = synth_street(str(tmp_path), rng)
    feats = synth_keyframe_features(rng, str(tmp_path))
    cfg = street_preset()
    pipe = sg.SLAMGPS(cfg)
    scene = pipe.run(str(tmp_path), features=feats, rematch=True)

    good = [t for t in scene.tracks if not t.is_bad]
    assert len(good) >= 50, f"only {len(good)} re-triangulated tracks"
    # the >=3-view filter must hold for every kept track
    assert all(len(t.obs) >= cfg.slam.min_track_views for t in good)
    # many tracks should have MORE than the 2 views the pairwise matches
    # start with (union-find chained them through the window)
    assert sum(len(t.obs) > 3 for t in good) > 10

    # pipeline accuracy is preserved end-to-end with re-built tracks
    est = []
    for img in scene.registered:
        c = np.asarray(projection.camera_center(
            jnp.asarray(scene.poses[img], jnp.float32)))
        est.append(pipe.convert_to_gps(c))
    est = np.array(est)
    gt = np.array([[e0 + c[0], n0 + c[1], 0.0] for c in centers])
    err = np.linalg.norm(est[:, :2] - gt[:, :2], axis=1)
    assert np.median(err) < 1.0, f"median UTM error {np.median(err)}"
