"""Golden/round-trip tests for every interop writer (io/exports.py).

The reference's writers are its MVS interop surface (SaveforCMVS
sfm_incremental.cc:1247-1394, SaveforOpenMVS :1148-1246, SaveforMSP
slam_gps.cc:1533-1571, SURE format read back by
dense_reconstruction.cc:70-111).  These tests parse every emitted file back
and assert the geometry round-trips — in particular the `.qin` Euler
convention, which must match RotationMatrixToEulerAngles
(basic_funcs.cc:245-249) for MSP.exe to accept the poses.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from metricsfm_tpu.io import exports
from metricsfm_tpu.models.scene import CameraModel, Scene
from metricsfm_tpu.ops import lie, np_geom


@pytest.fixture
def scene_and_obs(rng):
    """3 cameras with non-trivial rotations + 5 tracks with observations."""
    scene = Scene(n_images=3)
    mi = scene.add_camera_model(CameraModel(f=800.0, k1=1e-4, k2=-1e-6))
    rng_np = np.random.default_rng(7)
    kp_xy = {}
    for im in range(3):
        aa = rng_np.normal(0, 0.6, 3)
        t = rng_np.normal(0, 1.0, 3)
        scene.register_image(im, np.concatenate([aa, t]), mi, n_kps=8)
        kp_xy[im] = rng_np.uniform(-200, 200, size=(8, 2))
    for k in range(5):
        xyz = rng_np.normal(0, 2.0, 3) + np.array([0, 0, 6.0])
        scene.add_track(xyz, {0: k, 1: k, 2: k})
    return scene, kp_xy


def test_euler_xyz_roundtrip_and_reference_formula(rng):
    """euler_xyz <-> matrix round-trips, and matrix_to_euler_xyz equals the
    literal reference decomposition rx=atan2(-R12,R22), ry=asin(R02),
    rz=atan2(-R01,R00) (basic_funcs.cc:245-249)."""
    rng_np = np.random.default_rng(3)
    for _ in range(20):
        aa = rng_np.normal(0, 0.8, 3)
        R = np_geom.angle_axis_to_matrix(aa)
        e = np.asarray(lie.matrix_to_euler_xyz(jnp.asarray(R)))
        # literal reference formula
        want = np.array([np.arctan2(-R[1, 2], R[2, 2]),
                         np.arcsin(np.clip(R[0, 2], -1, 1)),
                         np.arctan2(-R[0, 1], R[0, 0])])
        np.testing.assert_allclose(e, want, atol=1e-6)
        # reconstruction: R = Rx @ Ry @ Rz
        R2 = np.asarray(lie.euler_xyz_to_matrix(jnp.asarray(e)))
        np.testing.assert_allclose(R2, R, atol=1e-5)


def test_write_qin_pose_roundtrip(tmp_path, scene_and_obs):
    """Parse pose.qin back: header fields + per-camera center and Euler
    angles must reproduce R_cv2ph @ R under the X-Y-Z convention."""
    scene, _ = scene_and_obs
    path = os.path.join(tmp_path, "pose.qin")
    names = {im: f"img{im}" for im in scene.registered}
    exports.write_qin(path, scene, names, cols=2000, rows=1500)
    lines = open(path).read().strip().split("\n")
    assert int(lines[0]) == 3
    hdr = lines[1].split()
    m = scene.models[0]
    assert abs(float(hdr[0]) - m.f * 0.005) < 1e-9
    assert hdr[5:7] == ["2000", "1500"]
    R_cv2ph = np.diag([1.0, -1.0, -1.0])
    for k, im in enumerate(scene.registered):
        parts = lines[2 + k].split()
        assert parts[0] == f"img{im}.jpg"
        c = np.array([float(v) for v in parts[1:4]])
        np.testing.assert_allclose(c, np_geom.camera_center(scene.poses[im]),
                                   atol=1e-9)
        e = np.array([float(v) for v in parts[4:7]])
        R_emit = np.asarray(lie.euler_xyz_to_matrix(jnp.asarray(e)))
        R, _ = np_geom.pose_to_Rt(scene.poses[im])
        np.testing.assert_allclose(R_emit, R_cv2ph @ R, atol=1e-5)


def test_write_bundler_roundtrip(tmp_path, scene_and_obs):
    scene, kp_xy = scene_and_obs
    path = os.path.join(tmp_path, "bundle.rd.out")
    exports.write_bundler(path, scene, kp_xy)
    lines = open(path).read().strip().split("\n")
    assert lines[0].startswith("# Bundle file v0.3")
    n_img, n_pts = (int(v) for v in lines[1].split())
    assert (n_img, n_pts) == (3, 5)
    # camera block: f k1 k2, 3 rows R, 1 row t
    f, k1, k2 = (float(v) for v in lines[2].split())
    assert abs(f - 800.0) < 1e-6 and abs(k1 - 1e-4) < 1e-10
    R0 = np.array([[float(v) for v in lines[2 + r].split()]
                   for r in range(1, 4)])
    t0 = np.array([float(v) for v in lines[6].split()])
    Rw, tw = np_geom.pose_to_Rt(scene.poses[0])
    np.testing.assert_allclose(R0, Rw, atol=1e-7)
    np.testing.assert_allclose(t0, tw, atol=1e-7)
    # point block: xyz / rgb / view list (len 3 per track)
    pt_base = 2 + 5 * n_img
    xyz = np.array([float(v) for v in lines[pt_base].split()])
    np.testing.assert_allclose(xyz, scene.tracks[0].xyz, atol=1e-7)
    view = lines[pt_base + 2].split()
    assert int(view[0]) == 3
    # first obs: local cam id, kp id, x, y from kp_xy
    assert int(view[1]) == 0 and int(view[2]) == 0
    np.testing.assert_allclose([float(view[3]), float(view[4])],
                               kp_xy[0][0], atol=1e-3)


def test_write_openmvs_decentering(tmp_path, scene_and_obs):
    """Observations must be de-centered back to pixel coords (+px, +py)."""
    scene, kp_xy = scene_and_obs
    path = os.path.join(tmp_path, "sfm_openmvs.txt")
    names = {im: f"im{im}.jpg" for im in scene.registered}
    principal = {im: (1000.0, 750.0) for im in scene.registered}
    sizes = {im: (2000, 1500) for im in scene.registered}
    exports.write_openmvs(path, scene, kp_xy, names, principal, sizes)
    lines = open(path).read().strip().split("\n")
    assert int(lines[0]) == 3
    # each camera: name / f / R / t = 4 lines
    assert lines[1] == "im0.jpg"
    assert abs(float(lines[2]) - 800.0) < 1e-6
    n_pts = int(lines[1 + 4 * 3])
    assert n_pts == 5
    first_obs = lines[1 + 4 * 3 + 2].split()
    x, y = float(first_obs[1]), float(first_obs[2])
    np.testing.assert_allclose([x, y], kp_xy[0][0] + [1000.0, 750.0],
                               atol=1e-3)


def test_write_sure_roundtrip(tmp_path, scene_and_obs):
    """SURE file must be readable by our own dense reader (the reference
    reads it back in dense_reconstruction.cc:70-111)."""
    from metricsfm_tpu.models.dense import read_sure_pose_file
    scene, _ = scene_and_obs
    path = os.path.join(tmp_path, "sfm_sure.txt")
    names = {im: f"cam{im}" for im in scene.registered}
    principal = {im: (1000.0, 750.0) for im in scene.registered}
    sizes = {im: (2000, 1500) for im in scene.registered}
    exports.write_sure(path, scene, names, principal, sizes)
    cams = read_sure_pose_file(path)
    assert len(cams) == 3
    c0 = cams[0]
    Rw, tw = np_geom.pose_to_Rt(scene.poses[0])
    np.testing.assert_allclose(np.asarray(c0.R), Rw, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c0.t), tw, atol=1e-6)
    np.testing.assert_allclose(c0.K[0][0], 800.0, atol=1e-6)


def test_write_cmvs_layout(tmp_path, scene_and_obs):
    scene, kp_xy = scene_and_obs
    fold = os.path.join(tmp_path, "cmvs")
    exports.write_cmvs(fold, scene, kp_xy)
    assert os.path.exists(os.path.join(fold, "cmvs0", "bundle.rd.out"))
    ptxt = os.path.join(fold, "cmvs0", "txt", "00000000.txt")
    lines = open(ptxt).read().strip().split("\n")
    assert lines[0] == "CONTOUR"
    P = np.array([[float(v) for v in ln.split()] for ln in lines[1:4]])
    m = scene.models[0]
    Rw, tw = np_geom.pose_to_Rt(scene.poses[0])
    K = np.array([[m.f, 0, 0], [0, m.f, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(P, K @ np.hstack([Rw, tw[:, None]]), atol=1e-5)


def test_write_point_cloud_counts(tmp_path, scene_and_obs):
    scene, _ = scene_and_obs
    scene.mark_bad(4)
    path = os.path.join(tmp_path, "pts.txt")
    exports.write_point_cloud(path, scene, with_cameras=True)
    lines = open(path).read().strip().split("\n")
    # 4 good tracks + 5 glyph points per camera * 3 cameras
    assert len(lines) == 4 + 5 * 3
    xyz = np.array([float(v) for v in lines[0].split()[:3]])
    np.testing.assert_allclose(xyz, scene.tracks[0].xyz, atol=1e-5)


def test_write_match_visualization(tmp_path):
    """Per-pair match render (ref fine_matching_graph.cc:156-180 debug
    blocks): side-by-side canvas with one line per (subsampled) match."""
    rng = np.random.default_rng(0)
    img_i = rng.uniform(0, 1, size=(48, 64)).astype(np.float32)
    img_j = rng.uniform(0, 1, size=(48, 64)).astype(np.float32)
    xy_i = rng.uniform(-20, 20, size=(30, 2))
    xy_j = rng.uniform(-20, 20, size=(30, 2))
    kp = np.arange(10)
    path = os.path.join(tmp_path, "match.png")
    out = exports.write_match_visualization(
        path, img_i, img_j, xy_i, xy_j, kp, kp,
        good=np.arange(10) % 2 == 0)
    from PIL import Image
    with Image.open(out) as im:
        w, h = im.size
        px = np.asarray(im.convert("RGB"))
    assert (w, h) == (128, 48)
    # drawn lines leave saturated green pixels somewhere on the canvas
    green = (px[..., 1] == 200) & (px[..., 0] == 0)
    assert green.any()
