"""Tests for auxiliary components: homography, geo-verify, calibration,
PSO, GIST, lines, panorama, essential matching, native store, tracing."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metricsfm_tpu.ops import homography, gist, lines, panorama
from metricsfm_tpu.utils import calibration, geo_verification, pso, tracing
from tests.conftest import make_scene


def test_homography_dlt_exact(rng, key):
    H_gt = np.array([[1.1, 0.05, 3.0], [-0.04, 0.95, -2.0], [1e-4, -5e-5, 1.0]])
    p1 = rng.uniform(-200, 200, size=(100, 2))
    h1 = np.c_[p1, np.ones(100)] @ H_gt.T
    p2 = h1[:, :2] / h1[:, 2:]
    H = homography.homography_dlt(jnp.asarray(p1), jnp.asarray(p2))
    err = homography.transfer_error(H, jnp.asarray(p1), jnp.asarray(p2))
    assert float(jnp.max(err)) < 0.5


def test_homography_ransac(rng, key):
    H_gt = np.array([[1.0, 0.1, 5.0], [0.0, 1.05, -3.0], [0.0, 0.0, 1.0]])
    p1 = rng.uniform(-200, 200, size=(150, 2))
    h1 = np.c_[p1, np.ones(150)] @ H_gt.T
    p2 = h1[:, :2] / h1[:, 2:]
    p2[:40] += rng.uniform(30, 80, size=(40, 2))
    res = homography.homography_ransac(jnp.asarray(p1), jnp.asarray(p2), key)
    assert bool(res["ok"])
    inl = np.asarray(res["inlier_mask"])
    assert inl[:40].sum() <= 2 and inl[40:].mean() > 0.9


def test_geo_verification_modes(rng, key):
    scene = make_scene(rng, n_cams=2, n_pts=200, noise_px=0.3)
    sel = np.where(scene["vis"].all(axis=0))[0]
    p1 = scene["obs"][0][sel]
    p2 = scene["obs"][1][sel].copy()
    p2[:30] += 150.0
    ok, inl, F = geo_verification.verify_fundamental(p1, p2, key)
    assert ok and inl[:30].sum() <= 3
    keep2 = geo_verification.refilter_with_fundamental(F, p1, p2)
    assert keep2[30:].mean() > 0.8
    keep3 = geo_verification.verify_local_flow(p1, p2)
    assert keep3[30:].mean() > 0.7
    keep4 = geo_verification.verify_patch_fundamental(p1, p2, key)
    assert keep4[30:].mean() > 0.5


def test_calibration_exact_undistort():
    k1, k2 = -0.2, 0.05
    r_u = jnp.asarray([0.1, 0.3, 0.6], jnp.float32)
    r_d = r_u * (1 + k1 * r_u ** 2 + k2 * r_u ** 4)
    rec = calibration.undistort_radius(r_d, k1, k2)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(r_u), atol=1e-4)


def test_pso_minimize(key):
    def fn(x):
        return jnp.sum((x - jnp.array([1.0, -2.0, 0.5])) ** 2, axis=-1)
    lo = jnp.full((3,), -5.0)
    hi = jnp.full((3,), 5.0)
    best, val = pso.pso_minimize(fn, lo, hi, key, n_particles=48, iters=80)
    assert float(val) < 1e-2
    np.testing.assert_allclose(np.asarray(best), [1.0, -2.0, 0.5], atol=0.1)


def test_gist_descriptor(rng):
    img = jnp.asarray(rng.uniform(0, 1, size=(64, 64)).astype(np.float32))
    v = gist.gist_descriptor(img)
    assert v.shape == (4 * 8 * 16,)
    np.testing.assert_allclose(float(jnp.linalg.norm(v)), 1.0, atol=1e-4)
    # translation changes descriptor less than a different image
    v2 = gist.gist_descriptor(jnp.roll(img, 2, axis=1))
    v3 = gist.gist_descriptor(jnp.asarray(rng.uniform(0, 1, size=(64, 64)).astype(np.float32)))
    assert float(v @ v2) > float(v @ v3)


def test_hough_detects_line(rng):
    img = np.zeros((64, 64), np.float32)
    img[:, 30] = 1.0  # vertical line x=30
    out = lines.detect_lines(jnp.asarray(img), max_lines=4)
    th = np.asarray(out["theta"])
    rho = np.asarray(out["rho"])
    # vertical edge -> theta ~ 0, rho ~ 29-31
    best = 0
    assert abs(np.cos(th[best])) > 0.9
    assert abs(abs(rho[best]) - 30) < 3


def test_panorama_zones(rng):
    pano = jnp.asarray(rng.uniform(0, 1, size=(128, 512)).astype(np.float32))
    import metricsfm_tpu.ops.sift as sift_ops
    cfg = sift_ops.SiftConfig(n_octaves=2, max_keypoints=64)
    zones = panorama.extract_panorama(pano, n_zones=4, cfg=cfg)
    assert len(zones) == 4
    assert all("desc" in z and "yaw" in z for z in zones)


def test_essential_guided_matching(rng, key):
    from metricsfm_tpu.ops import essential_matching
    scene = make_scene(rng, n_cams=2, n_pts=256, noise_px=0.2)
    sel = np.where(scene["vis"].all(axis=0))[0][:192]
    f = float(scene["intrs"][0][0])
    desc = rng.normal(size=(len(sel), 128)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    d2 = desc + 0.02 * rng.normal(size=desc.shape).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    res = essential_matching.match_pair_essential(
        jnp.asarray(desc), jnp.asarray(d2),
        jnp.asarray(scene["obs"][0][sel]), jnp.asarray(scene["obs"][1][sel]),
        f, f, key)
    inl = np.asarray(res["inlier_mask"])
    idx2 = np.asarray(res["idx2"])
    assert inl.sum() > 100
    assert (idx2[inl] == np.arange(len(sel))[inl]).mean() > 0.95


def test_native_store_roundtrip(tmp_path, rng):
    from metricsfm_tpu.io import native_store as ns
    if not ns.available():
        pytest.skip("native toolchain unavailable")
    xy = rng.normal(size=(64, 2)).astype(np.float32)
    desc = rng.normal(size=(64, 128)).astype(np.float32)
    p = str(tmp_path / "f.msf")
    assert ns.write_features(p, xy, desc, np.ones(64, np.uint8),
                             np.ones(64, np.float32), np.zeros(64, np.float32),
                             640, 480, 500.0)
    d = ns.read_features(p)
    np.testing.assert_allclose(d["xy"], xy)
    np.testing.assert_allclose(d["desc"], desc)
    bd, bm, n_ok = ns.load_desc_batch([p, p, p], 128)
    assert n_ok == 3 and bd.shape == (3, 128, 128)
    np.testing.assert_allclose(bd[0, :64], desc)
    assert bm[0, :64].all() and not bm[0, 64:].any()


def test_tracer():
    tr = tracing.Tracer()
    with tr.span("a"):
        sum(range(1000))
    with tr.span("a"):
        pass
    assert tr.counts["a"] == 2
    assert "a" in tr.report()


def test_undistort_image_inverts_distortion(rng):
    """undistort_image recovers the ideal image from a synthetically
    distorted one (ref SaveUndistortedImage warp semantics)."""
    from metricsfm_tpu.io.exports import undistort_image

    H, W, f = 80, 100, 120.0
    k1, k2 = -0.15, 0.02
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    ideal = 0.5 + 0.25 * np.sin(xs * 0.35) + 0.25 * np.cos(ys * 0.3)

    # build the distorted image: distorted pixel p_d samples the ideal
    # image at its undistorted position (exact radial inverse)
    cx, cy = W / 2.0, H / 2.0
    xn = (xs - cx) / f
    yn = (ys - cy) / f
    xy_n = jnp.asarray(np.stack([xn, yn], -1).reshape(-1, 2))
    xy_u = np.asarray(calibration.undistort_points_exact(
        xy_n, jnp.float32(k1), jnp.float32(k2))).reshape(H, W, 2)
    sx = cx + f * xy_u[..., 0]
    sy = cy + f * xy_u[..., 1]
    from metricsfm_tpu.ops.sift import _bilinear
    distorted = np.asarray(_bilinear(jnp.asarray(ideal),
                                     jnp.asarray(np.stack([sx, sy], -1))))

    out = np.asarray(undistort_image(distorted, f, k1, k2))
    err = np.abs(out - ideal)[10:-10, 10:-10]
    assert np.median(err) < 0.01, np.median(err)


def test_write_undistorted_images(tmp_path, rng):
    from PIL import Image

    from metricsfm_tpu.io.exports import write_undistorted_images
    from metricsfm_tpu.models.scene import CameraModel, Scene

    img = (rng.uniform(0, 1, size=(32, 40, 3)) * 255).astype(np.uint8)
    src = str(tmp_path / "img0.png")
    Image.fromarray(img).save(src)

    scene = Scene(1, 1_000_000)
    scene.add_camera_model(CameraModel(f=100.0, k1=0.0, k2=0.0,
                                       f_hint=100.0, calibrated=True))
    scene.register_image(0, np.zeros(6), 0, 10)
    out = str(tmp_path / "und")
    written = write_undistorted_images(out, scene, {0: src})
    assert len(written) == 1
    back = np.asarray(Image.open(written[0]), dtype=np.float32)
    # zero distortion -> near-identity resample
    assert np.abs(back[2:-2, 2:-2] - img[2:-2, 2:-2].astype(np.float32)).max() <= 1.5


def test_detect_segments_endpoints():
    """A finite bright segment (not a full-frame line): detect_segments
    must bound its extent, not return the infinite Hough line
    (ref utils/lsd.cc LineSegmentDetection rectangle bounds)."""
    img = np.zeros((96, 96), np.float32)
    img[20:60, 40] = 1.0          # vertical segment x=40, y in [20, 60)
    out = lines.detect_segments(jnp.asarray(img), max_segments=4)
    ok = np.asarray(out["ok"])
    assert ok[0], "top Hough peak must pass the density gate"
    p0 = np.asarray(out["p0"][0])
    p1 = np.asarray(out["p1"][0])
    ys = sorted([p0[1], p1[1]])
    assert abs(p0[0] - 40) < 3 and abs(p1[0] - 40) < 3
    assert abs(ys[0] - 20) < 5 and abs(ys[1] - 60) < 5


def test_local_orientation_step_edge():
    """At a vertical step edge the dominant local gradient is +-x; in a
    flat region it is zero (ref local_orientation.cc CalOrientation)."""
    img = np.zeros((80, 80), np.float32)
    img[:, 40:] = 1.0
    pts = np.array([[40.0, 40.0],     # on the edge
                    [15.0, 15.0]])    # flat region (window stays left)
    d = np.asarray(lines.local_orientation(jnp.asarray(img),
                                           jnp.asarray(pts), win_half=8))
    assert abs(d[0, 0]) > 0.95 and abs(d[0, 1]) < 0.3
    assert np.allclose(d[1], 0.0, atol=1e-6)


def test_debug_cloud_dumps(tmp_path, rng):
    """Per-added-image pts{N}.txt dumps behind the debug flag
    (ref sfm_incremental.cc:204-205,1425-1463)."""
    import os
    from metricsfm_tpu.io.exports import write_point_cloud
    from metricsfm_tpu.models.scene import CameraModel, Scene
    scene = Scene(n_images=2)
    m = scene.add_camera_model(CameraModel(f=100.0))
    scene.register_image(0, np.zeros(6), m, n_kps=4)
    scene.add_track([0.0, 0.0, 5.0], {0: 0})
    p = str(tmp_path / "pts0.txt")
    write_point_cloud(p, scene)
    rows = open(p).read().strip().splitlines()
    assert len(rows) == 1 + 5            # 1 point + 5-point frustum glyph
    assert rows[0].split()[3:] == ["255", "255", "255"]


def test_track_overlay_image(tmp_path, rng):
    from PIL import Image
    from metricsfm_tpu.io.exports import write_track_overlay_image
    est = rng.normal(size=(12, 3)).cumsum(axis=0)
    gps = est + rng.normal(0, 0.05, est.shape)
    p = str(tmp_path / "overlay.png")
    write_track_overlay_image(p, est, gps, size=200)
    im = np.asarray(Image.open(p).convert("RGB"))
    assert im.shape == (200, 200, 3)
    # both colors present
    assert (im == np.array([0, 160, 0])).all(axis=-1).any()
    assert (im == np.array([220, 0, 0])).all(axis=-1).any()
