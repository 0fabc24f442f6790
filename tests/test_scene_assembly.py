"""Vectorized BAProblem assembly vs a straightforward per-track reference.

Scene.to_ba_problem materializes fixed-shape arrays from the flat
observation log with numpy only (round-3: the per-track Python loop it
replaced dominated full_ba/partial_ba wall time at 200 images).  This
pins its output — including the V-cap rotation pattern, keep-last
observation overwrite semantics, weights, and mutability masks — against
the obvious dict-walking implementation (ref BundleAdjustment problem
construction, optimizer.cc:54-141).
"""
import numpy as np
import pytest

from metricsfm_tpu.models.scene import CameraModel, Scene, bucket


def _reference_fill(scene, kp_xy, imgs, live, V, weight_multiview,
                    mutable_points):
    """The pre-vectorization per-track loop, kept as the spec."""
    img_to_row = {im: i for i, im in enumerate(imgs)}
    P = bucket(max(len(live), 1))
    track_cam = np.zeros((P, V), np.int32)
    track_uv = np.zeros((P, V, 2))
    track_mask = np.zeros((P, V), bool)
    track_weight = np.ones((P,))
    point_mut = np.zeros((P,))
    for row, ti in enumerate(live):
        t = scene.tracks[ti]
        # canonical observation order: ascending camera row (the
        # vectorized path groups by (track, img); dict insertion order is
        # not meaningful to the solver — slots are mask-reduced)
        reg = sorted(((im, kp) for im, kp in t.obs.items()
                      if im in img_to_row),
                     key=lambda p: img_to_row[p[0]])
        if len(reg) > V:
            n = len(reg)
            sel = sorted({(k * n // V + row) % n for k in range(V)})
            reg = [reg[k] for k in sel]
        for n_obs, (im, kp) in enumerate(reg):
            track_cam[row, n_obs] = img_to_row[im]
            track_uv[row, n_obs] = kp_xy[im][kp]
            track_mask[row, n_obs] = True
        if len(reg) >= 3:
            track_weight[row] = weight_multiview
        point_mut[row] = 1.0
    if mutable_points is not None:
        mset = set(mutable_points)
        for row, ti in enumerate(live):
            if ti not in mset:
                point_mut[row] = 0.0
    return track_cam, track_uv, track_mask, track_weight, point_mut


def _random_scene(rng, n_imgs=12, n_tracks=300, max_obs=20, n_kp=64):
    scene = Scene(n_imgs)
    mi = scene.add_camera_model(CameraModel(f=500.0))
    kp_xy = {}
    for im in range(n_imgs):
        kp_xy[im] = rng.normal(size=(n_kp, 2)) * 100
        scene.register_image(im, rng.normal(size=6), mi, n_kp)
    for _ in range(n_tracks):
        k = int(rng.integers(2, max_obs))
        ims = rng.choice(n_imgs, size=min(k, n_imgs), replace=False)
        obs = {int(im): int(rng.integers(0, n_kp)) for im in ims}
        scene.add_track(rng.normal(size=3), obs)
    # observation overwrites (dict keep-last) + later additions
    for ti in rng.choice(n_tracks, size=n_tracks // 8, replace=False):
        im = int(rng.integers(0, n_imgs))
        scene.add_observation(int(ti), im, int(rng.integers(0, n_kp)))
    # culled tracks drop out entirely
    for ti in rng.choice(n_tracks, size=n_tracks // 12, replace=False):
        scene.mark_bad(int(ti))
    return scene, kp_xy


@pytest.mark.parametrize("V,mutable_frac,subset", [
    (8, None, False),      # full problem, no point freezing
    (4, 0.5, False),       # aggressive V cap + frozen points
    (16, None, True),      # local (images+tracks restricted) problem
])
def test_to_ba_problem_matches_reference_loop(rng, V, mutable_frac, subset):
    scene, kp_xy = _random_scene(rng)
    if subset:
        imgs = sorted(int(i) for i in rng.choice(12, size=7, replace=False))
        tracks = sorted(int(t) for t in rng.choice(300, 120, replace=False))
        live = [t for t in tracks if not scene.tracks[t].is_bad]
        kp_sub = {im: kp_xy[im] for im in imgs}
    else:
        imgs = scene.registered
        tracks = None
        live = [i for i, t in enumerate(scene.tracks) if not t.is_bad]
        kp_sub = kp_xy
    mutable_points = (sorted(int(t) for t in
                             rng.choice(live, size=int(len(live) *
                                                       mutable_frac),
                                        replace=False))
                      if mutable_frac else None)

    prob, maps = scene.to_ba_problem(
        kp_sub, max_views=V, mutable_points=mutable_points,
        weight_multiview=2.0, images=imgs if subset else None,
        tracks=tracks)
    assert maps["tracks"] == live

    cam_r, uv_r, mask_r, w_r, mut_r = _reference_fill(
        scene, kp_sub, imgs, live, V, 2.0, mutable_points)

    got_mask = np.asarray(prob.track_mask, bool)
    np.testing.assert_array_equal(got_mask, mask_r)
    # slots are filled in the same (img-minor) order
    np.testing.assert_array_equal(
        np.where(got_mask, np.asarray(prob.track_cam), -1),
        np.where(mask_r, cam_r, -1))
    np.testing.assert_allclose(
        np.where(got_mask[..., None], np.asarray(prob.track_uv), 0.0),
        np.where(mask_r[..., None], uv_r, 0.0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob.track_weight), w_r)
    np.testing.assert_allclose(np.asarray(prob.point_mut), mut_r)


def test_reset_tracks_clears_observation_log(rng):
    scene, kp_xy = _random_scene(rng, n_imgs=4, n_tracks=20)
    scene.reset_tracks()
    for im in range(4):
        scene.kp_to_track[im][:] = -1
    scene.add_track(np.zeros(3), {0: 1, 1: 2})
    prob, maps = scene.to_ba_problem(kp_xy, max_views=4)
    assert maps["tracks"] == [0]
    assert int(np.asarray(prob.track_mask).sum()) == 2
