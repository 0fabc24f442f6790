"""End-to-end incremental SfM on a synthetic scene with known ground truth.

The synthetic oracle (SURVEY.md §4): generate cameras/points, project, feed
per-point descriptor identities as matches, reconstruct, compare poses and
structure to ground truth up to a similarity transform.
"""
import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from metricsfm_tpu.config import web_preset, uav_preset
from metricsfm_tpu.models.incremental import (ImageFeatures, IncrementalSfM,
                                              PairMatches)
from metricsfm_tpu.ops import umeyama
from tests.conftest import make_scene


def build_inputs(scene, noise_px=0.3, rng=None):
    """Synthetic features: keypoint k of image i observes point k."""
    C = scene["poses"].shape[0]
    P = scene["points"].shape[0]
    feats = {}
    for i in range(C):
        xy = scene["obs"][i] + (rng.normal(0, noise_px, size=(P, 2)) if noise_px else 0)
        feats[i] = ImageFeatures(
            xy=xy.astype(np.float64), desc=None,
            mask=scene["vis"][i], width=2000, height=1500,
            focal_exif=0.0)
    matches = {}
    for i, j in itertools.combinations(range(C), 2):
        vis = scene["vis"][i] & scene["vis"][j]
        kp = np.where(vis)[0]
        matches[(i, j)] = PairMatches(kp_i=kp, kp_j=kp)
    return feats, matches


def align_to_gt(est_pts, gt_pts):
    s, R, t = umeyama.similarity_align(jnp.asarray(est_pts, jnp.float32),
                                       jnp.asarray(gt_pts, jnp.float32))
    pred = float(s) * np.asarray(est_pts) @ np.asarray(R).T + np.asarray(t)
    return pred, (float(s), np.asarray(R), np.asarray(t))


@pytest.mark.slow
def test_incremental_reconstruction(rng):
    scene = make_scene(rng, n_cams=6, n_pts=250, focal=1100.0, noise_px=0.3)
    feats, matches = build_inputs(scene, noise_px=0.3, rng=rng)
    cfg = web_preset()
    sfm = IncrementalSfM(feats, matches, cfg, seed=0)
    out = sfm.run(max_models=1)
    assert len(out) == 1
    rec = out[0]
    assert len(rec.registered) == 6, f"registered {rec.registered}"
    assert rec.n_points() > 150

    # focal recovered
    for m in rec.models:
        assert abs(m.f - 1100.0) / 1100.0 < 0.1, m.f

    # structure accuracy after similarity alignment
    live = [(t.xyz, list(t.obs.values())[0]) for t in rec.tracks if not t.is_bad]
    # track row r observes kp index = point index by construction
    est, gt = [], []
    for t in rec.tracks:
        if t.is_bad:
            continue
        kp = next(iter(t.obs.values()))
        est.append(t.xyz)
        gt.append(scene["points"][kp])
    est, gt = np.array(est), np.array(gt)
    pred, _ = align_to_gt(est, gt)
    rmse = np.sqrt(((pred - gt) ** 2).sum(1).mean())
    spread = np.sqrt(((gt - gt.mean(0)) ** 2).sum(1).mean())
    assert rmse / spread < 0.02, f"relative structure error {rmse/spread}"

    # camera centers accuracy under the same transform
    from metricsfm_tpu.ops import projection
    est_c = np.array([np.asarray(projection.camera_center(jnp.asarray(rec.poses[i], jnp.float32)))
                      for i in rec.registered])
    gt_c = np.array([np.asarray(projection.camera_center(jnp.asarray(scene["poses"][i], jnp.float32)))
                     for i in rec.registered])
    predc, _ = align_to_gt(est_c, gt_c)
    ate = np.sqrt(((predc - gt_c) ** 2).sum(1).mean())
    scene_scale = np.sqrt(((gt_c - gt_c.mean(0)) ** 2).sum(1).mean())
    assert ate / max(scene_scale, 1e-6) < 0.05, f"relative ATE {ate/scene_scale}"


@pytest.mark.slow
def test_incremental_shared_camera(rng):
    """UAV preset: one shared camera model across all images."""
    scene = make_scene(rng, n_cams=5, n_pts=200, focal=900.0, noise_px=0.2)
    feats, matches = build_inputs(scene, noise_px=0.2, rng=rng)
    cfg = uav_preset()
    sfm = IncrementalSfM(feats, matches, cfg, seed=1)
    out = sfm.run(max_models=1)
    rec = out[0]
    assert len(rec.registered) >= 4
    assert len(rec.models) == 1
    assert abs(rec.models[0].f - 900.0) / 900.0 < 0.1


def test_checkpoint_resume(rng, tmp_path):
    """temp_result{N} checkpointing + re-entry (ref sfm_incremental.cc:83-110,
    :207-211, :1465-1749)."""
    import dataclasses
    import glob

    scene = make_scene(rng, n_cams=6, n_pts=250, focal=1100.0, noise_px=0.3)
    feats, matches = build_inputs(scene, noise_px=0.3, rng=rng)
    cfg = web_preset()
    cfg = dataclasses.replace(cfg, sfm=dataclasses.replace(
        cfg.sfm, checkpoint_every=2))
    ckpt = str(tmp_path / "ck")
    sfm = IncrementalSfM(feats, matches, cfg, seed=0)
    out = sfm.run(max_models=1, checkpoint_dir=ckpt)
    s1 = out[0]
    assert len(s1.registered) == 6
    files = glob.glob(ckpt + "/temp_result*.npz")
    assert files, "checkpoint file written"

    # round-trip fidelity
    from metricsfm_tpu.models.scene import Scene
    s2 = Scene.load(files[0])
    assert s2.registered == s1.registered
    assert s2.n_points() == s1.n_points()
    np.testing.assert_allclose(s2.poses[s1.registered[1]],
                               s1.poses[s1.registered[1]], rtol=1e-7)
    assert len(s2.models) == len(s1.models)
    assert abs(s2.models[0].f - s1.models[0].f) < 1e-9

    # resume: a fresh driver re-enters from the checkpoint without
    # re-seeding (everything registered -> no further work needed)
    sfm2 = IncrementalSfM(feats, matches, cfg, seed=0)
    out2 = sfm2.run(max_models=1, checkpoint_dir=ckpt, resume=True)
    assert out2 and out2[0].registered == s1.registered
    assert out2[0].n_points() == s1.n_points()


def test_incremental_hierarchical_full_ba(rng):
    """Full BA routes through the hierarchical submap solver above the
    camera threshold (SfMOptions.th_hierarchical_cameras)."""
    import dataclasses

    scene = make_scene(rng, n_cams=6, n_pts=250, focal=1100.0, noise_px=0.3)
    feats, matches = build_inputs(scene, noise_px=0.3, rng=rng)
    cfg = web_preset()
    cfg = dataclasses.replace(cfg, sfm=dataclasses.replace(
        cfg.sfm, th_hierarchical_cameras=4, submap_max_cams=4,
        submap_overlap=2))
    sfm = IncrementalSfM(feats, matches, cfg, seed=0)
    out = sfm.run(max_models=1)
    rec = out[0]
    assert len(rec.registered) == 6, rec.registered
    assert rec.n_points() > 150

    est = np.stack([np.asarray(rec.tracks[t].xyz) for t in range(len(rec.tracks))
                    if not rec.tracks[t].is_bad])
    # reprojection quality close to the dense-BA path
    from metricsfm_tpu.models.accuracy import assess
    kp_xy = {i: feats[i].xy for i in rec.registered}
    st = assess(rec, kp_xy)
    assert st["avg_err"] < 2.0, st["avg_err"]
