"""End-to-end images -> SIFT -> matching -> reconstruction -> exports.

This is the documented usage of the reference (test_sfm.cc:22-73: point
IncrementalSfM at a folder of images and run), exercised here on a rendered
synthetic scene with exact ground truth (utils/synth.py): three textured
planes at different depths viewed from 6 cameras on an arc.  Unlike
test_incremental.py (which feeds synthetic identity matches), every stage
here runs on real pixels: SIFT extraction, brute-force 2-NN + ratio +
F-RANSAC matching, seed selection, PnP localization, triangulation, and
bundle adjustment.
"""
import dataclasses
import os

import numpy as np
import pytest

from metricsfm_tpu.config import PRESETS
from metricsfm_tpu.models.database import Database
from metricsfm_tpu.models.incremental import IncrementalSfM
from metricsfm_tpu.models.match_graph import build_match_graph
from metricsfm_tpu.ops import np_geom
from metricsfm_tpu.utils import synth

N_CAMS = 6
FOCAL = 640.0


def _cfg():
    cfg = PRESETS["web"]()
    return dataclasses.replace(
        cfg,
        database=dataclasses.replace(cfg.database, resize=False,
                                     max_keypoints=2048),
        graph=dataclasses.replace(cfg.graph, matching_type="all"))


@pytest.fixture(scope="module")
def rendered(tmp_path_factory):
    fold = str(tmp_path_factory.mktemp("e2e_images"))
    scene = synth.render_scene(seed=0, n_cams=N_CAMS, width=640, height=480,
                               focal=FOCAL)
    synth.write_scene_images(fold, scene)
    return fold, scene


@pytest.fixture(scope="module")
def reconstruction(rendered):
    """Run the exact cmd_sfm composition: Database -> build_match_graph ->
    IncrementalSfM."""
    fold, gt = rendered
    cfg = _cfg()
    db = Database(fold, cfg.database)
    db.feature_extraction()
    matches = build_match_graph(db, cfg)
    feats = {i: db.features(i) for i in range(db.n_images)}
    sfm = IncrementalSfM(feats, matches, cfg)
    scenes = sfm.run()
    return db, feats, matches, scenes, gt


def test_matching_recall_on_real_pixels(reconstruction):
    """Adjacent rendered views must produce hundreds of verified matches."""
    _, _, matches, _, _ = reconstruction
    for i in range(N_CAMS - 1):
        m = matches.get((i, i + 1))
        assert m is not None and len(m.kp_i) > 200, \
            f"pair ({i},{i + 1}): {0 if m is None else len(m.kp_i)} matches"


def test_full_registration_and_ate(reconstruction):
    _, _, _, scenes, gt = reconstruction
    assert scenes, "no model reconstructed"
    scene = max(scenes, key=lambda s: len(s.registered))
    assert len(scene.registered) == N_CAMS, \
        f"registered {len(scene.registered)}/{N_CAMS}"
    assert scene.n_points() > 400
    est = np.stack([np_geom.camera_center(scene.poses[i])
                    for i in scene.registered])
    ate = synth.ate_vs_gt(est, gt["centers"][scene.registered])
    assert ate < 0.02, f"ATE {ate:.4f} of trajectory extent"


def test_focal_selfcalibration(reconstruction):
    """WEB mode has no EXIF focal: it must be recovered from F matrices and
    refined by BA (ref relative_pose_from_fundamental_matrix.cc:56-123)."""
    _, _, _, scenes, _ = reconstruction
    scene = max(scenes, key=lambda s: len(s.registered))
    for m in scene.models:
        assert abs(m.f - FOCAL) / FOCAL < 0.03, f"focal {m.f} vs {FOCAL}"


def test_reprojection_error(reconstruction):
    from metricsfm_tpu.models import accuracy
    _, feats, _, scenes, _ = reconstruction
    scene = max(scenes, key=lambda s: len(s.registered))
    kp_xy = {i: feats[i].xy for i in scene.registered}
    stats = accuracy.assess(scene, kp_xy)
    assert stats["n_obs"] > 1500
    assert stats["avg_err"] < 1.0, f"avg reproj {stats['avg_err']:.3f}px"


def test_cli_sfm_runs_and_exports(rendered, capsys):
    """Drive the real CLI on the same folder (features/matches resume from
    the store, reconstruction + all exports re-run) and check artifacts +
    the stage-time table (SURVEY §5: observability the reference lacks)."""
    from metricsfm_tpu import cli
    fold, _ = rendered
    cli.main(["sfm", fold, "--mode", "web", "--max-kp", "2048",
              "--no-resize", "--matching", "all"])
    captured = capsys.readouterr().out
    assert "-- stage times --" in captured
    assert "sfm/reconstruct" in captured
    model = os.path.join(fold, "mtpu_db", "model_0")
    for f in ["bundle.rd.out", "cloud.txt", "sfm_openmvs.txt",
              "sfm_sure.txt"]:
        assert os.path.exists(os.path.join(model, f)), f
    assert os.path.isdir(os.path.join(model, "cmvs"))
    assert os.path.isdir(os.path.join(model, "undistort_images"))
    # bundler export must describe the full camera set
    with open(os.path.join(model, "bundle.rd.out")) as fh:
        header = fh.readlines()[1].split()
    assert int(header[0]) == N_CAMS