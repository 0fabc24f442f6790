"""Hierarchical submap BA + Sim(3) pose-graph merge (parallel/submap_ba)."""
import numpy as np
import jax
import pytest

from metricsfm_tpu.ba.lm import LMConfig
from metricsfm_tpu.models.scene import CameraModel, Scene
from metricsfm_tpu.models.accuracy import assess
from metricsfm_tpu.parallel import submap_ba
from metricsfm_tpu.parallel.mesh import make_mesh
from metricsfm_tpu.ops import np_geom
from tests.conftest import make_scene


def test_partition_images():
    parts = submap_ba.partition_images(list(range(40)), max_cams=12,
                                       overlap=3)
    assert parts[0] == list(range(12))
    # windows advance by max_cams - overlap and cover everything
    covered = set()
    for a, b in zip(parts[:-1], parts[1:]):
        assert len(set(a) & set(b)) >= 3
        covered |= set(a) | set(b)
    assert covered == set(range(40))
    assert submap_ba.partition_images(list(range(10)), 12, 3) == \
        [list(range(10))]


def _noisy_scene(rng, gt, pose_sigma=0.01, pt_sigma=0.05):
    C = gt["poses"].shape[0]
    P = gt["points"].shape[0]
    scene = Scene(C, 1_000_000)
    mi = scene.add_camera_model(CameraModel(
        f=float(gt["intrs"][0, 0]), k1=0.0, k2=0.0,
        f_hint=float(gt["intrs"][0, 0]), calibrated=True))
    for i in range(C):
        noise = rng.normal(0, pose_sigma, 6)
        scene.register_image(i, gt["poses"][i] + noise, mi, P)
    for p in range(P):
        obs = {i: p for i in range(C) if gt["vis"][i, p]}
        if len(obs) >= 2:
            scene.add_track(gt["points"][p] + rng.normal(0, pt_sigma, 3),
                            obs)
    return scene


@pytest.mark.slow
def test_hierarchical_ba_improves(rng):
    gt = make_scene(rng, n_cams=24, n_pts=400, focal=900.0, noise_px=0.2)
    scene = _noisy_scene(rng, gt)
    kp_xy = {i: gt["obs"][i] for i in range(24)}

    before = assess(scene, kp_xy)["avg_err"]
    info = submap_ba.hierarchical_ba(
        scene, kp_xy, max_cams=10, overlap=3, max_views=8,
        cfg=LMConfig(max_iterations=40))
    after = assess(scene, kp_xy)["avg_err"]
    assert after < before * 0.5, (before, after)
    assert after < 1.0, after

    # camera centers land near ground truth (gauge cams were near-GT)
    err = []
    for i in scene.registered:
        c_est = np_geom.camera_center(scene.poses[i])
        c_gt = np_geom.camera_center(gt["poses"][i])
        err.append(np.linalg.norm(c_est - c_gt))
    assert np.median(err) < 0.3, np.median(err)


def test_solve_submaps_on_mesh(rng):
    """Batch axis sharded over the 8-device CPU mesh."""
    gt = make_scene(rng, n_cams=18, n_pts=200, focal=900.0, noise_px=0.2)
    scene = _noisy_scene(rng, gt)
    kp_xy = {i: gt["obs"][i] for i in range(18)}
    parts = submap_ba.partition_images(scene.registered, max_cams=8,
                                       overlap=2)
    probs, infos = submap_ba.build_submap_problems(scene, kp_xy, parts)
    mesh = make_mesh()
    out, info = submap_ba.solve_submaps(
        probs, LMConfig(max_iterations=15), mesh=mesh)
    assert out.poses.shape[0] == len(parts)
    final = np.asarray(info["final_cost"])
    initial = np.asarray(info["initial_cost"])
    assert (final <= initial + 1e-6).all()
    assert (final < initial * 0.9).any()


def test_pose_graph_recovers_chain(rng):
    """Three submaps offset by known similarities are stitched back."""
    base = rng.uniform(-1, 1, size=(6, 3)) * np.array([4.0, 1.0, 2.0])
    centers, pairs = [], []
    # submap 0: identity; submap 1 and 2: transformed copies
    T_true = [np.zeros(7)]
    for k in range(1, 3):
        aa = rng.normal(0, 0.1, 3)
        t = rng.normal(0, 0.5, 3)
        ls = rng.normal(0, 0.1)
        T_true.append(np.concatenate([aa, t, [ls]]))
    centers.append(base)
    for k in range(1, 3):
        # submap k's frame: inverse transform of the true one
        R = np_geom.angle_axis_to_matrix(T_true[k][:3])
        s = float(np.exp(T_true[k][6]))
        inv = (base - T_true[k][3:6]) @ R / s
        centers.append(inv)
        pairs.append((0, k, base[:4], inv[:4]))
    T = submap_ba.optimize_pose_graph(centers, pairs, identity_weight=0.0)
    for k in range(1, 3):
        R = np_geom.angle_axis_to_matrix(T[k, :3])
        s = float(np.exp(T[k, 6]))
        back = s * centers[k] @ R.T + T[k, 3:6]
        assert np.abs(back - base).max() < 1e-2, k
