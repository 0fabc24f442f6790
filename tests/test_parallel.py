"""Multi-device tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metricsfm_tpu.ba import LMConfig, solve_lm
from metricsfm_tpu.parallel import make_mesh, solve_lm_sharded
from metricsfm_tpu.parallel.sharded_matching import match_pairs_sharded
from tests.conftest import make_scene
from tests.test_ba import scene_to_problem, perturb


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_ba_matches_single_device(rng):
    scene = make_scene(rng, n_cams=5, n_pts=128)
    prob = scene_to_problem(scene)
    pose_mut = jnp.ones((5,)).at[0].set(0.0)
    prob = prob._replace(pose_mut=pose_mut,
                         intr_mut=jnp.zeros_like(prob.intr_mut))
    bad = perturb(prob, rng, sig_pose=0.01, sig_pt=0.05)

    cfg = LMConfig(max_iterations=40)
    out_single, info_single = solve_lm(bad, cfg)

    mesh = make_mesh(8)
    out_shard, info_shard = solve_lm_sharded(bad, mesh, cfg)

    # same final cost (identical math, order-of-summation differences only)
    c1 = float(info_single["final_cost"])
    c2 = float(info_shard["final_cost"])
    assert abs(c1 - c2) / max(c1, 1e-9) < 0.05 or max(c1, c2) < 1e-3
    np.testing.assert_allclose(np.asarray(out_shard.poses),
                               np.asarray(out_single.poses), atol=1e-2)


def test_sharded_ba_convergence(rng):
    scene = make_scene(rng, n_cams=6, n_pts=256)
    prob = scene_to_problem(scene)
    prob = prob._replace(pose_mut=jnp.ones((6,)).at[0].set(0.0),
                         intr_mut=jnp.zeros_like(prob.intr_mut))
    bad = perturb(prob, rng, sig_pose=0.01, sig_pt=0.05)
    mesh = make_mesh(8)
    out, info = solve_lm_sharded(bad, mesh, LMConfig(max_iterations=40))
    n_obs = int(np.asarray(bad.track_mask).sum())
    rms = np.sqrt(2.0 * float(info["final_cost"]) / n_obs)
    assert rms < 0.1


def test_sharded_matching(rng):
    B, N, D = 8, 128, 128
    d = rng.normal(size=(B, N, D)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    noise = d + 0.02 * rng.normal(size=d.shape).astype(np.float32)
    noise /= np.linalg.norm(noise, axis=-1, keepdims=True)
    mask = np.ones((B, N), bool)
    mesh = make_mesh(8)
    res = match_pairs_sharded(d, noise, mask, mask, mesh)
    idx2 = np.asarray(res["idx2"])
    good = np.asarray(res["good"])
    # identity matching per pair
    for b in range(B):
        g = good[b]
        assert g.sum() > N * 0.7
        assert (idx2[b][g] == np.arange(N)[g]).mean() > 0.99
