"""ELAS-style dense stereo backend tests (ops/elas.py vs known disparity)."""
import numpy as np
import jax.numpy as jnp

from metricsfm_tpu.ops import elas
from tests.test_sgm_dense import textured_scene


def test_sobel_descriptor_shape(rng):
    img = jnp.asarray(rng.uniform(0, 1, size=(40, 56)).astype(np.float32))
    d = elas.sobel_descriptor(img)
    assert d.shape == (40, 56, 16)
    # constant image -> zero gradients -> zero descriptor
    d0 = elas.sobel_descriptor(jnp.ones((40, 56), jnp.float32) * 0.5)
    np.testing.assert_allclose(np.asarray(d0)[2:-2, 2:-2], 0.0, atol=1e-4)


def test_support_matches_recover_disparity(rng):
    left, right, disp_gt = textured_scene(rng)
    dl = elas.sobel_descriptor(jnp.asarray(left))
    dr = elas.sobel_descriptor(jnp.asarray(right))
    sup_d, sup_v = elas.support_matches(dl, dr, 32, elas.ElasParams())
    sup_d = np.asarray(sup_d)
    sup_v = np.asarray(sup_v)
    s = elas.ElasParams().candidate_stepsize
    gt = disp_gt[s // 2::s, s // 2::s]
    # support points must exist and agree with GT where valid (skip the
    # out-of-range left band)
    sel = sup_v.copy()
    sel[:, : 32 // s + 1] = False
    assert sel.sum() > 50
    err = np.abs(sup_d - gt)[sel]
    assert np.median(err) < 1.0, np.median(err)


def test_fill_prior_interpolates():
    # sparse plane samples -> filled plane
    gy, gx = 24, 32
    yy, xx = np.mgrid[0:gy, 0:gx]
    plane = (4.0 + 0.2 * xx + 0.1 * yy).astype(np.float32)
    valid = (yy % 4 == 0) & (xx % 4 == 0)
    filled = np.asarray(elas.fill_prior(jnp.asarray(plane * valid),
                                        jnp.asarray(valid)))
    err = np.abs(filled - plane)[2:-2, 2:-2]
    assert np.median(err) < 0.5, np.median(err)


def test_elas_recovers_disparity(rng):
    """Same oracle as test_sgm_recovers_disparity: the ELAS backend must
    recover the synthetic piecewise-constant disparity."""
    left, right, disp_gt = textured_scene(rng)
    disp, valid = elas.stereo_elas(jnp.asarray(left), jnp.asarray(right),
                                   max_disp=32)
    disp = np.asarray(disp)
    valid = np.asarray(valid)
    region = np.zeros_like(valid)
    region[4:-4, 40:-8] = True
    sel = valid & region
    assert sel.mean() > 0.3, f"too few valid pixels: {sel.mean()}"
    err = np.abs(disp - disp_gt)[sel]
    assert np.median(err) < 1.0, f"median disparity error {np.median(err)}"
    assert (err < 2).mean() > 0.9


def test_dense_driver_elas_method(tmp_path, rng):
    """DenseReconstruction with method='elas' (ref ELASDense,
    dense_reconstruction.cc:192-297) runs end-to-end."""
    import os
    from metricsfm_tpu.config import DenseOptions
    from metricsfm_tpu.models.dense import DenseReconstruction

    left, right, _ = textured_scene(rng, H=64, W=96, max_disp=16)
    H, W = left.shape
    K = np.diag([80.0, 80.0, 1.0])
    poses = {"a.png": (np.eye(3), np.zeros(3)),
             "b.png": (np.eye(3), np.array([-0.5, 0.0, 0.0]))}
    with open(os.path.join(tmp_path, "sfm_sure.txt"), "w") as f:
        for _ in range(8):
            f.write("#\n")
        for name, (R, t) in poses.items():
            f.write(f"{name} {W} {H}\n")
            for row in K:
                f.write(" ".join(str(v) for v in row) + "\n")
            f.write("0 0 0 0 0\n")
            f.write(" ".join(str(v) for v in t) + "\n")
            for row in R:
                f.write(" ".join(str(v) for v in row) + "\n")
    imgs = {"a.png": left, "b.png": right}
    dr = DenseReconstruction(DenseOptions(disp_size=32, method="elas"))
    clouds = dr.run(str(tmp_path), image_loader=lambda n: imgs[n])
    assert len(clouds) == 1
    assert len(clouds[0]) > 200


def test_elas_middlebury_interpolates_more(rng):
    left, right, disp_gt = textured_scene(rng)
    _, v_rob = elas.stereo_elas(jnp.asarray(left), jnp.asarray(right),
                                max_disp=32)
    _, v_mid = elas.stereo_elas(jnp.asarray(left), jnp.asarray(right),
                                max_disp=32, params=elas.middlebury_params())
    assert float(jnp.mean(v_mid)) >= float(jnp.mean(v_rob))
