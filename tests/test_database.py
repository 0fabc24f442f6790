"""Database driver: batched feature extraction, stores, resume, words.

End-to-end over real image files (ref Database::FeatureExtraction,
database.cc:51-107, and the feature_index resume semantics :62-100).
"""
import os

import numpy as np
import pytest
from PIL import Image

from metricsfm_tpu.config import DatabaseOptions
from metricsfm_tpu.models.database import Database, load_image_gray


def _blob_image(rng, H, W, n_blobs=40):
    """Gray image with Gaussian blobs (SIFT-detectable)."""
    img = np.full((H, W), 0.3, np.float32)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    for _ in range(n_blobs):
        cy = rng.uniform(16, H - 16)
        cx = rng.uniform(16, W - 16)
        s = rng.uniform(2.0, 5.0)
        a = rng.uniform(0.3, 0.6) * rng.choice([-1, 1])
        img += a * np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * s * s))
    return np.clip(img, 0, 1)


@pytest.fixture
def image_fold(tmp_path, rng):
    # two different sizes -> two shape buckets
    sizes = [(96, 128), (96, 128), (120, 160)]
    for k, (H, W) in enumerate(sizes):
        img = (_blob_image(rng, H, W) * 255).astype(np.uint8)
        Image.fromarray(img).save(str(tmp_path / f"img_{k}.png"))
    return str(tmp_path)


def test_feature_extraction_batched(image_fold):
    opts = DatabaseOptions(resize=False, max_keypoints=512)
    db = Database(image_fold, opts)
    assert db.n_images == 3
    db.feature_extraction(batch_size=2)
    for i in range(3):
        f = db.features(i)
        assert f.mask.sum() > 10, f"image {i}: {f.mask.sum()} kps"
        # centered coords within the original image bounds
        xy = f.xy[f.mask]
        assert np.all(np.abs(xy[:, 0]) <= f.width / 2 + 1)
        assert np.all(np.abs(xy[:, 1]) <= f.height / 2 + 1)
        assert f.desc is not None and f.desc.shape[1] == 128

    # keypoints land on the planted blobs: detections in the padded zone
    # would show as x > W/2 (bucket is 256-padded)
    f2 = db.features(2)
    assert f2.width == 160 and f2.height == 120


def test_feature_extraction_resume(image_fold):
    opts = DatabaseOptions(resize=False, max_keypoints=512)
    db = Database(image_fold, opts)
    db.feature_extraction()
    xy0 = db.features(0).xy.copy()
    # delete one store record (native or npz) -> only that image is recomputed
    from metricsfm_tpu.io import store as fstore
    for p in (fstore._fpath(db.out, 1), fstore._npath(db.out, 1)):
        if os.path.exists(p):
            os.remove(p)
    assert not fstore.has_features(db.out, 1)
    db2 = Database(image_fold, opts)
    db2.feature_extraction()
    np.testing.assert_allclose(db2.features(0).xy, xy0)
    assert db2.features(1).mask.sum() > 10


def test_native_store_pipeline_parity(image_fold):
    """use_native_store routes the SAME records through the C++ raw store
    (native/feature_store.cpp): pipeline reads must be bit-identical to
    the .npz path (ref binary per-image IO, database.cc:490-541)."""
    import shutil

    from metricsfm_tpu.io import native_store, store as fstore
    if not native_store.available():
        pytest.skip("native toolchain unavailable")
    opts_n = DatabaseOptions(resize=False, max_keypoints=512,
                             use_native_store=True)
    db_n = Database(image_fold, opts_n, output_fold=image_fold + "/out_n")
    db_n.feature_extraction()
    assert os.path.exists(fstore._npath(db_n.out, 0)), \
        "native record not written"
    opts_p = DatabaseOptions(resize=False, max_keypoints=512,
                             use_native_store=False)
    db_p = Database(image_fold, opts_p, output_fold=image_fold + "/out_p")
    db_p.feature_extraction()
    for i in range(db_n.n_images):
        fn, fp = db_n.features(i), db_p.features(i)
        np.testing.assert_array_equal(fn.xy.astype(np.float32),
                                      fp.xy.astype(np.float32))
        np.testing.assert_array_equal(fn.desc, fp.desc)
        np.testing.assert_array_equal(fn.mask, fp.mask)
        assert (fn.width, fn.height) == (fp.width, fp.height)
        assert db_n.gps(i) == db_p.gps(i)
    shutil.rmtree(db_n.out, ignore_errors=True)
    shutil.rmtree(db_p.out, ignore_errors=True)


def test_extraction_matches_unbatched(image_fold, rng):
    """Bucketed/padded batch path agrees with direct single-image extract."""
    import jax.numpy as jnp
    from metricsfm_tpu.ops import sift

    opts = DatabaseOptions(resize=False, max_keypoints=512)
    db = Database(image_fold, opts)
    db.feature_extraction(batch_size=2)
    img, _ = load_image_gray(db.image_paths[0])
    direct = sift.extract(jnp.asarray(img),
                          sift.SiftConfig(max_keypoints=512))
    dm = np.asarray(direct["mask"])
    dxy = np.asarray(direct["xy"])[dm]
    f = db.features(0)
    bxy = f.xy[f.mask]
    # every direct keypoint (away from the border) has a batched twin
    border = 12
    sel = (np.abs(dxy[:, 0]) < img.shape[1] / 2 - border) & \
        (np.abs(dxy[:, 1]) < img.shape[0] / 2 - border)
    for p in dxy[sel][:50]:
        assert np.min(np.linalg.norm(bxy - p, axis=1)) < 1.5, p
