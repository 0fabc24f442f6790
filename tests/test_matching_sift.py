import jax
import jax.numpy as jnp
import numpy as np

from metricsfm_tpu.ops import matching, sift


def unit_rows(rng, n, d=128):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_knn2_exact(rng):
    d1 = unit_rows(rng, 100)
    d2 = unit_rows(rng, 333)
    d1sq, d2sq, idx = matching.knn2(jnp.asarray(d1), jnp.asarray(d2),
                                    chunk=128, use_bf16=False)
    # brute force numpy
    dist = ((d1[:, None] - d2[None]) ** 2).sum(-1)
    order = np.argsort(dist, axis=1)
    np.testing.assert_array_equal(np.asarray(idx), order[:, 0])
    np.testing.assert_allclose(np.asarray(d1sq), dist[np.arange(100), order[:, 0]], atol=1e-4)
    np.testing.assert_allclose(np.asarray(d2sq), dist[np.arange(100), order[:, 1]], atol=1e-4)


def test_knn2_masked(rng):
    d1 = unit_rows(rng, 50)
    d2 = np.concatenate([unit_rows(rng, 60), d1[:10]])  # best matches at end
    mask2 = np.ones(70, bool)
    mask2[60:] = False  # exclude the exact matches
    _, _, idx = matching.knn2(jnp.asarray(d1), jnp.asarray(d2),
                              jnp.asarray(mask2), chunk=32, use_bf16=False)
    assert np.asarray(idx).max() < 60


def test_match_pair_ratio(rng):
    base = unit_rows(rng, 200)
    noise = rng.normal(size=base.shape).astype(np.float32) * 0.02
    d2 = base + noise
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    perm = rng.permutation(200)
    res = matching.match_pair(jnp.asarray(base), jnp.asarray(d2[perm]))
    idx2 = np.asarray(res["idx2"])
    good = np.asarray(res["good"])
    inv = np.argsort(perm)
    assert good.sum() > 150
    assert (idx2[good] == inv[good]).mean() > 0.99


def test_match_bf16_agrees(rng):
    d1 = unit_rows(rng, 128)
    d2 = unit_rows(rng, 256)
    _, _, i_f32 = matching.knn2(jnp.asarray(d1), jnp.asarray(d2), use_bf16=False)
    _, _, i_bf16 = matching.knn2(jnp.asarray(d1), jnp.asarray(d2), use_bf16=True)
    # bf16 ranking can differ on near-ties only
    assert (np.asarray(i_f32) == np.asarray(i_bf16)).mean() > 0.95


def checkerboard_image(rng, H=128, W=128, n_blobs=30):
    img = np.zeros((H, W), np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    for _ in range(n_blobs):
        cy, cx = rng.uniform(16, H - 16), rng.uniform(16, W - 16)
        s = rng.uniform(1.5, 4.0)
        a = rng.uniform(0.3, 1.0) * rng.choice([-1, 1])
        img += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    img -= img.min()
    img /= img.max()
    return img


def test_sift_detects_blobs(rng):
    img = checkerboard_image(rng)
    cfg = sift.SiftConfig(n_octaves=3, max_keypoints=256)
    out = sift.extract(jnp.asarray(img), cfg)
    n = int(np.asarray(out["mask"]).sum())
    assert n > 10
    # descriptors normalized
    d = np.asarray(out["desc"])[np.asarray(out["mask"])]
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-3)


def test_sift_translation_matching(rng):
    img = checkerboard_image(rng, H=160, W=160)
    shift = 7
    img2 = np.roll(img, (shift, shift), axis=(0, 1))
    cfg = sift.SiftConfig(n_octaves=3, max_keypoints=256)
    o1 = sift.extract(jnp.asarray(img), cfg)
    o2 = sift.extract(jnp.asarray(img2), cfg)
    res = matching.match_pair(o1["desc"], o2["desc"], o1["mask"], o2["mask"],
                              ratio_good=0.7, ratio_all=0.9)
    good = np.asarray(res["good"])
    assert good.sum() >= 10
    xy1 = np.asarray(o1["xy"])[good]
    xy2 = np.asarray(o2["xy"])[np.asarray(res["idx2"])[good]]
    d = xy2 - xy1
    # majority of matches should see the (shift, shift) translation
    err = np.linalg.norm(d - np.array([shift, shift]), axis=1)
    assert np.median(err) < 2.0


def test_knn2_pallas_matches_xla(rng):
    """Fused Pallas 2-NN kernel (interpret mode on CPU) agrees with the
    XLA matmul matcher — best/second distances and argmax indices."""
    import jax.numpy as jnp
    from metricsfm_tpu.ops import matching
    from metricsfm_tpu.ops.pallas.match_kernel import knn2_pallas

    d1 = rng.normal(size=(300, 128)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 = rng.normal(size=(500, 128)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    mask2 = np.ones(500, bool)
    mask2[450:] = False

    p1, p2, pidx = knn2_pallas(jnp.asarray(d1), jnp.asarray(d2),
                               jnp.asarray(mask2), tile=128,
                               interpret=True)
    x1, x2, xidx = matching.knn2(jnp.asarray(d1), jnp.asarray(d2),
                                 jnp.asarray(mask2))
    assert float((np.asarray(pidx) == np.asarray(xidx)).mean()) > 0.999
    assert int(np.asarray(pidx).max()) < 450  # mask respected
    np.testing.assert_allclose(np.asarray(p1), np.asarray(x1), atol=2e-2)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(x2), atol=2e-2)


def test_knn2_pallas_batched_vmap(rng):
    """vmap over the Pallas kernel (the production batching path) agrees
    with per-pair XLA results."""
    import jax
    import jax.numpy as jnp
    from metricsfm_tpu.ops import matching
    from metricsfm_tpu.ops.pallas.match_kernel import _knn2_pallas_impl

    B, N = 3, 256
    d1 = rng.normal(size=(B, N, 128)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 = rng.normal(size=(B, N, 128)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    fn = jax.vmap(lambda a, b: _knn2_pallas_impl(a, b, tile=128,
                                                 interpret=True))
    p1, p2, pidx = fn(jnp.asarray(d1), jnp.asarray(d2))
    for b in range(B):
        x1, x2, xidx = matching.knn2(jnp.asarray(d1[b]), jnp.asarray(d2[b]))
        # quantized packing (2^-17) may flip argmax on near-exact ties
        assert float((np.asarray(pidx[b]) == np.asarray(xidx)).mean()) > 0.99
        np.testing.assert_allclose(np.asarray(p1[b]), np.asarray(x1), atol=2e-2)


def _blob_image(centers, H=128, W=128, s=2.5):
    yy, xx = np.mgrid[0:H, 0:W]
    img = np.zeros((H, W), np.float32)
    for cy, cx, a in centers:
        img += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    img -= img.min()
    m = img.max()
    return img / m if m > 0 else img


def test_sift_subpixel_repeatability(rng):
    """3D quadratic refinement (vlfeat vl_sift semantics): keypoints on an
    analytically shifted scene must track a 0.5-px shift to < 0.2 px."""
    centers = [(rng.uniform(20, 108), rng.uniform(20, 108),
                rng.uniform(0.5, 1.0) * rng.choice([-1, 1]))
               for _ in range(25)]
    shifted = [(cy + 0.5, cx + 0.5, a) for cy, cx, a in centers]
    cfg = sift.SiftConfig(n_octaves=3, max_keypoints=256)
    o1 = sift.extract(jnp.asarray(_blob_image(centers)), cfg)
    o2 = sift.extract(jnp.asarray(_blob_image(shifted)), cfg)
    xy1 = np.asarray(o1["xy"])[np.asarray(o1["mask"])]
    xy2 = np.asarray(o2["xy"])[np.asarray(o2["mask"])]
    assert len(xy1) > 10 and len(xy2) > 10
    # for each kp in img1, its nearest neighbour in img2 should sit at
    # +(0.5, 0.5) to subpixel accuracy
    d = np.linalg.norm(xy2[None, :, :] - (xy1[:, None, :] + 0.5), axis=-1)
    nn = d.min(axis=1)
    matched = nn[nn < 1.0]
    assert len(matched) >= 0.5 * len(xy1)
    assert np.median(matched) < 0.2


def test_sift_multi_orientation_slots(rng):
    """The 80%-peak rule emits secondary-orientation slots sharing the
    primary's location but with a different angle."""
    img = checkerboard_image(rng, H=160, W=160)
    cfg = sift.SiftConfig(n_octaves=3, max_keypoints=512)
    out = sift.extract(jnp.asarray(img), cfg)
    xy = np.asarray(out["xy"])[np.asarray(out["mask"])]
    ang = np.asarray(out["angle"])[np.asarray(out["mask"])]
    # find location-duplicate pairs (same detection, two orientations)
    d = np.linalg.norm(xy[None] - xy[:, None], axis=-1)
    np.fill_diagonal(d, 1e9)
    i, j = np.where(d < 1e-4)
    dup = [(a, b) for a, b in zip(i, j) if a < b]
    assert len(dup) >= 1
    for a, b in dup[:20]:
        diff = np.abs((ang[a] - ang[b] + np.pi) % (2 * np.pi) - np.pi)
        assert diff > 0.3  # genuinely different orientations


def test_sift_refined_sigma_off_grid(rng):
    """Scale refinement produces sigmas off the discrete k^lvl grid."""
    img = checkerboard_image(rng)
    cfg = sift.SiftConfig(n_octaves=3, max_keypoints=256)
    out = sift.extract(jnp.asarray(img), cfg)
    sig = np.asarray(out["sigma"])[np.asarray(out["mask"])]
    k = 2.0 ** (1.0 / cfg.n_scales)
    # distance to the nearest discrete level in log space
    logs = np.log(sig / cfg.sigma0) / np.log(k)
    off = np.abs(logs - np.round(logs))
    assert (off > 0.05).mean() > 0.5
