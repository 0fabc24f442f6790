"""Retrieval layer: k-means vocabulary, BoW transform, inverted-file
similarity, candidate selection, word-intersection seeding, and the
Database word stage with resume.

Reference: fbow vocabulary (database.cc:655-867), SimilarityGraph
(graph/similarity_graph.cc:47-117), initial matching graph candidate
selection + word-id seeding (initial_matching_graph.cc:164-294).
"""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metricsfm_tpu.config import DatabaseOptions, PRESETS
from metricsfm_tpu.io import store as fstore
from metricsfm_tpu.models.database import Database
from metricsfm_tpu.models.match_graph import (build_match_graph,
                                              candidates_bow)
from metricsfm_tpu.ops import kmeans as km


# -- core k-means / transform ----------------------------------------------

def _clustered_descs(rng, n_clusters=6, per=80, d=32, sep=4.0, noise=0.15):
    centers = rng.normal(size=(n_clusters, d)) * sep
    descs = np.repeat(centers, per, axis=0) + rng.normal(
        0, noise, size=(n_clusters * per, d))
    labels = np.repeat(np.arange(n_clusters), per)
    return descs.astype(np.float32), centers.astype(np.float32), labels


def test_kmeans_recovers_clusters(rng, key):
    descs, centers, labels = _clustered_descs(rng)
    cent = np.asarray(km.kmeans(jnp.asarray(descs), key, k=6, iters=25))
    # every true center must have a recovered centroid nearby
    d = np.linalg.norm(centers[:, None] - cent[None, :], axis=-1)
    assert (d.min(axis=1) < 0.5).all()


def test_vocabulary_transform_groups_cluster_members(rng, key):
    descs, _, labels = _clustered_descs(rng)
    voc = km.train_vocabulary(jnp.asarray(descs), key, branch1=3, branch2=2)
    assert voc.n_words == 6
    words, counts = km.transform(voc, jnp.asarray(descs))
    words = np.asarray(words)
    # deterministic
    w2, _ = km.transform(voc, jnp.asarray(descs))
    assert (words == np.asarray(w2)).all()
    # same-cluster descriptors overwhelmingly share one word
    purity = np.mean([np.bincount(words[labels == c]).max()
                      / (labels == c).sum() for c in range(6)])
    assert purity > 0.9
    assert counts.sum() == len(descs)


def test_transform_mask_excludes_rows(rng, key):
    descs, _, _ = _clustered_descs(rng, n_clusters=3, per=30)
    voc = km.train_vocabulary(jnp.asarray(descs), key, branch1=2, branch2=2)
    mask = np.ones(len(descs), bool)
    mask[:10] = False
    words, counts = km.transform(voc, jnp.asarray(descs), jnp.asarray(mask))
    assert (np.asarray(words)[:10] == -1).all()
    assert float(counts.sum()) == mask.sum()


def test_similarity_matrix_stop_words_and_idf():
    # word 0 present in all images -> inverted list longer than
    # stop_word_frac * n_words -> stop word, contributes nothing;
    # word 1 shared only by images 0,1 -> drives their similarity
    counts = np.zeros((8, 16), np.float32)
    counts[:, 0] = 5.0
    counts[0, 1] = counts[1, 1] = 3.0
    counts[2, 2] = 4.0  # unique word: no pair
    sim = np.asarray(km.similarity_matrix(jnp.asarray(counts),
                                          stop_word_frac=0.4))
    assert np.allclose(np.diag(sim), 0.0)
    assert sim[0, 1] > 0.9
    assert sim[0, 2] == pytest.approx(0.0, abs=1e-6)
    assert sim[3, 4] == pytest.approx(0.0, abs=1e-6)  # only stop word shared


def test_word_intersection_counts():
    counts = np.zeros((3, 8), np.float32)
    counts[0, [0, 1, 2, 3]] = 1.0
    counts[1, [2, 3, 4]] = 2.0
    counts[2, [7]] = 1.0
    inter = np.asarray(km.word_intersection_counts(jnp.asarray(counts)))
    assert inter[0, 1] == 2.0
    assert inter[0, 2] == 0.0
    assert inter[1, 1] == 3.0


def test_candidates_bow_count_rule():
    # the reference rule: k = min(max(min_c, n/10), max_c) per image
    n = 30
    sim = np.random.default_rng(0).uniform(0.1, 1.0, size=(n, n))
    sim = (sim + sim.T) / 2
    np.fill_diagonal(sim, 0.0)
    pairs = candidates_bow(sim, min_c=2, max_c=3)
    per_img = np.zeros(n, int)
    for i, j in pairs:
        per_img[i] += 1
        per_img[j] += 1
    assert (per_img >= 3).all()      # everyone got k=3 picks (mutual adds more)
    assert len(pairs) <= n * 3


# -- Database word stage -----------------------------------------------------

def _fake_db(tmp_path, rng, n_imgs=8, n_pts=400, kps_per=64, d=128,
             opts=None):
    """A Database whose feature store is pre-populated with synthetic
    descriptors (bypasses SIFT): image i sees a contiguous window of a
    shared 'point cloud' of random unit descriptors."""
    fold = str(tmp_path)
    # discovery needs image files on disk
    from PIL import Image
    for i in range(n_imgs):
        Image.new("L", (8, 8)).save(os.path.join(fold, f"im_{i:03d}.png"))
    opts = opts or DatabaseOptions(min_keypoints_for_words=1)
    db = Database(fold, opts)
    base = rng.normal(size=(n_pts, d)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    span = n_pts // n_imgs * 2
    for i in range(n_imgs):
        lo = min(i * n_pts // n_imgs, n_pts - span)
        ids = np.arange(lo, lo + span)
        desc = base[ids] + rng.normal(0, 0.05, size=(span, d)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)
        pad = kps_per - span if kps_per > span else 0
        desc = np.pad(desc, ((0, pad), (0, 0)))
        xy = rng.uniform(-100, 100, size=(len(desc), 2)).astype(np.float32)
        mask = np.zeros(len(desc), bool)
        mask[:span] = True
        fstore.write_features(db.out, i, xy=xy, desc=desc, mask=mask,
                              sigma=np.ones(len(desc), np.float32),
                              angle=np.zeros(len(desc), np.float32),
                              meta={"width": 200, "height": 200,
                                    "focal_px": 0.0, "gps": (0.0, 0.0, 0.0),
                                    "path": f"im_{i:03d}.png"})
    return db


def test_build_words_and_resume(tmp_path, rng):
    db = _fake_db(tmp_path, rng)
    voc, counts = db.build_words()
    assert counts.shape == (8, voc.n_words)
    assert (counts.sum(axis=1) > 0).all()
    # neighbours share more words than distant images
    inter = np.asarray(km.word_intersection_counts(jnp.asarray(counts)))
    assert inter[0, 1] > inter[0, 7]

    # resume: delete one words file; only it is recomputed, counts identical
    os.remove(os.path.join(db.out, "3_words.npz"))
    mtime5 = os.path.getmtime(os.path.join(db.out, "5_words.npz"))
    db2 = Database(str(tmp_path), db.opts)
    voc2, counts2 = db2.build_words()
    assert voc2.n_words == voc.n_words  # vocabulary itself was cached
    assert os.path.getmtime(os.path.join(db.out, "5_words.npz")) == mtime5
    np.testing.assert_allclose(counts2, counts, rtol=1e-5)


def test_voc_branch_level_honored(tmp_path, rng):
    # voc_branch**voc_level below the floor cap must shrink the vocabulary
    opts = DatabaseOptions(voc_branch=2, voc_level=4,
                           min_keypoints_for_words=1)
    db = _fake_db(tmp_path, rng, opts=opts)
    voc, _ = db.build_words()
    assert voc.n_words == 16  # 2**4


# -- BoW-selected matching path (>=50 images) --------------------------------

def _geometric_db(tmp_path, rng, n_imgs=50, n_pts=1500, kps_per=192):
    """50 cameras translating along x, each seeing a local window of a
    3D point cloud; descriptors are per-point random unit vectors with
    small per-view noise, geometry is exact => fine matching verifies."""
    from PIL import Image
    fold = str(tmp_path)
    for i in range(n_imgs):
        Image.new("L", (8, 8)).save(os.path.join(fold, f"im_{i:03d}.png"))
    opts = DatabaseOptions(min_keypoints_for_words=1, max_keypoints=kps_per)
    db = Database(fold, opts)

    pts = np.stack([rng.uniform(0, n_imgs * 1.0, n_pts),
                    rng.uniform(-2, 2, n_pts),
                    rng.uniform(6, 10, n_pts)], axis=1)
    base = rng.normal(size=(n_pts, 128)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    f, W, H = 500.0, 640.0, 480.0
    for i in range(n_imgs):
        c = np.array([i * 1.0, 0.0, 0.0])
        rel = pts - c                      # R = I
        uv = f * rel[:, :2] / rel[:, 2:3]  # centered pixels
        vis = (np.abs(uv[:, 0]) < W / 2 - 8) & (np.abs(uv[:, 1]) < H / 2 - 8)
        ids = np.where(vis)[0][:kps_per]
        desc = base[ids] + rng.normal(0, 0.05, (len(ids), 128)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)
        K = kps_per
        xy = np.zeros((K, 2), np.float32)
        dsc = np.zeros((K, 128), np.float32)
        msk = np.zeros(K, bool)
        xy[:len(ids)] = uv[ids]
        dsc[:len(ids)] = desc
        msk[:len(ids)] = True
        fstore.write_features(db.out, i, xy=xy, desc=dsc, mask=msk,
                              sigma=np.ones(K, np.float32),
                              angle=np.zeros(K, np.float32),
                              meta={"width": int(W), "height": int(H),
                                    "focal_px": f, "gps": (0.0, 0.0, 0.0),
                                    "path": f"im_{i:03d}.png"})
    return db


def test_bow_matching_path_50_images(tmp_path, rng):
    """The feature/BoW candidate path selected by the web preset, end to
    end on 50 synthetic images: vocabulary -> similarity -> top-k
    candidates -> word-seed gate -> batched fine matching."""
    db = _geometric_db(tmp_path, rng)
    cfg = PRESETS["web"]()
    cfg = dataclasses.replace(
        cfg,
        database=db.opts,
        graph=dataclasses.replace(cfg.graph, matching_type="feature",
                                  min_candidates=4, max_candidates=6,
                                  word_seed_min_matches=30))
    assert cfg.graph.matching_type == "feature"
    matches = build_match_graph(db, cfg)
    assert matches, "no pairs survived"
    gaps = np.array([abs(i - j) for (i, j) in matches])
    # locality: candidates + word gate must keep the graph banded
    assert gaps.max() <= 10
    # adjacent pairs overlap heavily and must be matched + verified
    n_adjacent = sum(1 for (i, j) in matches if j - i == 1)
    assert n_adjacent >= 40
    for (i, j), m in matches.items():
        if j - i == 1:
            assert len(m.kp_i) >= 30
    # the word-seed gate runs (pairs with < 30 common words are dropped):
    # with window ~5 overlap, far candidate pairs can't share 30 words
    _, counts = db.build_words()
    inter = np.asarray(km.word_intersection_counts(jnp.asarray(counts)))
    for (i, j) in matches:
        assert inter[i, j] >= 30

# -- chunked (sparse) similarity at scale ------------------------------------

def _synthetic_word_lists(rng, n_images, n_words, kp_per_image=400,
                          window=6, pool=None):
    """Word lists with ground-truth locality: image i draws from a word
    pool sliding monotonically with i (no wrap — wrap would alias distant
    images), so only images within ~`window` share words (an
    aerial-survey-like covisibility structure)."""
    step = (n_words - 1) // n_images
    if pool is None:
        pool = window * step          # overlap vanishes at gap >= window
    lists = []
    for i in range(n_images):
        base = i * step
        w = base + rng.integers(0, pool, size=kp_per_image)
        w = np.minimum(w, n_words - 1)
        w[rng.random(kp_per_image) < 0.02] = -1       # a few masked slots
        lists.append(w.astype(np.int32))
    return lists


def test_similarity_chunked_matches_dense(rng):
    """Blocked word-streaming path == dense similarity_matrix +
    word_intersection_counts, bit-for-bit semantics (same idf/stop-word/
    normalization rules)."""
    n, n_words = 40, 3000
    lists = _synthetic_word_lists(rng, n, n_words, kp_per_image=200)
    counts = np.zeros((n, n_words), np.float32)
    for i, w in enumerate(lists):
        v = w[w >= 0]
        counts[i] = np.bincount(v, minlength=n_words)
    sim_d = np.asarray(km.similarity_matrix(jnp.asarray(counts),
                                            stop_word_frac=0.01))
    inter_d = np.asarray(km.word_intersection_counts(jnp.asarray(counts)))
    sim_c, inter_c = km.similarity_chunked(lists, n_words,
                                           stop_word_frac=0.01, block=512)
    np.testing.assert_allclose(sim_c, sim_d, atol=2e-5)
    np.testing.assert_allclose(inter_c, inter_d, atol=1e-3)


@pytest.mark.slow
def test_candidate_selection_5k_images(rng):
    """Config-5 scale (BASELINE 5k mixed set): candidate selection over
    5,000 synthetic images x 65,536 words WITHOUT materializing the dense
    counts matrix (would be 1.3 GB; the chunked path peaks at
    O(n^2 + n*block) ~ 270 MB).  Selected candidates must respect the
    planted covisibility window."""
    n, n_words = 5000, 65536
    lists = _synthetic_word_lists(rng, n, n_words, kp_per_image=150,
                                  window=6)
    sim, inter = km.similarity_chunked(lists, n_words, block=8192)
    pairs = candidates_bow(sim, min_c=3, max_c=6)
    assert len(pairs) >= n  # every image found neighbours
    gaps = np.array([abs(i - j) for (i, j) in pairs])
    assert np.median(gaps) <= 8
    assert (gaps <= 12).mean() > 0.9, "candidates must be survey-local"
