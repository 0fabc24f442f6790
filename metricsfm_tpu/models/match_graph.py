"""Match-graph construction: candidate selection + fine matching + F-verify.

Re-design of the reference graph layer (SfM/src/graph.{h,cc},
graph/similarity_graph.cc, graph/initial_matching_graph.cc,
graph/fine_matching_graph.cc):

* Candidate pairs by one of three strategies (initial_matching_graph.cc:54-78):
  "all" exhaustive, "priori" GPS mutual-kNN in UTM, "feature" BoW top-k.
* Fine matching: MXU brute-force 2-NN with dual ratio tests
  (fine_matching_graph.cc:42-43) instead of FLANN KD-trees; "good" matches
  (ratio<0.6) estimate F via batched RANSAC, then "all" matches
  (ratio<0.85) are re-filtered by epipolar distance < 3 px
  (fine_matching_graph.cc:137-147).
* Per-pair match shards persist for resume (match_index semantics).
"""
from __future__ import annotations

import itertools
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import GraphOptions
from ..io import store as fstore
from ..ops import epipolar, matching, ransac
from .incremental import PairMatches


def candidates_all(n: int) -> List[Tuple[int, int]]:
    """Exhaustive pairs (ref :57-64, UAV preset matching_type='all')."""
    return list(itertools.combinations(range(n), 2))


def candidates_gps(gps_utm: np.ndarray, knn: int) -> List[Tuple[int, int]]:
    """GPS prior: mutual k-NN in the UTM plane (ref :83-162).

    gps_utm: (n, 2) easting/northing. k = min(knn, n/10) as in the ref.
    """
    n = len(gps_utm)
    k = max(2, min(knn, max(n // 10, 2)))
    d2 = ((gps_utm[:, None, :] - gps_utm[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nbrs = np.argsort(d2, axis=1)[:, :k]
    pairs = set()
    for i in range(n):
        for j in nbrs[i]:
            if i in nbrs[j]:
                pairs.add((min(i, int(j)), max(i, int(j))))
    return sorted(pairs)


def candidates_bow(sim: np.ndarray, min_c: int = 200, max_c: int = 500
                   ) -> List[Tuple[int, int]]:
    """BoW similarity: per-image top min(max(min_c, n/10), max_c) candidates
    (ref :164-294, count rule :168-169)."""
    n = sim.shape[0]
    k = min(max(min_c, n // 10), max_c, n - 1)
    pairs = set()
    order = np.argsort(-sim, axis=1)
    for i in range(n):
        for j in order[i, :k]:
            if sim[i, j] > 0:
                pairs.add((min(i, int(j)), max(i, int(j))))
    return sorted(pairs)


class MatchGraphBuilder:
    """Build the verified match graph over candidate pairs."""

    def __init__(self, options: GraphOptions, out_fold: Optional[str] = None,
                 seed: int = 0):
        import jax
        self.opts = options
        self.out = out_fold
        self.key = jax.random.PRNGKey(seed)

    def _next_key(self):
        import jax
        self.key, sub = jax.random.split(self.key)
        return sub

    def match_one_pair(self, feat_i, feat_j) -> Optional[PairMatches]:
        """Fine matching for one pair (ref fine_matching_graph.cc:104-147)."""
        import jax.numpy as jnp
        res = matching.match_pair(
            jnp.asarray(feat_i.desc), jnp.asarray(feat_j.desc),
            jnp.asarray(feat_i.mask), jnp.asarray(feat_j.mask),
            ratio_good=self.opts.ratio_good, ratio_all=self.opts.ratio_all)
        good = np.asarray(res["good"])
        allm = np.asarray(res["all"])
        idx2 = np.asarray(res["idx2"])
        if good.sum() < 8:
            return None
        # F from "good" matches via batched RANSAC
        p1 = jnp.asarray(feat_i.xy)
        p2 = jnp.asarray(feat_j.xy[idx2])
        fr = ransac.fundamental_ransac(
            p1, p2, self._next_key(), mask=jnp.asarray(good),
            th_px=self.opts.epipolar_px,
            min_inliers=self.opts.geoverify_min_inliers)
        if not bool(fr["ok"]):
            return None
        # re-filter "all" matches by epipolar distance under the fixed F
        d = np.asarray(epipolar.epipolar_distance(fr["F"], p1, p2))
        keep = allm & (d < self.opts.epipolar_px)
        if keep.sum() < self.opts.geoverify_min_inliers:
            return None
        kp_i = np.where(keep)[0]
        return PairMatches(kp_i=kp_i.astype(np.int64),
                           kp_j=idx2[kp_i].astype(np.int64))

    def build(self, features, pairs: List[Tuple[int, int]],
              verbose: bool = False) -> Dict[Tuple[int, int], PairMatches]:
        """Match every candidate pair (resume-aware when out_fold set).

        `features` maps image id -> ImageFeatures with descriptors.
        """
        out: Dict[Tuple[int, int], PairMatches] = {}
        for n_done, (i, j) in enumerate(pairs):
            if self.out is not None and fstore.has_matches(self.out, i, j):
                cached = fstore.read_matches(self.out, i, j)
                if len(cached["kp_i"]):
                    out[(i, j)] = PairMatches(kp_i=cached["kp_i"],
                                              kp_j=cached["kp_j"])
                continue
            m = self.match_one_pair(features[i], features[j])
            if self.out is not None:
                fstore.write_matches(
                    self.out, i, j,
                    m.kp_i if m else np.empty(0, np.int64),
                    m.kp_j if m else np.empty(0, np.int64))
            if m is not None:
                out[(i, j)] = m
            if verbose and n_done % 20 == 0:
                print(f"matching {n_done}/{len(pairs)}")
        if self.out is not None:
            fstore.write_match_graph(
                self.out, {k: len(v.kp_i) for k, v in out.items()})
        return out


def build_match_graph(database, config, verbose: bool = False):
    """End-to-end graph build (ref Graph::BuildGraph, graph.cc:52-70).

    Chooses the candidate strategy from config.graph.matching_type, runs
    fine matching, returns {(i, j): PairMatches}.
    """
    import jax.numpy as jnp
    from ..ops import kmeans as km
    from ..utils import utm as utm_util

    opts = config.graph
    n = database.n_images
    if opts.matching_type == "all" or n <= 12:
        pairs = candidates_all(n)
    elif opts.matching_type == "priori":
        coords = []
        for i in range(n):
            lat, lon, alt = database.gps(i)
            e, no, _ = utm_util.ll_to_utm(lat, lon)
            coords.append([e, no])
        pairs = candidates_gps(np.array(coords), opts.knn)
    else:
        _, counts = database.build_words(verbose=verbose)
        sim = np.asarray(km.similarity_matrix(
            jnp.asarray(counts), stop_word_frac=opts.stop_word_frac))
        pairs = candidates_bow(sim, opts.min_candidates, opts.max_candidates)
    if verbose:
        print(f"match graph: {len(pairs)} candidate pairs for {n} images")
    builder = MatchGraphBuilder(opts, out_fold=database.out)
    feats = {i: database.features(i) for i in range(n)}
    return builder.build(feats, pairs, verbose=verbose)
