"""Round-5: per-stage cost of the batched pair-verify chain.

The 500-image aerial match stage measures ~113 pairs/s through
MatchGraphBuilder while the bare 2-NN kernel does ~10k pairs/s — find
where the 8.8 ms/pair goes: 2-NN, F-RANSAC, refilter/budget, or host.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from metricsfm_tpu.ops import epipolar, matching, ransac
from metricsfm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, N, D = 32, 2048, 128
rng = np.random.default_rng(0)
d1 = np.abs(rng.normal(size=(B, N, D))).astype(np.float32)
d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
d2 = np.abs(rng.normal(size=(B, N, D))).astype(np.float32)
d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
p1 = rng.normal(size=(B, N, 2)).astype(np.float32) * 200
p2 = rng.normal(size=(B, N, 2)).astype(np.float32) * 200
m = np.ones((B, N), bool)
keys = jax.random.split(jax.random.PRNGKey(0), B)

d1j, d2j, p1j, p2j, mj = map(jnp.asarray, (d1, d2, p1, p2, m))


def bench(label, fn, *args):
    f = jax.jit(fn)
    # block_until_ready does not reliably block on the tunneled platform
    # (see bench.py) — fetch a value instead
    probe = lambda o: np.asarray(jax.tree.leaves(o)[0]).ravel()[:1]
    _ = probe(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = probe(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:24s}: {best*1e3:8.1f} ms  ({B/best:7.0f} pairs/s)",
          flush=True)
    return best


def just_match(d1, d2, m1, m2):
    return jax.vmap(lambda a, b, x, y: matching.match_pair(
        a, b, x, y, 0.6, 0.85, chunk=2048)["idx2"])(d1, d2, m1, m2)


bench("match_pair (2-NN+ratio)", just_match, d1j, d2j, mj, mj)


def match_ransac(d1, d2, m1, m2, P1, P2, ks):
    def one(a, b, x, y, q1, q2, k):
        res = matching.match_pair(a, b, x, y, 0.6, 0.85, chunk=2048)
        fr = ransac.fundamental_ransac(q1, q2[res["idx2"]], k,
                                       mask=res["good"], th_px=3.0,
                                       min_inliers=20)
        return fr["F"]
    return jax.vmap(one)(d1, d2, m1, m2, P1, P2, ks)


bench("match + F-RANSAC", match_ransac, d1j, d2j, mj, mj, p1j, p2j, keys)


def full_chain(d1, d2, m1, m2, P1, P2, ks):
    from metricsfm_tpu.models.match_graph import _pair_verifier
    one = _pair_verifier(0.6, 0.85, 3.0, 20, 4096, 2048)
    return jax.vmap(one)(d1, d2, m1, m2, P1, P2, ks)


bench("full verify chain", full_chain, d1j, d2j, mj, mj, p1j, p2j, keys)


def ransac_only(P1, P2, ks):
    return jax.vmap(lambda q1, q2, k: ransac.fundamental_ransac(
        q1, q2, k, th_px=3.0, min_inliers=20)["F"])(P1, P2, ks)


bench("F-RANSAC alone", ransac_only, p1j, p2j, keys)
