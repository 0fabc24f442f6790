"""Micro-profile of the CG inner loop at 1k cams: matvec vs preconditioner."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from metricsfm_tpu.ba.lm import (LMConfig, _track_terms, _gps_prior_blocks,
                                 _gather_table, _inv3x3, resolve_gather_k)
from metricsfm_tpu.utils import synth
from metricsfm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

prob = synth.synthetic_ba_problem(n_cams=1024, n_pts=131072, max_views=6,
                                  seed=0)
cfg = resolve_gather_k(prob, LMConfig(cg_iterations=50, cg_tol=1e-4))
lam = jnp.float32(1e-3)
C, M = prob.n_cameras, prob.n_models
D = 6 * C + 3 * M
print("gather_k =", cfg.cg_gather_k, flush=True)


def timeit(fn, *args, n=20):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / n


# build terms once on device
@jax.jit
def build(p, l):
    terms, rhs, aux = _track_terms(p, l, cfg)
    Hg, Ht, rhs_extra = _gps_prior_blocks(p)
    return terms, rhs + rhs_extra, Hg, Ht

terms, rhs, Hg, Ht = build(prob, lam)
Jc, W, Hpp_inv, dofs = terms["Jc"], terms["W"], terms["Hpp_inv"], terms["dofs"]
cam, model = terms["cam"], terms["model"]
blk_pose, blk_intr = terms["blk_pose"], terms["blk_intr"]
free = jnp.ones((D,), jnp.float32)
camf = np.asarray(cam).reshape(-1)
idx_c = jax.jit(lambda c: _gather_table(
    jnp.where(prob.track_mask.reshape(-1), c, C), C, cfg.cg_gather_k))(
        jnp.asarray(camf))


def chain(f, x0, n=10):
    """Chained applications inside one jit so per-call dispatch is excluded."""
    @jax.jit
    def g(x):
        def body(c, _):
            y = f(c)
            return y / jnp.maximum(jnp.linalg.norm(y), 1e-20), None
        y, _ = jax.lax.scan(body, x, None, length=n)
        return y
    t = timeit(g, x0, n=4)
    return t / n


x = jnp.ones((D,), jnp.float32) / np.sqrt(D)


def track_matvec(xv_in):
    xm = xv_in * free
    xp = xm[:6 * C].reshape(C, 6)
    xi = xm[6 * C:].reshape(M, 3)
    xv = jnp.concatenate([xp[cam], xi[model]], axis=-1)
    t = jnp.einsum("pvrj,pvj->pvr", Jc, xv)
    u = jnp.einsum("pvri,pvr->pvi", Jc, t)
    a = jnp.einsum("pvij,pvi->pj", W, xv)
    b = jnp.einsum("pij,pj->pi", Hpp_inv, a)
    c = jnp.einsum("pvij,pj->pvi", W, b)
    z = (u - c).reshape(-1, 9)
    zpad = jnp.concatenate([z[:, :6],
                            jnp.zeros((1, 6), z.dtype)])
    zp = jnp.sum(zpad[idx_c], axis=1)
    zi = jax.ops.segment_sum(zp, prob.cam_model, M)[:, :3] * 0  # approx shape
    return jnp.concatenate([zp.reshape(-1), jnp.zeros((3 * M,), z.dtype)])


print("track_matvec   :", round(chain(track_matvec, x) * 1e3, 3), "ms", flush=True)

# preconditioner variants
Bp = blk_pose + 1e-3 * jnp.eye(6)[None]
Bp_cho = jax.jit(jax.vmap(lambda m: jax.scipy.linalg.cho_factor(m, lower=True)[0]))(Bp)
Bi_inv = _inv3x3(blk_intr + 1e-3 * jnp.eye(3)[None])


def prec_cho(r):
    rp = r[:6 * C].reshape(C, 6)
    ri = r[6 * C:].reshape(M, 3)
    zp = jax.vmap(lambda l, b: jax.scipy.linalg.cho_solve((l, True), b))(Bp_cho, rp)
    zi = jnp.einsum("mij,mj->mi", Bi_inv, ri)
    return jnp.concatenate([zp.reshape(-1), zi.reshape(-1)])


Bp_inv = jax.jit(jnp.linalg.inv)(Bp)


def prec_inv(r):
    rp = r[:6 * C].reshape(C, 6)
    ri = r[6 * C:].reshape(M, 3)
    zp = jnp.einsum("cij,cj->ci", Bp_inv, rp)
    zi = jnp.einsum("mij,mj->mi", Bi_inv, ri)
    return jnp.concatenate([zp.reshape(-1), zi.reshape(-1)])


print("prec_cho_solve :", round(chain(prec_cho, x) * 1e3, 3), "ms", flush=True)
print("prec_inv_einsum:", round(chain(prec_inv, x) * 1e3, 3), "ms", flush=True)

# einsum pieces of matvec, isolated
def mv_gather(xv_in):
    xp = xv_in[:6 * C].reshape(C, 6)
    xi = xv_in[6 * C:].reshape(M, 3)
    xv = jnp.concatenate([xp[cam], xi[model]], axis=-1)
    return xv.sum() * jnp.ones((D,), jnp.float32)

def mv_jc(xv_in):
    xp = xv_in[:6 * C].reshape(C, 6)
    xv = jnp.concatenate([xp[cam], xp[cam][..., :3]], axis=-1)
    t = jnp.einsum("pvrj,pvj->pvr", Jc, xv)
    u = jnp.einsum("pvri,pvr->pvi", Jc, t)
    return u.sum() * jnp.ones((D,), jnp.float32)

def mv_w(xv_in):
    xp = xv_in[:6 * C].reshape(C, 6)
    xv = jnp.concatenate([xp[cam], xp[cam][..., :3]], axis=-1)
    a = jnp.einsum("pvij,pvi->pj", W, xv)
    b = jnp.einsum("pij,pj->pi", Hpp_inv, a)
    c = jnp.einsum("pvij,pj->pvi", W, b)
    return c.sum() * jnp.ones((D,), jnp.float32)

def mv_reduce(xv_in):
    z = (Jc[:, :, 0, :] * xv_in[0]).reshape(-1, 9)
    zpad = jnp.concatenate([z[:, :6], jnp.zeros((1, 6), z.dtype)])
    zp = jnp.sum(zpad[idx_c], axis=1)
    return jnp.concatenate([zp.reshape(-1), jnp.zeros((3 * M,), z.dtype)])

print("  gather xv    :", round(chain(mv_gather, x) * 1e3, 3), "ms", flush=True)
print("  Jc einsums   :", round(chain(mv_jc, x) * 1e3, 3), "ms", flush=True)
print("  W einsums    :", round(chain(mv_w, x) * 1e3, 3), "ms", flush=True)
print("  table reduce :", round(chain(mv_reduce, x) * 1e3, 3), "ms", flush=True)
