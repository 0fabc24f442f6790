"""Prototype: lane-major CG matvec for the 1k-camera BA solve.

Current layout puts tiny dims (9/3/2) on lanes => every einsum pays ~14-50x
layout padding (measured 16 ms/matvec at 1024/131k).  Here every per-slot
tensor is stored (small..., V, P) with the big axis LAST (lanes), and the
tiny contractions are unrolled FMAs.  Variants for the two permutation ops:

  xv gather  : take  — xpT (9, C) gathered along axis 1 by cam (V, P)
             : onehot — chunked (9, C) @ (C, chunk) one-hot matmul
  cam reduce : take  — gather-table (C, K) over flat slots, sum over K
             : onehot — chunked (9, chunk) @ (chunk, C) one-hot matmul
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from metricsfm_tpu.ba.lm import (LMConfig, _gather_table, _inv3x3,
                                 _track_terms, resolve_gather_k)
from metricsfm_tpu.utils import synth
from metricsfm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

prob = synth.synthetic_ba_problem(n_cams=1024, n_pts=131072, max_views=6,
                                  seed=0)
cfg = resolve_gather_k(prob, LMConfig(cg_iterations=50, cg_tol=1e-4))
lam = jnp.float32(1e-3)
C, M = prob.n_cameras, prob.n_models
P, V = prob.track_cam.shape
D = 6 * C + 3 * M
K = cfg.cg_gather_k
print(f"C={C} M={M} P={P} V={V} K={K}", flush=True)


@jax.jit
def build(p, l):
    terms, rhs, aux = _track_terms(p, l, cfg)
    return terms

terms = build(prob, lam)

# --- transpose to lane-major once -----------------------------------------
@jax.jit
def to_lane_major(terms):
    Jc = terms["Jc"]            # (P,V,2,9)
    W = terms["W"]              # (P,V,9,3)
    Hpp_inv = terms["Hpp_inv"]  # (P,3,3)
    JcT = jnp.transpose(Jc, (2, 3, 1, 0))       # (2,9,V,P)
    WT = jnp.transpose(W, (2, 3, 1, 0))         # (9,3,V,P)
    HiT = jnp.transpose(Hpp_inv, (1, 2, 0))     # (3,3,P)
    camT = jnp.transpose(terms["cam"], (1, 0))  # (V,P)
    return JcT, WT, HiT, camT

JcT, WT, HiT, camT = to_lane_major(terms)
cam_flat = camT.reshape(-1)                      # (V*P,) v-major
mask_flat = jnp.transpose(prob.track_mask, (1, 0)).reshape(-1)
camf_eff = jnp.where(mask_flat, cam_flat, C)
idx_c = jax.jit(lambda c: _gather_table(c, C, K))(camf_eff)

x = jnp.ones((D,), jnp.float32) / np.sqrt(D)
model_of_cam = prob.cam_model                    # (C,)


def xv_take(xfull):
    xp = xfull[:6 * C].reshape(C, 6)
    xi = xfull[6 * C:].reshape(M, 3)
    x9 = jnp.concatenate([xp, xi[model_of_cam]], axis=1)  # (C,9)
    return jnp.take(x9.T, camT, axis=1)                   # (9,V,P)


def xv_onehot(xfull, chunk=16384):
    xp = xfull[:6 * C].reshape(C, 6)
    xi = xfull[6 * C:].reshape(M, 3)
    x9T = jnp.concatenate([xp, xi[model_of_cam]], axis=1).T  # (9,C)
    ids = cam_flat.reshape(-1, chunk)                     # (nc, chunk)

    def body(_, idc):
        oh = (idc[None, :] == jnp.arange(C)[:, None]).astype(jnp.float32)
        return _, jnp.dot(x9T, oh, precision=jax.lax.Precision.DEFAULT)
    _, out = jax.lax.scan(body, None, ids)                # (nc, 9, chunk)
    return jnp.transpose(out, (1, 0, 2)).reshape(9, V, P)


def reduce_take(z9):
    zf = z9.reshape(9, -1)
    zpad = jnp.concatenate([zf, jnp.zeros((9, 1), zf.dtype)], axis=1)
    g = jnp.take(zpad, idx_c.reshape(-1), axis=1).reshape(9, C, K)
    return jnp.sum(g, axis=2)                             # (9,C)


def reduce_onehot(z9, chunk=16384):
    zf = z9.reshape(9, -1).reshape(9, -1, chunk)          # (9,nc,chunk)
    ids = camf_eff.reshape(-1, chunk)

    def body(acc, sl):
        z, idc = sl
        oh = (idc[:, None] == jnp.arange(C)[None, :]).astype(jnp.float32)
        return acc + jnp.dot(z, oh, precision=jax.lax.Precision.DEFAULT), None
    acc0 = jnp.zeros((9, C), jnp.float32)
    out, _ = jax.lax.scan(body, acc0, (jnp.transpose(zf, (1, 0, 2)), ids))
    return out


def make_matvec(xv_fn, reduce_fn):
    def matvec(xfull):
        xv = xv_fn(xfull)                                 # (9,V,P)
        # t[r] = sum_j JcT[r,j]*xv[j]   (2,V,P)
        t = jnp.einsum("rjvp,jvp->rvp", JcT, xv)
        # u[i] = sum_r JcT[r,i]*t[r]    (9,V,P)
        u = jnp.einsum("rivp,rvp->ivp", JcT, t)
        # a[k] = sum_{v,i} WT[i,k]*xv[i]  (3,P)
        a = jnp.einsum("ikvp,ivp->kp", WT, xv)
        b = jnp.einsum("jkp,kp->jp", HiT, a)              # (3,P)
        c = jnp.einsum("ikvp,kp->ivp", WT, b)
        z = u - c                                         # (9,V,P)
        zc = reduce_fn(z)                                 # (9,C)
        zp = zc[:6].T.reshape(-1)                         # (6C,)
        zi = jax.ops.segment_sum(zc[6:].T, model_of_cam, M).reshape(-1)
        return jnp.concatenate([zp, zi])
    return matvec


def chain(f, x0, n=10):
    @jax.jit
    def g(xx):
        def body(cc, _):
            y = f(cc)
            return y / jnp.maximum(jnp.linalg.norm(y), 1e-20), None
        y, _ = jax.lax.scan(body, xx, None, length=n)
        return y
    out = g(x0)
    _ = np.asarray(out).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(4):
        out = g(x0)
    _ = np.asarray(out).ravel()[0]
    return (time.perf_counter() - t0) / 4 / n


# correctness vs the current-layout matvec
from metricsfm_tpu.ba.lm import _gps_prior_blocks, _cg_solve  # noqa: E402


def ref_matvec(xfull):
    Jc, W, Hpp_inv = terms["Jc"], terms["W"], terms["Hpp_inv"]
    cam, model = terms["cam"], terms["model"]
    xp = xfull[:6 * C].reshape(C, 6)
    xi = xfull[6 * C:].reshape(M, 3)
    xv = jnp.concatenate([xp[cam], xi[model]], axis=-1)
    t = jnp.einsum("pvrj,pvj->pvr", Jc, xv)
    u = jnp.einsum("pvri,pvr->pvi", Jc, t)
    a = jnp.einsum("pvij,pvi->pj", W, xv)
    b = jnp.einsum("pij,pj->pi", Hpp_inv, a)
    c = jnp.einsum("pvij,pj->pvi", W, b)
    z = (u - c).reshape(-1, 9)
    zp = jax.ops.segment_sum(z[:, :6], cam.reshape(-1), C)
    zi = jax.ops.segment_sum(z[:, 6:], model.reshape(-1), M)
    return jnp.concatenate([zp.reshape(-1), zi.reshape(-1)])


ref = jax.jit(ref_matvec)(x)
for name, xf, rf in [("take/take", xv_take, reduce_take),
                     ("oh/oh", xv_onehot, reduce_onehot),
                     ("take/oh", xv_take, reduce_onehot),
                     ("oh/take", xv_onehot, reduce_take)]:
    mv = make_matvec(xf, rf)
    got = jax.jit(mv)(x)
    err = float(jnp.max(jnp.abs(got - ref)) / jnp.maximum(jnp.max(jnp.abs(ref)), 1e-20))
    t = chain(mv, x)
    print(f"{name:10s}: {t*1e3:7.3f} ms/matvec   rel_err={err:.2e}", flush=True)
