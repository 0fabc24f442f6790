"""Round-2 of the lane-major CG matvec study: full matvec timing (chained
on a (D,) carry like real CG) for unrolled cores, bf16 storage, and
one-hot precisions.  Baselines from round 1: old layout 16 ms, lane-major
einsum take/take 8.2 ms, oh/oh(bf16) 3.95 ms (rel err 2e-3).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from metricsfm_tpu.ba.lm import (LMConfig, _gather_table, _track_terms,
                                 resolve_gather_k)
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


@jax.jit
def build(p, l):
    terms, rhs, aux = _track_terms(p, l, cfg)
    return (jnp.transpose(terms["Jc"], (2, 3, 1, 0)),
            jnp.transpose(terms["W"], (2, 3, 1, 0)),
            jnp.transpose(terms["Hpp_inv"], (1, 2, 0)),
            jnp.transpose(terms["cam"], (1, 0)))

JcT, WT, HiT, camT = build(prob, lam)
JcTb = JcT.astype(jnp.bfloat16)
WTb = WT.astype(jnp.bfloat16)
cam_flat = camT.reshape(-1)
mask_flat = jnp.transpose(prob.track_mask, (1, 0)).reshape(-1)
camf_eff = jnp.where(mask_flat, cam_flat, C)
idx_c = jax.jit(lambda c: _gather_table(c, C, K))(camf_eff)
model_of_cam = prob.cam_model
x = jnp.ones((D,), jnp.float32) / np.sqrt(D)
CHUNK = 32768


def core(Jc_, W_, xv, up=None):
    """Unrolled FMAs over (V, P) lanes; Jc_/W_ may be bf16 (upcast slices)."""
    def g(a):
        return a.astype(jnp.float32) if up else a
    xvf = [xv[j] for j in range(9)]
    t = [sum(g(Jc_[r, j]) * xvf[j] for j in range(9)) for r in range(2)]
    u = [sum(g(Jc_[r, i]) * t[r] for r in range(2)) for i in range(9)]
    a3 = [sum((g(W_[i, k]) * xvf[i]).sum(0) for i in range(9))
          for k in range(3)]
    b3 = [sum(HiT[j, k] * a3[k] for k in range(3)) for j in range(3)]
    c9 = [sum(g(W_[i, k]) * b3[k][None, :] for k in range(3))
          for i in range(9)]
    return jnp.stack([u[i] - c9[i] for i in range(9)])     # (9,V,P)


def xv_take(xfull):
    xp = xfull[:6 * C].reshape(C, 6)
    xi = xfull[6 * C:].reshape(M, 3)
    x9 = jnp.concatenate([xp, xi[model_of_cam]], axis=1)
    return jnp.take(x9.T, camT, axis=1)


def reduce_take(z9):
    zf = z9.reshape(9, -1)
    zpad = jnp.concatenate([zf, jnp.zeros((9, 1), zf.dtype)], axis=1)
    g = jnp.take(zpad, idx_c.reshape(-1), axis=1).reshape(9, C, K)
    return jnp.sum(g, axis=2)


def make_reduce_oh(precision):
    ids = camf_eff.reshape(-1, CHUNK)

    def f(z9):
        zf = jnp.transpose(z9.reshape(9, -1).reshape(9, -1, CHUNK),
                           (1, 0, 2))

        def body(acc, sl):
            z, idc = sl
            oh = (idc[:, None] == jnp.arange(C)[None, :]).astype(jnp.float32)
            return acc + jnp.dot(z, oh, precision=precision), None
        acc0 = jnp.zeros((9, C), jnp.float32)
        out, _ = jax.lax.scan(body, acc0, (zf, ids))
        return out
    return f


def finish(zc, xfull):
    zp = zc[:6].T.reshape(-1)
    zi = jax.ops.segment_sum(zc[6:].T, model_of_cam, M).reshape(-1)
    return jnp.concatenate([zp, zi])


def bench(label, mv):
    @jax.jit
    def g(xx):
        def body(cc, _):
            y = mv(cc)
            return y / jnp.maximum(jnp.linalg.norm(y), 1e-20), None
        y, _ = jax.lax.scan(body, xx, None, length=10)
        return y
    try:
        out = g(x)
        _ = np.asarray(out).ravel()[0]
        t0 = time.perf_counter()
        for _ in range(4):
            out = g(x)
        _ = np.asarray(out).ravel()[0]
        t = (time.perf_counter() - t0) / 40
        ref = jax.jit(MVS["E_exact"])(x)
        got = jax.jit(mv)(x)
        err = float(jnp.max(jnp.abs(got - ref))
                    / jnp.maximum(jnp.max(jnp.abs(ref)), 1e-20))
        print(f"{label:22s}: {t*1e3:7.3f} ms   rel_err={err:.2e}",
              flush=True)
    except Exception as e:
        print(f"{label:22s}: FAIL {type(e).__name__} {str(e)[:120]}",
              flush=True)


oh_bf = make_reduce_oh(jax.lax.Precision.DEFAULT)
oh_f32 = make_reduce_oh(jax.lax.Precision.HIGHEST)

MVS = {
    "E_exact":   lambda xx: finish(reduce_take(core(JcT, WT, xv_take(xx))), xx),
    "A_take_ohbf":  lambda xx: finish(oh_bf(core(JcT, WT, xv_take(xx))), xx),
    "B_take_ohf32": lambda xx: finish(oh_f32(core(JcT, WT, xv_take(xx))), xx),
    "D_bf16_take_ohbf": lambda xx: finish(
        oh_bf(core(JcTb, WTb, xv_take(xx), up=True)), xx),
    "F_bf16_take_take": lambda xx: finish(
        reduce_take(core(JcTb, WTb, xv_take(xx), up=True)), xx),
}
for k, mv in MVS.items():
    bench(k, mv)
