"""Lane-major matvec piece timing: einsum vs unrolled FMA, f32 vs bf16
storage, take vs one-hot permutations.  Shapes: 1024 cams / 131k pts / V=6.
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
    Jc = terms["Jc"]
    W = terms["W"]
    return (jnp.transpose(Jc, (2, 3, 1, 0)), jnp.transpose(W, (2, 3, 1, 0)),
            jnp.transpose(terms["Hpp_inv"], (1, 2, 0)),
            jnp.transpose(terms["cam"], (1, 0)))

JcT, WT, HiT, camT = build(prob, lam)
JcTb, WTb, HiTb = (a.astype(jnp.bfloat16) for a in (JcT, WT, HiT))
cam_flat = camT.reshape(-1)
mask_flat = jnp.transpose(prob.track_mask, (1, 0)).reshape(-1)
camf_eff = jnp.where(mask_flat, cam_flat, C)
idx_c = jax.jit(lambda c: _gather_table(c, C, K))(camf_eff)
x9 = jnp.ones((C, 9), jnp.float32)
xv0 = jnp.ones((9, V, P), jnp.float32)


def timeit_chain(f, x0, n=10):
    @jax.jit
    def g(xx):
        def body(cc, _):
            y = f(cc)
            s = jnp.max(jnp.abs(y)) + 1e-20
            return jax.tree.map(lambda a: (a / s).astype(a.dtype), y), None
        y, _ = jax.lax.scan(body, xx, None, length=n)
        return y
    out = g(x0)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(4):
        out = g(x0)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / 4 / n


def einsum_core(xv):
    t = jnp.einsum("rjvp,jvp->rvp", JcT, xv)
    u = jnp.einsum("rivp,rvp->ivp", JcT, t)
    a = jnp.einsum("ikvp,ivp->kp", WT, xv)
    b = jnp.einsum("jkp,kp->jp", HiT, a)
    c = jnp.einsum("ikvp,kp->ivp", WT, b)
    return u - c


def unrolled_core_mk(Jc_, W_, Hi_):
    def f(xv):
        xvf = [xv[j] for j in range(9)]                   # (V,P) slices
        t = [sum(Jc_[r, j] * xvf[j] for j in range(9)) for r in range(2)]
        u = [sum(Jc_[r, i] * t[r] for r in range(2)) for i in range(9)]
        a = [sum((W_[i, k] * xvf[i]).sum(0) for i in range(9))
             for k in range(3)]                           # (P,)
        b = [sum(Hi_[j, k] * a[k] for k in range(3)) for j in range(3)]
        c = [sum(W_[i, k] * b[k][None, :] for k in range(3))
             for i in range(9)]
        return jnp.stack([u[i] - c[i] for i in range(9)])
    return f


def core_f32(xv):
    return unrolled_core_mk(JcT, WT, HiT)(xv)


def core_bf16(xv):
    f = unrolled_core_mk(JcTb.astype(jnp.float32), WTb.astype(jnp.float32),
                         HiT)
    return f(xv)


def take_gather(x9_):
    return jnp.take(x9_.T, camT, axis=1)


def take_reduce(z9):
    zf = z9.reshape(9, -1)
    zpad = jnp.concatenate([zf, jnp.zeros((9, 1), zf.dtype)], axis=1)
    g = jnp.take(zpad, idx_c.reshape(-1), axis=1).reshape(9, C, K)
    return jnp.sum(g, axis=2)


print("einsum core :", round(timeit_chain(einsum_core, xv0) * 1e3, 3), "ms",
      flush=True)
print("unroll f32  :", round(timeit_chain(core_f32, xv0) * 1e3, 3), "ms",
      flush=True)
print("unroll bf16 :", round(timeit_chain(core_bf16, xv0) * 1e3, 3), "ms",
      flush=True)


def g_chain(x9_):
    xv = take_gather(x9_)
    return (xv.sum(axis=(1, 2))[None, :] * jnp.ones((C, 1))).astype(x9_.dtype)


def r_chain(z9):
    zc = take_reduce(z9)
    return (zc.sum(1)[:, None, None] * jnp.ones((9, V, P))).astype(z9.dtype)


print("take gather :", round(timeit_chain(g_chain, x9) * 1e3, 3), "ms",
      flush=True)
print("take reduce :", round(timeit_chain(r_chain, xv0) * 1e3, 3), "ms",
      flush=True)

# correctness of unrolled vs einsum
ref = jax.jit(einsum_core)(xv0)
got = jax.jit(core_f32)(xv0)
print("unroll rel err:",
      float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref))), flush=True)
