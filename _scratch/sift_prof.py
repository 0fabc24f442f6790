import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from metricsfm_tpu.ops import sift

H, W = 1536, 2048
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 1, size=(H, W)).astype(np.float32))
cfg = sift.SiftConfig()

def chain(name, fn, iters=4):
    @jax.jit
    def run(x):
        s = jnp.float32(0.)
        for _ in range(iters):
            o = fn(x + s * 1e-20)
            s = s + jnp.sum(jax.tree.leaves(o)[0][..., :1].astype(jnp.float32))
        return s
    v = run(img); _ = float(v)
    t0 = time.perf_counter(); v = run(img); _ = float(v)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.1f} ms -> {1/dt:.2f}/s")

chain("pyramid", lambda x: sift.gaussian_pyramid(x, cfg)[3])

def det(x):
    octs = sift.gaussian_pyramid(x, cfg)
    outs = [sift.detect_octave(s, o, cfg, 512)["xy"] for o, s in enumerate(octs)]
    return jnp.concatenate(outs)
chain("pyramid+detect", det)
chain("full extract", lambda x: sift.extract(x, cfg)["desc"])
