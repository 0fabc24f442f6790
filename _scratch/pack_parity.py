import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax.numpy as jnp
from metricsfm_tpu.ops.pallas import sgm_kernel as K

rng = np.random.default_rng(0)
H, W, D = 24, 40, 16
cost = rng.integers(0, 64, size=(H, W, D)).astype(np.float32)

wl0, wr0 = K.aggregate_wta_pallas(jnp.asarray(cost), 10, 120, 8,
                                  interpret=True, storage=jnp.float32)
wl1, wr1 = K.aggregate_wta_pallas(jnp.asarray(cost), 10, 120, 8,
                                  interpret=True, packed=True)
for k in wl0:
    np.testing.assert_array_equal(np.asarray(wl0[k]).astype(np.int64),
                                  np.asarray(wl1[k]).astype(np.int64), err_msg=f"left {k}")
    np.testing.assert_array_equal(np.asarray(wr0[k]).astype(np.int64),
                                  np.asarray(wr1[k]).astype(np.int64), err_msg=f"right {k}")
print("wta parity ok")

L = rng.uniform(0, 1, (37, 61)).astype(np.float32)
R = rng.uniform(0, 1, (37, 61)).astype(np.float32)
c0 = np.asarray(K.census_cost_pallas(jnp.asarray(L), jnp.asarray(R), 48, interpret=True))
c1p = K.census_cost_pallas(jnp.asarray(L), jnp.asarray(R), 48, interpret=True, packed=True)
c1 = np.asarray(K._unpack_rows(c1p, 2 * c1p.shape[0]))
n = min(c0.shape[0], c1.shape[0])
np.testing.assert_array_equal(c0[:n].astype(np.int64), c1[:n].astype(np.int64))
print("census parity ok", c0.shape, c1.shape)

# full chain packed: census packed -> wta packed, vs unpacked chain
cp = K.census_cost_pallas(jnp.asarray(L), jnp.asarray(R), 48, interpret=True, packed=True)
cu = K.census_cost_pallas(jnp.asarray(L), jnp.asarray(R), 48, interpret=True)
wl0, wr0 = K.aggregate_wta_pallas(cu, 10, 120, 8, interpret=True,
                                  storage=jnp.float32, real_shape=(37, 61, 48))
wl1, wr1 = K.aggregate_wta_pallas(cp, 10, 120, 8, interpret=True,
                                  packed=True, real_shape=(37, 61, 48))
for k in wl0:
    np.testing.assert_array_equal(np.asarray(wl0[k]).astype(np.int64),
                                  np.asarray(wl1[k]).astype(np.int64), err_msg=f"chain left {k}")
    np.testing.assert_array_equal(np.asarray(wr0[k]).astype(np.int64),
                                  np.asarray(wr1[k]).astype(np.int64), err_msg=f"chain right {k}")
print("full chain parity ok")
