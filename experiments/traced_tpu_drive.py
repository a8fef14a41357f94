import time
import numpy as np
import jax, jax.numpy as jnp
from nngp_tpu.gp import fit_gp
from nngp_tpu.models.kernel_spec import reference_kernel
from nngp_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
struct = reference_kernel()
x = rng.uniform(0, 1000, (3600, 20)).astype(np.float32)
y = rng.standard_normal((3600, 1)).astype(np.float32)
xt = jnp.asarray(rng.uniform(0, 1000, (512, 20)), jnp.float32)
p1 = {"w_stds": np.array([1.0, 1.0]), "b_stds": np.array([0.1, 0.1])}
p2 = {"w_stds": np.array([0.24, 0.26]), "b_stds": np.array([62.0, 62.0])}
t0 = time.time()
post = fit_gp(struct, x, y, spec_params=p1, pad_to=6600)
sync((post.l, post.alpha))
print(f"traced+padded fit p1: {time.time()-t0:.2f}s (incl compile)",
      flush=True)
m1, _ = post.predict_mean_std(xt); sync(m1)
for r, p in enumerate((p2, p1, p2)):
    t0 = time.time()
    post = fit_gp(struct, x, y, spec_params=p, diag_reg=5e-4 * (r + 1),
                  pad_to=6600)
    sync((post.l, post.alpha))
    t_fit = time.time() - t0
    t0 = time.time()
    m, _ = post.predict_mean_std(xt); sync(m)
    t_pred = time.time() - t0
    print(f"relearn round {r}: refit {t_fit:.3f}s  predict {t_pred:.3f}s",
          flush=True)
print("hyper change moved the model:",
      float(np.max(np.abs(np.asarray(m) - np.asarray(m1)))) > 1e-2,
      flush=True)
print("ok", flush=True)
