import time
import numpy as np
import jax, jax.numpy as jnp
from nngp_tpu.gp import fit_gp
from nngp_tpu.models.kernel_spec import reference_kernel
from nngp_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
spec = reference_kernel()
x = rng.uniform(0, 1000, (2000, 20)).astype(np.float32)
y = rng.standard_normal((2000, 1)).astype(np.float32)
post = fit_gp(spec, x, y, input_scale=1.0, pad_to=3000)
sync((post.l, post.alpha))
dense = fit_gp(spec, x, y, input_scale=1.0)
sync((dense.l, dense.alpha))
# ragged online batches, all bucketing to 64 -> ONE compiled append
for r, m in enumerate((3, 17, 41, 64, 9)):
    xn = rng.uniform(0, 1000, (m, 20)).astype(np.float32)
    yn = rng.standard_normal((m, 1)).astype(np.float32)
    t0 = time.time()
    post = post.extend(xn, yn, bucket=64)
    sync((post.l, post.alpha))
    t = time.time() - t0
    dense = dense.extend(xn, yn)
    sync((dense.l, dense.alpha))
    print(f"batch {r} (m={m}): bucketed extend {t:.3f}s  "
          f"n_real={post.num_train}", flush=True)
xt = jnp.asarray(rng.uniform(0, 1000, (256, 20)), jnp.float32)
mp, sp = map(np.asarray, post.predict_mean_std(xt))
md, sd = map(np.asarray, dense.predict_mean_std(xt))
print("mean max|d| vs dense:", float(np.max(np.abs(mp - md))),
      " std max rel:", float(np.max(np.abs(sp - sd) / np.maximum(sd, 1e-6))),
      flush=True)
assert post.num_train == dense.num_train == 2134
print("ok", flush=True)
