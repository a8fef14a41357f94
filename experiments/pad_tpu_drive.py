import time
import numpy as np
import jax, jax.numpy as jnp
from nngp_tpu.data.workload import load_single_table_workload
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_gp
from nngp_tpu.models.kernel_spec import reference_kernel
from nngp_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)
x, y, infos, _ = load_single_table_workload(
    "workloads/forest_data", relation="forest", name="forest",
    dtype=np.float32)
(x_tr, y_tr, _i1, x_pool, y_pool, _i2, x_val, y_val, _i3) = \
    train_test_val_split(x, y, train_frac=0.2, test_frac=0.6,
                         all_query_infos=infos)
spec = reference_kernel()
t0 = time.time()
post = fit_gp(spec, x_tr, y_tr, input_scale=1.0, pad_to=6600)
sync((post.l, post.alpha))
print(f"padded fit (3600 -> pad 6600): {time.time()-t0:.2f}s (incl compile)",
      flush=True)
dense = fit_gp(spec, x_tr, y_tr, input_scale=1.0)
sync((dense.l, dense.alpha))
for r in range(3):
    s, e = r*1000, (r+1)*1000
    t0 = time.time()
    post = post.extend(x_pool[s:e], y_pool[s:e])
    sync((post.l, post.alpha))
    t_pad = time.time()-t0
    t0 = time.time()
    dense = dense.extend(x_pool[s:e], y_pool[s:e])
    sync((dense.l, dense.alpha))
    t_dense = time.time()-t0
    print(f"round {r}: padded extend {t_pad:.3f}s  dense extend {t_dense:.3f}s"
          f"  (padded shape {post.l.shape}, n_real {post.num_train})",
          flush=True)
mp, sp = post.predict_mean_std(jnp.asarray(x_val[:512]))
md, sd = dense.predict_mean_std(jnp.asarray(x_val[:512]))
mp, sp, md, sd = map(np.asarray, (mp, sp, md, sd))
print("mean max|d| vs dense:", float(np.max(np.abs(mp-md))),
      " std max rel:", float(np.max(np.abs(sp-sd)/np.maximum(sd, 1e-6))),
      flush=True)
print("val MSE padded:", float(np.mean((mp.ravel()-y_val[:512].ravel())**2)),
      "dense:", float(np.mean((md.ravel()-y_val[:512].ravel())**2)), flush=True)
