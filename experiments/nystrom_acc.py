"""fp32 Nystrom accuracy on the real TPU: rank_rtol + m sweep vs exact fit."""
import sys
import time

import numpy as np
import jax.numpy as jnp

from nngp_tpu.data.workload import load_single_table_workload
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.eval.qerror import symmetric_qerror
from nngp_tpu.gp import fit_gp
from nngp_tpu.gp.nystrom import fit_nystrom
from nngp_tpu.models.kernel_spec import reference_kernel
from nngp_tpu.utils.timing import sync

max_train = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
ms = [int(v) for v in sys.argv[2].split(",")] if len(sys.argv) > 2 else [512]
rtols = ([float(v) for v in sys.argv[3].split(",")] if len(sys.argv) > 3
         else [1e-6, 1e-5, 1e-4])
get = sys.argv[4] if len(sys.argv) > 4 else "nngp"

x, y, infos, _ = load_single_table_workload(
    "workloads/forest_data", relation="forest", name="forest",
    dtype=np.float32)
(x_tr, y_tr, _i, x_te, y_te, _it, *_r) = train_test_val_split(
    x, y, 0.6, 0.2, max_num_train=max_train)
spec = reference_kernel()
yv = np.asarray(y_te).ravel()
xt = jnp.asarray(x_te)

exact = fit_gp(spec, x_tr, y_tr, get=get)
m0, s0 = exact.predict_mean_std(xt)
q = symmetric_qerror(np.asarray(m0).ravel() - yv)
print(f"exact n={x_tr.shape[0]} get={get}: median q {np.median(q):.4f} "
      f"p95 {np.quantile(q, 0.95):.4f}", flush=True)
del exact, m0, s0

for m in ms:
    for rt in rtols:
        t0 = time.time()
        post = fit_nystrom(spec, x_tr, y_tr, num_inducing=m, rank_rtol=rt,
                           get=get)
        sync(post.beta_w)
        t_fit = time.time() - t0
        mm, ss = post.predict_mean_std(xt)
        mm = np.asarray(mm).ravel()
        ss = np.asarray(ss).ravel()
        if not np.all(np.isfinite(mm)):
            print(f"m={m} rtol={rt:g}: mean NaN", flush=True)
            continue
        q = symmetric_qerror(mm - yv)
        print(f"m={m} rtol={rt:g} rank={post.rank}: median q "
              f"{np.median(q):.4f} p95 {np.quantile(q, 0.95):.4f} "
              f"std_finite={bool(np.all(np.isfinite(ss)))} "
              f"fit={t_fit:.2f}s(cold)", flush=True)
        del post
