"""Large-m Nystrom serving ladder on the real chip (synth6_big 90k,
chunk_norm, full-n ARD x DTC learned hypers — the best round-3g recipe).

The on-device df64 stages (finalize='auto') make m=4096/8192 practical:
the host fp64 path scales m^3 on this image's single core (~10 s at 4096,
~80 s at 8192 per stage), the device path rides the MXU. Reports learn
wall once, then per-m: warm fit wall + served q-error quantiles.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  experiments/nystrom_bigm_tpu.py > experiments/nystrom_bigm_tpu.log 2>&1 &
"""
import time

import numpy as np
import jax

from nngp_tpu.data.workload import load_multi_join_workload
from nngp_tpu.eval.qerror import symmetric_qerror
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_kernel_hyperparams, fit_nystrom
from nngp_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)
x, y, infos, _e = load_multi_join_workload(
    "workloads/synth6_big_data", schema_name="synth6", dtype=np.float32,
    chunk_norm=True)
x_tr, y_tr, _, x_te, y_te, _, *_r = train_test_val_split(
    x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
print(f"train {x_tr.shape} test {x_te.shape}", flush=True)
yv = np.asarray(y_te).ravel()

t0 = time.perf_counter()
res = fit_kernel_hyperparams(x_tr, y_tr, steps=100, max_points=None,
                             ard=True, objective="dtc", dtc_m=512)
print(f"full-n ARD x DTC hyperopt: {time.perf_counter() - t0:.1f}s  "
      f"w={res.w:.4f} b={res.b:.4f} reg={res.diag_reg:.3e}", flush=True)
xs_tr = res.scale_inputs(x_tr)
xs_te = np.asarray(res.scale_inputs(x_te))

for m in (2048, 4096, 8192):
    post = fit_nystrom(res.spec, xs_tr, y_tr, num_inducing=m,
                       **res.fit_kwargs())
    sync(post.beta_w)
    t0 = time.perf_counter()
    post = fit_nystrom(res.spec, xs_tr, y_tr, num_inducing=m,
                       **res.fit_kwargs())
    sync(post.beta_w)
    t_fit = time.perf_counter() - t0
    mm, _ = post.predict_mean_std_chunked(xs_te, chunk=8192)
    q = symmetric_qerror(np.asarray(mm).ravel() - yv)
    print(f"m={m} (finalize={post.finalize}): warm fit {t_fit:.2f}s  "
          f"median q {np.median(q):.4f}  p95 {np.quantile(q, 0.95):.2f}  "
          f"p99 {np.quantile(q, 0.99):.2f}  max {q.max():.1f}", flush=True)
