"""ARD x DTC hyperopt on the FULL 54k-row train set (synth6_big 90k,
chunk_norm, fp64 CPU) — the endpoint of the subsample scaling curve
(2048 -> 32768 monotone, BASELINE.md table) and the actual TPU-era
recommendation (`--hyper_points 0`).

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nohup python \
  experiments/hyper_ard_dtc_fulln.py > experiments/hyper_ard_dtc_fulln.log 2>&1 &
"""
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from nngp_tpu.data.workload import load_multi_join_workload
from nngp_tpu.eval.qerror import symmetric_qerror
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_kernel_hyperparams, fit_nystrom

x, y, infos, _e = load_multi_join_workload(
    "workloads/synth6_big_data", schema_name="synth6", dtype=np.float64,
    chunk_norm=True)
x_tr, y_tr, _, x_te, y_te, _, *_r = train_test_val_split(
    x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
print(f"train {x_tr.shape} test {x_te.shape}", flush=True)
yv = np.asarray(y_te).ravel()
print("curve so far (median/p95): 2048 2.295/21.4, 32768 2.091/19.04",
      flush=True)

t0 = time.time()
res = fit_kernel_hyperparams(x_tr, y_tr, steps=100, max_points=None,
                             ard=True, objective="dtc", dtc_m=512)
s = res.feature_scale
print(f"[ard+dtc@full54k] hyperopt {time.time() - t0:.1f}s: w={res.w:.4f} "
      f"b={res.b:.4f} reg={res.diag_reg:.3e} logev={res.log_evidence:.1f} "
      f"s=[{s.min():.3g}, {s.max():.3g}]", flush=True)
t0 = time.time()
post = fit_nystrom(res.spec, res.scale_inputs(x_tr), y_tr,
                   num_inducing=2048, **res.fit_kwargs())
t_fit = time.time() - t0
mm, _ = post.predict_mean_std_chunked(
    np.asarray(res.scale_inputs(x_te)), chunk=8192)
q = symmetric_qerror(np.asarray(mm).ravel() - yv)
print(f"[ard+dtc@full54k] median q {np.median(q):.4f} p95 "
      f"{np.quantile(q, 0.95):.4f} p99 {np.quantile(q, 0.99):.4f} "
      f"max {np.max(q):.1f} fit={t_fit:.1f}s "
      f"dtc_logev={post.log_evidence():.1f}", flush=True)
