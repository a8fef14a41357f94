"""ARD on the single-table forest workload (fp64 CPU, 10.8k train).

Scalar learn_hyper already beats the reference defaults here (BASELINE.md:
median q 2.542 vs 2.596, MSE 17383 vs 18208). Forest has 10 numeric
columns on a common [0,1000] scale, so ARD's room is pure feature
RELEVANCE weighting — measure whether per-feature scales help beyond the
scalar optimum or overfit the evidence.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nohup python \
       experiments/hyper_ard_forest.py > experiments/hyper_ard_forest.log 2>&1 &
"""
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from nngp_tpu.data.workload import load_single_table_workload
from nngp_tpu.eval.qerror import symmetric_qerror
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_gp, fit_kernel_hyperparams

x, y, infos, _ = load_single_table_workload(
    "workloads/forest_data", relation="forest", name="forest",
    dtype=np.float64)
x_tr, y_tr, _, x_te, y_te, _, *_r = train_test_val_split(
    x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
print(f"train {x_tr.shape} test {x_te.shape}", flush=True)
yv = np.asarray(y_te).ravel()
print("recorded: defaults 2.596/22.33 MSE 18208; scalar learned "
      "2.542/21.65 MSE 17383 (median/p95)", flush=True)

t0 = time.time()
res = fit_kernel_hyperparams(x_tr, y_tr, steps=100, max_points=2048,
                             ard=True)
s = res.feature_scale
print(f"[ard] hyperopt {time.time() - t0:.1f}s: w={res.w:.4f} "
      f"b={res.b:.4f} reg={res.diag_reg:.3e} logev={res.log_evidence:.1f} "
      f"s={np.array2string(s, precision=3)}", flush=True)
t0 = time.time()
post = fit_gp(res.spec, res.scale_inputs(x_tr), y_tr, **res.fit_kwargs())
mm, _ = post.predict_mean_std_chunked(np.asarray(res.scale_inputs(x_te)),
                                      chunk=8192)
err = np.asarray(mm).ravel() - yv
q = symmetric_qerror(err)
print(f"[ard] MSE {np.sum(err ** 2):.1f} median q {np.median(q):.4f} "
      f"p95 {np.quantile(q, 0.95):.4f} p99 {np.quantile(q, 0.99):.4f} "
      f"max {np.max(q):.1f} ({time.time() - t0:.1f}s)", flush=True)
