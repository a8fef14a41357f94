"""Does a bigger hyperopt subsample close the remaining DTC gap at 90k?

Hypothesis from BASELINE.md: scalar DTC-objective learning (dtc_m=512 on a
2048-row subsample) lands at 2.519/25.6 vs the default kernel's 2.399/23.8
because the 2048-row subsample cannot see the Zipf tail the served
m=2048-of-90k model handles. The DTC loss is O(n m^2)/step — a LINEAR-in-n
objective — so scaling the subsample 8x (16,384 rows) is affordable where
the exact O(n^3) loss would not be. If the hypothesis is right, q-error
should move toward the defaults as the subsample grows.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nohup python \
       experiments/hyper_dtc_sub16k.py > experiments/hyper_dtc_sub16k.log 2>&1 &
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
print("recorded baselines (median/p95): default 2.399/23.8, "
      "dtc@2048-sub 2.519/25.6", flush=True)

for sub in (8192, 16384):
    t0 = time.time()
    res = fit_kernel_hyperparams(x_tr, y_tr, steps=100, max_points=sub,
                                 objective="dtc", dtc_m=512)
    print(f"[sub={sub}] hyperopt {time.time() - t0:.1f}s: w0={res.w0:.4f} "
          f"w={res.w:.4f} b={res.b:.4f} reg={res.diag_reg:.3e} "
          f"logev={res.log_evidence:.1f}", flush=True)
    t0 = time.time()
    post = fit_nystrom(res.spec, x_tr, y_tr, num_inducing=2048,
                       **res.fit_kwargs())
    t_fit = time.time() - t0
    mm, _ = post.predict_mean_std_chunked(np.asarray(x_te), chunk=8192)
    q = symmetric_qerror(np.asarray(mm).ravel() - yv)
    print(f"[sub={sub}] median q {np.median(q):.4f} p95 "
          f"{np.quantile(q, 0.95):.4f} p99 {np.quantile(q, 0.99):.4f} "
          f"max {np.max(q):.1f} fit={t_fit:.1f}s "
          f"dtc_logev={post.log_evidence():.1f}", flush=True)
    del post
