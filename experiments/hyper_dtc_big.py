"""DTC-objective hyperparameter learning at scale (synth6_big, 90k rows,
chunk_norm, fp64 CPU).

The exact-GP-evidence optimum measurably LOSES on the streaming Nystrom
tier (BASELINE.md: learned 2.557/26.2 vs default 2.399/23.8 median/p95) —
evidence of the exact model is not the served DTC model's objective.
`fit_kernel_hyperparams(objective='dtc')` optimizes the DTC evidence
itself (same subsample, dtc_m inducing rows). Two dtc_m values probe
sensitivity to the inducing fraction (served tier: m=2048 of 90k ~ 2.3%;
dtc_m=64 of 2048 matches the ratio, 512 matches more capacity).

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nohup python \
       experiments/hyper_dtc_big.py > experiments/hyper_dtc_big.log 2>&1 &
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
print("recorded baselines: default 2.399/23.8, exact-learned 2.557/26.2 "
      "(median/p95)", flush=True)

for dtc_m in (64, 512):
    t0 = time.time()
    res = fit_kernel_hyperparams(x_tr, y_tr, steps=100, max_points=2048,
                                 objective="dtc", dtc_m=dtc_m)
    print(f"[dtc_m={dtc_m}] hyperopt {time.time() - t0:.1f}s: "
          f"w0={res.w0:.4f} w={res.w:.4f} b={res.b:.4f} "
          f"reg={res.diag_reg:.3e} logev={res.log_evidence:.1f}", flush=True)
    kw = res.fit_kwargs()
    t0 = time.time()
    post = fit_nystrom(res.spec, x_tr, y_tr, num_inducing=2048, **kw)
    t_fit = time.time() - t0
    mm, _ = post.predict_mean_std_chunked(np.asarray(x_te), chunk=8192)
    q = symmetric_qerror(np.asarray(mm).ravel() - yv)
    print(f"[dtc_m={dtc_m}] median q {np.median(q):.4f} p95 "
          f"{np.quantile(q, 0.95):.4f} p99 {np.quantile(q, 0.99):.4f} "
          f"max {np.max(q):.1f} rank={post.rank} fit={t_fit:.1f}s "
          f"dtc_logev={post.log_evidence():.1f}", flush=True)
    del post
