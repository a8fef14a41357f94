"""ARD x DTC-objective hyperopt at scale (synth6_big 90k, chunk_norm,
fp64 CPU) — the remaining shot at beating the DEFAULT kernel on the
served Nystrom tier.

Recorded 90k m=2048 baselines (BASELINE.md): default 2.399/23.8,
exact-objective learned 2.557/26.2, dtc-objective scalar learned
2.519/25.6 (median/p95). Scalar DTC learning closed most of the exact
objective's gap; ARD adds per-feature relevance (it beat every scalar
config at 10.8k: 2.32 vs 2.69 median). Question: does ARD + the served
tier's own evidence transfer from the 2048-row subsample to the
90k-row DTC fit, or does the subsample's Zipf-tail blindness still
dominate?

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nohup python \
       experiments/hyper_ard_dtc_big.py > experiments/hyper_ard_dtc_big.log 2>&1 &
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
print("recorded baselines (median/p95): default 2.399/23.8, exact-learned "
      "2.557/26.2, dtc-scalar-learned 2.519/25.6", flush=True)

t0 = time.time()
res = fit_kernel_hyperparams(x_tr, y_tr, steps=100, max_points=2048,
                             ard=True, objective="dtc", dtc_m=512)
s = res.feature_scale
print(f"[ard+dtc512] hyperopt {time.time() - t0:.1f}s: w={res.w:.4f} "
      f"b={res.b:.4f} reg={res.diag_reg:.3e} logev={res.log_evidence:.1f} "
      f"s=[{s.min():.3g}, {s.max():.3g}]", flush=True)
t0 = time.time()
post = fit_nystrom(res.spec, res.scale_inputs(x_tr), y_tr,
                   num_inducing=2048, **res.fit_kwargs())
t_fit = time.time() - t0
mm, _ = post.predict_mean_std_chunked(
    np.asarray(res.scale_inputs(x_te)), chunk=8192)
q = symmetric_qerror(np.asarray(mm).ravel() - yv)
print(f"[ard+dtc512] median q {np.median(q):.4f} p95 "
      f"{np.quantile(q, 0.95):.4f} p99 {np.quantile(q, 0.99):.4f} "
      f"max {np.max(q):.1f} rank={post.rank} fit={t_fit:.1f}s "
      f"dtc_logev={post.log_evidence():.1f}", flush=True)
