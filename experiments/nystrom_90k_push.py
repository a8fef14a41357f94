"""Push the round-4 90k headline (median q 2.1318 / p95 20.06 at m=2048,
rank_rtol 1e-12): does more inducing capacity (m=4096) or a deeper cut
(1e-14) buy more accuracy at acceptable fit cost? One full-n ARD x DTC
hyperopt (dtc_m=512 — the objective is independent of the served m), then
a grid of (m, rank_rtol) Nystrom fits with df64 moments.

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/nystrom_90k_push.py
"""

import time

import numpy as np

from nngp_tpu.data.workload import load_multi_join_workload
from nngp_tpu.eval.qerror import symmetric_qerror
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_kernel_hyperparams, fit_nystrom
from nngp_tpu.utils.timing import sync

import jax

print("devices:", jax.devices(), flush=True)

x, y, infos, _ = load_multi_join_workload(
    "workloads/synth6_big_data", schema_name="synth6", dtype=np.float32,
    chunk_norm=True)
x_tr, y_tr, _, x_te, y_te, _, _, _, _ = train_test_val_split(
    x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
print(f"train {x_tr.shape} test {x_te.shape}", flush=True)
yv = np.asarray(y_te, np.float64).ravel()

t0 = time.perf_counter()
res = fit_kernel_hyperparams(x_tr, y_tr, steps=100, max_points=None,
                             ard=True, objective="dtc", dtc_m=512)
print(f"hyperopt (full-n ARD x DTC) {time.perf_counter() - t0:.1f}s "
      f"logev={res.log_evidence:.1f}", flush=True)
x_trs = res.scale_inputs(x_tr)
x_tes = np.asarray(res.scale_inputs(x_te))

for m in (2048, 4096):
    for rtol in (1e-12, 1e-14):
        t0 = time.perf_counter()
        post = fit_nystrom(res.spec, x_trs, y_tr, num_inducing=m,
                           moments="df64", rank_rtol=rtol,
                           **res.fit_kwargs())
        sync(post.beta_w)
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        post = fit_nystrom(res.spec, x_trs, y_tr, num_inducing=m,
                           moments="df64", rank_rtol=rtol,
                           **res.fit_kwargs())
        sync(post.beta_w)
        t_warm = time.perf_counter() - t0
        mb, _ = post.predict_mean_std_chunked(x_tes)
        q = symmetric_qerror(np.asarray(mb, np.float64).ravel() - yv)
        print(f"m={m} rtol={rtol:g}: fit cold {t_cold:.2f}s warm "
              f"{t_warm:.2f}s  median {np.median(q):.4f}  "
              f"p90 {np.quantile(q, 0.90):.2f}  "
              f"p95 {np.quantile(q, 0.95):.2f}  "
              f"p99 {np.quantile(q, 0.99):.2f}  max {q.max():.1f}",
              flush=True)
        del post
