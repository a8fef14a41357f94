"""ARD x DTC hyperopt ON THE REAL CHIP (fp32, synth6_big 90k, chunk_norm):
wall time of the one-dispatch full-n optimization + served Nystrom q-error,
to back the BASELINE.md guidance "spend hyperopt rows freely on TPU" with a
measured TPU number (the scaling curve's costs are 1-core fp64 CPU).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  experiments/hyper_ard_dtc_tpu.py > experiments/hyper_ard_dtc_tpu.log 2>&1 &
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
print("fp64-CPU curve (median/p95): 2048 2.295/21.4, 32768 2.091/19.04",
      flush=True)

for rows in (2048, 32768, None):
    t0 = time.perf_counter()
    res = fit_kernel_hyperparams(x_tr, y_tr, steps=100, max_points=rows,
                                 ard=True, objective="dtc", dtc_m=512)
    t_learn = time.perf_counter() - t0
    s = res.feature_scale
    print(f"[rows={rows or 'full'}] hyperopt {t_learn:.2f}s (incl compile): "
          f"w={res.w:.4f} b={res.b:.4f} reg={res.diag_reg:.3e} "
          f"logev={res.log_evidence:.1f} s=[{s.min():.3g},{s.max():.3g}]",
          flush=True)
    t0 = time.perf_counter()
    post = fit_nystrom(res.spec, res.scale_inputs(x_tr), y_tr,
                       num_inducing=2048, **res.fit_kwargs())
    sync(post.beta_w)
    t_fit = time.perf_counter() - t0
    mm, _ = post.predict_mean_std_chunked(
        np.asarray(res.scale_inputs(x_te)), chunk=8192)
    q = symmetric_qerror(np.asarray(mm).ravel() - yv)
    print(f"[rows={rows or 'full'}] median q {np.median(q):.4f} p95 "
          f"{np.quantile(q, 0.95):.4f} p99 {np.quantile(q, 0.99):.4f} "
          f"max {np.max(q):.1f} fit={t_fit:.2f}s", flush=True)
    del post, res
