"""Attribute the fp32 Nystrom serving gap (on-chip 2.154 vs fp64-CPU 1.999
median q with full-n ARD x DTC hypers): is it the fp32 LEARNING (K_mm
jitter floor 1e-4 + fp32 loss) or the fp32 SERVING fit (panel moments /
whitening)?

Control: DEFAULT kernel (no hyperopt) on synth6_big 90k, m=2048 — fp64 CPU
measured 2.399/23.8 (BASELINE). Serve the SAME kernel fp32 on the chip; if
the fp32 serving path reproduces ~2.40, the serving tier is
precision-clean and the learned-hyper gap lives in the fp32 learning
stage; a materially worse number indicts the fp32 moments.

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
  experiments/nystrom_fp32_gap.py > experiments/nystrom_fp32_gap.log 2>&1
"""
import time

import numpy as np
import jax

from nngp_tpu.data.workload import load_multi_join_workload
from nngp_tpu.eval.qerror import symmetric_qerror
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_nystrom
from nngp_tpu.models.kernel_spec import reference_kernel
from nngp_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)
x, y, infos, _e = load_multi_join_workload(
    "workloads/synth6_big_data", schema_name="synth6", dtype=np.float32,
    chunk_norm=True)
x_tr, y_tr, _, x_te, y_te, _, *_ = train_test_val_split(
    x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
yv = np.asarray(y_te).ravel()
spec = reference_kernel()

t0 = time.perf_counter()
post = fit_nystrom(spec, x_tr, y_tr, num_inducing=2048, diag_reg=1e-3)
sync(post.beta_w)
print(f"fit {time.perf_counter()-t0:.2f}s", flush=True)
mm, _ = post.predict_mean_std_chunked(np.asarray(x_te), chunk=8192)
q = symmetric_qerror(np.asarray(mm).ravel() - yv)
print(f"default kernel fp32 TPU 90k m=2048: median q {np.median(q):.4f} "
      f"p95 {np.quantile(q, 0.95):.4f} p99 {np.quantile(q, 0.99):.4f} "
      f"(fp64 CPU reference: 2.399/23.8/105)", flush=True)
