"""Is the fp32 hyperopt serving gap (2.154 vs fp64's 1.999 median q on
synth6_big, CLAUDE.md round-3h) caused by the raised K_mm jitter floor
(1e-4 vs 1e-10) or by fp32 gradient noise generally?

Probe: run the SAME fp64-CPU ARD x DTC optimization at both jitter
settings (`fit_kernel_hyperparams(mm_jitter_rel=...)`), compare learned
theta + served q-error. If fp64@1e-4 lands near fp64@1e-10, the floor is
harmless and the fp32 gap is arithmetic noise (a df64-hardened solve
would not close it); if fp64@1e-4 reproduces the fp32 gap, it would.

Run (CPU, fp64): PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nohup python \
  experiments/dtc_jitter_probe.py > experiments/dtc_jitter_probe.log 2>&1 &
"""
import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

from nngp_tpu.data.workload import load_multi_join_workload
from nngp_tpu.eval.qerror import symmetric_qerror
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_kernel_hyperparams, fit_nystrom

print("backend:", jax.default_backend(), flush=True)
x, y, infos, _e = load_multi_join_workload(
    "workloads/synth6_big_data", schema_name="synth6", dtype=np.float64,
    chunk_norm=True)
x_tr, y_tr, _, x_te, y_te, _, *_r = train_test_val_split(
    x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
yv = np.asarray(y_te).ravel()
print(f"train {x_tr.shape}", flush=True)

for jit_rel in (1e-10, 1e-4):
    t0 = time.time()
    res = fit_kernel_hyperparams(x_tr, y_tr, steps=100, max_points=2048,
                                 ard=True, objective="dtc", dtc_m=512,
                                 mm_jitter_rel=jit_rel)
    s = res.feature_scale
    print(f"[jitter={jit_rel:g}] {time.time()-t0:.0f}s  w={res.w:.4f} "
          f"b={res.b:.4f} reg={res.diag_reg:.3e} "
          f"logev={res.log_evidence:.1f} s=[{s.min():.3g},{s.max():.3g}]",
          flush=True)
    post = fit_nystrom(res.spec, res.scale_inputs(x_tr), y_tr,
                       num_inducing=2048, **res.fit_kwargs())
    mm, _ = post.predict_mean_std_chunked(
        np.asarray(res.scale_inputs(x_te)), chunk=8192)
    q = symmetric_qerror(np.asarray(mm).ravel() - yv)
    print(f"[jitter={jit_rel:g}] median q {np.median(q):.4f} "
          f"p95 {np.quantile(q, 0.95):.2f}", flush=True)
