"""ARD vs the chunk_norm heuristic on synth6 (fp64 CPU, 10.8k train).

chunk_norm rescales packed categorical chunk slots onto [0,1000] by a
hand-picked rule (median q 2.685 at 10.8k, hyper_synth6.log). ARD learns a
per-feature scale by evidence. Two configurations:
  (b) chunk_norm features + ARD refinement (init s=1)
  (c) RAW features + ARD initialized at chunk_norm-like geometry
      (s_j = 1000/max_j) — the fully learned replacement for the heuristic

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nohup python \
       experiments/hyper_ard_synth6.py > experiments/hyper_ard_synth6.log 2>&1 &
"""
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from nngp_tpu.data.workload import load_multi_join_workload
from nngp_tpu.eval.qerror import symmetric_qerror
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_gp, fit_kernel_hyperparams


def run(tag, chunk_norm, init_scale_rule):
    x, y, infos, _e = load_multi_join_workload(
        "workloads/synth6_join_data", schema_name="synth6",
        dtype=np.float64, chunk_norm=chunk_norm)
    x_tr, y_tr, _, x_te, y_te, _, *_r = train_test_val_split(
        x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
    yv = np.asarray(y_te).ravel()
    init_s = init_scale_rule(np.asarray(x_tr)) if init_scale_rule else None
    t0 = time.time()
    res = fit_kernel_hyperparams(x_tr, y_tr, steps=100, max_points=2048,
                                 ard=True, init_feature_scale=init_s)
    t_hyp = time.time() - t0
    s = res.feature_scale
    print(f"[{tag}] hyperopt {t_hyp:.1f}s: w={res.w:.4f} b={res.b:.4f} "
          f"reg={res.diag_reg:.3e} logev={res.log_evidence:.1f} "
          f"s range [{s.min():.3g}, {s.max():.3g}]", flush=True)
    t0 = time.time()
    post = fit_gp(res.spec, res.scale_inputs(x_tr), y_tr,
                  **res.fit_kwargs())
    mm, _ = post.predict_mean_std_chunked(
        np.asarray(res.scale_inputs(x_te)), chunk=8192)
    q = symmetric_qerror(np.asarray(mm).ravel() - yv)
    print(f"[{tag}] median q {np.median(q):.4f} p95 "
          f"{np.quantile(q, 0.95):.4f} p99 {np.quantile(q, 0.99):.4f} "
          f"max {np.max(q):.1f} ({time.time() - t0:.1f}s)", flush=True)
    del post


run("b: chunk_norm + ARD", True, None)
run("c: raw + ARD(1000/max init)", False,
    lambda xtr: 1000.0 / np.maximum(np.abs(xtr).max(axis=0), 1e-6))
