"""Calibration A/B: reference-default vs MLL-learned hyperparameters.

The learned kernel's evidence gain is mostly a LIKELIHOOD gain — this
measures whether it shows up where std is consumed (expected-vs-observed
coverage, `eval/calibration.py`, the reference's util.py:296-313 plot).
Learned values are taken from the seeded hyperopt runs
(experiments/hyper_forest_cpu.log, hyper_synth6.log) to avoid re-paying
the 10-20 min fp64 optimization on this 1-core image.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nohup python \
       experiments/hyper_calibration.py > experiments/hyper_calibration.log 2>&1 &
"""
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from nngp_tpu.data.workload import (load_multi_join_workload,
                                    load_single_table_workload)
from nngp_tpu.eval.calibration import calibration_table
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_gp
from nngp_tpu.gp.hyperopt import _build_layers
from nngp_tpu.models.kernel_spec import KernelSpec, reference_kernel


def cal(tag, spec, reg, x_tr, y_tr, x_te, y_te, input_scale=None):
    t0 = time.perf_counter()
    post = fit_gp(spec, x_tr, y_tr, diag_reg=reg, input_scale=input_scale)
    m, s = post.predict_mean_std_chunked(np.asarray(x_te), chunk=8192)
    tab = calibration_table(y_te, np.asarray(m), np.asarray(s))
    err = np.mean([abs(p - o) for p, o in tab.items()])  # expected-vs-observed MAE
    rows = " ".join(f"{p:.1f}:{o:.3f}" for p, o in sorted(tab.items()))
    print(f"[{tag}] calibration MAE {err:.4f}  ({rows})  "
          f"({time.perf_counter() - t0:.1f}s)", flush=True)
    del post


# ---- forest (hyper_forest_cpu.log learned values) ----
x, y, infos, _ = load_single_table_workload(
    "workloads/forest_data", relation="forest", name="forest",
    dtype=np.float64)
x_tr, y_tr, _, x_te, y_te, *_r = train_test_val_split(
    x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
y_te = np.asarray(y_te).ravel()
cal("forest default", reference_kernel(), 1e-3, x_tr, y_tr, x_te, y_te)
learned_f = KernelSpec(_build_layers(1, "relu", 512, 0.2379, 0.2593, 62.2186))
cal("forest learned", learned_f, 1.018e-3, x_tr, y_tr, x_te, y_te,
    input_scale=1.0)

# ---- synth6 chunk_norm (hyper_synth6.log learned values) ----
xj, yj, infos_j, _e = load_multi_join_workload(
    "workloads/synth6_join_data", schema_name="synth6", dtype=np.float64,
    chunk_norm=True)
xj_tr, yj_tr, _, xj_te, yj_te, *_r2 = train_test_val_split(
    xj, yj, train_frac=0.6, test_frac=0.2, all_query_infos=infos_j)
yj_te = np.asarray(yj_te).ravel()
cal("synth6 default", reference_kernel(), 1e-3, xj_tr, yj_tr, xj_te, yj_te)
learned_j = KernelSpec(_build_layers(1, "relu", 512, 0.2692, 0.2693, 34.5932))
cal("synth6 learned", learned_j, 2.703e-3, xj_tr, yj_tr, xj_te, yj_te,
    input_scale=1.0)
