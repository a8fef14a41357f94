"""Do learned hyperparameters also beat the defaults on the 6-table join
workload? fp64 CPU, chunk_norm encoding (the accuracy-bearing variant —
raw packed chunks saturate at median q ~9.8 regardless of kernel).

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nohup python \
       experiments/hyper_synth6.py > experiments/hyper_synth6.log 2>&1 &
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
from nngp_tpu.models.kernel_spec import reference_kernel

x, y, infos, enc = load_multi_join_workload(
    "workloads/synth6_join_data", schema_name="synth6", dtype=np.float64,
    chunk_norm=True)
x_tr, y_tr, _, x_te, y_te, _, *_r = train_test_val_split(
    x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
print(f"train {x_tr.shape} test {x_te.shape}", flush=True)
yv = np.asarray(y_te).ravel()


def report(tag, spec, diag_reg, input_scale=None):
    t0 = time.perf_counter()
    post = fit_gp(spec, x_tr, y_tr, diag_reg=diag_reg,
                  input_scale=input_scale)
    mm, _ = post.predict_mean_std_chunked(np.asarray(x_te), chunk=8192)
    q = symmetric_qerror(np.asarray(mm).ravel() - yv)
    print(f"[{tag}] median q {np.median(q):.4f} p95 "
          f"{np.quantile(q, 0.95):.4f} p99 {np.quantile(q, 0.99):.4f} "
          f"max {np.max(q):.1f}  logev {post.log_marginal_likelihood():.1f} "
          f"({time.perf_counter() - t0:.1f}s)", flush=True)
    del post


report("default w=1 b=0 reg=1e-3", reference_kernel(), 1e-3)

t0 = time.perf_counter()
res = fit_kernel_hyperparams(x_tr, y_tr, steps=100, max_points=2048)
print(f"hyperopt {time.perf_counter() - t0:.1f}s: w0={res.w0:.4f} "
      f"w={res.w:.4f} b={res.b:.4f} reg={res.diag_reg:.3e} "
      f"logev={res.log_evidence:.1f}", flush=True)
kw = res.fit_kwargs()
report("learned", res.spec, kw["diag_reg"], kw.get("input_scale"))
