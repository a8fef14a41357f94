"""Hyperopt on the real chip: wall time of the one-dispatch optimization and
forest q-error with learned vs default hyperparameters (fp32 TPU).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/hyper_tpu.py \
       > experiments/hyper_tpu.log 2>&1 &
"""
import time

import numpy as np
import jax

from nngp_tpu.data.workload import load_single_table_workload
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.eval.qerror import symmetric_qerror
from nngp_tpu.gp import fit_gp, fit_kernel_hyperparams
from nngp_tpu.models.kernel_spec import KernelSpec, mlp, reference_kernel
from nngp_tpu.utils.timing import sync

print("devices:", jax.devices())
x, y, infos, _ = load_single_table_workload(
    "workloads/forest_data", relation="forest", name="forest",
    dtype=np.float32)
(x_tr, y_tr, _i1, x_te, y_te, _i2, _xv, _yv, _iv) = train_test_val_split(
    x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
print(f"train {x_tr.shape} test {x_te.shape}")


def qerr(spec, diag_reg, input_scale=None, tag=""):
    t0 = time.perf_counter()
    post = fit_gp(spec, x_tr, y_tr, diag_reg=diag_reg,
                  input_scale=input_scale)
    sync(post.alpha)
    t1 = time.perf_counter()
    mean, _ = post.predict_mean_std(x_te)
    q = symmetric_qerror(np.asarray(mean).ravel() - np.asarray(y_te).ravel())
    print(f"[{tag}] fit {t1 - t0:.3f}s  median={np.median(q):.4f} "
          f"p95={np.quantile(q, 0.95):.4f} p99={np.quantile(q, 0.99):.4f} "
          f"max={np.max(q):.4f}  logev={post.log_marginal_likelihood():.1f}",
          flush=True)
    del post


qerr(reference_kernel(), 1e-3, tag="default w=1 b=0 reg=1e-3")

for steps, pts in ((100, 2048), (100, 4096)):
    t0 = time.perf_counter()
    res = fit_kernel_hyperparams(x_tr, y_tr, steps=steps, max_points=pts)
    t1 = time.perf_counter()   # includes compile on first call
    res2 = fit_kernel_hyperparams(x_tr, y_tr, steps=steps, max_points=pts,
                                  seed=1)
    t2 = time.perf_counter()   # warm
    print(f"hyperopt steps={steps} n={pts}: cold {t1 - t0:.1f}s "
          f"warm {t2 - t1:.3f}s  w0={res.w0:.4f} w={res.w:.4f} "
          f"b={res.b:.4f} reg={res.diag_reg:.3e} "
          f"logev={res.log_evidence:.1f}", flush=True)
    qerr(res.spec, res.diag_reg, **{k: v for k, v in res.fit_kwargs().items()
                                    if k == "input_scale"},
         tag=f"learned n={pts}")

# NTK mode: one dispatch as well (fp32 on-chip vs the fp64 CPU log)
t0 = time.perf_counter()
rn = fit_kernel_hyperparams(x_tr, y_tr, get="ntk", steps=100,
                            max_points=2048)
print(f"hyperopt ntk n=2048: cold {time.perf_counter() - t0:.1f}s "
      f"w0={rn.w0:.4f} w={rn.w:.4f} b={rn.b:.4f} reg={rn.diag_reg:.3e} "
      f"logev={rn.log_evidence:.1f}", flush=True)
