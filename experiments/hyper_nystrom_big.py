"""Transferability at scale: hyperparameters learned on a 2048-row subsample,
applied to the 90k-row streaming Nystrom fit (synth6_big, chunk_norm,
fp64 CPU). Tests the claim that the relative-ridge + row-wise kernel make
learned hyperparameters data-size- and tier-transferable.

Baseline (BASELINE.md): default m=2048 chunk_norm = median 2.399 / p95 23.8.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nohup python \
       experiments/hyper_nystrom_big.py > experiments/hyper_nystrom_big.log 2>&1 &
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
from nngp_tpu.models.kernel_spec import reference_kernel

x, y, infos, _e = load_multi_join_workload(
    "workloads/synth6_big_data", schema_name="synth6", dtype=np.float64,
    chunk_norm=True)
x_tr, y_tr, _, x_te, y_te, _, *_r = train_test_val_split(
    x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
print(f"train {x_tr.shape} test {x_te.shape}", flush=True)
yv = np.asarray(y_te).ravel()


def report(tag, spec, reg, input_scale=None):
    t0 = time.time()
    post = fit_nystrom(spec, x_tr, y_tr, num_inducing=2048, diag_reg=reg,
                       input_scale=input_scale)
    t_fit = time.time() - t0
    mm, _ = post.predict_mean_std_chunked(np.asarray(x_te), chunk=8192)
    q = symmetric_qerror(np.asarray(mm).ravel() - yv)
    print(f"[{tag}] median q {np.median(q):.4f} p95 "
          f"{np.quantile(q, 0.95):.4f} p99 {np.quantile(q, 0.99):.4f} "
          f"max {np.max(q):.1f} rank={post.rank} fit={t_fit:.1f}s",
          flush=True)
    del post


report("default m=2048", reference_kernel(), 1e-3)

t0 = time.time()
res = fit_kernel_hyperparams(x_tr, y_tr, steps=100, max_points=2048)
print(f"hyperopt {time.time() - t0:.1f}s (on 2048 of 90k rows): "
      f"w0={res.w0:.4f} w={res.w:.4f} b={res.b:.4f} reg={res.diag_reg:.3e} "
      f"logev={res.log_evidence:.1f}", flush=True)
kw = res.fit_kwargs()
report("learned m=2048", res.spec, kw["diag_reg"], kw.get("input_scale"))
