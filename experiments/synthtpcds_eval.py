"""Evaluate the TPC-DS-shaped workload (synthtpcds, 12k queries, star
with the store_sales-item-promotion join triangle, 99-dim wide-fact
encoding) on the exact-GP tier: reference defaults vs scalar-learned vs
ARD-learned hyperparameters, fp64 CPU oracle. All columns numerical
(`nngp_tpu/data/loaders.py:92-122`); the wide correlated ext_* fact
columns are exactly the setting where per-feature relevance (ARD) should
pay.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nohup python \
  experiments/synthtpcds_eval.py > experiments/synthtpcds_eval.log 2>&1 &
"""
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from nngp_tpu.data.workload import load_multi_join_workload
from nngp_tpu.eval.qerror import symmetric_qerror
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_gp, fit_kernel_hyperparams
from nngp_tpu.models.kernel_spec import reference_kernel


def q_profile(tag, post, x_te, yte, infos_te=None, scale=None):
    xq = x_te * scale if scale is not None else x_te
    mean, _ = post.predict_mean_std(jnp.asarray(xq))
    err = np.asarray(mean).ravel() - yte
    q = symmetric_qerror(err)
    print(f"[{tag}] n_te={len(yte)} MSE {float(np.mean(err**2)):.3f} "
          f"median q {np.median(q):.4f} p95 {np.quantile(q, 0.95):.3f} "
          f"p99 {np.quantile(q, 0.99):.3f} max {q.max():.1f}", flush=True)
    if infos_te is not None:
        for k in sorted({i.num_table for i in infos_te}):
            m = np.array([i.num_table == k for i in infos_te])
            print(f"    arity {k}: n={int(m.sum())} median "
                  f"{np.median(q[m]):.4f} p95 {np.quantile(q[m], 0.95):.3f}",
                  flush=True)
    return q


def main():
    x, y, infos, _e = load_multi_join_workload(
        "workloads/synthtpcds_data", schema_name="synthtpcds",
        dtype=np.float64)
    (x_tr, y_tr, _i, x_te, y_te, it, *_rest) = train_test_val_split(
        x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
    yte = np.asarray(y_te).ravel()
    t0 = time.time()
    post = fit_gp(reference_kernel(), jnp.asarray(x_tr), jnp.asarray(y_tr))
    post.predict_mean_std(jnp.asarray(x_te[:8]))
    print(f"[default] fit n={x_tr.shape[0]} d={x_tr.shape[1]} "
          f"({time.time() - t0:.1f}s)", flush=True)
    q_profile("default", post, x_te, yte, it)

    for ard in (False, True):
        t0 = time.time()
        res = fit_kernel_hyperparams(np.asarray(x_tr), np.asarray(y_tr),
                                     steps=100, max_points=2048, ard=ard)
        tag = "ard" if ard else "scalar"
        print(f"[{tag}] learn {time.time() - t0:.0f}s "
              f"w={res.w:.4f} b={res.b:.3f} reg={res.diag_reg:.3e} "
              f"logev={res.log_evidence:.1f}", flush=True)
        xs = np.asarray(x_tr) * res.feature_scale if ard \
            else np.asarray(x_tr)
        post = fit_gp(res.spec, jnp.asarray(xs), jnp.asarray(y_tr),
                      diag_reg=res.diag_reg)
        q_profile(f"{tag}-learned", post, x_te, yte, it,
                  scale=res.feature_scale if ard else None)
    print("exit=0", flush=True)


if __name__ == "__main__":
    main()
