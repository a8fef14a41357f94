"""Integrated active-learning round cost ON THE CHIP (fp32): per round,
incremental extend + warm hyperparameter relearn + full refit with the new
spec + top-k std selection over the pool. The CPU fp64 A/B
(hyper_active_relearn.log) settled WHETHER to relearn (yes, every round);
this measures what the loop costs where it would actually run.

Phases per round (all wall-clock incl. the ~30 ms tunnel floor):
  select   pool predict (chunked) + top-k
  relearn  warm hyperopt (40 steps, single restart, 2048-row subsample)
  refit    full fit of the grown train set with the new spec

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
      experiments/active_relearn_tpu.py > experiments/active_relearn_tpu.log 2>&1 &
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from nngp_tpu.data.workload import load_single_table_workload
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_gp, fit_kernel_hyperparams
from nngp_tpu.utils.timing import sync

print("devices:", jax.devices(), flush=True)

x, y, infos, _ = load_single_table_workload(
    "workloads/forest_data", relation="forest", name="forest",
    dtype=np.float32)
(x_tr, y_tr, _i1, x_pool, y_pool, _i2,
 x_val, y_val, _i3) = train_test_val_split(
    x, y, train_frac=0.2, test_frac=0.6, all_query_infos=infos)
print(f"train {x_tr.shape} pool {x_pool.shape} val {x_val.shape}",
      flush=True)

BUDGET, ROUNDS, STEPS = 1000, 3, 40


def learn(x_t, y_t, prev):
    if prev is None:
        return fit_kernel_hyperparams(x_t, y_t, steps=100, max_points=2048,
                                      reg_restarts=(3e-2,))
    return fit_kernel_hyperparams(
        x_t, y_t, steps=STEPS, max_points=2048,
        init=(prev.w0, prev.w, prev.b, prev.diag_reg), reg_restarts=())


t0 = time.time()
res = learn(x_tr, y_tr, None)
print(f"cold learn {time.time() - t0:.2f}s  (w0={res.w0:.3f} w={res.w:.3f} "
      f"b={res.b:.2f} reg={res.diag_reg:.2e})", flush=True)

t0 = time.time()
post = fit_gp(res.spec, x_tr, y_tr, **res.fit_kwargs())
sync((post.l, post.alpha))
print(f"cold fit {time.time() - t0:.2f}s (n={x_tr.shape[0]})", flush=True)


def val_mse(p):
    mean, _ = p.predict_mean_std_chunked(x_val, chunk=4096)
    return float(np.mean((np.asarray(mean).ravel() - y_val.ravel()) ** 2))


print(f"round 0 (init): val MSE {val_mse(post):.3f}", flush=True)

for r in range(ROUNDS):
    t0 = time.time()
    _, std = post.predict_mean_std_chunked(x_pool, chunk=8192)
    pick = np.argsort(np.asarray(std).ravel())[-BUDGET:]
    t_sel = time.time() - t0

    x_tr = np.concatenate([x_tr, x_pool[pick]])
    y_tr = np.concatenate([y_tr, y_pool[pick]])
    keep = np.setdiff1d(np.arange(x_pool.shape[0]), pick)
    x_pool, y_pool = x_pool[keep], y_pool[keep]

    t0 = time.time()
    res = learn(x_tr, y_tr, res)
    t_learn = time.time() - t0

    t0 = time.time()
    del post                       # ONE live factor during the refit
    post = fit_gp(res.spec, x_tr, y_tr, **res.fit_kwargs())
    sync((post.l, post.alpha))
    t_fit = time.time() - t0

    print(f"round {r + 1}: select {t_sel:.2f}s  relearn {t_learn:.2f}s  "
          f"refit {t_fit:.2f}s  (n={x_tr.shape[0]}, "
          f"w={res.w:.3f} b={res.b:.2f} reg={res.diag_reg:.2e})  "
          f"val MSE {val_mse(post):.3f}", flush=True)

print("done", flush=True)
