"""Does RE-learning kernel hyperparameters as acquisitions accumulate beat
learning them once up front? (forest fp64 CPU, reference split)

hyper_active.log showed learned-once hypers beat the defaults on every
round (5.5/5.3/5.1 vs 5.9/5.6/5.4). But those hypers were fitted to the
INITIAL 20% train split; after 3 x 1000 std-driven acquisitions the train
distribution has shifted toward high-variance regions. Arms:

  once     learn on the initial 3600 rows, extend incrementally (status quo)
  relearn  learn at start, then re-learn after every merge — warm-started
           from the previous optimum (single restart, fewer steps), full
           refit with the new spec that round

Same protocol as hyper_active.py: 3 rounds x budget 1000, deterministic
top-k std acquisition.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nohup python \
  experiments/hyper_active_relearn.py > experiments/hyper_active_relearn.log 2>&1 &
"""
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from nngp_tpu.active import ActiveLearner
from nngp_tpu.data.workload import load_single_table_workload
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_kernel_hyperparams

x, y, infos, _ = load_single_table_workload(
    "workloads/forest_data", relation="forest", name="forest",
    dtype=np.float64)
(x_tr0, y_tr0, _i1, x_pool0, y_pool0, _i2,
 x_val, y_val, infos_val) = train_test_val_split(
    x, y, train_frac=0.2, test_frac=0.6, all_query_infos=infos)
print(f"train {x_tr0.shape} pool {x_pool0.shape} val {x_val.shape}",
      flush=True)


def learn(x_tr, y_tr, prev=None):
    """Initial learn: full multi-start. Re-learn: warm-started from the
    previous optimum, single restart, fewer steps."""
    t0 = time.time()
    if prev is None:
        res = fit_kernel_hyperparams(x_tr, y_tr, steps=100, max_points=2048,
                                     reg_restarts=(3e-2,))
    else:
        res = fit_kernel_hyperparams(
            x_tr, y_tr, steps=40, max_points=2048,
            init=(prev.w0, prev.w, prev.b, prev.diag_reg), reg_restarts=())
    print(f"  learn({'warm' if prev else 'cold'}) {time.time() - t0:.0f}s: "
          f"w0={res.w0:.4f} w={res.w:.4f} b={res.b:.3f} "
          f"reg={res.diag_reg:.3e} logev={res.log_evidence:.1f}", flush=True)
    return res


def run(tag, relearn):
    x_tr, y_tr = np.asarray(x_tr0), np.asarray(y_tr0)
    x_pool, y_pool = np.asarray(x_pool0), np.asarray(y_pool0)
    res = learn(x_tr, y_tr)
    learner = ActiveLearner(res.spec, budget=1000, active_iters=3,
                            biased_sample=False, diag_reg=res.diag_reg,
                            refit="incremental", input_scale=1.0)
    post = learner.train(x_tr, y_tr)
    mses = [learner.test(post, x_val, y_val, printer=None)]
    for i in range(3):
        sel = learner.select(post, x_pool)
        (x_tr, y_tr, x_pool, y_pool,
         x_delta, y_delta) = learner.merge_data(sel, x_tr, y_tr,
                                                x_pool, y_pool)
        if relearn:
            res = learn(x_tr, y_tr, prev=res)
            learner.spec = res.spec
            learner.diag_reg = res.diag_reg
            post = learner.train(x_tr, y_tr)   # new kernel: full refit
        else:
            post = post.extend(x_delta, y_delta)
        mses.append(learner.test(post, x_val, y_val, printer=None))
    traj = " -> ".join(f"{m:.2f}" for m in mses)
    print(f"[{tag}] val MSE init + per round: {traj} "
          f"(final n={x_tr.shape[0]})", flush=True)


run("once", relearn=False)
run("relearn", relearn=True)
