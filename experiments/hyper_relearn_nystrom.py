"""Does per-round hyperparameter RELEARNING help the streaming Nystrom/DTC
tier's active-learning loop? (synth6 18k, chunk_norm, fp64 CPU)

The forest exact-tier result (hyper_active_relearn.log): relearn beats
learn-once on every round. Here the tier is the one actually recommended
for join serving — Nystrom m=1024 with ARD x DTC-objective hypers — and
relearning routes through the DTC objective automatically
(ActiveLearner(nystrom_m=..., relearn_hyper=...)).

Arms (both ARD, DTC objective, subsample 2048, dtc_m=512):
  once     cold learn on the initial 20% split, exact moment-extends after
  relearn  cold learn, then 40-step warm relearn + refit every round

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nohup python \
  experiments/hyper_relearn_nystrom.py \
  > experiments/hyper_relearn_nystrom.log 2>&1 &
"""
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from nngp_tpu.active import ActiveLearner
from nngp_tpu.data.workload import load_multi_join_workload
from nngp_tpu.eval.qerror import symmetric_qerror
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_kernel_hyperparams

x, y, infos, _e = load_multi_join_workload(
    "workloads/synth6_join_data", schema_name="synth6", dtype=np.float64,
    chunk_norm=True)
(x_tr0, y_tr0, _i1, x_pool0, y_pool0, _i2,
 x_val, y_val, _iv) = train_test_val_split(
    x, y, train_frac=0.2, test_frac=0.6, all_query_infos=infos)
print(f"train {x_tr0.shape} pool {x_pool0.shape} val {x_val.shape}",
      flush=True)
yv = np.asarray(y_val).ravel()

M = 1024


def report(learner, post, tag):
    mm, _ = post.predict_mean_std(learner._hscale(np.asarray(x_val)))
    q = symmetric_qerror(np.asarray(mm).ravel() - yv)
    mse = float(np.mean((np.asarray(mm).ravel() - yv) ** 2))
    print(f"  [{tag}] val MSE {mse:.3f} median q {np.median(q):.4f} "
          f"p95 {np.quantile(q, 0.95):.3f}", flush=True)
    return mse


def run(tag, relearn):
    t0 = time.time()
    res0 = fit_kernel_hyperparams(np.asarray(x_tr0), np.asarray(y_tr0),
                                  steps=100, max_points=2048, ard=True,
                                  objective="dtc", dtc_m=512)
    print(f"[{tag}] cold learn {time.time() - t0:.0f}s: w={res0.w:.4f} "
          f"b={res0.b:.3f} reg={res0.diag_reg:.3e} "
          f"logev={res0.log_evidence:.1f}", flush=True)
    learner = ActiveLearner(
        res0.spec, budget=1000, active_iters=3, biased_sample=False,
        diag_reg=res0.diag_reg, nystrom_m=M,
        relearn_hyper=res0 if relearn else None,
        hyper_warm_steps=40, hyper_points=2048)
    if not relearn:
        # learn-once still needs the ARD scale applied — reuse the
        # learner's own scaling hook by installing the result read-only
        learner._hyper = res0
        learner.relearn = False
    x_tr, y_tr = np.asarray(x_tr0), np.asarray(y_tr0)
    x_pool, y_pool = np.asarray(x_pool0), np.asarray(y_pool0)
    post = learner.train(x_tr, y_tr)
    mses = [report(learner, post, f"{tag} init")]
    for i in range(3):
        t0 = time.time()
        sel = learner.select(post, x_pool)
        (x_tr, y_tr, x_pool, y_pool,
         x_delta, y_delta) = learner.merge_data(sel, x_tr, y_tr,
                                                x_pool, y_pool)
        if relearn:
            res = learner._relearn_step(x_tr, y_tr)
            print(f"  relearn {time.time() - t0:.0f}s: w={res.w:.4f} "
                  f"b={res.b:.3f} reg={res.diag_reg:.3e} "
                  f"logev={res.log_evidence:.1f}", flush=True)
            post = learner.train(x_tr, y_tr)
        else:
            post = post.extend(learner._hscale(np.asarray(x_delta)),
                               np.asarray(y_delta))
        mses.append(report(learner, post, f"{tag} r{i}"))
    traj = " -> ".join(f"{m:.3f}" for m in mses)
    print(f"[{tag}] val MSE trajectory: {traj} (final n={x_tr.shape[0]})",
          flush=True)


run("once", relearn=False)
run("relearn", relearn=True)
