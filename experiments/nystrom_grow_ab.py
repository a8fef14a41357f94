"""Does GROWING the inducing set per acquisition round beat fixed-capacity
moment extends on the Nystrom tier? (synth6 18k, chunk_norm, fp64 CPU)

Round-3g found hyper RELEARNING does not transfer to this tier (every
relearn drifts hypers without an evidence gain). The other lever is
CAPACITY: row extends hold m fixed while n grows, so the approximation gap
widens over rounds. `NystromPosterior.grow_inducing` refits with the
inducing set enlarged by a uniform subsample of the freshly acquired batch
(O(n (m+s)^2) streamed refit).

Arms (all ARD x DTC learn-once hypers, m0=1024, 3 rounds x budget 1000,
topk selection):

  fixed   exact moment extends, m stays 1024 (current recommendation)
  grow    per-round grow_inducing with s=250 of the acquired 1000
          (m 1024 -> 1774)
  bigm    m=1774 from round 0, moment extends — isolates "growth schedule
          targeting acquired rows" from "more capacity"

Metrics: val MSE + median/p95 q-error per round, and the Titsias ELBO
(`NystromPosterior.elbo`, monotone in the inducing set — the principled
growth criterion).

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nohup python \
  experiments/nystrom_grow_ab.py > experiments/nystrom_grow_ab.log 2>&1 &
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

t0 = time.time()
RES0 = fit_kernel_hyperparams(np.asarray(x_tr0), np.asarray(y_tr0),
                              steps=100, max_points=2048, ard=True,
                              objective="dtc", dtc_m=512)
print(f"cold learn {time.time() - t0:.0f}s: w={RES0.w:.4f} b={RES0.b:.3f} "
      f"reg={RES0.diag_reg:.3e} logev={RES0.log_evidence:.1f}", flush=True)


def report(learner, post, tag):
    mm, _ = post.predict_mean_std(learner._hscale(np.asarray(x_val)))
    err = np.asarray(mm).ravel() - yv
    q = symmetric_qerror(err)
    mse = float(np.mean(err ** 2))
    print(f"  [{tag}] m={post.num_inducing} val MSE {mse:.3f} "
          f"median q {np.median(q):.4f} p95 {np.quantile(q, 0.95):.3f} "
          f"elbo {post.elbo():.1f}", flush=True)
    return mse


def run(tag, m0, grow):
    learner = ActiveLearner(
        RES0.spec, budget=1000, active_iters=3, biased_sample=False,
        diag_reg=RES0.diag_reg, nystrom_m=m0)
    learner._hyper = RES0          # learn-once: ARD scale on, no relearn
    rng = np.random.default_rng(0)
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
        if grow > 0:
            pick = rng.choice(x_delta.shape[0], size=grow, replace=False)
            post = post.grow_inducing(
                np.asarray(learner._hscale(x_delta))[pick],
                learner._hscale(np.asarray(x_tr)), np.asarray(y_tr))
        else:
            post = post.extend(learner._hscale(np.asarray(x_delta)),
                               np.asarray(y_delta))
        print(f"  round {i} update {time.time() - t0:.0f}s", flush=True)
        mses.append(report(learner, post, f"{tag} r{i}"))
    traj = " -> ".join(f"{m:.3f}" for m in mses)
    print(f"[{tag}] val MSE trajectory: {traj} (final n={x_tr.shape[0]}, "
          f"m={post.num_inducing})", flush=True)


run("fixed", m0=1024, grow=0)
run("grow", m0=1024, grow=250)
run("bigm", m0=1774, grow=0)
