"""Does batch-diverse greedy conditional-variance acquisition beat the
reference's independent-scoring rules? (forest fp64 CPU, reference split)

Arms, same protocol as hyper_active.py (3 rounds x budget 1000,
incremental refits, default kernel):

  topk    top-1000 posterior std (reference `ActiveLearner.py:54`)
  biased  sampling with p ~ std (reference default, `:52-53`), seed 10
  greedy  pivoted-Cholesky greedy conditional variance with fantasy noise
          conditioning (active/greedy.py; pool pre-filtered to the top-4096
          variance slice)

Metric: val MSE after each round, plus the selected batch's internal
diversity (mean nearest-neighbor distance within the batch, scaled units).

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nohup python \
  experiments/greedy_ab.py > experiments/greedy_ab.log 2>&1 &
"""
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from nngp_tpu.active import ActiveLearner
from nngp_tpu.data.workload import load_single_table_workload
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.models.kernel_spec import KernelSpec, mlp

x, y, infos, _ = load_single_table_workload(
    "workloads/forest_data", relation="forest", name="forest",
    dtype=np.float64)
(x_tr0, y_tr0, _i1, x_pool0, y_pool0, _i2,
 x_val, y_val, infos_val) = train_test_val_split(
    x, y, train_frac=0.2, test_frac=0.6, all_query_infos=infos)
print(f"train {x_tr0.shape} pool {x_pool0.shape} val {x_val.shape}",
      flush=True)


def batch_diversity(x_batch):
    """Mean nearest-neighbor L2 distance within the acquired batch —
    independent scoring buys near-duplicates, greedy should not."""
    d2 = ((x_batch[:, None, :] - x_batch[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    return float(np.sqrt(d2.min(axis=1)).mean())


def run(tag, **kw):
    spec = KernelSpec(mlp(1))
    x_tr, y_tr = np.asarray(x_tr0), np.asarray(y_tr0)
    x_pool, y_pool = np.asarray(x_pool0), np.asarray(y_pool0)
    learner = ActiveLearner(spec, budget=1000, active_iters=3,
                            refit="incremental", input_scale=1.0, **kw)
    post = learner.train(x_tr, y_tr)
    mses = [learner.test(post, x_val, y_val, printer=None)]
    for i in range(3):
        t0 = time.time()
        sel = learner.select(post, x_pool)
        t_sel = time.time() - t0
        (x_tr, y_tr, x_pool, y_pool,
         x_delta, y_delta) = learner.merge_data(sel, x_tr, y_tr,
                                                x_pool, y_pool)
        post = post.extend(x_delta, y_delta)
        mse = learner.test(post, x_val, y_val, printer=None)
        mses.append(mse)
        print(f"  [{tag}] round {i}: select {t_sel:.1f}s "
              f"nn-div {batch_diversity(np.asarray(x_delta)):.1f} "
              f"val MSE {mse:.3f}", flush=True)
    traj = " -> ".join(f"{m:.2f}" for m in mses)
    print(f"[{tag}] val MSE init + per round: {traj} "
          f"(final n={x_tr.shape[0]})", flush=True)


run("topk", selection="topk")
run("biased", selection="biased")
run("greedy", selection="greedy")
