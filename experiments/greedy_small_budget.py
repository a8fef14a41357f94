"""Where does batch-diverse greedy acquisition actually win?

The budget-1000 forest A/B (greedy_ab.log) showed greedy more diverse
(nn-div 816-926 vs 674-791) but NOT better on val MSE (5.42 vs 5.37):
with a budget that large on a dense single-table pool, near-duplicates
are cheap. The regime where independent scoring should hurt is SMALL
budgets on duplicate-heavy pools (production query workloads repeat
templates): the top-k std slice is then mostly one under-covered clump.

Arms: topk vs greedy, budget 100 x 5 rounds, on
  forest  (single-table, 20-dim, dense pool)
  synth6  (6-table Zipf join workload, 61-dim, chunk_norm — template
           structure makes the pool duplicate-heavy)

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nohup python \
  experiments/greedy_small_budget.py \
  > experiments/greedy_small_budget.log 2>&1 &
"""
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from nngp_tpu.active import ActiveLearner
from nngp_tpu.data.workload import (load_multi_join_workload,
                                    load_single_table_workload)
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.models.kernel_spec import KernelSpec, mlp


def batch_diversity(x_batch):
    d2 = ((x_batch[:, None, :] - x_batch[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    return float(np.sqrt(d2.min(axis=1)).mean())


def run(name, data, tag, selection):
    x_tr0, y_tr0, x_pool0, y_pool0, x_val, y_val = data
    spec = KernelSpec(mlp(1))
    learner = ActiveLearner(spec, budget=100, active_iters=5,
                            refit="incremental", input_scale=1.0,
                            selection=selection)
    x_tr, y_tr = np.asarray(x_tr0), np.asarray(y_tr0)
    x_pool, y_pool = np.asarray(x_pool0), np.asarray(y_pool0)
    post = learner.train(x_tr, y_tr)
    mses = [learner.test(post, x_val, y_val, printer=None)]
    divs = []
    for i in range(5):
        t0 = time.time()
        sel = learner.select(post, x_pool)
        t_sel = time.time() - t0
        (x_tr, y_tr, x_pool, y_pool,
         x_delta, y_delta) = learner.merge_data(sel, x_tr, y_tr,
                                                x_pool, y_pool)
        post = post.extend(x_delta, y_delta)
        mses.append(learner.test(post, x_val, y_val, printer=None))
        divs.append(batch_diversity(np.asarray(x_delta)))
        print(f"  [{name}/{tag}] round {i}: select {t_sel:.1f}s "
              f"nn-div {divs[-1]:.1f} val MSE {mses[-1]:.3f}", flush=True)
    traj = " -> ".join(f"{m:.3f}" for m in mses)
    print(f"[{name}/{tag}] val MSE: {traj} "
          f"(mean nn-div {np.mean(divs):.1f})", flush=True)


x, y, infos, _ = load_single_table_workload(
    "workloads/forest_data", relation="forest", name="forest",
    dtype=np.float64)
(a, b, _i1, c, d, _i2, e, f, _iv) = train_test_val_split(
    x, y, train_frac=0.2, test_frac=0.6, all_query_infos=infos)
forest = (a, b, c, d, e, f)
print(f"forest: train {a.shape} pool {c.shape} val {e.shape}", flush=True)
run("forest", forest, "topk", "topk")
run("forest", forest, "greedy", "greedy")

x, y, infos, _e = load_multi_join_workload(
    "workloads/synth6_join_data", schema_name="synth6", dtype=np.float64,
    chunk_norm=True)
(a, b, _i1, c, d, _i2, e, f, _iv) = train_test_val_split(
    x, y, train_frac=0.2, test_frac=0.6, all_query_infos=infos)
synth6 = (a, b, c, d, e, f)
print(f"synth6: train {a.shape} pool {c.shape} val {e.shape}", flush=True)
run("synth6", synth6, "topk", "topk")
run("synth6", synth6, "greedy", "greedy")
