"""TPU timings for the round-3 acquisition features (queued behind the
tunnel watcher; CPU numbers for both are in BASELINE.md).

1. Greedy conditional-variance selection, forest fp32 10.8k fit / 10.8k
   pool, budget 1000: the select is ONE covariance dispatch (preselect
   4096 -> (4096, 4096) cov) + ONE jitted O(k P^2) fori_loop dispatch —
   expect tunnel-floor-bound wall (~0.1 s warm) vs 20-50 s on 1-core CPU.
2. NystromPosterior.grow_inducing, synth6 18k rows, m 1024 -> 1536: a
   streamed O(n (m+s)^2) refit — expect a few panel dispatches.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  experiments/greedy_grow_tpu.py > experiments/greedy_grow_tpu.log 2>&1 &
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from nngp_tpu.active import ActiveLearner
from nngp_tpu.data.workload import (load_multi_join_workload,
                                    load_single_table_workload)
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_gp, fit_nystrom
from nngp_tpu.models.kernel_spec import KernelSpec, mlp
from nngp_tpu.utils.timing import sync

# --- greedy select on the exact tier (fp32 forest) ---------------------
x, y, infos, _ = load_single_table_workload(
    "workloads/forest_data", relation="forest", name="forest",
    dtype=np.float32)
(x_tr, y_tr, _i1, x_pool, y_pool, _i2, x_val, y_val, _iv) = \
    train_test_val_split(x, y, train_frac=0.2, test_frac=0.6,
                         all_query_infos=infos)
print(f"forest train {x_tr.shape} pool {x_pool.shape}", flush=True)
post = fit_gp(KernelSpec(mlp(1)), x_tr, y_tr, diag_reg=1e-3)
sync(post.l)
learner = ActiveLearner(KernelSpec(mlp(1)), budget=1000,
                        selection="greedy")
for trial in range(3):
    t0 = time.time()
    sel = learner.select(post, jnp.asarray(x_pool))
    sync(sel)
    print(f"greedy select trial {trial}: {time.time() - t0:.3f} s "
          f"({len(set(np.asarray(sel).tolist()))} distinct)", flush=True)
topk = ActiveLearner(KernelSpec(mlp(1)), budget=1000, selection="topk")
for trial in range(2):
    t0 = time.time()
    sel_t = topk.select(post, jnp.asarray(x_pool))
    sync(sel_t)
    print(f"topk select trial {trial}: {time.time() - t0:.3f} s", flush=True)

# --- grow_inducing on the Nystrom tier (fp32 synth6) --------------------
xj, yj, infoj, _e = load_multi_join_workload(
    "workloads/synth6_join_data", schema_name="synth6", dtype=np.float32,
    chunk_norm=True)
print(f"synth6 rows {xj.shape}", flush=True)
t0 = time.time()
ny = fit_nystrom(KernelSpec(mlp(1)), xj, yj, num_inducing=1024)
_ = np.asarray(ny.beta_w)
print(f"nystrom fit 18k m=1024: {time.time() - t0:.3f} s", flush=True)
rng = np.random.default_rng(0)
pick = rng.choice(xj.shape[0], size=512, replace=False)
for trial in range(2):
    t0 = time.time()
    grown = ny.grow_inducing(np.asarray(xj)[pick], xj, yj)
    _ = np.asarray(grown.beta_w)
    print(f"grow_inducing m 1024->1536 trial {trial}: "
          f"{time.time() - t0:.3f} s (elbo {grown.elbo():.0f} "
          f"vs {ny.elbo():.0f})", flush=True)
print("done", flush=True)
