"""Active-learning A/B: reference-default vs MLL-learned hyperparameters.

Acquisition selects by posterior std (CoV) — a better-calibrated std
(see hyper_calibration.log) should pick more informative points. Forest,
fp64 CPU, reference split (20% train / 60% pool / 20% val), 3 rounds x
budget 1000, top-k selection (deterministic — isolates the std quality
from sampling noise). Learned values from experiments/hyper_forest_cpu.log.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nohup python \
       experiments/hyper_active.py > experiments/hyper_active.log 2>&1 &
"""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from nngp_tpu.active import ActiveLearner
from nngp_tpu.data.workload import load_single_table_workload
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp.hyperopt import _build_layers
from nngp_tpu.models.kernel_spec import KernelSpec, reference_kernel

x, y, infos, _ = load_single_table_workload(
    "workloads/forest_data", relation="forest", name="forest",
    dtype=np.float64)
(x_tr, y_tr, _i1, x_pool, y_pool, _i2,
 x_val, y_val, infos_val) = train_test_val_split(
    x, y, train_frac=0.2, test_frac=0.6, all_query_infos=infos)
print(f"train {x_tr.shape} pool {x_pool.shape} val {x_val.shape}", flush=True)

configs = [
    ("default", reference_kernel(), 1e-3, None),
    ("learned", KernelSpec(_build_layers(1, "relu", 512,
                                         0.2379, 0.2593, 62.2186)),
     1.018e-3, 1.0),
]
for tag, spec, reg, scale in configs:
    learner = ActiveLearner(spec, budget=1000, active_iters=3,
                            biased_sample=False, diag_reg=reg,
                            refit="incremental", input_scale=scale)
    post, history = learner.active_train(x_tr, y_tr, x_pool, y_pool,
                                         x_val, y_val, infos_val,
                                         printer=None)
    traj = " -> ".join(f"{h['val_mse']:.1f}" for h in history)
    print(f"[{tag}] val MSE per round: {traj} "
          f"(final n={history[-1]['num_train']})", flush=True)
