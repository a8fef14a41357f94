"""Inducing-selection A/B for the Nystrom tier: seeded uniform vs block
RPCholesky (randomly pivoted Cholesky, near trace-optimal column Nystrom).

Reports q-error + log evidence on a real workload at several m, plus the
selection wall-clock overhead. Run on CPU (fp64) while the tunnel is down;
re-run fp32 on-chip for the BASELINE row.

Usage: [JAX_PLATFORMS=cpu] python experiments/nystrom_rpchol_ab.py \
           [workload=forest|synth6] [max_train] [m_list] [get] [seeds]
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.eval.qerror import symmetric_qerror
from nngp_tpu.gp import nystrom
from nngp_tpu.gp.nystrom import fit_nystrom
from nngp_tpu.models.kernel_spec import reference_kernel
from nngp_tpu.utils.timing import sync

workload = sys.argv[1] if len(sys.argv) > 1 else "forest"
max_train = int(sys.argv[2]) if len(sys.argv) > 2 else 10800
ms = ([int(v) for v in sys.argv[3].split(",")] if len(sys.argv) > 3
      else [512, 2048])
get = sys.argv[4] if len(sys.argv) > 4 else "nngp"
n_seeds = int(sys.argv[5]) if len(sys.argv) > 5 else 3

if workload == "forest":
    from nngp_tpu.data.workload import load_single_table_workload
    x, y, infos, _ = load_single_table_workload(
        "workloads/forest_data", relation="forest", name="forest",
        dtype=np.float32)
else:
    from nngp_tpu.data.workload import load_multi_join_workload
    path = {"synth6": "workloads/synth6_join_data",
            "synth6_big": "workloads/synth6_big_data"}[workload]
    x, y, infos, _ = load_multi_join_workload(
        path, schema_name="synth6", dtype=np.float32, chunk_norm=True)
(x_tr, y_tr, _i, x_te, y_te, _it, *_r) = train_test_val_split(
    x, y, 0.6, 0.2, max_num_train=max_train, all_query_infos=infos)
yv = np.asarray(y_te).ravel()
xt = jnp.asarray(x_te)
spec = reference_kernel()
print(f"workload={workload} n_train={x_tr.shape[0]} n_test={len(yv)} "
      f"get={get}", flush=True)

for m in ms:
    for inducing in ("uniform", "rpchol"):
        meds, p95s, evs, tsel = [], [], [], []
        for seed in range(n_seeds):
            nystrom._BASES_CACHE.clear()
            t0 = time.time()
            post = fit_nystrom(spec, x_tr, y_tr, num_inducing=m, get=get,
                               seed=seed, inducing=inducing)
            sync(post.beta_w)
            t_fit = time.time() - t0
            mm, ss = post.predict_mean_std(xt)
            mm = np.asarray(mm).ravel()
            q = symmetric_qerror(mm - yv)
            meds.append(np.median(q))
            p95s.append(np.quantile(q, 0.95))
            evs.append(post.log_evidence())
            tsel.append(t_fit)
            assert np.all(np.isfinite(np.asarray(ss)))
            del post
        print(f"m={m} inducing={inducing}: median q "
              f"{np.mean(meds):.4f}+-{np.std(meds):.4f} "
              f"p95 {np.mean(p95s):.4f}+-{np.std(p95s):.4f} "
              f"log_ev {np.mean(evs):.1f} fit {np.mean(tsel):.2f}s "
              f"(seeds={n_seeds})", flush=True)
