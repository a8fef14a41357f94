"""Whitening-basis A/B for the Nystrom tier: eigh (truncated) vs chol
(jittered). Accuracy on the fp32 forest workload + host-stage wall-clock
(the host fp64 factorizations are the flat cost that dominates large-n
streaming fits, BASELINE.md Nystrom scale ladder).

Host times are deterministic (single-core numpy), so a single-session A/B
IS trustworthy here — unlike tunnel-timed device A/Bs (CLAUDE.md).

Usage: [JAX_PLATFORMS=cpu] python experiments/nystrom_whiten_ab.py \
           [max_train] [m_list] [get]
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

from nngp_tpu.data.workload import load_single_table_workload
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.eval.qerror import symmetric_qerror
from nngp_tpu.gp import nystrom
from nngp_tpu.gp.nystrom import fit_nystrom
from nngp_tpu.models.kernel_spec import reference_kernel
from nngp_tpu.utils.timing import sync

max_train = int(sys.argv[1]) if len(sys.argv) > 1 else 10800
ms = ([int(v) for v in sys.argv[2].split(",")] if len(sys.argv) > 2
      else [512, 2048])
get = sys.argv[3] if len(sys.argv) > 3 else "nngp"

x, y, infos, _ = load_single_table_workload(
    "workloads/forest_data", relation="forest", name="forest",
    dtype=np.float32)
(x_tr, y_tr, _i, x_te, y_te, _it, *_r) = train_test_val_split(
    x, y, 0.6, 0.2, max_num_train=max_train)
yv = np.asarray(y_te).ravel()
xt = jnp.asarray(x_te)
spec = reference_kernel()

for m in ms:
    for whiten in ("eigh", "chol"):
        nystrom._BASES_CACHE.clear()
        t0 = time.time()
        post = fit_nystrom(spec, x_tr, y_tr, num_inducing=m, get=get,
                           whiten=whiten)
        sync(post.beta_w)
        t_fit = time.time() - t0
        # host-stage-only timing: bases now cached, so a refit isolates
        # streaming + finalize; a cached-bases fit minus this approximates
        # the whitening cost
        t0 = time.time()
        post2 = fit_nystrom(spec, x_tr, y_tr, num_inducing=m, get=get,
                            whiten=whiten)
        sync(post2.beta_w)
        t_refit = time.time() - t0
        mm, ss = post.predict_mean_std(xt)
        mm = np.asarray(mm).ravel()
        ss = np.asarray(ss).ravel()
        q = symmetric_qerror(mm - yv)
        print(f"m={m} whiten={whiten} rank={post.rank}: median q "
              f"{np.median(q):.4f} p95 {np.quantile(q, 0.95):.4f} "
              f"std_finite={bool(np.all(np.isfinite(ss)))} "
              f"fit={t_fit:.2f}s whiten_cost~{t_fit - t_refit:.2f}s "
              f"refit(cached)={t_refit:.2f}s", flush=True)
        ev = post.log_evidence()
        print(f"   log_evidence={ev:.2f}", flush=True)
        del post, post2
