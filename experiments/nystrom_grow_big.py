"""Inducing growth where capacity BINDS: synth6_big, n 72k -> 90k, m0=512.

The acquisition-scale A/B (nystrom_grow_ab.log, n<=6.6k, m=1024) showed
fixed-m moment extends matching growth — m/n was ~0.16, capacity not
binding. Here m/n starts at 0.007 (the BASELINE m-ladder shows accuracy
still climbing in m at this scale), and 18k new labeled rows arrive:

  fixed   extend the m=512 posterior with the 18k rows (moment update)
  grow    extend AND add 512 uniform rows of the new batch as inducing
          points (grow_inducing; O(n (m+s)^2) streamed refit)
  fresh   fit m=1024 from scratch on the 90k with uniform inducing —
          the "you kept all the data and don't mind the refit" ceiling

All default hypers + chunk_norm (the recommended Nystrom serving config,
BASELINE.md). Metric: median/p95 symmetric q-error + DTC evidence and
Titsias ELBO on the grown set. fp64 CPU.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nohup python \
  experiments/nystrom_grow_big.py > experiments/nystrom_grow_big.log 2>&1 &
"""
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from nngp_tpu.data.workload import load_multi_join_workload
from nngp_tpu.eval.qerror import symmetric_qerror
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp import fit_nystrom
from nngp_tpu.models.kernel_spec import KernelSpec, mlp

x, y, infos, _e = load_multi_join_workload(
    "workloads/synth6_big_data", schema_name="synth6", dtype=np.float64,
    chunk_norm=True)
(x_tr, y_tr, _i1, x_te, y_te, _i2, x_val, y_val, _iv) = \
    train_test_val_split(x, y, train_frac=0.6, test_frac=0.2,
                         all_query_infos=infos)
print(f"train {x_tr.shape} heldout-batch {x_te.shape} val {x_val.shape}",
      flush=True)
x_tr, y_tr = np.asarray(x_tr), np.asarray(y_tr)
x_new, y_new = np.asarray(x_te), np.asarray(y_te)
yv = np.asarray(y_val).ravel()
spec = KernelSpec(mlp(1))


def report(post, tag, t):
    mm, _ = post.predict_mean_std_chunked(np.asarray(x_val))
    q = symmetric_qerror(np.asarray(mm).ravel() - yv)
    print(f"[{tag}] {t:.0f}s m={post.num_inducing} "
          f"median q {np.median(q):.4f} p95 {np.quantile(q, 0.95):.3f} "
          f"p99 {np.quantile(q, 0.99):.2f} "
          f"logev {post.log_evidence():.0f} elbo {post.elbo():.0f}",
          flush=True)


t0 = time.time()
base = fit_nystrom(spec, x_tr, y_tr, num_inducing=512, seed=0)
report(base, "base 72k m=512", time.time() - t0)

t0 = time.time()
fixed = base.extend(x_new, y_new)
report(fixed, "fixed extend->90k", time.time() - t0)

t0 = time.time()
rng = np.random.default_rng(0)
pick = rng.choice(x_new.shape[0], size=512, replace=False)
x_all = np.concatenate([x_tr, x_new])
y_all = np.concatenate([y_tr, y_new])
grown = base.grow_inducing(x_new[pick], x_all, y_all)
report(grown, "grow->90k m=1024", time.time() - t0)

t0 = time.time()
fresh = fit_nystrom(spec, x_all, y_all, num_inducing=1024, seed=0)
report(fresh, "fresh 90k m=1024", time.time() - t0)
